"""On-chip validation + timing of msm_hybrid vs msm_affine vs naive.

Run on the real TPU (no args): checks Mosaic acceptance and bit-exactness
of the hybrid digit-major Pippenger at a small N, then times hybrid vs
affine at BENCH log2 sizes.  Prints JSON lines.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/gingerlib_jax_cache_bench")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.ops import msm as M, limbs

    g1 = CI.mnt4753_g1()
    fr = g1.scalar_field
    import random
    rng = random.Random(7)

    # --- correctness at N=64 vs the naive oracle ---
    N = 64
    ks = [rng.randrange(1, 1 << 31) for _ in range(N)]
    kd = jnp.asarray(limbs.to_digits_batch(ks, fr.n_digits))
    t0 = time.time()
    pts = jax.jit(g1.mul_scalar_digits)(g1.generator((N,)), kd)
    xs, ys = jax.jit(g1.to_affine)(pts)
    xs, ys = np.asarray(xs), np.asarray(ys)
    print(f"points built {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    scalars = [rng.randrange(fr.modulus) for _ in range(N)]
    scalars[3] = 0
    sd = jnp.asarray(limbs.to_digits_batch(scalars, fr.n_digits))
    xs_j, ys_j = jnp.asarray(xs), jnp.asarray(ys)

    t0 = time.time()
    res_h = jax.jit(lambda x, y, s: M.msm_hybrid(g1, x, y, s, c=8))(
        xs_j, ys_j, sd)
    rh = [np.asarray(c) for c in res_h]
    print(f"hybrid ran {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.time()
    res_n = jax.jit(lambda x, y, s: M.msm_naive(g1, x, y, s))(xs_j, ys_j, sd)
    eq = bool(np.asarray(jax.jit(g1.eq)(tuple(jnp.asarray(c) for c in rh),
                                        res_n)))
    print(f"naive ran {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    print(json.dumps({"check": "hybrid_vs_naive_n64", "ok": eq}), flush=True)
    if not eq:
        sys.exit(1)

    # --- timing sweep at BENCH sizes (cached bench points if available) ---
    for log2 in [int(x) for x in
                 os.environ.get("HYBRID_SWEEP_LOG2", "16").split(",")]:
        n = 1 << log2
        cache = f"/tmp/gingerlib_bench_pts_{g1.name}_{log2}.npz"
        if os.path.exists(cache):
            z = np.load(cache)
            xs_np, ys_np = z["xs"], z["ys"]
        else:
            reps = n // N
            xs_np = np.tile(xs, (reps, 1, 1))
            ys_np = np.tile(ys, (reps, 1, 1))
        sr = np.random.RandomState(11)
        svals = [int.from_bytes(sr.bytes(94), "little") % fr.modulus
                 for _ in range(n)]
        sdn = jnp.asarray(limbs.to_digits_batch(svals, fr.n_digits))
        X, Y = jnp.asarray(xs_np), jnp.asarray(ys_np)
        for name, fn in [
            ("hybrid", lambda x, y, s: M.msm_hybrid(g1, x, y, s)),
            ("affine", lambda x, y, s: M.msm_affine(g1, x, y, s)),
        ]:
            if os.environ.get("HYBRID_ONLY") and name != "hybrid":
                continue
            jf = jax.jit(fn)
            t0 = time.time()
            out = jf(X, Y, sdn)
            np.asarray(out[0])
            t_first = time.time() - t0
            t0 = time.time()
            out = jf(X, Y, sdn)
            np.asarray(out[0])
            dt = time.time() - t0
            print(json.dumps({
                "metric": f"msm_{name}_2e{log2}", "pts_per_s":
                round(n / dt, 1), "first_s": round(t_first, 1),
                "steady_s": round(dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
