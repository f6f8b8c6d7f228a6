#!/usr/bin/env python3
"""Headline benchmark: variable-base MSM points/sec on MNT4-753 G1.

Runs on whatever JAX backend the environment provides (the driver runs it
on one real TPU chip).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the reference's CPU Pippenger throughput; the
reference publishes no numbers (BASELINE.md), so we use a fixed estimate of
a modern multicore CPU running ginger-lib's rayon Pippenger on MNT4-753
(~6e4 points/sec at 2^16; see BASELINE.md for provenance).

Pipeline: points are generated on-device as [k_i]G for random 32-bit k_i
via the windowed fixed-base table (chunked so the generator never holds a
full-size intermediate), then one batched-affine Pippenger MSM
(ops/msm.msm_affine) over full-range random scalars.
"""

import json
import os
import time

N_LOG2 = int(os.environ.get("BENCH_MSM_LOG2", "16"))
GEN_CHUNK_LOG2 = int(os.environ.get("BENCH_GEN_CHUNK_LOG2", "14"))
CPU_BASELINE_PPS = 6.0e4


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.ops import msm as msm_mod, limbs

    g1 = CI.mnt4753_g1()
    fr = g1.scalar_field
    n = 1 << N_LOG2
    chunk = 1 << min(GEN_CHUNK_LOG2, N_LOG2)

    def fetch(x):
        # block_until_ready does NOT block on the tunneled TPU backend;
        # a device->host fetch is the only reliable completion barrier
        return np.asarray(x)

    # probe the fused batched-affine EC kernels once; on any backend
    # rejection fall back to the XLA batch_affine_add form for the run
    from gingerlib_tpu.ops import pallas_ec
    if pallas_ec.supports(g1):
        try:
            gx, gy = g1.generator_affine
            shape = (4,) + gx.shape[-2:]
            pt = ((jnp.broadcast_to(gx, shape),
                   jnp.broadcast_to(gy, shape)),
                  jnp.zeros((4,), bool))
            probe = jax.jit(lambda p: g1.batch_affine_add(p, p))
            fetch(probe(pt)[0][0])
        except Exception as e:  # pragma: no cover - TPU safety net
            import sys
            print(f"fused EC kernels unavailable ({type(e).__name__}); "
                  f"using XLA path", file=sys.stderr)
            os.environ["GINGERLIB_FUSED_EC"] = "0"

    # on-device point generation: [k]G, k random in [1, 2^32)
    gen_bits = 32
    rng = np.random.RandomState(42)
    table = jax.jit(lambda: msm_mod.fixed_base_table(
        g1, g1.generator_affine, w=8, nbits=gen_bits))()
    gen = jax.jit(lambda kd: msm_mod.fixed_base_msm_windowed(
        g1, table, kd, w=8, nbits=gen_bits))
    xs_np = np.empty((n, 1, fr.n_digits), np.uint32)
    ys_np = np.empty((n, 1, fr.n_digits), np.uint32)
    for s in range(0, n, chunk):
        ks = rng.randint(1, 1 << 31, size=chunk).astype(np.int64) * 2 + 1
        kd = jnp.asarray(limbs.to_digits_batch(
            [int(k) for k in ks], fr.n_digits))
        (cx, cy), _ = gen(kd)
        xs_np[s:s + chunk] = fetch(cx)
        ys_np[s:s + chunk] = fetch(cy)
    xs = jnp.asarray(xs_np)
    ys = jnp.asarray(ys_np)

    scalars = [int.from_bytes(rng.bytes(94), "little") % fr.modulus
               for _ in range(n)]
    sd = jnp.asarray(limbs.to_digits_batch(scalars, fr.n_digits))

    run = jax.jit(lambda xs, ys, sd: msm_mod.msm_affine(g1, xs, ys, sd))
    out = run(xs, ys, sd)
    fetch(out[0])  # compile + first run

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(xs, ys, sd)
    fetch(out[0])
    dt = (time.perf_counter() - t0) / reps

    pps = n / dt
    print(json.dumps({
        "metric": f"msm_points_per_sec_2e{N_LOG2}_g1_mnt4753",
        "value": round(pps, 2),
        "unit": "points/s",
        "vs_baseline": round(pps / CPU_BASELINE_PPS, 4),
    }))


if __name__ == "__main__":
    main()
