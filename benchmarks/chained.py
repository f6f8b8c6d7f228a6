"""True-throughput TPU microbench: K dependent reps inside ONE jit.

The axon tunnel adds 10-45 ms dispatch latency per jit call and ignores
block_until_ready, so per-call timings (tpu_smoke.py) are latency-floored.
Here each op is iterated K times inside a single lax.scan with a data
dependency (output feeds the next input), so

    per-op time = (t_chained(K) - t_chained(1)) / (K - 1)

cancels both dispatch latency and the device->host fetch.

  python benchmarks/chained.py [mont|ec|poseidon|all] [log2 batch]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

K = int(os.environ.get("CHAIN_K", "32"))


def fetch(x):
    return np.asarray(x)


def _time_chain(make_run, args, k):
    run = jax.jit(lambda *a: make_run(k)(*a))
    out = run(*args)                      # compile + warm
    fetch(jax.tree_util.tree_leaves(out)[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*args)
        fetch(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    return best


def measure(name, make_run, args, n_ops):
    t1 = _time_chain(make_run, args, 1)
    tk = _time_chain(make_run, args, K)
    per = (tk - t1) / (K - 1)
    print(f"{name}: {n_ops/per/1e6:.3f} Mop/s  "
          f"({per*1e3:.2f} ms/iter; t1={t1*1e3:.1f} ms tK={tk*1e3:.1f} ms)")
    return n_ops / per


def bench_mont(log2n):
    from gingerlib_tpu import params as PP
    from gingerlib_tpu.ops import pallas_mont, limbs

    P = PP.MNT4753_FQ
    q = P.modulus
    rng = np.random.RandomState(7)
    n = 1 << log2n
    xs = [int.from_bytes(rng.bytes(94), "little") % q for _ in range(256)]
    xs = (xs * ((n // 256) + 1))[:n]
    a = jnp.asarray(limbs.to_digits_batch([x * P.r % q for x in xs],
                                          P.n_digits))

    for name, fn in [("vpu", pallas_mont.mont_mul_pallas),
                     ("mxu", pallas_mont.mont_mul_pallas_mxu),
                     ("t", pallas_mont.mont_mul_pallas_t)]:
        def make(k, fn=fn):
            def run(a):
                def step(x, _):
                    return fn(P, x, x), None
                out, _ = jax.lax.scan(step, a, None, length=k)
                return out
            return run
        try:
            measure(f"mont[{name}] n=2^{log2n}", make, (a,), n)
        except Exception as e:
            print(f"mont[{name}] FAILED: {type(e).__name__}: {e}")

    # RNS kernel (packed layout)
    try:
        from gingerlib_tpu.ops import rns, pallas_rns
        ctx = rns.make_context(q)
        x = pallas_rns.pack_rns(ctx, *rns.to_rns(ctx, xs))

        def make(k):
            def run(x):
                def step(v, _):
                    return pallas_rns.mont_mul_rns_pallas(q, v, v), None
                out, _ = jax.lax.scan(step, x, None, length=k)
                return out
            return run
        measure(f"mont[rns] n=2^{log2n}", make, (x,), n)
    except Exception as e:
        print(f"mont[rns] FAILED: {type(e).__name__}: {e}")


def bench_ec(log2n):
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.ops import limbs

    g1 = CI.mnt4753_g1()
    fr = g1.scalar_field
    n = 1 << log2n
    rng = np.random.RandomState(5)
    ks = [int(k) for k in rng.randint(1, 1 << 20, size=512)]
    kd = jnp.asarray(limbs.to_digits_batch(ks, fr.n_digits))
    gx, gy = g1.generator_affine
    shape = (512,) + gx.shape[-2:]
    pt = (jnp.broadcast_to(gx, shape), jnp.broadcast_to(gy, shape),
          jnp.broadcast_to(jnp.asarray(g1.F.one()), shape))
    xs, ys = (fetch(v) for v in g1.to_affine(
        jax.jit(lambda p, k: g1.mul_scalar_digits(p, k))(pt, kd)))
    reps_x = (n // 512) + 1
    xs = jnp.asarray(np.tile(xs, (reps_x, 1, 1))[:n])
    ys = jnp.asarray(np.tile(ys, (reps_x, 1, 1))[:n])
    inf = jnp.zeros((n,), bool)

    for name, env in [("xla", {"GINGERLIB_FUSED_EC": "0",
                               "GINGERLIB_EC_RNS": "0"}),
                      ("fused", {"GINGERLIB_FUSED_EC": "1",
                                 "GINGERLIB_EC_RNS": "0"}),
                      ("rns", {"GINGERLIB_FUSED_EC": "1",
                               "GINGERLIB_EC_RNS": "1"})]:
        os.environ.update(env)

        def make(k):
            def run(xs, ys, inf):
                # chained adds: acc <- acc + P (affine out feeds next add)
                def step(acc, _):
                    out = g1.batch_affine_add(acc, ((xs, ys), inf))
                    return out, None
                out, _ = jax.lax.scan(step, ((xs, ys), inf), None, length=k)
                return out
            return run
        try:
            measure(f"ec_add[{name}] n=2^{log2n}", make, (xs, ys, inf), n)
        except Exception as e:
            print(f"ec_add[{name}] FAILED: {type(e).__name__}: {e}")


def bench_pairing(log2b):
    """Full pairing (Miller + final exp), batched over 2^log2b pairs and
    chained K times (the GT output is folded back into the G1 x-coordinate
    through a runtime-zero mask so XLA cannot break the dependency).
    Measures the sparse-line-c0 Miller loop (pairing_mnt._line_c0)."""
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.fields import fp as fpmod
    from gingerlib_tpu.ops import limbs

    b = 1 << log2b
    for name, eng_fn in [("mnt4753", CI.mnt4753_pairing),
                         ("mnt6753", CI.mnt6753_pairing)]:
        eng = eng_fn()
        g1, g2 = eng.g1, eng.g2
        fr = g1.scalar_field
        ks = list(range(3, 3 + b))
        kd = jnp.asarray(limbs.to_digits_batch(ks, fr.n_digits))
        p_aff = g1.to_affine(jax.jit(g1.mul_scalar_digits)(
            g1.generator((b,)), kd))
        q_aff = g2.to_affine(jax.jit(g2.mul_scalar_digits)(
            g2.generator((b,)), kd))
        px, py = (jnp.asarray(fetch(v)) for v in p_aff)
        qx, qy = (jnp.asarray(fetch(v)) for v in q_aff)
        zero = jnp.uint32(0)

        def make(k):
            def run(px, py, qx, qy, zero):
                def step(carry, _):
                    px_, gt = carry
                    gt = eng.pairing((px_, py), (qx, qy))
                    # runtime-zero data dependency: px ^= (gt[0,0] & 0)
                    d = (gt[..., 0, 0] & zero)[..., None, None]
                    return (px_ ^ d, gt), None
                gt0 = jnp.zeros((b, eng.fqk.K, eng.fp.n_digits), jnp.uint32)
                (_, gt), _ = jax.lax.scan(step, (px, gt0), None, length=k)
                return gt
            return run
        try:
            measure(f"pairing[{name}] batch=2^{log2b}", make,
                    (px, py, qx, qy, zero), b)
        except Exception as e:
            print(f"pairing[{name}] FAILED: {type(e).__name__}: {e}")


def bench_poseidon(log2n):
    from gingerlib_tpu.primitives.poseidon import PoseidonParams, PoseidonHash
    from gingerlib_tpu.fields import fp as fpmod

    n = 1 << log2n
    for fused in ("0", "1"):
        os.environ["GINGERLIB_FUSED_POSEIDON"] = fused
        h = PoseidonHash(PoseidonParams.mnt4753())
        left = jnp.asarray(fpmod.fp_from_ints(
            h.F, list(range(1, n + 1))))

        def make(k):
            def run(l):
                def step(x, _):
                    return h.hash_2_1(x, x), None
                out, _ = jax.lax.scan(step, l, None, length=k)
                return out
            return run
        name = "fused" if fused == "1" else "xla"
        try:
            measure(f"poseidon[{name}] n=2^{log2n}", make, (left,), n)
        except Exception as e:
            print(f"poseidon[{name}] FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    log2n = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    print("backend:", jax.default_backend(), " K =", K)
    if which in ("mont", "all"):
        bench_mont(log2n)
    if which in ("ec", "all"):
        bench_ec(log2n)
    if which in ("poseidon", "all"):
        bench_poseidon(log2n)
    if which == "pairing":
        # not in "all": the Miller-loop compile is minutes; run explicitly
        # as  python benchmarks/chained.py pairing <log2_batch>
        bench_pairing(min(log2n, 6))
