"""Quick TPU validation + timing of the round-2 kernel paths.

Run on the real chip (JAX_PLATFORMS=axon, the sandbox default):
  python benchmarks/tpu_smoke.py [mont|inv|msm|all]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def fetch(x):
    return np.asarray(x)


def check_mont():
    from gingerlib_tpu import params as PP
    from gingerlib_tpu.ops import pallas_mont, limbs
    from gingerlib_tpu.fields import fp as fpmod

    P = PP.MNT4753_FQ
    q = P.modulus
    rng = np.random.RandomState(7)
    n = 1 << 14
    xs = [int.from_bytes(rng.bytes(94), "little") % q for _ in range(256)]
    ys = [int.from_bytes(rng.bytes(94), "little") % q for _ in range(256)]
    xs = (xs * ((n // 256) + 1))[:n]
    ys = (ys * ((n // 256) + 1))[:n]
    a = jnp.asarray(limbs.to_digits_batch(
        [x * P.r % q for x in xs], P.n_digits))
    b = jnp.asarray(limbs.to_digits_batch(
        [y * P.r % q for y in ys], P.n_digits))

    for name, fn in [
        ("vpu", pallas_mont.mont_mul_pallas),
        ("mxu", pallas_mont.mont_mul_pallas_mxu),
        ("t", pallas_mont.mont_mul_pallas_t),
    ]:
        run = jax.jit(lambda a, b, fn=fn: fn(P, a, b))
        out = fetch(run(a, b))
        got = [limbs.from_digits(out[i]) * pow(P.r, -1, q) % q
               for i in range(0, n, n // 8)]
        exp = [(xs[i] * ys[i]) % q for i in range(0, n, n // 8)]
        ok = got == exp
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            out = run(a, b)
        fetch(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"mont[{name}] ok={ok} batch={n} {n/dt/1e6:.2f} Mmul/s "
              f"({dt*1e3:.2f} ms)")


def check_inv():
    from gingerlib_tpu import params as PP
    from gingerlib_tpu.ops import limbs
    from gingerlib_tpu.fields import fp as fpmod

    P = PP.MNT4753_FQ
    q = P.modulus
    rng = np.random.RandomState(8)
    n = 256
    xs = [int.from_bytes(rng.bytes(94), "little") % q for _ in range(n)]
    a = jnp.asarray(limbs.to_digits_batch(
        [x * P.r % q for x in xs], P.n_digits))
    run = jax.jit(lambda a: fpmod.inv_mod(P, a))
    out = fetch(run(a))
    got = [limbs.from_digits(out[i]) * pow(P.r, -1, q) % q for i in range(4)]
    exp = [pow(xs[i], -1, q) for i in range(4)]
    ok = got == exp
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = run(a)
    fetch(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"inv[bea] ok={ok} batch={n} {dt*1e3:.2f} ms/batch")


def check_msm(log2n=12):
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.ops import msm as msm_mod, limbs

    g1 = CI.mnt4753_g1()
    fr = g1.scalar_field
    n = 1 << log2n
    rng = np.random.RandomState(42)

    gen_bits = 32
    t0 = time.perf_counter()
    table = jax.jit(lambda: msm_mod.fixed_base_table(
        g1, g1.generator_affine, w=8, nbits=gen_bits))()
    fetch(table[0][0])
    print(f"fixed_base_table: {time.perf_counter()-t0:.1f}s")
    gen = jax.jit(lambda kd: msm_mod.fixed_base_msm_windowed(
        g1, table, kd, w=8, nbits=gen_bits))
    ks = rng.randint(1, 1 << 31, size=n).astype(np.int64) * 2 + 1
    kd = jnp.asarray(limbs.to_digits_batch([int(k) for k in ks],
                                           fr.n_digits))
    t0 = time.perf_counter()
    (xs, ys), inf = gen(kd)
    xs_np, ys_np = fetch(xs), fetch(ys)
    print(f"gen {n} points: {time.perf_counter()-t0:.1f}s "
          f"(inf any: {bool(fetch(inf).any())})")
    xs, ys = jnp.asarray(xs_np), jnp.asarray(ys_np)

    scalars = [int.from_bytes(rng.bytes(94), "little") % fr.modulus
               for _ in range(n)]
    sd = jnp.asarray(limbs.to_digits_batch(scalars, fr.n_digits))

    run = jax.jit(lambda xs, ys, sd: msm_mod.msm_affine(g1, xs, ys, sd))
    t0 = time.perf_counter()
    out = run(xs, ys, sd)
    fetch(out[0])
    print(f"msm_affine compile+run: {time.perf_counter()-t0:.1f}s")
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(xs, ys, sd)
    fetch(out[0])
    dt = (time.perf_counter() - t0) / reps
    print(f"msm_affine n=2^{log2n}: {dt:.2f}s -> {n/dt:.0f} pts/s")

    # correctness vs host: expected scalar = sum k_i s_i mod r
    exp_k = sum(int(k) * s for k, s in zip(ks, scalars)) % fr.modulus
    exp = jax.jit(lambda: g1.to_affine(g1.mul_const(g1.generator(()),
                                                    exp_k)))()
    res_aff = jax.jit(g1.to_affine)(out)
    ok = (np.array_equal(fetch(res_aff[0]), fetch(exp[0])) and
          np.array_equal(fetch(res_aff[1]), fetch(exp[1])))
    print(f"msm_affine correct: {ok}")


def check_rns():
    """RNS Montgomery kernel (MXU base extensions) vs the positional
    kernels: correctness vs python oracle + throughput."""
    from gingerlib_tpu import params as PP
    from gingerlib_tpu.ops import rns, pallas_rns

    q = PP.MNT4753_FQ.modulus
    ctx = rns.make_context(q)
    rng = np.random.RandomState(9)
    n = 1 << 14
    base = [int.from_bytes(rng.bytes(94), "little") % q for _ in range(256)]
    xs = (base * ((n // 256) + 1))[:n]
    ys = list(reversed(xs))
    x = pallas_rns.pack_rns(ctx, *rns.to_rns(ctx, xs))
    y = pallas_rns.pack_rns(ctx, *rns.to_rns(ctx, ys))
    run = jax.jit(lambda x, y: pallas_rns.mont_mul_rns_pallas(q, x, y))
    out = fetch(run(x, y))
    ta, _ = pallas_rns.unpack_rns(ctx, out)
    ta = np.asarray(ta)
    minv = pow(ctx.MA, -1, q)
    ok = all(
        rns.from_rns_int(ctx, [int(v) for v in ta[i]]) % q ==
        xs[i] * ys[i] * minv % q
        for i in range(0, n, n // 8))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = run(x, y)
    fetch(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"mont[rns] ok={ok} batch={n} {n/dt/1e6:.2f} Mmul/s "
          f"({dt*1e3:.2f} ms, k={ctx.k} channels x 2 bases)")


def check_ec(log2n=14):
    """batch_affine_add ladder A/B: XLA vs fused positional vs RNS-hybrid
    (Mosaic acceptance + throughput)."""
    import os
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
    half = n // 2
    a = ((xs[:half], ys[:half]), jnp.zeros((half,), bool))
    b = ((xs[half:], ys[half:]), jnp.zeros((half,), bool))

    outs = {}
    for name, env in [("xla", {"GINGERLIB_FUSED_EC": "0",
                               "GINGERLIB_EC_RNS": "0"}),
                      ("fused", {"GINGERLIB_FUSED_EC": "1",
                                 "GINGERLIB_EC_RNS": "0"}),
                      ("rns", {"GINGERLIB_FUSED_EC": "1",
                               "GINGERLIB_EC_RNS": "1"})]:
        os.environ.update(env)
        try:
            run = jax.jit(lambda a, b: g1.batch_affine_add(a, b))
            out = run(a, b)
            ox = fetch(out[0][0])
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                out = run(a, b)
            fetch(out[0][0])
            dt = (time.perf_counter() - t0) / reps
            outs[name] = ox
            print(f"ec_add[{name}] batch={half} {half/dt/1e6:.2f} Madd/s "
                  f"({dt*1e3:.2f} ms)")
        except Exception as e:
            print(f"ec_add[{name}] FAILED: {type(e).__name__}: {e}")
    for name, ox in outs.items():
        if name != "xla" and "xla" in outs:
            print(f"ec_add[{name}] matches xla: "
                  f"{np.array_equal(ox, outs['xla'])}")


def check_poseidon(log2n=12):
    """fused RNS Poseidon permutation vs the XLA path."""
    import os
    from gingerlib_tpu.fields import fp as fpmod
    from gingerlib_tpu.primitives.poseidon import (PoseidonHash,
                                                   PoseidonParams)

    P = PoseidonParams.mnt4753()
    h = PoseidonHash(P)
    F = P.field
    n = 1 << log2n
    rng = np.random.RandomState(6)
    base = np.stack([
        np.stack([fpmod.fp_from_int(
            F, int.from_bytes(rng.bytes(94), "little") % F.modulus)
            for _ in range(3)]) for _ in range(256)])
    state = jnp.asarray(np.tile(base, ((n // 256) + 1, 1, 1))[:n])

    outs = {}
    for name, env in [("xla", "0"), ("fused", "1")]:
        os.environ["GINGERLIB_FUSED_POSEIDON"] = env
        try:
            run = jax.jit(h.permute)
            out = fetch(run(state))
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                o = run(state)
            fetch(o)
            dt = (time.perf_counter() - t0) / reps
            outs[name] = out
            print(f"poseidon[{name}] batch={n} {n/dt:.0f} perms/s "
                  f"({dt*1e3:.1f} ms)")
        except Exception as e:
            print(f"poseidon[{name}] FAILED: {type(e).__name__}: {e}")
    if len(outs) == 2:
        print(f"poseidon[fused] matches xla: "
              f"{np.array_equal(outs['fused'], outs['xla'])}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend())
    if which in ("mont", "all"):
        check_mont()
    if which in ("rns", "all"):
        check_rns()
    if which in ("inv", "all"):
        check_inv()
    if which in ("ec", "all"):
        check_ec()
    if which in ("poseidon", "all"):
        check_poseidon()
    if which in ("msm", "all"):
        log2n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
        check_msm(log2n)
