"""Microbenchmarks on the current backend (reference: algebra/benches/*).

Usage: python benchmarks/microbench.py [op ...]
Ops: mont_mul, inv, poseidon, msm, fft
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from gingerlib_tpu import params as PP
from gingerlib_tpu.fields import fp as fpmod
from gingerlib_tpu.ops import limbs


def fetch(out):
    """Force completion: device->host fetch of one leaf.  NOTE
    block_until_ready does NOT block on the tunneled TPU backend."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)


def timeit(fn, *args, reps=5):
    out = fn(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    return (time.perf_counter() - t0) / reps


def bench_mont_mul(n=1 << 16):
    P = PP.MNT4753_FQ
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(0, 1 << 16, size=(n, P.n_digits)).astype(np.uint32))
    b = jnp.asarray(rng.randint(0, 1 << 16, size=(n, P.n_digits)).astype(np.uint32))
    f = jax.jit(lambda a, b: fpmod.mont_mul(P, a, b))
    dt = timeit(f, a, b)
    print(json.dumps({"op": "mont_mul_768", "n": n, "sec": dt,
                      "rate_per_s": n / dt}))


def bench_inv(n=1 << 10):
    P = PP.MNT4753_FQ
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(1, 1 << 16, size=(n, P.n_digits)).astype(np.uint32))
    f = jax.jit(lambda a: fpmod.inv_mod(P, a))
    dt = timeit(f, a, reps=3)
    print(json.dumps({"op": "inv_768", "n": n, "sec": dt, "rate_per_s": n / dt}))


def bench_poseidon(n=1 << 14):
    from gingerlib_tpu.primitives.poseidon import PoseidonParams, PoseidonHash
    h = PoseidonHash(PoseidonParams.mnt4753())
    fr = h.F
    rng = np.random.RandomState(1)
    l = jnp.asarray(rng.randint(0, 1 << 16, size=(n, fr.n_digits)).astype(np.uint32))
    r = jnp.asarray(rng.randint(0, 1 << 16, size=(n, fr.n_digits)).astype(np.uint32))
    f = jax.jit(h.hash_2_1)
    dt = timeit(f, l, r, reps=3)
    print(json.dumps({"op": "poseidon_2_1_mnt4", "n": n, "sec": dt,
                      "rate_per_s": n / dt}))


def bench_msm(lg=12):
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.ops import msm as msm_mod
    g1 = CI.mnt4753_g1()
    fr = g1.scalar_field
    n = 1 << lg
    rng = np.random.RandomState(42)
    ks = rng.randint(1, 1 << 30, size=n).astype(object)
    kd = jnp.asarray(limbs.to_digits_batch(list(ks), fr.n_digits))
    G = g1.generator((n,))
    pts = jax.jit(g1.mul_scalar_digits)(G, kd)
    xs, ys = jax.jit(g1.to_affine)(pts)
    jax.block_until_ready((xs, ys))
    scalars = [int.from_bytes(rng.bytes(94), "little") % fr.modulus
               for _ in range(n)]
    sd = jnp.asarray(limbs.to_digits_batch(scalars, fr.n_digits))
    f = jax.jit(lambda xs, ys, sd: msm_mod.msm(g1, xs, ys, sd))
    dt = timeit(f, xs, ys, sd, reps=3)
    print(json.dumps({"op": f"msm_g1_mnt4753_2^{lg}", "n": n, "sec": dt,
                      "rate_pts_per_s": n / dt}))


def bench_fft(lg=14):
    from gingerlib_tpu.ops.fft import Domain
    P = PP.MNT4753_FR
    dom = Domain(P, 1 << lg)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randint(0, 1 << 16,
                    size=(1 << lg, P.n_digits)).astype(np.uint32))
    f = jax.jit(dom.fft)
    dt = timeit(f, x, reps=3)
    print(json.dumps({"op": f"fft_mnt4753_fr_2^{lg}", "n": 1 << lg,
                      "sec": dt, "rate_per_s": (1 << lg) / dt}))


if __name__ == "__main__":
    ops = sys.argv[1:] or ["mont_mul", "poseidon", "fft"]
    print("backend:", jax.default_backend(), jax.devices())
    for op in ops:
        {"mont_mul": bench_mont_mul, "inv": bench_inv,
         "poseidon": bench_poseidon, "msm": bench_msm,
         "fft": bench_fft}[op]()
