"""Scaling-efficiency harness: sharded vs single-device throughput at
1/2/4/8 devices (BASELINE target: >=75% efficiency at 2 hosts).

Measures three pipelines over a JAX device mesh:
  * MSM     — sharded_msm (points split over the mesh, all-gather + fold)
  * FFT     — sharded_fft two-step decomposition (one all-gather stage)
  * Poseidon— data-parallel batched 2->1 hashing

Run on real hardware:   python benchmarks/scaling.py            (the
attached backend's devices; on a pod slice this measures real ICI).
CI / methodology check: SCALING_CPU=1 python benchmarks/scaling.py
(8 virtual CPU devices on one core — wall-clock there measures overhead
only, not speedup; the harness, shardings and efficiency math are what
is being validated, the same command then runs unchanged on a pod).

Prints one JSON line per (pipeline, ndev) with points/s (or elems/s,
hashes/s) and efficiency vs the 1-device run of the same pipeline.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SCALING_CPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()


def main():
    import jax
    if os.environ.get("SCALING_CPU"):
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_disable_most_optimizations", True)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gingerlib_jax_cache2")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from gingerlib_tpu import params as PP
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.fields import fp as fpmod
    from gingerlib_tpu.ops import limbs
    from gingerlib_tpu.ops.fft import Domain
    from gingerlib_tpu.parallel.sharded import (
        sharded_msm_scan, sharded_fft, cyclic_layout, sharded_poseidon_2_1)
    from gingerlib_tpu.primitives.poseidon import PoseidonParams, PoseidonHash

    devs = jax.devices()
    sizes = [d for d in (1, 2, 4, 8) if d <= len(devs)]
    reps = int(os.environ.get("SCALING_REPS", "3"))
    results = {}

    def bench(fn, *args):
        out = fn(*args)
        jax.tree.map(np.asarray, out)      # completion barrier
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.tree.map(np.asarray, out)
        return (time.perf_counter() - t0) / reps

    def emit(pipeline, ndev, n_items, dt, unit):
        tput = n_items / dt
        base = results.setdefault(pipeline, tput if ndev == 1 else None)
        eff = None
        if results[pipeline]:
            eff = round(tput / (results[pipeline] * ndev), 4)
        print(json.dumps({
            "pipeline": pipeline, "ndev": ndev,
            "throughput": round(tput, 2), "unit": unit,
            "efficiency_vs_1dev": eff}), flush=True)

    # --- Poseidon (mnt4753, batch 2^12) ---
    h = PoseidonHash(PoseidonParams.mnt4753())
    n = 1 << int(os.environ.get("SCALING_POSEIDON_LOG2", "12"))
    rng = np.random.RandomState(5)
    lr = [jnp.asarray(np.stack([
        fpmod.fp_from_int(h.F, int.from_bytes(rng.bytes(94), "little")
                          % h.F.modulus) for _ in range(256)]))
        for _ in range(2)]
    left = jnp.tile(lr[0], (n // 256, 1))
    right = jnp.tile(lr[1], (n // 256, 1))
    for ndev in sizes:
        mesh = Mesh(np.array(devs[:ndev]), ("data",))
        fn = jax.jit(lambda l, r, m=mesh: sharded_poseidon_2_1(h, m, l, r))
        dt = bench(fn, left, right)
        emit("poseidon_2to1", ndev, n, dt, "hashes/s")

    # --- FFT (mnt4753 Fr, 2^14) ---
    fr = PP.MNT4753_FR
    m = 1 << int(os.environ.get("SCALING_FFT_LOG2", "14"))
    dom = Domain(fr, m)
    coeffs = jnp.asarray(np.tile(np.asarray(lr[0]), (m // 256, 1)))
    for ndev in sizes:
        mesh = Mesh(np.array(devs[:ndev]), ("data",))
        if ndev == 1:
            fn = jax.jit(dom.fft)
            dt = bench(fn, coeffs)
        else:
            fn = jax.jit(lambda c, m_=mesh, d=ndev: sharded_fft(
                dom, m_, cyclic_layout(c, d)))
            dt = bench(fn, coeffs)
        emit("fft", ndev, m, dt, "elems/s")

    # --- MSM (G1 mnt4753, 2^10 points, scan form for compile-leanness) ---
    g1 = CI.mnt4753_g1()
    nmsm = 1 << int(os.environ.get("SCALING_MSM_LOG2", "10"))
    ks = [3 + 7 * i for i in range(256)]
    kd = jnp.asarray(limbs.to_digits_batch(ks, g1.scalar_field.n_digits))
    pts = jax.jit(g1.mul_scalar_digits)(g1.generator((256,)), kd)
    xs0, ys0 = jax.jit(g1.to_affine)(pts)
    xs = jnp.tile(xs0, (nmsm // 256, 1, 1))
    ys = jnp.tile(ys0, (nmsm // 256, 1, 1))
    nbits = 64
    srng = np.random.RandomState(9)
    svals = [int(v) for v in srng.randint(1, 1 << 62, size=nmsm)]
    bits = np.zeros((nmsm, nbits), np.uint32)
    for i, v in enumerate(svals):
        for b in range(nbits):
            bits[i, b] = (v >> (nbits - 1 - b)) & 1
    bits = jnp.asarray(bits)
    for ndev in sizes:
        mesh = Mesh(np.array(devs[:ndev]), ("data",))
        fn = jax.jit(lambda x, y, b, m_=mesh: sharded_msm_scan(
            g1, m_, x, y, b))
        dt = bench(fn, xs, ys, bits)
        emit("msm_scan", ndev, nmsm, dt, "points/s")


if __name__ == "__main__":
    main()
