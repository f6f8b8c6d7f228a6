#!/usr/bin/env python3
"""Headline benchmark: variable-base MSM points/sec on MNT4-753 G1.

Runs on whatever JAX backend the environment provides (the driver runs it
on one real TPU chip).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline compares against the reference's CPU Pippenger throughput; the
reference publishes no numbers (BASELINE.md), so we use a fixed estimate of
a modern multicore CPU running ginger-lib's rayon Pippenger on MNT4-753
(~6e4 points/sec at 2^16; see BASELINE.md for provenance).
"""

import json
import os
import sys
import time

N_LOG2 = int(os.environ.get("BENCH_MSM_LOG2", "12"))
CPU_BASELINE_PPS = 6.0e4


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.ops import msm as msm_mod, limbs
    from gingerlib_tpu.fields import fp as fpmod

    g1 = CI.mnt4753_g1()
    fr = g1.scalar_field
    n = 1 << N_LOG2

    # build n pseudo-random points cheaply: [k_i]G with small scalars
    rng = np.random.RandomState(42)
    ks = rng.randint(1, 1 << 30, size=n).astype(object)
    kd = jnp.asarray(limbs.to_digits_batch(list(ks), fr.n_digits))
    G = g1.generator((n,))
    pts = jax.jit(lambda G, kd: g1.mul_scalar_digits(G, kd))(G, kd)
    xs, ys = jax.jit(g1.to_affine)(pts)
    np.asarray(xs)

    scalars = [int.from_bytes(rng.bytes(94), "little") % fr.modulus
               for _ in range(n)]
    sd = jnp.asarray(limbs.to_digits_batch(scalars, fr.n_digits))

    def fetch(out):
        # block_until_ready does NOT block on the tunneled TPU backend;
        # a device->host fetch is the only reliable completion barrier
        np.asarray(out[0])

    run = jax.jit(lambda xs, ys, sd: msm_mod.msm(g1, xs, ys, sd))
    out = run(xs, ys, sd)
    fetch(out)  # compile + first run

    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(xs, ys, sd)
    fetch(out)
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
