"""On-chip MSM at the BASELINE target size 2^20 (G1 MNT4-753).

Times the digit-major hybrid Pippenger (ops/msm.msm_hybrid) at 2^20 with
configurable window parameters, using host-generated points (bench.py's
incremental-addition generator, cached npz).  Prints JSON lines.

    MSM20_C=13 MSM20_WC=4 python benchmarks/msm_2e20.py

Reference window math: msm/variable_base.rs:14-18 (ln-based heuristic).
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
    import bench as B
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.ops import msm as M

    B._setup_jax()
    g1 = CI.mnt4753_g1()
    fr = g1.scalar_field
    log2 = int(os.environ.get("MSM20_LOG2", "20"))
    n = 1 << log2
    c = os.environ.get("MSM20_C")
    c = int(c) if c else None
    wc = os.environ.get("MSM20_WC")
    wc = int(wc) if wc else None
    cutoff = int(os.environ.get("MSM20_CUTOFF", str(1 << 15)))

    t0 = time.time()
    xs_np, ys_np = B._host_points(g1, log2)
    print(f"points ready {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
    xs, ys = jnp.asarray(xs_np), jnp.asarray(ys_np)
    sd = B._rand_scalar_digits(fr, n)

    run = jax.jit(lambda x, y, s: M.msm_hybrid(
        g1, x, y, s, c=c, window_chunk=wc, affine_cutoff=cutoff))
    t0 = time.time()
    out = run(xs, ys, sd)
    np.asarray(out[0])
    first = time.time() - t0
    print(f"first pass {first:.1f}s", file=sys.stderr, flush=True)
    reps = 1 if first > 300 else 2
    t0 = time.time()
    for _ in range(reps):
        out = run(xs, ys, sd)
    np.asarray(out[0])
    dt = (time.time() - t0) / reps
    print(json.dumps({
        "metric": f"msm_hybrid_2e{log2}", "pts_per_s": round(n / dt, 1),
        "first_s": round(first, 1), "steady_s": round(dt, 2),
        "c": c, "window_chunk": wc, "affine_cutoff": cutoff}), flush=True)


if __name__ == "__main__":
    main()
