"""Sweep the RNS Montgomery kernel tile size on the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gingerlib_tpu import params as PP
from gingerlib_tpu.ops import rns, pallas_rns

q = PP.MNT4753_FQ.modulus
ctx = rns.make_context(q)
rng = np.random.RandomState(9)
n = 1 << int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 14
base = [int.from_bytes(rng.bytes(94), "little") % q for _ in range(256)]
xs = (base * ((n // 256) + 1))[:n]
x = pallas_rns.pack_rns(ctx, *rns.to_rns(ctx, xs))
y = x[:, ::-1]

for tile in (128, 256, 512, 1024, 2048, 4096):
    if tile > n:
        continue
    run = jax.jit(lambda x, y, t=tile: pallas_rns.mont_mul_rns_pallas(
        q, x, y, tile=t))
    try:
        out = np.asarray(run(x, y))
    except Exception as e:
        print(f"tile={tile} FAILED: {type(e).__name__}: {e}")
        continue
    # correctness gate before timing: a tile size that compiles but
    # miscomputes must not be reported as "fastest" (advisor round 2)
    ncheck = 8
    ra, _ = pallas_rns.unpack_rns(ctx, jnp.asarray(out))
    got = rns.from_rns(ctx, np.asarray(ra)[:ncheck])
    ys = xs[::-1]
    bad = [i for i in range(ncheck)
           if got[i] % q != xs[i] * ys[i] * pow(ctx.MA, -1, q) % q]
    if bad:
        print(f"tile={tile} MISCOMPUTES at columns {bad}; skipping")
        continue
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = run(x, y)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps
    print(f"tile={tile} batch={n} {n/dt/1e6:.2f} Mmul/s ({dt*1e3:.2f} ms)")
