"""Multi-scalar multiplication (Pippenger) — TPU-native formulation.

Replaces the reference's VariableBaseMSM (algebra/src/msm/variable_base.rs)
whose bucket phase is a data-dependent scatter loop (:36-59).  Scatters are
poison on TPU, so each window instead does:

1. sort points by their c-bit window digit (XLA sort — fine on TPU),
2. build a dyadic partial-sum tree over the sorted points (upsweep: N adds
   in log N shrinking-shape stages — all batched EC adds),
3. for every bucket boundary, reconstruct the prefix sum "all points with
   digit < b" Fenwick-style from log N tree nodes (vectorized gathers +
   masked adds across all 2^c buckets at once),
4. window sum via the suffix identity  Σ_b b·S_b = Σ_{b>=1} (Total − prefix_b)
   — a plain tree reduction, no sequential running sum,
5. horizontal fold of windows with c doublings each
   (variable_base.rs:76-82).

Work per window ≈ N + 2^c·log N point-adds, all in log-depth batched form.

``FixedBaseMSM`` (msm/fixed_base.rs) is windowed-table scalar mul of a single
base: table built by doubling, lookup via gather.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from . import limbs
from ..curves.sw import SWCurveOps


def _window_digits(scalar_digits, c: int, nbits: int):
    """[N, nd] uint32 base-2^16 digits -> [W, N] c-bit window values."""
    W = -(-nbits // c)
    N = scalar_digits.shape[0]
    nd = scalar_digits.shape[1]
    out = []
    for w in range(W):
        lo_bit = w * c
        j, r = lo_bit // 16, lo_bit % 16
        v = scalar_digits[:, j] >> r
        if j + 1 < nd:
            v = v | (scalar_digits[:, j + 1] << (16 - r)).astype(jnp.uint32)
        if j + 2 < nd and r > 0 and c > (32 - r):
            v = v | (scalar_digits[:, j + 2] << (32 - r)).astype(jnp.uint32)
        out.append(v & ((1 << c) - 1))
    return jnp.stack(out)  # [W, N]


def _tree_levels(curve: SWCurveOps, pts):
    """Dyadic upsweep: levels[l][i] = sum of sorted pts [i*2^l, (i+1)*2^l)."""
    levels = [pts]
    cur = pts
    while cur[0].shape[0] > 1:
        even = tuple(c[0::2] for c in cur)
        odd = tuple(c[1::2] for c in cur)
        cur = curve.add(even, odd)
        levels.append(cur)
    return levels


def _prefix_at(curve: SWCurveOps, levels, m):
    """Inclusive prefix sums at counts m [B] (sum of first m_i sorted pts).

    Fenwick decomposition of each count into dyadic blocks; one masked,
    vectorized add per level.
    """
    B = m.shape[0]
    acc = curve.zero((B,))
    offset = jnp.zeros_like(m)
    n_levels = len(levels)
    for l in range(n_levels - 1, -1, -1):
        bit = (m >> l) & 1
        take = bit == 1
        node_idx = offset >> l
        node_idx = jnp.minimum(node_idx, levels[l][0].shape[0] - 1)
        node = tuple(jnp.take(c, node_idx, axis=0) for c in levels[l])
        added = curve.add(acc, node)
        acc = curve.select(take, added, acc)
        offset = offset + (bit << l)
    return acc


def _tree_reduce(curve: SWCurveOps, pts):
    cur = pts
    n = cur[0].shape[0]
    while n > 1:
        if n % 2 == 1:
            pad = curve.zero((1,))
            cur = tuple(jnp.concatenate([c, p], axis=0)
                        for c, p in zip(cur, pad))
            n += 1
        even = tuple(c[0::2] for c in cur)
        odd = tuple(c[1::2] for c in cur)
        cur = curve.add(even, odd)
        n = cur[0].shape[0]
    return cur


def default_window(n: int) -> int:
    """Window size heuristic minimizing N + 2^c·log N per window across
    753/c windows (cf. the ln-based heuristic, variable_base.rs:14)."""
    if n < (1 << 8):
        return 3
    if n < (1 << 12):
        return 6
    if n < (1 << 16):
        return 9
    if n < (1 << 20):
        return 11
    return 13


def msm(curve: SWCurveOps, xs, ys, scalar_digits, c: int | None = None,
        nbits: int | None = None, inf_mask=None):
    """Variable-base MSM: Σ [k_i]·P_i.

    xs, ys: affine coordinates [N, K, nd]; scalar_digits: standard-form
    digit arrays [N, nd_r]; inf_mask: optional [N] bool marking
    points-at-infinity (treated as zero).
    Returns a projective point (batch shape ()).
    """
    P = curve.scalar_field
    if nbits is None:
        nbits = P.modulus_bits
    N = xs.shape[0]
    if c is None:
        c = default_window(N)
    W = -(-nbits // c)

    one = jnp.broadcast_to(jnp.asarray(curve.F.one()), xs.shape)
    zero_pt = curve.zero((N,))
    pts = (xs, ys, one)
    if inf_mask is not None:
        pts = curve.select(inf_mask, zero_pt, pts)

    windows = _window_digits(scalar_digits, c, nbits)  # [W, N]
    B = (1 << c) - 1

    def one_window(keys):
        order = jnp.argsort(keys)
        keys_s = jnp.take(keys, order, axis=0)
        pts_s = tuple(jnp.take(coord, order, axis=0) for coord in pts)
        # zero out bucket-0 points so they never contribute
        pts_s = curve.select(keys_s == 0, curve.zero((N,)), pts_s)
        levels = _tree_levels(curve, pts_s)
        total = tuple(coord[0] for coord in levels[-1])
        # m_b = #elements with key < b  (b = 1..B)
        bvals = jnp.arange(1, B + 1, dtype=keys_s.dtype)
        m = jnp.searchsorted(keys_s, bvals, side="left").astype(jnp.uint32)
        prefixes = _prefix_at(curve, levels, m)
        # suffix_b = Total − prefix_b ; window sum = Σ_b suffix_b
        tot_b = tuple(jnp.broadcast_to(coord, (B,) + coord.shape)
                      for coord in total)
        suffix = curve.add(tot_b, curve.neg(prefixes))
        wsum = _tree_reduce(curve, suffix)
        return tuple(coord[0] for coord in wsum)

    # all windows in parallel via vmap (the TPU form of rayon-over-windows,
    # variable_base.rs:30): every tree level / Fenwick step then runs as one
    # [chunk·N]-batch field op instead of W sequential small ones.  Chunked
    # so the [chunk, N, K, nd] sorted-point copies stay within memory.
    chunk = min(W, max(1, (1 << 22) // max(N, 1)))
    Wp = -(-W // chunk) * chunk
    if Wp != W:
        # zero-key windows contribute the identity (bucket 0 is masked out)
        windows = jnp.concatenate(
            [windows, jnp.zeros((Wp - W, N), windows.dtype)], axis=0)
    vf = jax.vmap(one_window)
    chunks = [vf(windows[s:s + chunk]) for s in range(0, Wp, chunk)]
    window_sums = tuple(jnp.concatenate(cs, axis=0)[:W]
                        for cs in zip(*chunks))

    # horizontal fold: result = Σ_w 2^{cw} S_w, MSB window first
    def fold(res, wsum):
        for _ in range(c):
            res = curve.double(res)
        return curve.add(res, wsum), None

    rev = tuple(coord[::-1] for coord in window_sums)
    res, _ = jax.lax.scan(fold, curve.zero(()), rev)
    return res


def msm_bucketed(curve: SWCurveOps, xs, ys, scalar_digits, inf_mask=None,
                 c: int | None = None):
    """msm() with the point count padded to the next power of two (zero
    scalars on dummy points), so repeated prover calls with ragged lengths
    reuse one compiled graph per bucket."""
    n = xs.shape[0]
    n2 = 1 << max(0, (n - 1).bit_length())
    if n2 != n:
        pad = n2 - n
        xs = jnp.concatenate([xs, jnp.broadcast_to(xs[:1], (pad,) + xs.shape[1:])])
        ys = jnp.concatenate([ys, jnp.broadcast_to(ys[:1], (pad,) + ys.shape[1:])])
        scalar_digits = jnp.concatenate(
            [scalar_digits, jnp.zeros((pad,) + scalar_digits.shape[1:],
                                      scalar_digits.dtype)])
        if inf_mask is not None:
            inf_mask = jnp.concatenate(
                [inf_mask, jnp.ones((pad,), inf_mask.dtype)])
    return msm(curve, xs, ys, scalar_digits, c=c, inf_mask=inf_mask)


def msm_naive(curve: SWCurveOps, xs, ys, scalar_digits, inf_mask=None):
    """Test oracle: Σ [k_i]P_i via per-point double-and-add + tree reduce."""
    one = jnp.broadcast_to(jnp.asarray(curve.F.one()), xs.shape)
    pts = (xs, ys, one)
    if inf_mask is not None:
        pts = curve.select(inf_mask, curve.zero((xs.shape[0],)), pts)
    prods = curve.mul_scalar_digits(pts, scalar_digits)
    return tuple(c[0] for c in _tree_reduce(curve, prods))


def fixed_base_msm(curve: SWCurveOps, base_affine, scalar_digits,
                   nbits: int | None = None):
    """[k_i]·G for many scalars of one base (msm/fixed_base.rs).

    v1: broadcast the base and run batched double-and-add; the windowed
    table variant comes with the Pallas kernel pass.
    """
    N = scalar_digits.shape[0]
    gx, gy = base_affine
    shape = (N,) + gx.shape[-2:]
    pt = (jnp.broadcast_to(gx, shape), jnp.broadcast_to(gy, shape),
          jnp.broadcast_to(jnp.asarray(curve.F.one()), shape))
    return curve.mul_scalar_digits(pt, scalar_digits)
