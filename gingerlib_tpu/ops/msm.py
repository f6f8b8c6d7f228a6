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


# ---------------------------------------------------------------------------
# batched-affine Pippenger (production path)
# ---------------------------------------------------------------------------
#
# Same sort/tree/Fenwick structure as msm() above, but every EC addition is
# affine with ONE shared inversion per batched add (curve.batch_affine_add):
# ~7 field muls per add (incl. the 3-mul batch-inversion overhead) instead of
# ~30 for the unified projective path — the TPU analogue of the reference's
# affine bucket running-sums after batch_normalization
# (msm/variable_base.rs:60-66).

def _apt_slice(pt, sl):
    (x, y), inf = pt
    return ((x[sl], y[sl]), inf[sl])


def _apt_gather(pt, idx):
    (x, y), inf = pt
    return ((jnp.take(x, idx, axis=0), jnp.take(y, idx, axis=0)),
            jnp.take(inf, idx, axis=0))


def _apt_select(mask, a, b):
    m = mask[..., None, None]
    return ((jnp.where(m, a[0][0], b[0][0]), jnp.where(m, a[0][1], b[0][1])),
            jnp.where(mask, a[1], b[1]))


def _apt_zero(curve, batch_shape):
    shape = tuple(batch_shape) + (curve.F.K, curve.fp.n_digits)
    z = jnp.zeros(shape, jnp.uint32)
    return ((z, z), jnp.ones(batch_shape, bool))


def _affine_tree_levels(curve, pt):
    levels = [pt]
    cur = pt
    while cur[0][0].shape[0] > 1:
        cur = curve.batch_affine_add(_apt_slice(cur, np.s_[0::2]),
                                     _apt_slice(cur, np.s_[1::2]))
        levels.append(cur)
    return levels


def _affine_prefix_at(curve, levels, m):
    """Inclusive prefix sums at counts m [B] over stored tree levels
    (Fenwick decomposition, cf. _prefix_at)."""
    B = m.shape[0]
    acc = _apt_zero(curve, (B,))
    offset = jnp.zeros_like(m)
    for l in range(len(levels) - 1, -1, -1):
        bit = (m >> l) & 1
        node_idx = jnp.minimum(offset >> l,
                               levels[l][0][0].shape[0] - 1)
        node = _apt_gather(levels[l], node_idx)
        added = curve.batch_affine_add(acc, node)
        acc = _apt_select(bit == 1, added, acc)
        offset = offset + (bit << l)
    return acc


def msm_affine(curve: SWCurveOps, xs, ys, scalar_digits,
               c: int | None = None, nbits: int | None = None,
               inf_mask=None, window_chunk: int | None = None):
    """Variable-base MSM with batched-affine additions.  Same contract as
    msm(); N is padded to a power of two internally.  Windows run in a
    lax.scan over chunks of `window_chunk` vmapped windows — chunking
    batches the per-add root inversions across windows (the single
    inversion's ~2·nbits sequential multiplies are latency, not
    throughput), while keeping peak memory to `chunk` windows' trees."""
    P = curve.scalar_field
    if nbits is None:
        nbits = P.modulus_bits
    N = xs.shape[0]
    if inf_mask is None:
        inf_mask = jnp.zeros((N,), bool)
    n2 = 1 << max(0, (N - 1).bit_length())
    if n2 != N:
        pad = n2 - N
        xs = jnp.concatenate([xs, jnp.zeros((pad,) + xs.shape[1:],
                                            xs.dtype)])
        ys = jnp.concatenate([ys, jnp.zeros((pad,) + ys.shape[1:],
                                            ys.dtype)])
        scalar_digits = jnp.concatenate(
            [scalar_digits, jnp.zeros((pad,) + scalar_digits.shape[1:],
                                      scalar_digits.dtype)])
        inf_mask = jnp.concatenate([inf_mask, jnp.ones((pad,), bool)])
        N = n2
    if c is None:
        c = default_window(N)
    W = -(-nbits // c)
    windows = _window_digits(scalar_digits, c, nbits)  # [W, N]
    B = (1 << c) - 1

    def one_window(keys):
        order = jnp.argsort(keys)
        keys_s = jnp.take(keys, order, axis=0)
        pt_s = _apt_gather(((xs, ys), inf_mask), order)
        # bucket-0 points never contribute
        pt_s = (pt_s[0], pt_s[1] | (keys_s == 0))
        # zero coords on dead lanes so equal-garbage pairs can't fake
        # doubling lanes
        mz = pt_s[1][..., None, None]
        pt_s = ((jnp.where(mz, 0, pt_s[0][0]),
                 jnp.where(mz, 0, pt_s[0][1])), pt_s[1])
        levels = _affine_tree_levels(curve, pt_s)
        total = levels[-1]
        bvals = jnp.arange(1, B + 1, dtype=keys_s.dtype)
        m = jnp.searchsorted(keys_s, bvals, side="left").astype(jnp.uint32)
        prefixes = _affine_prefix_at(curve, levels, m)
        # suffix_b = Total − prefix_b ; window sum = Σ_b suffix_b
        tot_b = ((jnp.broadcast_to(total[0][0], (B,) + total[0][0].shape[1:]),
                  jnp.broadcast_to(total[0][1], (B,) + total[0][1].shape[1:])),
                 jnp.broadcast_to(total[1], (B,)))
        neg_pre = ((prefixes[0][0], curve.F.neg(prefixes[0][1])),
                   prefixes[1])
        suffix = curve.batch_affine_add(tot_b, neg_pre)
        # pad B = 2^c − 1 to 2^c with infinity, then tree reduce
        padded = ((jnp.concatenate([suffix[0][0],
                                    jnp.zeros_like(suffix[0][0][:1])]),
                   jnp.concatenate([suffix[0][1],
                                    jnp.zeros_like(suffix[0][1][:1])])),
                  jnp.concatenate([suffix[1], jnp.ones((1,), bool)]))
        wsum = _affine_tree_levels(curve, padded)[-1]
        return (wsum[0][0][0], wsum[0][1][0], wsum[1][0])

    if window_chunk is None:
        window_chunk = int(min(8, max(1, (1 << 23) // max(N, 1))))
    Wp = -(-W // window_chunk) * window_chunk
    if Wp != W:
        # extra all-zero-digit windows sum to infinity and are dropped
        windows = jnp.concatenate(
            [windows, jnp.zeros((Wp - W, N), windows.dtype)], axis=0)
    wchunks = windows.reshape(Wp // window_chunk, window_chunk, N)

    def chunk_body(carry, keys_chunk):
        return carry, jax.vmap(one_window)(keys_chunk)

    _, (wx, wy, winf) = jax.lax.scan(chunk_body, None, wchunks)
    wx = wx.reshape((Wp,) + wx.shape[2:])[:W]
    wy = wy.reshape((Wp,) + wy.shape[2:])[:W]
    winf = winf.reshape((Wp,))[:W]

    # horizontal fold in projective (tiny: W·(c+1) ops on batch 1)
    one = jnp.broadcast_to(jnp.asarray(curve.F.one()), wx.shape[1:])
    zero = jnp.zeros_like(wx[0])
    wz = jnp.where(winf[..., None, None], zero[None], one[None])
    wy_p = jnp.where(winf[..., None, None], one[None], wy)

    def fold(res, wsum):
        for _ in range(c):
            res = curve.double(res)
        return curve.add(res, wsum), None

    rev = (wx[::-1], wy_p[::-1], wz[::-1])
    res, _ = jax.lax.scan(fold, curve.zero(()), rev)
    return res


def msm_bucketed(curve: SWCurveOps, xs, ys, scalar_digits, inf_mask=None,
                 c: int | None = None):
    """Prover-facing MSM entry: digit-major hybrid Pippenger on TPU
    (GINGERLIB_MSM_HYBRID, default on — batched-affine kernels for the
    big tree levels, fused projective below the cutoff, one launch per
    level across a whole window chunk), batched-affine Pippenger as the
    TPU fallback rung, projective Pippenger elsewhere — the XLA form of
    the affine path embeds one BEA while-loop per add and compiles
    catastrophically slowly on XLA:CPU.  All pad N internally, so
    repeated prover calls with ragged lengths reuse one compiled graph
    per bucket."""
    import os
    from .pallas_mont import use_pallas
    from . import pallas_ec
    if use_pallas():
        # small-N rung: one batched double-and-add scan.  Pippenger's
        # window/bucket machinery is ALL fixed cost at small N — on the
        # remote-compile TPU backend the hybrid's ~86 MB executable costs
        # minutes to compile or cache-load per process (round-5
        # measurement at N=2^7..2^11 prover queries) while the scan form
        # is ~2 s of runtime and a few-MB program.  Threshold overridable
        # via GINGERLIB_MSM_NAIVE_BELOW (points).
        naive_below = int(os.environ.get("GINGERLIB_MSM_NAIVE_BELOW",
                                         str(1 << 12)))
        if xs.shape[0] < naive_below:
            return msm_naive(curve, xs, ys, scalar_digits,
                             inf_mask=inf_mask)
        if os.environ.get("GINGERLIB_MSM_HYBRID", "1") != "0" \
                and pallas_ec.supports(curve):
            return msm_hybrid(curve, xs, ys, scalar_digits, c=c,
                              inf_mask=inf_mask)
        return msm_affine(curve, xs, ys, scalar_digits, c=c,
                          inf_mask=inf_mask)
    n2 = 1 << max(0, (xs.shape[0] - 1).bit_length())
    if n2 != xs.shape[0]:
        pad = n2 - xs.shape[0]
        if inf_mask is None:
            inf_mask = jnp.zeros((xs.shape[0],), bool)
        xs = jnp.concatenate([xs, jnp.zeros((pad,) + xs.shape[1:],
                                            xs.dtype)])
        ys = jnp.concatenate([ys, jnp.zeros((pad,) + ys.shape[1:],
                                            ys.dtype)])
        scalar_digits = jnp.concatenate(
            [scalar_digits,
             jnp.zeros((pad,) + scalar_digits.shape[1:],
                       scalar_digits.dtype)])
        inf_mask = jnp.concatenate([inf_mask, jnp.ones((pad,), bool)])
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

    v1: broadcast the base and run batched double-and-add (kept as the
    oracle; fixed_base_msm_windowed is the production path).
    """
    N = scalar_digits.shape[0]
    gx, gy = base_affine
    shape = (N,) + gx.shape[-2:]
    pt = (jnp.broadcast_to(gx, shape), jnp.broadcast_to(gy, shape),
          jnp.broadcast_to(jnp.asarray(curve.F.one()), shape))
    return curve.mul_scalar_digits(pt, scalar_digits)


def fixed_base_table(curve: SWCurveOps, base_affine, w: int, nbits: int):
    """Windowed multiples table for one base (msm/fixed_base.rs:15-43,
    get_window_table): returns ((tx, ty), tinf) of shape [W, 2^w, ...] with
    T[i][j] = j · 2^(w·i) · G.

    Built device-side: W·w sequential doublings for the window bases, then
    log2(2^w) doubling/adding levels batched across all windows (each level
    one shared-inversion batched-affine op).
    """
    W = -(-nbits // w)
    gx, gy = base_affine
    K, nd = gx.shape[-2:]

    # window bases B_i = 2^(w·i) G via a scan of w doublings (projective)
    def dbl_w(pt, _):
        out = pt
        for _ in range(w):
            out = curve.double(out)
        return out, pt

    g_proj = (gx, gy, jnp.asarray(curve.F.one()))
    _, bases = jax.lax.scan(dbl_w, g_proj, None, length=W)
    bx, by = curve.to_affine(bases)  # [W, K, nd] (batched inversion inside)

    # multiples 0..2^w-1 of each base, doubling levels:
    # entries [W, 2^k] -> [W, 2^(k+1)] as (2T, 2T + B)
    tx = jnp.concatenate([jnp.zeros((W, 1, K, nd), jnp.uint32),
                          bx[:, None]], axis=1)
    ty = jnp.concatenate([jnp.zeros((W, 1, K, nd), jnp.uint32),
                          by[:, None]], axis=1)
    tinf = jnp.concatenate([jnp.ones((W, 1), bool),
                            jnp.zeros((W, 1), bool)], axis=1)
    binf = jnp.zeros((W,), bool)
    while tx.shape[1] < (1 << w):
        n = tx.shape[1]
        flat = ((tx.reshape(W * n, K, nd), ty.reshape(W * n, K, nd)),
                tinf.reshape(W * n))
        dbl = curve.batch_affine_add(flat, flat)
        bxx = jnp.broadcast_to(bx[:, None], (W, n, K, nd)).reshape(
            W * n, K, nd)
        byy = jnp.broadcast_to(by[:, None], (W, n, K, nd)).reshape(
            W * n, K, nd)
        bif = jnp.broadcast_to(binf[:, None], (W, n)).reshape(W * n)
        dbl1 = curve.batch_affine_add(dbl, ((bxx, byy), bif))
        # interleave: new[2j] = 2·T[j], new[2j+1] = 2·T[j] + B
        nx = jnp.stack([dbl[0][0].reshape(W, n, K, nd),
                        dbl1[0][0].reshape(W, n, K, nd)], axis=2)
        ny = jnp.stack([dbl[0][1].reshape(W, n, K, nd),
                        dbl1[0][1].reshape(W, n, K, nd)], axis=2)
        ni = jnp.stack([dbl[1].reshape(W, n), dbl1[1].reshape(W, n)],
                       axis=2)
        tx = nx.reshape(W, 2 * n, K, nd)
        ty = ny.reshape(W, 2 * n, K, nd)
        tinf = ni.reshape(W, 2 * n)
    return (tx, ty), tinf


def fixed_base_table_scan(curve: SWCurveOps, base_affine, w: int,
                          nbits: int):
    """Same table as :func:`fixed_base_table`, built as ONE batched
    double-and-add scan over all W·2^w entry scalars j·2^(w·i).

    Compile-lean form for the remote AOT helper: the level-doubling
    construction unrolls log2(2^w) batch_affine_add stages (BEA inversion
    chains inlined per stage) and its MLIR reaches ~11 MB for a G2-sized
    field — the compile helper subprocess is OOM-killed (round-5
    measurement).  Here the whole build is one lax.scan + one batched
    affine conversion; runtime cost is ~nbits batched double/adds, paid
    once per (curve, w) per process.
    """
    W = -(-nbits // w)
    gx, gy = base_affine
    K, nd = gx.shape[-2:]
    n_entries = W << w
    scalars = [j << (w * i) for i in range(W) for j in range(1 << w)]
    kd = jnp.asarray(limbs.to_digits_batch(scalars,
                                           curve.scalar_field.n_digits))
    shape = (n_entries, K, nd)
    pt = (jnp.broadcast_to(gx, shape), jnp.broadcast_to(gy, shape),
          jnp.broadcast_to(jnp.asarray(curve.F.one()), shape))
    prod = curve.mul_scalar_digits(pt, kd)
    ax, ay = curve.to_affine(prod)
    inf = jnp.asarray(np.asarray([s == 0 for s in scalars]))
    ax = jnp.where(inf[:, None, None], 0, ax)
    ay = jnp.where(inf[:, None, None], 0, ay)
    return ((ax.reshape(W, 1 << w, K, nd), ay.reshape(W, 1 << w, K, nd)),
            inf.reshape(W, 1 << w))


def fixed_base_msm_windowed(curve: SWCurveOps, table, scalar_digits,
                            w: int, nbits: int):
    """[k_i]·G via a precomputed fixed_base_table: one table gather per
    window per scalar + a batched-affine tree reduce across windows
    (msm/fixed_base.rs:69-79 windowed_mul, batch-first).  Returns
    ((x, y), inf) affine points [N, ...]."""
    (tx, ty), tinf = table
    W = tx.shape[0]
    N = scalar_digits.shape[0]
    K, nd = tx.shape[-2:]
    digits = _window_digits(scalar_digits, w, nbits)  # [W_s, N]
    assert digits.shape[0] <= W, (digits.shape, W)
    Ws = digits.shape[0]

    # gather T[i][digit_i] for each scalar -> [Ws, N] points
    gx = jax.vmap(lambda t, d: jnp.take(t, d, axis=0))(tx[:Ws], digits)
    gy = jax.vmap(lambda t, d: jnp.take(t, d, axis=0))(ty[:Ws], digits)
    gi = jax.vmap(lambda t, d: jnp.take(t, d, axis=0))(tinf[:Ws], digits)

    # tree reduce across the window axis (pad to pow2 with infinity)
    W2 = 1 << max(0, (Ws - 1).bit_length())
    if W2 != Ws:
        pad = W2 - Ws
        gx = jnp.concatenate([gx, jnp.zeros((pad, N, K, nd), jnp.uint32)])
        gy = jnp.concatenate([gy, jnp.zeros((pad, N, K, nd), jnp.uint32)])
        gi = jnp.concatenate([gi, jnp.ones((pad, N), bool)])
    while gx.shape[0] > 1:
        h = gx.shape[0] // 2
        a = ((gx[0::2].reshape(h * N, K, nd),
              gy[0::2].reshape(h * N, K, nd)), gi[0::2].reshape(h * N))
        b = ((gx[1::2].reshape(h * N, K, nd),
              gy[1::2].reshape(h * N, K, nd)), gi[1::2].reshape(h * N))
        (ox, oy), oi = curve.batch_affine_add(a, b)
        gx = ox.reshape(h, N, K, nd)
        gy = oy.reshape(h, N, K, nd)
        gi = oi.reshape(h, N)
    return (gx[0], gy[0]), gi[0]


# ---------------------------------------------------------------------------
# hybrid Pippenger (production TPU path): digit-major end-to-end,
# batched-affine adds for the big tree levels, fused projective adds
# (zero inversions) below the cutoff
# ---------------------------------------------------------------------------
#
# Round-3 on-chip profiling: each batched-affine stage pays a fixed
# ~2.5 ms BEA root inversion + kernel-launch chain, which dominates once
# the stage batch is small — the old msm_affine spent ~90% of its time in
# ~370 such small stages.  An affine add saves ~13 Montgomery multiplies
# over a unified projective add, so at ~80 M mul/s the affine form only
# wins above ~28k lanes per stage.  msm_hybrid therefore:
#   * keeps every point/node in digit-major [128 digit rows, lanes]
#     layout end-to-end (no per-stage transposes),
#   * windows are FLATTENED into the lane axis (window-major), so a chunk
#     of `window_chunk` windows runs each tree/Fenwick level as ONE
#     kernel launch over wc*N lanes,
#   * levels with >= `affine_cutoff` output lanes use the batched-affine
#     kernels (7 muls/add + one shared inversion); smaller levels, the
#     whole Fenwick phase and the suffix fold use the fused unified
#     projective kernel (~20 muls/add, NO inversion),
#   * window sum via  sum_b b*S_b = B*Total - sum_b prefix_b  (one tiny
#     negation instead of B per-bucket suffix subtractions).

def _aff_to_proj_dm(curve, x, y, inf_row, one_dm):
    m = inf_row[0:1, :] != 0
    X = jnp.where(m, 0, x)
    Y = jnp.where(m, jnp.broadcast_to(one_dm, y.shape), y)
    Z = jnp.where(m, 0, jnp.broadcast_to(one_dm, y.shape))
    return X, Y, Z


def msm_hybrid(curve: SWCurveOps, xs, ys, scalar_digits,
               c: int | None = None, nbits: int | None = None,
               inf_mask=None, window_chunk: int | None = None,
               affine_cutoff: int = 1 << 15):
    from . import pallas_ec as PE
    from ..fields import fp as fpmod

    params = curve.fp
    nd = params.n_digits
    P = curve.scalar_field
    if nbits is None:
        nbits = P.modulus_bits
    N = xs.shape[0]
    if inf_mask is None:
        inf_mask = jnp.zeros((N,), bool)
    n2 = 1 << max(0, (N - 1).bit_length())
    if n2 != N:
        pad = n2 - N
        xs = jnp.concatenate([xs, jnp.zeros((pad,) + xs.shape[1:],
                                            xs.dtype)])
        ys = jnp.concatenate([ys, jnp.zeros((pad,) + ys.shape[1:],
                                            ys.dtype)])
        scalar_digits = jnp.concatenate(
            [scalar_digits, jnp.zeros((pad,) + scalar_digits.shape[1:],
                                      scalar_digits.dtype)])
        inf_mask = jnp.concatenate([inf_mask, jnp.ones((pad,), bool)])
        N = n2
    if c is None:
        c = default_window(N)
    W = -(-nbits // c)
    L = N.bit_length() - 1            # log2(N) tree levels
    windows = _window_digits(scalar_digits, c, nbits)  # [W, N]
    B = (1 << c) - 1

    if window_chunk is None:
        window_chunk = int(min(8, max(1, (1 << 23) // max(N, 1))))
    wc = window_chunk
    Wp = -(-W // wc) * wc
    if Wp != W:
        windows = jnp.concatenate(
            [windows, jnp.zeros((Wp - W, N), windows.dtype)], axis=0)
    wchunks = windows.reshape(Wp // wc, wc, N)

    xrow = xs.reshape(N, nd)
    yrow = ys.reshape(N, nd)
    one_dm = jnp.asarray(PE._mont_consts(params)[1])  # [128, 1]
    interpret = jax.default_backend() != "tpu"

    def padd(a3, b3):
        return PE.proj_add_dm(curve, a3, b3, interpret=interpret)

    def chunk_body(carry, keys):                      # keys [wc, N]
        order = jax.vmap(jnp.argsort)(keys)           # [wc, N]
        keys_s = jnp.take_along_axis(keys, order, axis=1)
        flat = order.reshape(-1)
        x = jnp.take(xrow, flat, axis=0)              # [wc*N, nd]
        y = jnp.take(yrow, flat, axis=0)
        infs = jnp.take(inf_mask, flat) | (keys_s.reshape(-1) == 0)
        x = jnp.where(infs[:, None], 0, x)
        y = jnp.where(infs[:, None], 0, y)
        x_dm = PE._to_dm(x, wc * N)
        y_dm = PE._to_dm(y, wc * N)
        inf_row = jnp.broadcast_to(
            infs.astype(jnp.uint32)[None, :], (8, wc * N))

        # --- tree up-sweep (adjacent pairs stay within their window)
        levels = [("aff", (x_dm, y_dm, inf_row))]
        cur = ("aff", (x_dm, y_dm, inf_row))
        cols = wc * N
        while cols > wc:
            kind, v = cur
            if kind == "aff" and cols // 2 >= affine_cutoff:
                even = tuple(t[:, 0::2] for t in v)
                odd = tuple(t[:, 1::2] for t in v)
                cur = ("aff", PE.batch_affine_add_dm(
                    curve, even, odd, interpret=interpret))
            else:
                if kind == "aff":
                    v = _aff_to_proj_dm(curve, *v, one_dm)
                    cur = ("proj", v)
                even = tuple(t[:, 0::2] for t in v)
                odd = tuple(t[:, 1::2] for t in v)
                cur = ("proj", padd(even, odd))
            levels.append(cur)
            cols //= 2

        kindT, vT = cur
        if kindT == "aff":
            vT = _aff_to_proj_dm(curve, *vT, one_dm)
        total3 = vT                                    # [128, wc] proj

        # --- Fenwick prefixes at counts m (per window, buckets 1..B)
        bvals = jnp.arange(1, B + 1, dtype=keys_s.dtype)
        m = jax.vmap(lambda k: jnp.searchsorted(k, bvals, side="left"))(
            keys_s).astype(jnp.uint32)                # [wc, B]
        mf = m.reshape(-1)
        win_id = (jnp.arange(wc * B, dtype=jnp.uint32) // B)
        accX = jnp.zeros((128, wc * B), jnp.uint32)
        accY = jnp.broadcast_to(one_dm, (128, wc * B))
        accZ = jnp.zeros((128, wc * B), jnp.uint32)
        acc = (accX, accY, accZ)
        offset = jnp.zeros((wc * B,), jnp.uint32)
        # level L (the per-window root) included: m = N (every element
        # below bucket b) decomposes to the single root block
        for l in range(L, -1, -1):
            nodes_per_win = N >> l
            bit = (mf >> l) & 1
            idx_in = jnp.minimum(offset >> l, nodes_per_win - 1)
            gidx = win_id * nodes_per_win + idx_in
            kind, v = levels[l]
            if kind == "aff":
                node = _aff_to_proj_dm(
                    curve, *(jnp.take(t, gidx, axis=1) for t in v), one_dm)
            else:
                node = tuple(jnp.take(t, gidx, axis=1) for t in v)
            added = padd(acc, node)
            mask = (bit == 1)[None, :]
            acc = tuple(jnp.where(mask, a, b) for a, b in zip(added, acc))
            offset = offset + (bit << l).astype(jnp.uint32)

        # --- window sum = B*Total - sum_b prefix_b
        # pad B -> 2^c with projective infinity, then c fold levels
        accp = tuple(
            t.reshape(128, wc, B) for t in acc)
        padcol = (jnp.zeros((128, wc, 1), jnp.uint32),
                  jnp.broadcast_to(one_dm[:, :, None], (128, wc, 1)),
                  jnp.zeros((128, wc, 1), jnp.uint32))
        accp = tuple(jnp.concatenate([a, p], axis=2).reshape(128, -1)
                     for a, p in zip(accp, padcol))
        cols = wc * (B + 1)
        while cols > wc:
            even = tuple(t[:, 0::2] for t in accp)
            odd = tuple(t[:, 1::2] for t in accp)
            accp = padd(even, odd)
            cols //= 2
        # tiny row-major tail: B*Total - sum
        def dm_to_row(t3):
            return tuple(PE._from_dm(t, wc, nd).reshape(wc, 1, nd)
                         for t in t3)
        tot_row = dm_to_row(total3)
        sum_row = dm_to_row(accp)
        btot = curve.mul_const(tot_row, B)
        wsum = curve.add(btot, curve.neg(sum_row))
        return carry, wsum

    _, (wx, wy, wz) = jax.lax.scan(chunk_body, None, wchunks)
    wx = wx.reshape((Wp,) + wx.shape[2:])[:W]
    wy = wy.reshape((Wp,) + wy.shape[2:])[:W]
    wz = wz.reshape((Wp,) + wz.shape[2:])[:W]

    def fold(res, wsum):
        for _ in range(c):
            res = curve.double(res)
        return curve.add(res, wsum), None

    res, _ = jax.lax.scan(fold, curve.zero(()), (wx[::-1], wy[::-1],
                                                 wz[::-1]))
    return res
