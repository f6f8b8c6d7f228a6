"""Pallas TPU kernel for RNS Montgomery multiplication (see ops/rns.py
for the scheme and bounds; this file is the hardware mapping).

Layout: an RNS element is a [128] u32 column — base-A channels on rows
0..k-1, base-B channels on rows 64..63+k (k <= 64 for all supported
fields) — batched as [128, N] tiles, N on lanes.  All channelwise steps
(products, Barrett reductions, the q and t scalings) are single VPU tile
ops touching both bases at once; the two base extensions contract over
channel rows with CONSTANT matrices |M_src/m_i|_{m_dst_j} as four bf16
MXU matmuls each (7-bit splits; partial sums < k * 2^14 < 2^20 are
f32-exact).  Per multiply that is ~40 VPU tile ops + 8 matmuls versus
~300 VPU ops for the positional 16-bit-digit kernel
(ops/pallas_mont.py) — the MXU finally carries the O(k^2) work.

Barrett channel reduction: v < 2^29.5, m in (0.75, 1)*2^14,
mu = floor(2^28/m):  q = (v >> 14) * mu >> 14 underestimates floor(v/m)
by < 4.2, so r = v - q m < 6m fits u32 and four conditional subtracts
canonicalize.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .limbs import DIGIT_MASK
from .rns import CH_BITS, W_BITS, ALPHA_OFF, RNSContext, make_context

LANES = 128
B_ROW = 64            # base-B channels start at this row
RED_BITS = 28         # Barrett scale: mu = floor(2^28 / m)


# ---------------------------------------------------------------------------
# constant tables (host, cached per context)
# ---------------------------------------------------------------------------

def _rows(vals_a, vals_b, fill=0):
    out = np.full((LANES,), fill, dtype=np.uint32)
    out[:len(vals_a)] = vals_a
    out[B_ROW:B_ROW + len(vals_b)] = vals_b
    return out


@functools.lru_cache(maxsize=8)
def _kernel_consts(p: int):
    ctx = make_context(p)
    k = ctx.k
    assert k <= B_ROW, "channel count exceeds packed-row capacity"

    m_row = _rows(ctx.mA, ctx.mB, fill=1)
    mu_row = np.asarray([(1 << RED_BITS) // int(m) for m in m_row],
                        np.uint32)
    # sigma factors live per-source-base; w weights likewise
    sig_row = _rows(ctx.sigA, ctx.sigB)
    w_row = _rows(ctx.wA, ctx.wB)
    negpinv_row = _rows(ctx.negpinv_A, [0] * k)       # A rows only
    pB_row = _rows([0] * k, ctx.p_B)                  # B rows only
    mainv_row = _rows([0] * k, ctx.MAinv_B)
    corrAB_row = _rows([0] * k, ctx.MA_modB)          # A->B: corr on B rows
    corrBA_row = _rows(ctx.MB_modA, [0] * k)          # B->A: corr on A rows

    def ext_mats(C, dst_off, src_off):
        """[128,128] M with M[dst_off+j, src_off+i] = C[i, j], split into
        (lo,hi) 7-bit parts (f32 here; cast to bf16 at use — values
        < 128 are bf16-exact)."""
        full = np.zeros((LANES, LANES), np.uint32)
        full[dst_off:dst_off + k, src_off:src_off + k] = C.T
        lo = (full & 0x7F).astype(np.float32)
        hi = (full >> 7).astype(np.float32)
        return lo, hi

    ab_lo, ab_hi = ext_mats(ctx.extAB, B_ROW, 0)      # A(src) -> B(dst)
    ba_lo, ba_hi = ext_mats(ctx.extBA, 0, B_ROW)

    cols = [v[:, None] for v in (m_row, mu_row, sig_row, w_row,
                                 negpinv_row, pB_row, mainv_row,
                                 corrAB_row, corrBA_row)]
    return ctx, cols, (ab_lo, ab_hi, ba_lo, ba_hi)


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------

def _chan_reduce(v, m, mu):
    """v [128, N] u32 < 2^29.5 -> v mod m (per-row m in (0.75,1)*2^14).

    q = (v >> 14) * mu >> 14 with mu = floor(2^28/m) satisfies
    Q-4 <= q <= Q (error < v/2^28 + 2^14/m + 1 < 4.2), so four
    conditional subtracts canonicalize; q*m and the shifts stay in u32
    for v < 2^29.5 (hi*mu < 2^15.5 * 2^14.5 = 2^30)."""
    q = ((v >> CH_BITS) * mu) >> (RED_BITS - CH_BITS)
    r = v - q * m
    for _ in range(4):
        ge = r >= m
        r = jnp.where(ge, r - m, r)
    return r


def _chan_mulred(a, b, m, mu):
    return _chan_reduce(a * b, m, mu)


def _row_sel(rows_lo: int, rows_hi: int, shape):
    i = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    return (i >= rows_lo) & (i < rows_hi)


def _base_extend_k(sigma, alpha, mat_lo, mat_hi, corr, m, mu):
    """In-kernel Kawamura extension given per-element sigmas (masked to
    the source rows) and alpha [1, N]: returns residues on the dest rows
    (garbage elsewhere — callers mask/select)."""
    s32 = sigma.astype(jnp.int32)
    s_lo = (s32 & 0x7F).astype(jnp.bfloat16)
    s_hi = (s32 >> 7).astype(jnp.bfloat16)
    p00 = jnp.dot(mat_lo, s_lo, preferred_element_type=jnp.float32)
    p01 = jnp.dot(mat_lo, s_hi, preferred_element_type=jnp.float32)
    p10 = jnp.dot(mat_hi, s_lo, preferred_element_type=jnp.float32)
    p11 = jnp.dot(mat_hi, s_hi, preferred_element_type=jnp.float32)
    p00u = p00.astype(jnp.int32).astype(jnp.uint32)
    midu = (p01 + p10).astype(jnp.int32).astype(jnp.uint32)
    topu = p11.astype(jnp.int32).astype(jnp.uint32)
    mid = _chan_reduce(midu, m, mu)          # < 2^14
    top = _chan_reduce(topu, m, mu)
    acc = _chan_reduce(p00u + (mid << 7) + (top << CH_BITS), m, mu)
    corr_v = _chan_mulred(jnp.broadcast_to(alpha, acc.shape), corr, m, mu)
    return _chan_reduce(acc + m - corr_v, m, mu)


def _alpha_rows(sigma, w, rows_lo, rows_hi, offset: int):
    """alpha [1, N] from masked sigma rows (sum sigma*w >> W_BITS)."""
    masked = jnp.where(_row_sel(rows_lo, rows_hi, sigma.shape),
                       sigma * w, 0)
    # Mosaic has no unsigned reductions; terms <= 2^25 - w_min and
    # k <= rns.MAX_K=64 bound the int32 sum by 2^31 - 2^17 — only a 0.006%
    # margin below overflow (statically guarded in rns.py: make_context
    # asserts k <= MAX_K and module load asserts the bound itself);
    # ALPHA_OFF is added below in uint32, outside the signed sum
    t = jnp.sum(masked.astype(jnp.int32), axis=0,
                keepdims=True).astype(jnp.uint32)
    return (t + jnp.uint32(offset)) >> W_BITS


def _rns_mont_core(x, y, m, mu, sig, w, negpinv, pB, mainv, corrAB,
                   corrBA, ab_lo, ab_hi, ba_lo, ba_hi, k: int):
    """One RNS Montgomery multiply on [128, N] packed tiles."""
    shape = x.shape
    a_rows = _row_sel(0, k, shape)
    b_rows = _row_sel(B_ROW, B_ROW + k, shape)

    s = _chan_mulred(x, y, m, mu)                     # both bases
    q = _chan_mulred(s, negpinv, m, mu)               # A rows (0 on B)
    # ---- extend q: A -> B
    sig_q = _chan_mulred(jnp.where(a_rows, q, 0), sig, m, mu)
    alpha_q = _alpha_rows(sig_q, w, 0, k, 0)          # never overestimates
    q_b = _base_extend_k(sig_q, alpha_q, ab_lo, ab_hi, corrAB, m, mu)
    # ---- t = (s + q p) * MA^-1 on B rows
    qp = _chan_mulred(jnp.where(b_rows, q_b, 0), pB, m, mu)
    t_b = _chan_mulred(_chan_reduce(s + qp, m, mu), mainv, m, mu)
    # ---- extend t: B -> A (exact)
    sig_t = _chan_mulred(jnp.where(b_rows, t_b, 0), sig, m, mu)
    alpha_t = _alpha_rows(sig_t, w, B_ROW, B_ROW + k, ALPHA_OFF)
    t_a = _base_extend_k(sig_t, alpha_t, ba_lo, ba_hi, corrBA, m, mu)
    return jnp.where(a_rows, t_a, jnp.where(b_rows, t_b, 0))


def _rns_mont_kernel(k, x_ref, y_ref, m_ref, mu_ref, sig_ref, w_ref,
                     npv_ref, pb_ref, mainv_ref, cab_ref, cba_ref,
                     ablo_ref, abhi_ref, balo_ref, bahi_ref, out_ref):
    shape = x_ref.shape

    def col(ref):
        return jnp.broadcast_to(ref[:], shape)

    out_ref[:] = _rns_mont_core(
        x_ref[:], y_ref[:], col(m_ref), col(mu_ref), col(sig_ref),
        col(w_ref), col(npv_ref), col(pb_ref), col(mainv_ref),
        col(cab_ref), col(cba_ref), ablo_ref[:], abhi_ref[:],
        balo_ref[:], bahi_ref[:], k)


@functools.lru_cache(maxsize=16)
def _rns_mont_call(k: int, n_cols: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = functools.partial(_rns_mont_kernel, k)
    data = pl.BlockSpec((LANES, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((LANES, 1), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_cols // tile,),
        in_specs=[data, data] + [col] * 9 + [mat] * 4,
        out_specs=data,
        out_shape=jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# host layout helpers + public entry
# ---------------------------------------------------------------------------

def pack_rns(ctx: RNSContext, ra, rb):
    """[N, k] x2 residue arrays -> [128, N] packed kernel layout."""
    n = ra.shape[0]
    out = jnp.zeros((LANES, n), jnp.uint32)
    out = out.at[:ctx.k, :].set(jnp.transpose(ra))
    out = out.at[B_ROW:B_ROW + ctx.k, :].set(jnp.transpose(rb))
    return out


def unpack_rns(ctx: RNSContext, packed):
    return (jnp.transpose(packed[:ctx.k, :]),
            jnp.transpose(packed[B_ROW:B_ROW + ctx.k, :]))


def mont_mul_rns_pallas(p: int, x, y, interpret: bool | None = None,
                        tile: int = 128):
    """x, y: [128, N] packed RNS tiles (pack_rns layout); returns the
    packed RNS Montgomery product x*y*M_A^-1 (values < 3p)."""
    ctx, cols, mats = _kernel_consts(p)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = x.shape[1]
    n_pad = max(tile, -(-n // tile) * tile)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n)))
        y = jnp.pad(y, ((0, 0), (0, n_pad - n)))
    args = ([jnp.asarray(c) for c in cols] +
            [jnp.asarray(m, jnp.bfloat16) for m in mats])
    out = _rns_mont_call(ctx.k, n_pad, tile, interpret)(x, y, *args)
    return out[:, :n]


# ---------------------------------------------------------------------------
# in-kernel positional <-> RNS conversions (digit rows <-> channel rows)
# ---------------------------------------------------------------------------
#
# Both layouts are [128 rows, N lanes] tiles; conversion is a contraction
# over rows with a CONSTANT matrix — the same bf16-split MXU pattern as
# the base extensions.  to-RNS: residues of the positional value (any
# < 2^(16 nd)); from-RNS: CRT digits of the base-A value (< 16p),
# canonicalized by a binary descent of conditional subtracts.

def _digit_split_mats(ctx: RNSContext, nd: int):
    """to-RNS matrices: T[dst_row, src_digit_row] = |2^(16 j)|_{m}, split
    8/8 on the digit side handled in-kernel, 7/7 on the matrix side here."""
    ms = list(ctx.mA) + [0] * (B_ROW - ctx.k) + list(ctx.mB)
    full = np.zeros((LANES, LANES), np.uint32)
    for r, m in enumerate(ms[:B_ROW + ctx.k]):
        if m == 0:
            continue
        acc = 1 % m
        for j in range(nd):
            full[r, j] = acc
            acc = acc * ((1 << 16) % m) % m
    lo = (full & 0x7F).astype(np.float32)
    hi = (full >> 7).astype(np.float32)
    return lo, hi


def _crt_mats(ctx: RNSContext, nd: int):
    """from-RNS matrices: D[digit_row, src_channel_row] = digit of
    M_A/m_i (8/8 split on the matrix side), plus M_A digit column and the
    base-A sigma/weight columns (on channel rows)."""
    from .limbs import to_digits
    assert 16 * nd >= ctx.MA.bit_length() + 7, \
        "positional digit count too narrow for CRT accumulation"
    D = np.zeros((LANES, LANES), np.uint32)
    for i, m in enumerate(ctx.mA):
        dig = to_digits(ctx.MA // m, nd)
        D[:nd, i] = dig
    lo = (D & 0xFF).astype(np.float32)
    hi = (D >> 8).astype(np.float32)
    md = np.zeros((LANES,), np.uint32)
    md[:nd] = to_digits(ctx.MA, nd)
    return lo, hi, md[:, None]


def _to_rns_k(digits, t_lo, t_hi, m, mu):
    """positional digit rows [128, N] (16-bit digits, rows >= nd zero) ->
    packed RNS rows (both bases).  4 bf16 matmuls, f32-exact partial sums
    (< nd * 255 * 127 < 2^21)."""
    d32 = digits.astype(jnp.int32)
    d_lo = (d32 & 0xFF).astype(jnp.bfloat16)
    d_hi = (d32 >> 8).astype(jnp.bfloat16)
    p00 = jnp.dot(t_lo, d_lo, preferred_element_type=jnp.float32)
    p01 = jnp.dot(t_hi, d_lo, preferred_element_type=jnp.float32)
    p10 = jnp.dot(t_lo, d_hi, preferred_element_type=jnp.float32)
    p11 = jnp.dot(t_hi, d_hi, preferred_element_type=jnp.float32)
    r00 = _chan_reduce(p00.astype(jnp.int32).astype(jnp.uint32), m, mu)
    r01 = _chan_reduce(p01.astype(jnp.int32).astype(jnp.uint32), m, mu)
    r10 = _chan_reduce(p10.astype(jnp.int32).astype(jnp.uint32), m, mu)
    r11 = _chan_reduce(p11.astype(jnp.int32).astype(jnp.uint32), m, mu)
    acc = r00 + (r01 << 7) + (r10 << 8) + (r11 << 15)   # < 2^30
    return _chan_reduce(acc, m, mu)


def _alpha_rows_k(sigma, w, k: int, offset: int):
    masked = jnp.where(_row_sel(0, k, sigma.shape), sigma * w, 0)
    t = jnp.sum(masked.astype(jnp.int32), axis=0,
                keepdims=True).astype(jnp.uint32)
    return (t + jnp.uint32(offset)) >> W_BITS


def _from_rns_k(x, sig, w, m, mu, d_lo, d_hi, md_col, k: int, nd: int,
                width: int):
    """packed RNS rows -> positional digit rows of the base-A value
    (UNREDUCED, < 16p assumed by callers' bound budget; returns digits
    after carry resolve and a 8p/4p/2p/1p conditional-subtract descent).

    CRT: digits = sum_i sigma_i * digits(M_A/m_i) - alpha * digits(M_A);
    the matmul contracts channel rows into digit rows with 7-bit sigma
    splits x 8-bit digit splits (sums < k * 2^15 < 2^21, f32-exact)."""
    from .pallas_mont import _carry_resolve_t
    a_rows = _row_sel(0, k, x.shape)
    sigma = _chan_mulred(jnp.where(a_rows, x, 0), sig, m, mu)
    alpha = _alpha_rows_k(sigma, w, k, ALPHA_OFF)          # [1, N] exact
    s32 = sigma.astype(jnp.int32)
    s_lo = (s32 & 0x7F).astype(jnp.bfloat16)
    s_hi = (s32 >> 7).astype(jnp.bfloat16)
    p00 = jnp.dot(d_lo, s_lo, preferred_element_type=jnp.float32)
    p01 = jnp.dot(d_hi, s_lo, preferred_element_type=jnp.float32)
    p10 = jnp.dot(d_lo, s_hi, preferred_element_type=jnp.float32)
    p11 = jnp.dot(d_hi, s_hi, preferred_element_type=jnp.float32)
    c00 = p00.astype(jnp.int32).astype(jnp.uint32)
    c01 = p01.astype(jnp.int32).astype(jnp.uint32)       # * 2^8
    c10 = p10.astype(jnp.int32).astype(jnp.uint32)       # * 2^7
    c11 = p11.astype(jnp.int32).astype(jnp.uint32)       # * 2^15
    cols = c00 + (c01 << 8) + (c10 << 7)                 # < 2^31
    hi_lo = (c11 & 1) << 15
    hi_carry = jnp.pad(c11 >> 1, ((1, 0), (0, 0)))[:LANES]
    cols = cols + hi_lo + hi_carry
    cols = _carry_resolve_t(cols, width)
    # subtract alpha * M_A: alpha*md columns, then a borrowless
    # complement subtract over `width` digit rows (cols >= sub always,
    # so the 2^(16*width) wrap bit at row `width` is exactly 1)
    sub_cols = jnp.broadcast_to(alpha, cols.shape) * \
        jnp.broadcast_to(md_col, cols.shape)             # < 2^7 * 2^16
    sub_cols = _carry_resolve_t(sub_cols, width)
    rows = jax.lax.broadcasted_iota(jnp.int32, cols.shape, 0)
    comp = jnp.where(rows < width, jnp.uint32(DIGIT_MASK) - sub_cols, 0)
    one0 = jnp.where(rows == 0, jnp.uint32(1), jnp.uint32(0))
    diff = _carry_resolve_t(cols + comp + one0, width + 1)
    diff = jnp.where(rows == width, diff - 1, diff)
    return jnp.where(rows < width, diff, 0)
