"""RNS-hybrid fused EC batch-affine addition (prime-field SW curves).

Same contract as ops/pallas_ec.batch_affine_add_fused, but all field
MULTIPLIES run in the double-base RNS domain (ops/pallas_rns), where a
multiply is ~45 VPU tile ops + 8 MXU matmuls instead of ~200 VPU ops for
the positional digit kernel, and RNS adds/subs are 1-2 channelwise ops
instead of 3 carry-resolves.  Positional digit form survives only at the
storage boundary (points in HBM stay positional Montgomery x*R,
canonical < p) and for the branch masks, which reduce to direct digit
equality on canonical inputs.

Scale discipline (T = M_A, the RNS Montgomery radix):
  - entry: to_rns of positional digits gives value x*R; ONE rns-mont by
    c_norm = M_A^2 R^-1 mod p normalizes to x*M_A — after which
    rns_mont(a*M_A, b*M_A) = a*b*M_A is closed under multiplication.
  - inversion tree: leaves d*M_A; parent = rns_mont(left, right) stays
    *M_A.  Root is CRT'd to positional, BEA-inverted (inv_mod maps
    rho -> rho^-1 R^2), re-entered via c_root = M_A^3 R^-2, giving
    I = D^-1 M_A; the down-sweep invariant I_child = rns_mont(I_parent,
    N_sibling) preserves node^-1 M_A at every level, so leaf inverses
    are d^-1 M_A with no further correction.
  - exit: rns_mont(x3*M_A, R) = x3*R (< 3p), CRT to digits, two
    conditional subtracts of p canonicalize.

Value-bound budget (guard 2^10: inputs to rns_mont may reach 24p each,
products to 2^10 p^2): lam, ll < 3p; x3 = ll + (4p-x1) + (4p-x2) < 11p;
x1 + (12p - x3) < 15p; all products <= 3p * 15p = 45 p^2 << 2^10 p^2.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .pallas_mont import _row_mask
from .pallas_ec import _cond_sub_t, _to_dm, _from_dm, _flags_dm
from .rns import make_context
from .pallas_rns import (
    B_ROW,
    LANES,
    _chan_reduce,
    _crt_mats,
    _digit_split_mats,
    _from_rns_k,
    _kernel_consts,
    _rns_mont_core,
    _to_rns_k,
    unpack_rns,
)


# ---------------------------------------------------------------------------
# constants
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _ecr_consts(p: int, nd: int, a_mont: tuple):
    """All host tables for one curve: the RNS kernel consts, conversion
    matrices, and the EC/scale constant rows."""
    ctx, rns_cols, ext_mats = _kernel_consts(p)
    t_lo, t_hi = _digit_split_mats(ctx, nd)
    d_lo, d_hi, md_col = _crt_mats(ctx, _crt_width(ctx))

    R = (1 << (16 * nd)) % p
    a_plain = _from_mont_int(a_mont, nd, p, R)

    def rns_row(val: int):
        row = np.zeros((LANES,), np.uint32)
        for i, m in enumerate(ctx.mA):
            row[i] = val % m
        for i, m in enumerate(ctx.mB):
            row[B_ROW + i] = val % m
        return row[:, None]

    c_norm = rns_row(ctx.MA * ctx.MA % p * pow(R, -1, p) % p)
    c_root = rns_row(pow(ctx.MA, 3, p) * pow(R, -2, p) % p)
    k_out = rns_row(R)
    a_rns = rns_row(a_plain * ctx.MA % p)
    one_tree = rns_row(ctx.MA % p)
    p4 = rns_row(4 * p)            # subtraction offsets (values, NOT mod p)
    p12 = rns_row(12 * p)
    pdig = np.zeros((LANES,), np.uint32)
    from .limbs import to_digits
    pdig[:nd] = to_digits(p, nd)
    return (ctx, rns_cols, ext_mats, (t_lo, t_hi), (d_lo, d_hi, md_col),
            (c_norm, c_root, k_out, a_rns, one_tree, p4, p12,
             pdig[:, None]))


def _crt_width(ctx) -> int:
    return -(-(ctx.MA.bit_length() + 8) // 16) + 1


def _from_mont_int(digits: tuple, nd: int, p: int, R: int) -> int:
    v = 0
    for d in reversed(digits):
        v = (v << 16) | int(d)
    return v * pow(R, -1, p) % p


# ---------------------------------------------------------------------------
# in-kernel pieces
# ---------------------------------------------------------------------------

def _eq_cols(a, b):
    # int32 sums: Mosaic has no unsigned reductions (terms < 2^16, R <= 128)
    return jnp.sum((a ^ b).astype(jnp.int32), axis=0, keepdims=True) == 0


def _is_zero_cols(v):
    return jnp.sum(v.astype(jnp.int32), axis=0, keepdims=True) == 0


def _rns_sub(a, off, b, m, mu):
    """a + (off - b) channelwise, off = residues of c*p (c*p >= value(b)
    so the represented value stays non-negative)."""
    return _chan_reduce(a + _chan_reduce(off + m - b, m, mu), m, mu)


def _rns_add(a, b, m, mu):
    return _chan_reduce(a + b, m, mu)


def _ecr_pre_kernel(k, nd, x1_ref, y1_ref, x2_ref, y2_ref, i1_ref, i2_ref,
                    # rns consts
                    m_ref, mu_ref, sig_ref, w_ref, npv_ref, pb_ref,
                    mainv_ref, cab_ref, cba_ref, ablo_ref, abhi_ref,
                    balo_ref, bahi_ref,
                    # conversion + ec consts
                    tlo_ref, thi_ref, cnorm_ref, a_ref, p4_ref,
                    # outputs
                    num_ref, den_ref, x1r_ref, y1r_ref, x2r_ref,
                    inf3_ref, dead_ref):
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    shape = x1.shape

    def col(ref):
        return jnp.broadcast_to(ref[:], shape)

    m = col(m_ref)
    mu = col(mu_ref)
    mats = (ablo_ref[:], abhi_ref[:], balo_ref[:], bahi_ref[:])
    rns_args = (m, mu, col(sig_ref), col(w_ref), col(npv_ref),
                col(pb_ref), col(mainv_ref), col(cab_ref), col(cba_ref),
                *mats, k)

    inf1 = i1_ref[0:1, :] != 0
    inf2 = i2_ref[0:1, :] != 0
    same_x = _eq_cols(x1, x2)          # canonical digits: direct equality
    same_y = _eq_cols(y1, y2)
    ninf = (~inf1) & (~inf2)
    dbl = same_x & same_y & ninf
    anti = same_x & (~same_y) & ninf
    y1z = _is_zero_cols(y1)
    inf3 = (inf1 & inf2) | anti | (dbl & y1z)
    dead = inf3 | inf1 | inf2          # lanes whose den must not join
                                       # the inversion tree

    # convert to RNS and normalize to the M_A scale
    cn = col(cnorm_ref)

    def conv(v):
        r = _to_rns_k(v, tlo_ref[:], thi_ref[:], m, mu)   # value v*R
        return _rns_mont_core(r, cn, *rns_args)           # -> v*M_A

    x1r = conv(x1)
    y1r = conv(y1)
    x2r = conv(x2)
    y2r = conv(y2)

    p4 = col(p4_ref)
    dxr = _rns_sub(x2r, p4, x1r, m, mu)    # < 7p
    dyr = _rns_sub(y2r, p4, y1r, m, mu)
    xx = _rns_mont_core(x1r, x1r, *rns_args)              # < 3p
    t3 = _rns_add(_rns_add(xx, xx, m, mu), xx, m, mu)     # < 9p
    txa = _rns_add(t3, col(a_ref), m, mu)                 # < 10p
    y1d = _rns_add(y1r, y1r, m, mu)                       # < 6p

    num_ref[:] = jnp.where(dbl, txa, dyr)
    den_ref[:] = jnp.where(dbl, y1d, dxr)
    x1r_ref[:] = x1r
    y1r_ref[:] = y1r
    x2r_ref[:] = x2r
    inf3_ref[:] = jnp.broadcast_to(inf3.astype(jnp.uint32),
                                   inf3_ref.shape)
    dead_ref[:] = jnp.broadcast_to(dead.astype(jnp.uint32),
                                   dead_ref.shape)


def _ecr_post_kernel(k, nd, wdt, num_ref, dinv_ref, x1r_ref, y1r_ref,
                     x2r_ref, x1_ref, y1_ref, x2_ref, y2_ref, i1_ref,
                     i2_ref, i3_ref,
                     m_ref, mu_ref, sig_ref, w_ref, npv_ref, pb_ref,
                     mainv_ref, cab_ref, cba_ref, ablo_ref, abhi_ref,
                     balo_ref, bahi_ref,
                     dlo_ref, dhi_ref, md_ref, kout_ref, p4_ref, p12_ref,
                     pd_ref,
                     x3_ref, y3_ref):
    num = num_ref[:]
    dinv = dinv_ref[:]
    shape = num.shape

    def col(ref):
        return jnp.broadcast_to(ref[:], shape)

    m = col(m_ref)
    mu = col(mu_ref)
    mats = (ablo_ref[:], abhi_ref[:], balo_ref[:], bahi_ref[:])
    rns_args = (m, mu, col(sig_ref), col(w_ref), col(npv_ref),
                col(pb_ref), col(mainv_ref), col(cab_ref), col(cba_ref),
                *mats, k)
    p4 = col(p4_ref)
    p12 = col(p12_ref)

    lam = _rns_mont_core(num, dinv, *rns_args)            # lam*M_A < 3p
    ll = _rns_mont_core(lam, lam, *rns_args)              # < 3p
    x3r = _rns_sub(_rns_sub(ll, p4, x1r_ref[:], m, mu), p4, x2r_ref[:],
                   m, mu)                                 # < 11p
    dx13 = _rns_sub(x1r_ref[:], p12, x3r, m, mu)          # < 15p... +3p
    t = _rns_mont_core(lam, dx13, *rns_args)              # < 3p
    y3r = _rns_sub(t, p4, y1r_ref[:], m, mu)              # < 7p

    # exit: *R, CRT to digits, canonicalize
    kout = col(kout_ref)
    sigc = col(sig_ref)
    wc = col(w_ref)
    pd = jnp.broadcast_to(pd_ref[:], shape)

    def out(v):
        vr = _rns_mont_core(v, kout, *rns_args)           # value*R < 3p
        dig = _from_rns_k(vr, sigc, wc, m, mu, dlo_ref[:], dhi_ref[:],
                          md_ref[:], k, nd, wdt)
        dig = _cond_sub_t(jnp.where(_row_mask(nd + 1, shape), dig, 0),
                          pd, nd)
        return _cond_sub_t(dig, pd, nd)

    x3 = out(x3r)
    y3 = out(y3r)

    m1 = i1_ref[0:1, :] != 0
    m2 = i2_ref[0:1, :] != 0
    m3 = i3_ref[0:1, :] != 0
    xo = jnp.where(m1, x2_ref[:], jnp.where(m2, x1_ref[:], x3))
    yo = jnp.where(m1, y2_ref[:], jnp.where(m2, y1_ref[:], y3))
    x3_ref[:] = jnp.where(m3, 0, xo)
    y3_ref[:] = jnp.where(m3, 0, yo)


def _ecr_tree_kernel(k, x_ref, y_ref, m_ref, mu_ref, sig_ref, w_ref,
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


# ---------------------------------------------------------------------------
# pallas_call builders
# ---------------------------------------------------------------------------

def _specs(tile):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    data = pl.BlockSpec((LANES, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    flag = pl.BlockSpec((8, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    colc = pl.BlockSpec((LANES, 1), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    return data, flag, colc, mat


@functools.lru_cache(maxsize=32)
def _ecr_pre_call(k: int, nd: int, n_cols: int, tile: int,
                  interpret: bool):
    from jax.experimental import pallas as pl
    data, flag, colc, mat = _specs(tile)
    kernel = functools.partial(_ecr_pre_kernel, k, nd)
    return pl.pallas_call(
        kernel,
        grid=(n_cols // tile,),
        in_specs=[data] * 4 + [flag] * 2 + [colc] * 9 + [mat] * 4 +
                 [mat, mat, colc, colc, colc],
        out_specs=[data] * 5 + [flag] * 2,
        out_shape=[jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32)] * 5
        + [jax.ShapeDtypeStruct((8, n_cols), jnp.uint32)] * 2,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _ecr_post_call(k: int, nd: int, wdt: int, n_cols: int, tile: int,
                   interpret: bool):
    from jax.experimental import pallas as pl
    data, flag, colc, mat = _specs(tile)
    kernel = functools.partial(_ecr_post_kernel, k, nd, wdt)
    return pl.pallas_call(
        kernel,
        grid=(n_cols // tile,),
        in_specs=[data] * 9 + [flag] * 3 + [colc] * 9 + [mat] * 4 +
                 [mat, mat, colc, colc, colc, colc, colc],
        out_specs=[data] * 2,
        out_shape=[jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32)] * 2,
        interpret=interpret,
    )


@functools.lru_cache(maxsize=32)
def _ecr_tree_call(k: int, n_cols: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    data, flag, colc, mat = _specs(tile)
    kernel = functools.partial(_ecr_tree_kernel, k)
    return pl.pallas_call(
        kernel,
        grid=(n_cols // tile,),
        in_specs=[data, data] + [colc] * 9 + [mat] * 4,
        out_specs=data,
        out_shape=jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def supports(curve) -> bool:
    import os
    v = os.environ.get("GINGERLIB_EC_RNS", "0").lower()
    if v not in ("1", "true", "yes", "on", "auto"):
        return False
    if curve.F.K != 1:
        return False
    ctx = make_context(curve.fp.modulus)
    return ctx.k <= B_ROW


def _tree_inverse(fp_params, consts, den, dead, interpret):
    """Shared-inversion tree in RNS (leaves value*M_A), one positional
    BEA inversion at the root.  Dead columns carry M_A ("one")."""
    from ..fields import fp as fpmod

    nd = fp_params.n_digits
    (ctx, rns_cols, ext_mats, _tmats, _crt, ec) = consts
    (c_norm, c_root, k_out, a_rns, one_tree, p4, p12, pd) = ec
    cols = [jnp.asarray(c) for c in rns_cols]
    mats = [jnp.asarray(m, jnp.bfloat16) for m in ext_mats]
    one_col = jnp.asarray(one_tree)

    x = jnp.where(dead[0:1, :] != 0, one_col, den)

    def tmul(a, b):
        n = a.shape[1]
        pad = -n % 128
        if pad:
            a = jnp.concatenate([a, jnp.broadcast_to(one_col,
                                                     (LANES, pad))], 1)
            b = jnp.concatenate([b, jnp.broadcast_to(one_col,
                                                     (LANES, pad))], 1)
        out = _ecr_tree_call(ctx.k, n + pad, 128, interpret)(
            a, b, *cols, *mats)
        return out[:, :n]

    levels = [x]
    cur = x
    while cur.shape[1] > 1:
        cur = tmul(cur[:, 0::2], cur[:, 1::2])
        levels.append(cur)

    # root: CRT -> positional -> BEA inverse -> back to RNS at M_A scale
    root_digits = _root_to_digits(ctx, consts, levels[-1], nd)
    inv_root = fpmod.inv_mod(fp_params, root_digits)      # rho^-1 R^2
    t_lo, t_hi = (jnp.asarray(v) for v in consts[3])
    m_col = jnp.broadcast_to(cols[0], (LANES, 1))
    mu_col = jnp.broadcast_to(cols[1], (LANES, 1))
    inv_dm = _to_dm(inv_root, 1)
    r = _to_rns_k(inv_dm, jnp.asarray(t_lo, jnp.bfloat16),
                  jnp.asarray(t_hi, jnp.bfloat16), m_col, mu_col)
    inv = tmul(r, jnp.broadcast_to(jnp.asarray(c_root), (LANES, 1)))

    for lvl in range(len(levels) - 2, -1, -1):
        child = levels[lvl]
        left, right = child[:, 0::2], child[:, 1::2]
        inv_left = tmul(inv, right)
        inv_right = tmul(inv, left)
        half = inv_left.shape[1]
        inv = jnp.stack([inv_left, inv_right], axis=2).reshape(
            LANES, 2 * half)
    return jnp.where(dead[0:1, :] != 0, 0, inv)


def _root_to_digits(ctx, consts, root, nd):
    """[128, 1] RNS root -> [1, nd] positional digits (canonical) at the
    XLA level via the validated jnp CRT path (single element)."""
    from . import rns as rns_mod
    ra, _rb = unpack_rns(ctx, root)
    pdig = np.asarray(consts[5][7][:nd, 0])
    return rns_mod.from_rns_digits(ctx, ra, pdig, nd)


def batch_affine_add_rns(curve, a_pt, b_pt, interpret: bool | None = None):
    """Drop-in for SWCurveOps.batch_affine_add with RNS multiplies."""
    params = curve.fp
    p = params.modulus
    nd = params.n_digits
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    a_mont = tuple(int(v) for v in np.asarray(curve.a).reshape(-1))
    consts = _ecr_consts(p, nd, a_mont)
    (ctx, rns_cols, ext_mats, tmats, crt, ec) = consts
    (c_norm, c_root, k_out, a_rns, one_tree, p4, p12, pd) = ec
    wdt = _crt_width(ctx)

    (x1, y1), inf1 = a_pt
    (x2, y2), inf2 = b_pt
    n = x1.shape[0]
    n_pad = max(128, 1 << max(0, (n - 1).bit_length()))

    args_pos = [_to_dm(v.reshape(n, nd), n_pad) for v in (x1, y1, x2, y2)]
    f1 = _flags_dm(inf1, n_pad)
    f2 = _flags_dm(inf2, n_pad)

    cols = [jnp.asarray(c) for c in rns_cols]
    mats = [jnp.asarray(m, jnp.bfloat16) for m in ext_mats]
    t_lo, t_hi = (jnp.asarray(v, jnp.bfloat16) for v in tmats)
    d_lo, d_hi, md_col = crt
    d_lo = jnp.asarray(d_lo, jnp.bfloat16)
    d_hi = jnp.asarray(d_hi, jnp.bfloat16)
    md_col = jnp.asarray(md_col)

    num, den, x1r, y1r, x2r, inf3f, deadf = _ecr_pre_call(
        ctx.k, nd, n_pad, 128, interpret)(
        *args_pos, f1, f2, *cols, *mats, t_lo, t_hi,
        jnp.asarray(c_norm), jnp.asarray(a_rns), jnp.asarray(p4))

    dinv = _tree_inverse(params, consts, den, deadf, interpret)

    x3, y3 = _ecr_post_call(ctx.k, nd, wdt, n_pad, 128, interpret)(
        num, dinv, x1r, y1r, x2r, *args_pos, f1, f2, inf3f,
        *cols, *mats, d_lo, d_hi, md_col, jnp.asarray(k_out),
        jnp.asarray(p4), jnp.asarray(p12), jnp.asarray(pd))

    inf3 = inf3f[0, :n] != 0
    return ((_from_dm(x3, n, nd).reshape(n, 1, nd),
             _from_dm(y3, n, nd).reshape(n, 1, nd)), inf3)
