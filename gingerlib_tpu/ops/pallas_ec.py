"""Fused Pallas kernels for batched-affine EC addition (prime-field SW
curves, K=1: MNT4/MNT6/BLS12/SW6 G1).

Why: msm_affine's tree/Fenwick phases run one field op per XLA HLO on
[N, nd] HBM arrays between mont-kernel launches; round-1 profiling put
that glue (gathers, selects, modadds, is_zero) at ~9x the field-mul
floor.  These kernels fuse one complete batch-affine add — the TPU form
of the reference's batch_normalization + affine running sums
(msm/variable_base.rs:60-66) — into TWO pallas_call launches in
digit-major layout ([128 digit rows, N batch lanes], digits on sublanes
so every shift is a free row slice):

  pre:  dx/dy, doubling/anti/infinity masks, lambda numerator and
        denominator (one in-kernel Montgomery square for 3x^2 + a)
  post: lambda = num * dinv, x3 = lambda^2 - x1 - x2,
        y3 = lambda (x1 - x3) - y1, completeness selects
        (three in-kernel Montgomery multiplies)

between them a digit-major batch-inversion tree (one mont_dm launch per
tree level, a single BEA inversion at the root) shares ONE inversion
across the whole batch, so an affine add costs ~7 Montgomery multiplies
amortized — never leaving VMEM-friendly digit-major layout.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .limbs import DIGIT_BITS, DIGIT_MASK, to_digits
from .pallas_mont import (
    LANES,
    _carry_resolve_carryout_t,
    _carry_resolve_t,
    _mont_core_t,
    _mont_dm_call,
    _mxu_mats_t,
    _row_mask,
)


# ---------------------------------------------------------------------------
# in-kernel modular add / sub / predicates (digit-major tiles)
# ---------------------------------------------------------------------------

def _iota0(shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0)


def _cond_sub_t(v, mod, nd: int):
    """v [R, L] with nd+1 significant digit rows, value < 2p: subtract p
    if v >= p (same construction as the _mont_core_t tail)."""
    sub_mask = _row_mask(nd + 1, v.shape)
    comp = jnp.where(sub_mask, DIGIT_MASK - mod, 0)
    one0 = jnp.where(_iota0(v.shape) == 0, jnp.uint32(1), jnp.uint32(0))
    s = jnp.where(sub_mask, v, 0) + comp + one0
    diff, carry_out = _carry_resolve_carryout_t(s, nd + 1)
    out = jnp.where((carry_out > 0)[None, :], diff, v)
    return jnp.where(_row_mask(nd, v.shape), out, 0)


def _modadd_t(a, b, mod, nd: int):
    """(a + b) mod p on digit-major tiles; inputs reduced < p."""
    u = _carry_resolve_t(a + b, nd + 1)
    return _cond_sub_t(u, mod, nd)


def _modsub_t(a, b, mod, nd: int):
    """(a - b) mod p on digit-major tiles; inputs reduced < p.

    Computes a + p + (2^(16 nd) - b) = (a + p - b) + 2^(16 nd); after the
    carry resolve, subtracting 1 from digit row nd removes exactly the
    deliberate 2^(16 nd) term (row nd is >= 1, so no borrow), leaving
    a + p - b < 2p over nd+1 rows for one conditional subtract."""
    lo = _row_mask(nd, a.shape)
    comp_b = jnp.where(lo, DIGIT_MASK - b, 0)
    one0 = jnp.where(_iota0(a.shape) == 0, jnp.uint32(1), jnp.uint32(0))
    u = _carry_resolve_t(a + mod + comp_b + one0, nd + 1)
    u = jnp.where(_iota0(a.shape) == nd, u - 1, u)
    u = jnp.where(_row_mask(nd + 1, a.shape), u, 0)
    return _cond_sub_t(u, mod, nd)


def _is_zero_cols(v):
    """[R, L] digit tile -> [1, L] bool (all digit rows zero).  Digit rows
    are < 2^16 and R <= 128, so the column sum < 2^23 cannot overflow.
    int32 because Mosaic has no unsigned reductions."""
    return jnp.sum(v.astype(jnp.int32), axis=0, keepdims=True) == 0


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _ec_pre_kernel(nd, width, x1_ref, y1_ref, x2_ref, y2_ref, i1_ref,
                   i2_ref, mod_ref, acoef_ref, npr_e, npr_o, n_e, n_o,
                   num_ref, den_ref, inf3_ref):
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    mod = jnp.broadcast_to(mod_ref[:], x1.shape)
    inf1 = i1_ref[0:1, :] != 0
    inf2 = i2_ref[0:1, :] != 0

    dx = _modsub_t(x2, x1, mod, nd)
    dy = _modsub_t(y2, y1, mod, nd)
    same_x = _is_zero_cols(dx)
    same_y = _is_zero_cols(dy)
    ninf = (~inf1) & (~inf2)
    dbl = same_x & same_y & ninf
    anti = same_x & (~same_y) & ninf

    # doubling lanes: lambda = (3 x^2 + a) / 2y ; others: lambda = dy / dx
    xx = _mont_core_t(x1, x1, mod, npr_e, npr_o, n_e, n_o, nd, width)
    x2x = _modadd_t(xx, xx, mod, nd)
    t3 = _modadd_t(x2x, xx, mod, nd)
    txa = _modadd_t(t3, jnp.broadcast_to(acoef_ref[:], x1.shape), mod, nd)
    y1d = _modadd_t(y1, y1, mod, nd)

    num_ref[:] = jnp.where(dbl, txa, dy)
    den_ref[:] = jnp.where(dbl, y1d, dx)

    y1z = _is_zero_cols(y1)
    inf3 = (inf1 & inf2) | anti | (dbl & y1z)
    inf3_ref[:] = jnp.broadcast_to(inf3.astype(jnp.uint32),
                                   inf3_ref.shape)


def _ec_post_kernel(nd, width, num_ref, dinv_ref, x1_ref, y1_ref, x2_ref,
                    y2_ref, i1_ref, i2_ref, i3_ref, mod_ref, npr_e, npr_o,
                    n_e, n_o, x3_ref, y3_ref):
    num = num_ref[:]
    dinv = dinv_ref[:]
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    mod = jnp.broadcast_to(mod_ref[:], x1.shape)

    lam = _mont_core_t(num, dinv, mod, npr_e, npr_o, n_e, n_o, nd, width)
    ll = _mont_core_t(lam, lam, mod, npr_e, npr_o, n_e, n_o, nd, width)
    x3 = _modsub_t(_modsub_t(ll, x1, mod, nd), x2, mod, nd)
    lx = _mont_core_t(lam, _modsub_t(x1, x3, mod, nd), mod,
                      npr_e, npr_o, n_e, n_o, nd, width)
    y3 = _modsub_t(lx, y1, mod, nd)

    m1 = i1_ref[0:1, :] != 0
    m2 = i2_ref[0:1, :] != 0
    m3 = i3_ref[0:1, :] != 0
    xo = jnp.where(m1, x2, jnp.where(m2, x1, x3))
    yo = jnp.where(m1, y2, jnp.where(m2, y1, y3))
    x3_ref[:] = jnp.where(m3, 0, xo)
    y3_ref[:] = jnp.where(m3, 0, yo)


@functools.lru_cache(maxsize=64)
def _ec_pre_call(nd: int, n_cols: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    width = 2 * nd
    assert width <= LANES
    kernel = functools.partial(_ec_pre_kernel, nd, width)
    coord = pl.BlockSpec((LANES, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    flag = pl.BlockSpec((8, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((LANES, 1), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_cols // tile,),
        in_specs=[coord, coord, coord, coord, flag, flag, col, col,
                  mat, mat, mat, mat],
        out_specs=[coord, coord, flag],
        out_shape=[
            jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32),
            jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32),
            jax.ShapeDtypeStruct((8, n_cols), jnp.uint32),
        ],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=64)
def _ec_post_call(nd: int, n_cols: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    width = 2 * nd
    assert width <= LANES
    kernel = functools.partial(_ec_post_kernel, nd, width)
    coord = pl.BlockSpec((LANES, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    flag = pl.BlockSpec((8, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((LANES, 1), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_cols // tile,),
        in_specs=[coord, coord, coord, coord, coord, coord, flag, flag,
                  flag, col, mat, mat, mat, mat],
        out_specs=[coord, coord],
        out_shape=[
            jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32),
            jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32),
        ],
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# digit-major helpers (XLA level)
# ---------------------------------------------------------------------------

def _to_dm(x, n_pad: int):
    """[N, nd] standard rows -> [128, n_pad] digit-major."""
    n, nd = x.shape
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    return jnp.pad(x.T, ((0, LANES - nd), (0, 0)))


def _from_dm(x, n: int, nd: int):
    return x[:nd, :n].T


def _flags_dm(m, n_pad: int):
    """[N] bool -> [8, n_pad] u32."""
    v = m.astype(jnp.uint32)
    if n_pad != v.shape[0]:
        v = jnp.pad(v, (0, n_pad - v.shape[0]))
    return jnp.broadcast_to(v[None, :], (8, n_pad))


@functools.lru_cache(maxsize=16)
def _mont_consts(params):
    nd = params.n_digits
    mod = np.pad(np.asarray(to_digits(params.modulus, nd), np.uint32),
                 (0, LANES - nd))[:, None]
    one = np.pad(np.asarray(to_digits(params.r % params.modulus, nd),
                            np.uint32), (0, LANES - nd))[:, None]
    # float32 numpy here; cast to bf16 at use (8-bit splits are bf16-exact)
    mats = tuple(np.asarray(m, np.float32)
                 for m in _mxu_mats_t(params.modulus, params.nprime, nd))
    return mod, one, mats


def _inv_up_kernel(nd, width, tile, den_ref, mod_ref, npr_e, npr_o, n_e,
                   n_o, lev_ref, root_ref):
    """Fold-in-half product tree over one [128, tile] block, all levels in
    ONE launch.  Levels are packed into lev_ref at static offsets
    (sizes tile/2, tile/4, ..., 1); the per-tile root also lands in
    root_ref.  Pairing is first-half x second-half — contiguous lane
    slices (Mosaic has no strided lane access); any pairing yields the
    same per-element inverses as long as the down-sweep mirrors it."""
    cur = den_ref[:]
    mod = jnp.broadcast_to(mod_ref[:], cur.shape)
    off = 0
    cols = tile
    while cols > 1:
        h = cols // 2
        m = mod[:, :h]
        cur = _mont_core_t(cur[:, :h], cur[:, h:cols], m,
                           npr_e, npr_o, n_e, n_o, nd, width)
        lev_ref[:, off:off + h] = cur
        off += h
        cols = h
    # root block is 128 lanes wide (Mosaic min); only col 0 is meaningful
    root_ref[:, 0:1] = cur


def _inv_down_kernel(nd, width, tile, den_ref, lev_ref, rinv_ref, mod_ref,
                     npr_e, npr_o, n_e, n_o, out_ref):
    """Mirror down-sweep: inverses of every input column from the root
    inverse, ONE launch (cf. _inv_up_kernel).

    Level l (size tile/2^l, l >= 1) sits in lev_ref at offset
    tile - tile/2^(l-1); level 0 is den_ref.  Step from I_{l+1} (h cols)
    to I_l (2h cols): I_l[:h] = I_{l+1} * P_l[h:2h],
    I_l[h:] = I_{l+1} * P_l[:h]."""
    inv = rinv_ref[:, 0:1]
    h = 1
    while h < tile:
        if 2 * h == tile:
            p = den_ref[:]
        else:
            off = tile - (4 * h)          # tile - tile/2^(l-1), l's size 2h
            p = lev_ref[:, off:off + 2 * h]
        m = jnp.broadcast_to(mod_ref[:], (LANES, h))
        left = _mont_core_t(inv, p[:, h:2 * h], m,
                            npr_e, npr_o, n_e, n_o, nd, width)
        right = _mont_core_t(inv, p[:, :h], m,
                             npr_e, npr_o, n_e, n_o, nd, width)
        inv = jnp.concatenate([left, right], axis=1)
        h *= 2
    out_ref[:] = inv


INV_TILE = 1024   # cols per fused-tree launch (VMEM: levels+temps ~3 MB)


@functools.lru_cache(maxsize=64)
def _inv_up_call(nd: int, n_cols: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    width = 2 * nd
    kernel = functools.partial(_inv_up_kernel, nd, width, tile)
    data = pl.BlockSpec((LANES, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    one = pl.BlockSpec((LANES, 128), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((LANES, 1), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_cols // tile,),
        in_specs=[data, col, mat, mat, mat, mat],
        out_specs=[data, one],
        out_shape=[
            jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32),
            jax.ShapeDtypeStruct((LANES, 128 * (n_cols // tile)),
                                 jnp.uint32),
        ],
        interpret=interpret,
    )


@functools.lru_cache(maxsize=64)
def _inv_down_call(nd: int, n_cols: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    width = 2 * nd
    kernel = functools.partial(_inv_down_kernel, nd, width, tile)
    data = pl.BlockSpec((LANES, tile), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    one = pl.BlockSpec((LANES, 128), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((LANES, 1), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_cols // tile,),
        in_specs=[data, data, one, col, mat, mat, mat, mat],
        out_specs=data,
        out_shape=jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32),
        interpret=interpret,
    )


def _inv_tree_rec(params, x, mod_col, mats, interpret: bool):
    """Shared inverse of all columns of x [128, N] (N a power of two, no
    zero columns): fused up-sweep (1 launch/level-of-tiling), ONE BEA at
    the root, fused down-sweep.  ~5 launches total at any N instead of
    the previous 2·log2(N) per-level dm_mul launches."""
    from ..fields import fp as fpmod

    nd = params.n_digits
    n = x.shape[1]
    if n == 1:
        root = _from_dm(x, 1, nd)
        return _to_dm(fpmod.inv_mod(params, root), 1)
    tile = min(INV_TILE, n)
    levs, roots_pad = _inv_up_call(nd, n, tile, interpret)(
        x, mod_col, *mats)
    roots = roots_pad.reshape(LANES, n // tile, 128)[:, :, 0]
    roots_inv = _inv_tree_rec(params, roots, mod_col, mats, interpret)
    rinv_pad = jnp.pad(roots_inv[:, :, None],
                       ((0, 0), (0, 0), (0, 127))).reshape(LANES, -1)
    return _inv_down_call(nd, n, tile, interpret)(
        x, levs, rinv_pad, mod_col, *mats)


def _batch_inverse_dm(params, den, interpret: bool):
    """Shared-inversion tree on digit-major [128, N] (N a power of two):
    fused product-tree kernels (one launch per tiling level instead of one
    per tree level), one BEA inversion at the root.  Zero columns pass
    through as zero."""
    mod_col, one_col, mats = _mont_consts(params)
    mod_col = jnp.asarray(mod_col)
    one_dm = jnp.asarray(one_col)
    mats = tuple(jnp.asarray(m, jnp.bfloat16) for m in mats)

    zero_cols = jnp.sum(den, axis=0) == 0
    x = jnp.where(zero_cols[None, :], one_dm, den)
    inv = _inv_tree_rec(params, x, mod_col, mats, interpret)
    return jnp.where(zero_cols[None, :], 0, inv)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def use_fused() -> bool:
    """GINGERLIB_FUSED_EC: 1 forces the fused kernels (interpret mode off
    TPU), 0 disables them (XLA batch_affine_add path), auto = on."""
    import os
    v = os.environ.get("GINGERLIB_FUSED_EC", "auto").lower()
    if v in ("0", "false", "no", "off"):
        return False
    return True


def supports(curve) -> bool:
    return (use_fused() and curve.F.K == 1 and
            2 * curve.fp.n_digits <= LANES)


def batch_affine_add_fused(curve, a_pt, b_pt, interpret: bool | None = None):
    """Drop-in for SWCurveOps.batch_affine_add (K=1 curves) running the
    add as two fused kernels + a digit-major inversion tree.  a_pt, b_pt:
    ((x, y), inf) with x, y [N, 1, nd], inf [N] bool."""
    params = curve.fp
    nd = params.n_digits
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    (x1, y1), inf1 = a_pt
    (x2, y2), inf2 = b_pt
    n = x1.shape[0]
    # power of two >= 128 so the inversion tree halves evenly
    n_pad = max(128, 1 << max(0, (n - 1).bit_length()))

    mod_col, _one, mats = _mont_consts(params)
    mod_col = jnp.asarray(mod_col)
    mats = tuple(jnp.asarray(m, jnp.bfloat16) for m in mats)
    acoef = jnp.pad(jnp.asarray(curve.a).reshape(nd),
                    (0, LANES - nd))[:, None]

    args = [_to_dm(v.reshape(n, nd), n_pad) for v in (x1, y1, x2, y2)]
    f1 = _flags_dm(inf1, n_pad)
    f2 = _flags_dm(inf2, n_pad)

    num, den, inf3f = _ec_pre_call(nd, n_pad, 128, interpret)(
        *args, f1, f2, mod_col, acoef, *mats)

    dinv = _batch_inverse_dm(params, den, interpret)

    x3, y3 = _ec_post_call(nd, n_pad, 128, interpret)(
        num, dinv, *args, f1, f2, inf3f, mod_col, *mats)

    inf3 = inf3f[0, :n] != 0
    return ((_from_dm(x3, n, nd).reshape(n, 1, nd),
             _from_dm(y3, n, nd).reshape(n, 1, nd)), inf3)


# ---------------------------------------------------------------------------
# fused unified PROJECTIVE add (digit-major) — no inversions at all
# ---------------------------------------------------------------------------
#
# The MSM tree/Fenwick phases run hundreds of small-batch add stages; each
# batched-affine stage pays a fixed ~2.5 ms BEA root inversion, which
# dominates once the stage batch drops below ~32k lanes.  Below that
# cutoff msm_hybrid switches to this kernel: one launch per stage, ~20
# in-kernel Montgomery multiplies per lane (add-1998-cmo-2 + dbl-2007-bl
# + completeness selects, mirroring curves/sw.py add()/double()), zero
# fixed cost.

def _ec_proj_add_kernel(nd, width, a_is_zero, x1_ref, y1_ref, z1_ref,
                        x2_ref, y2_ref, z2_ref, mod_ref, acoef_ref,
                        one_ref, npr_e, npr_o, n_e, n_o,
                        x3_ref, y3_ref, z3_ref):
    X1 = x1_ref[:]
    Y1 = y1_ref[:]
    Z1 = z1_ref[:]
    X2 = x2_ref[:]
    Y2 = y2_ref[:]
    Z2 = z2_ref[:]
    mod = jnp.broadcast_to(mod_ref[:], X1.shape)
    one = jnp.broadcast_to(one_ref[:], X1.shape)

    def M(a, b):
        return _mont_core_t(a, b, mod, npr_e, npr_o, n_e, n_o, nd, width)

    # --- add-1998-cmo-2 path
    Y1Z2 = M(Y1, Z2)
    X1Z2 = M(X1, Z2)
    Z1Z2 = M(Z1, Z2)
    u = _modsub_t(M(Y2, Z1), Y1Z2, mod, nd)
    v = _modsub_t(M(X2, Z1), X1Z2, mod, nd)
    uu = M(u, u)
    vv = M(v, v)
    vvv = M(v, vv)
    Rv = M(vv, X1Z2)
    A = _modsub_t(_modsub_t(M(uu, Z1Z2), vvv, mod, nd),
                  _modadd_t(Rv, Rv, mod, nd), mod, nd)
    X3 = M(v, A)
    Y3 = _modsub_t(M(u, _modsub_t(Rv, A, mod, nd)), M(vvv, Y1Z2), mod, nd)
    Z3 = M(vvv, Z1Z2)

    # --- dbl-2007-bl path (for P == Q lanes)
    XX = M(X1, X1)
    tx = _modadd_t(_modadd_t(XX, XX, mod, nd), XX, mod, nd)
    if a_is_zero:
        w = tx
    else:
        ZZ = M(Z1, Z1)
        w = _modadd_t(M(jnp.broadcast_to(acoef_ref[:], X1.shape), ZZ),
                      tx, mod, nd)
    s = _modadd_t(M(Y1, Z1), M(Y1, Z1), mod, nd)
    ss = M(s, s)
    sss = M(s, ss)
    R = M(Y1, s)
    RR = M(R, R)
    xr = _modadd_t(X1, R, mod, nd)
    B = _modsub_t(_modsub_t(M(xr, xr), XX, mod, nd), RR, mod, nd)
    h = _modsub_t(M(w, w), _modadd_t(B, B, mod, nd), mod, nd)
    Xd = M(h, s)
    Yd = _modsub_t(M(w, _modsub_t(B, h, mod, nd)),
                   _modadd_t(RR, RR, mod, nd), mod, nd)
    Zd = sss

    # --- completeness selects (unified, branch-free)
    same_x = _is_zero_cols(v)
    same_y = _is_zero_cols(u)
    p_inf = _is_zero_cols(Z1)
    q_inf = _is_zero_cols(Z2)
    y1z = _is_zero_cols(Y1)
    dbl = same_x & same_y & (~p_inf) & (~q_inf)
    anti = same_x & (~same_y) & (~p_inf) & (~q_inf)
    dbl_inf = dbl & y1z

    xo = jnp.where(dbl, Xd, X3)
    yo = jnp.where(dbl, Yd, Y3)
    zo = jnp.where(dbl, Zd, Z3)
    inf_out = anti | dbl_inf
    xo = jnp.where(inf_out, 0, xo)
    yo = jnp.where(inf_out, one, yo)
    zo = jnp.where(inf_out, 0, zo)
    xo = jnp.where(q_inf, X1, xo)
    yo = jnp.where(q_inf, Y1, yo)
    zo = jnp.where(q_inf, Z1, zo)
    xo = jnp.where(p_inf, X2, xo)
    yo = jnp.where(p_inf, Y2, yo)
    zo = jnp.where(p_inf, Z2, zo)
    x3_ref[:] = xo
    y3_ref[:] = yo
    z3_ref[:] = zo


@functools.lru_cache(maxsize=64)
def _ec_proj_add_call(nd: int, n_cols: int, tile: int, a_is_zero: bool,
                      interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    width = 2 * nd
    kernel = functools.partial(_ec_proj_add_kernel, nd, width, a_is_zero)
    coord = pl.BlockSpec((LANES, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    col = pl.BlockSpec((LANES, 1), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_cols // tile,),
        in_specs=[coord] * 6 + [col, col, col, mat, mat, mat, mat],
        out_specs=[coord, coord, coord],
        out_shape=[jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32)] * 3,
        interpret=interpret,
    )


def proj_add_dm(curve, P3, Q3, interpret: bool | None = None):
    """Unified projective add on digit-major triples [128, N] (K=1
    curves).  Pads N up to a multiple of 128 internally."""
    params = curve.fp
    nd = params.n_digits
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mod_col, one_col, mats = _mont_consts(params)
    mats = tuple(jnp.asarray(m, jnp.bfloat16) for m in mats)
    acoef = jnp.pad(jnp.asarray(curve.a).reshape(nd),
                    (0, LANES - nd))[:, None]
    n = P3[0].shape[1]
    n_pad = -(-n // 128) * 128
    args = []
    for v in (*P3, *Q3):
        if n_pad != n:
            v = jnp.pad(v, ((0, 0), (0, n_pad - n)))
        args.append(v)
    tile = min(512, n_pad)
    outs = _ec_proj_add_call(nd, n_pad, tile, bool(curve.a_is_zero),
                             interpret)(
        *args, jnp.asarray(mod_col), acoef, jnp.asarray(one_col), *mats)
    return tuple(o[:, :n] for o in outs)


def batch_affine_add_dm(curve, a3, b3, interpret: bool | None = None):
    """batch_affine_add on digit-major operands — no layout conversion.

    a3, b3: (x_dm [128, n], y_dm [128, n], inf_row [8, n] u32); n a
    multiple of 128.  Returns the same form.  Same two kernels + fused
    inversion tree as batch_affine_add_fused."""
    params = curve.fp
    nd = params.n_digits
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    x1, y1, f1 = a3
    x2, y2, f2 = b3
    n = x1.shape[1]
    n_pad = max(128, 1 << max(0, (n - 1).bit_length()))
    if n_pad != n:
        pad = n_pad - n
        x1, y1, x2, y2 = (jnp.pad(v, ((0, 0), (0, pad)))
                          for v in (x1, y1, x2, y2))
        f1 = jnp.pad(f1, ((0, 0), (0, pad)), constant_values=1)
        f2 = jnp.pad(f2, ((0, 0), (0, pad)), constant_values=1)

    mod_col, _one, mats = _mont_consts(params)
    mod_col = jnp.asarray(mod_col)
    mats = tuple(jnp.asarray(m, jnp.bfloat16) for m in mats)
    acoef = jnp.pad(jnp.asarray(curve.a).reshape(nd),
                    (0, LANES - nd))[:, None]

    num, den, inf3f = _ec_pre_call(nd, n_pad, 128, interpret)(
        x1, y1, x2, y2, f1, f2, mod_col, acoef, *mats)
    dinv = _batch_inverse_dm(params, den, interpret)
    x3, y3 = _ec_post_call(nd, n_pad, 128, interpret)(
        num, dinv, x1, y1, x2, y2, f1, f2, inf3f, mod_col, *mats)
    return x3[:, :n], y3[:, :n], inf3f[:, :n]


def dm_neg_mod(params, y):
    """(p - y) mod p on a digit-major tile, XLA-level (tiny arrays only:
    the hybrid MSM uses this once per chunk on [128, wc] columns)."""
    nd = params.n_digits
    n = y.shape[1]
    row = _from_dm(y, n, nd)
    from ..fields import fp as fpmod
    return _to_dm(fpmod.neg_mod(params, row), n)
