"""Pallas TPU kernel for batched Montgomery multiplication.

Why a kernel: the pure-XLA mont_mul (fields/fp.py) inlines ~10³ HLO ops per
field multiply; graphs like Pippenger MSM or the Poseidon permutation that
contain dozens-to-hundreds of field multiplies explode to >10⁵ HLO and take
tens of minutes to compile (and run with poor VMEM locality).  This kernel
collapses one batched Montgomery multiply to ONE custom call: schoolbook
product, REDC by full multiplication, carry resolution and the conditional
subtraction all happen in VMEM.

Layout: a, b are [N, nd] uint32 arrays of 16-bit digits (ops/limbs.py).
Inside the kernel a block of TILE rows lives as [TILE, 128] with the digit
axis on lanes (nd ≤ 52 for every supported field; products span < 104 < 128
lanes so shifted accumulation never wraps).

Digit products are exact in uint32 (16×16), column sums stay < 2⁷ · 2²⁶ per
pass, and carries are resolved with a lane-axis Kogge-Scan (log-depth roll /
or-and combine) — the same scheme as ops/limbs but on VMEM tiles.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from .limbs import DIGIT_BITS, DIGIT_MASK

LANES = 128


def use_pallas() -> bool:
    v = os.environ.get("GINGERLIB_PALLAS", "auto").lower()
    if v in ("1", "true", "yes", "on"):
        return True
    if v in ("0", "false", "no", "off"):
        return False
    return jax.default_backend() == "tpu"


def _roll_lanes(x, k: int):
    """shift lanes up by k (static), zero-filling."""
    if k == 0:
        return x
    return jnp.pad(x, ((0, 0), (k, 0)))[:, :LANES]


def _carry_resolve(v, width: int):
    """Full carry propagation along lanes: v [T, 128] u32 columns (any
    magnitude < 2^32 − 2^16) -> digits < 2^16 within `width` lanes."""
    # two local split passes: digit = lo + (hi of left neighbour)
    for _ in range(2):
        lo = v & DIGIT_MASK
        hi = v >> DIGIT_BITS
        v = lo + _roll_lanes(hi, 1)
    # now v <= 2^16 + eps; carries in {0,1}: Kogge-Stone generate/propagate
    g = (v >> DIGIT_BITS).astype(jnp.uint32)      # generates carry
    p = (v == DIGIT_MASK).astype(jnp.uint32)      # propagates carry
    k = 1
    while k < width:
        g = g | (p & _roll_lanes(g, k))
        p = p & _roll_lanes(p, k)
        k *= 2
    carry_in = _roll_lanes(g, 1)
    return (v + carry_in) & DIGIT_MASK


def _school_mul(a, b, na: int, nb: int):
    """column sums of a·b: a [T,128] (na digits), b [T,128] (nb digits) ->
    [T,128] columns (un-normalized, < (na+nb)·2^16 per column after split).
    """
    acc = jnp.zeros_like(a)
    for i in range(na):
        ai = a[:, i:i + 1]
        p = ai * b                         # u32 exact (16×16)
        acc = acc + _roll_lanes(p & DIGIT_MASK, i)
        acc = acc + _roll_lanes(p >> DIGIT_BITS, i + 1)
    return acc


def _lane_mask(n: int, shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1) < n


def _mont_core(a, b, mod, npr, nd: int, width: int):
    """In-kernel Montgomery multiply on [T, 128] tiles (digit axis on
    lanes).  Composable: EC/pow kernels chain several of these in VMEM."""
    T = _school_mul(a, b, nd, nd)              # 2nd columns
    T = _carry_resolve(T, width)
    # m = (T mod R) · N' mod R
    lo_mask = _lane_mask(nd, a.shape)
    t_lo = jnp.where(lo_mask, T, 0)
    m = _school_mul(t_lo, npr, nd, nd)
    m = _carry_resolve(m, width)
    m = jnp.where(lo_mask, m, 0)               # low nd digits only
    # U = m·N + T ; V = U / R  (exact: low nd digits cancel to zero)
    u = _school_mul(m, mod, nd, nd) + T
    u = _carry_resolve(u, width + 1)
    v = jnp.pad(u[:, nd:], ((0, 0), (0, nd)))  # V: nd+1 digits, < 2p
    # conditional subtract p: s = v + (~p) + 1 over nd+1 digits
    sub_mask = _lane_mask(nd + 1, a.shape)
    comp = jnp.where(sub_mask, DIGIT_MASK - mod, 0)  # lanes >= nd: p = 0
    one0 = jnp.where(jax.lax.broadcasted_iota(jnp.int32, a.shape, 1) == 0,
                     jnp.uint32(1), jnp.uint32(0))
    s = jnp.where(sub_mask, v, 0) + comp + one0
    diff, carry_out = _carry_resolve_carryout(s, nd + 1)
    take_diff = carry_out > 0                  # v >= p
    out = jnp.where(take_diff[:, None], diff, v)
    return jnp.where(_lane_mask(nd, a.shape), out, 0)


def _mont_kernel(nd: int, width: int, a_ref, b_ref, mod_ref, npr_ref,
                 out_ref):
    a = a_ref[:]
    b = b_ref[:]
    mod = jnp.broadcast_to(mod_ref[:], a.shape)
    npr = jnp.broadcast_to(npr_ref[:], a.shape)
    out_ref[:] = _mont_core(a, b, mod, npr, nd, width)


def _carry_resolve_carryout(v, ncarry: int):
    """like _carry_resolve but also returns the carry OUT of lane
    ncarry−1 (u32 [T]).  The carry is the fully-resolved digit AT lane
    ncarry: the initial split passes can park a generated carry there
    directly, which the Kogge-Stone generate bit at ncarry−1 would miss."""
    for _ in range(2):
        lo = v & DIGIT_MASK
        hi = v >> DIGIT_BITS
        v = lo + _roll_lanes(hi, 1)
    g = (v >> DIGIT_BITS).astype(jnp.uint32)
    p = (v == DIGIT_MASK).astype(jnp.uint32)
    k = 1
    while k <= ncarry:
        g = g | (p & _roll_lanes(g, k))
        p = p & _roll_lanes(p, k)
        k *= 2
    carry_in = _roll_lanes(g, 1)
    out = (v + carry_in) & DIGIT_MASK
    return out, out[:, ncarry]


@functools.lru_cache(maxsize=64)
def _mont_call(nd: int, n_rows: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    width = 2 * nd
    assert width <= LANES, "field too wide for the 128-lane kernel"

    kernel = functools.partial(_mont_kernel, nd, width)

    grid = (n_rows // tile,)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.uint32),
        interpret=interpret,
    )


def mont_mul_pallas(params, a, b, interpret: bool | None = None):
    """Montgomery multiply via the Pallas kernel.  a, b: [..., nd] uint32
    digits (broadcast-compatible); returns [..., nd]."""
    nd = params.n_digits
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    a2 = a.reshape(n, nd)
    b2 = b.reshape(n, nd)

    tile = 256
    n_pad = max(tile, ((n + tile - 1) // tile) * tile)
    if n_pad != n:
        a2 = jnp.pad(a2, ((0, n_pad - n), (0, 0)))
        b2 = jnp.pad(b2, ((0, n_pad - n), (0, 0)))
    a2 = jnp.pad(a2, ((0, 0), (0, LANES - nd)))
    b2 = jnp.pad(b2, ((0, 0), (0, LANES - nd)))
    mod = jnp.pad(jnp.asarray(params.modulus_digits, jnp.uint32)[None, :],
                  ((0, 0), (0, LANES - nd)))
    npr = jnp.pad(jnp.asarray(params.nprime_digits, jnp.uint32)[None, :],
                  ((0, 0), (0, LANES - nd)))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _mont_call(nd, n_pad, tile, interpret)(a2, b2, mod, npr)
    return out[:n, :nd].reshape(*batch, nd)


# ---------------------------------------------------------------------------
# MXU-assisted REDC: multiply-by-constant as bf16 matmul
# ---------------------------------------------------------------------------
#
# Two of the three big multiplies in Montgomery reduction have a CONSTANT
# operand (N' and N).  A bignum multiply by a constant is a linear map on
# the digit vector — i.e. a matmul with a precomputed matrix — which the
# MXU executes for free while the VPU does the variable×variable school
# product.  Exactness: inputs are 8-bit digit values (≤ 255, exact in
# bf16), matrix entries are 8-bit digits of the shifted constant, products
# ≤ 255² accumulate over ≤ 96 rows < 2^23 — exact in the MXU's f32
# accumulator.  Even/odd output byte columns go through separate matrices
# so every matrix entry stays ≤ 255.
#
# Digit layout trick: instead of interleaving lo/hi bytes (a lane shuffle),
# the 16-bit digits are split as x96 = (t & 0xff) + roll(t >> 8, 48) —
# lanes 0..47 carry weight 2^(16i), lanes 48..95 weight 2^(16(i-48)+8) —
# and the constant matrices bake those row weights in.

def _const_mul_matrices(c: int, nd: int) -> tuple:
    """Host: [128, 128] bf16 even/odd matrices for x96 · c.

    Row i has weight w(i) = 2^(16 i) for i < nd, 2^(16 (i-nd) + 8) for
    nd <= i < 2 nd.  M_even[i, k] = byte 2k of c·w(i), M_odd[i, k] = byte
    2k+1 — so (even + 256·odd)[k] is the k-th 16-bit column of x·c.
    """
    me = np.zeros((LANES, LANES), np.float32)
    mo = np.zeros((LANES, LANES), np.float32)
    for i in range(2 * nd):
        w = 16 * i if i < nd else 16 * (i - nd) + 8
        v = c << w
        for k in range(LANES):
            b_even = (v >> (16 * k)) & 0xFF
            b_odd = (v >> (16 * k + 8)) & 0xFF
            me[i, k] = b_even
            mo[i, k] = b_odd
    return me, mo  # float32; cast to bf16 at the call site (values <= 255)


def _semi_normalize(v, width: int):
    """two local split passes: columns < 2^31 -> digits <= 2^16 + 2.

    NOT fully normalized (no Kogge ripple pass) — but the MXU byte-split
    is exact for digit values up to ~2^16 (hi byte <= 257, exact in bf16;
    f32 accumulators keep headroom), and REDC only needs the digit
    vector's VALUE, not canonical digits.  ~10x cheaper than a full
    resolve (the Kogge-Stone pass is all lane-rolls)."""
    for _ in range(2):
        lo = v & DIGIT_MASK
        hi = v >> DIGIT_BITS
        v = lo + _roll_lanes(hi, 1)
    return v


def _split96(t, nd: int):
    """16-bit digits [T, 128] -> x96 byte layout (see above).  Mosaic has
    no u32->bf16 cast; route through int32.  Accepts semi-normalized
    digits (<= 2^16 + 2): hi 'byte' may reach 257, still bf16-exact."""
    lo = t & jnp.uint32(0xFF)
    hi = t >> 8
    return (lo + _roll_lanes(hi, nd)).astype(jnp.int32).astype(jnp.bfloat16)


def _const_mul_mxu(t, me_ref, mo_ref, nd: int):
    """x·c for 16-bit digit x [T,128] (< 2^16 digits) and the constant
    encoded in me/mo — returns un-normalized 16-bit columns (< 2^31)."""
    x = _split96(t, nd)
    even = jnp.dot(x, me_ref[:], preferred_element_type=jnp.float32)
    odd = jnp.dot(x, mo_ref[:], preferred_element_type=jnp.float32)
    even_u = even.astype(jnp.int32).astype(jnp.uint32)
    odd_u = odd.astype(jnp.int32).astype(jnp.uint32)
    return even_u + (odd_u << 8)


def _mont_core_mxu(a, b, mod, npr_e, npr_o, n_e, n_o, nd: int, width: int):
    """Montgomery multiply with the two constant multiplies on the MXU.

    Only the FINAL carry pass is a full (Kogge-Stone) resolve: the school
    product and m go to the byte-split matmuls semi-normalized (values are
    what matters mod R; see _semi_normalize) — the two dropped full
    resolves were ~40% of kernel time.  m <= R(1 + 2^-14) keeps
    v = (T + mN)/R < 1.0001·p, so the single conditional subtract still
    canonicalizes."""
    T = _school_mul(a, b, nd, nd)
    T = _semi_normalize(T, width)
    lo_mask = _lane_mask(nd, a.shape)
    t_lo = jnp.where(lo_mask, T, 0)
    m = _semi_normalize(_const_mul_mxu(t_lo, npr_e, npr_o, nd), width)
    m = jnp.where(lo_mask, m, 0)
    u = _const_mul_mxu(m, n_e, n_o, nd) + T
    u = _carry_resolve(u, width + 1)
    v = jnp.pad(u[:, nd:], ((0, 0), (0, nd)))
    sub_mask = _lane_mask(nd + 1, a.shape)
    comp = jnp.where(sub_mask, DIGIT_MASK - mod, 0)
    one0 = jnp.where(jax.lax.broadcasted_iota(jnp.int32, a.shape, 1) == 0,
                     jnp.uint32(1), jnp.uint32(0))
    s = jnp.where(sub_mask, v, 0) + comp + one0
    diff, carry_out = _carry_resolve_carryout(s, nd + 1)
    out = jnp.where((carry_out > 0)[:, None], diff, v)
    return jnp.where(_lane_mask(nd, a.shape), out, 0)


def _mont_mxu_kernel(nd, width, a_ref, b_ref, mod_ref, npr_e, npr_o,
                     n_e, n_o, out_ref):
    a = a_ref[:]
    b = b_ref[:]
    mod = jnp.broadcast_to(mod_ref[:], a.shape)
    out_ref[:] = _mont_core_mxu(a, b, mod, npr_e, npr_o, n_e, n_o,
                                nd, width)


@functools.lru_cache(maxsize=64)
def _mont_mxu_call(nd: int, n_rows: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    width = 2 * nd
    assert width <= LANES
    kernel = functools.partial(_mont_mxu_kernel, nd, width)
    mat_spec = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            mat_spec, mat_spec, mat_spec, mat_spec,
        ],
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.uint32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=16)
def _mxu_mats(modulus: int, nprime: int, nd: int):
    me_np, mo_np = _const_mul_matrices(nprime, nd)
    me_n, mo_n = _const_mul_matrices(modulus, nd)
    return me_np, mo_np, me_n, mo_n


def use_mxu() -> bool:
    """Gate for the MXU-REDC kernel (validated vs the VPU kernel on TPU;
    GINGERLIB_MXU=0 forces the pure-VPU path)."""
    v = os.environ.get("GINGERLIB_MXU", "auto").lower()
    if v in ("1", "true", "yes", "on"):
        return True
    if v in ("0", "false", "no", "off"):
        return False
    return jax.default_backend() == "tpu"


def mont_mul_pallas_mxu(params, a, b, interpret: bool | None = None):
    """Montgomery multiply with MXU-assisted REDC.  Same contract as
    mont_mul_pallas."""
    nd = params.n_digits
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    a2 = a.reshape(n, nd)
    b2 = b.reshape(n, nd)

    tile = 256
    n_pad = max(tile, ((n + tile - 1) // tile) * tile)
    if n_pad != n:
        a2 = jnp.pad(a2, ((0, n_pad - n), (0, 0)))
        b2 = jnp.pad(b2, ((0, n_pad - n), (0, 0)))
    a2 = jnp.pad(a2, ((0, 0), (0, LANES - nd)))
    b2 = jnp.pad(b2, ((0, 0), (0, LANES - nd)))
    mod = jnp.pad(jnp.asarray(params.modulus_digits, jnp.uint32)[None, :],
                  ((0, 0), (0, LANES - nd)))
    me_np, mo_np, me_n, mo_n = (
        jnp.asarray(m, jnp.bfloat16)
        for m in _mxu_mats(params.modulus, params.nprime, nd))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _mont_mxu_call(nd, n_pad, tile, interpret)(
        a2, b2, mod, me_np, mo_np, me_n, mo_n)
    return out[:n, :nd].reshape(*batch, nd)


# ---------------------------------------------------------------------------
# fused fixed-exponent pow chain (inversion / legendre / sqrt exponents)
# ---------------------------------------------------------------------------
#
# pow_const at the XLA level scans ~nbits sequential Montgomery multiplies,
# each its own kernel launch — ruinous for the SINGLE root inversion of each
# batched-affine addition (ops/msm.py), which sits on the critical path.
# This kernel runs the whole square-and-multiply ladder in one launch with
# the running power held in VMEM; the exponent bits are scalar-prefetched so
# one compiled kernel serves any exponent of the same bit-length.

def _pow_kernel(nd: int, width: int, nbits: int, bits_ref, a_ref, mod_ref,
                npr_ref, one_ref, out_ref):
    a = a_ref[:]
    mod = jnp.broadcast_to(mod_ref[:], a.shape)
    npr = jnp.broadcast_to(npr_ref[:], a.shape)
    r0 = jnp.broadcast_to(one_ref[:], a.shape)

    def body(i, r):
        r = _mont_core(r, r, mod, npr, nd, width)
        return jax.lax.cond(
            bits_ref[i] != 0,
            lambda r: _mont_core(r, a, mod, npr, nd, width),
            lambda r: r, r)

    out_ref[:] = jax.lax.fori_loop(0, nbits, body, r0)


@functools.lru_cache(maxsize=64)
def _pow_call(nd: int, n_rows: int, tile: int, nbits: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    width = 2 * nd
    assert width <= LANES, "field too wide for the 128-lane kernel"
    kernel = functools.partial(_pow_kernel, nd, width, nbits)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, LANES), lambda i, bits: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, bits: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, bits: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i, bits: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, LANES), lambda i, bits: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.uint32),
        interpret=interpret,
    )


# ---------------------------------------------------------------------------
# transposed-tile Montgomery kernel: digits on SUBLANES, batch on LANES
# ---------------------------------------------------------------------------
#
# Lane-axis shifts (pad+slice or pltpu.roll) cost ~10x an arithmetic op on
# the VPU, and the lane-major kernel does ~2 per digit per school multiply.
# With digits on the sublane axis, every digit shift is a ROW slice —
# effectively free — and multiply-by-digit-j is a row broadcast.  Measured
# ~7x faster school product.  The two constant multiplies of the REDC are
# LEFT-matmuls (contract over digit rows) on the MXU.  Tiles are
# transposed on entry/exit ([tile_batch, 128] <-> [128, tile_batch]).

def _roll_rows(x, k: int):
    """shift rows down by k (static), zero-filling (row i -> row i+k)."""
    if k == 0:
        return x
    return jnp.pad(x, ((k, 0), (0, 0)))[: x.shape[0]]


def _row_mask(n: int, shape):
    return jax.lax.broadcasted_iota(jnp.int32, shape, 0) < n


def _carry_resolve_t(v, width: int):
    """transposed _carry_resolve: digits on rows, batch on lanes."""
    for _ in range(2):
        lo = v & DIGIT_MASK
        hi = v >> DIGIT_BITS
        v = lo + _roll_rows(hi, 1)
    g = (v >> DIGIT_BITS).astype(jnp.uint32)
    p = (v == DIGIT_MASK).astype(jnp.uint32)
    k = 1
    while k < width:
        g = g | (p & _roll_rows(g, k))
        p = p & _roll_rows(p, k)
        k *= 2
    return (v + _roll_rows(g, 1)) & DIGIT_MASK


def _carry_resolve_carryout_t(v, ncarry: int):
    for _ in range(2):
        lo = v & DIGIT_MASK
        hi = v >> DIGIT_BITS
        v = lo + _roll_rows(hi, 1)
    g = (v >> DIGIT_BITS).astype(jnp.uint32)
    p = (v == DIGIT_MASK).astype(jnp.uint32)
    k = 1
    while k <= ncarry:
        g = g | (p & _roll_rows(g, k))
        p = p & _roll_rows(p, k)
        k *= 2
    out = (v + _roll_rows(g, 1)) & DIGIT_MASK
    return out, out[ncarry, :]


def _school_mul_t(a, b, nd: int):
    """digit-row school product: a, b [R, L] (digits on rows 0..nd-1) ->
    un-normalized 16-bit columns on rows 0..2nd-1.

    Horner over b's digits MSB-first with r <- roll(r + hi_j) + lo_j —
    ONE row-roll (by 1, the cheapest shuffle) per digit instead of two
    variable-offset rolls."""
    acc = jnp.zeros_like(a)
    for j in range(nd - 1, -1, -1):
        p = a * b[j:j + 1, :]
        acc = _roll_rows(acc + (p >> DIGIT_BITS), 1) + (p & DIGIT_MASK)
    return acc


def _semi_normalize_t(v, width: int):
    for _ in range(2):
        lo = v & DIGIT_MASK
        hi = v >> DIGIT_BITS
        v = lo + _roll_rows(hi, 1)
    return v


def _split96_t(t, nd: int):
    lo = t & jnp.uint32(0xFF)
    hi = t >> 8   # semi-normalized digits: hi may reach 256 (bf16-exact)
    return (lo + _roll_rows(hi, nd)).astype(jnp.int32).astype(jnp.bfloat16)


def _const_mul_mxu_t(t, me_ref, mo_ref, nd: int):
    """x·c in transposed layout: LEFT-matmul contracting digit rows.
    me/mo are the TRANSPOSED [128,128] constant matrices."""
    x = _split96_t(t, nd)
    even = jnp.dot(me_ref[:], x, preferred_element_type=jnp.float32)
    odd = jnp.dot(mo_ref[:], x, preferred_element_type=jnp.float32)
    even_u = even.astype(jnp.int32).astype(jnp.uint32)
    odd_u = odd.astype(jnp.int32).astype(jnp.uint32)
    return even_u + (odd_u << 8)


def _mont_core_t(a, b, mod, npr_e, npr_o, n_e, n_o, nd: int, width: int):
    """Montgomery multiply on transposed tiles [128 digit-rows, L batch].
    mod: [128, L]-broadcastable modulus digits on rows."""
    T = _school_mul_t(a, b, nd)
    T = _semi_normalize_t(T, width)
    lo_mask = _row_mask(nd, a.shape)
    t_lo = jnp.where(lo_mask, T, 0)
    m = _semi_normalize_t(_const_mul_mxu_t(t_lo, npr_e, npr_o, nd), width)
    m = jnp.where(lo_mask, m, 0)
    u = _const_mul_mxu_t(m, n_e, n_o, nd) + T
    u = _carry_resolve_t(u, width + 1)
    v = jnp.pad(u[nd:, :], ((0, nd), (0, 0)))
    sub_mask = _row_mask(nd + 1, a.shape)
    comp = jnp.where(sub_mask, DIGIT_MASK - mod, 0)
    one0 = jnp.where(jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) == 0,
                     jnp.uint32(1), jnp.uint32(0))
    s = jnp.where(sub_mask, v, 0) + comp + one0
    diff, carry_out = _carry_resolve_carryout_t(s, nd + 1)
    out = jnp.where((carry_out > 0)[None, :], diff, v)
    return jnp.where(_row_mask(nd, a.shape), out, 0)


def _mont_t_kernel(nd, width, a_ref, b_ref, mod_ref, npr_e, npr_o,
                   n_e, n_o, out_ref):
    at = jnp.transpose(a_ref[:])
    bt = jnp.transpose(b_ref[:])
    mod = jnp.broadcast_to(mod_ref[:].reshape(LANES, 1), at.shape)
    out = _mont_core_t(at, bt, mod, npr_e, npr_o, n_e, n_o, nd, width)
    out_ref[:] = jnp.transpose(out)


@functools.lru_cache(maxsize=64)
def _mont_t_call(nd: int, n_rows: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    width = 2 * nd
    assert width <= LANES
    kernel = functools.partial(_mont_t_kernel, nd, width)
    mat_spec = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            mat_spec, mat_spec, mat_spec, mat_spec,
        ],
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.uint32),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=16)
def _mxu_mats_t(modulus: int, nprime: int, nd: int):
    me_np, mo_np, me_n, mo_n = _mxu_mats(modulus, nprime, nd)
    return (me_np.T.copy(), mo_np.T.copy(), me_n.T.copy(), mo_n.T.copy())


def _mont_dm_kernel(nd, width, a_ref, b_ref, mod_ref, npr_e, npr_o,
                    n_e, n_o, out_ref):
    """digit-major kernel: refs are [128 digit rows, tile batch lanes] —
    no in-kernel transposes (callers transpose once at the XLA level,
    ~60x cheaper than per-tile Mosaic transposes)."""
    a = a_ref[:]
    mod = jnp.broadcast_to(mod_ref[:], a.shape)
    out_ref[:] = _mont_core_t(a, b_ref[:], mod, npr_e, npr_o, n_e, n_o,
                              nd, width)


@functools.lru_cache(maxsize=64)
def _mont_dm_call(nd: int, n_cols: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    width = 2 * nd
    assert width <= LANES
    kernel = functools.partial(_mont_dm_kernel, nd, width)
    mat_spec = pl.BlockSpec((LANES, LANES), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n_cols // tile,),
        in_specs=[
            pl.BlockSpec((LANES, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            mat_spec, mat_spec, mat_spec, mat_spec,
        ],
        out_specs=pl.BlockSpec((LANES, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LANES, n_cols), jnp.uint32),
        interpret=interpret,
    )


def mont_mul_pallas_dm(params, a, b, interpret: bool | None = None,
                       tile: int = 128):
    """Montgomery multiply with XLA-side layout conversion to digit-major
    [128, N] tiles (digits on sublanes).  Same contract as
    mont_mul_pallas."""
    nd = params.n_digits
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    n_pad = max(tile, ((n + tile - 1) // tile) * tile)

    def to_dm(x):
        x2 = x.reshape(n, nd)
        if n_pad != n:
            x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
        return jnp.pad(x2.T, ((0, LANES - nd), (0, 0)))

    a2 = to_dm(a)
    b2 = to_dm(b)
    mod = jnp.pad(jnp.asarray(params.modulus_digits, jnp.uint32),
                  (0, LANES - nd))[:, None]
    me_np, mo_np, me_n, mo_n = (
        jnp.asarray(m, jnp.bfloat16)
        for m in _mxu_mats_t(params.modulus, params.nprime, nd))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _mont_dm_call(nd, n_pad, tile, interpret)(
        a2, b2, mod, me_np, mo_np, me_n, mo_n)
    return out[:nd, :n].T.reshape(*batch, nd)


def mont_mul_pallas_t(params, a, b, interpret: bool | None = None,
                      tile: int = 128):
    """Montgomery multiply via the transposed-tile kernel.  Same contract
    as mont_mul_pallas."""
    nd = params.n_digits
    a, b = jnp.broadcast_arrays(a, b)
    batch = a.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    a2 = a.reshape(n, nd)
    b2 = b.reshape(n, nd)

    n_pad = max(tile, ((n + tile - 1) // tile) * tile)
    if n_pad != n:
        a2 = jnp.pad(a2, ((0, n_pad - n), (0, 0)))
        b2 = jnp.pad(b2, ((0, n_pad - n), (0, 0)))
    a2 = jnp.pad(a2, ((0, 0), (0, LANES - nd)))
    b2 = jnp.pad(b2, ((0, 0), (0, LANES - nd)))
    mod = jnp.pad(jnp.asarray(params.modulus_digits, jnp.uint32)[None, :],
                  ((0, 0), (0, LANES - nd)))
    me_np, mo_np, me_n, mo_n = (
        jnp.asarray(m, jnp.bfloat16)
        for m in _mxu_mats_t(params.modulus, params.nprime, nd))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _mont_t_call(nd, n_pad, tile, interpret)(
        a2, b2, mod, me_np, mo_np, me_n, mo_n)
    return out[:n, :nd].reshape(*batch, nd)


# ---------------------------------------------------------------------------
# binary extended Euclid inversion kernel
# ---------------------------------------------------------------------------
#
# The Fermat ladder costs ~1.5·nbits sequential Montgomery multiplies
# (~1000 VPU ops each); BEA (the reference's own inverse, fp_768.rs:551-605)
# costs ~4·nbits iterations of ~130 VPU ops — ~4-5x lower latency for the
# batch-1 root inversions on the MSM / Poseidon critical paths.  Runs on
# PLAIN integers: callers convert Montgomery form with one extra multiply
# (fields/fp.inv_mod handles this via R³).

def _shr1(w, nd: int):
    """(w >> 1) across nd+1 16-bit digit lanes (w normalized digits)."""
    nxt = jnp.pad(w[:, 1:], ((0, 0), (0, 1)))
    return ((w >> 1) | ((nxt & 1) << (DIGIT_BITS - 1))) & DIGIT_MASK


def _sub_cc(x, y, n: int):
    """x - y over n digit lanes via complement add; returns (diff, x>=y)."""
    mask = _lane_mask(n, x.shape)
    comp = jnp.where(mask, DIGIT_MASK - y, 0)
    one0 = jnp.where(jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) == 0,
                     jnp.uint32(1), jnp.uint32(0))
    s = jnp.where(mask, x, 0) + comp + one0
    d, carry = _carry_resolve_carryout(s, n)
    return jnp.where(mask, d, 0), carry > 0


def _bea_core(x, p, nd: int, max_iters: int):
    """Binary extended Euclid on lane-major tiles: x, p [B, 128] plain
    integer digits (digits on lanes) -> x^-1 mod p (0 -> 0).  Reusable
    from other kernels (fused Poseidon root inversions)."""
    one = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) == 0,
        jnp.uint32(1), jnp.uint32(0))

    def is_one(w):
        return jnp.all(w == one, axis=1)

    def is_zero(w):
        return jnp.all(w == 0, axis=1)

    def half_mod(w, odd):
        # (w + p)/2 when odd else w/2 ; w < p so w+p < 2p fits nd+1 digits
        t = jnp.where(odd[:, None], w + p, w)
        t = _carry_resolve(t, nd + 1)
        return _shr1(t, nd)

    def body(state):
        it, u, v, b, c = state
        done = is_one(u) | is_one(v) | is_zero(u)
        u_odd = (u[:, 0] & 1) == 1
        v_odd = (v[:, 0] & 1) == 1
        duv, u_ge_v = _sub_cc(u, v, nd)
        dvu, _ = _sub_cc(v, u, nd)
        dbc, b_ge_c = _sub_cc(b, c, nd)
        dcb, c_ge_b = _sub_cc(c, b, nd)
        # b - c mod p: on borrow the complement-add left b-c+2^W in the nd
        # digits; adding p and masking back to nd digits drops the 2^W term
        nd_mask = _lane_mask(nd, u.shape)
        bc = jnp.where(b_ge_c[:, None], dbc,
                       jnp.where(nd_mask, _carry_resolve(dbc + p, nd + 1),
                                 0))
        cb = jnp.where(c_ge_b[:, None], dcb,
                       jnp.where(nd_mask, _carry_resolve(dcb + p, nd + 1),
                                 0))

        case_u = ~u_odd                       # halve u
        case_v = u_odd & ~v_odd               # halve v
        case_s = u_odd & v_odd & u_ge_v       # u -= v, b -= c
        case_t = u_odd & v_odd & ~u_ge_v      # v -= u, c -= b

        u2 = jnp.where(case_u[:, None], _shr1(u, nd),
                       jnp.where(case_s[:, None], duv, u))
        v2 = jnp.where(case_v[:, None], _shr1(v, nd),
                       jnp.where(case_t[:, None], dvu, v))
        b2 = jnp.where(case_u[:, None],
                       half_mod(b, (b[:, 0] & 1) == 1),
                       jnp.where(case_s[:, None], bc, b))
        c2 = jnp.where(case_v[:, None],
                       half_mod(c, (c[:, 0] & 1) == 1),
                       jnp.where(case_t[:, None], cb, c))

        keep = done[:, None]
        return (it + 1,
                jnp.where(keep, u, u2), jnp.where(keep, v, v2),
                jnp.where(keep, b, b2), jnp.where(keep, c, c2))

    def cond(state):
        it, u, v, b, c = state
        running = ~(is_one(u) | is_one(v) | is_zero(u))
        return (it < max_iters) & jnp.any(running)

    zero = jnp.zeros_like(x)
    state = (jnp.int32(0), x, p, one, zero)
    _, u, v, b, c = jax.lax.while_loop(cond, body, state)
    res = jnp.where(is_one(u)[:, None], b, c)
    return jnp.where(is_zero(x)[:, None], zero, res)


def _bea_kernel(nd: int, max_iters: int, a_ref, mod_ref, out_ref):
    x = a_ref[:]
    p = jnp.broadcast_to(mod_ref[:], x.shape)
    out_ref[:] = _bea_core(x, p, nd, max_iters)


@functools.lru_cache(maxsize=64)
def _bea_call(nd: int, n_rows: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    max_iters = 4 * DIGIT_BITS * nd + 64
    kernel = functools.partial(_bea_kernel, nd, max_iters)
    return pl.pallas_call(
        kernel,
        grid=(n_rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, LANES), jnp.uint32),
        interpret=interpret,
    )


def inv_bea_pallas(params, a, interpret: bool | None = None):
    """Plain-integer modular inverse via in-kernel BEA.  a: [..., nd]
    PLAIN-form digits; returns plain-form a^-1 mod p (0 -> 0)."""
    nd = params.n_digits
    batch = a.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    a2 = a.reshape(n, nd)
    tile = 8 if n <= 8 else 256
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        a2 = jnp.pad(a2, ((0, n_pad - n), (0, 0)))
    a2 = jnp.pad(a2, ((0, 0), (0, LANES - nd)))
    mod = jnp.pad(jnp.asarray(params.modulus_digits, jnp.uint32)[None, :],
                  ((0, 0), (0, LANES - nd)))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _bea_call(nd, n_pad, tile, interpret)(a2, mod)
    return out[:n, :nd].reshape(*batch, nd)


def pow_const_pallas(params, a, exp_bits, interpret: bool | None = None):
    """a^e (Montgomery in/out) for fixed MSB-first exponent bits, as ONE
    kernel launch.  a: [..., nd] uint32 digits."""
    nd = params.n_digits
    batch = a.shape[:-1]
    n = int(np.prod(batch)) if batch else 1
    a2 = a.reshape(n, nd)

    # small batches dominate (single root inversions): keep the tile small
    tile = 8 if n <= 8 else 256
    n_pad = ((n + tile - 1) // tile) * tile
    if n_pad != n:
        a2 = jnp.pad(a2, ((0, n_pad - n), (0, 0)))
    a2 = jnp.pad(a2, ((0, 0), (0, LANES - nd)))
    mod = jnp.pad(jnp.asarray(params.modulus_digits, jnp.uint32)[None, :],
                  ((0, 0), (0, LANES - nd)))
    npr = jnp.pad(jnp.asarray(params.nprime_digits, jnp.uint32)[None, :],
                  ((0, 0), (0, LANES - nd)))
    one = jnp.pad(jnp.asarray(params.one_mont, jnp.uint32)[None, :],
                  ((0, 0), (0, LANES - nd)))
    bits = jnp.asarray(np.asarray(exp_bits), jnp.int32)

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _pow_call(nd, n_pad, tile, int(bits.shape[0]), interpret)(
        bits, a2, mod, npr, one)
    return out[:n, :nd].reshape(*batch, nd)
