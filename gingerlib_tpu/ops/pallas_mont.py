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


def _mont_kernel(nd: int, width: int, a_ref, b_ref, mod_ref, npr_ref,
                 out_ref):
    a = a_ref[:]
    b = b_ref[:]
    mod = jnp.broadcast_to(mod_ref[:], a.shape)
    npr = jnp.broadcast_to(npr_ref[:], a.shape)
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
    out_ref[:] = jnp.where(_lane_mask(nd, a.shape), out, 0)


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
