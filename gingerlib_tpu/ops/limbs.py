"""Fixed-width big-integer arithmetic on batched 16-bit digit arrays.

TPU-native design notes
-----------------------
A big integer is a ``uint32`` array whose last axis holds ``n`` little-endian
digits in base ``2**16``.  All leading axes are batch axes ("everything is a
batch of field elements" — a scalar is a batch of one).  The choice of 16-bit
digits in 32-bit lanes is deliberate:

* digit products ``a_i * b_j < 2**32`` are *exact* in uint32 (no u64 needed —
  TPUs have no native 64-bit integer path),
* column sums of a schoolbook product accumulate at most ``2*n`` terms of
  ``< 2**16`` after a lo/hi split, i.e. ``< 2**23`` for the 48-digit (768-bit)
  widths used by MNT4/6-753 — comfortably inside uint32 (and inside the exact
  integer range of f32, which later lets the column reduction ride the MXU),
* carry propagation is deferred to a single normalization pass.

Functional layer: plain jnp functions, jit/vmap/shard_map friendly, no Python
objects on the hot path.  Mirrors the role of ginger-lib's
``algebra/src/biginteger`` (mod.rs:28-140) but is batch-first instead of
scalar-first.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

DIGIT_BITS = 16
DIGIT_BASE = 1 << DIGIT_BITS
DIGIT_MASK = DIGIT_BASE - 1
DTYPE = jnp.uint32


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------

def to_digits(x: int, n: int) -> np.ndarray:
    """Python int -> little-endian base-2^16 digit vector (numpy uint32)."""
    if x < 0:
        raise ValueError("to_digits expects a non-negative integer")
    out = np.zeros((n,), dtype=np.uint32)
    for i in range(n):
        out[i] = x & DIGIT_MASK
        x >>= DIGIT_BITS
    if x != 0:
        raise ValueError(f"integer does not fit in {n} digits")
    return out


def to_digits_batch(xs, n: int) -> np.ndarray:
    """Fast bulk conversion: int.to_bytes + frombuffer (≈1µs/element)."""
    xs = list(xs)
    nbytes = 2 * n
    buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
    return (np.frombuffer(buf, dtype="<u2")
            .reshape(len(xs), n).astype(np.uint32))


def from_digits(d) -> int:
    """Digit vector (last axis) -> python int. Host-side only (1 element)."""
    d = np.asarray(d, dtype=np.uint64)
    if d.ndim != 1:
        raise ValueError("from_digits expects a single digit vector")
    x = 0
    for i in range(d.shape[0] - 1, -1, -1):
        x = (x << DIGIT_BITS) | int(d[i])
    return x


def from_digits_batch(d) -> list:
    """Fast bulk conversion via tobytes + int.from_bytes."""
    d = np.asarray(d)
    flat = d.reshape(-1, d.shape[-1]).astype("<u2")
    nbytes = 2 * flat.shape[-1]
    raw = flat.tobytes()
    return [int.from_bytes(raw[i * nbytes:(i + 1) * nbytes], "little")
            for i in range(flat.shape[0])]


# ---------------------------------------------------------------------------
# carry handling
# ---------------------------------------------------------------------------

def _carry_lookahead(d):
    """Exact carry resolution for digits <= 2^17 - 1 (carries in {0,1}).

    Kogge-Stone generate/propagate with a log-depth associative scan — no
    sequential digit loop, fully vectorized across batch and digits (the
    TPU-native replacement for the reference's adc ripple chain,
    biginteger/mod.rs:112).  Returns (digits < 2^16, carry_out_of_last).
    """
    g = d >> DIGIT_BITS            # 1 where digit >= 2^16 (generates)
    p = (d == DIGIT_MASK)          # propagates an incoming carry

    def comb(x, y):
        gx, px = x
        gy, py = y
        return gy | (py.astype(gy.dtype) & gx), px & py

    G, _ = lax.associative_scan(comb, (g, p), axis=-1)
    c = jnp.concatenate([jnp.zeros_like(G[..., :1]), G[..., :-1]], axis=-1)
    out = (d + c) & DIGIT_MASK
    return out, G[..., -1]


def normalize(x, out_digits: int | None = None):
    """Propagate carries so every digit is < 2^16.

    ``x``: uint32 digits with values up to 2^32 - 2^16 (any redundant
    representation produced by our adds/muls).  Returns uint32 array of shape
    [..., out_digits].  Overflow past the last digit is discarded (mod 2^16k),
    matching fixed-width bigint semantics (biginteger/mod.rs add_nocarry).
    """
    n = x.shape[-1]
    if out_digits is None:
        out_digits = n
    if out_digits > n:
        # make room so carry-out is captured instead of discarded
        pad = [(0, 0)] * (x.ndim - 1) + [(0, out_digits - n)]
        x = jnp.pad(x, pad)
        n = out_digits

    # local split pass: digit = lo + 2^16*hi, add hi into next position
    def split(v):
        lo = v & DIGIT_MASK
        hi = v >> DIGIT_BITS
        hi = jnp.concatenate(
            [jnp.zeros_like(hi[..., :1]), hi[..., :-1]], axis=-1)
        return lo + hi

    x = split(split(x))  # digits now <= 2^16, carries in {0,1}
    y, _ = _carry_lookahead(x)
    return y[..., :out_digits]


def add_raw(a, b):
    """Digit-wise add without carry resolution (caller normalizes)."""
    return a + b


def add(a, b, out_digits: int | None = None):
    """Exact add with carry propagation, truncated to out_digits."""
    return normalize(a + b, out_digits)


def sub_with_borrow(a, b):
    """a - b for normalized inputs. Returns (diff mod 2^16n, borrow_out).

    borrow_out is 1 where b > a (uint32 per batch element).  Implemented as
    a + ~b + 1 with log-depth carry lookahead (two's complement in base
    2^16) — no sequential borrow chain.
    """
    a, b = jnp.broadcast_arrays(a, b)
    s = a + (DIGIT_MASK - b)              # digits <= 2^17 - 2
    s = jnp.concatenate([s[..., :1] + 1, s[..., 1:]], axis=-1)  # two's comp +1
    y, carry_out = _carry_lookahead(s)
    return y, (1 - carry_out).astype(jnp.uint32)


def geq(a, b):
    """a >= b elementwise over the batch (both normalized)."""
    _, borrow = sub_with_borrow(a, b)
    return borrow == 0


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


# ---------------------------------------------------------------------------
# multiplication
# ---------------------------------------------------------------------------

def _antidiagonal_sums(p, width: int):
    """Sum anti-diagonals of [..., n, m] -> [..., width].

    out[k] = sum_i p[i, k-i].  Loop-free shear trick: give each row ``m+1``
    slots, flatten, and re-view with row stride ``m`` — row i lands shifted
    right by i, so plain row summation yields anti-diagonal sums.  Pure
    pad/reshape/sum: fuses on TPU, no gathers.
    """
    n, m = p.shape[-2], p.shape[-1]
    batch = p.shape[:-2]
    outw = n + m  # max index i + j is n+m-2, keep n+m slots
    pad = [(0, 0)] * (len(batch)) + [(0, 0), (0, outw + 1 - m)]
    q = jnp.pad(p, pad)  # [..., n, outw+1]
    q = q.reshape(*batch, n * (outw + 1))
    q = q[..., : n * outw].reshape(*batch, n, outw)
    s = jnp.sum(q, axis=-2)
    return s[..., :width]


def mul_wide_raw(a, b, out_digits: int | None = None):
    """Schoolbook product -> un-normalized column sums (uint32 < 2^23ish).

    a: [..., n], b: [..., m] normalized digits. Result [..., out_digits]
    where out_digits defaults to n + m.  Exactness: each product < 2^32 is
    exact in u32; after the lo/hi split each column accumulates at most
    n + m values < 2^16.
    """
    n, m = a.shape[-1], b.shape[-1]
    if out_digits is None:
        out_digits = n + m
    p = a[..., :, None] * b[..., None, :]  # [..., n, m] u32 exact
    lo = p & DIGIT_MASK
    hi = p >> DIGIT_BITS
    s = _antidiagonal_sums(lo, out_digits)
    if out_digits > 1:
        # hi contributes at position i+j+1: shift by one digit and add
        sh = _antidiagonal_sums(hi, out_digits - 1)
        sh = jnp.concatenate([jnp.zeros_like(sh[..., :1]), sh], axis=-1)
        s = s + sh
    return s


def mul_wide(a, b, out_digits: int | None = None):
    """Exact product of digit vectors, normalized."""
    n, m = a.shape[-1], b.shape[-1]
    if out_digits is None:
        out_digits = n + m
    return normalize(mul_wide_raw(a, b, out_digits), out_digits)


def mul_lo(a, b, n_out: int):
    """Low n_out digits of a*b (i.e. product mod 2^(16*n_out))."""
    return normalize(mul_wide_raw(a[..., :n_out], b[..., :n_out], n_out), n_out)


# ---------------------------------------------------------------------------
# shifts / bit access
# ---------------------------------------------------------------------------

def shift_digits_right(a, k: int):
    """Drop the k least-significant digits (divide by 2^(16k))."""
    out = a[..., k:]
    pad = [(0, 0)] * (a.ndim - 1) + [(0, k)]
    return jnp.pad(out, pad)


def get_bit(a, i):
    """Bit i (traced index ok) of each batched integer -> uint32 {0,1}."""
    d = i // DIGIT_BITS
    r = i % DIGIT_BITS
    digit = jnp.take(a, d, axis=-1)
    return (digit >> r) & 1


def bits_msb_first(x: int, nbits: int) -> np.ndarray:
    """Host-side: fixed python int -> bit array (uint32), MSB first."""
    return np.array([(x >> (nbits - 1 - i)) & 1 for i in range(nbits)],
                    dtype=np.uint32)
