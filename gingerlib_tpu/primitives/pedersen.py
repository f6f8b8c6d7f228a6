"""Pedersen and Bowe-Hopwood CRHs over any curve ops
(primitives/src/crh/{pedersen,bowe_hopwood}/mod.rs).

Generator powers are precomputed as stacked affine-free projective arrays;
evaluation is a masked select + tree reduction (batched EC adds) instead of
the reference's per-bit rayon loop.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _bytes_to_bits(data: bytes):
    """LSB-first per byte (primitives/src/lib.rs:97-106 pushes
    (byte >> i) & 1 for i in 0..8)."""
    out = []
    for byte in data:
        for i in range(8):
            out.append((byte >> i) & 1)
    return out


class PedersenWindow:
    def __init__(self, window_size: int, num_windows: int):
        self.window_size = window_size
        self.num_windows = num_windows


def affine_host(curve, P):
    """Device point -> host affine int pair (prime-field curves only)."""
    from ..fields import fp as fpmod
    x, y = curve.to_affine(P)
    x, y = np.asarray(x), np.asarray(y)
    if x.shape[-2] != 1:
        return None  # extension-field coords: no gadget path needed
    return (fpmod.fp_to_int(curve.fp, x[..., 0, :]),
            fpmod.fp_to_int(curve.fp, y[..., 0, :]))


class PedersenCRH:
    """bit-windowed Pedersen hash: Σ_windows Σ_bits bit·(2^i·g_w)."""

    def __init__(self, curve, window: PedersenWindow):
        self.g = curve
        self.w = window
        self.params = None  # (X, Y, Z) arrays [num_windows*window_size, ...]

    def setup(self, rng):
        """Random generator per window, doubling chains within the window
        (pedersen/mod.rs:30-53)."""
        g = self.g
        r = g.scalar_field.modulus
        pts = []
        self.generators_host = []
        for _ in range(self.w.num_windows):
            k = rng.randrange(1, r)
            base = g.mul_const(g.generator(()), k)
            self.generators_host.append(affine_host(g, base))
            cur = base
            for _ in range(self.w.window_size):
                pts.append(cur)
                cur = g.double(cur)
        self.params = tuple(jnp.stack([p[i] for p in pts])
                            for i in range(3))
        return self

    def evaluate_bits(self, bits):
        """bits: python list 0/1, length <= window_size*num_windows."""
        total = self.w.window_size * self.w.num_windows
        assert len(bits) <= total
        bits = list(bits) + [0] * (total - len(bits))
        mask = jnp.asarray(np.asarray(bits, bool))
        g = self.g
        zero = g.zero((total,))
        sel = g.select(mask, self.params, zero)
        # tree reduce
        cur = sel
        n = total
        while n > 1:
            if n % 2:
                cur = tuple(jnp.concatenate([c, z], 0)
                            for c, z in zip(cur, g.zero((1,))))
                n += 1
            cur = g.add(tuple(c[0::2] for c in cur),
                        tuple(c[1::2] for c in cur))
            n = cur[0].shape[0]
        return tuple(c[0] for c in cur)

    def evaluate(self, data: bytes):
        if len(data) * 8 > self.w.window_size * self.w.num_windows:
            raise ValueError("input too long for window parameters")
        return self.evaluate_bits(_bytes_to_bits(data))


class BoweHopwoodCRH:
    """3-bit-chunk signed Pedersen variant (bowe_hopwood/mod.rs).

    Per chunk (b0, b1, b2): acc += (1 + b0 + 2·b1)·(1 − 2·b2)·base_i where
    base_i = 16^i · g_w within each window segment.
    """

    CHUNK_SIZE = 3

    def __init__(self, curve, window: PedersenWindow):
        assert window.window_size % self.CHUNK_SIZE == 0 or True
        self.g = curve
        self.w = window
        self.params = None

    def setup(self, rng):
        g = self.g
        r = g.scalar_field.modulus
        chunks_per_window = self.w.window_size  # window_size counts chunks
        pts = []
        for _ in range(self.w.num_windows):
            k = rng.randrange(1, r)
            base = g.mul_const(g.generator(()), k)
            cur = base
            for _ in range(chunks_per_window):
                pts.append(cur)
                # multiply by 2^4 = 16 between chunks (bowe_hopwood doubles
                # 4x per chunk: 2 bits of magnitude + sign headroom)
                for _ in range(4):
                    cur = g.double(cur)
        self.params = tuple(jnp.stack([p[i] for p in pts])
                            for i in range(3))
        return self

    def evaluate_bits(self, bits):
        total_chunks = self.w.window_size * self.w.num_windows
        nbits = total_chunks * self.CHUNK_SIZE
        assert len(bits) <= nbits
        bits = list(bits) + [0] * (nbits - len(bits))
        g = self.g
        scalars = []
        signs = []
        for c in range(total_chunks):
            b0, b1, b2 = bits[3 * c:3 * c + 3]
            scalars.append(1 + b0 + 2 * b1)
            signs.append(b2)
        # point_i scaled by 1..4, negated by sign
        base = self.params
        doubled = g.double(base)
        tripled = g.add(doubled, base)
        quad = g.double(doubled)
        s = jnp.asarray(np.asarray(scalars, np.int32))
        # select the chunk multiple among 1..4, then apply the sign
        cur = base
        cur = g.select(s == 2, doubled, cur)
        cur = g.select(s == 3, tripled, cur)
        cur = g.select(s == 4, quad, cur)
        sign_mask = jnp.asarray(np.asarray(signs, bool))
        cur = g.select(sign_mask, g.neg(cur), cur)
        n = total_chunks
        while n > 1:
            if n % 2:
                cur = tuple(jnp.concatenate([c, z], 0)
                            for c, z in zip(cur, g.zero((1,))))
                n += 1
            cur = g.add(tuple(c[0::2] for c in cur),
                        tuple(c[1::2] for c in cur))
            n = cur[0].shape[0]
        return tuple(c[0] for c in cur)

    def evaluate(self, data: bytes):
        return self.evaluate_bits(_bytes_to_bits(data))
