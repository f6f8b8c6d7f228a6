"""Twisted Edwards curves (Jubjub, Edwards-BLS12, Edwards-SW6).

Replaces algebra/src/curves/models/twisted_edwards_extended/mod.rs with
projective (X:Y:Z) complete formulas (add-2008-bbjlp / dbl-2008-bbjlp):
complete whenever a is a square and d a non-square — true for these curves
— so no branch handling at all (even better than the SW mask-select model
for TPU).  Identity is (0 : 1 : 1).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import fp as fpmod
from ..ops import limbs


class TECurveOps:
    """a·x² + y² = 1 + d·x²·y² over a base prime field."""

    def __init__(self, name, field_ops, a_host: int, d_host: int,
                 generator_host=None, cofactor: int = 1,
                 scalar_field=None, cofactor_inv: int | None = None,
                 mont_a: int | None = None, mont_b: int | None = None):
        self.name = name
        self.F = field_ops
        self.fp = field_ops.fp
        self.a_host = a_host
        self.d_host = d_host
        self.a = jnp.asarray(field_ops.const(a_host))
        self.d = jnp.asarray(field_ops.const(d_host))
        self.cofactor = cofactor
        self.cofactor_inv = cofactor_inv
        self.scalar_field = scalar_field
        # birationally-equivalent Montgomery curve B·y² = x³ + A·x² + x
        # (MontgomeryModelParameters, models/mod.rs:104-120) — used by the
        # in-circuit Montgomery-ladder allocation trick
        self.mont_a = mont_a
        self.mont_b = mont_b
        if generator_host is not None:
            self.generator_affine = (
                jnp.asarray(field_ops.const(generator_host[0])),
                jnp.asarray(field_ops.const(generator_host[1])))

    def zero(self, batch_shape=()):
        F = self.F
        shape = tuple(batch_shape) + (F.K, self.fp.n_digits)
        z = jnp.zeros(shape, jnp.uint32)
        one = jnp.broadcast_to(jnp.asarray(F.one()), shape)
        return (z, one, one)

    def generator(self, batch_shape=()):
        gx, gy = self.generator_affine
        shape = tuple(batch_shape) + (self.F.K, self.fp.n_digits)
        one = jnp.broadcast_to(jnp.asarray(self.F.one()), shape)
        return (jnp.broadcast_to(gx, shape), jnp.broadcast_to(gy, shape), one)

    def from_affine(self, x, y):
        one = jnp.broadcast_to(jnp.asarray(self.F.one()), x.shape)
        return (x, y, one)

    def is_zero(self, P):
        F = self.F
        X, Y, Z = P
        return F.is_zero(X) & F.eq(Y, Z)

    def eq(self, P, Q):
        F = self.F
        x1, y1, z1 = P
        x2, y2, z2 = Q
        return F.eq(F.mul(x1, z2), F.mul(x2, z1)) & \
            F.eq(F.mul(y1, z2), F.mul(y2, z1))

    def neg(self, P):
        X, Y, Z = P
        return (self.F.neg(X), Y, Z)

    def add(self, P, Q):
        """add-2008-bbjlp — complete."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        A = F.mul(Z1, Z2)
        B = F.sqr(A)
        C = F.mul(X1, X2)
        D = F.mul(Y1, Y2)
        E = F.mul(F.mul(jnp.broadcast_to(self.d, C.shape), C), D)
        Fv = F.sub(B, E)
        G = F.add(B, E)
        X3 = F.mul(F.mul(A, Fv),
                   F.sub(F.sub(F.mul(F.add(X1, Y1), F.add(X2, Y2)), C), D))
        aC = F.mul(jnp.broadcast_to(self.a, C.shape), C)
        Y3 = F.mul(F.mul(A, G), F.sub(D, aC))
        Z3 = F.mul(Fv, G)
        return (X3, Y3, Z3)

    add_mixed = None  # complete add covers all cases

    def double(self, P):
        """dbl-2008-bbjlp."""
        F = self.F
        X1, Y1, Z1 = P
        B = F.sqr(F.add(X1, Y1))
        C = F.sqr(X1)
        D = F.sqr(Y1)
        E = F.mul(jnp.broadcast_to(self.a, C.shape), C)
        Fv = F.add(E, D)
        H = F.sqr(Z1)
        J = F.sub(Fv, F.double(H))
        X3 = F.mul(F.sub(F.sub(B, C), D), J)
        Y3 = F.mul(Fv, F.sub(E, D))
        Z3 = F.mul(Fv, J)
        return (X3, Y3, Z3)

    def select(self, mask, A, B):
        m = mask[..., None, None]
        return tuple(jnp.where(m, a, b) for a, b in zip(A, B))

    def mul_bits(self, P, bits):
        bits_t = jnp.moveaxis(bits, -1, 0)

        def step(acc, bit):
            acc = self.double(acc)
            with_p = self.add(acc, P)
            acc = self.select(bit.astype(bool), with_p, acc)
            return acc, None

        acc, _ = jax.lax.scan(step, self.zero(P[0].shape[:-2]), bits_t)
        return acc

    def mul_scalar_digits(self, P, scalar_digits):
        nd = scalar_digits.shape[-1]
        nbits = nd * limbs.DIGIT_BITS
        idx = jnp.arange(nbits - 1, -1, -1)
        bits = ((jnp.take(scalar_digits, idx // limbs.DIGIT_BITS, axis=-1)
                 >> (idx % limbs.DIGIT_BITS)) & 1)
        return self.mul_bits(P, bits)

    def mul_const(self, P, k: int):
        if k == 0:
            return self.zero(P[0].shape[:-2])
        bits = limbs.bits_msb_first(k, k.bit_length())
        bits = jnp.broadcast_to(jnp.asarray(bits),
                                P[0].shape[:-2] + (len(bits),))
        return self.mul_bits(P, bits)

    def to_affine(self, P):
        F = self.F
        X, Y, Z = P
        zinv = F.inv(Z)
        return F.mul(X, zinv), F.mul(Y, zinv)

    def on_curve(self, x, y):
        F = self.F
        xx = F.sqr(x)
        yy = F.sqr(y)
        lhs = F.add(F.mul(jnp.broadcast_to(self.a, xx.shape), xx), yy)
        one = jnp.broadcast_to(jnp.asarray(F.one()), xx.shape)
        rhs = F.add(one, F.mul(F.mul(
            jnp.broadcast_to(self.d, xx.shape), xx), yy))
        return F.eq(lhs, rhs)
