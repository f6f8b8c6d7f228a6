"""Short-Weierstrass curves over any tower field, batch-first.

Replaces the reference's short_weierstrass_projective.rs /
short_weierstrass_jacobian.rs (used by MNT4/6-753 G1/G2, BLS12, SW6) with a
single homogeneous-projective model in mask-select (branch-free) form:

* a point is a tuple (X, Y, Z) of field elements [..., K, n_digits]
  (projective, infinity = (0, 1, 0)),
* addition is *unified*: the incomplete add and the doubling path are both
  evaluated and the correct result selected per lane with jnp.where — no
  data-dependent branching, so everything jits and shards cleanly,
* scalar multiplication is a fixed-length lax.scan over scalar bits
  (MSB-first double-and-add with per-lane select),
* batch normalization (projective -> affine) uses one Fermat inversion per
  batch (cf. batch_normalization, short_weierstrass_projective.rs:402).

The coordinate field is any ``Ops`` object from fields/towers.py, so G2 over
Fq2/Fq3 reuses the same code as G1 over Fq.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import fp as fpmod
from ..fields.towers import FpOps
from ..ops import limbs


class SWCurveOps:
    """y^2 z = x^3 + a x z^2 + b z^3 over a tower field `F`."""

    def __init__(self, name: str, field_ops, a_host, b_host,
                 generator_host=None, cofactor: int = 1,
                 scalar_field=None, cofactor_inv: int | None = None):
        self.name = name
        self.F = field_ops
        self.fp = field_ops.fp
        self.a = jnp.asarray(field_ops.const(a_host))
        self.b = jnp.asarray(field_ops.const(b_host))
        self.a_host = a_host                # python ints, host-side users
        self.generator_host = generator_host
        self.a_is_zero = all(v == 0 for v in np.asarray(self.a).reshape(-1))
        self.cofactor = cofactor
        self.cofactor_inv = cofactor_inv
        self.scalar_field = scalar_field  # FpParams of Fr
        if generator_host is not None:
            gx = field_ops.const(generator_host[0])
            gy = field_ops.const(generator_host[1])
            self.generator_affine = (jnp.asarray(gx), jnp.asarray(gy))

    # ------------------------------------------------------------------
    # constructors
    # ------------------------------------------------------------------

    def zero(self, batch_shape=()):
        F = self.F
        shape = tuple(batch_shape) + (F.K, self.fp.n_digits)
        z = jnp.zeros(shape, jnp.uint32)
        one = jnp.broadcast_to(jnp.asarray(F.one()), shape)
        return (z, one, z)

    def generator(self, batch_shape=()):
        gx, gy = self.generator_affine
        F = self.F
        shape = tuple(batch_shape) + (F.K, self.fp.n_digits)
        one = jnp.broadcast_to(jnp.asarray(F.one()), shape)
        return (jnp.broadcast_to(gx, shape), jnp.broadcast_to(gy, shape), one)

    def from_affine(self, x, y):
        one = jnp.broadcast_to(jnp.asarray(self.F.one()), x.shape)
        return (x, y, one)

    # ------------------------------------------------------------------
    # predicates
    # ------------------------------------------------------------------

    def is_zero(self, P):
        return self.F.is_zero(P[2])

    def eq(self, P, Q):
        """Projective equality (cross-multiplied), including infinity."""
        F = self.F
        x1, y1, z1 = P
        x2, y2, z2 = Q
        both_zero = self.is_zero(P) & self.is_zero(Q)
        one_zero = self.is_zero(P) ^ self.is_zero(Q)
        ex = F.eq(F.mul(x1, z2), F.mul(x2, z1))
        ey = F.eq(F.mul(y1, z2), F.mul(y2, z1))
        return both_zero | (ex & ey & ~one_zero)

    # ------------------------------------------------------------------
    # group law (branch-free)
    # ------------------------------------------------------------------

    def neg(self, P):
        x, y, z = P
        return (x, self.F.neg(y), z)

    def double(self, P):
        """dbl-2007-bl-style homogeneous doubling (handles infinity: Z=0
        propagates to Z3=0; (0,1,0) doubles to (0, w(B-h)-2RR?, 0) — we mask
        to canonical infinity)."""
        F = self.F
        X1, Y1, Z1 = P
        XX = F.sqr(X1)
        ZZ = F.sqr(Z1)
        three_xx = F.add(F.double(XX), XX)
        if self.a_is_zero:
            w = three_xx
        else:
            w = F.add(F.mul(self.a, ZZ), three_xx)
        s = F.double(F.mul(Y1, Z1))
        ss = F.sqr(s)
        sss = F.mul(s, ss)
        R = F.mul(Y1, s)
        RR = F.sqr(R)
        B = F.sub(F.sub(F.sqr(F.add(X1, R)), XX), RR)
        h = F.sub(F.sqr(w), F.double(B))
        X3 = F.mul(h, s)
        Y3 = F.sub(F.mul(w, F.sub(B, h)), F.double(RR))
        Z3 = sss
        # canonicalize infinity (also covers Y1 == 0 lanes: order-2 points
        # don't exist on odd-order subgroups, but doubling a 2-torsion point
        # must give infinity)
        inf = self.is_zero(P) | F.is_zero(Y1)
        return self._select(inf, self.zero(X1.shape[:-2]), (X3, Y3, Z3))

    def add(self, P, Q):
        """Unified addition: correct for all inputs via per-lane select."""
        F = self.F
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q
        # add-1998-cmo-2 incomplete path
        Y1Z2 = F.mul(Y1, Z2)
        X1Z2 = F.mul(X1, Z2)
        Z1Z2 = F.mul(Z1, Z2)
        u = F.sub(F.mul(Y2, Z1), Y1Z2)
        v = F.sub(F.mul(X2, Z1), X1Z2)
        uu = F.sqr(u)
        vv = F.sqr(v)
        vvv = F.mul(v, vv)
        Rv = F.mul(vv, X1Z2)
        A = F.sub(F.sub(F.mul(uu, Z1Z2), vvv), F.double(Rv))
        X3 = F.mul(v, A)
        Y3 = F.sub(F.mul(u, F.sub(Rv, A)), F.mul(vvv, Y1Z2))
        Z3 = F.mul(vvv, Z1Z2)
        added = (X3, Y3, Z3)

        same_x = F.is_zero(v)
        same_y = F.is_zero(u)
        p_inf = self.is_zero(P)
        q_inf = self.is_zero(Q)
        doubled = self.double(P)
        zero = self.zero(X1.shape[:-2])

        out = added
        out = self._select(same_x & same_y, doubled, out)    # P == Q
        out = self._select(same_x & ~same_y, zero, out)      # P == -Q
        out = self._select(q_inf, P, out)
        out = self._select(p_inf, Q, out)
        return out

    def add_mixed(self, P, xy):
        """P + affine(x, y): saves the Z2 multiplications (prover hot path,
        cf. add_assign_mixed, short_weierstrass_projective.rs:481)."""
        F = self.F
        X1, Y1, Z1 = P
        x2, y2 = xy
        # assume affine point is not infinity (callers mask separately)
        u = F.sub(F.mul(y2, Z1), Y1)
        v = F.sub(F.mul(x2, Z1), X1)
        uu = F.sqr(u)
        vv = F.sqr(v)
        vvv = F.mul(v, vv)
        Rv = F.mul(vv, X1)
        A = F.sub(F.sub(F.mul(uu, Z1), vvv), F.double(Rv))
        X3 = F.mul(v, A)
        Y3 = F.sub(F.mul(u, F.sub(Rv, A)), F.mul(vvv, Y1))
        Z3 = F.mul(vvv, Z1)
        added = (X3, Y3, Z3)

        same_x = F.is_zero(v)
        same_y = F.is_zero(u)
        p_inf = self.is_zero(P)
        doubled = self.double(P)
        zero = self.zero(X1.shape[:-2])
        out = added
        out = self._select(same_x & same_y, doubled, out)
        out = self._select(same_x & ~same_y, zero, out)
        out = self._select(p_inf, self.from_affine(x2, y2), out)
        return out

    def batch_affine_add(self, a_pt, b_pt):
        """Pairwise affine addition with ONE shared inversion for the whole
        batch (the TPU form of the reference's batch_normalization + affine
        running sums, msm/variable_base.rs:60-66 — an affine add costs
        ~4 muls + 3 batch-inversion muls vs ~30 for unified projective).

        a_pt, b_pt: ((x, y), inf) with x, y [N, K, nd] and inf [N] bool.
        Complete: handles doubling, P + (-P) and infinity lanes branch-free.
        Returns ((x3, y3), inf3).

        On TPU, K=1 curves take the fused two-kernel Pallas path
        (ops/pallas_ec.py) — same semantics, ~one HLO per field op less
        glue; towers (G2) and CPU keep the XLA form below.
        """
        from ..ops import pallas_ec, pallas_ec_rns
        from ..ops.pallas_mont import use_pallas
        if use_pallas() and pallas_ec_rns.supports(self):
            return pallas_ec_rns.batch_affine_add_rns(self, a_pt, b_pt)
        if use_pallas() and pallas_ec.supports(self):
            return pallas_ec.batch_affine_add_fused(self, a_pt, b_pt)
        from ..fields.towers import ext_batch_inverse_tree
        F = self.F
        (x1, y1), inf1 = a_pt
        (x2, y2), inf2 = b_pt

        dx = F.sub(x2, x1)
        dy = F.sub(y2, y1)
        same_x = F.is_zero(dx)
        same_y = F.is_zero(dy)
        dbl = same_x & same_y & ~inf1 & ~inf2
        anti = same_x & ~same_y & ~inf1 & ~inf2

        # doubling lanes: λ = (3x² + a) / 2y ; others: λ = dy / dx
        xx = F.sqr(x1)
        three_xx_a = F.add(F.add(F.double(xx), xx), self.a)
        sel = dbl[..., None, None]
        num = jnp.where(sel, three_xx_a, dy)
        den = jnp.where(sel, F.double(y1), dx)
        # dead lanes (anti / inf) keep den possibly 0 — batch inverse maps
        # 0 -> 0 and the result is selected away below
        dinv = ext_batch_inverse_tree(F, den)
        lam = F.mul(num, dinv)
        x3 = F.sub(F.sub(F.sqr(lam), x1), x2)
        y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)

        y1_zero = F.is_zero(y1)
        inf3 = (inf1 & inf2) | anti | (dbl & y1_zero)
        m1 = inf1[..., None, None]
        m2 = inf2[..., None, None]
        x_out = jnp.where(m1, x2, jnp.where(m2, x1, x3))
        y_out = jnp.where(m1, y2, jnp.where(m2, y1, y3))
        zero = jnp.zeros_like(x_out)
        mz = inf3[..., None, None]
        return ((jnp.where(mz, zero, x_out), jnp.where(mz, zero, y_out)),
                inf3)

    def _select(self, mask, A, B):
        m = mask[..., None, None]
        return tuple(jnp.where(m, a, b) for a, b in zip(A, B))

    def select(self, mask, A, B):
        return self._select(mask, A, B)

    # ------------------------------------------------------------------
    # scalar multiplication
    # ------------------------------------------------------------------

    def mul_bits(self, P, bits):
        """[k]P with per-lane scalars given as a bit array [..., nbits]
        (MSB first).  Fixed-trip double-and-add scan."""
        nbits = bits.shape[-1]
        bits_t = jnp.moveaxis(bits, -1, 0)  # [nbits, ...]

        def step(acc, bit):
            acc = self.double(acc)
            with_p = self.add(acc, P)
            acc = self._select(bit.astype(bool), with_p, acc)
            return acc, None

        acc0 = self.zero(P[0].shape[:-2])
        acc, _ = jax.lax.scan(step, acc0, bits_t)
        return acc

    def mul_scalar_digits(self, P, scalar_digits):
        """[k]P where k is a standard-form digit array [..., nd] (Fr)."""
        nd = scalar_digits.shape[-1]
        nbits = nd * limbs.DIGIT_BITS
        idx = jnp.arange(nbits - 1, -1, -1)
        bits = ((jnp.take(scalar_digits, idx // limbs.DIGIT_BITS, axis=-1)
                 >> (idx % limbs.DIGIT_BITS)) & 1)
        return self.mul_bits(P, bits)

    def mul_const(self, P, k: int):
        """[k]P for a fixed host integer k."""
        if k == 0:
            return self.zero(P[0].shape[:-2])
        bits = limbs.bits_msb_first(k, k.bit_length())
        bits = jnp.broadcast_to(jnp.asarray(bits),
                                P[0].shape[:-2] + (len(bits),))
        return self.mul_bits(P, bits)

    # ------------------------------------------------------------------
    # normalization / conversion
    # ------------------------------------------------------------------

    def to_affine(self, P):
        """Projective -> affine ((0,0) for infinity, matching the reference's
        affine zero convention, short_weierstrass_projective.rs:37).

        Batched inputs share ONE field inversion via the product tree
        (batch_normalization, short_weierstrass_projective.rs:100):
        per-element BEA scales linearly with batch on TPU and is the
        prover's dominant fixed cost otherwise."""
        F = self.F
        X, Y, Z = P
        batch = Z.shape[:-2]
        if batch and int(np.prod(batch)) > 1:
            from ..fields import towers as _T
            flat = Z.reshape((-1,) + Z.shape[len(batch):])
            zinv = _T.ext_batch_inverse_tree(F, flat).reshape(Z.shape)
        else:
            zinv = F.inv(Z)  # 0 -> 0
        x = F.mul(X, zinv)
        y = F.mul(Y, zinv)
        return x, y

    def on_curve(self, x, y):
        """Affine curve membership: y^2 == x^3 + ax + b."""
        F = self.F
        lhs = F.sqr(y)
        rhs = F.add(F.mul(F.add(F.sqr(x), self.a), x), self.b)
        return F.eq(lhs, rhs)

    # host-side point construction
    def affine_from_ints(self, x_comps, y_comps):
        return (jnp.asarray(self.F.const(x_comps)),
                jnp.asarray(self.F.const(y_comps)))
