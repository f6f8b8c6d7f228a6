"""Extension-field towers as batched flat component arrays.

Replaces the reference's Fp2/Fp3/Fp4/Fp6/Fp12 models
(algebra/src/fields/models/fp{2,3,4,6_2over3,6_3over2,12_2over3over2}.rs)
with a composable, batch-first design:

* an element of a degree-K tower is a uint32 array [..., K, n_digits] whose
  K components (Montgomery form) are ordered "sub-tower low component
  first" (so an Fp12 = quad-over-cubic-over-quad element flattens its
  nested structure depth-first),
* each tower level is an ``Ops`` object (QuadExtOps / CubicExtOps over a
  sub-``Ops``), composing Karatsuba / Toom-style multiplication recursively,
* Frobenius tables are derived at build time by host_ext.py instead of
  transcribing constant tables; tests validate them against the reference's
  extracted tables.

All methods are pure jnp functions of arrays (jit/vmap/shard_map friendly).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import fp as fpmod
from .fp import FpParams
from . import host_ext


def _flatten_host(v):
    """Nested int tuple/list -> flat list of ints (depth-first)."""
    if isinstance(v, (int,)):
        return [v]
    out = []
    for c in v:
        out.extend(_flatten_host(c))
    return out


class FpOps:
    """Degree-1 'tower': the base prime field with a unit component axis."""

    def __init__(self, params: FpParams):
        self.fp = params
        self.K = 1
        self.name = params.name

    # host constant -> device digits [K, n] (Montgomery form)
    def const(self, v) -> np.ndarray:
        vs = _flatten_host(v)
        assert len(vs) == 1
        return fpmod.fp_from_int(self.fp, vs[0])[None, :]

    def zero(self) -> np.ndarray:
        return np.zeros((1, self.fp.n_digits), dtype=np.uint32)

    def one(self) -> np.ndarray:
        return np.asarray(self.fp.one_mont)[None, :]

    def add(self, a, b):
        return fpmod.add_mod(self.fp, a, b)

    def sub(self, a, b):
        return fpmod.sub_mod(self.fp, a, b)

    def neg(self, a):
        return fpmod.neg_mod(self.fp, a)

    def mul(self, a, b):
        return fpmod.mont_mul(self.fp, a, b)

    def sqr(self, a):
        return fpmod.mont_mul(self.fp, a, a)

    def inv(self, a):
        return fpmod.inv_mod(self.fp, a)

    def frob(self, a, i: int):
        return a

    def double(self, a):
        return fpmod.add_mod(self.fp, a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def scale_fp(self, a, s):
        """Multiply every component by base-field element s [..., n]."""
        return fpmod.mont_mul(self.fp, a, s[..., None, :])


class _ExtBase:
    def __init__(self, name: str, sub, degree: int):
        self.name = name
        self.sf = sub
        self.fp = sub.fp
        self.degree = degree
        self.K = degree * sub.K

    def _split(self, x):
        k = self.sf.K
        return tuple(x[..., i * k:(i + 1) * k, :] for i in range(self.degree))

    def _join(self, parts):
        return jnp.concatenate(parts, axis=-2)

    def zero(self) -> np.ndarray:
        return np.zeros((self.K, self.fp.n_digits), dtype=np.uint32)

    def one(self) -> np.ndarray:
        z = self.zero().copy()
        z[: self.sf.K] = self.sf.one()
        return z

    def const(self, v) -> np.ndarray:
        vs = _flatten_host(v)
        assert len(vs) == self.K, (len(vs), self.K)
        return np.concatenate(
            [fpmod.fp_from_int(self.fp, x)[None, :] for x in vs], axis=0)

    def add(self, a, b):
        return fpmod.add_mod(self.fp, a, b)

    def sub(self, a, b):
        return fpmod.sub_mod(self.fp, a, b)

    def neg(self, a):
        return fpmod.neg_mod(self.fp, a)

    def double(self, a):
        return fpmod.add_mod(self.fp, a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def scale_fp(self, a, s):
        return fpmod.mont_mul(self.fp, a, s[..., None, :])


class QuadExtOps(_ExtBase):
    """K = 2*sub.K tower: x = a0 + a1*Y with Y^2 = nonresidue ∈ subfield.

    Mirrors fp2.rs / fp4.rs / fp6_2over3.rs / fp12_2over3over2.rs.
    """

    def __init__(self, name, sub, nonresidue_host, frob_c1_host):
        super().__init__(name, sub, 2)
        self.nr = jnp.asarray(sub.const(nonresidue_host))
        # frobenius coeffs: subfield constants, one per power i in 0..K-1
        self.frob_c1 = [jnp.asarray(sub.const(c)) for c in frob_c1_host]
        # When the nonresidue is the subfield's own tower generator X
        # (all MNT4/MNT6/BLS12 top towers), multiplying by it is a
        # component rotation + one nonresidue mul instead of a full
        # subfield multiplication (fp4.rs:64-68, fp6_2over3.rs:66-77,
        # fp12_2over3over2.rs mul_fp6_by_nonresidue).
        if isinstance(sub, _ExtBase):
            gen = [0] * sub.K
            gen[sub.sf.K] = 1
            self.nr_is_sub_gen = list(_flatten_host(nonresidue_host)) == gen
        else:
            self.nr_is_sub_gen = False

    def mul_by_nonresidue(self, a):
        """subfield element * Y^2."""
        if self.nr_is_sub_gen:
            return self.sf.mul_by_gen(a)
        return self.sf.mul(a, self.nr)

    def mul_by_gen(self, x):
        """x * Y (the tower generator): (a0, a1) -> (nr*a1, a0)."""
        a0, a1 = self._split(x)
        return self._join((self.mul_by_nonresidue(a1), a0))

    def mul(self, x, y):
        a0, a1 = self._split(x)
        b0, b1 = self._split(y)
        v0 = self.sf.mul(a0, b0)
        v1 = self.sf.mul(a1, b1)
        c0 = self.sf.add(v0, self.mul_by_nonresidue(v1))
        t = self.sf.mul(self.sf.add(a0, a1), self.sf.add(b0, b1))
        c1 = self.sf.sub(self.sf.sub(t, v0), v1)
        return self._join((c0, c1))

    def sqr(self, x):
        a0, a1 = self._split(x)
        v0 = self.sf.sqr(a0)
        v1 = self.sf.sqr(a1)
        c0 = self.sf.add(v0, self.mul_by_nonresidue(v1))
        t = self.sf.sqr(self.sf.add(a0, a1))
        c1 = self.sf.sub(self.sf.sub(t, v0), v1)
        return self._join((c0, c1))

    def inv(self, x):
        a0, a1 = self._split(x)
        norm = self.sf.sub(self.sf.sqr(a0),
                            self.mul_by_nonresidue(self.sf.sqr(a1)))
        t = self.sf.inv(norm)
        return self._join((self.sf.mul(a0, t),
                           self.sf.neg(self.sf.mul(a1, t))))

    def conjugate(self, x):
        a0, a1 = self._split(x)
        return self._join((a0, self.sf.neg(a1)))

    # GT unitary inverse (fp4.rs:70): for cyclotomic elements the inverse is
    # the conjugate.
    unitary_inverse = conjugate

    def frob(self, x, i: int):
        a0, a1 = self._split(x)
        f0 = self.sf.frob(a0, i)
        f1 = self.sf.mul(self.sf.frob(a1, i), self.frob_c1[i % self.K])
        return self._join((f0, f1))

    def mul_by_sub(self, x, s):
        """Multiply by a subfield element s (sparse)."""
        a0, a1 = self._split(x)
        return self._join((self.sf.mul(a0, s), self.sf.mul(a1, s)))

    # --- cyclotomic-subgroup (GT) fast ops ---------------------------------

    def cyclotomic_square(self, x):
        """Squaring of unitary elements (norm 1; conjugate == inverse).

        Granger-Scott compressed squaring for the 2over3over2 tower
        (fp12_2over3over2.rs:116-180).  Otherwise the quartic formula
        (fp4.rs:74-81): 2 sub-squarings instead of the 3 sub-mults of a
        generic square — also applied to Fq6 = quad(Fq3), where the
        reference falls back to a generic square (fp6_2over3.rs:83-107).
        """
        S = self.sf
        if isinstance(S, CubicExtOps) and isinstance(S.sf, QuadExtOps):
            return self._cyclotomic_square_gs(x)
        a0, a1 = self._split(x)
        a = S.sqr(a1)
        b = S.add(a1, a0)
        c = S.sub(S.sqr(b), a)
        d = self.mul_by_nonresidue(a)
        e = S.sub(c, d)
        one = jnp.broadcast_to(jnp.asarray(S.one()), a.shape)
        return self._join((S.add(S.double(d), one), S.sub(e, one)))

    def _cyclotomic_square_gs(self, x):
        """fp12_2over3over2.rs:116-180 — three Fp4-style squarings over the
        (z0,z1),(z2,z3),(z4,z5) pairs of Fq2 slices."""
        fq6 = self.sf
        fq2 = fq6.sf
        c0, c1 = self._split(x)
        z0, z4, z3 = fq6._split(c0)
        z2, z1, z5 = fq6._split(c1)
        nr = fq6.mul_by_nonresidue      # Fq2 * xi

        def sq_pair(za, zb):
            tmp = fq2.mul(za, zb)
            ta = fq2.sub(fq2.sub(
                fq2.mul(fq2.add(za, zb), fq2.add(za, nr(zb))), tmp), nr(tmp))
            return ta, fq2.double(tmp)

        t0, t1 = sq_pair(z0, z1)
        t2, t3 = sq_pair(z2, z3)
        t4, t5 = sq_pair(z4, z5)
        nz0 = fq2.add(fq2.double(fq2.sub(t0, z0)), t0)   # 3t0 - 2z0
        nz1 = fq2.add(fq2.double(fq2.add(t1, z1)), t1)   # 3t1 + 2z1
        xt5 = nr(t5)
        nz2 = fq2.add(fq2.double(fq2.add(xt5, z2)), xt5)  # 3·xi·t5 + 2z2
        nz3 = fq2.add(fq2.double(fq2.sub(t4, z3)), t4)   # 3t4 - 2z3
        nz4 = fq2.add(fq2.double(fq2.sub(t2, z4)), t2)   # 3t2 - 2z4
        nz5 = fq2.add(fq2.double(fq2.add(t3, z5)), t3)   # 3t3 + 2z5
        return self._join((fq6._join((nz0, nz4, nz3)),
                           fq6._join((nz2, nz1, nz5))))

    # --- sparse line multiplications (2over3over2 tower) -------------------

    def mul_by_014(self, x, c0, c1, c4):
        """x · (c0 + c1·V + c4·V·W), c* ∈ Fq2 — the M-twist BLS12 line
        (fp12_2over3over2.rs:95-114): ~13 Fq2 mults vs 18 for a dense mul."""
        fq6 = self.sf
        a_, b_ = self._split(x)
        aa = fq6.mul_by_01(a_, c0, c1)
        bb = fq6.mul_by_1(b_, c4)
        o = fq6.sf.add(c1, c4)
        nc1 = fq6.sub(fq6.sub(
            fq6.mul_by_01(fq6.add(a_, b_), c0, o), aa), bb)
        nc0 = fq6.add(self.mul_by_nonresidue(bb), aa)
        return self._join((nc0, nc1))

    # --- sparse line multiplications (MNT towers) ---------------------------

    def mul_by_023(self, x, a, c1):
        """x · (c0 + c1·Y) with c0 = [a, 0], a ∈ Fp — the MNT4 affine-line
        shape (fp4.rs:112-127): v0 degenerates to an Fp scale, so 8 base
        mults instead of the dense Karatsuba's 9.

        a: base-field digits [..., nd]; c1: subfield element [..., sK, nd].
        NOTE the *device* Miller loop (curves/pairing_mnt.py) cannot use
        this: its inversion-free projective lines carry a full subfield
        factor in c0 (c0 = T²·y_P·M), so its f·line is a dense mul by
        construction — this entry serves the host oracle, the in-circuit
        pairing gadget and API parity with the reference.
        """
        S = self.sf
        x0, x1 = self._split(x)
        v0 = S.scale_fp(x0, a)
        v1 = S.mul(x1, c1)
        nc0 = S.add(v0, self.mul_by_nonresidue(v1))
        # other.c0 + other.c1 = c1 with a added into its first Fp coeff
        oc = jnp.concatenate(
            [fpmod.add_mod(self.fp, c1[..., :1, :], a[..., None, :]),
             c1[..., 1:, :]], axis=-2)
        nc1 = S.sub(S.sub(S.mul(S.add(x0, x1), oc), v0), v1)
        return self._join((nc0, nc1))

    def mul_by_2345(self, x, a, c1):
        """x · (c0 + c1·Y) with c0 = (0, 0, a)·= a·X², a ∈ Fp — the MNT6
        affine-line shape (fp6_2over3.rs:110-123): v0 = x0·aX² is 3 base
        mults (one folded a·nr), so 15 base mults instead of 18.

        Same caveat as mul_by_023 re: the device Miller loop.
        """
        S = self.sf
        fp = self.fp
        x0, x1 = self._split(x)
        b0, b1, b2 = S._split(x0)
        t = fpmod.mont_mul(fp, a, S.nr[..., 0, :])      # a·nr, folded once
        v0 = S._join((fpmod.mont_mul(fp, b1, t[..., None, :]),
                      fpmod.mont_mul(fp, b2, t[..., None, :]),
                      fpmod.mont_mul(fp, b0, a[..., None, :])))
        v1 = S.mul(x1, c1)
        nc0 = S.add(v0, self.mul_by_nonresidue(v1))
        oc = jnp.concatenate(
            [c1[..., :2, :],
             fpmod.add_mod(fp, c1[..., 2:3, :], a[..., None, :])], axis=-2)
        nc1 = S.sub(S.sub(S.mul(S.add(x0, x1), oc), v0), v1)
        return self._join((nc0, nc1))

    def mul_by_034(self, x, c0, c3, c4):
        """x · (c0 + c3·W + c4·V·W), c* ∈ Fq2 — the D-twist BLS12 line
        (same Karatsuba shape as mul_by_014 with the roles flipped)."""
        fq6 = self.sf
        a_, b_ = self._split(x)
        aa = fq6.mul_by_sub(a_, c0)
        bb = fq6.mul_by_01(b_, c3, c4)
        o = fq6.sf.add(c0, c3)
        nc1 = fq6.sub(fq6.sub(
            fq6.mul_by_01(fq6.add(a_, b_), o, c4), aa), bb)
        nc0 = fq6.add(self.mul_by_nonresidue(bb), aa)
        return self._join((nc0, nc1))


class CubicExtOps(_ExtBase):
    """K = 3*sub.K tower: x = a0 + a1*X + a2*X^2, X^3 = nonresidue ∈ subfield.

    Mirrors fp3.rs / fp6_3over2.rs (Toom-style multiplication).
    """

    def __init__(self, name, sub, nonresidue_host, frob_c1_host,
                 frob_c2_host):
        super().__init__(name, sub, 3)
        self.nr = jnp.asarray(sub.const(nonresidue_host))
        self.frob_c1 = [jnp.asarray(sub.const(c)) for c in frob_c1_host]
        self.frob_c2 = [jnp.asarray(sub.const(c)) for c in frob_c2_host]

    def mul_by_nonresidue(self, a):
        return self.sf.mul(a, self.nr)

    def mul(self, x, y):
        a0, a1, a2 = self._split(x)
        b0, b1, b2 = self._split(y)
        S = self.sf
        v0 = S.mul(a0, b0)
        v1 = S.mul(a1, b1)
        v2 = S.mul(a2, b2)
        t12 = S.mul(S.add(a1, a2), S.add(b1, b2))  # a1b1+a1b2+a2b1+a2b2
        c0 = S.add(v0, self.mul_by_nonresidue(S.sub(S.sub(t12, v1), v2)))
        t01 = S.mul(S.add(a0, a1), S.add(b0, b1))
        c1 = S.add(S.sub(S.sub(t01, v0), v1), self.mul_by_nonresidue(v2))
        t02 = S.mul(S.add(a0, a2), S.add(b0, b2))
        c2 = S.add(S.sub(S.sub(t02, v0), v2), v1)
        return self._join((c0, c1, c2))

    def sqr(self, x):
        return self.mul(x, x)

    def inv(self, x):
        a0, a1, a2 = self._split(x)
        S = self.sf
        s0 = S.sub(S.sqr(a0), self.mul_by_nonresidue(S.mul(a1, a2)))
        s1 = S.sub(self.mul_by_nonresidue(S.sqr(a2)), S.mul(a0, a1))
        s2 = S.sub(S.sqr(a1), S.mul(a0, a2))
        norm = S.add(S.mul(a0, s0), self.mul_by_nonresidue(
            S.add(S.mul(a2, s1), S.mul(a1, s2))))
        t = S.inv(norm)
        return self._join((S.mul(s0, t), S.mul(s1, t), S.mul(s2, t)))

    def frob(self, x, i: int):
        a0, a1, a2 = self._split(x)
        S = self.sf
        f0 = S.frob(a0, i)
        f1 = S.mul(S.frob(a1, i), self.frob_c1[i % self.K])
        f2 = S.mul(S.frob(a2, i), self.frob_c2[i % self.K])
        return self._join((f0, f1, f2))

    def mul_by_sub(self, x, s):
        a0, a1, a2 = self._split(x)
        S = self.sf
        return self._join((S.mul(a0, s), S.mul(a1, s), S.mul(a2, s)))

    def mul_by_gen(self, x):
        """x * X (the tower generator): (a0,a1,a2) -> (nr*a2, a0, a1)."""
        a0, a1, a2 = self._split(x)
        return self._join((self.mul_by_nonresidue(a2), a0, a1))

    def mul_by_01(self, x, b0, b1):
        """x · (b0 + b1·X), b0,b1 ∈ subfield — 5 sub-mults instead of 6
        (fp6_3over2.rs mul_by_01 shape)."""
        a0, a1, a2 = self._split(x)
        S = self.sf
        aa = S.mul(a0, b0)
        bb = S.mul(a1, b1)
        c0 = S.add(self.mul_by_nonresidue(
            S.sub(S.mul(S.add(a1, a2), b1), bb)), aa)
        c1 = S.sub(S.sub(S.mul(S.add(a0, a1), S.add(b0, b1)), aa), bb)
        c2 = S.add(S.sub(S.mul(S.add(a0, a2), b0), aa), bb)
        return self._join((c0, c1, c2))

    def mul_by_1(self, x, b1):
        """x · (b1·X), b1 ∈ subfield — 3 sub-mults."""
        a0, a1, a2 = self._split(x)
        S = self.sf
        return self._join((self.mul_by_nonresidue(S.mul(a2, b1)),
                           S.mul(a0, b1), S.mul(a1, b1)))


# ---------------------------------------------------------------------------
# generic helpers on any Ops
# ---------------------------------------------------------------------------

def ext_pow_const(ops, x, exp_bits: np.ndarray):
    """x^e for fixed exponent bits (MSB first) via lax.scan."""
    import jax
    one = jnp.broadcast_to(jnp.asarray(ops.one()), x.shape)
    bits = jnp.asarray(exp_bits)

    def step(r, bit):
        r = ops.sqr(r)
        r = jnp.where(bit.astype(bool), ops.mul(r, x), r)
        return r, None

    r, _ = jax.lax.scan(step, one, bits)
    return r


def _wnaf_digits_msb(e: int):
    """Signed NAF digits of e >= 1, MSB first (find_wnaf, biginteger)."""
    digs = []
    while e:
        if e & 1:
            d = 2 - (e & 3)
            e -= d
        else:
            d = 0
        digs.append(d)
        e >>= 1
    return list(reversed(digs))


def ext_cyclotomic_pow_const(ops, x, e: int):
    """x^e for unitary x (GT): wNAF scan with cyclotomic squarings and the
    free conjugate inverse (cyclotomic_exp, fp4.rs:84-109) — one select-mul
    per step instead of square-and-multiply with generic squarings."""
    import jax
    if e == 0:
        return jnp.broadcast_to(jnp.asarray(ops.one()), x.shape)
    digs = jnp.asarray(np.asarray(_wnaf_digits_msb(e), np.int32))
    one = jnp.broadcast_to(jnp.asarray(ops.one()), x.shape)
    x_inv = ops.conjugate(x)

    def step(r, d):
        r = ops.cyclotomic_square(r)
        m = jnp.where(d > 0, x, x_inv)
        rm = ops.mul(r, m)
        r = jnp.where(d != 0, rm, r)
        return r, None

    r, _ = jax.lax.scan(step, one, digs)
    return r


def ext_batch_inverse_tree(ops, a):
    """Invert a flat batch [N, K, nd] with ~3N muls + ONE field inversion.

    Generic-tower version of fields.fp.batch_inverse_tree (the Montgomery
    trick, reference fields/mod.rs:412): log-depth pairwise product tree up,
    one ops.inv at the root, inverses pushed back down.  Zeros pass through
    as zeros (like the reference's batch_inversion skipping zeros).
    """
    n = a.shape[0]
    zero_mask = ops.is_zero(a)
    one = jnp.asarray(ops.one())
    x = jnp.where(zero_mask[..., None, None],
                  jnp.broadcast_to(one, a.shape), a)

    n2 = 1 << max(0, (n - 1).bit_length())
    if n2 != n:
        pad = jnp.broadcast_to(one, (n2 - n,) + a.shape[1:])
        x = jnp.concatenate([x, pad], axis=0)

    levels = [x]
    cur = x
    while cur.shape[0] > 1:
        cur = ops.mul(cur[0::2], cur[1::2])
        levels.append(cur)

    inv = ops.inv(levels[-1])  # [1, K, nd]
    for lvl in range(len(levels) - 2, -1, -1):
        child = levels[lvl]
        left, right = child[0::2], child[1::2]
        inv_left = ops.mul(inv, right)
        inv_right = ops.mul(inv, left)
        inv = jnp.stack([inv_left, inv_right], axis=1).reshape(child.shape)
    inv = inv[:n]
    return jnp.where(zero_mask[..., None, None], jnp.zeros_like(inv), inv)


def ext_from_ints(ops, comps) -> np.ndarray:
    """Host nested ints -> device element [K, n] (Montgomery)."""
    return ops.const(comps)


def ext_to_ints(ops, x) -> list:
    """Device element -> flat list of standard-form ints (host)."""
    x = np.asarray(x)
    return [fpmod.fp_to_int(ops.fp, x[..., i, :]) for i in range(ops.K)]


# ---------------------------------------------------------------------------
# tower builders for the concrete parameter sets
# ---------------------------------------------------------------------------

def build_mnt4_towers(fq_params: FpParams, nr2: int):
    """MNT4-style tower Fq -> Fq2 (X^2=nr) -> Fq4 (Y^2=X)."""
    p = fq_params.modulus
    base = FpOps(fq_params)
    fq2 = QuadExtOps(f"{fq_params.name}2", base, nr2,
                     host_ext.frob_table_fp2(p, nr2))
    c1_4 = host_ext.frob_table_fp4(p, nr2)
    # Fp4's nonresidue is X = (0, 1) in Fq2; frob coeffs are Fp values
    # embedded into Fq2 as (c, 0).
    fq4 = QuadExtOps(f"{fq_params.name}4", fq2, [0, 1],
                     [[c, 0] for c in c1_4])
    return base, fq2, fq4


def build_mnt6_towers(fq_params: FpParams, nr3: int):
    """MNT6-style tower Fq -> Fq3 (X^3=nr) -> Fq6 (Y^2=X)."""
    p = fq_params.modulus
    base = FpOps(fq_params)
    c1, c2 = host_ext.frob_table_fp3(p, nr3)
    fq3 = CubicExtOps(f"{fq_params.name}3", base, nr3, c1, c2)
    c1_6 = host_ext.frob_table_fp6_2over3(p, nr3)
    fq6 = QuadExtOps(f"{fq_params.name}6", fq3, [0, 1, 0],
                     [[c, 0, 0] for c in c1_6])
    return base, fq3, fq6


def build_bls12_towers(fq_params: FpParams, nr2: int, xi):
    """BLS12 tower Fq -> Fq2 (X^2=nr) -> Fq6 (V^3=xi) -> Fq12 (W^2=V)."""
    p = fq_params.modulus
    base = FpOps(fq_params)
    fq2 = QuadExtOps(f"{fq_params.name}2", base, nr2,
                     host_ext.frob_table_fp2(p, nr2))
    c1, c2 = host_ext.frob_table_fp6_3over2(p, nr2, xi)
    fq6 = CubicExtOps(f"{fq_params.name}6", fq2, list(xi),
                      [list(c) for c in c1], [list(c) for c in c2])
    c1_12 = host_ext.frob_table_fp12(p, nr2, xi)
    # Fq12 nonresidue is V = (0,0,1,0,0,0) in flat Fq6 components; its
    # frobenius coeffs are Fq2 values embedded as (c, 0, 0) in Fq6.
    fq12 = QuadExtOps(f"{fq_params.name}12", fq6, [0, 0, 1, 0, 0, 0],
                      [[list(c), [0, 0], [0, 0]] for c in c1_12])
    return base, fq2, fq6, fq12
