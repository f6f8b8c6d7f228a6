"""Device BLS12 ate pairing (curves/models/bls12/{mod,g1,g2}.rs), batched.

X-bit Miller loop over homogeneous-projective G2 line coefficients computed
on device (doubling_step/addition_step, bls12/g2.rs:115-165), line
evaluation by full Fq12 multiplication of the (sparse) line element, final
exponentiation per eprint 2016/130 Table 1 (bls12/mod.rs:148-205).
Twist type D multiplies positions (0,3,4), M positions (0,1,4) of the
[1, v, v², w, vw, v²w] basis.

Everything batches over leading axes like the MNT engine (pairing_mnt.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import fp as fpmod
from ..fields import towers as T
from ..ops import limbs
from .sw import SWCurveOps


class Bls12Pairing:
    def __init__(self, name: str, g1: SWCurveOps, g2: SWCurveOps, fq6, fq12,
                 x: int, x_is_neg: bool, twist_type: str):
        self.name = name
        self.g1 = g1
        self.g2 = g2
        self.fqk = fq12
        self.fq6 = fq6
        self.sub = g2.F            # Fq2 ops
        self.fp = g1.fp
        self.x = x
        self.x_is_neg = x_is_neg
        self.twist_type = twist_type
        self.x_bits = bin(x)[3:]   # MSB skipped, loop pattern
        self.two_inv = jnp.asarray(fpmod.fp_from_int(
            self.fp, pow(2, -1, self.fp.modulus)))
        self.x_bits_arr = limbs.bits_msb_first(x, max(1, x.bit_length()))

    # ------------------------------------------------------------------
    # G2 prepare: line coefficients
    # ------------------------------------------------------------------

    def _prepare_g2(self, q_affine):
        S = self.sub
        qx, qy = q_affine
        one = jnp.broadcast_to(jnp.asarray(S.one()), qx.shape)
        rx, ry, rz = qx, qy, one
        b2 = jnp.broadcast_to(self.g2.b, qx.shape)
        coeffs = []

        def dstep(rx, ry, rz):
            a = S.scale_fp(S.mul(rx, ry), self.two_inv)
            b = S.sqr(ry)
            c = S.sqr(rz)
            c3 = S.add(S.double(c), c)
            e = S.mul(b2, c3)
            f = S.add(S.double(e), e)
            g = S.scale_fp(S.add(b, f), self.two_inv)
            h = S.sub(S.sqr(S.add(ry, rz)), S.add(b, c))
            i_ = S.sub(e, b)
            j = S.sqr(rx)
            e2 = S.sqr(e)
            nx = S.mul(a, S.sub(b, f))
            ny = S.sub(S.sqr(g), S.add(S.double(e2), e2))
            nz = S.mul(b, h)
            j3 = S.add(S.double(j), j)
            if self.twist_type == "M":
                co = (i_, j3, S.neg(h))
            else:
                co = (S.neg(h), j3, i_)
            return (nx, ny, nz), co

        def astep(rx, ry, rz):
            theta = S.sub(ry, S.mul(qy, rz))
            lam = S.sub(rx, S.mul(qx, rz))
            cc = S.sqr(theta)
            d = S.sqr(lam)
            e = S.mul(lam, d)
            f = S.mul(rz, cc)
            g = S.mul(rx, d)
            h = S.sub(S.add(e, f), S.double(g))
            nx = S.mul(lam, h)
            ny = S.sub(S.mul(theta, S.sub(g, h)), S.mul(e, ry))
            nz = S.mul(rz, e)
            j = S.sub(S.mul(theta, qx), S.mul(lam, qy))
            nt = S.neg(theta)
            if self.twist_type == "M":
                co = (j, nt, lam)
            else:
                co = (lam, nt, j)
            return (nx, ny, nz), co

        for bit in self.x_bits:
            (rx, ry, rz), co = dstep(rx, ry, rz)
            coeffs.append(co)
            if bit == "1":
                (rx, ry, rz), co = astep(rx, ry, rz)
                coeffs.append(co)
        return coeffs

    # ------------------------------------------------------------------
    # line evaluation: f *= line(P)
    # ------------------------------------------------------------------

    def _ell(self, f, coeff, px, py):
        """f *= line — sparse Fq12 multiplication (mul_by_014 for M twist,
        mul_by_034 for D): ~13 Fq2 mults vs 18 dense (bls12/mod.rs:60-76,
        fp12_2over3over2.rs:95-114)."""
        S = self.sub
        c0, c1, c2 = coeff
        if self.twist_type == "M":
            return self.fqk.mul_by_014(
                f, c0, S.scale_fp(c1, px), S.scale_fp(c2, py))
        return self.fqk.mul_by_034(
            f, S.scale_fp(c0, py), S.scale_fp(c1, px), c2)

    # ------------------------------------------------------------------
    # Miller loop / final exponentiation
    # ------------------------------------------------------------------

    def miller_loop(self, p_affine, q_affine):
        F = self.fqk
        px = p_affine[0][..., 0, :]
        py = p_affine[1][..., 0, :]
        coeffs = self._prepare_g2(q_affine)
        batch = q_affine[0].shape[:-2]
        f = jnp.broadcast_to(jnp.asarray(F.one()),
                             batch + (F.K, self.fp.n_digits))
        it = iter(coeffs)
        for bit in self.x_bits:
            f = F.sqr(f)
            f = self._ell(f, next(it), px, py)
            if bit == "1":
                f = self._ell(f, next(it), px, py)
        if self.x_is_neg:
            f = F.conjugate(f)
        return f

    def _exp_by_x(self, f):
        """f^x in the cyclotomic subgroup (every _exp_by_x input in the
        2016/130 hard part is unitary): wNAF + Granger-Scott squarings."""
        g = T.ext_cyclotomic_pow_const(self.fqk, f, self.x)
        return self.fqk.conjugate(g) if self.x_is_neg else g

    def final_exponentiation(self, f):
        F = self.fqk
        f1 = F.conjugate(f)        # f^(p^6)
        f2 = F.inv(f)
        r = F.mul(f1, f2)
        f2 = r
        r = F.frob(r, 2)
        r = F.mul(r, f2)
        # hard part (2016/130 Table 1); r and y5 are unitary
        y0 = F.conjugate(F.cyclotomic_square(r))
        y5 = self._exp_by_x(r)
        y1 = F.cyclotomic_square(y5)
        y3 = F.mul(y0, y5)
        y0 = self._exp_by_x(y3)
        y2 = self._exp_by_x(y0)
        y4 = self._exp_by_x(y2)
        y4 = F.mul(y4, y1)
        y1 = self._exp_by_x(y4)
        y3 = F.conjugate(y3)
        y1 = F.mul(F.mul(y1, y3), r)
        y3 = F.conjugate(r)
        y0 = F.mul(y0, r)
        y0 = F.frob(y0, 3)
        y4 = F.mul(y4, y3)
        y4 = F.frob(y4, 1)
        y5 = F.mul(y5, y2)
        y5 = F.frob(y5, 2)
        y5 = F.mul(y5, y0)
        y5 = F.mul(y5, y4)
        return F.mul(y5, y1)

    # ------------------------------------------------------------------
    # public API (same surface as MNTPairing)
    # ------------------------------------------------------------------

    def gt_one(self):
        return np.asarray(self.fqk.one())

    @functools.cached_property
    def _pairing_jit(self):
        from ..jit_config import maybe_jit
        return maybe_jit(lambda p, q: self.final_exponentiation(
            self.miller_loop(p, q)))

    @functools.cached_property
    def _pop_jit(self):
        from ..jit_config import maybe_jit
        return maybe_jit(lambda p, q: self.final_exponentiation(
            self.product_of_miller(self.miller_loop(p, q))))

    def pairing(self, p_affine, q_affine):
        return self._pairing_jit(p_affine, q_affine)

    def product_of_miller(self, f_batch, axis=0):
        F = self.fqk
        cur = f_batch
        n = cur.shape[axis]
        while n > 1:
            if n % 2 == 1:
                pad = jnp.broadcast_to(
                    jnp.asarray(F.one()),
                    cur.shape[:axis] + (1,) + cur.shape[axis + 1:])
                cur = jnp.concatenate([cur, pad], axis=axis)
                n += 1
            ev = jax.lax.slice_in_dim(cur, 0, n, 2, axis=axis)
            od = jax.lax.slice_in_dim(cur, 1, n, 2, axis=axis)
            cur = F.mul(ev, od)
            n = cur.shape[axis]
        return jnp.squeeze(cur, axis=axis)

    def product_of_pairings(self, p_affines, q_affines):
        return self._pop_jit(p_affines, q_affines)
