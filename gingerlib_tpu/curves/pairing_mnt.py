"""Ate pairings for MNT4/MNT6-type curves, generic over the tower.

Reimplements the reference's MNT4/MNT6 pairing models
(algebra/src/curves/models/mnt4/mod.rs:87-269, mnt6/mod.rs) with one
structural change for TPU: the reference's G2 precompute is an *affine*
double/add ladder with a field inversion per step (mnt4/mod.rs:100-154) —
serial inversions are poison here, so we run a *projective* Miller loop with
homogeneous line coefficients (no inversions at all).  Each line picks up a
uniform scale factor in the sub-field (Fq2/Fq3); such factors are killed by
the easy part of the final exponentiation (z^(q^k/2 - 1) = 1 for subfield z),
so the final GT element matches the reference bit-for-bit.

Line derivation (doubling step, S = (X, Y, Z) homogeneous, scale M = 2YZ²):
    N  = 3X² + a'Z²                    (tangent numerator)
    c1 = N·X − (N·Z)·T·x_P − 2Y²Z      (= M · reference c1)
    c0 = (T²·y_P) · M                  (= M · reference c0)
Addition step (chord through S and ±Q=(x₂,±y₂), scale D = X − x₂Z):
    N± = Y ∓ (∓)…  — N = Y − y₂Z (add) or Y + y₂Z (sub)
    c1 = N·x₂ − N·T·x_P ∓ y₂·D
    c0 = (T²·y_P) · D

The whole loop is one lax.scan over the WNAF (batched over input pairs), so
``product_of_pairings`` for k pairs runs the Miller loop once on a batch of
k and multiplies the results — the 3-pair Groth16 verification is a single
vectorized loop.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import limbs
from ..fields import fp as fpmod
from ..fields import towers as T
from .sw import SWCurveOps


class MNTPairing:
    def __init__(self, name: str, g1: SWCurveOps, g2: SWCurveOps, fqk,
                 wnaf, ate_is_neg: bool, w1: int, w0_abs: int,
                 w0_is_neg: bool, easy_frob: int, easy_mul_q_plus_1: bool):
        """fqk: QuadExtOps over g2's field (Fq4 = quad(Fq2), Fq6 = quad(Fq3)).

        easy_frob: 2 for MNT4 (elt^(q²−1)), 3 for MNT6 (elt^(q³−1)…);
        easy_mul_q_plus_1: MNT6 multiplies the easy part by its q-power too.
        """
        self.name = name
        self.g1 = g1
        self.g2 = g2
        self.fqk = fqk
        self.sub = fqk.sf               # Fq2 / Fq3 ops
        self.fp = g1.fp
        # wnaf is stored LSB-first with the MSB trimmed (mnt4753/mod.rs:43);
        # the loop runs MSB->LSB
        self.wnaf = np.asarray(list(reversed(wnaf)), np.int32)
        self.ate_is_neg = ate_is_neg
        self.w1 = w1
        self.w0_abs = w0_abs
        self.w0_is_neg = w0_is_neg
        self.easy_frob = easy_frob
        self.easy_mul_q_plus_1 = easy_mul_q_plus_1
        # twist T = the sub-field tower generator (X), T² precomputed
        S = self.sub
        t_comps = [0] * S.K
        t_comps[1] = 1
        self.twist = jnp.asarray(S.const(t_comps))
        self.twist_sq = S.mul(self.twist, self.twist)
        self.twist_a = g2.a  # a' = TWIST_COEFF_A (same as G2 COEFF_A)
        # sparse structure of T²: quad sub -> X² = nr ∈ Fp (twist_sq =
        # [nr, 0]); cubic sub -> X² (twist_sq = (0,0,1)).  Verified
        # numerically here; the Miller loop then builds each line's
        # c0 = T²·y_P·M with 2 (quad) / 3 (cubic) base mults instead of a
        # dense 3/6-mult subfield mul — the device-side analogue of the
        # reference's mul_by_023/mul_by_2345 line sparsity (fp4.rs:112,
        # fp6_2over3.rs:110; the dense f·line mul itself cannot be
        # sparsified here because the inversion-free projective line's c0
        # carries the full subfield factor M).
        ts = np.asarray(self.twist_sq)
        if S.K == 2:
            exp = np.concatenate([np.asarray(S.nr),
                                  np.zeros_like(np.asarray(S.nr))], axis=-2)
        else:
            z = np.zeros((1, self.fp.n_digits), np.uint32)
            exp = np.concatenate([z, z, np.asarray(S.sf.one())], axis=-2)
        self._tw2_sparse = bool(np.array_equal(ts, exp))

    def _line_c0(self, M, y, ynr):
        """T²·y_P·M from precomputed y_P and y_P·nr digit rows."""
        S = self.sub
        if not self._tw2_sparse:
            return S.mul(S.scale_fp(jnp.broadcast_to(
                self.twist_sq, M.shape[:-2] + self.twist_sq.shape[-2:]), y),
                M)
        if S.K == 2:
            return S.scale_fp(M, ynr)
        m0, m1, m2 = S._split(M)
        fp = self.fp
        return S._join((fpmod.mont_mul(fp, m1, ynr[..., None, :]),
                        fpmod.mont_mul(fp, m2, ynr[..., None, :]),
                        fpmod.mont_mul(fp, m0, y[..., None, :])))

    # --- helpers ---

    def _mul_by_twist(self, v):
        """v * T where T = (0,1[,0]) — a component rotation + nonresidue."""
        return self.sub.mul(v, self.twist)

    def _fqk(self, c0, c1):
        return jnp.concatenate([c0, c1], axis=-2)

    # ------------------------------------------------------------------
    # Miller loop (batched over pairs)
    # ------------------------------------------------------------------

    def miller_loop(self, p_affine, q_affine):
        """p_affine: (x, y) G1 affine [..., 1, nd]; q_affine: (x2, y2) G2
        affine [..., Ks, nd].  Returns f in Fqk [..., K, nd]."""
        S = self.sub
        F = self.fqk
        xp, yp = p_affine
        x2, y2 = q_affine
        batch = x2.shape[:-2]

        # py_twist_squared = T² · y_P  (mnt4/mod.rs:92): kept factored as
        # (y_P, y_P·nr) digit rows — _line_c0 then applies T²·y_P to the
        # line's subfield factor with 2 (quad) / 3 (cubic) base mults
        y_row = yp[..., 0, :]
        ynr = fpmod.mont_mul(self.fp, y_row, self.sub.nr[0])

        one_k = jnp.broadcast_to(jnp.asarray(F.one()),
                                 batch + (F.K, self.fp.n_digits))
        X0 = x2
        Y0 = y2
        Z0 = jnp.broadcast_to(jnp.asarray(S.one()), x2.shape)

        wnaf = jnp.asarray(self.wnaf)

        def step(carry, n):
            f, X, Y, Z = carry
            # ---- doubling line (uses current S) ----
            XX = S.sqr(X)
            ZZ = S.sqr(Z)
            N = S.add(S.add(XX, S.double(XX)),
                      S.mul(jnp.broadcast_to(self.twist_a, ZZ.shape), ZZ))
            NX = S.mul(N, X)
            NZT = S.scale_fp(self._mul_by_twist(S.mul(N, Z)), xp[..., 0, :])
            YY = S.sqr(Y)
            Y2Z = S.double(S.mul(YY, Z))
            c1 = S.sub(S.sub(NX, NZT), Y2Z)
            M = S.double(S.mul(S.mul(Y, Z), Z))       # 2YZ²
            c0 = self._line_c0(M, y_row, ynr)
            line_dbl = self._fqk(c0, c1)

            # ---- point doubling (homogeneous, a = twist_a) ----
            Xd, Yd, Zd = self.g2.double((X, Y, Z))

            f = F.sqr(f)
            f = F.mul(f, line_dbl)

            # ---- addition / subtraction step (masked) ----
            is_add = (n != 0)
            neg = (n < 0)
            # N = Y ∓ y2·Z on the *doubled* point (reference updates s first)
            y2Z = S.mul(y2, Zd)
            Na = jnp.where(neg, S.add(Yd, y2Z), S.sub(Yd, y2Z))
            D = S.sub(Xd, S.mul(x2, Zd))
            t1 = S.mul(Na, x2)
            t2 = S.scale_fp(self._mul_by_twist(Na), xp[..., 0, :])
            y2D = S.mul(y2, D)
            c1a_pos = S.sub(S.sub(t1, t2), y2D)
            c1a_neg = S.add(S.sub(t1, t2), y2D)
            c1a = jnp.where(neg, c1a_neg, c1a_pos)
            c0a = self._line_c0(D, y_row, ynr)
            line_add = self._fqk(c0a, c1a)

            f_add = F.mul(f, line_add)
            f = jnp.where(is_add, f_add, f)

            # point update: S ± Q
            q_pt = (x2, jnp.where(neg, S.neg(y2), y2),
                    jnp.broadcast_to(jnp.asarray(S.one()), x2.shape))
            Xa, Ya, Za = self.g2.add((Xd, Yd, Zd), q_pt)
            sel = is_add
            X = jnp.where(sel, Xa, Xd)
            Y = jnp.where(sel, Ya, Yd)
            Z = jnp.where(sel, Za, Zd)
            return (f, X, Y, Z), None

        (f, _, _, _), _ = jax.lax.scan(step, (one_k, X0, Y0, Z0), wnaf)
        if self.ate_is_neg:
            f = F.conjugate(f)
        return f

    def product_of_miller(self, f_batch, axis=0):
        """Multiply Miller values along an axis (tree reduce)."""
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

    # ------------------------------------------------------------------
    # final exponentiation
    # ------------------------------------------------------------------

    def final_exponentiation(self, f):
        F = self.fqk
        f_inv = F.inv(f)

        def first_chunk(a, a_inv):
            t = F.mul(F.frob(a, self.easy_frob), a_inv)
            if self.easy_mul_q_plus_1:
                t = F.mul(F.frob(t, 1), t)
            return t

        elt = first_chunk(f, f_inv)
        elt_inv = first_chunk(f_inv, f)
        # hard part: elt^(m1·q + m0).  After the easy part elt is unitary,
        # so both pow chains run in the cyclotomic subgroup (wNAF +
        # cyclotomic squarings; cyclotomic_exp, fp4.rs:84-109).
        w1_part = T.ext_cyclotomic_pow_const(F, F.frob(elt, 1), self.w1)
        base0 = elt_inv if self.w0_is_neg else elt
        w0_part = T.ext_cyclotomic_pow_const(F, base0, self.w0_abs)
        return F.mul(w1_part, w0_part)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------

    def gt_one(self):
        """GT identity element (host constant)."""
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

    def product_of_pairings(self, p_affines, q_affines):
        """Batched pairs along axis 0 -> one GT element [K, nd]."""
        return self._pop_jit(p_affines, q_affines)
