"""Host (python-int) MNT ate pairing — exact oracle and small-input path.

Affine ladder exactly like the reference (curves/models/mnt4/mod.rs:100-224)
over host tower arithmetic; final exponentiation via pow chains.  Used by
the host Groth16 oracle and tests; the device pairing (pairing_mnt.py) is
the production path.
"""

from __future__ import annotations

from ..gadgets.std.groups import _host_ext_mul, _host_ext_inv, \
    _host_ext_mul_const
from ..gadgets.std.ext_fields import _flatten


class HostMNTPairing:
    def __init__(self, fq_params, sub_ops, fqk_ops, g2_a_host, wnaf,
                 ate_is_neg, w1, w0_abs, w0_is_neg, easy_frob,
                 easy_mul_q_plus_1):
        """sub_ops/fqk_ops: gadget tower ops used purely as host
        descriptors (they carry modulus/nonresidue/frobenius tables)."""
        self.p = fq_params.modulus
        self.S = sub_ops
        self.F = fqk_ops
        self.g2_a = [v % self.p for v in _flatten(g2_a_host)]
        self.wnaf = list(reversed(wnaf))
        self.ate_is_neg = ate_is_neg
        self.w1 = w1
        self.w0_abs = w0_abs
        self.w0_is_neg = w0_is_neg
        self.easy_frob = easy_frob
        self.easy_mul_q_plus_1 = easy_mul_q_plus_1
        t = [0] * sub_ops.K
        t[1] = 1
        self.twist = t
        self.twist_sq = _host_ext_mul(sub_ops, t, t)

    # -- host fqk helpers --

    def _fmul(self, a, b):
        return _host_ext_mul(self.F, a, b)

    def _finv(self, a):
        return _host_ext_inv(self.F, a)

    def _fone(self):
        return [1] + [0] * (self.F.K - 1)

    def _ffrob(self, a, i):
        S, F = self.S, self.F
        k = S.K
        a0, a1 = a[:k], a[k:]
        f0 = self._sfrob(a0, i)
        f1 = _host_ext_mul_const(
            S, self._sfrob(a1, i), _flatten(F.frob_c1[i % F.K]))
        return f0 + f1

    def _sfrob(self, a, i):
        S = self.S
        from ..gadgets.std.ext_fields import QuadExtG, CubicExtG
        if isinstance(S, QuadExtG):
            c = S.frob_c1[i % 2]
            return [a[0], a[1] * (c % self.p) % self.p]
        assert isinstance(S, CubicExtG)
        c1 = S.frob_c1[i % 3]
        c2 = S.frob_c2[i % 3]
        return [a[0], a[1] * (c1 % self.p) % self.p,
                a[2] * (c2 % self.p) % self.p]

    def _fpow(self, a, e):
        r = self._fone()
        base = a
        while e:
            if e & 1:
                r = self._fmul(r, base)
            base = self._fmul(base, base)
            e >>= 1
        return r

    def _fconj(self, a):
        k = self.S.K
        return a[:k] + [(-v) % self.p for v in a[k:]]

    # -- pairing --

    def miller_loop(self, p_xy, q_xy):
        S = self.S
        p = self.p
        xp, yp = p_xy[0][0], p_xy[1][0]
        x2, y2 = list(q_xy[0]), list(q_xy[1])
        py_tw2 = [v * yp % p for v in self.twist_sq]
        f = self._fone()
        sx, sy = x2, y2
        for n in self.wnaf:
            # doubling step
            xx = _host_ext_mul(S, sx, sx)
            num = [(3 * a + b) % p for a, b in zip(xx, self.g2_a)]
            den = [(2 * a) % p for a in sy]
            gamma = _host_ext_mul(S, num, _host_ext_inv(S, den))
            gamma_x = _host_ext_mul(S, gamma, sx)
            gT = _host_ext_mul_const(S, gamma, self.twist)
            c1 = [(a - b * xp - c) % p for a, b, c in zip(gamma_x, gT, sy)]
            f = self._fmul(self._fmul(f, f), py_tw2 + c1)
            nx = [(a - 2 * b) % p for a, b in zip(
                _host_ext_mul(S, gamma, gamma), sx)]
            ny = [(a - b) % p for a, b in zip(
                _host_ext_mul(S, gamma,
                              [(i - j) % p for i, j in zip(sx, nx)]), sy)]
            sx, sy = nx, ny
            if n != 0:
                sign = 1 if n > 0 else -1
                num = [(a - sign * b) % p for a, b in zip(sy, y2)]
                den = [(a - b) % p for a, b in zip(sx, x2)]
                gamma = _host_ext_mul(S, num, _host_ext_inv(S, den))
                gamma_x = _host_ext_mul(S, gamma, x2)
                gT = _host_ext_mul_const(S, gamma, self.twist)
                c1 = [(a - b * xp - sign * c) % p
                      for a, b, c in zip(gamma_x, gT, y2)]
                f = self._fmul(f, py_tw2 + c1)
                nx = [(a - b - c) % p for a, b, c in zip(
                    _host_ext_mul(S, gamma, gamma), sx, x2)]
                ny = [(a - b) % p for a, b in zip(
                    _host_ext_mul(S, gamma,
                                  [(i - j) % p for i, j in zip(sx, nx)]),
                    sy)]
                sx, sy = nx, ny
        if self.ate_is_neg:
            f = self._fconj(f)
        return f

    def final_exponentiation(self, f):
        f_inv = self._finv(f)

        def first(a, ai):
            t = self._fmul(self._ffrob(a, self.easy_frob), ai)
            if self.easy_mul_q_plus_1:
                t = self._fmul(self._ffrob(t, 1), t)
            return t

        elt = first(f, f_inv)
        elt_inv = first(f_inv, f)
        w1p = self._ffrob(elt, 1)
        if self.w1 != 1:
            w1p = self._fpow(w1p, self.w1)
        w0p = self._fpow(elt_inv if self.w0_is_neg else elt, self.w0_abs)
        return self._fmul(w1p, w0p)

    def pairing(self, p_xy, q_xy):
        return self.final_exponentiation(self.miller_loop(p_xy, q_xy))


def host_mnt4753_pairing() -> HostMNTPairing:
    from ..gadgets.std.pairing import mnt4753_pairing_gadget
    from ..params._gen import curves_gen as CG
    pg, base, fq2, fq4 = mnt4753_pairing_gadget()
    c = CG.MNT4753
    return HostMNTPairing(
        pg.fq, fq2, fq4, c["g2_a"], c["wnaf"],
        c["ate_is_loop_count_neg"], c["final_exponent_last_chunk_1"],
        c["final_exponent_last_chunk_abs_of_w0"],
        c["final_exponent_last_chunk_w0_is_neg"], 2, False)


def host_mnt6753_pairing() -> HostMNTPairing:
    from ..gadgets.std.pairing import mnt6753_pairing_gadget
    from ..params._gen import curves_gen as CG
    pg, base, fq3, fq6 = mnt6753_pairing_gadget()
    c = CG.MNT6753
    return HostMNTPairing(
        pg.fq, fq3, fq6, c["g2_a"], c["wnaf"],
        c["ate_is_loop_count_neg"], c["final_exponent_last_chunk_1"],
        c["final_exponent_last_chunk_abs_of_w0"],
        c["final_exponent_last_chunk_w0_is_neg"], 3, True)


# FINAL_EXPONENT_LAST_CHUNK_W1 for SW6 (curves/sw6/mod.rs:227-239); w0 and
# the rest of the curve constants come from the extracted params table.
_SW6_W1 = 86482221941698704497288378992285180119495364068003923046442785886272123124361700722982503222189455144364945735564951562986


def host_sw6_pairing() -> HostMNTPairing:
    """SW6 (CP6-782) ate pairing oracle (curves/sw6/mod.rs:64-170).

    SW6's hand-rolled PairingEngine is exactly the MNT6 affine ladder shape:
    Fq3 twist (0,1,0), lines in Fq6 = Fq3[Y], easy part (q^3-1)(q+1), hard
    part elt^(w1*q) * elt^(+-w0) — so it reuses HostMNTPairing with the
    plain-binary loop count in NAF form (f_{m,Q} is chain-independent up to
    factors killed by the final exponentiation, as with MNT's WNAF loop).

    ⚠ ATE_LOOP_COUNT doc-vs-code divergence: the reference's doc comment
    (curves/sw6/mod.rs:183-184) states a 388-bit value, but the actual
    `[u64; 13]` limb array it compiles decodes to a 782-bit value (= doc
    value + k·r), and `BitIterator::new(ATE_LOOP_COUNT)` iterates those
    limbs — i.e. the reference *engine* runs the 782-bit loop.  We match
    the code: CG.SW6["ate_loop_count"] (the decoded limbs) is correct, and
    this oracle's NAF ladder over it reproduces the reference-shaped plain
    binary ladder's GT exactly (verified; pinned by
    tests/test_pairing.py::test_sw6_gt_vector).  Using the 388-bit doc
    value instead yields a *different* (still bilinear) pairing.
    """
    from ..gadgets.std.ext_fields import build_mnt6_tower_gadgets
    from ..params._gen import curves_gen as CG, towers_gen as TG
    from .. import params as PP
    from .instances import find_wnaf
    c = CG.SW6
    base, fq3, fq6 = build_mnt6_tower_gadgets(
        PP.SW6_FQ, TG.SW6_FQ3["nonresidue"])
    return HostMNTPairing(
        PP.SW6_FQ, fq3, fq6, c["g2_a"], find_wnaf(c["ate_loop_count"]),
        c["ate_is_loop_count_neg"], _SW6_W1,
        c["final_exponent_last_chunk_abs_of_w0"],
        c["final_exponent_last_chunk_w0_is_neg"], 3, True)


def host_mnt6298_pairing() -> HostMNTPairing:
    from ..gadgets.std.ext_fields import build_mnt6_tower_gadgets
    from ..params._gen import curves_gen as CG, towers_gen as TG
    from .. import params as PP
    from .instances import find_wnaf
    c = CG.MNT6298
    base, fq3, fq6 = build_mnt6_tower_gadgets(
        PP.MNT6298_FQ, TG.MNT6298_FQ3["nonresidue"])
    return HostMNTPairing(
        PP.MNT6298_FQ, fq3, fq6, c["g2_a"], find_wnaf(c["ate_loop_count"]),
        c["ate_is_loop_count_neg"], c["final_exponent_last_chunk_1"],
        c["final_exponent_last_chunk_abs_of_w0"],
        c["final_exponent_last_chunk_w0_is_neg"], 3, True)


# ---------------------------------------------------------------------------
# generic host frobenius over arbitrary-depth towers
# ---------------------------------------------------------------------------

def _host_ext_frob(F, a, i):
    """a^(p^i) on flat component lists for any FpGOps/Quad/Cubic tower."""
    from ..gadgets.std.ext_fields import FpGOps, QuadExtG, CubicExtG
    if isinstance(F, FpGOps):
        return [a[0] % F.field.modulus]
    k = F.sf.K
    if isinstance(F, QuadExtG):
        a0, a1 = a[:k], a[k:]
        f0 = _host_ext_frob(F.sf, a0, i)
        f1 = _host_ext_mul_const(
            F.sf, _host_ext_frob(F.sf, a1, i), _flatten(F.frob_c1[i % F.K]))
        return f0 + f1
    assert isinstance(F, CubicExtG)
    a0, a1, a2 = a[:k], a[k:2 * k], a[2 * k:]
    f0 = _host_ext_frob(F.sf, a0, i)
    f1 = _host_ext_mul_const(
        F.sf, _host_ext_frob(F.sf, a1, i), _flatten(F.frob_c1[i % F.K]))
    f2 = _host_ext_mul_const(
        F.sf, _host_ext_frob(F.sf, a2, i), _flatten(F.frob_c2[i % F.K]))
    return f0 + f1 + f2


# ---------------------------------------------------------------------------
# BLS12 host pairing (curves/models/bls12/{mod,g2}.rs)
# ---------------------------------------------------------------------------

class HostBls12Pairing:
    """Host-int BLS12 ate pairing oracle: X-bit Miller loop over
    homogeneous-projective G2 line coefficients, 2016/130 Table-1 final
    exponentiation.  twist_type: "D" (377) or "M" (381)."""

    def __init__(self, fq_params, fq2_ops, fq6_ops, fq12_ops, g2_b_host,
                 x: int, x_is_neg: bool, twist_type: str):
        self.p = fq_params.modulus
        self.S = fq2_ops      # Fq2
        self.F6 = fq6_ops
        self.F = fq12_ops     # Fq12
        self.g2_b = [v % self.p for v in _flatten(g2_b_host)]
        self.x = x
        self.x_is_neg = x_is_neg
        self.twist_type = twist_type
        self.two_inv = pow(2, -1, self.p)

    # host fqk helpers (Fq12 = quad over cubic over quad)
    def _fmul(self, a, b):
        return _host_ext_mul(self.F, a, b)

    def _finv(self, a):
        return _host_ext_inv(self.F, a)

    def _fone(self):
        return [1] + [0] * (self.F.K - 1)

    def _fconj(self, a):
        k = self.F.sf.K
        return a[:k] + [(-v) % self.p for v in a[k:]]

    def _ffrob(self, a, i):
        return _host_ext_frob(self.F, a, i)

    def _fpow(self, a, e):
        r = self._fone()
        base = a
        while e:
            if e & 1:
                r = self._fmul(r, base)
            base = self._fmul(base, base)
            e >>= 1
        return r

    def _exp_by_x(self, f):
        g = self._fpow(f, self.x)
        return self._fconj(g) if self.x_is_neg else g

    # -- G2 prepare: line coefficients (bls12/g2.rs doubling/addition) --

    def _prepare_g2(self, q_xy):
        S, p = self.S, self.p
        qx, qy = list(q_xy[0]), list(q_xy[1])
        m = lambda a, b: _host_ext_mul(S, a, b)
        addl = lambda a, b: [(i + j) % p for i, j in zip(a, b)]
        subl = lambda a, b: [(i - j) % p for i, j in zip(a, b)]
        scale = lambda a, k: [i * k % p for i in a]
        rx, ry, rz = list(qx), list(qy), [1] + [0] * (S.K - 1)
        coeffs = []
        bits = bin(self.x)[3:]  # MSB skipped
        for bit in bits:
            # doubling step
            a = scale(m(rx, ry), self.two_inv)
            b = m(ry, ry)
            c = m(rz, rz)
            e = m(self.g2_b, scale(c, 3))
            f = scale(e, 3)
            g = scale(addl(b, f), self.two_inv)
            h = subl(m(addl(ry, rz), addl(ry, rz)), addl(b, c))
            i_ = subl(e, b)
            j = m(rx, rx)
            e2 = m(e, e)
            rx = m(a, subl(b, f))
            ry = subl(m(g, g), scale(e2, 3))
            rz = m(b, h)
            if self.twist_type == "M":
                coeffs.append((i_, scale(j, 3), [(-v) % p for v in h]))
            else:
                coeffs.append(([(-v) % p for v in h], scale(j, 3), i_))
            if bit == "1":
                # addition step
                theta = subl(ry, m(qy, rz))
                lam = subl(rx, m(qx, rz))
                cc = m(theta, theta)
                d = m(lam, lam)
                ee = m(lam, d)
                ff = m(rz, cc)
                gg = m(rx, d)
                hh = subl(addl(ee, ff), scale(gg, 2))
                rx = m(lam, hh)
                ry = subl(m(theta, subl(gg, hh)), m(ee, ry))
                rz = m(rz, ee)
                jj = subl(m(theta, qx), m(lam, qy))
                nt = [(-v) % p for v in theta]
                if self.twist_type == "M":
                    coeffs.append((jj, nt, lam))
                else:
                    coeffs.append((lam, nt, jj))
        return coeffs

    def _ell(self, f, coeff, px, py):
        """multiply f by the sparse line element (bls12/mod.rs ell)."""
        p = self.p
        c0, c1, c2 = coeff
        k2 = self.S.K
        zero2 = [0] * k2
        if self.twist_type == "M":
            cc2 = [v * py % p for v in c2]
            cc1 = [v * px % p for v in c1]
            # positions 0,1,4 of [1, v, v², w, vw, v²w]
            line = c0 + cc1 + zero2 + zero2 + cc2 + zero2
        else:
            cc0 = [v * py % p for v in c0]
            cc1 = [v * px % p for v in c1]
            # positions 0,3,4
            line = cc0 + zero2 + zero2 + cc1 + c2 + zero2
        return self._fmul(f, line)

    def miller_loop(self, p_xy, q_xy):
        px, py = p_xy[0][0] % self.p, p_xy[1][0] % self.p
        coeffs = self._prepare_g2(q_xy)
        f = self._fone()
        it = iter(coeffs)
        for bit in bin(self.x)[3:]:
            f = self._fmul(f, f)
            f = self._ell(f, next(it), px, py)
            if bit == "1":
                f = self._ell(f, next(it), px, py)
        if self.x_is_neg:
            f = self._fconj(f)
        return f

    def final_exponentiation(self, f):
        # easy part: f^((p^6-1)(p^2+1))
        f1 = self._fconj(f)              # f^(p^6)
        f2 = self._finv(f)
        r = self._fmul(f1, f2)
        f2 = r
        r = self._ffrob(r, 2)
        r = self._fmul(r, f2)
        # hard part, 2016/130 Table 1 (bls12/mod.rs:148-205)
        y0 = self._fconj(self._fmul(r, r))
        y5 = self._exp_by_x(r)
        y1 = self._fmul(y5, y5)
        y3 = self._fmul(y0, y5)
        y0 = self._exp_by_x(y3)
        y2 = self._exp_by_x(y0)
        y4 = self._exp_by_x(y2)
        y4 = self._fmul(y4, y1)
        y1 = self._exp_by_x(y4)
        y3 = self._fconj(y3)
        y1 = self._fmul(self._fmul(y1, y3), r)
        y3 = self._fconj(r)
        y0 = self._fmul(y0, r)
        y0 = self._ffrob(y0, 3)
        y4 = self._fmul(y4, y3)
        y4 = self._ffrob(y4, 1)
        y5 = self._fmul(y5, y2)
        y5 = self._ffrob(y5, 2)
        y5 = self._fmul(y5, y0)
        y5 = self._fmul(y5, y4)
        return self._fmul(y5, y1)

    def pairing(self, p_xy, q_xy):
        return self.final_exponentiation(self.miller_loop(p_xy, q_xy))


def host_bls12_377_pairing() -> HostBls12Pairing:
    from ..gadgets.std.ext_fields import build_bls12_tower_gadgets
    from ..params._gen import curves_gen as CG, towers_gen as TG
    from .. import params as PP
    c = CG.BLS12_377
    base, fq2, fq6, fq12 = build_bls12_tower_gadgets(
        PP.BLS12_377_FQ, TG.BLS12_377_FQ2["nonresidue"],
        TG.BLS12_377_FQ6["nonresidue"])
    return HostBls12Pairing(PP.BLS12_377_FQ, fq2, fq6, fq12, c["g2_b"],
                            c["x"], c["x_is_negative"], "D")


def host_bls12_381_pairing() -> HostBls12Pairing:
    from ..gadgets.std.ext_fields import build_bls12_tower_gadgets
    from ..params._gen import curves_gen as CG, towers_gen as TG
    from .. import params as PP
    c = CG.BLS12_381
    base, fq2, fq6, fq12 = build_bls12_tower_gadgets(
        PP.BLS12_381_FQ, TG.BLS12_381_FQ2["nonresidue"],
        TG.BLS12_381_FQ6["nonresidue"])
    return HostBls12Pairing(PP.BLS12_381_FQ, fq2, fq6, fq12, c["g2_b"],
                            c["x"], c["x_is_negative"], "M")
