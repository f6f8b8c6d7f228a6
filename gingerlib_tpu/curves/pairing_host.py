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
