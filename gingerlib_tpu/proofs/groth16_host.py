"""Host (python-int) Groth16 for small circuits — exact oracle.

Same dataflow as proofs/groth16.py but entirely in python integers with
affine host EC; used as an independent oracle for the device pipeline
(bit-exact proof comparison with pinned randomness) and to produce inner
proofs for the recursion gadget tests without device compiles.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..relations.r1cs import ConstraintSystem
from ..curves.pairing_host import HostMNTPairing
from ..gadgets.std.groups import _host_ext_mul, _host_ext_inv
from ..gadgets.std.ext_fields import _flatten


def _ec_add(F, xy1, xy2):
    p = F.field.modulus
    if xy1 is None:
        return xy2
    if xy2 is None:
        return xy1
    (x1, y1), (x2, y2) = xy1, xy2
    if x1 == x2:
        if (y1 + y2) % p == 0:
            return None
        raise ValueError("use _ec_double")
    num = [(a - b) % p for a, b in zip(y2, y1)]
    den = [(a - b) % p for a, b in zip(x2, x1)]
    lam = _host_ext_mul(F, num, _host_ext_inv(F, den))
    x3 = [(a - b - c) % p for a, b, c in zip(
        _host_ext_mul(F, lam, lam), x1, x2)]
    y3 = [(a - b) % p for a, b in zip(
        _host_ext_mul(F, lam, [(i - j) % p for i, j in zip(x1, x3)]), y1)]
    return (x3, y3)


def _ec_double(F, a_coeff, xy):
    if xy is None:
        return None
    p = F.field.modulus
    x, y = xy
    if all(v == 0 for v in y):
        return None
    xx = _host_ext_mul(F, x, x)
    num = [(3 * u + v) % p for u, v in zip(xx, a_coeff)]
    den = [(2 * u) % p for u in y]
    lam = _host_ext_mul(F, num, _host_ext_inv(F, den))
    x3 = [(u - 2 * v) % p for u, v in zip(_host_ext_mul(F, lam, lam), x)]
    y3 = [(u - v) % p for u, v in zip(
        _host_ext_mul(F, lam, [(i - j) % p for i, j in zip(x, x3)]), y)]
    return (x3, y3)


def ec_add_general(F, a_coeff, xy1, xy2):
    if xy1 is None:
        return xy2
    if xy2 is None:
        return xy1
    p = F.field.modulus
    if xy1[0] == xy2[0]:
        if (xy1[1][0] + xy2[1][0]) % p == 0 and all(
                (a + b) % p == 0 for a, b in zip(xy1[1], xy2[1])):
            return None
        return _ec_double(F, a_coeff, xy1)
    return _ec_add(F, xy1, xy2)


def ec_mul(F, a_coeff, xy, k: int):
    acc = None
    if k == 0:
        return None
    for bit in bin(k)[2:]:
        acc = _ec_double(F, a_coeff, acc)
        if bit == "1":
            acc = ec_add_general(F, a_coeff, acc, xy)
    return acc


def ec_neg(xy, p):
    if xy is None:
        return None
    return (xy[0], [(-v) % p for v in xy[1]])


@dataclass
class HostParams:
    vk: dict
    num_inputs: int
    domain_size: int
    # prover-side tables, absent on setup_vk results (verify-only use)
    alpha_g1: tuple = None
    beta_g1: tuple = None
    beta_g2: tuple = None
    delta_g1: tuple = None
    delta_g2: tuple = None
    a_query: list = None
    b_g1_query: list = None
    b_g2_query: list = None
    h_query: list = None
    l_query: list = None


class HostGroth16:
    def __init__(self, pairing: HostMNTPairing, g1_a, g1_b, g1_gen_xy,
                 g2_a, g2_gen_xy, fr_params):
        self.E = pairing
        self.g1F = None  # set below
        from ..gadgets.std.ext_fields import FpGOps
        from .. import params  # noqa
        # base field ops descriptors
        self.base = FpGOps(_FqWrap(pairing.p))
        self.sub = pairing.S
        self.g1_a = [g1_a % pairing.p]
        self.g1_gen = ([g1_gen_xy[0]], [g1_gen_xy[1]])
        self.g2_a = [v % pairing.p for v in g2_a]
        self.g2_gen = (list(g2_gen_xy[0]), list(g2_gen_xy[1]))
        self.fr = fr_params

    def _g1mul(self, k, base=None):
        return ec_mul(self.base, self.g1_a, base or self.g1_gen,
                      k % self.fr.modulus)

    def _g2mul(self, k, base=None):
        return ec_mul(self.sub, self.g2_a, base or self.g2_gen,
                      k % self.fr.modulus)

    def setup(self, cs: ConstraintSystem, alpha, beta, gamma, delta, t):
        p = self.fr.modulus
        ni = cs.num_inputs
        nvars = cs.num_variables
        raw = cs.num_constraints + ni
        m = 1 << max(0, (raw - 1).bit_length())
        gen = pow(self.fr.root_of_unity,
                  1 << (self.fr.two_adicity - m.bit_length() + 1), p)
        zt = (pow(t, m, p) - 1) % p
        assert zt != 0
        # lagrange at t
        u = []
        w = 1
        minv = pow(m, -1, p)
        for i in range(m):
            u.append(zt * minv % p * w % p *
                     pow((t - w) % p, -1, p) % p)
            w = w * gen % p
        a = [0] * nvars
        b = [0] * nvars
        c = [0] * nvars
        for i in range(ni):
            a[i] = u[cs.num_constraints + i]
        for i in range(cs.num_constraints):
            for v, k in cs.at[i]:
                a[v] = (a[v] + u[i] * k) % p
            for v, k in cs.bt[i]:
                b[v] = (b[v] + u[i] * k) % p
            for v, k in cs.ct[i]:
                c[v] = (c[v] + u[i] * k) % p
        ginv = pow(gamma, -1, p)
        dinv = pow(delta, -1, p)
        gamma_abc = [(beta * a[i] + alpha * b[i] + c[i]) * ginv % p
                     for i in range(ni)]
        l = [(beta * a[i] + alpha * b[i] + c[i]) * dinv % p
             for i in range(nvars)]
        h = [zt * dinv % p * pow(t, i, p) % p for i in range(m - 1)]
        vk = {
            "alpha_g1_beta_g2": self.E.pairing(self._g1mul(alpha),
                                               self._g2mul(beta)),
            "gamma_g2": self._g2mul(gamma),
            "delta_g2": self._g2mul(delta),
            "gamma_abc": [self._g1mul(s) for s in gamma_abc],
        }
        return HostParams(
            vk=vk,
            alpha_g1=self._g1mul(alpha), beta_g1=self._g1mul(beta),
            beta_g2=self._g2mul(beta), delta_g1=self._g1mul(delta),
            delta_g2=self._g2mul(delta),
            a_query=[self._g1mul(s) for s in a],
            b_g1_query=[self._g1mul(s) for s in b],
            b_g2_query=[self._g2mul(s) for s in b],
            h_query=[self._g1mul(s) for s in h],
            l_query=[self._g1mul(s) for s in l[ni:]],
            num_inputs=ni, domain_size=m,
        )

    def setup_vk(self, cs: ConstraintSystem, alpha, beta, gamma, delta, t):
        """Verifying key only — the first half of :meth:`setup` without
        the prover query tables (one host ec_mul per query element, which
        dominates setup wall time at bench sizes; verify needs only the
        ni+1 gamma_abc points + 3 constants)."""
        p = self.fr.modulus
        ni = cs.num_inputs
        raw = cs.num_constraints + ni
        m = 1 << max(0, (raw - 1).bit_length())
        gen = pow(self.fr.root_of_unity,
                  1 << (self.fr.two_adicity - m.bit_length() + 1), p)
        zt = (pow(t, m, p) - 1) % p
        assert zt != 0
        u = []
        w = 1
        minv = pow(m, -1, p)
        for i in range(m):
            u.append(zt * minv % p * w % p *
                     pow((t - w) % p, -1, p) % p)
            w = w * gen % p
        a = [0] * ni
        b = [0] * ni
        c = [0] * ni
        for i in range(ni):
            a[i] = u[cs.num_constraints + i]
        for i in range(cs.num_constraints):
            for v, k in cs.at[i]:
                if v < ni:
                    a[v] = (a[v] + u[i] * k) % p
            for v, k in cs.bt[i]:
                if v < ni:
                    b[v] = (b[v] + u[i] * k) % p
            for v, k in cs.ct[i]:
                if v < ni:
                    c[v] = (c[v] + u[i] * k) % p
        ginv = pow(gamma, -1, p)
        gamma_abc = [(beta * a[i] + alpha * b[i] + c[i]) * ginv % p
                     for i in range(ni)]
        vk = {
            "alpha_g1_beta_g2": self.E.pairing(self._g1mul(alpha),
                                               self._g2mul(beta)),
            "gamma_g2": self._g2mul(gamma),
            "delta_g2": self._g2mul(delta),
            "gamma_abc": [self._g1mul(s) for s in gamma_abc],
        }
        return HostParams(vk=vk, num_inputs=ni, domain_size=m)

    def _witness_h(self, cs: ConstraintSystem, m: int):
        """h coefficients by naive polynomial arithmetic (O(m^2), tiny m)."""
        p = self.fr.modulus
        vals = cs.assignment()
        ni = cs.num_inputs
        gen = pow(self.fr.root_of_unity,
                  1 << (self.fr.two_adicity - m.bit_length() + 1), p)
        # evaluations on the domain rows
        a_ev = [0] * m
        b_ev = [0] * m
        c_ev = [0] * m
        for i in range(cs.num_constraints):
            a_ev[i] = cs.eval_lc(cs.at[i], vals)
            b_ev[i] = cs.eval_lc(cs.bt[i], vals)
            c_ev[i] = cs.eval_lc(cs.ct[i], vals)
        for i in range(ni):
            a_ev[cs.num_constraints + i] = vals[i] if i else 1
        # interpolate (naive IDFT), multiply, divide by vanishing poly
        def idft(ev):
            out = []
            minv = pow(m, -1, p)
            for j in range(m):
                s = 0
                wj = pow(gen, -j, p)
                wji = 1
                for i in range(m):
                    s = (s + ev[i] * wji) % p
                    wji = wji * wj % p
                out.append(s * minv % p)
            return out
        A = idft(a_ev)
        B = idft(b_ev)
        C = idft(c_ev)
        # full product A*B - C then divide by x^m - 1
        AB = [0] * (2 * m)
        for i in range(m):
            if A[i] == 0:
                continue
            for j in range(m):
                AB[i + j] = (AB[i + j] + A[i] * B[j]) % p
        for i in range(m):
            AB[i] = (AB[i] - C[i]) % p
        # poly division by x^m - 1: h[i] = AB[m+i] for top part, fold down
        h = [0] * m
        for i in range(2 * m - 1, m - 1, -1):
            q = AB[i]
            h[i - m] = (h[i - m] + q) % p
            AB[i - m] = (AB[i - m] + q) % p  # remainder fold (x^m == 1)
            AB[i] = 0
        # remainder must be zero on a valid witness
        assert all(v == 0 for v in AB[:m]), "witness does not satisfy QAP"
        return h, vals

    def prove(self, cs: ConstraintSystem, params: HostParams, r, s):
        p = self.fr.modulus
        m = params.domain_size
        h, vals = self._witness_h(cs, m)
        ni = params.num_inputs
        base, g1a = self.base, self.g1_a

        def msm_g1(points, scalars):
            acc = None
            for pt, k in zip(points, scalars):
                if pt is None or k % p == 0:
                    continue
                acc = ec_add_general(base, g1a, acc,
                                     ec_mul(base, g1a, pt, k % p))
            return acc

        def msm_g2(points, scalars):
            acc = None
            for pt, k in zip(points, scalars):
                if pt is None or k % p == 0:
                    continue
                acc = ec_add_general(self.sub, self.g2_a, acc,
                                     ec_mul(self.sub, self.g2_a, pt, k % p))
            return acc

        add1 = lambda a, b: ec_add_general(base, g1a, a, b)
        g_a = add1(add1(msm_g1(params.a_query, vals),
                        self._g1mul(r, params.delta_g1)), params.alpha_g1)
        g1_b = add1(add1(msm_g1(params.b_g1_query, vals),
                         self._g1mul(s, params.delta_g1)), params.beta_g1)
        add2 = lambda a, b: ec_add_general(self.sub, self.g2_a, a, b)
        g2_b = add2(add2(msm_g2(params.b_g2_query, vals),
                         ec_mul(self.sub, self.g2_a, params.delta_g2,
                                s % p)), params.beta_g2)
        g_c = add1(add1(add1(add1(
            ec_mul(base, g1a, g_a, s % p),
            ec_mul(base, g1a, g1_b, r % p)),
            ec_neg(self._g1mul(r * s % p, params.delta_g1), self.E.p)),
            msm_g1(params.l_query, vals[ni:])),
            msm_g1(params.h_query, h[:m - 1]))
        return {"a": g_a, "b": g2_b, "c": g_c}

    def verify(self, params: HostParams, proof, public_inputs) -> bool:
        p = self.fr.modulus
        vk = params.vk
        g_ic = vk["gamma_abc"][0]
        for x, pt in zip(public_inputs, vk["gamma_abc"][1:]):
            g_ic = ec_add_general(self.base, self.g1_a, g_ic,
                                  ec_mul(self.base, self.g1_a, pt, x % p))
        gt = self.E.pairing(proof["a"], proof["b"])
        gt = self.E._fmul(gt, self.E.pairing(
            g_ic, ec_neg(vk["gamma_g2"], self.E.p)))
        gt = self.E._fmul(gt, self.E.pairing(
            proof["c"], ec_neg(vk["delta_g2"], self.E.p)))
        return gt == vk["alpha_g1_beta_g2"]


class _FqWrap:
    """minimal FpParams-like host descriptor for FpGOps."""

    def __init__(self, modulus):
        self.modulus = modulus


def host_groth16_mnt4753() -> HostGroth16:
    from ..curves.pairing_host import host_mnt4753_pairing
    from ..params._gen import curves_gen as CG
    from .. import params as PP
    c = CG.MNT4753
    return HostGroth16(
        host_mnt4753_pairing(), c["a"], c["b"], (c["g1_x"], c["g1_y"]),
        c["g2_a"], (c["g2_x"], c["g2_y"]), PP.MNT4753_FR)


def host_groth16_mnt6753() -> HostGroth16:
    from ..curves.pairing_host import host_mnt6753_pairing
    from ..params._gen import curves_gen as CG
    from .. import params as PP
    c = CG.MNT6753
    return HostGroth16(
        host_mnt6753_pairing(), c["a"], c["b"], (c["g1_x"], c["g1_y"]),
        c["g2_a"], (c["g2_x"], c["g2_y"]), PP.MNT6753_FR)


def host_groth16_bls12_377() -> HostGroth16:
    """Groth16 over BLS12-377 (reference groth16/test.rs bls12_377 module)."""
    from ..curves.pairing_host import host_bls12_377_pairing
    from ..params._gen import curves_gen as CG
    from .. import params as PP
    c = CG.BLS12_377
    return HostGroth16(
        host_bls12_377_pairing(), c["a"], c["b"], (c["g1_x"], c["g1_y"]),
        c["g2_a"], (c["g2_x"], c["g2_y"]), PP.BLS12_377_FR)
