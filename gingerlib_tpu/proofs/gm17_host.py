"""Host (python-int) GM17 (Groth-Maller '17 simulation-extractable SNARK).

Exact dataflow of proof-systems/src/gm17/{generator,prover,verifier,
r1cs_to_sap}.rs: R1CS -> SAP (squaring-only) doubles constraints and adds
one extra variable per constraint and per input; the verifier checks two
pairing equations.  Small-circuit oracle; the device variant mirrors this
via the shared witness/QAP machinery.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..relations.r1cs import ConstraintSystem
from ..curves.pairing_host import HostMNTPairing
from .groth16_host import ec_mul, ec_add_general, ec_neg, _FqWrap


@dataclass
class HostGM17Params:
    vk: dict
    a_query: list
    b_query: list
    c_query_1: list
    c_query_2: list
    g_gamma_z: tuple
    h_gamma_z: tuple
    g_ab_gamma_z: tuple
    g_gamma2_z2: tuple
    g_gamma2_z_t: list
    num_inputs: int
    domain_size: int


class HostGM17:
    def __init__(self, pairing: HostMNTPairing, g1_a, g1_gen_xy, g2_a,
                 g2_gen_xy, fr_params):
        from ..gadgets.std.ext_fields import FpGOps
        self.E = pairing
        self.base = FpGOps(_FqWrap(pairing.p))
        self.sub = pairing.S
        self.g1_a = [g1_a % pairing.p]
        self.g1_gen = ([g1_gen_xy[0]], [g1_gen_xy[1]])
        self.g2_a = [v % pairing.p for v in g2_a]
        self.g2_gen = (list(g2_gen_xy[0]), list(g2_gen_xy[1]))
        self.fr = fr_params

    def _g1(self, k, base=None):
        return ec_mul(self.base, self.g1_a, base or self.g1_gen,
                      k % self.fr.modulus)

    def _g2(self, k, base=None):
        return ec_mul(self.sub, self.g2_a, base or self.g2_gen,
                      k % self.fr.modulus)

    def _add1(self, a, b):
        return ec_add_general(self.base, self.g1_a, a, b)

    def _add2(self, a, b):
        return ec_add_general(self.sub, self.g2_a, a, b)

    # -- SAP instance map (r1cs_to_sap.rs:14-100) --

    def _instance_map(self, cs: ConstraintSystem, t: int):
        p = self.fr.modulus
        nc, ni, na = cs.num_constraints, cs.num_inputs, cs.num_aux
        raw = 2 * nc + 2 * (ni - 1) + 1
        m = 1 << max(0, (raw - 1).bit_length())
        gen = pow(self.fr.root_of_unity,
                  1 << (self.fr.two_adicity - (m.bit_length() - 1)), p)
        zt = (pow(t, m, p) - 1) % p
        assert zt != 0
        u = []
        w = 1
        minv = pow(m, -1, p)
        for i in range(m):
            u.append(zt * minv % p * w % p * pow((t - w) % p, -1, p) % p)
            w = w * gen % p
        sap_num_vars = 2 * (ni - 1) + na + nc
        evo = ni + na                   # extra var offset
        eco = 2 * nc                    # extra constraint offset
        evo2 = ni + na + nc - 1
        a = [0] * (sap_num_vars + 1)
        c = [0] * (sap_num_vars + 1)
        for i in range(nc):
            u2i, u2i1 = u[2 * i], u[2 * i + 1]
            ua, us = (u2i + u2i1) % p, (u2i - u2i1) % p
            for v, k in cs.at[i]:
                a[v] = (a[v] + ua * k) % p
            for v, k in cs.bt[i]:
                a[v] = (a[v] + us * k) % p
            for v, k in cs.ct[i]:
                c[v] = (c[v] + 4 * u2i * k) % p
            c[evo + i] = (c[evo + i] + ua) % p
        a[0] = (a[0] + u[eco]) % p
        c[0] = (c[0] + u[eco]) % p
        for i in range(1, ni):
            a[i] = (a[i] + u[eco + 2 * i - 1]) % p
            a[0] = (a[0] + u[eco + 2 * i - 1]) % p
            c[i] = (c[i] + 4 * u[eco + 2 * i - 1]) % p
            c[evo2 + i] = (c[evo2 + i] + u[eco + 2 * i - 1]) % p
            a[i] = (a[i] + u[eco + 2 * i]) % p
            a[0] = (a[0] - u[eco + 2 * i]) % p
            c[evo2 + i] = (c[evo2 + i] + u[eco + 2 * i]) % p
        return a, c, zt, sap_num_vars, m, gen

    def setup(self, cs: ConstraintSystem, alpha, beta, gamma, t):
        p = self.fr.modulus
        ni = cs.num_inputs
        a, c, zt, nvars, m, _ = self._instance_map(cs, t)
        ab = (alpha + beta) % p
        gz = gamma * zt % p
        vk = {
            "h_g2": self.g2_gen,
            "g_alpha_g1": self._g1(alpha),
            "h_beta_g2": self._g2(beta),
            "g_gamma_g1": self._g1(gamma),
            "h_gamma_g2": self._g2(gamma),
            "query": [self._g1((c[i] * gamma + a[i] * ab) % p)
                      for i in range(ni)],
        }
        return HostGM17Params(
            vk=vk,
            a_query=[self._g1(ai * gamma % p) for ai in a],
            b_query=[self._g2(ai * gamma % p) for ai in a],
            c_query_1=[self._g1((c[i] * gamma + a[i] * ab) % p)
                       for i in range(ni, nvars + 1)],
            c_query_2=[self._g1(ai * 2 * gz * gamma % p) for ai in a],
            g_gamma_z=self._g1(gz),
            h_gamma_z=self._g2(gz),
            g_ab_gamma_z=self._g1(ab * gz % p),
            g_gamma2_z2=self._g1(gz * gz % p),
            g_gamma2_z_t=[self._g1(gz * gamma % p * pow(t, i, p) % p)
                          for i in range(m + 1)],
            num_inputs=ni, domain_size=m,
        )

    # -- SAP witness map (r1cs_to_sap.rs:102-250) --

    def _witness(self, cs: ConstraintSystem, m: int, gen: int, d1, d2):
        p = self.fr.modulus
        nc, ni, na = cs.num_constraints, cs.num_inputs, cs.num_aux
        vals = cs.assignment()
        full = list(vals)
        for i in range(nc):
            ev = (cs.eval_lc(cs.at[i], vals) -
                  cs.eval_lc(cs.bt[i], vals)) % p
            full.append(ev * ev % p)
        for i in range(1, ni):
            full.append((vals[i] - 1) ** 2 % p)
        eco = 2 * nc
        evo = ni + na
        evo2 = ni + na + nc - 1
        a_ev = [0] * m
        c_ev = [0] * m
        for i in range(nc):
            A = cs.eval_lc(cs.at[i], vals)
            B = cs.eval_lc(cs.bt[i], vals)
            a_ev[2 * i] = (A + B) % p
            a_ev[2 * i + 1] = (A - B) % p
            C4 = 4 * cs.eval_lc(cs.ct[i], vals) % p
            c_ev[2 * i] = (C4 + full[evo + i]) % p
            c_ev[2 * i + 1] = full[evo + i]
        a_ev[eco] = 1
        c_ev[eco] = 1
        for i in range(1, ni):
            a_ev[eco + 2 * i - 1] = (vals[i] + 1) % p
            a_ev[eco + 2 * i] = (vals[i] - 1) % p
            c_ev[eco + 2 * i - 1] = (4 * vals[i] + full[evo2 + i]) % p
            c_ev[eco + 2 * i] = full[evo2 + i]

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
        C = idft(c_ev)
        AA = [0] * (2 * m)
        for i in range(m):
            if A[i]:
                for j in range(m):
                    AA[i + j] = (AA[i + j] + A[i] * A[j]) % p
        for i in range(m):
            AA[i] = (AA[i] - C[i]) % p
        hq = [0] * m
        for i in range(2 * m - 1, m - 1, -1):
            q = AA[i]
            hq[i - m] = (hq[i - m] + q) % p
            AA[i - m] = (AA[i - m] + q) % p
            AA[i] = 0
        assert all(v == 0 for v in AA[:m]), "SAP witness invalid"
        # h = 2·d1·A + (A²−C)/Z − d2 − d1² at [0], plus top coeff d1²
        h = [(2 * d1 * A[i] + hq[i]) % p for i in range(m)]
        h[0] = (h[0] - d2 - d1 * d1) % p
        h.append(d1 * d1 % p)
        return full, h

    def prove(self, cs: ConstraintSystem, params: HostGM17Params,
              d1, d2, r):
        p = self.fr.modulus
        m = params.domain_size
        gen = pow(self.fr.root_of_unity,
                  1 << (self.fr.two_adicity - (m.bit_length() - 1)), p)
        full, h = self._witness(cs, m, gen, d1 % p, d2 % p)
        ni = params.num_inputs

        def msm1(points, scalars):
            acc = None
            for pt, k in zip(points, scalars):
                if pt is None or k % p == 0:
                    continue
                acc = self._add1(acc, ec_mul(self.base, self.g1_a, pt, k % p))
            return acc

        def msm2(points, scalars):
            acc = None
            for pt, k in zip(points, scalars):
                if pt is None or k % p == 0:
                    continue
                acc = self._add2(acc, ec_mul(self.sub, self.g2_a, pt, k % p))
            return acc

        g_a = msm1(params.a_query, full)
        g_a = self._add1(g_a, self._g1((r + d1) % p, params.g_gamma_z))
        g_b = msm2(params.b_query, full)
        g_b = self._add2(g_b, self._g2((r + d1) % p, params.h_gamma_z))

        c1_acc = msm1(params.c_query_1, full[ni:])
        # c_query_2[0] enters with coefficient r (prover.rs r_c0), not
        # full[0]: the c2 MSM skips index 0
        c2_acc = msm1(params.c_query_2[1:], full[1:])
        g_acc = msm1(params.g_gamma2_z_t, h)

        r2 = r * r % p
        g_c = c1_acc
        g_c = self._add1(g_c, self._g1(r2, params.g_gamma2_z2))
        g_c = self._add1(g_c, self._g1(r % p, params.g_ab_gamma_z))
        g_c = self._add1(g_c, self._g1(d1 % p, params.g_ab_gamma_z))
        g_c = self._add1(g_c, ec_mul(self.base, self.g1_a,
                                     params.c_query_2[0], r % p))
        g_c = self._add1(g_c, self._g1(d1 * 2 * r % p, params.g_gamma2_z2))
        if c2_acc is not None:
            g_c = self._add1(g_c, ec_mul(self.base, self.g1_a, c2_acc,
                                         r % p))
        g_c = self._add1(g_c, self._g1(d2 % p, params.g_gamma2_z_t[0]))
        g_c = self._add1(g_c, g_acc)
        return {"a": g_a, "b": g_b, "c": g_c}

    def verify(self, params: HostGM17Params, proof, public_inputs) -> bool:
        p = self.fr.modulus
        vk = params.vk
        if len(public_inputs) + 1 != len(vk["query"]):
            raise ValueError("malformed vk")
        g_psi = vk["query"][0]
        for x, pt in zip(public_inputs, vk["query"][1:]):
            g_psi = self._add1(g_psi, ec_mul(self.base, self.g1_a, pt,
                                             x % p))
        a_alpha = self._add1(proof["a"], vk["g_alpha_g1"])
        b_beta = self._add2(proof["b"], vk["h_beta_g2"])
        E = self.E
        # point negation is in the BASE field (E.p), not the scalar field
        ml = E._fmul(
            E._fmul(E.miller_loop(ec_neg(a_alpha, E.p), b_beta),
                    E.miller_loop(g_psi, vk["h_gamma_g2"])),
            E.miller_loop(proof["c"], vk["h_g2"]))
        ml = E._fmul(ml, E.miller_loop(vk["g_alpha_g1"], vk["h_beta_g2"]))
        one = E._fone()
        test1 = E.final_exponentiation(ml) == one
        ml2 = E._fmul(E.miller_loop(proof["a"], vk["h_gamma_g2"]),
                      E.miller_loop(vk["g_gamma_g1"],
                                    ec_neg(proof["b"], E.p)))
        test2 = E.final_exponentiation(ml2) == one
        return test1 and test2


def host_gm17_mnt4753() -> HostGM17:
    from ..curves.pairing_host import host_mnt4753_pairing
    from ..params._gen import curves_gen as CG
    from .. import params as PP
    c = CG.MNT4753
    return HostGM17(host_mnt4753_pairing(), c["a"], (c["g1_x"], c["g1_y"]),
                    c["g2_a"], (c["g2_x"], c["g2_y"]), PP.MNT4753_FR)


def host_gm17_mnt6298() -> HostGM17:
    from ..curves.pairing_host import host_mnt6298_pairing
    from ..params._gen import curves_gen as CG
    from .. import params as PP
    c = CG.MNT6298
    return HostGM17(host_mnt6298_pairing(), c["a"], (c["g1_x"], c["g1_y"]),
                    c["g2_a"], (c["g2_x"], c["g2_y"]), PP.MNT6298_FR)
