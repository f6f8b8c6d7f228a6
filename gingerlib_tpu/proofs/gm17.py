"""GM17 (Groth-Maller '17) zk-SNARK: device setup / prove / verify.

Mirrors proof-systems/src/gm17/{generator,prover,verifier,r1cs_to_sap}.rs
with the same TPU split as the Groth16 module: SAP instance-map scalar
bookkeeping is exact host int arithmetic; the heavy work — fixed-base query
MSMs, the SAP witness map's FFT passes, variable-base proof MSMs, and the
two verification pairing products — is batched device compute.

SAP reduction (r1cs_to_sap.rs): domain size 2·constraints + 2·(inputs−1) + 1,
each R1CS row (a·b=c) becomes two squaring rows ((a+b)² and (a−b)²), one new
witness per constraint and per input.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import fp as fpmod
from ..ops import limbs
from ..ops.fft import best_domain
from ..ops import msm as msm_mod
from ..relations.r1cs import ConstraintSystem, CompiledR1CS, compile_r1cs, \
    eval_matrix
from ..curves.pairing_mnt import MNTPairing
from .groth16 import _host_lagrange_at, _fixed_msm_affine


@dataclass
class GM17VerifyingKey:
    h_g2: tuple                   # G2 affine (x, y)
    g_alpha_g1: tuple             # G1 affine
    h_beta_g2: tuple
    g_gamma_g1: tuple
    h_gamma_g2: tuple
    query: tuple                  # (xs, ys, inf) [num_inputs]
    g_alpha_h_beta: jnp.ndarray   # GT element (precomputed e(g^α, h^β))


@dataclass
class GM17Parameters:
    vk: GM17VerifyingKey
    a_query: tuple                # (xs, ys, inf) over all SAP variables + 1
    b_query: tuple                # same scalars in G2
    c_query_1: tuple              # variables past the inputs
    c_query_2: tuple              # all variables (index 0 special-cased)
    g_gamma_z: tuple
    h_gamma_z: tuple
    g_ab_gamma_z: tuple
    g_gamma2_z2: tuple
    g_gamma2_z_t: tuple           # (xs, ys, inf) [m + 1]
    num_inputs: int = 0
    domain_size: int = 0


@dataclass
class GM17Proof:
    a: tuple
    b: tuple
    c: tuple


def _sap_instance_map(cs: ConstraintSystem, fr, t: int):
    """Per-variable SAP evaluations at t (r1cs_to_sap.rs:14-100).

    Returns (a, c, zt, sap_num_vars, m, gen): a/c indexed by SAP variable
    (R1CS vars, then one extra per constraint, then one per input > 0)."""
    p = fr.modulus
    nc, ni, na = cs.num_constraints, cs.num_inputs, cs.num_aux
    raw = 2 * nc + 2 * (ni - 1) + 1
    domain = best_domain(fr, raw)
    m = domain.size
    gen = domain.gen
    u, zt = _host_lagrange_at(fr, m, gen, t)
    if zt == 0:
        raise ValueError("t lies in the evaluation domain")
    sap_num_vars = 2 * (ni - 1) + na + nc
    evo = ni + na
    eco = 2 * nc
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


def generate_parameters(engine: MNTPairing, cs: ConstraintSystem,
                        alpha: int, beta: int, gamma: int,
                        t: int) -> GM17Parameters:
    """CRS generation with explicit toxic waste (gm17/generator.rs; the
    reference pins gamma = 1 in its public API, generator.rs:27)."""
    g1, g2 = engine.g1, engine.g2
    fr = g1.scalar_field
    p = fr.modulus
    ni = cs.num_inputs

    a, c, zt, nvars, m, _ = _sap_instance_map(cs, fr, t)
    ab = (alpha + beta) % p
    gz = gamma * zt % p

    query = _fixed_msm_affine(
        g1, 1, [(c[i] * gamma + a[i] * ab) % p for i in range(ni)])
    a_query = _fixed_msm_affine(g1, 1, [ai * gamma % p for ai in a])
    b_query = _fixed_msm_affine(g2, 1, [ai * gamma % p for ai in a])
    c_query_1 = _fixed_msm_affine(
        g1, 1, [(c[i] * gamma + a[i] * ab) % p for i in range(ni, nvars + 1)])
    c_query_2 = _fixed_msm_affine(
        g1, 1, [ai * 2 * gz * gamma % p for ai in a])
    g_gamma2_z_t = _fixed_msm_affine(
        g1, 1, [gz * gamma % p * pow(t, i, p) % p for i in range(m + 1)])

    from .groth16 import single_mul_affine

    def single_g1(k):
        return single_mul_affine(g1, g1.to_affine(g1.generator(())), k)

    def single_g2(k):
        return single_mul_affine(g2, g2.to_affine(g2.generator(())), k)

    g_alpha = single_g1(alpha)
    h_beta = single_g2(beta)
    vk = GM17VerifyingKey(
        h_g2=g2.to_affine(g2.generator(())),
        g_alpha_g1=g_alpha,
        h_beta_g2=h_beta,
        g_gamma_g1=single_g1(gamma),
        h_gamma_g2=single_g2(gamma),
        query=query,
        g_alpha_h_beta=engine.pairing(g_alpha, h_beta),
    )
    return GM17Parameters(
        vk=vk, a_query=a_query, b_query=b_query,
        c_query_1=c_query_1, c_query_2=c_query_2,
        g_gamma_z=single_g1(gz), h_gamma_z=single_g2(gz),
        g_ab_gamma_z=single_g1(ab * gz % p),
        g_gamma2_z2=single_g1(gz * gz % p),
        g_gamma2_z_t=g_gamma2_z_t,
        num_inputs=ni, domain_size=m,
    )


def _sap_witness_core(compiled: CompiledR1CS, z, blind):
    """Extended SAP witness + h coefficients, on device
    (r1cs_to_sap.rs:102-250).

    Returns (full [nvars+1, nd], h [m+1, nd]) in Montgomery form.  The
    evaluation vectors interleave the two squaring rows per constraint; h is
    (A(x)² − C(x))/Z(x) + 2·d1·A(x) with the d2/d1² constant corrections and
    the extra top coefficient d1² (prover.rs blinding)."""
    fr = compiled.field
    p = fr.modulus
    nc, ni = compiled.num_constraints, compiled.num_inputs
    raw = 2 * nc + 2 * (ni - 1) + 1
    domain = best_domain(fr, raw)
    m = domain.size
    nd = fr.n_digits

    A = eval_matrix(fr, compiled.a, z)[:nc]   # [nc, nd]
    B = eval_matrix(fr, compiled.b, z)[:nc]
    C = eval_matrix(fr, compiled.c, z)[:nc]
    d = fpmod.sub_mod(fr, A, B)
    sq = fpmod.mont_mul(fr, d, d)             # extra witnesses per constraint
    one = jnp.asarray(fr.one_mont)
    z_in = z[:ni]
    zin_m1 = fpmod.sub_mod(fr, z_in, jnp.broadcast_to(one, z_in.shape))
    inp_sq = fpmod.mont_mul(fr, zin_m1, zin_m1)[1:]  # per input > 0

    full = jnp.concatenate([z, sq, inp_sq], axis=0)

    # evaluation vectors on the domain
    a_ev = jnp.zeros((m, nd), jnp.uint32)
    c_ev = jnp.zeros((m, nd), jnp.uint32)
    apb = fpmod.add_mod(fr, A, B)
    c4 = fpmod.add_mod(fr, fpmod.double_mod(fr, C), fpmod.double_mod(fr, C))
    a_ev = a_ev.at[0:2 * nc:2].set(apb)
    a_ev = a_ev.at[1:2 * nc:2].set(d)
    c_ev = c_ev.at[0:2 * nc:2].set(fpmod.add_mod(fr, c4, sq))
    c_ev = c_ev.at[1:2 * nc:2].set(sq)
    eco = 2 * nc
    a_ev = a_ev.at[eco].set(one)
    c_ev = c_ev.at[eco].set(one)
    if ni > 1:
        zi = z_in[1:]
        zp1 = fpmod.add_mod(fr, zi, jnp.broadcast_to(one, zi.shape))
        zm1 = zin_m1[1:]
        z4 = fpmod.add_mod(fr, fpmod.double_mod(fr, zi),
                           fpmod.double_mod(fr, zi))
        a_ev = a_ev.at[eco + 1:eco + 2 * ni - 1:2].set(zp1)
        a_ev = a_ev.at[eco + 2:eco + 2 * ni - 1:2].set(zm1)
        c_ev = c_ev.at[eco + 1:eco + 2 * ni - 1:2].set(
            fpmod.add_mod(fr, z4, inp_sq))
        c_ev = c_ev.at[eco + 2:eco + 2 * ni - 1:2].set(inp_sq)

    a_poly = domain.ifft(a_ev)
    c_poly = domain.ifft(c_ev)
    a_cos = domain.coset_fft(a_poly)
    c_cos = domain.coset_fft(c_poly)
    t = fpmod.sub_mod(fr, fpmod.mont_mul(fr, a_cos, a_cos), c_cos)
    t = domain.divide_by_vanishing_poly_on_coset(t)
    hq = domain.coset_ifft(t)                 # [m, nd], degree m−2

    d1d, corr, top = blind
    h = fpmod.add_mod(fr, hq, fpmod.mont_mul(fr, a_poly, d1d))
    h = h.at[0].set(fpmod.sub_mod(fr, h[0], corr))
    h = jnp.concatenate([h, top[None]], axis=0)  # [m+1, nd]
    return full, h


def sap_witness_map(compiled: CompiledR1CS, z, d1: int, d2: int):
    """int-randomness wrapper over _sap_witness_core."""
    fr = compiled.field
    p = fr.modulus
    blind = (jnp.asarray(fpmod.fp_from_int(fr, 2 * d1 % p)),
             jnp.asarray(fpmod.fp_from_int(fr, (d2 + d1 * d1) % p)),
             jnp.asarray(fpmod.fp_from_int(fr, d1 * d1 % p)))
    return _sap_witness_core(compiled, z, blind)


def _params_arrays(params: GM17Parameters):
    return (params.a_query, params.b_query, params.c_query_1,
            params.c_query_2, params.g_gamma_z, params.h_gamma_z,
            params.g_ab_gamma_z, params.g_gamma2_z2, params.g_gamma2_z_t)


_PROVE_JIT_CACHE: dict = {}


def create_proof(engine: MNTPairing, params: GM17Parameters,
                 compiled: CompiledR1CS, assignment,
                 d1: int, d2: int, r: int) -> GM17Proof:
    """One jitted device graph per (engine, compiled) — see groth16.py."""
    g1 = engine.g1
    fr = g1.scalar_field
    p = fr.modulus

    if isinstance(assignment, (list, tuple)):
        z = jnp.asarray(fpmod.fp_from_ints(fr, assignment))
    else:
        z = assignment

    blind = (jnp.asarray(fpmod.fp_from_int(fr, 2 * d1 % p)),
             jnp.asarray(fpmod.fp_from_int(fr, (d2 + d1 * d1) % p)),
             jnp.asarray(fpmod.fp_from_int(fr, d1 * d1 % p)))

    def dig(k):
        return jnp.asarray(limbs.to_digits_batch([k % p], fr.n_digits))

    scalars = (dig(r + d1), dig(r * r), dig(r), dig(d1),
               dig(d1 * 2 * r), dig(d2))

    a, b, c = _create_proof_device(engine, compiled, _params_arrays(params),
                                   z, blind, scalars)
    return GM17Proof(a=a, b=b, c=c)


def _create_proof_device(engine, compiled, pa, z, blind, scalars):
    """Small cached jit units (see groth16._jit_unit rationale)."""
    from .groth16 import _jit_unit, _vmsm_jit, _smul_jit
    g1, g2 = engine.g1, engine.g2
    fr = g1.scalar_field
    (a_query, b_query, c_query_1, c_query_2, g_gamma_z, h_gamma_z,
     g_ab_gamma_z, g_gamma2_z2, g_gamma2_z_t) = pa
    rd1_d, rr_d, r_d, d1_d, d12r_d, d2_d = scalars
    ni = compiled.num_inputs

    wm = _jit_unit(compiled, "sap_wm", lambda: lambda z, blind:
                   _sap_witness_core(compiled, z, blind))
    full, h = wm(z, blind)
    conv = _PROVE_JIT_CACHE.get(("from_mont", fr))
    if conv is None:
        from ..jit_config import maybe_jit
        conv = maybe_jit(lambda x: fpmod.from_mont(fr, x))
        _PROVE_JIT_CACHE[("from_mont", fr)] = conv
    full_std = conv(full)
    h_std = conv(h)

    # g_a = Σ a_query·full + (r + d1)·g^{γz}
    a_acc = _vmsm_jit(g1, a_query, full_std)
    ga_r = _smul_jit(g1, g_gamma_z, rd1_d)
    # g_b in G2 with the same scalars
    b_acc = _vmsm_jit(g2, b_query, full_std)
    gb_r = _smul_jit(g2, h_gamma_z, rd1_d)

    # g_c per gm17/prover.rs (host mirror: proofs/gm17_host.py prove)
    c1_acc = _vmsm_jit(g1, c_query_1, full_std[ni:])
    c2_acc = _vmsm_jit(g1, tuple(q[1:] for q in c_query_2), full_std[1:])
    g_acc = _vmsm_jit(g1, g_gamma2_z_t, h_std)

    terms = [c1_acc,
             _smul_jit(g1, g_gamma2_z2, rr_d),
             _smul_jit(g1, g_ab_gamma_z, r_d),
             _smul_jit(g1, g_ab_gamma_z, d1_d),
             _smul_jit(g1, tuple(q[0] for q in c_query_2[:2]), r_d),
             _smul_jit(g1, g_gamma2_z2, d12r_d),
             _smul_jit(g1, tuple(q[0] for q in g_gamma2_z_t[:2]), d2_d),
             g_acc]

    def build_assemble():
        def run(a_acc, ga_r, b_acc, gb_r, terms, c2_acc, r_d):
            g_a = g1.add(a_acc, ga_r)
            g_b = g2.add(b_acc, gb_r)
            r_c2 = g1.mul_scalar_digits(
                tuple(c[None] for c in c2_acc), r_d)
            g_c = terms[0]
            for t in terms[1:]:
                g_c = g1.add(g_c, t)
            g_c = g1.add(g_c, tuple(c[0] for c in r_c2))
            return (g1.to_affine(g_a), g2.to_affine(g_b),
                    g1.to_affine(g_c))
        return run

    asm = _jit_unit(engine, "gm17_asm", build_assemble)
    return asm(a_acc, ga_r, b_acc, gb_r, terms, c2_acc, r_d)


def verify_proof(engine: MNTPairing, vk: GM17VerifyingKey, proof: GM17Proof,
                 public_inputs) -> bool:
    """Two pairing-product equations (gm17/verifier.rs):
        e(A+α, B+β) = e(α,β) · e(ψ, γ_h2) · e(C, h)
        e(A, γ_h2)  = e(γ_g1, B)
    """
    g1, g2 = engine.g1, engine.g2
    fr = g1.scalar_field
    xs, ys, inf = vk.query
    n = len(public_inputs) + 1
    if xs.shape[0] != n:
        raise ValueError("malformed verifying key")
    scalars = [1] + [x % fr.modulus for x in public_inputs]
    sd = jnp.asarray(limbs.to_digits_batch(scalars, fr.n_digits))
    from .groth16 import _jit_unit
    if xs.shape[0] >= 64:   # work/depth crossover, see groth16.verify_proof
        g_psi = _jit_unit(engine, ("gpsi_b", int(xs.shape[0])),
                          lambda: lambda xs, ys, sd, inf: g1.to_affine(
                              msm_mod.msm_bucketed(
                                  g1, xs, ys, sd, inf_mask=inf)))(
                                      xs, ys, sd, inf)
    else:
        g_psi = _jit_unit(engine, ("gpsi", int(xs.shape[0])),
                          lambda: lambda xs, ys, sd, inf: g1.to_affine(
                              msm_mod.msm_naive(
                                  g1, xs, ys, sd, inf_mask=inf)))(
                                      xs, ys, sd, inf)

    def aff_add(curve, a_xy, b_xy):
        one = jnp.broadcast_to(jnp.asarray(curve.F.one()), a_xy[0].shape)
        pa = (a_xy[0], a_xy[1], one)
        pb = (b_xy[0], b_xy[1], one)
        return curve.to_affine(curve.add(pa, pb))

    a_alpha = aff_add(g1, proof.a, vk.g_alpha_g1)
    b_beta = aff_add(g2, proof.b, vk.h_beta_g2)
    neg = lambda curve, xy: (xy[0], curve.F.neg(xy[1]))

    p1 = (jnp.stack([a_alpha[0], g_psi[0], proof.c[0]]),
          jnp.stack([a_alpha[1], g_psi[1], proof.c[1]]))
    nh_gamma = neg(g2, vk.h_gamma_g2)
    nh = neg(g2, vk.h_g2)
    use_prep = hasattr(engine, "prepare_g2")

    def prep(q):
        return engine.prepare_g2((np.asarray(q[0]), np.asarray(q[1])))

    if use_prep:  # fixed-G2 fast path, see groth16.verify_proof
        gt1 = engine.product_of_pairings_prepared(
            p1, [prep(b_beta), prep(nh_gamma), prep(nh)])
    else:
        q1 = (jnp.stack([b_beta[0], nh_gamma[0], nh[0]]),
              jnp.stack([b_beta[1], nh_gamma[1], nh[1]]))
        gt1 = engine.product_of_pairings(p1, q1)
    test1 = bool(np.asarray(jnp.all(gt1 == vk.g_alpha_h_beta)))

    ng_gamma = neg(g1, vk.g_gamma_g1)
    p2 = (jnp.stack([proof.a[0], ng_gamma[0]]),
          jnp.stack([proof.a[1], ng_gamma[1]]))
    if use_prep:
        gt2 = engine.product_of_pairings_prepared(
            p2, [prep(vk.h_gamma_g2), prep(proof.b)])
    else:
        q2 = (jnp.stack([vk.h_gamma_g2[0], proof.b[0]]),
              jnp.stack([vk.h_gamma_g2[1], proof.b[1]]))
        gt2 = engine.product_of_pairings(p2, q2)
    one_gt = jnp.asarray(engine.gt_one())
    test2 = bool(np.asarray(jnp.all(gt2 == one_gt)))
    return test1 and test2
