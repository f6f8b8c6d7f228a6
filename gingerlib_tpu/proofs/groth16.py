"""Groth16 zk-SNARK: setup / prove / verify.

Follows the reference dataflow exactly (SURVEY.md §3.1-3.3):
  generator: proof-systems/src/groth16/generator.rs:146-335
  prover:    groth16/prover.rs:201-346 + r1cs_to_qap.rs:71-169
  verifier:  groth16/verifier.rs:9-44

TPU-native split: the generator's scalar bookkeeping (Lagrange coefficients
at the toxic point, per-variable QAP accumulation, query scalars) is exact
host python-int arithmetic; all heavy device work is batched fixed-base
scalar multiplication, the 7-FFT witness map, variable-base MSMs, and one
pairing.  Randomness (alpha..delta, t, r, s) enters as explicit python ints
so proofs are reproducible (create_proof with pinned r, s — prover.rs:201).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import fp as fpmod
from ..ops import limbs
from ..ops.fft import Domain
from ..ops import msm as msm_mod
from ..relations.r1cs import ConstraintSystem, CompiledR1CS, compile_r1cs, \
    eval_matrix
from ..curves.pairing_mnt import MNTPairing


@dataclass
class VerifyingKey:
    alpha_g1_beta_g2: jnp.ndarray        # GT element [K, nd]
    gamma_g2: tuple                      # G2 affine (x, y)
    delta_g2: tuple
    gamma_abc_g1: tuple                  # (xs, ys) [num_inputs, 1, nd]


@dataclass
class Parameters:
    vk: VerifyingKey
    alpha_g1: tuple
    beta_g1: tuple
    beta_g2: tuple
    delta_g1: tuple
    delta_g2: tuple
    a_query: tuple        # (xs, ys, inf) over all variables
    b_g1_query: tuple
    b_g2_query: tuple
    h_query: tuple        # length domain_size - 1
    l_query: tuple        # aux variables only
    num_inputs: int = 0
    domain_size: int = 0


@dataclass
class Proof:
    a: tuple  # G1 affine (x, y)
    b: tuple  # G2 affine
    c: tuple  # G1 affine


# ---------------------------------------------------------------------------
# setup
# ---------------------------------------------------------------------------

def _host_lagrange_at(params, m: int, gen: int, t: int):
    """l_i(t) for i<m as python ints (one modular inverse total)."""
    p = params.modulus
    zt = (pow(t, m, p) - 1) % p
    # denominators m*(t - w^i); numerators zt*w^i
    denoms = []
    w = 1
    for _ in range(m):
        denoms.append((t - w) % p)
        w = w * gen % p
    # batch inversion
    prefix = [1] * (m + 1)
    for i in range(m):
        prefix[i + 1] = prefix[i] * denoms[i] % p
    inv_all = pow(prefix[m], -1, p)
    invs = [0] * m
    for i in range(m - 1, -1, -1):
        invs[i] = inv_all * prefix[i] % p
        inv_all = inv_all * denoms[i] % p
    m_inv = pow(m, -1, p)
    out = []
    w = 1
    for i in range(m):
        out.append(zt * m_inv % p * w % p * invs[i] % p)
        w = w * gen % p
    return out, zt


def _fixed_msm_affine(curve, base_scalar: int, scalars):
    """[(s_i * base_scalar mod r)]·G for scalar list -> affine + inf mask."""
    r = curve.scalar_field.modulus
    ks = [s % r for s in scalars]
    kd = jnp.asarray(limbs.to_digits_batch(ks, curve.scalar_field.n_digits))
    base = curve.generator_affine
    pts = msm_mod.fixed_base_msm(curve, base, kd)
    xs, ys = curve.to_affine(pts)
    inf = jnp.asarray(np.asarray([k == 0 for k in ks]))
    return xs, ys, inf


def generate_parameters(engine: MNTPairing, cs: ConstraintSystem,
                        alpha: int, beta: int, gamma: int, delta: int,
                        t: int) -> Parameters:
    """CRS generation with explicit toxic waste (generator.rs:146)."""
    g1, g2 = engine.g1, engine.g2
    fr = g1.scalar_field
    p = fr.modulus

    num_inputs = cs.num_inputs
    num_aux = cs.num_aux
    nvars = num_inputs + num_aux
    domain = Domain(fr, cs.num_constraints + num_inputs)
    m = domain.size
    if pow(t, m, p) == 1:
        raise ValueError("t lies in the evaluation domain")

    u, zt = _host_lagrange_at(fr, m, domain.gen, t)

    # per-variable QAP evaluations at t (r1cs_to_qap.rs:14-68)
    a = [0] * nvars
    b = [0] * nvars
    c = [0] * nvars
    for i in range(num_inputs):
        a[i] = u[cs.num_constraints + i]
    for i in range(cs.num_constraints):
        for v, k in cs.at[i]:
            a[v] = (a[v] + u[i] * k) % p
        for v, k in cs.bt[i]:
            b[v] = (b[v] + u[i] * k) % p
        for v, k in cs.ct[i]:
            c[v] = (c[v] + u[i] * k) % p

    gamma_inv = pow(gamma, -1, p)
    delta_inv = pow(delta, -1, p)
    gamma_abc = [(beta * a[i] + alpha * b[i] + c[i]) * gamma_inv % p
                 for i in range(num_inputs)]
    l = [(beta * a[i] + alpha * b[i] + c[i]) * delta_inv % p
         for i in range(nvars)]
    h = [zt * delta_inv % p * pow(t, i, p) % p for i in range(m - 1)]

    # device: fixed-base MSMs for all queries (generator.rs:223-296)
    a_query = _fixed_msm_affine(g1, 1, a)
    b_g1_query = _fixed_msm_affine(g1, 1, b)
    b_g2_query = _fixed_msm_affine(g2, 1, b)
    h_query = _fixed_msm_affine(g1, 1, h)
    l_query = tuple(q[num_inputs:] for q in _fixed_msm_affine(g1, 1, l))
    gamma_abc_q = _fixed_msm_affine(g1, 1, gamma_abc)

    def single_g1(k):
        pt = g1.mul_const(g1.generator(()), k % p)
        return g1.to_affine(pt)

    def single_g2(k):
        pt = g2.mul_const(g2.generator(()), k % p)
        return g2.to_affine(pt)

    alpha_g1 = single_g1(alpha)
    beta_g1 = single_g1(beta)
    delta_g1 = single_g1(delta)
    beta_g2 = single_g2(beta)
    gamma_g2 = single_g2(gamma)
    delta_g2 = single_g2(delta)

    agbg = engine.pairing(alpha_g1, beta_g2)

    vk = VerifyingKey(
        alpha_g1_beta_g2=agbg,
        gamma_g2=gamma_g2,
        delta_g2=delta_g2,
        gamma_abc_g1=(gamma_abc_q[0], gamma_abc_q[1]),
    )
    return Parameters(
        vk=vk, alpha_g1=alpha_g1, beta_g1=beta_g1, beta_g2=beta_g2,
        delta_g1=delta_g1, delta_g2=delta_g2,
        a_query=a_query, b_g1_query=b_g1_query, b_g2_query=b_g2_query,
        h_query=h_query, l_query=l_query,
        num_inputs=num_inputs, domain_size=m,
    )


# ---------------------------------------------------------------------------
# proving
# ---------------------------------------------------------------------------

def witness_map(compiled: CompiledR1CS, z, d1: int = 0, d2: int = 0,
                d3: int = 0):
    """QAP witness map -> h coefficients [m-1, nd] Montgomery
    (r1cs_to_qap.rs:71-169; d1=d2=d3=0 in create_random_proof)."""
    fr = compiled.field
    domain = Domain(fr, compiled.domain_size)
    m = domain.size
    nc = compiled.num_constraints
    ni = compiled.num_inputs

    a_ev = eval_matrix(fr, compiled.a, z)   # [m, nd]
    b_ev = eval_matrix(fr, compiled.b, z)
    # input consistency rows (r1cs_to_qap.rs:117-119)
    a_ev = a_ev.at[nc:nc + ni].set(z[:ni])

    a_poly = domain.ifft(a_ev)
    b_poly = domain.ifft(b_ev)

    a_cos = domain.coset_fft(a_poly)
    b_cos = domain.coset_fft(b_poly)
    ab = domain.mul_in_evaluation_domain(a_cos, b_cos)

    c_ev = eval_matrix(fr, compiled.c, z)
    c_poly = domain.ifft(c_ev)
    c_cos = domain.coset_fft(c_poly)

    ab = fpmod.sub_mod(fr, ab, c_cos)
    ab = domain.divide_by_vanishing_poly_on_coset(ab)
    h = domain.coset_ifft(ab)  # [m, nd]; top coefficient is zero

    if d1 or d2 or d3:
        # h_extra(x) = d2·a(x) + d1·b(x) − d3 − d1·d2 (r1cs_to_qap.rs:124-132)
        p = fr.modulus
        d1d = jnp.asarray(fpmod.fp_from_int(fr, d1))
        d2d = jnp.asarray(fpmod.fp_from_int(fr, d2))
        extra = fpmod.add_mod(fr, fpmod.mont_mul(fr, a_poly, d2d),
                              fpmod.mont_mul(fr, b_poly, d1d))
        corr = fpmod.fp_from_int(fr, (d3 + d1 * d2) % p)
        extra = extra.at[0].set(fpmod.sub_mod(
            fr, extra[0], jnp.asarray(corr)))
        h = fpmod.add_mod(fr, h, extra)
    return h[:m - 1]


def create_proof(engine: MNTPairing, params: Parameters,
                 compiled: CompiledR1CS, assignment, r: int, s: int,
                 d1: int = 0, d2: int = 0, d3: int = 0) -> Proof:
    """assignment: full value list (python ints) or device Montgomery array
    [nvars, nd].  r, s: blinding scalars (ints; pinned for reproducibility).
    """
    g1, g2 = engine.g1, engine.g2
    fr = g1.scalar_field

    if isinstance(assignment, (list, tuple)):
        z = jnp.asarray(fpmod.fp_from_ints(fr, assignment))
    else:
        z = assignment
    ni = params.num_inputs

    h = witness_map(compiled, z, d1, d2, d3)

    # scalars to standard form for MSM (prover.rs:241-267)
    z_std = fpmod.from_mont(fr, z)
    h_std = fpmod.from_mont(fr, h)
    aux_std = z_std[ni:]

    def vmsm(query, scalars):
        xs, ys, inf = query
        n = scalars.shape[0]
        return msm_mod.msm(g1 if xs.shape[-2] == g1.F.K else g2,
                           xs[:n], ys[:n], scalars, inf_mask=inf[:n])

    rd = jnp.asarray(limbs.to_digits_batch([r % fr.modulus], fr.n_digits))
    sd = jnp.asarray(limbs.to_digits_batch([s % fr.modulus], fr.n_digits))

    def smul(curve, affine, kd):
        pt = (affine[0][None], affine[1][None],
              jnp.broadcast_to(jnp.asarray(curve.F.one()), affine[0][None].shape))
        out = curve.mul_scalar_digits(pt, kd)
        return tuple(c[0] for c in out)

    # g_a = alpha + Σ a_query·z + r·delta  (prover.rs:272-285)
    a_acc = vmsm(params.a_query, z_std)
    r_delta = smul(g1, params.delta_g1, rd)
    g_a = g1.add(a_acc, r_delta)
    g_a = g1.add_mixed(g_a, params.alpha_g1)

    # g1_b = beta_g1 + Σ b_g1_query·z + s·delta_g1
    b1_acc = vmsm(params.b_g1_query, z_std)
    s_delta = smul(g1, params.delta_g1, sd)
    g1_b = g1.add(b1_acc, s_delta)
    g1_b = g1.add_mixed(g1_b, params.beta_g1)

    # g2_b = beta_g2 + Σ b_g2_query·z + s·delta_g2
    b2_acc = vmsm(params.b_g2_query, z_std)
    s_delta2 = smul(g2, params.delta_g2, sd)
    g2_b = g2.add(b2_acc, s_delta2)
    g2_b = g2.add_mixed(g2_b, params.beta_g2)

    # g_c = s·g_a + r·g1_b − rs·delta + l_query·aux + h_query·h
    l_acc = vmsm(params.l_query, aux_std)
    h_acc = vmsm(params.h_query, h_std)
    s_ga = g1.mul_scalar_digits(tuple(c[None] for c in g_a), sd)
    s_ga = tuple(c[0] for c in s_ga)
    r_g1b = g1.mul_scalar_digits(tuple(c[None] for c in g1_b), rd)
    r_g1b = tuple(c[0] for c in r_g1b)
    rs = r * s % fr.modulus
    rsd = jnp.asarray(limbs.to_digits_batch([rs], fr.n_digits))
    rs_delta = smul(g1, params.delta_g1, rsd)
    g_c = g1.add(s_ga, r_g1b)
    g_c = g1.add(g_c, g1.neg(rs_delta))
    g_c = g1.add(g_c, l_acc)
    g_c = g1.add(g_c, h_acc)

    return Proof(a=g1.to_affine(g_a), b=g2.to_affine(g2_b),
                 c=g1.to_affine(g_c))


# ---------------------------------------------------------------------------
# verification
# ---------------------------------------------------------------------------

def verify_proof(engine: MNTPairing, vk: VerifyingKey, proof: Proof,
                 public_inputs) -> bool:
    """3-pair product check (verifier.rs:18-44).  public_inputs: python int
    list (excluding the leading ONE)."""
    g1, g2 = engine.g1, engine.g2
    fr = g1.scalar_field
    xs, ys = vk.gamma_abc_g1
    n = len(public_inputs) + 1
    if xs.shape[0] != n:
        raise ValueError("malformed verifying key")

    scalars = [1] + [x % fr.modulus for x in public_inputs]
    sd = jnp.asarray(limbs.to_digits_batch(scalars, fr.n_digits))
    g_ic = msm_mod.msm_naive(g1, xs, ys, sd)
    gic_aff = g1.to_affine(g_ic)

    neg_gamma = (vk.gamma_g2[0], g2.F.neg(vk.gamma_g2[1]))
    neg_delta = (vk.delta_g2[0], g2.F.neg(vk.delta_g2[1]))

    p_batch = (jnp.stack([proof.a[0], gic_aff[0], proof.c[0]]),
               jnp.stack([proof.a[1], gic_aff[1], proof.c[1]]))
    q_batch = (jnp.stack([proof.b[0], neg_gamma[0], neg_delta[0]]),
               jnp.stack([proof.b[1], neg_gamma[1], neg_delta[1]]))

    gt = engine.product_of_pairings(p_batch, q_batch)
    return bool(np.asarray(jnp.all(gt == vk.alpha_g1_beta_g2)))
