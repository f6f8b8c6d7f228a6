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

import functools
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
from ..jit_config import maybe_jit


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
    """l_i(t) for i<m as python ints (one modular inverse total).

    Uses the native C++ host runtime when available (native/gl_host.cpp
    gl_lagrange_at); pure-python fallback below."""
    from .. import native
    hf = native.host_field(params.modulus)
    if hf is not None:
        return hf.lagrange_at(gen, t, m)
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
    """[(s_i * base_scalar mod r)]·G for scalar list -> affine + inf mask.

    The batch is padded to the next power of two so XLA compiles one graph
    per (curve, pow2-bucket) instead of one per exact length — setup makes
    many different-length query calls (generator.rs:223-296)."""
    r = curve.scalar_field.modulus
    ks = [s % r for s in scalars]
    n = len(ks)
    n2 = 1 << max(0, (n - 1).bit_length())
    kd = jnp.asarray(limbs.to_digits_batch(
        ks + [0] * (n2 - n), curve.scalar_field.n_digits))
    base = curve.generator_affine
    pts = _fixed_msm_jit(curve, base, kd)
    xs, ys = pts
    inf = jnp.asarray(np.asarray([k == 0 for k in ks]))
    return xs[:n], ys[:n], inf


@functools.lru_cache(maxsize=None)
def _fixed_msm_fn(curve):
    import jax
    from ..ops.pallas_mont import use_pallas

    import os as _os
    if use_pallas() and curve.F.K == 1 \
            and _os.environ.get("GINGERLIB_FIXED_WINDOWED") == "1":
        # production path (fixed_base.rs:15-79): one windowed table per
        # curve built on first use, then one gather + tree-reduce per
        # query call — ~95 adds/scalar instead of 753 double-adds.
        # OPT-IN (GINGERLIB_FIXED_WINDOWED=1) while two failure modes
        # stand, both measured round 5: the G2-width table/query MLIR
        # OOM-kills the AOT compile helper, and the full-width (95
        # window) G1 query executable crashes the TPU worker process on
        # execution.  The scan path below (one lax.scan double-and-add
        # per query batch) compiles small, runs in seconds at bench
        # sizes, and is the path every recorded measurement used.
        w = 8
        nbits = curve.scalar_field.modulus_bits
        # scan-form table build: the level-doubling form's MLIR OOM-kills
        # the AOT compile helper for G2 fields (fixed_base_table_scan
        # docstring); one-time setup cost, identical table
        table_fn = maybe_jit(lambda base: msm_mod.fixed_base_table_scan(
            curve, base, w=w, nbits=nbits))
        inner = maybe_jit(lambda tx, ty, tinf, kd: msm_mod.
                          fixed_base_msm_windowed(
                              curve, ((tx, ty), tinf), kd, w=w,
                              nbits=nbits)[0])
        state = {}

        def run(base, kd):
            if "t" not in state:
                state["t"] = table_fn(base)
            (tx, ty), tinf = state["t"]
            return inner(tx, ty, tinf, kd)

        return run

    def run(base, kd):
        pts = msm_mod.fixed_base_msm(curve, base, kd)
        return curve.to_affine(pts)

    return maybe_jit(run)


def _fixed_msm_jit(curve, base, kd):
    return _fixed_msm_fn(curve)(base, kd)


@functools.lru_cache(maxsize=None)
def _single_mul_fn(curve):
    """jitted [k]·P -> affine for one point (shape-stable digit scalar)."""
    import jax

    def run(gx, gy, kd):
        one = jnp.broadcast_to(jnp.asarray(curve.F.one()), gx[None].shape)
        pt = curve.mul_scalar_digits((gx[None], gy[None], one), kd)
        x, y = curve.to_affine(pt)
        return x[0], y[0]

    return maybe_jit(run)


def single_mul_affine(curve, affine_xy, k: int):
    """[k]·P for a host scalar, one cached compile per curve."""
    r = curve.scalar_field
    kd = jnp.asarray(limbs.to_digits_batch([k % r.modulus], r.n_digits))
    return _single_mul_fn(curve)(affine_xy[0], affine_xy[1], kd)


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
        return single_mul_affine(g1, g1.to_affine(g1.generator(())), k)

    def single_g2(k):
        return single_mul_affine(g2, g2.to_affine(g2.generator(())), k)

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
    blind = None
    if d1 or d2 or d3:
        blind = (jnp.asarray(fpmod.fp_from_int(fr, d1 % fr.modulus)),
                 jnp.asarray(fpmod.fp_from_int(fr, d2 % fr.modulus)),
                 jnp.asarray(fpmod.fp_from_int(
                     fr, (d3 + d1 * d2) % fr.modulus)))
    return _witness_map_core(compiled, z, blind)


def _witness_map_core(compiled: CompiledR1CS, z, blind, mesh=None):
    """blind: None or (d1, d2, d3+d1·d2) Montgomery arrays —
    h_extra(x) = d2·a(x) + d1·b(x) − (d3 + d1·d2).

    mesh: optional Mesh with a "data" axis — all 7 FFT passes then run as
    distributed two-step FFTs over the mesh (fft/domain.rs:360-416
    parallel_fft analogue), bit-identical to the local path; the
    cyclic-layout permutation between passes lowers to one all_to_all."""
    fr = compiled.field
    domain = Domain(fr, compiled.domain_size)
    m = domain.size
    nc = compiled.num_constraints
    ni = compiled.num_inputs

    if mesh is not None and "data" in mesh.shape \
            and mesh.shape["data"] > 1 and m % mesh.shape["data"] == 0 \
            and m > mesh.shape["data"]:
        from ..parallel import sharded
        D = mesh.shape["data"]

        def fft(x):
            return sharded.sharded_fft(domain, mesh,
                                       sharded.cyclic_layout(x, D))

        def ifft(x):
            return sharded.sharded_fft(domain, mesh,
                                       sharded.cyclic_layout(x, D),
                                       inverse=True)
    else:
        fft, ifft = domain.fft, domain.ifft

    def coset_fft(x):
        return fft(domain.distribute_powers(x, domain.coset_shift))

    def coset_ifft(x):
        return domain.distribute_powers(ifft(x), domain.coset_shift_inv)

    a_ev = eval_matrix(fr, compiled.a, z)   # [m, nd]
    b_ev = eval_matrix(fr, compiled.b, z)
    # input consistency rows (r1cs_to_qap.rs:117-119)
    a_ev = a_ev.at[nc:nc + ni].set(z[:ni])

    a_poly = ifft(a_ev)
    b_poly = ifft(b_ev)

    a_cos = coset_fft(a_poly)
    b_cos = coset_fft(b_poly)
    ab = domain.mul_in_evaluation_domain(a_cos, b_cos)

    c_ev = eval_matrix(fr, compiled.c, z)
    c_poly = ifft(c_ev)
    c_cos = coset_fft(c_poly)

    ab = fpmod.sub_mod(fr, ab, c_cos)
    ab = domain.divide_by_vanishing_poly_on_coset(ab)
    h = coset_ifft(ab)  # [m, nd]; top coefficient is zero

    if blind is not None:
        # h_extra(x) = d2·a(x) + d1·b(x) − d3 − d1·d2 (r1cs_to_qap.rs:124-132)
        d1d, d2d, corr = blind
        extra = fpmod.add_mod(fr, fpmod.mont_mul(fr, a_poly, d2d),
                              fpmod.mont_mul(fr, b_poly, d1d))
        extra = extra.at[0].set(fpmod.sub_mod(fr, extra[0], corr))
        h = fpmod.add_mod(fr, h, extra)
    return h[:m - 1]


def _params_arrays(params: Parameters):
    return (params.a_query, params.b_g1_query, params.b_g2_query,
            params.h_query, params.l_query, params.alpha_g1, params.beta_g1,
            params.beta_g2, params.delta_g1, params.delta_g2)


_PROVE_JIT_CACHE: dict = {}  # only value-hashable keys (e.g. FpParams)


def create_proof(engine: MNTPairing, params: Parameters,
                 compiled: CompiledR1CS, assignment, r: int, s: int,
                 d1: int = 0, d2: int = 0, d3: int = 0,
                 mesh=None) -> Proof:
    """assignment: full value list (python ints) or device Montgomery array
    [nvars, nd].  r, s: blinding scalars (ints; pinned for reproducibility).

    The entire device dataflow (witness map + 6 MSMs + assembly) is ONE
    jitted graph, cached per (engine, compiled, blinding?) — eager op-by-op
    dispatch is far too slow for graphs this deep.
    """
    g1, g2 = engine.g1, engine.g2
    fr = g1.scalar_field

    if isinstance(assignment, (list, tuple)):
        z = jnp.asarray(fpmod.fp_from_ints(fr, assignment))
    else:
        z = assignment

    blind = None
    if d1 or d2 or d3:
        blind = (jnp.asarray(fpmod.fp_from_int(fr, d1 % fr.modulus)),
                 jnp.asarray(fpmod.fp_from_int(fr, d2 % fr.modulus)),
                 jnp.asarray(fpmod.fp_from_int(
                     fr, (d3 + d1 * d2) % fr.modulus)))
    rd = jnp.asarray(limbs.to_digits_batch([r % fr.modulus], fr.n_digits))
    sd = jnp.asarray(limbs.to_digits_batch([s % fr.modulus], fr.n_digits))
    rs = r * s % fr.modulus
    rsd = jnp.asarray(limbs.to_digits_batch([rs], fr.n_digits))

    a, b, c = _create_proof_device(engine, compiled, _params_arrays(params),
                                   z, rd, sd, rsd, blind, mesh=mesh)
    return Proof(a=a, b=b, c=c)


def _jit_unit(owner, key, build):
    """Small cached jit units: compiling the prover as a handful of
    per-stage graphs (witness map, each MSM bucket, scalar muls, assembly)
    instead of one monolithic graph — identical stages dedupe in the
    persistent compile cache and XLA:CPU compile time stays bounded.

    The cache lives on `owner` (the object the closure was traced over —
    compiled circuit, curve, engine), so a collected owner takes its
    entries with it; a global id()-keyed dict could silently hand a new
    object at a recycled address another circuit's traced closure."""
    cache = owner.__dict__.setdefault("_jit_cache", {})
    fn = cache.get(key)
    if fn is None:
        fn = maybe_jit(build())
        cache[key] = fn
    return fn


def _vmsm_jit(curve, query, scalars):
    xs, ys, inf = query
    n = scalars.shape[0]
    key = ("vmsm", int(n), tuple(xs.shape))
    fn = _jit_unit(curve, key, lambda: lambda xs, ys, inf, sc:
                   msm_mod.msm_bucketed(curve, xs[:n], ys[:n], sc,
                                        inf_mask=inf[:n]))
    return fn(xs, ys, inf, scalars)


def _vmsm_sharded_jit(curve, mesh, query, scalars):
    """Mesh-sharded prover MSM: points+scalars split over the mesh's data
    axis, per-device Pippenger, all-gather + fold (parallel/sharded.py).
    The TPU analogue of the prover's rayon MSMs (prover.rs:248-322)."""
    from ..parallel import sharded

    xs, ys, inf = query
    n = scalars.shape[0]
    ndev = mesh.shape["data"]
    npad = -(-n // ndev) * ndev
    key = ("vmsm_mesh", int(n), tuple(xs.shape),
           tuple(d.id for d in mesh.devices.flat))

    def build():
        def run(xs, ys, inf, sc):
            xs_, ys_, inf_ = xs[:n], ys[:n], inf[:n]
            if npad != n:
                pad = npad - n
                # repeat arbitrary points, masked to infinity w/ scalar 0
                xs_ = jnp.concatenate([xs_, xs_[:pad]], axis=0)
                ys_ = jnp.concatenate([ys_, ys_[:pad]], axis=0)
                inf_ = jnp.concatenate(
                    [inf_, jnp.ones((pad,), bool)], axis=0)
                sc = jnp.concatenate(
                    [sc, jnp.zeros((pad,) + sc.shape[1:], sc.dtype)],
                    axis=0)
            return sharded.sharded_msm(curve, mesh, xs_, ys_, sc,
                                       inf_mask=inf_)
        return run

    return _jit_unit(curve, key, build)(xs, ys, inf, scalars)


def _smul_jit(curve, affine, kd):
    key = "smul"

    def build():
        def run(ax, ay, kd):
            pt = (ax[None], ay[None],
                  jnp.broadcast_to(jnp.asarray(curve.F.one()),
                                   ax[None].shape))
            out = curve.mul_scalar_digits(pt, kd)
            return tuple(c[0] for c in out)
        return run

    return _jit_unit(curve, key, build)(affine[0], affine[1], kd)


def _create_proof_device(engine, compiled, pa, z, rd, sd, rsd, blind,
                         mesh=None):
    """prover.rs:201-346 device dataflow (small cached jit units).

    mesh: optional jax.sharding.Mesh with a "data" axis — the 6 query MSMs
    then shard points over the mesh (multi-chip prover, bit-identical to
    the single-device path)."""
    g1, g2 = engine.g1, engine.g2
    fr = g1.scalar_field
    (a_query, b_g1_query, b_g2_query, h_query, l_query, alpha_g1, beta_g1,
     beta_g2, delta_g1, delta_g2) = pa
    ni = compiled.num_inputs

    mesh_key = None if mesh is None else tuple(
        d.id for d in mesh.devices.flat)
    wm = _jit_unit(compiled, ("wm", blind is not None, mesh_key),
                   lambda: lambda z, blind:
                   _witness_map_core(compiled, z, blind, mesh=mesh))
    h = wm(z, blind)

    # scalars to standard form for MSM (prover.rs:241-267); fr is a frozen
    # value-hashable FpParams, so the global dict is safe here
    fn = _PROVE_JIT_CACHE.get(("from_mont", fr))
    if fn is None:
        fn = maybe_jit(lambda x: fpmod.from_mont(fr, x))
        _PROVE_JIT_CACHE[("from_mont", fr)] = fn
    conv = fn
    z_std = conv(z)
    h_std = conv(h)
    aux_std = z_std[ni:]

    def vmsm(query, scalars):
        xs, ys, inf = query
        curve = g1 if xs.shape[-2] == g1.F.K else g2
        if mesh is not None:
            return _vmsm_sharded_jit(curve, mesh, query, scalars)
        return _vmsm_jit(curve, query, scalars)

    def smul(curve, affine, kd):
        return _smul_jit(curve, affine, kd)

    # g_a = alpha + Σ a_query·z + r·delta  (prover.rs:272-285)
    a_acc = vmsm(a_query, z_std)
    r_delta = smul(g1, delta_g1, rd)

    # g1_b = beta_g1 + Σ b_g1_query·z + s·delta_g1
    b1_acc = vmsm(b_g1_query, z_std)
    s_delta = smul(g1, delta_g1, sd)

    # g2_b = beta_g2 + Σ b_g2_query·z + s·delta_g2
    b2_acc = vmsm(b_g2_query, z_std)
    s_delta2 = smul(g2, delta_g2, sd)

    # g_c inputs
    l_acc = vmsm(l_query, aux_std)
    h_acc = vmsm(h_query, h_std)
    rs_delta = smul(g1, delta_g1, rsd)

    def build_assemble():
        def run(a_acc, r_delta, alpha_g1, b1_acc, s_delta, beta_g1,
                b2_acc, s_delta2, beta_g2, l_acc, h_acc, rs_delta, rd, sd):
            g_a = g1.add_mixed(g1.add(a_acc, r_delta), alpha_g1)
            g1_b = g1.add_mixed(g1.add(b1_acc, s_delta), beta_g1)
            g2_b = g2.add_mixed(g2.add(b2_acc, s_delta2), beta_g2)
            s_ga = g1.mul_scalar_digits(tuple(c[None] for c in g_a), sd)
            s_ga = tuple(c[0] for c in s_ga)
            r_g1b = g1.mul_scalar_digits(tuple(c[None] for c in g1_b), rd)
            r_g1b = tuple(c[0] for c in r_g1b)
            g_c = g1.add(s_ga, r_g1b)
            g_c = g1.add(g_c, g1.neg(rs_delta))
            g_c = g1.add(g_c, l_acc)
            g_c = g1.add(g_c, h_acc)
            return (g1.to_affine(g_a), g2.to_affine(g2_b),
                    g1.to_affine(g_c))
        return run

    asm = _jit_unit(engine, "asm", build_assemble)
    return asm(a_acc, r_delta, alpha_g1, b1_acc, s_delta, beta_g1,
               b2_acc, s_delta2, beta_g2, l_acc, h_acc, rs_delta, rd, sd)


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
    # input accumulation: batched double-and-add (depth-bound, the right
    # shape for the typical handful of public inputs) below 64 inputs,
    # the bucketed Pippenger path above (verifier.rs:27-30 is a naive
    # loop; batch-first here).  The crossover is work-, not depth-driven:
    # the batched scan's 753 double+add steps cost the same wall time for
    # 2 or 60 lanes, while Pippenger's fixed window/bucket overhead only
    # amortizes once the input count is large.
    if xs.shape[0] >= 64:
        gic_aff = _jit_unit(engine, ("gic_b", int(xs.shape[0])),
                            lambda: lambda xs, ys, sd: g1.to_affine(
                                msm_mod.msm_bucketed(g1, xs, ys, sd)))(
                                    xs, ys, sd)
    else:
        gic_aff = _jit_unit(engine, ("gic", int(xs.shape[0])),
                            lambda: lambda xs, ys, sd: g1.to_affine(
                                msm_mod.msm_naive(g1, xs, ys, sd)))(
                                    xs, ys, sd)

    neg_gamma = (vk.gamma_g2[0], g2.F.neg(vk.gamma_g2[1]))
    neg_delta = (vk.delta_g2[0], g2.F.neg(vk.delta_g2[1]))

    p_batch = (jnp.stack([proof.a[0], gic_aff[0], proof.c[0]]),
               jnp.stack([proof.a[1], gic_aff[1], proof.c[1]]))
    if hasattr(engine, "prepare_g2"):
        # fixed-G2 fast path (G2Prepared, mnt4/mod.rs:100-154): host
        # affine ladders once per verify, sparse device lines
        preps = [engine.prepare_g2((np.asarray(q[0]), np.asarray(q[1])))
                 for q in (proof.b, neg_gamma, neg_delta)]
        gt = engine.product_of_pairings_prepared(p_batch, preps)
    else:
        q_batch = (jnp.stack([proof.b[0], neg_gamma[0], neg_delta[0]]),
                   jnp.stack([proof.b[1], neg_gamma[1], neg_delta[1]]))
        gt = engine.product_of_pairings(p_batch, q_batch)
    return bool(np.asarray(jnp.all(gt == vk.alpha_g1_beta_g2)))
