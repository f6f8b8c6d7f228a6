"""Sharding tests on the 8-virtual-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gingerlib_tpu.parallel import make_mesh, sharded_msm, \
    sharded_poseidon_2_1
from gingerlib_tpu.primitives.poseidon import PoseidonParams, PoseidonHash
from gingerlib_tpu.fields import fp
from gingerlib_tpu.curves import instances as CI
from gingerlib_tpu.ops import limbs


def test_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_poseidon_matches_local():
    h = PoseidonHash(PoseidonParams.mnt4753())
    mesh = make_mesh(8)
    n = 16
    left = jnp.asarray(fp.fp_from_ints(h.F, list(range(1, n + 1))))
    right = jnp.asarray(fp.fp_from_ints(h.F, list(range(n + 1, 2 * n + 1))))
    sharded = jax.jit(lambda l, r: sharded_poseidon_2_1(h, mesh, l, r))(
        left, right)
    local = jax.jit(h.hash_2_1)(left, right)
    assert np.array_equal(np.asarray(sharded), np.asarray(local))


@pytest.mark.slow
def test_sharded_msm_matches_local():
    g1 = CI.bls12_377_g1()
    mesh = make_mesh(8)
    n = 16
    ks = list(range(3, 3 + n))
    kd = jnp.asarray(limbs.to_digits_batch(ks, g1.scalar_field.n_digits))
    pts = jax.jit(g1.mul_scalar_digits)(g1.generator((n,)), kd)
    xs, ys = jax.jit(g1.to_affine)(pts)
    sd = jnp.asarray(limbs.to_digits_batch(
        [9] * n, g1.scalar_field.n_digits))
    res = jax.jit(lambda xs, ys, sd: sharded_msm(
        g1, mesh, xs, ys, sd, c=4))(xs, ys, sd)
    total = 9 * sum(ks) % g1.scalar_field.modulus
    exp = jax.jit(lambda G: g1.mul_const(G, total))(g1.generator(()))
    assert bool(np.asarray(g1.eq(res, exp)))


def test_sharded_fft_matches_local():
    """Distributed two-step FFT == single-device Domain.fft (8-dev mesh)."""
    import random
    import numpy as np
    import jax
    import jax.numpy as jnp
    from gingerlib_tpu import params as PP
    from gingerlib_tpu.fields import fp as fpmod
    from gingerlib_tpu.ops.fft import Domain
    from gingerlib_tpu.parallel import make_mesh
    from gingerlib_tpu.parallel.sharded import sharded_fft, cyclic_layout

    P6 = PP.BLS12_377_FR
    mesh = make_mesh(8)
    m = 64
    dom = Domain(P6, m)
    rng = random.Random(77)
    xs = [rng.randrange(P6.modulus) for _ in range(m)]
    xd = jnp.asarray(fpmod.fp_from_ints(P6, xs))

    expect = np.asarray(jax.jit(dom.fft)(xd))
    got = np.asarray(sharded_fft(dom, mesh, cyclic_layout(xd, 8)))
    assert (got == expect).all()

    # inverse roundtrip: ifft(cyclic(fft(x))) == x
    back = np.asarray(sharded_fft(dom, mesh,
                                  cyclic_layout(jnp.asarray(got), 8),
                                  inverse=True))
    assert (back == np.asarray(xd)).all()


@pytest.mark.slow
def test_mesh_prover_bit_identical():
    """create_proof(mesh=8-device CPU mesh) == single-device proof
    (prover.rs:248-322 rayon analogue; VERDICT r2 item 9)."""
    from gingerlib_tpu.relations.r1cs import (
        ConstraintSystem, LinearCombination, compile_r1cs)
    from gingerlib_tpu.proofs import groth16

    eng = CI.mnt6298_pairing()
    fr = eng.g1.scalar_field
    cs = ConstraintSystem(fr)
    a = cs.alloc_input("a", 3)
    c = cs.alloc_input("c", 15)
    b = cs.alloc("b", 5)
    cs.enforce(LinearCombination.of(a), LinearCombination.of(b),
               LinearCombination.of(c), "a*b=c")
    compiled = compile_r1cs(cs)
    params = groth16.generate_parameters(eng, cs, alpha=12, beta=34,
                                         gamma=56, delta=78, t=91)
    p_local = groth16.create_proof(eng, params, compiled, cs.assignment(),
                                   r=3, s=7)
    mesh = make_mesh(8)
    p_mesh = groth16.create_proof(eng, params, compiled, cs.assignment(),
                                  r=3, s=7, mesh=mesh)
    for c_l, c_m in zip(p_local.a + p_local.b + p_local.c,
                        p_mesh.a + p_mesh.b + p_mesh.c):
        assert np.array_equal(np.asarray(c_l), np.asarray(c_m))


def test_distributed_single_process_noop():
    """Multi-host init path: single-process is a documented no-op and the
    global mesh spans all (virtual) devices."""
    from gingerlib_tpu.parallel import distributed
    assert distributed.init_from_env() is False
    assert distributed.init_distributed(num_processes=1) is False
    mesh = distributed.global_mesh()
    assert mesh.shape["data"] == len(jax.devices())
    idx, cnt = distributed.process_info()
    assert (idx, cnt) == (0, 1)
