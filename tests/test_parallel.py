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
