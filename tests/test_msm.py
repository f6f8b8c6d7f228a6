"""MSM vs naive oracle (msm/variable_base.rs:102-151 pattern)."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gingerlib_tpu.curves import instances as CI
from gingerlib_tpu.ops import msm as M, limbs


@pytest.fixture(scope="module")
def setup():
    g1 = CI.bls12_377_g1()
    r = g1.scalar_field.modulus
    rng = random.Random(77)
    N = 16
    ks = [rng.randrange(1, 1000) for _ in range(N)]
    kd = jnp.asarray(limbs.to_digits_batch(ks, g1.scalar_field.n_digits))
    G = g1.generator((N,))
    pts = jax.jit(g1.mul_scalar_digits)(G, kd)
    xs, ys = jax.jit(g1.to_affine)(pts)
    scalars = [rng.randrange(r) for _ in range(N)]
    sd = jnp.asarray(limbs.to_digits_batch(scalars, g1.scalar_field.n_digits))
    expect_scalar = sum(k * s for k, s in zip(ks, scalars)) % r
    return g1, xs, ys, sd, expect_scalar


def test_msm_matches_expected(setup):
    g1, xs, ys, sd, expect_scalar = setup
    res = jax.jit(lambda xs, ys, sd: M.msm(g1, xs, ys, sd, c=4))(xs, ys, sd)
    exp = jax.jit(lambda G: g1.mul_const(G, expect_scalar))(g1.generator(()))
    assert bool(np.asarray(g1.eq(res, exp)))


def test_msm_other_window(setup):
    g1, xs, ys, sd, expect_scalar = setup
    res = jax.jit(lambda xs, ys, sd: M.msm(g1, xs, ys, sd, c=7))(xs, ys, sd)
    exp = jax.jit(lambda G: g1.mul_const(G, expect_scalar))(g1.generator(()))
    assert bool(np.asarray(g1.eq(res, exp)))


def test_msm_with_zero_scalars_and_inf(setup):
    g1, xs, ys, sd, _ = setup
    r = g1.scalar_field
    N = xs.shape[0]
    scalars = [0] * N
    scalars[3] = 11
    sd0 = jnp.asarray(limbs.to_digits_batch(scalars, r.n_digits))
    inf = np.zeros(N, bool)
    inf[5] = True  # masked point must not contribute
    res = jax.jit(lambda xs, ys, sd: M.msm(
        g1, xs, ys, sd, c=4, inf_mask=jnp.asarray(inf)))(xs, ys, sd0)
    pt = (xs[3], ys[3], jnp.broadcast_to(jnp.asarray(g1.F.one()),
                                         xs[3].shape))
    exp = jax.jit(lambda p: g1.mul_const(p, 11))(pt)
    assert bool(np.asarray(g1.eq(res, exp)))


def test_window_digit_extraction():
    from gingerlib_tpu.ops.msm import _window_digits
    val = 0xDEADBEEF_12345678_9ABCDEF0
    digits = jnp.asarray(limbs.to_digits_batch([val], 16))
    for c in (4, 7, 13, 16):
        w = np.asarray(_window_digits(digits, c, 256))
        got = 0
        for i in range(w.shape[0] - 1, -1, -1):
            got = (got << c) | int(w[i, 0])
        assert got == val, c
