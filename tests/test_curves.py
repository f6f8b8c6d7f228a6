"""Curve group laws vs python-int oracle; generators & orders vs reference.

Mirrors curve_tests/group_test (algebra/src/curves/tests.rs:224,
groups/tests.rs:5) in batched form.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gingerlib_tpu.curves import instances as CI
from gingerlib_tpu.ops import limbs

# slow: >420 s (not-slow subset) on this 1-core box, round-5 measurement
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def g1():
    return CI.bls12_377_g1()  # smallest field: fast on CPU


def test_group_laws(g1):
    G = g1.generator((2,))

    @jax.jit
    def laws(G):
        G2 = g1.double(G)
        G3a = g1.add(G2, G)
        G3b = g1.add(G, g1.add(G, G))
        Z = g1.add(G, g1.neg(G))
        ok_assoc = g1.eq(G3a, G3b)
        ok_zero = g1.is_zero(Z)
        ok_id = g1.eq(g1.add(G, g1.zero((2,))), G)
        ok_comm = g1.eq(g1.add(G2, G), g1.add(G, G2))
        return ok_assoc & ok_zero & ok_id & ok_comm

    assert np.asarray(laws(G)).all()


def test_double_vs_add_self(g1):
    G = g1.generator((1,))

    @jax.jit
    def f(G):
        return g1.eq(g1.double(G), g1.add(G, G))

    assert np.asarray(f(G)).all()


def test_affine_on_curve(g1):
    G = g1.generator((1,))

    @jax.jit
    def f(G):
        G5 = g1.add(g1.double(g1.double(G)), G)
        x, y = g1.to_affine(G5)
        return g1.on_curve(x, y)

    assert np.asarray(f(G)).all()


def test_scalar_mul_matches_oracle(g1):
    G = g1.generator((1,))
    k = 0xDEADBEEF12345

    @jax.jit
    def f(G):
        return g1.mul_const(G, k)

    Pk = f(G)
    # oracle: binary double-and-add with jitted primitives
    dbl = jax.jit(g1.double)
    add = jax.jit(g1.add)
    acc = g1.zero((1,))
    for bit in bin(k)[2:]:
        acc = dbl(acc)
        if bit == "1":
            acc = add(acc, G)
    assert np.asarray(jax.jit(g1.eq)(Pk, acc)).all()


def test_mul_scalar_digits(g1):
    G = g1.generator((2,))
    ks = [12345, 99999999999]
    kd = jnp.asarray(limbs.to_digits_batch(ks, g1.scalar_field.n_digits))
    got = jax.jit(g1.mul_scalar_digits)(G, kd)
    e0 = jax.jit(lambda G: g1.mul_const(G, ks[0]))(g1.generator((1,)))
    e1 = jax.jit(lambda G: g1.mul_const(G, ks[1]))(g1.generator((1,)))
    sel = lambda P, i: tuple(c[i:i+1] for c in P)
    assert np.asarray(g1.eq(sel(got, 0), e0)).all()
    assert np.asarray(g1.eq(sel(got, 1), e1)).all()


@pytest.mark.slow
def test_generator_order(g1):
    """[r]G == 0 (subgroup order check)."""
    G = g1.generator((1,))
    r = g1.scalar_field.modulus
    Z = jax.jit(lambda G: g1.mul_const(G, r))(G)
    assert np.asarray(g1.is_zero(Z)).all()


@pytest.mark.slow
@pytest.mark.parametrize("curve", [
    "mnt4753_g1", "mnt4753_g2", "mnt6753_g1", "mnt6753_g2",
    "bls12_377_g2", "bls12_381_g1", "sw6_g1", "mnt6298_g1",
])
def test_all_curves_basic(curve):
    ops = getattr(CI, curve)()
    G = ops.generator((1,))

    @jax.jit
    def f(G):
        G3 = ops.add(ops.double(G), G)
        x, y = ops.to_affine(G3)
        on = ops.on_curve(x, y)
        z = ops.is_zero(ops.add(G3, ops.neg(G3)))
        return on & z

    assert np.asarray(f(G)).all()


def test_add_mixed(g1):
    G = g1.generator((1,))

    @jax.jit
    def f(G):
        G2 = g1.double(G)
        gx, gy = g1.generator_affine
        shape = G[0].shape
        xy = (jnp.broadcast_to(gx, shape), jnp.broadcast_to(gy, shape))
        mixed = g1.add_mixed(G2, xy)
        full = g1.add(G2, G)
        return g1.eq(mixed, full)

    assert np.asarray(f(G)).all()


def test_add_mixed_edge_cases(g1):
    G = g1.generator((1,))
    gx, gy = g1.generator_affine

    @jax.jit
    def f(G):
        shape = G[0].shape
        xy = (jnp.broadcast_to(gx, shape), jnp.broadcast_to(gy, shape))
        # P == affine point -> double
        same = g1.add_mixed(G, xy)
        ok1 = g1.eq(same, g1.double(G))
        # P == -affine -> zero
        zero = g1.add_mixed(g1.neg(G), xy)
        ok2 = g1.is_zero(zero)
        # P == infinity -> affine point
        inf = g1.add_mixed(g1.zero((1,)), xy)
        ok3 = g1.eq(inf, G)
        return ok1 & ok2 & ok3

    assert np.asarray(f(G)).all()
