"""Limb engine vs python-int golden model (reference: algebra/src/biginteger)."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gingerlib_tpu.ops import limbs

N = 48  # 768-bit width
MOD = 1 << (16 * N)


@pytest.fixture(scope="module")
def rng():
    return random.Random(1231275789)


def test_roundtrip(rng):
    xs = [rng.randrange(MOD) for _ in range(20)] + [0, 1, MOD - 1]
    d = limbs.to_digits_batch(xs, N)
    assert limbs.from_digits_batch(d) == xs


def test_add_sub(rng):
    xs = [rng.randrange(MOD) for _ in range(32)]
    ys = [rng.randrange(MOD) for _ in range(32)]
    a = jnp.asarray(limbs.to_digits_batch(xs, N))
    b = jnp.asarray(limbs.to_digits_batch(ys, N))
    s = jax.jit(limbs.add)(a, b)
    assert limbs.from_digits_batch(np.asarray(s)) == [
        (x + y) % MOD for x, y in zip(xs, ys)]
    d, borrow = jax.jit(limbs.sub_with_borrow)(a, b)
    assert limbs.from_digits_batch(np.asarray(d)) == [
        (x - y) % MOD for x, y in zip(xs, ys)]
    assert list(np.asarray(borrow)) == [1 if y > x else 0
                                        for x, y in zip(xs, ys)]


def test_carry_chains():
    # worst-case ripple: 0xffff.. + 1
    xs = [MOD - 1, (1 << 400) - 1, 0]
    ys = [1, 1, 0]
    a = jnp.asarray(limbs.to_digits_batch(xs, N))
    b = jnp.asarray(limbs.to_digits_batch(ys, N))
    s = jax.jit(limbs.add)(a, b)
    assert limbs.from_digits_batch(np.asarray(s)) == [
        (x + y) % MOD for x, y in zip(xs, ys)]


def test_mul_wide(rng):
    xs = [rng.randrange(MOD) for _ in range(16)] + [0, 1, MOD - 1]
    ys = [rng.randrange(MOD) for _ in range(16)] + [MOD - 1, MOD - 1, MOD - 1]
    a = jnp.asarray(limbs.to_digits_batch(xs, N))
    b = jnp.asarray(limbs.to_digits_batch(ys, N))
    w = jax.jit(limbs.mul_wide)(a, b)
    assert w.shape[-1] == 2 * N
    assert limbs.from_digits_batch(np.asarray(w)) == [
        x * y for x, y in zip(xs, ys)]


def test_mul_lo(rng):
    xs = [rng.randrange(MOD) for _ in range(8)]
    ys = [rng.randrange(MOD) for _ in range(8)]
    a = jnp.asarray(limbs.to_digits_batch(xs, N))
    b = jnp.asarray(limbs.to_digits_batch(ys, N))
    w = jax.jit(lambda a, b: limbs.mul_lo(a, b, N))(a, b)
    assert limbs.from_digits_batch(np.asarray(w)) == [
        (x * y) % MOD for x, y in zip(xs, ys)]


def test_geq_eq(rng):
    xs = [5, 7, 7, MOD - 1]
    ys = [7, 5, 7, 0]
    a = jnp.asarray(limbs.to_digits_batch(xs, N))
    b = jnp.asarray(limbs.to_digits_batch(ys, N))
    assert list(np.asarray(limbs.geq(a, b))) == [False, True, True, True]
    assert list(np.asarray(limbs.eq(a, b))) == [False, False, True, False]
    assert list(np.asarray(limbs.is_zero(b))) == [False, False, False, True]


def test_get_bit():
    x = (1 << 500) | (1 << 16) | 1
    a = jnp.asarray(limbs.to_digits_batch([x], N))
    for i in (0, 1, 16, 500, 501):
        expect = (x >> i) & 1
        assert int(limbs.get_bit(a, i)[0]) == expect
