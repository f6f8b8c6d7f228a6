"""Fused batched-affine EC add kernels (ops/pallas_ec.py) vs the XLA
batch_affine_add path, interpret mode on CPU — covering the normal-add,
doubling, anti (P + (-P)) and infinity lanes branch-free cases."""

import numpy as np
import jax.numpy as jnp
import pytest

from gingerlib_tpu.curves import instances as CI
from gingerlib_tpu.ops import limbs, pallas_ec

# slow: Pallas interpret-mode EC kernels (>420 s measured round 5)
pytestmark = pytest.mark.slow


def _curve():
    return CI.mnt4753_g1()


def _rand_points(curve, n, seed):
    """n affine points as [k]G for small random k >= 1."""
    fr = curve.scalar_field
    rng = np.random.RandomState(seed)
    ks = [int(k) for k in rng.randint(1, 1 << 20, size=n)]
    kd = jnp.asarray(limbs.to_digits_batch(ks, fr.n_digits))
    gx, gy = curve.generator_affine
    shape = (n,) + gx.shape[-2:]
    pt = (jnp.broadcast_to(gx, shape), jnp.broadcast_to(gy, shape),
          jnp.broadcast_to(jnp.asarray(curve.F.one()), shape))
    prod = curve.mul_scalar_digits(pt, kd)
    xs, ys = curve.to_affine(prod)
    return xs, ys


def _assert_same(curve, got, want):
    (gx, gy), ginf = got
    (wx, wy), winf = want
    np.testing.assert_array_equal(np.asarray(ginf), np.asarray(winf))
    live = ~np.asarray(winf)
    np.testing.assert_array_equal(np.asarray(gx)[live],
                                  np.asarray(wx)[live])
    np.testing.assert_array_equal(np.asarray(gy)[live],
                                  np.asarray(wy)[live])


def test_fused_add_matches_xla_path():
    curve = _curve()
    n = 16
    xs, ys = _rand_points(curve, 2 * n, seed=7)
    a = ((xs[:n], ys[:n]), jnp.zeros((n,), bool))
    b = ((xs[n:], ys[n:]), jnp.zeros((n,), bool))

    # mix in special lanes: doubling (b == a), anti (b == -a), inf on
    # either side, inf + inf
    bx = b[0][0].at[0].set(a[0][0][0])
    by = b[0][1].at[0].set(a[0][1][0])          # lane 0: doubling
    bx = bx.at[1].set(a[0][0][1])
    by = by.at[1].set(curve.F.neg(a[0][1][1]))  # lane 1: P + (-P)
    binf = jnp.zeros((n,), bool).at[2].set(True)   # lane 2: a + inf
    ainf = jnp.zeros((n,), bool).at[3].set(True)   # lane 3: inf + b
    ainf = ainf.at[4].set(True)
    binf = binf.at[4].set(True)                    # lane 4: inf + inf
    a = ((a[0][0], a[0][1]), ainf)
    b = ((bx, by), binf)

    want = curve.batch_affine_add(a, b)
    got = pallas_ec.batch_affine_add_fused(curve, a, b, interpret=True)
    _assert_same(curve, got, want)


def test_fused_add_nonpow2_batch():
    curve = _curve()
    n = 5
    xs, ys = _rand_points(curve, 2 * n, seed=11)
    a = ((xs[:n], ys[:n]), jnp.zeros((n,), bool))
    b = ((xs[n:], ys[n:]), jnp.zeros((n,), bool))
    want = curve.batch_affine_add(a, b)
    got = pallas_ec.batch_affine_add_fused(curve, a, b, interpret=True)
    _assert_same(curve, got, want)


def test_fused_add_order2_doubling():
    """Doubling a point with y = 0 (order 2) must give infinity.  MNT4-753
    G1 has cofactor 1 (no real order-2 point), so fabricate coordinates
    with y = 0 — the kernel only looks at x/y/inf lanewise."""
    curve = _curve()
    n = 2
    xs, ys = _rand_points(curve, n, seed=13)
    x0 = xs.at[0, :, :].set(jnp.asarray(curve.F.const([5]))[0])
    y0 = ys.at[0, :, :].set(0)
    a = ((x0, y0), jnp.zeros((n,), bool))
    want = curve.batch_affine_add(a, a)
    got = pallas_ec.batch_affine_add_fused(curve, a, a, interpret=True)
    _assert_same(curve, got, want)
    assert bool(np.asarray(got[1])[0])
