"""RNS-hybrid fused EC add (ops/pallas_ec_rns.py) vs the XLA
batch_affine_add path, interpret mode on CPU — normal/doubling/anti/
infinity lanes, plus a chained-adds sanity walk (outputs feed back in)."""

import numpy as np
import jax.numpy as jnp

from gingerlib_tpu.curves import instances as CI
from gingerlib_tpu.ops import limbs, pallas_ec_rns

# slow: >420 s (not-slow subset) on this 1-core box, round-5 measurement
import pytest

pytestmark = pytest.mark.slow


def _curve():
    return CI.mnt4753_g1()


def _rand_points(curve, n, seed):
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


def _assert_same(got, want):
    (gx, gy), ginf = got
    (wx, wy), winf = want
    np.testing.assert_array_equal(np.asarray(ginf), np.asarray(winf))
    live = ~np.asarray(winf)
    np.testing.assert_array_equal(np.asarray(gx)[live],
                                  np.asarray(wx)[live])
    np.testing.assert_array_equal(np.asarray(gy)[live],
                                  np.asarray(wy)[live])


def test_rns_add_matches_xla_path():
    curve = _curve()
    n = 16
    xs, ys = _rand_points(curve, 2 * n, seed=7)
    a = ((xs[:n], ys[:n]), jnp.zeros((n,), bool))
    b = ((xs[n:], ys[n:]), jnp.zeros((n,), bool))

    bx = b[0][0].at[0].set(a[0][0][0])
    by = b[0][1].at[0].set(a[0][1][0])          # lane 0: doubling
    bx = bx.at[1].set(a[0][0][1])
    by = by.at[1].set(curve.F.neg(a[0][1][1]))  # lane 1: P + (-P)
    binf = jnp.zeros((n,), bool).at[2].set(True)
    ainf = jnp.zeros((n,), bool).at[3].set(True)
    ainf = ainf.at[4].set(True)
    binf = binf.at[4].set(True)
    a = ((a[0][0], a[0][1]), ainf)
    b = ((bx, by), binf)

    want = curve.batch_affine_add(a, b)
    got = pallas_ec_rns.batch_affine_add_rns(curve, a, b, interpret=True)
    _assert_same(got, want)


def test_rns_add_chained():
    """Outputs (canonicalized positional Montgomery) must be valid
    inputs: fold 8 points down to 1 through repeated fused adds and
    compare with the XLA fold."""
    curve = _curve()
    xs, ys = _rand_points(curve, 8, seed=9)
    cur_r = ((xs, ys), jnp.zeros((8,), bool))
    cur_x = ((xs, ys), jnp.zeros((8,), bool))
    while cur_r[0][0].shape[0] > 1:
        ar = ((cur_r[0][0][0::2], cur_r[0][1][0::2]), cur_r[1][0::2])
        br = ((cur_r[0][0][1::2], cur_r[0][1][1::2]), cur_r[1][1::2])
        cur_r = pallas_ec_rns.batch_affine_add_rns(curve, ar, br,
                                                   interpret=True)
        ax = ((cur_x[0][0][0::2], cur_x[0][1][0::2]), cur_x[1][0::2])
        bx = ((cur_x[0][0][1::2], cur_x[0][1][1::2]), cur_x[1][1::2])
        cur_x = curve.batch_affine_add(ax, bx)
    _assert_same(cur_r, cur_x)
