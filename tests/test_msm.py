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


@pytest.mark.slow
def test_msm_affine_matches_projective(setup):
    g1, xs, ys, sd, expect_scalar = setup
    res = jax.jit(lambda xs, ys, sd: M.msm_affine(g1, xs, ys, sd, c=4))(
        xs, ys, sd)
    exp = jax.jit(lambda G: g1.mul_const(G, expect_scalar))(g1.generator(()))
    assert bool(np.asarray(g1.eq(res, exp)))


@pytest.mark.slow
def test_msm_affine_edge_cases(setup):
    """zero scalars, inf-masked points, duplicate points (forces doubling
    lanes in the affine tree), non-pow2 N."""
    g1, xs, ys, _, _ = setup
    r = g1.scalar_field
    N = xs.shape[0]
    # duplicate point 0 into slots 0..2 with equal digits -> same bucket
    xs = jnp.concatenate([xs[:1], xs[:1], xs], axis=0)[: N + 1]  # N+1 (odd)
    ys = jnp.concatenate([ys[:1], ys[:1], ys], axis=0)[: N + 1]
    scalars = [0] * (N + 1)
    scalars[0] = 5
    scalars[1] = 5
    scalars[4] = 9
    sd0 = jnp.asarray(limbs.to_digits_batch(scalars, r.n_digits))
    inf = np.zeros(N + 1, bool)
    inf[5] = True
    res = jax.jit(lambda xs, ys, sd: M.msm_affine(
        g1, xs, ys, sd, c=4, inf_mask=jnp.asarray(inf)))(xs, ys, sd0)
    exp = jax.jit(lambda xs, ys, sd: M.msm_naive(
        g1, xs, ys, sd, inf_mask=jnp.asarray(inf)))(xs, ys, sd0)
    assert bool(np.asarray(g1.eq(res, exp)))


@pytest.mark.slow
def test_msm_affine_g2(setup):
    """affine path over an extension-field curve (G2/Fq2): exercises the
    generic tower batch inversion."""
    g2 = CI.bls12_377_g2()
    r = g2.scalar_field
    rng = random.Random(99)
    N = 8
    ks = [rng.randrange(1, 500) for _ in range(N)]
    kd = jnp.asarray(limbs.to_digits_batch(ks, r.n_digits))
    G = g2.generator((N,))
    pts = jax.jit(g2.mul_scalar_digits)(G, kd)
    xs, ys = jax.jit(g2.to_affine)(pts)
    scalars = [rng.randrange(1 << 40) for _ in range(N)]
    sd = jnp.asarray(limbs.to_digits_batch(scalars, r.n_digits))
    res = jax.jit(lambda xs, ys, sd: M.msm_affine(g2, xs, ys, sd, c=5))(
        xs, ys, sd)
    exp_k = sum(k * s for k, s in zip(ks, scalars)) % r.modulus
    exp = jax.jit(lambda G: g2.mul_const(G, exp_k))(g2.generator(()))
    assert bool(np.asarray(g2.eq(res, exp)))


@pytest.mark.slow
def test_batch_affine_add_vs_projective():
    g1 = CI.bls12_377_g1()
    rng = random.Random(5)
    ks = [3, 7, 7, 1, 2, 9, 4, 8]
    N = len(ks)
    kd = jnp.asarray(limbs.to_digits_batch(ks, g1.scalar_field.n_digits))
    pts = jax.jit(g1.mul_scalar_digits)(g1.generator((N,)), kd)
    xs, ys = jax.jit(g1.to_affine)(pts)
    # pairs: (3,7) normal, (7,1) normal, (2,-2) anti, (9, inf)
    ax = jnp.stack([xs[0], xs[1], xs[4], xs[5]])
    ay = jnp.stack([ys[0], ys[1], ys[4], ys[5]])
    bx = jnp.stack([xs[2], xs[3], xs[4], jnp.zeros_like(xs[0])])
    by = jnp.stack([ys[2], ys[3], jnp.asarray(g1.F.neg(ys[4])),
                    jnp.zeros_like(ys[0])])
    a_inf = jnp.asarray([False, False, False, False])
    b_inf = jnp.asarray([False, False, False, True])
    (ox, oy), oinf = jax.jit(g1.batch_affine_add)(((ax, ay), a_inf),
                                                  ((bx, by), b_inf))
    # expected via projective adds: 3+7=10, 7+1=8 (but pair1 is (7,7): dbl!)
    exp_ks = [10, 8, 0, 9]
    for i, ek in enumerate(exp_ks):
        if ek == 0:
            assert bool(np.asarray(oinf[i]))
            continue
        exp = jax.jit(lambda G: g1.mul_const(G, ek))(g1.generator(()))
        ex, ey = jax.jit(g1.to_affine)(exp)
        assert not bool(np.asarray(oinf[i]))
        assert np.array_equal(np.asarray(ox[i]), np.asarray(ex))
        assert np.array_equal(np.asarray(oy[i]), np.asarray(ey))


@pytest.mark.slow
def test_batch_affine_add_doubling():
    g1 = CI.bls12_377_g1()
    G = g1.generator((3,))
    xs, ys = jax.jit(g1.to_affine)(G)
    inf = jnp.zeros((3,), bool)
    (ox, oy), oinf = jax.jit(g1.batch_affine_add)(((xs, ys), inf),
                                                  ((xs, ys), inf))
    exp = jax.jit(lambda G: g1.mul_const(G, 2))(g1.generator(()))
    ex, ey = jax.jit(g1.to_affine)(exp)
    for i in range(3):
        assert np.array_equal(np.asarray(ox[i]), np.asarray(ex))
        assert np.array_equal(np.asarray(oy[i]), np.asarray(ey))


@pytest.mark.slow
def test_fixed_base_windowed(setup):
    g1, _, _, _, _ = setup
    r = g1.scalar_field
    rng = random.Random(123)
    table = jax.jit(lambda: M.fixed_base_table(
        g1, g1.generator_affine, w=4, nbits=r.modulus_bits))()
    ks = [rng.randrange(r.modulus) for _ in range(8)] + [0, 1]
    kd = jnp.asarray(limbs.to_digits_batch(ks, r.n_digits))
    (ox, oy), oinf = jax.jit(lambda kd: M.fixed_base_msm_windowed(
        g1, table, kd, w=4, nbits=r.modulus_bits))(kd)
    exp = jax.jit(lambda kd: M.fixed_base_msm(
        g1, g1.generator_affine, kd))(kd)
    ex, ey = jax.jit(g1.to_affine)(exp)
    for i, k in enumerate(ks):
        if k == 0:
            assert bool(np.asarray(oinf[i]))
            continue
        assert not bool(np.asarray(oinf[i])), i
        assert np.array_equal(np.asarray(ox[i]), np.asarray(ex[i])), i
        assert np.array_equal(np.asarray(oy[i]), np.asarray(ey[i])), i


@pytest.mark.slow
@pytest.mark.parametrize("cutoff", [1 << 15, 4])
def test_msm_hybrid_matches_naive(setup, cutoff):
    """digit-major hybrid Pippenger (the TPU prover path) vs the naive
    oracle — all-projective (big cutoff) and affine-tree (tiny cutoff)
    variants, incl. zero scalars, inf mask and duplicate points.

    slow: Pallas interpret mode on XLA:CPU; the production-path check is
    benchmarks/hybrid_check.py on the real chip."""
    g1, xs, ys, _, _ = setup
    r = g1.scalar_field
    rng = random.Random(31)
    N = xs.shape[0]
    xs2 = jnp.concatenate([xs[:1], xs], axis=0)[: N]  # dup point -> dbl lane
    ys2 = jnp.concatenate([ys[:1], ys], axis=0)[: N]
    scalars = [rng.randrange(1 << 12) for _ in range(N)]
    scalars[2] = 0
    scalars[0] = scalars[1]  # same bucket for the duplicated point
    sd = jnp.asarray(limbs.to_digits_batch(scalars, r.n_digits))
    inf = np.zeros(N, bool)
    inf[5] = True
    res = jax.jit(lambda xs, ys, sd: M.msm_hybrid(
        g1, xs, ys, sd, c=3, nbits=12, inf_mask=jnp.asarray(inf),
        window_chunk=2, affine_cutoff=cutoff))(xs2, ys2, sd)
    exp = jax.jit(lambda xs, ys, sd: M.msm_naive(
        g1, xs, ys, sd, inf_mask=jnp.asarray(inf)))(xs2, ys2, sd)
    assert bool(np.asarray(g1.eq(res, exp)))


@pytest.mark.slow
def test_fixed_base_table_scan_matches_levels():
    """fixed_base_table_scan (compile-lean scan build, the TPU setup
    path) must produce the identical table to the level-doubling
    fixed_base_table — mnt6298 G1, w=3, nbits=8 (3 windows x 8 entries)."""
    from gingerlib_tpu.curves import instances as CI
    g1 = CI.mnt6298_g1()
    base = g1.generator_affine
    t_lvl, i_lvl = M.fixed_base_table(g1, base, w=3, nbits=8)
    t_scn, i_scn = M.fixed_base_table_scan(g1, base, w=3, nbits=8)
    assert np.array_equal(np.asarray(i_lvl), np.asarray(i_scn))
    inf = np.asarray(i_lvl)[..., None, None]
    for a, b in zip(t_lvl, t_scn):
        a = np.where(inf, 0, np.asarray(a))   # zero entries are masked
        b = np.where(inf, 0, np.asarray(b))
        assert np.array_equal(a, b)
