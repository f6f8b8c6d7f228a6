"""FFT domain vs naive DFT oracle (reference: algebra/src/fft/domain.rs)."""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.fields import fp
from gingerlib_tpu.ops.fft import Domain

P = PP.BLS12_377_FR


@pytest.mark.parametrize("m", [1, 2, 4, 8, 32])
def test_fft_vs_naive_dft(m):
    p = P.modulus
    rng = random.Random(100 + m)
    dom = Domain(P, m)
    xs = [rng.randrange(p) for _ in range(m)]
    xd = jnp.asarray(fp.fp_from_ints(P, xs))
    got = fp.fp_to_ints(P, np.asarray(jax.jit(dom.fft)(xd)))
    w = dom.gen
    expect = [sum(xs[j] * pow(w, i * j, p) for j in range(m)) % p
              for i in range(m)]
    assert got == expect


def test_ifft_roundtrip():
    p = P.modulus
    rng = random.Random(11)
    dom = Domain(P, 64)
    xs = [rng.randrange(p) for _ in range(64)]
    xd = jnp.asarray(fp.fp_from_ints(P, xs))
    back = jax.jit(lambda x: dom.ifft(dom.fft(x)))(xd)
    assert fp.fp_to_ints(P, np.asarray(back)) == xs


@pytest.mark.slow
def test_coset_roundtrip_and_vanishing():
    p = P.modulus
    rng = random.Random(12)
    m = 16
    dom = Domain(P, m)
    xs = [rng.randrange(p) for _ in range(m)]
    xd = jnp.asarray(fp.fp_from_ints(P, xs))
    back = jax.jit(lambda x: dom.coset_ifft(dom.coset_fft(x)))(xd)
    assert fp.fp_to_ints(P, np.asarray(back)) == xs
    # (x^m - 1) * f interpolated on the coset, divided by Z, returns f evals
    # simpler check: Z(coset point) == z_coset for random j
    g = dom.coset_shift
    for j in (0, 3, m - 1):
        x = g * pow(dom.gen, j, p) % p
        assert (pow(x, m, p) - 1) % p == dom.z_coset


@pytest.mark.slow
def test_polynomial_multiplication_via_fft():
    """mul_polynomials_in_evaluation_domain (domain.rs:289) vs naive conv."""
    p = P.modulus
    rng = random.Random(13)
    da, db = 7, 6
    a = [rng.randrange(p) for _ in range(da + 1)]
    b = [rng.randrange(p) for _ in range(db + 1)]
    m = 16  # >= deg(a*b)+1
    dom = Domain(P, m)
    ad = jnp.asarray(fp.fp_from_ints(P, a + [0] * (m - len(a))))
    bd = jnp.asarray(fp.fp_from_ints(P, b + [0] * (m - len(b))))

    def polymul(x, y):
        ex, ey = dom.fft(x), dom.fft(y)
        return dom.ifft(dom.mul_in_evaluation_domain(ex, ey))

    got = fp.fp_to_ints(P, np.asarray(jax.jit(polymul)(ad, bd)))
    expect = [0] * m
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            expect[i + j] = (expect[i + j] + ai * bj) % p
    assert got == expect


@pytest.mark.slow
def test_lagrange_coefficients():
    p = P.modulus
    rng = random.Random(14)
    m = 16
    dom = Domain(P, m)
    xs = [rng.randrange(p) for _ in range(m)]
    xd = jnp.asarray(fp.fp_from_ints(P, xs))
    tau = rng.randrange(p)
    l = dom.evaluate_all_lagrange_coefficients(tau)
    evals = jax.jit(dom.fft)(xd)
    prod = fp.fp_to_ints(P, np.asarray(fp.mont_mul(P, l, evals)))
    tot = sum(prod) % p
    f_tau = sum(xs[j] * pow(tau, j, p) for j in range(m)) % p
    assert tot == f_tau


def test_lagrange_at_domain_point():
    m = 8
    dom = Domain(P, m)
    tau = pow(dom.gen, 3, P.modulus)
    l = fp.fp_to_ints(P, np.asarray(
        dom.evaluate_all_lagrange_coefficients(tau)))
    assert l == [0, 0, 0, 1, 0, 0, 0, 0]


def test_domain_too_large_rejected():
    with pytest.raises(ValueError):
        Domain(PP.MNT4753_FQ, 1 << 20)  # two-adicity 15


def test_mnt_cycle_two_adicity():
    # MNT4753 Fr domains up to 2^30; MNT6753 Fr domains up to 2^15
    assert Domain(PP.MNT4753_FR, 1 << 16).size == 1 << 16
    assert Domain(PP.MNT6753_FR, 1 << 15).size == 1 << 15


# ---------------------------------------------------------------------------
# mixed-radix extension (2^k · 5^s domains; SURVEY.md divergence #1)
# ---------------------------------------------------------------------------

from gingerlib_tpu.ops.fft import MixedRadixDomain, best_domain


@pytest.mark.parametrize("size", [5, 10, 20, 40])
@pytest.mark.slow
def test_mixed_radix_vs_naive_dft(size):
    P6 = PP.MNT6753_FR  # two-adicity 15, 5^2 | p-1: the field that needs this
    p = P6.modulus
    rng = random.Random(size)
    dom = MixedRadixDomain(P6, size)
    m = dom.size
    xs = [rng.randrange(p) for _ in range(m)]
    xd = jnp.asarray(fp.fp_from_ints(P6, xs))
    got = fp.fp_to_ints(P6, np.asarray(jax.jit(dom.fft)(xd)))
    w = dom.gen
    expect = [sum(xs[j] * pow(w, i * j, p) for j in range(m)) % p
              for i in range(m)]
    assert got == expect


@pytest.mark.slow
def test_mixed_radix_roundtrip_and_coset():
    P6 = PP.MNT6753_FR
    p = P6.modulus
    rng = random.Random(99)
    dom = MixedRadixDomain(P6, 20)
    m = dom.size
    xs = [rng.randrange(p) for _ in range(m)]
    xd = jnp.asarray(fp.fp_from_ints(P6, xs))
    back = jax.jit(lambda x: dom.ifft(dom.fft(x)))(xd)
    assert fp.fp_to_ints(P6, np.asarray(back)) == xs
    back2 = jax.jit(lambda x: dom.coset_ifft(dom.coset_fft(x)))(xd)
    assert fp.fp_to_ints(P6, np.asarray(back2)) == xs


@pytest.mark.slow
def test_mixed_radix_pow2_matches_radix2():
    """On a pow-2 size with the same generator the two cores agree."""
    rng = random.Random(5)
    p = P.modulus
    d2 = Domain(P, 16)
    dm = MixedRadixDomain(P, 16)
    dm.gen = d2.gen  # pin the same root of unity
    dm.__dict__.pop("_powers", None)
    xs = [rng.randrange(p) for _ in range(16)]
    xd = jnp.asarray(fp.fp_from_ints(P, xs))
    a = fp.fp_to_ints(P, np.asarray(jax.jit(d2.fft)(xd)))
    b = fp.fp_to_ints(P, np.asarray(jax.jit(dm.fft)(xd)))
    assert a == b


def test_best_domain_selection():
    P6 = PP.MNT6753_FR
    d = best_domain(P6, 1 << 10)
    assert isinstance(d, Domain)
    d = best_domain(P6, (1 << 15) + 1)  # exceeds two-adicity -> mixed
    assert isinstance(d, MixedRadixDomain)
    assert d.size >= (1 << 15) + 1
    assert d.size == (1 << 13) * 5  # 40960: smallest 2^k·5^s fit


@pytest.mark.slow
def test_fft_scan_matches_unrolled():
    """_fft_core_scan (single-scan compile-lean form, the TPU >=2^17
    dispatch) must be bit-identical to the unrolled _fft_core — including
    batched inputs."""
    import jax.numpy as jnp
    from gingerlib_tpu.ops.fft import Domain, _fft_core, _fft_core_scan, \
        _build_powers
    P = PP.BLS12_377_FR
    rng = np.random.RandomState(3)
    for m in (2, 8, 64):
        dom = Domain(P, m)
        xs = [int.from_bytes(rng.bytes(40), "little") % P.modulus
              for _ in range(m)]
        c = jnp.asarray(fp.fp_from_ints(P, xs))
        tw = jnp.asarray(_build_powers(P, dom.gen, m // 2))
        a = np.asarray(_fft_core(P, c, tw))
        b = np.asarray(_fft_core_scan(P, c, tw))
        assert np.array_equal(a, b), m
        cb = jnp.stack([c, c])
        assert np.array_equal(np.asarray(_fft_core(P, cb, tw)),
                              np.asarray(_fft_core_scan(P, cb, tw))), m


@pytest.mark.slow
def test_fft_4step_matches_unrolled():
    """_fft_core_4step (the large-size TPU dispatch) must return the
    identical field elements as the unrolled core, batched included."""
    import jax.numpy as jnp
    from gingerlib_tpu.ops.fft import Domain, _fft_core, _fft_core_4step, \
        _build_powers
    P = PP.BLS12_377_FR
    rng = np.random.RandomState(5)
    for m in (4, 8, 64, 128):
        dom = Domain(P, m)
        xs = [int.from_bytes(rng.bytes(40), "little") % P.modulus
              for _ in range(m)]
        c = jnp.asarray(fp.fp_from_ints(P, xs))
        tw = jnp.asarray(_build_powers(P, dom.gen, m // 2))
        a = np.asarray(_fft_core(P, c, tw))
        b = np.asarray(_fft_core_4step(P, c, tw))
        assert np.array_equal(a, b), m
        cb = jnp.stack([c, c])
        assert np.array_equal(np.asarray(_fft_core(P, cb, tw)),
                              np.asarray(_fft_core_4step(P, cb, tw))), m
