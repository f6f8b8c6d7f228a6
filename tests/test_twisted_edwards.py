"""Twisted Edwards curves (Jubjub, Edwards-BLS12, Edwards-SW6).

Mirrors curve_tests/montgomery_conversion_test for TE curves
(algebra/src/curves/{jubjub,edwards_bls12,edwards_sw6}/tests.rs) in batched
form: group laws with complete formulas, generator on curve, subgroup order,
and a scalar-mul vs python-int-oracle check.
"""

import numpy as np
import jax
import pytest

from gingerlib_tpu.curves import instances as CI

# slow: >420 s (not-slow subset) on this 1-core box, round-5 measurement; TE coverage stays fast via schnorr/vrf tests
pytestmark = pytest.mark.slow


CURVES = ["jubjub", "edwards_bls12", "edwards_sw6"]


@pytest.fixture(scope="module", params=CURVES)
def te(request):
    return getattr(CI, request.param)()


def test_generator_on_curve(te):
    gx, gy = te.generator_affine
    assert np.asarray(jax.jit(te.on_curve)(gx, gy)).all()


def test_group_laws(te):
    G = te.generator((2,))

    @jax.jit
    def laws(G):
        G2 = te.double(G)
        ok_dbl = te.eq(G2, te.add(G, G))
        G3a = te.add(G2, G)
        G3b = te.add(G, G2)
        ok_assoc = te.eq(G3a, G3b)
        ok_zero = te.is_zero(te.add(G, te.neg(G)))
        ok_id = te.eq(te.add(G, te.zero((2,))), G)
        return ok_dbl & ok_assoc & ok_zero & ok_id

    assert np.asarray(laws(G)).all()


def test_subgroup_order(te):
    """[r]G = 0 (prime-order subgroup; generator already cofactor-cleared)."""
    r = te.scalar_field.modulus
    G = te.generator(())
    res = jax.jit(lambda G: te.mul_const(G, r))(G)
    assert np.asarray(te.is_zero(res)).all()


def test_mul_small_scalars(te):
    """[k]G matches repeated addition for small k."""
    G = te.generator(())

    @jax.jit
    def f(G):
        k7 = te.mul_const(G, 7)
        acc = te.zero(())
        for _ in range(7):
            acc = te.add(acc, G)
        return te.eq(k7, acc)

    assert np.asarray(f(G)).all()


def test_montgomery_params_consistent(te):
    """TE <-> Montgomery curve relation: A = 2(a+d)/(a-d), B = 4/(a-d)
    (models/mod.rs:104; montgomery_conversion_test in curve tests)."""
    p = te.fp.modulus
    a, d = te.a_host, te.d_host
    inv_ad = pow((a - d) % p, -1, p)
    assert te.mont_a == 2 * (a + d) * inv_ad % p
    assert te.mont_b == 4 * inv_ad % p
