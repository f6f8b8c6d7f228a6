"""Extension towers: frobenius tables vs reference, arithmetic vs oracles.

Covers algebra/src/fields/models/fp{2,3,4,6,12}*.rs behavior.
"""

import numpy as np
import jax
import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.fields import host_ext, towers as T
from gingerlib_tpu.params._gen import towers_gen as TG

from helpers import ext_rand, ext_to_host


@pytest.fixture(scope="module")
def bls_towers():
    return T.build_bls12_towers(PP.BLS12_377_FQ, TG.BLS12_377_FQ2["nonresidue"],
                                TG.BLS12_377_FQ6["nonresidue"])


@pytest.fixture(scope="module")
def mnt4_towers():
    return T.build_mnt4_towers(PP.MNT4753_FQ, TG.MNT4753_FQ2["nonresidue"])


@pytest.fixture(scope="module")
def mnt6_towers():
    return T.build_mnt6_towers(PP.MNT6753_FQ, TG.MNT6753_FQ3["nonresidue"])


def test_frobenius_tables_match_reference():
    p4 = PP.MNT4753_FQ.modulus
    assert host_ext.frob_table_fp2(p4, TG.MNT4753_FQ2["nonresidue"]) == \
        TG.MNT4753_FQ2["frobenius_coeff_fp2_c1"]
    assert host_ext.frob_table_fp4(p4, TG.MNT4753_FQ2["nonresidue"]) == \
        TG.MNT4753_FQ4["frobenius_coeff_fp4_c1"]
    p6 = PP.MNT6753_FQ.modulus
    nr3 = TG.MNT6753_FQ3["nonresidue"]
    c1, c2 = host_ext.frob_table_fp3(p6, nr3)
    assert c1 == TG.MNT6753_FQ3["frobenius_coeff_fp3_c1"]
    assert c2 == TG.MNT6753_FQ3["frobenius_coeff_fp3_c2"]
    assert host_ext.frob_table_fp6_2over3(p6, nr3) == \
        TG.MNT6753_FQ6["frobenius_coeff_fp6_c1"]
    pb = PP.BLS12_377_FQ.modulus
    nr2, xi = TG.BLS12_377_FQ2["nonresidue"], TG.BLS12_377_FQ6["nonresidue"]
    c1b, _ = host_ext.frob_table_fp6_3over2(pb, nr2, xi)
    assert [x for c in c1b for x in c] == \
        TG.BLS12_377_FQ6["frobenius_coeff_fp6_c1"]
    assert [x for c in host_ext.frob_table_fp12(pb, nr2, xi) for x in c] == \
        TG.BLS12_377_FQ12["frobenius_coeff_fp12_c1"]
    pb = PP.BLS12_381_FQ.modulus
    nr2, xi = TG.BLS12_381_FQ2["nonresidue"], TG.BLS12_381_FQ6["nonresidue"]
    assert [x for c in host_ext.frob_table_fp12(pb, nr2, xi) for x in c] == \
        TG.BLS12_381_FQ12["frobenius_coeff_fp12_c1"]


def _field_axioms(ops, seed=0):
    _, x = ext_rand(ops, 4, seed=seed)
    _, y = ext_rand(ops, 4, seed=seed + 1)
    _, z = ext_rand(ops, 4, seed=seed + 2)
    mul = jax.jit(ops.mul)
    # commutativity, associativity, distributivity
    assert np.array_equal(np.asarray(mul(x, y)), np.asarray(mul(y, x)))
    assert np.array_equal(np.asarray(mul(mul(x, y), z)),
                          np.asarray(mul(x, mul(y, z))))
    add = jax.jit(ops.add)
    lhs = mul(x, add(y, z))
    rhs = add(mul(x, y), mul(x, z))
    assert np.array_equal(np.asarray(lhs), np.asarray(rhs))
    # sqr == mul(x, x)
    assert np.array_equal(np.asarray(jax.jit(ops.sqr)(x)),
                          np.asarray(mul(x, x)))
    # inverse
    inv = jax.jit(ops.inv)
    one = np.broadcast_to(ops.one(), x.shape)
    assert np.array_equal(np.asarray(mul(x, inv(x))), one)


def test_fq2_mul_vs_host_oracle(bls_towers):
    _, fq2, _, _ = bls_towers
    p = fq2.fp.modulus
    nr = TG.BLS12_377_FQ2["nonresidue"]
    hx, x = ext_rand(fq2, 5, seed=11)
    hy, y = ext_rand(fq2, 5, seed=12)
    got = ext_to_host(fq2, jax.jit(fq2.mul)(x, y))
    expect = [list(host_ext.quad_mul(p, nr, tuple(a), tuple(b)))
              for a, b in zip(hx, hy)]
    assert got == expect


def test_fq2_axioms(bls_towers):
    _field_axioms(bls_towers[1], seed=20)


def test_fq6_axioms(bls_towers):
    _field_axioms(bls_towers[2], seed=30)


def test_fq12_axioms(bls_towers):
    _field_axioms(bls_towers[3], seed=40)


def test_mnt4_fq4_axioms(mnt4_towers):
    _field_axioms(mnt4_towers[2], seed=50)


def test_mnt6_fq6_axioms(mnt6_towers):
    _field_axioms(mnt6_towers[2], seed=60)


@pytest.mark.slow
def test_frobenius_is_pth_power(bls_towers):
    from gingerlib_tpu.ops import limbs
    _, _, _, fq12 = bls_towers
    p = fq12.fp.modulus
    _, x = ext_rand(fq12, 2, seed=70)
    xp = jax.jit(lambda a: T.ext_pow_const(
        fq12, a, limbs.bits_msb_first(p, p.bit_length())))(x)
    fr = jax.jit(lambda a: fq12.frob(a, 1))(x)
    assert np.array_equal(np.asarray(xp), np.asarray(fr))
    # frob^12 = identity
    f = x
    for _ in range(12):
        f = fq12.frob(f, 1)
    assert np.array_equal(np.asarray(f), np.asarray(x))


def test_conjugate_norm(bls_towers):
    # x * conj(x) has zero second component (lands in the subfield)
    _, fq2, _, _ = bls_towers
    _, x = ext_rand(fq2, 3, seed=80)
    prod = np.asarray(jax.jit(fq2.mul)(x, fq2.conjugate(x)))
    assert (prod[:, 1, :] == 0).all()
