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


@pytest.mark.slow
def test_fq6_axioms(bls_towers):
    _field_axioms(bls_towers[2], seed=30)


@pytest.mark.slow
def test_fq12_axioms(bls_towers):
    _field_axioms(bls_towers[3], seed=40)


@pytest.mark.slow
def test_mnt4_fq4_axioms(mnt4_towers):
    _field_axioms(mnt4_towers[2], seed=50)


@pytest.mark.slow
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


@pytest.mark.slow
def test_conjugate_norm(bls_towers):
    # x * conj(x) has zero second component (lands in the subfield)
    _, fq2, _, _ = bls_towers
    _, x = ext_rand(fq2, 3, seed=80)
    prod = np.asarray(jax.jit(fq2.mul)(x, fq2.conjugate(x)))
    assert (prod[:, 1, :] == 0).all()


def _unitary(ops, n, seed):
    """Random unitary elements u = z · conj(z)^-1 (conj(u) = u^-1)."""
    _, z = ext_rand(ops, n, seed=seed)
    return jax.jit(lambda z: ops.mul(z, ops.inv(ops.conjugate(z))))(z)


@pytest.mark.parametrize("tower", ["mnt4", "mnt6", "bls12"])
@pytest.mark.slow
def test_cyclotomic_square_matches_generic(tower, mnt4_towers, mnt6_towers,
                                           bls_towers):
    F = {"mnt4": mnt4_towers[-1], "mnt6": mnt6_towers[-1],
         "bls12": bls_towers[-1]}[tower]
    if tower == "bls12":
        # Granger-Scott needs the FULL cyclotomic subgroup
        # z^(p^4 - p^2 + 1) = 1, i.e. the image of the final-exp easy part
        # z^((p^6-1)(p^2+1)); unitarity alone is not enough for Fq12.
        _, z = ext_rand(F, 2, seed=90)
        v = jax.jit(lambda z: F.mul(F.conjugate(z), F.inv(z)))(z)
        u = jax.jit(lambda v: F.mul(F.frob(v, 2), v))(v)
    else:
        # the quartic formula only needs norm 1 (conj == inverse)
        u = _unitary(F, 2, seed=90)
    cy = np.asarray(jax.jit(F.cyclotomic_square)(u))
    ge = np.asarray(jax.jit(F.sqr)(u))
    assert ext_to_host(F, cy) == ext_to_host(F, ge)


@pytest.mark.slow
def test_cyclotomic_pow_matches_generic(mnt4_towers):
    from gingerlib_tpu.ops import limbs
    F = mnt4_towers[-1]
    u = _unitary(F, 2, seed=91)
    e = 0xDEADBEEFCAFE12345
    cy = np.asarray(jax.jit(
        lambda u: T.ext_cyclotomic_pow_const(F, u, e))(u))
    ge = np.asarray(jax.jit(lambda u: T.ext_pow_const(
        F, u, limbs.bits_msb_first(e, e.bit_length())))(u))
    assert ext_to_host(F, cy) == ext_to_host(F, ge)


@pytest.mark.slow
def test_mul_by_gen_matches_generic(mnt6_towers, bls_towers):
    for F in (mnt6_towers[-1], bls_towers[2], bls_towers[-1]):
        _, x = ext_rand(F, 3, seed=92)
        sub = F.sf
        K = sub.K if hasattr(sub, "K") else 1
        gen_host = [0] * F.K
        gen_host[K] = 1
        gen = np.asarray(F.const(gen_host))
        fast = np.asarray(jax.jit(F.mul_by_gen)(x))
        dense = np.asarray(jax.jit(lambda x: F.mul(
            x, jnp_broadcast(gen, x.shape)))(x))
        assert ext_to_host(F, fast) == ext_to_host(F, dense)


def jnp_broadcast(c, shape):
    import jax.numpy as jnp
    return jnp.broadcast_to(jnp.asarray(c), shape)


@pytest.mark.slow
def test_sparse_line_muls_match_dense(bls_towers):
    import jax.numpy as jnp
    _, fq2, fq6, fq12 = bls_towers
    _, f = ext_rand(fq12, 2, seed=93)
    _, cs = ext_rand(fq2, 6, seed=94)
    c0, c1, c4 = cs[0], cs[1], cs[2]
    z = jnp.zeros_like(c0)
    b2 = lambda c: jnp.broadcast_to(c, (2,) + c.shape)
    # M twist element: positions 0,1,4 of [1, v, v2, w, vw, v2w]
    dense014 = jnp.concatenate([b2(c0), b2(c1), b2(z), b2(z), b2(c4), b2(z)],
                               axis=-2)
    sp = np.asarray(jax.jit(lambda f: fq12.mul_by_014(
        f, b2(c0), b2(c1), b2(c4)))(f))
    de = np.asarray(jax.jit(fq12.mul)(f, dense014))
    assert ext_to_host(fq12, sp) == ext_to_host(fq12, de)
    # D twist element: positions 0,3,4
    c3 = cs[3]
    dense034 = jnp.concatenate([b2(c0), b2(z), b2(z), b2(c3), b2(c4), b2(z)],
                               axis=-2)
    sp = np.asarray(jax.jit(lambda f: fq12.mul_by_034(
        f, b2(c0), b2(c3), b2(c4)))(f))
    de = np.asarray(jax.jit(fq12.mul)(f, dense034))
    assert ext_to_host(fq12, sp) == ext_to_host(fq12, de)
    # fq6 sparse helpers
    _, x6 = ext_rand(fq6, 2, seed=95)
    dense01 = jnp.concatenate([b2(c0), b2(c1), b2(z)], axis=-2)
    sp = np.asarray(jax.jit(lambda x: fq6.mul_by_01(x, b2(c0), b2(c1)))(x6))
    de = np.asarray(jax.jit(fq6.mul)(x6, dense01))
    assert ext_to_host(fq6, sp) == ext_to_host(fq6, de)
    dense1 = jnp.concatenate([b2(z), b2(c1), b2(z)], axis=-2)
    sp = np.asarray(jax.jit(lambda x: fq6.mul_by_1(x, b2(c1)))(x6))
    de = np.asarray(jax.jit(fq6.mul)(x6, dense1))
    assert ext_to_host(fq6, sp) == ext_to_host(fq6, de)


@pytest.mark.slow
def test_mnt_sparse_line_muls_match_dense(mnt4_towers, mnt6_towers):
    """mul_by_023 (fp4.rs:112-127) / mul_by_2345 (fp6_2over3.rs:110-123):
    the MNT affine-line shapes — c0 sparse in one Fp coefficient."""
    import random as _random
    import jax.numpy as jnp
    from gingerlib_tpu.fields import fp as fpmod
    # MNT4: Fq4 = quad(Fq2), line = ([a, 0], c1)
    _, fq2, fq4 = mnt4_towers
    _, f = ext_rand(fq4, 2, seed=101)
    _, c1s = ext_rand(fq2, 2, seed=102)
    rng = _random.Random(103)
    a_host = [rng.randrange(fq4.fp.modulus) for _ in range(2)]
    a = jnp.asarray(np.stack([fpmod.fp_from_int(fq4.fp, v)
                              for v in a_host]))
    z = jnp.zeros_like(c1s[..., :1, :])
    dense = jnp.concatenate([a[..., None, :], z, c1s], axis=-2)
    sp = np.asarray(jax.jit(lambda f, a, c1: fq4.mul_by_023(f, a, c1))(
        f, a, c1s))
    de = np.asarray(jax.jit(fq4.mul)(f, dense))
    assert ext_to_host(fq4, sp) == ext_to_host(fq4, de)
    # MNT6: Fq6 = quad(Fq3), line = ((0, 0, a), c1)
    _, fq3, fq6 = mnt6_towers
    _, f6 = ext_rand(fq6, 2, seed=104)
    _, c1s6 = ext_rand(fq3, 2, seed=105)
    a_host = [rng.randrange(fq6.fp.modulus) for _ in range(2)]
    a6 = jnp.asarray(np.stack([fpmod.fp_from_int(fq6.fp, v)
                               for v in a_host]))
    z6 = jnp.zeros_like(c1s6[..., :1, :])
    dense6 = jnp.concatenate([z6, z6, a6[..., None, :], c1s6], axis=-2)
    sp = np.asarray(jax.jit(lambda f, a, c1: fq6.mul_by_2345(f, a, c1))(
        f6, a6, c1s6))
    de = np.asarray(jax.jit(fq6.mul)(f6, dense6))
    assert ext_to_host(fq6, sp) == ext_to_host(fq6, de)
