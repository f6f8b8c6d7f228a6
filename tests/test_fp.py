"""Prime-field ops vs python-int golden model, across all field widths.

Mirrors the reference's generic field_test / primefield_test / sqrt_field_test
(algebra/src/fields/tests.rs:312-398) with exact python-int oracles.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.fields import fp

from helpers import rand_ints, to_dev, to_host

SMALL = PP.BLS12_377_FR       # 253-bit (fast on CPU)
BIG = PP.MNT4753_FQ           # 753-bit
ALL = [PP.BLS12_377_FR, PP.BLS12_377_FQ, PP.MNT4753_FQ, PP.MNT6753_FQ,
       PP.SW6_FQ, PP.MNT6298_FQ, PP.JUBJUB_FR]


@pytest.mark.parametrize("P", ALL, ids=lambda p: p.name)
def test_mul_add_sub_neg(P):
    q = P.modulus
    xs = rand_ints(P, 16, seed=1) + [0, 1, q - 1]
    ys = rand_ints(P, 16, seed=2) + [q - 1, q - 1, q - 1]
    a, b = to_dev(P, xs), to_dev(P, ys)
    assert to_host(P, jax.jit(lambda a, b: fp.mont_mul(P, a, b))(a, b)) == [
        (x * y) % q for x, y in zip(xs, ys)]
    assert to_host(P, jax.jit(lambda a, b: fp.add_mod(P, a, b))(a, b)) == [
        (x + y) % q for x, y in zip(xs, ys)]
    assert to_host(P, jax.jit(lambda a, b: fp.sub_mod(P, a, b))(a, b)) == [
        (x - y) % q for x, y in zip(xs, ys)]
    assert to_host(P, jax.jit(lambda a: fp.neg_mod(P, a))(a)) == [
        (-x) % q for x in xs]


@pytest.mark.parametrize("P", [SMALL, BIG], ids=lambda p: p.name)
@pytest.mark.slow
def test_inverse(P):
    q = P.modulus
    xs = rand_ints(P, 8, seed=3) + [1, q - 1]
    a = to_dev(P, xs)
    assert to_host(P, jax.jit(lambda a: fp.inv_mod(P, a))(a)) == [
        pow(x, -1, q) for x in xs]


def test_inverse_zero_maps_to_zero():
    P = SMALL
    a = to_dev(P, [0])
    assert to_host(P, fp.inv_mod(P, a)) == [0]


@pytest.mark.parametrize("P", [SMALL], ids=lambda p: p.name)
def test_batch_inverse(P):
    q = P.modulus
    xs = rand_ints(P, 12, seed=4)
    xs[5] = 0  # zero passes through
    a = to_dev(P, xs)
    got = to_host(P, jax.jit(lambda a: fp.batch_inverse(P, a))(a))
    assert got == [pow(x, -1, q) if x else 0 for x in xs]


@pytest.mark.parametrize("P", [SMALL, BIG, PP.MNT6753_FQ],
                         ids=lambda p: p.name)
@pytest.mark.slow
def test_sqrt(P):
    q = P.modulus
    xs = rand_ints(P, 6, seed=5)
    sq = [(x * x) % q for x in xs]
    a = to_dev(P, sq)
    r, ok = jax.jit(lambda a: fp.sqrt_mod(P, a))(a)
    assert np.asarray(ok).all()
    for x, root in zip(xs, to_host(P, r)):
        assert (root * root) % q == (x * x) % q


def test_sqrt_nonresidue_rejected():
    P = SMALL
    q = P.modulus
    nqr = P.generator  # multiplicative generator is a non-residue
    a = to_dev(P, [nqr])
    _, ok = jax.jit(lambda a: fp.sqrt_mod(P, a))(a)
    assert not bool(np.asarray(ok)[0])


@pytest.mark.slow
def test_legendre():
    P = SMALL
    q = P.modulus
    xs = rand_ints(P, 4, seed=6)
    vals = [(x * x) % q for x in xs] + [P.generator, 0]
    a = to_dev(P, vals)
    sym = np.asarray(jax.jit(lambda a: fp.legendre(P, a))(a))
    assert list(sym) == [1, 1, 1, 1, -1, 0]


def test_mont_roundtrip():
    P = BIG
    xs = rand_ints(P, 4, seed=7)
    a = to_dev(P, xs)
    std = jax.jit(lambda a: fp.from_mont(P, a))(a)
    back = jax.jit(lambda a: fp.to_mont(P, a))(std)
    assert np.array_equal(np.asarray(back), np.asarray(a))


@pytest.mark.slow
def test_pow_dyn():
    P = SMALL
    q = P.modulus
    from gingerlib_tpu.ops import limbs
    base = rand_ints(P, 3, seed=8)
    exps = [3, 65537, q - 2]
    a = to_dev(P, base)
    e = jnp.asarray(limbs.to_digits_batch(exps, P.n_digits))
    got = to_host(P, jax.jit(lambda a, e: fp.pow_dyn(P, a, e))(a, e))
    assert got == [pow(b, x, q) for b, x in zip(base, exps)]


@pytest.mark.parametrize("P", [SMALL, BIG, PP.SW6_FQ], ids=lambda p: p.name)
@pytest.mark.slow
def test_mont_mul_pallas_interpret(P):
    """The Pallas Montgomery kernel (ops/pallas_mont.py) is the default TPU
    mont_mul path but CPU CI normally takes the pure-XLA branch — run it in
    interpret mode so a carry/REDC regression can't ship undetected."""
    from gingerlib_tpu.ops import pallas_mont

    q = P.modulus
    xs = rand_ints(P, 13, seed=11) + [0, 1, q - 1]
    ys = rand_ints(P, 13, seed=12) + [q - 1, q - 1, q - 1]
    a, b = to_dev(P, xs), to_dev(P, ys)
    got = to_host(P, pallas_mont.mont_mul_pallas(P, a, b, interpret=True))
    assert got == [(x * y) % q for x, y in zip(xs, ys)]


@pytest.mark.parametrize("P", [SMALL, BIG], ids=lambda p: p.name)
@pytest.mark.slow
def test_pow_const_pallas_interpret(P):
    """Fused pow-chain kernel (ops/pallas_mont.pow_const_pallas) vs python
    pow, interpret mode (small exponent: the interpreter replays the ladder
    step by step)."""
    from gingerlib_tpu.ops import pallas_mont, limbs

    q = P.modulus
    xs = rand_ints(P, 5, seed=3) + [0, 1, q - 1]
    a = to_dev(P, xs)
    e = 0b110100111011
    bits = limbs.bits_msb_first(e, e.bit_length())
    got = to_host(P, pallas_mont.pow_const_pallas(P, a, bits,
                                                  interpret=True))
    assert got == [pow(x, e, q) for x in xs]


@pytest.mark.parametrize("P", [SMALL, BIG], ids=lambda p: p.name)
@pytest.mark.slow
def test_mont_mul_mxu_interpret(P):
    """MXU-REDC Montgomery kernel (constant multiplies as bf16 matmuls) vs
    python-int oracle, interpret mode."""
    from gingerlib_tpu.ops import pallas_mont

    q = P.modulus
    xs = rand_ints(P, 13, seed=21) + [0, 1, q - 1]
    ys = rand_ints(P, 13, seed=22) + [q - 1, q - 1, q - 1]
    a, b = to_dev(P, xs), to_dev(P, ys)
    got = to_host(P, pallas_mont.mont_mul_pallas_mxu(P, a, b,
                                                     interpret=True))
    assert got == [(x * y) % q for x, y in zip(xs, ys)]


@pytest.mark.slow
def test_inv_bea_pallas_interpret():
    """In-kernel BEA inversion vs python pow(x, -1, q), interpret mode
    (SMALL field only — the interpreter replays ~4·nbits iterations)."""
    from gingerlib_tpu.ops import pallas_mont
    import jax.numpy as jnp

    P = SMALL
    q = P.modulus
    xs = rand_ints(P, 4, seed=31) + [0, 1, q - 1, 2]
    a = to_dev(P, xs)                                 # Montgomery form aR
    y = pallas_mont.inv_bea_pallas(P, a, interpret=True)  # plain (aR)^-1
    out = fp.mont_mul(P, jnp.asarray(y), jnp.broadcast_to(
        jnp.asarray(P.r3_digits), np.asarray(y).shape))
    got = to_host(P, out)
    assert got == [pow(x, -1, q) if x else 0 for x in xs]


@pytest.mark.parametrize("P", [SMALL, BIG], ids=lambda p: p.name)
@pytest.mark.slow
def test_mont_mul_transposed_interpret(P):
    """Transposed-tile Montgomery kernel (digits on sublanes, MXU REDC,
    semi-normalized intermediate carries) vs python-int oracle."""
    from gingerlib_tpu.ops import pallas_mont

    q = P.modulus
    xs = rand_ints(P, 13, seed=41) + [0, 1, q - 1]
    ys = rand_ints(P, 13, seed=42) + [q - 1, q - 1, q - 1]
    a, b = to_dev(P, xs), to_dev(P, ys)
    got = to_host(P, pallas_mont.mont_mul_pallas_t(P, a, b,
                                                   interpret=True))
    assert got == [(x * y) % q for x, y in zip(xs, ys)]
