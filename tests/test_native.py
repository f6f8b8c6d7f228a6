"""Native C++ host runtime (native/gl_host.cpp) vs python-int oracles."""

import random

import pytest

from gingerlib_tpu import native
from gingerlib_tpu import params as PP


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


@pytest.mark.parametrize("field", ["MNT4753_FQ", "MNT6753_FQ", "JUBJUB_FQ",
                                   "MNT6298_FQ", "BLS12_381_FQ"])
def test_mulmod_batch(field):
    P = getattr(PP, field)
    p = P.modulus
    hf = native.host_field(p)
    rng = random.Random(hash(field) & 0xffff)
    a = [rng.randrange(p) for _ in range(64)] + [0, 1, p - 1]
    b = [rng.randrange(p) for _ in range(64)] + [p - 1, 0, p - 1]
    assert hf.mulmod_batch(a, b) == [x * y % p for x, y in zip(a, b)]


def test_powers_and_batch_inverse():
    P = PP.MNT4753_FR
    p = P.modulus
    hf = native.host_field(p)
    pw = hf.powers(123456789, 300)
    assert all(pw[i] == pow(123456789, i, p) for i in (0, 1, 2, 137, 299))
    rng = random.Random(3)
    xs = [rng.randrange(1, p) for _ in range(33)] + [0]
    inv = hf.batch_inverse(xs)
    assert inv[-1] == 0
    assert all(x * v % p == 1 for x, v in zip(xs[:-1], inv[:-1]))


def test_lagrange_matches_python():
    from gingerlib_tpu.proofs import groth16 as g16
    from gingerlib_tpu.ops.fft import Domain
    P = PP.MNT4753_FR
    dom = Domain(P, 32)
    hf = native.host_field(P.modulus)
    u_n, zt_n = hf.lagrange_at(dom.gen, 987654321, 32)
    # pure-python mirror (the fallback path inside _host_lagrange_at)
    p = P.modulus
    zt = (pow(987654321, 32, p) - 1) % p
    w = 1
    exp = []
    minv = pow(32, -1, p)
    for i in range(32):
        exp.append(zt * minv % p * w % p *
                   pow((987654321 - w) % p, -1, p) % p)
        w = w * dom.gen % p
    assert u_n == exp and zt_n == zt


def test_lagrange_rejects_tau_in_domain():
    from gingerlib_tpu.ops.fft import Domain
    P = PP.MNT4753_FR
    dom = Domain(P, 16)
    hf = native.host_field(P.modulus)
    with pytest.raises(ValueError):
        hf.lagrange_at(dom.gen, dom.gen, 16)  # gen is in the domain


def test_build_powers_uses_native_format():
    """ops/fft._build_powers output (native path) matches fp_from_ints."""
    import numpy as np
    from gingerlib_tpu.ops.fft import _build_powers
    from gingerlib_tpu.fields import fp as fpmod
    P = PP.MNT6298_FQ  # 298 bits: limb padding edge case (20 u16 -> 19)
    got = np.asarray(_build_powers(P, 7, 10))
    exp = fpmod.fp_from_ints(P, [pow(7, i, P.modulus) * 1 % P.modulus
                                 for i in range(10)])
    # both Montgomery form
    exp = fpmod.fp_from_ints(P, [pow(7, i, P.modulus) for i in range(10)])
    assert got.shape == exp.shape
    assert (got == exp).all()
