"""Byte-format tests vs reference conventions (bytes.rs, groth16/mod.rs)."""

import numpy as np
import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.fields import fp
from gingerlib_tpu.curves import instances as CI
from gingerlib_tpu.utils import serialize as S


def test_fp_bytes_little_endian_standard_form():
    P = PP.MNT4753_FQ
    v = 0x0123456789ABCDEF
    d = fp.fp_from_int(P, v)
    raw = S.fp_to_bytes(P, d)
    assert len(raw) == 96  # 12 u64 limbs
    assert int.from_bytes(raw, "little") == v  # standard form, not Montgomery
    back, off = S.fp_from_bytes(P, raw)
    assert off == 96
    assert np.array_equal(back, d)


def test_fp_bytes_width_uses_reference_limbs():
    # 298-bit field: 5 u64 limbs = 40 bytes (our digit count is 19*2=38)
    P = PP.MNT6298_FQ
    raw = S.fp_to_bytes(P, fp.fp_from_int(P, 7))
    assert len(raw) == 40


def test_fp_bytes_rejects_out_of_range():
    P = PP.MNT4753_FQ
    raw = (P.modulus + 1).to_bytes(96, "little")
    with pytest.raises(ValueError):
        S.fp_from_bytes(P, raw)


def test_affine_roundtrip():
    g1 = CI.bls12_377_g1()
    gx, gy = g1.generator_affine
    raw = S.affine_to_bytes(g1, (gx, gy))
    assert len(raw) == 48 * 2 + 1
    (x, y, inf), off = S.affine_from_bytes(g1, raw)
    assert not inf and off == len(raw)
    assert np.array_equal(x, np.asarray(gx))
    assert np.array_equal(y, np.asarray(gy))


def test_affine_infinity_convention():
    g1 = CI.bls12_377_g1()
    raw = S.affine_to_bytes(g1, (None, None), infinity=True)
    # reference zero: x=0, y=1, infinity=1
    (x, y, inf), _ = S.affine_from_bytes(g1, raw)
    assert inf
    assert (np.asarray(x) == 0).all()
    assert fp.fp_to_int(g1.fp, np.asarray(y)[0]) == 1


def test_g2_affine_roundtrip():
    g2 = CI.mnt4753_g2()
    gx, gy = g2.generator_affine
    raw = S.affine_to_bytes(g2, (gx, gy))
    assert len(raw) == 96 * 4 + 1  # two Fq2 elements
    (x, y, inf), _ = S.affine_from_bytes(g2, raw)
    assert np.array_equal(x, np.asarray(gx)) and not inf


@pytest.mark.slow
def test_full_parameters_roundtrip():
    """Parameters ToBytes/FromBytes layout (groth16/mod.rs:188-239)."""
    from gingerlib_tpu.curves import instances as CI
    from gingerlib_tpu.relations.r1cs import ConstraintSystem, \
        LinearCombination
    from gingerlib_tpu.proofs import groth16
    from gingerlib_tpu.utils import serialize as S
    eng = CI.mnt6298_pairing()
    fr = eng.g1.scalar_field
    cs = ConstraintSystem(fr)
    c = cs.alloc_input("c", 15)
    a = cs.alloc("a", 3)
    b = cs.alloc("b", 5)
    cs.enforce(LinearCombination.of(a), LinearCombination.of(b),
               LinearCombination.of(c), "ab=c")
    params = groth16.generate_parameters(eng, cs, alpha=12, beta=34,
                                         gamma=56, delta=78, t=2718)
    raw = S.params_to_bytes(eng, params)
    params2, consumed = S.params_from_bytes(eng, raw)
    assert consumed == len(raw)
    assert S.params_to_bytes(eng, params2) == raw
    # restored parameters still prove correctly
    from gingerlib_tpu.relations.r1cs import compile_r1cs
    proof = groth16.create_proof(eng, params2, compile_r1cs(cs),
                                 cs.assignment(), r=9, s=8)
    assert groth16.verify_proof(eng, params2.vk, proof, [15])


@pytest.mark.slow
def test_gt_compression_roundtrip():
    """gt_compression_test (groups/tests.rs:116) analogue: compress /
    decompress GT elements with both c0 parities, plus failure on a
    non-unitary c1."""
    from gingerlib_tpu.utils.serialize import gt_compress, gt_decompress
    from gingerlib_tpu.curves.pairing_host import host_mnt4753_pairing, \
        host_mnt6753_pairing
    from gingerlib_tpu.params._gen import curves_gen as CG

    for mk, c in ((host_mnt4753_pairing, CG.MNT4753),
                  (host_mnt6753_pairing, CG.MNT6753)):
        E = mk()
        gt = E.pairing(([c["g1_x"]], [c["g1_y"]]),
                       (list(c["g2_x"]), list(c["g2_y"])))
        F = E.F  # host Fqk descriptor (QuadExtG)
        seen = set()
        g = gt
        for _ in range(6):
            bits = gt_compress(F, g)
            assert len(bits) == F.sf.K * F.field.modulus_bits + 1
            back = gt_decompress(F, bits)
            assert back == [v % F.field.modulus for v in g]
            seen.add(bits[-1])
            g = E._fmul(g, gt)
        assert seen == {True, False}, "both parities exercised"


def test_proof_and_vk_bytes_match_hand_derived_reference_layout():
    """Pin exact bytes against an INDEPENDENT hand-derivation of the
    reference layout (groth16/mod.rs:35-118): Fp = 96-byte little-endian
    standard form ([u64; 12] LE, fp_768.rs:784-789), affine point =
    x ‖ y ‖ infinity-byte (short_weierstrass_projective.rs:185-192),
    vk = alpha_g1_beta_g2 ‖ gamma_g2 ‖ delta_g2 ‖ BE-u32 len ‖ points."""
    import jax.numpy as jnp
    from gingerlib_tpu.params._gen import curves_gen as CG
    from gingerlib_tpu.params._gen import anchors_gen as A
    from gingerlib_tpu.proofs.groth16 import Proof, VerifyingKey
    from gingerlib_tpu.curves import instances as CI

    eng = CI.mnt4753_pairing()
    c = CG.MNT4753
    W = 96

    def le(v):
        return int(v).to_bytes(W, "little")

    g1b = le(c["g1_x"]) + le(c["g1_y"]) + b"\x00"
    g2b = (b"".join(le(v) for v in c["g2_x"]) +
           b"".join(le(v) for v in c["g2_y"]) + b"\x00")

    g1gen = eng.g1.generator_affine
    g2gen = eng.g2.generator_affine
    proof = Proof(a=g1gen, b=g2gen, c=g1gen)
    assert S.proof_to_bytes(eng, proof) == g1b + g2b + g1b

    gt_host = A.MNT4753_PAIRING_ANCHOR["gt"]
    p = eng.fp.modulus
    from gingerlib_tpu.fields import towers as T
    gt_dev = jnp.asarray(eng.fqk.const([v % p for v in gt_host]))
    vk = VerifyingKey(
        alpha_g1_beta_g2=gt_dev,
        gamma_g2=g2gen, delta_g2=g2gen,
        gamma_abc_g1=(jnp.stack([g1gen[0], g1gen[0]]),
                      jnp.stack([g1gen[1], g1gen[1]])))
    exp = (b"".join(le(v % p) for v in gt_host) + g2b + g2b +
           b"\x00\x00\x00\x02" + g1b + g1b)
    assert S.vk_to_bytes(eng, vk) == exp
    # roundtrip through the parser stays bit-identical
    vk2, off = S.vk_from_bytes(eng, exp)
    assert off == len(exp)
    assert S.vk_to_bytes(eng, vk2) == exp


# Pinned golden vectors derived BY HAND from the reference's write order in
# tools/golden_bytes.py (groth16/mod.rs:35-41 Proof = a‖b‖c;
# mod.rs:104-115 VK = alpha_g1_beta_g2‖gamma_g2‖delta_g2‖u32-BE count‖
# gamma_abc; affine = x‖y‖inf-u8, short_weierstrass_projective.rs:185-192;
# Fp = into_repr() little-endian at the u64-limb width, fp_320.rs +
# biginteger/macros.rs:203).  Inputs are public curve constants only:
# A=[2]G1 (independent affine-doubling int math), B=G2, C=G1 over
# MNT6-298.  These bytes were NOT produced by gingerlib's serializer —
# they pin it against an independent transcription of the Rust format.
_GOLDEN_MNT6298_PROOF = (
    "5d700f8dcff8fce2c62f158bdb36429c06f26e1ad6f34d93432f402f7efe495e"
    "f07823927d0000009ecd3e733fa2aac79e2dcc1c947f9b7169048111ae4a6716"
    "3862de191e5dd8358e54d5e8600000000013684c7e2576ad44e6d23a744b40a7"
    "ad3500d63c72aacb0249b4b3cc2b53ce562ba120734f030000fa800c5aac5cb1"
    "a9ab90281b4fc8fe409310e05219685fb4b50aa7610ec5ee52aa0b6241cf0000"
    "00ce1749bd91832501cbe267c76a051bf35c104e3cca0780b42f03b8cc3c4326"
    "e3100e17991f01000091ccfe601b2c587a71e1830b7c480983c43e368bd3eb07"
    "5e419cc705ad624dc63cf06859a60300006e5c68372c5baa2f4074cc17710ccb"
    "2db85deacaacb31a45c2ef4ca2c10615dbe527845eca000000f7e7605c2f78af"
    "7ba2552e7c645f71bb3ad87772193e1b9a62071394efa4c90283d82d5df70000"
    "00007d44c0bb1ac0ebadbd84253971c6b4e0579bd7baf956ed61bab27104d9d1"
    "692cfd24eefea402000028301dd9733d338a20971b5ec7e9715dc27ff0bffccb"
    "69fd7abf37e0f4822fdbf645c2862903000000")


def test_golden_rust_byte_vectors_mnt6298():
    import jax.numpy as jnp
    from gingerlib_tpu.params._gen import curves_gen as CG
    from gingerlib_tpu.proofs.groth16 import Proof
    from gingerlib_tpu.fields import fp as fpmod

    eng = CI.mnt6298_pairing()
    c = CG.MNT6298
    p = eng.fp.modulus
    # the same [2]G1 as tools/golden_bytes.py derives (pinned outputs)
    a2x = int("62449303393716626631530904849848047963603259935051612476"
              "806865742496335592361812644819037")
    a2y = int("48195348746022539973572253773397628511008126630271239631"
              "586763604035741489602300104068510")
    lam = (3 * c["g1_x"] ** 2 + c["a"]) * pow(2 * c["g1_y"], -1, p) % p
    assert a2x == (lam * lam - 2 * c["g1_x"]) % p
    assert a2y == (lam * (c["g1_x"] - a2x) - c["g1_y"]) % p

    def g1pt(x, y):
        return (jnp.asarray(fpmod.fp_from_ints(eng.fp, [x])),
                jnp.asarray(fpmod.fp_from_ints(eng.fp, [y])))

    def g2pt(xs, ys):
        return (jnp.asarray(fpmod.fp_from_ints(eng.fp, xs)),
                jnp.asarray(fpmod.fp_from_ints(eng.fp, ys)))

    proof = Proof(a=g1pt(a2x, a2y), b=g2pt(c["g2_x"], c["g2_y"]),
                  c=g1pt(c["g1_x"], c["g1_y"]))
    got = S.proof_to_bytes(eng, proof)
    assert got == bytes.fromhex(_GOLDEN_MNT6298_PROOF)
    # and the parser consumes exactly these bytes back to the same proof
    rt, off = S.proof_from_bytes(eng, got)
    assert off == len(got)
    assert S.proof_to_bytes(eng, rt) == got


_GOLDEN_MNT6298_VK = (
    "0100000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000000000000000000000000000000000000000000000000000"
    "0000000000000000000000000000000013684c7e2576ad44e6d23a744b40a7ad"
    "3500d63c72aacb0249b4b3cc2b53ce562ba120734f030000fa800c5aac5cb1a9"
    "ab90281b4fc8fe409310e05219685fb4b50aa7610ec5ee52aa0b6241cf000000"
    "ce1749bd91832501cbe267c76a051bf35c104e3cca0780b42f03b8cc3c4326e3"
    "100e17991f01000091ccfe601b2c587a71e1830b7c480983c43e368bd3eb075e"
    "419cc705ad624dc63cf06859a60300006e5c68372c5baa2f4074cc17710ccb2d"
    "b85deacaacb31a45c2ef4ca2c10615dbe527845eca000000f7e7605c2f78af7b"
    "a2552e7c645f71bb3ad87772193e1b9a62071394efa4c90283d82d5df7000000"
    "0013684c7e2576ad44e6d23a744b40a7ad3500d63c72aacb0249b4b3cc2b53ce"
    "562ba120734f030000fa800c5aac5cb1a9ab90281b4fc8fe409310e05219685f"
    "b4b50aa7610ec5ee52aa0b6241cf000000ce1749bd91832501cbe267c76a051b"
    "f35c104e3cca0780b42f03b8cc3c4326e3100e17991f0100007033019f8808eb"
    "406289d9868b034078d002bed18fdde66c4db8e8a1f0c118dc36e4539e160000"
    "0093a397c877d9988b93f6907a963f7ecddce30992b615d485cc646305dc1d51"
    "c78dac3899f20200000a189fa374bc933f31152f16a3ecd73f5a697cea498bd3"
    "302c4d9d13ae7f9c9ff0fb8e9ac502000000000000027d44c0bb1ac0ebadbd84"
    "253971c6b4e0579bd7baf956ed61bab27104d9d1692cfd24eefea40200002830"
    "1dd9733d338a20971b5ec7e9715dc27ff0bffccb69fd7abf37e0f4822fdbf645"
    "c28629030000005d700f8dcff8fce2c62f158bdb36429c06f26e1ad6f34d9343"
    "2f402f7efe495ef07823927d0000009ecd3e733fa2aac79e2dcc1c947f9b7169"
    "048111ae4a67163862de191e5dd8358e54d5e86000000000")


def test_golden_rust_byte_vk_mnt6298():
    import jax.numpy as jnp
    from gingerlib_tpu.params._gen import curves_gen as CG
    from gingerlib_tpu.proofs.groth16 import VerifyingKey
    from gingerlib_tpu.fields import fp as fpmod

    eng = CI.mnt6298_pairing()
    c = CG.MNT6298
    p = eng.fp.modulus
    lam = (3 * c["g1_x"] ** 2 + c["a"]) * pow(2 * c["g1_y"], -1, p) % p
    a2x = (lam * lam - 2 * c["g1_x"]) % p
    a2y = (lam * (c["g1_x"] - a2x) - c["g1_y"]) % p

    def ext(vs):
        return jnp.asarray(fpmod.fp_from_ints(eng.fp, vs))

    vk = VerifyingKey(
        alpha_g1_beta_g2=ext([1, 0, 0, 0, 0, 0]),
        gamma_g2=(ext(c["g2_x"]), ext(c["g2_y"])),
        delta_g2=(ext(c["g2_x"]), ext([(p - v) % p for v in c["g2_y"]])),
        gamma_abc_g1=(jnp.stack([ext([c["g1_x"]]), ext([a2x])]),
                      jnp.stack([ext([c["g1_y"]]), ext([a2y])])))
    got = S.vk_to_bytes(eng, vk)
    assert got == bytes.fromhex(_GOLDEN_MNT6298_VK)
    vk2, off = S.vk_from_bytes(eng, got)
    assert off == len(got)
    assert S.vk_to_bytes(eng, vk2) == got
