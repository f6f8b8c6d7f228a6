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
