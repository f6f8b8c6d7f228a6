"""GM17 recursive verification: a real MNT4-753 GM17 proof verified inside
a circuit over MNT4-753's Fq (= MNT6-753's Fr) — the GM17 analogue of the
Groth16 recursion step (nizk/gm17/mod.rs tests)."""

import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.relations.r1cs import ConstraintSystem, LinearCombination
from gingerlib_tpu.proofs.gm17_host import host_gm17_mnt4753
from gingerlib_tpu.gadgets.crypto.nizk import mnt4753_gm17_verifier_gadget


def _mul_circuit(field, a_val=None, b_val=None):
    cs = ConstraintSystem(field)
    c_val = None if a_val is None else a_val * b_val % field.modulus
    c = cs.alloc_input("c", c_val)
    a = cs.alloc("a", a_val)
    b = cs.alloc("b", b_val)
    cs.enforce(LinearCombination.of(a), LinearCombination.of(b),
               LinearCombination.of(c), "a*b=c")
    return cs


@pytest.fixture(scope="module")
def inner():
    H = host_gm17_mnt4753()
    cs = _mul_circuit(PP.MNT4753_FR, 7, 11)
    assert cs.is_satisfied()
    params = H.setup(cs, alpha=321, beta=654, gamma=1, t=24680)
    proof = H.prove(cs, params, d1=11, d2=22, r=333)
    assert H.verify(params, proof, [77])
    assert not H.verify(params, proof, [78])
    return H, params, proof


def _vk_host_dict(H, params):
    vk = params.vk
    return {
        "h_g2": vk["h_g2"],
        "g_alpha_g1": vk["g_alpha_g1"],
        "h_beta_g2": vk["h_beta_g2"],
        "g_gamma_g1": vk["g_gamma_g1"],
        "h_gamma_g2": vk["h_gamma_g2"],
        "query": vk["query"],
        "g_alpha_h_beta": H.E.pairing(vk["g_alpha_g1"], vk["h_beta_g2"]),
    }


@pytest.mark.slow
def test_gm17_verifier_gadget_satisfiable(inner):
    H, params, proof = inner
    vg = mnt4753_gm17_verifier_gadget()
    cs = ConstraintSystem(PP.MNT4753_FQ)
    vkg = vg.alloc_vk(cs, _vk_host_dict(H, params))
    proofg = vg.alloc_proof(cs, proof)
    nbits = PP.MNT4753_FR.modulus_bits
    bits = vg.alloc_input_bits(cs, 77, nbits, "x")
    vg.check_verify(cs, vkg, [bits], proofg)
    bad = cs.which_is_unsatisfied()
    assert bad is None, f"unsatisfied at: {bad}"
    print(f"gm17 verifier circuit: {cs.num_constraints} constraints")


@pytest.mark.slow
def test_gm17_verifier_gadget_rejects_bad_input(inner):
    H, params, proof = inner
    vg = mnt4753_gm17_verifier_gadget()
    cs = ConstraintSystem(PP.MNT4753_FQ)
    vkg = vg.alloc_vk(cs, _vk_host_dict(H, params))
    proofg = vg.alloc_proof(cs, proof)
    nbits = PP.MNT4753_FR.modulus_bits
    bits = vg.alloc_input_bits(cs, 78, nbits, "x")
    vg.check_verify(cs, vkg, [bits], proofg)
    assert cs.which_is_unsatisfied() is not None
