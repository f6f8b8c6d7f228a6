"""Groth16 end-to-end on MNT6-298: setup -> prove -> verify -> reject.

Mirrors proof-systems/src/groth16/test.rs (MySillyCircuit: prove that we
know a, b with a*b = c public).
"""

import numpy as np
import pytest

from gingerlib_tpu.curves import instances as CI
from gingerlib_tpu.relations.r1cs import ConstraintSystem, LinearCombination
from gingerlib_tpu.proofs import groth16


def mul_circuit(field, a_val=None, b_val=None):
    """c = a*b with c public (groth16/test.rs MySillyCircuit)."""
    cs = ConstraintSystem(field)
    p = field.modulus
    c_val = None if a_val is None else a_val * b_val % p
    c = cs.alloc_input("c", c_val)
    a = cs.alloc("a", a_val)
    b = cs.alloc("b", b_val)
    cs.enforce(LinearCombination.of(a), LinearCombination.of(b),
               LinearCombination.of(c), "a*b=c")
    return cs


@pytest.fixture(scope="module")
def engine():
    return CI.mnt6298_pairing()


@pytest.fixture(scope="module")
def setup(engine):
    fr = engine.g1.scalar_field
    cs = mul_circuit(fr)
    params = groth16.generate_parameters(
        engine, cs, alpha=123, beta=456, gamma=789, delta=1011, t=314159)
    return params


@pytest.mark.slow
def test_prove_and_verify(engine, setup):
    fr = engine.g1.scalar_field
    params = setup
    a_val, b_val = 7, 11
    cs = mul_circuit(fr, a_val, b_val)
    assert cs.is_satisfied()
    from gingerlib_tpu.relations.r1cs import compile_r1cs
    compiled = compile_r1cs(cs)
    proof = groth16.create_proof(engine, params, compiled,
                                 cs.assignment(), r=31337, s=71717)
    c_val = a_val * b_val % fr.modulus
    assert groth16.verify_proof(engine, params.vk, proof, [c_val])
    # wrong public input rejected
    assert not groth16.verify_proof(engine, params.vk, proof, [c_val + 1])


@pytest.mark.slow
def test_proof_serialization_roundtrip(engine, setup):
    from gingerlib_tpu.utils import serialize as S
    fr = engine.g1.scalar_field
    params = setup
    cs = mul_circuit(fr, 3, 5)
    from gingerlib_tpu.relations.r1cs import compile_r1cs
    proof = groth16.create_proof(engine, params, compile_r1cs(cs),
                                 cs.assignment(), r=1, s=2)
    raw = S.proof_to_bytes(engine, proof)
    proof2, _ = S.proof_from_bytes(engine, raw)
    assert raw == S.proof_to_bytes(engine, proof2)
    assert groth16.verify_proof(engine, params.vk, proof2, [15])
    vk_raw = S.vk_to_bytes(engine, params.vk)
    vk2, _ = S.vk_from_bytes(engine, vk_raw)
    assert vk_raw == S.vk_to_bytes(engine, vk2)
    assert groth16.verify_proof(engine, vk2, proof, [15])
