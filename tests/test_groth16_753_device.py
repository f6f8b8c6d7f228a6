"""MNT4-753 device Groth16 vs the host oracle: identical toxic waste and
blinding must yield a bit-identical proof, and device verify must
accept/reject (the 753-bit analogue of test_gm17_device.py; VERDICT r3
item 5 — BASELINE config #1 executes on a real device).

Reference dataflow: groth16/prover.rs:201-346, generator.rs:146-335.

slow on CPU (XLA:CPU compile of the 753-bit prover graph takes ~hours on
this 1-core box); the intended run is on the chip:

    GINGERLIB_TEST_TPU=1 python -m pytest tests/test_groth16_753_device.py
"""

import numpy as np
import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.curves import instances as CI
from gingerlib_tpu.fields import fp as fpmod
from gingerlib_tpu.relations.r1cs import ConstraintSystem, \
    LinearCombination, compile_r1cs
from gingerlib_tpu.proofs import groth16
from gingerlib_tpu.proofs.groth16_host import host_groth16_mnt4753


TOXIC = dict(alpha=1234, beta=5678, gamma=9101, delta=1121, t=31415)
RAND = dict(r=171717, s=282828)


def mul_circuit(field, a_val=None, b_val=None):
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
    return CI.mnt4753_pairing()


@pytest.fixture(scope="module")
def device_proof(engine):
    fr = engine.g1.scalar_field
    cs = mul_circuit(fr, 7, 11)
    assert cs.is_satisfied()
    params = groth16.generate_parameters(engine, cs, **TOXIC)
    compiled = compile_r1cs(cs)
    proof = groth16.create_proof(engine, params, compiled, cs.assignment(),
                                 **RAND)
    return params, proof


@pytest.mark.slow
def test_device_753_proof_matches_host_oracle(engine, device_proof):
    params, proof = device_proof
    H = host_groth16_mnt4753()
    cs = mul_circuit(PP.MNT4753_FR, 7, 11)
    hparams = H.setup(cs, **TOXIC)
    hproof = H.prove(cs, hparams, **RAND)
    assert H.verify(hparams, hproof, [77])

    fq = engine.g1.fp

    def aff_host_g1(xy):
        return (fpmod.fp_to_int(fq, np.asarray(xy[0])[0]),
                fpmod.fp_to_int(fq, np.asarray(xy[1])[0]))

    def aff_host_g2(xy):
        xs = [fpmod.fp_to_int(fq, c) for c in np.asarray(xy[0])]
        ys = [fpmod.fp_to_int(fq, c) for c in np.asarray(xy[1])]
        return (xs, ys)

    assert aff_host_g1(proof.a) == (hproof["a"][0][0], hproof["a"][1][0])
    assert aff_host_g2(proof.b) == (hproof["b"][0], hproof["b"][1])
    assert aff_host_g1(proof.c) == (hproof["c"][0][0], hproof["c"][1][0])


@pytest.mark.slow
def test_device_753_verifies(engine, device_proof):
    params, proof = device_proof
    assert groth16.verify_proof(engine, params.vk, proof, [77])
    assert not groth16.verify_proof(engine, params.vk, proof, [78])
