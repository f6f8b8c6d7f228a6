"""Device GM17 vs host GM17 oracle: identical toxic waste + randomness must
yield bit-identical proofs, and device verify must accept/reject correctly
(proof-systems/src/gm17 end-to-end, MySillyCircuit shape)."""

import numpy as np
import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.curves import instances as CI
from gingerlib_tpu.fields import fp as fpmod
from gingerlib_tpu.relations.r1cs import ConstraintSystem, \
    LinearCombination, compile_r1cs
from gingerlib_tpu.proofs import gm17
from gingerlib_tpu.proofs.gm17_host import host_gm17_mnt6298


TOXIC = dict(alpha=123, beta=456, gamma=1, t=13579)
RAND = dict(d1=11, d2=22, r=333)


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
    return CI.mnt6298_pairing()


@pytest.fixture(scope="module")
def device_proof(engine):
    fr = engine.g1.scalar_field
    cs = mul_circuit(fr, 7, 11)
    assert cs.is_satisfied()
    params = gm17.generate_parameters(engine, cs, **TOXIC)
    compiled = compile_r1cs(cs)
    proof = gm17.create_proof(engine, params, compiled, cs.assignment(),
                              **RAND)
    return params, proof, cs


@pytest.mark.slow
def test_device_gm17_verifies(engine, device_proof):
    params, proof, _ = device_proof
    assert gm17.verify_proof(engine, params.vk, proof, [77])
    assert not gm17.verify_proof(engine, params.vk, proof, [78])


@pytest.mark.slow
def test_device_matches_host_oracle(engine, device_proof):
    params, proof, _ = device_proof
    H = host_gm17_mnt6298()
    fr = PP.MNT6298_FR
    cs = mul_circuit(fr, 7, 11)
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
