"""GM17 end-to-end (host oracle; reference proof-systems/src/gm17)."""

import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.relations.r1cs import ConstraintSystem, LinearCombination
from gingerlib_tpu.proofs.gm17_host import host_gm17_mnt6298


def _circuit(fr, a=None, b=None):
    cs = ConstraintSystem(fr)
    cv = None if a is None else a * b % fr.modulus
    c = cs.alloc_input("c", cv)
    av = cs.alloc("a", a)
    bv = cs.alloc("b", b)
    cs.enforce(LinearCombination.of(av), LinearCombination.of(bv),
               LinearCombination.of(c), "ab=c")
    return cs


@pytest.fixture(scope="module")
def setup():
    H = host_gm17_mnt6298()
    cs = _circuit(PP.MNT6298_FR, 7, 11)
    # gamma is pinned to one in the reference's public API
    # (gm17/generator.rs:27)
    params = H.setup(cs, alpha=123, beta=456, gamma=1, t=13579)
    return H, cs, params


def test_gm17_prove_verify(setup):
    H, cs, params = setup
    proof = H.prove(cs, params, d1=11, d2=22, r=333)
    assert H.verify(params, proof, [77])
    assert not H.verify(params, proof, [78])


def test_gm17_different_randomness_still_verifies(setup):
    H, cs, params = setup
    proof = H.prove(cs, params, d1=5, d2=6, r=7)
    assert H.verify(params, proof, [77])


def test_gm17_multi_constraint():
    """chained a*b=c1, c1*b=c_out (two constraints, SAP doubling)."""
    H = host_gm17_mnt6298()
    fr = PP.MNT6298_FR
    cs = ConstraintSystem(fr)
    a, b = 3, 5
    c1 = a * b
    c2 = c1 * b
    out = cs.alloc_input("out", c2)
    av = cs.alloc("a", a)
    bv = cs.alloc("b", b)
    c1v = cs.alloc("c1", c1)
    cs.enforce(LinearCombination.of(av), LinearCombination.of(bv),
               LinearCombination.of(c1v), "ab=c1")
    cs.enforce(LinearCombination.of(c1v), LinearCombination.of(bv),
               LinearCombination.of(out), "c1b=out")
    assert cs.is_satisfied()
    params = H.setup(cs, alpha=98, beta=76, gamma=1, t=54321)
    proof = H.prove(cs, params, d1=1, d2=2, r=3)
    assert H.verify(params, proof, [c2])
    assert not H.verify(params, proof, [c2 + 1])
