"""BLS12-377/381 ate pairing (curves/models/bls12): host oracle bilinearity,
GT order, and (device vs host) agreement."""

import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.params._gen import curves_gen as CG
from gingerlib_tpu.curves.pairing_host import (
    host_bls12_377_pairing, host_bls12_381_pairing)
from gingerlib_tpu.proofs.groth16_host import ec_mul, _FqWrap
from gingerlib_tpu.gadgets.std.ext_fields import FpGOps

# slow: full BLS12 Miller loops + final exponentiation, eager on CPU (>420 s measured round 5)
pytestmark = pytest.mark.slow


CASES = [
    ("bls12_377", host_bls12_377_pairing, CG.BLS12_377, "BLS12_377_FR"),
    ("bls12_381", host_bls12_381_pairing, CG.BLS12_381, "JUBJUB_FQ"),
]


@pytest.mark.parametrize("name,mk,c,frname", CASES)
def test_host_bilinearity(name, mk, c, frname):
    E = mk()
    base = FpGOps(_FqWrap(E.p))
    G1 = ([c["g1_x"]], [c["g1_y"]])
    G2 = (list(c["g2_x"]), list(c["g2_y"]))
    e = E.pairing(G1, G2)
    P3 = ec_mul(base, [0], G1, 3)
    Q5 = ec_mul(E.S, [0, 0], G2, 5)
    assert E.pairing(P3, Q5) == E._fpow(e, 15)
    assert e != E._fone()


@pytest.mark.parametrize("name,mk,c,frname", CASES)
def test_host_gt_has_order_r(name, mk, c, frname):
    E = mk()
    fr = getattr(PP, frname).modulus
    G1 = ([c["g1_x"]], [c["g1_y"]])
    G2 = (list(c["g2_x"]), list(c["g2_y"]))
    e = E.pairing(G1, G2)
    assert E._fpow(e, fr) == E._fone()


def test_device_matches_host_377():
    from gingerlib_tpu.curves import instances as CI
    import numpy as np
    from gingerlib_tpu.fields.towers import ext_to_ints
    eng = CI.bls12_377_pairing()
    E = host_bls12_377_pairing()
    c = CG.BLS12_377
    g1 = eng.g1.to_affine(eng.g1.generator(()))
    g2 = eng.g2.to_affine(eng.g2.generator(()))
    gt = eng.pairing(g1, g2)
    host = E.pairing(([c["g1_x"]], [c["g1_y"]]),
                     (list(c["g2_x"]), list(c["g2_y"])))
    got = ext_to_ints(eng.fqk, np.asarray(gt))
    assert got == [v % E.p for v in host]
