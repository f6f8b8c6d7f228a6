"""BLS12-377 in-circuit pairing gadget vs host pairing oracle
(r1cs/gadgets/std/src/pairing/bls12 role)."""

import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.params._gen import curves_gen as CG
from gingerlib_tpu.relations.r1cs import ConstraintSystem
from gingerlib_tpu.curves.pairing_host import host_bls12_377_pairing
from gingerlib_tpu.proofs.groth16_host import ec_mul, _FqWrap
from gingerlib_tpu.gadgets.std.ext_fields import FpGOps
from gingerlib_tpu.gadgets.std.groups import SWGroupGadget
from gingerlib_tpu.gadgets.std.pairing_bls12 import bls12_377_pairing_gadget


@pytest.fixture(scope="module")
def setup():
    pg, base, fq2, fq12 = bls12_377_pairing_gadget()
    E = host_bls12_377_pairing()
    c = CG.BLS12_377
    hbase = FpGOps(_FqWrap(E.p))
    P = ([c["g1_x"]], [c["g1_y"]])
    Q = (list(c["g2_x"]), list(c["g2_y"]))
    P2 = ec_mul(hbase, [0], P, 2)
    gt = E.pairing(P2, Q)
    return pg, base, fq2, fq12, E, c, P2, Q, gt


@pytest.mark.slow
def test_pairing_gadget_matches_host(setup):
    pg, base, fq2, fq12, E, c, P2, Q, gt = setup
    cs = ConstraintSystem(PP.BLS12_377_FQ)
    g1g = SWGroupGadget(base, [c["a"]], [c["b"]])
    p_w = g1g.alloc_checked(cs, P2, "P")
    q_w = pg.g2.alloc_checked(cs, Q, "Q")
    out = pg.pairing_product(cs, [p_w], [q_w])
    fq12.enforce_equal(cs, out, fq12.const(cs, gt), "gt_eq")
    bad = cs.which_is_unsatisfied()
    assert bad is None, f"unsatisfied at {bad}"
    print(f"bls12 pairing gadget: {cs.num_constraints} constraints")


@pytest.mark.slow
def test_pairing_gadget_rejects_wrong_gt(setup):
    pg, base, fq2, fq12, E, c, P2, Q, gt = setup
    cs = ConstraintSystem(PP.BLS12_377_FQ)
    g1g = SWGroupGadget(base, [c["a"]], [c["b"]])
    p_w = g1g.alloc_checked(cs, P2, "P")
    q_w = pg.g2.alloc_checked(cs, Q, "Q")
    out = pg.pairing_product(cs, [p_w], [q_w])
    wrong = list(gt)
    wrong[0] = (wrong[0] + 1) % E.p
    fq12.enforce_equal(cs, out, fq12.const(cs, wrong), "gt_eq")
    assert cs.which_is_unsatisfied() is not None
