"""TE group gadget + Pedersen CRH/commitment/injective-map gadgets vs the
host primitives (r1cs/gadgets/crypto/src/crh/pedersen,
commitment/pedersen.rs, crh/injective_map)."""

import random

import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.curves import instances as CI
from gingerlib_tpu.relations.r1cs import ConstraintSystem
from gingerlib_tpu.primitives.pedersen import (
    PedersenCRH, PedersenWindow, affine_host, _bytes_to_bits)
from gingerlib_tpu.primitives.commitment import PedersenCommitment
from gingerlib_tpu.gadgets.std.te_groups import TEGroupGadget
from gingerlib_tpu.gadgets.crypto.pedersen import (
    PedersenCRHGadget, PedersenCommitmentGadget, PedersenCRHCompressorGadget,
    bytes_to_bit_gadgets)

# slow: >420 s (not-slow subset) on this 1-core box, round-5 measurement
pytestmark = pytest.mark.slow


WINDOW = PedersenWindow(window_size=4, num_windows=8)  # 32 bits = 4 bytes


@pytest.fixture(scope="module")
def setup():
    te = CI.jubjub()
    crh = PedersenCRH(te, WINDOW).setup(random.Random(42))
    return te, crh


def test_te_gadget_group_law(setup):
    te, _ = setup
    gg = TEGroupGadget.for_curve(te)
    cs = ConstraintSystem(te.fp)
    p = te.fp.modulus
    gx, gy = affine_host(te, te.generator(()))
    G = gg.alloc_checked(cs, (gx, gy), "G")
    G2 = gg.double(cs, G, "G2")
    G3a = gg.add(cs, G2, G, "G3a")
    G3b = gg.add(cs, G, G2, "G3b")
    gg.enforce_equal(cs, G3a, G3b, "assoc")
    # identity: G + 0 = G
    Gi = gg.add(cs, G, gg.zero(cs), "Gid")
    gg.enforce_equal(cs, Gi, G, "id")
    # inverse: G + (−G) = 0
    Z = gg.add(cs, G, gg.neg(cs, G), "Ginv")
    gg.enforce_equal(cs, Z, gg.zero(cs), "inv")
    assert cs.which_is_unsatisfied() is None


def test_te_gadget_matches_host_mul(setup):
    te, _ = setup
    gg = TEGroupGadget.for_curve(te)
    cs = ConstraintSystem(te.fp)
    from gingerlib_tpu.gadgets.std.boolean import Boolean
    gxy = affine_host(te, te.generator(()))
    k = 0b101101
    bits = [Boolean.alloc(cs, bool((k >> i) & 1), f"k{i}") for i in range(6)]
    G = gg.alloc_checked(cs, gxy, "G")
    R = gg.mul_bits(cs, G, bits, "mul")
    expect = affine_host(te, te.mul_const(te.generator(()), k))
    exp_pt = gg.constant(cs, expect)
    gg.enforce_equal(cs, R, exp_pt, "eq")
    assert cs.which_is_unsatisfied() is None
    # fixed-base path agrees too
    R2 = gg.mul_bits_fixed_base(cs, gxy, bits, "fb")
    gg.enforce_equal(cs, R2, exp_pt, "eq2")
    assert cs.which_is_unsatisfied() is None


def test_pedersen_crh_gadget_matches_primitive(setup):
    te, crh = setup
    msg = b"abcd"
    expect = affine_host(te, crh.evaluate(msg))

    gg = TEGroupGadget.for_curve(te)
    gadget = PedersenCRHGadget(gg, WINDOW, crh.generators_host)
    cs = ConstraintSystem(te.fp)
    bits = bytes_to_bit_gadgets(cs, msg)
    out = gadget.check_evaluation(cs, bits)
    assert (out.x.value, out.y.value) == expect
    gg.enforce_equal(cs, out, gg.constant(cs, expect), "eq")
    assert cs.which_is_unsatisfied() is None


def test_pedersen_compressor_gadget(setup):
    te, crh = setup
    msg = b"zyxw"
    expect = affine_host(te, crh.evaluate(msg))
    gg = TEGroupGadget.for_curve(te)
    gadget = PedersenCRHCompressorGadget(gg, WINDOW, crh.generators_host)
    cs = ConstraintSystem(te.fp)
    bits = bytes_to_bit_gadgets(cs, msg)
    x = gadget.check_evaluation(cs, bits)
    assert x.value == expect[0]
    assert cs.which_is_unsatisfied() is None


def test_pedersen_commitment_gadget():
    te = CI.jubjub()
    comm = PedersenCommitment(te, WINDOW).setup(random.Random(7))
    msg = b"m!"
    randomness = 123456789
    expect = affine_host(te, comm.commit(msg, randomness))

    gg = TEGroupGadget.for_curve(te)
    gadget = PedersenCommitmentGadget(
        gg, WINDOW, comm.crh.generators_host, comm.rand_base_host)
    cs = ConstraintSystem(te.fp)
    from gingerlib_tpu.gadgets.std.boolean import Boolean
    bits = bytes_to_bit_gadgets(cs, msg)
    nbits = te.scalar_field.modulus_bits
    rbits = [Boolean.alloc(cs, bool((randomness >> i) & 1), f"r{i}")
             for i in range(nbits)]
    out = gadget.check_commitment(cs, bits, rbits)
    assert (out.x.value, out.y.value) == expect
    gg.enforce_equal(cs, out, gg.constant(cs, expect), "eq")
    assert cs.which_is_unsatisfied() is None
