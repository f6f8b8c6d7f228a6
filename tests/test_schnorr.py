"""Field-based Schnorr: host sign/verify + in-circuit verification gadget.

Instantiation mirrors the reference tests: group = MNT6-753 G1 (base field
mnt6753 Fq = MNT4753Fr), hash = Poseidon over that field.
"""

import random

import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.params._gen import curves_gen as CG
from gingerlib_tpu.relations.r1cs import ConstraintSystem
from gingerlib_tpu.gadgets.std.fp import FpG
from gingerlib_tpu.gadgets.std.ext_fields import FpGOps
from gingerlib_tpu.gadgets.crypto.schnorr import mnt4753_schnorr_gadget, \
    _trunc
from gingerlib_tpu.primitives.poseidon_host import PoseidonHost
from gingerlib_tpu.proofs.groth16_host import ec_mul, ec_add_general, \
    ec_neg, _FqWrap


F = PP.MNT4753_FR            # hash field = mnt6753 fq
RF = PP.MNT6753_FR           # scalar field of mnt6753 g1


class HostSchnorr:
    """host signer over MNT6-753 G1 + MNT4 Poseidon (primitive oracle)."""

    def __init__(self):
        c = CG.MNT6753
        self.base = FpGOps(_FqWrap(F.modulus))
        self.a = [c["a"] % F.modulus]
        self.gen = ([c["g1_x"]], [c["g1_y"]])
        self.h = PoseidonHost.mnt4753()

    def keygen(self, rng):
        sk = rng.randrange(1, RF.modulus)
        return ec_mul(self.base, self.a, self.gen, sk), sk

    def sign(self, pk, sk, message, rng):
        fb, rb = F.modulus_bits, RF.modulus_bits
        while True:
            k = rng.randrange(1, RF.modulus)
            R = ec_mul(self.base, self.a, self.gen, k)
            e = self.h.evaluate(list(message) + [R[0][0], R[1][0],
                                                 pk[0][0]])
            if fb - e.bit_length() < _trunc(fb, rb):
                continue
            s = (k + e * sk) % RF.modulus
            if rb - s.bit_length() < _trunc(rb, fb):
                continue
            return (e, s)

    def verify(self, pk, message, sig):
        e, s = sig
        sG = ec_mul(self.base, self.a, self.gen, s)
        e_pk = ec_mul(self.base, self.a, pk, e)
        r = ec_add_general(self.base, self.a, sG,
                           ec_neg(e_pk, F.modulus))
        e_prime = self.h.evaluate(list(message) + [r[0][0], r[1][0],
                                                   pk[0][0]])
        return e_prime == e


@pytest.fixture(scope="module")
def signed():
    rng = random.Random(1231275789)
    hs = HostSchnorr()
    pk, sk = hs.keygen(rng)
    message = [424242]
    sig = hs.sign(pk, sk, message, rng)
    assert hs.verify(pk, message, sig)
    assert not hs.verify(pk, [424243], sig)
    return hs, pk, message, sig


def test_schnorr_gadget_verification(signed):
    hs, pk, message, sig = signed
    vg = mnt4753_schnorr_gadget()
    cs = ConstraintSystem(F)
    pkg = vg.g.alloc_checked(cs, pk, "pk")
    sigg = vg.alloc_signature(cs, sig)
    msg = [FpG.alloc(cs, m) for m in message]
    vg.enforce_signature_verification(cs, pkg, sigg, msg)
    bad = cs.which_is_unsatisfied()
    assert bad is None, f"unsatisfied: {bad}"


def test_schnorr_gadget_verdict(signed):
    hs, pk, message, sig = signed
    vg = mnt4753_schnorr_gadget()
    cs = ConstraintSystem(F)
    pkg = vg.g.alloc_checked(cs, pk, "pk")
    sigg = vg.alloc_signature(cs, sig)
    msg = [FpG.alloc(cs, m) for m in message]
    v = vg.enforce_signature_verdict(cs, pkg, sigg, msg)
    assert v.get_value() == 1
    assert cs.which_is_unsatisfied() is None
    # wrong message -> verdict 0, still satisfiable
    cs2 = ConstraintSystem(F)
    pkg2 = vg.g.alloc_checked(cs2, pk, "pk")
    sigg2 = vg.alloc_signature(cs2, sig)
    msg2 = [FpG.alloc(cs2, message[0] + 1)]
    v2 = vg.enforce_signature_verdict(cs2, pkg2, sigg2, msg2)
    assert v2.get_value() == 0
    assert cs2.which_is_unsatisfied() is None


def test_schnorr_gadget_rejects_bad_sig(signed):
    hs, pk, message, sig = signed
    vg = mnt4753_schnorr_gadget()
    cs = ConstraintSystem(F)
    pkg = vg.g.alloc_checked(cs, pk, "pk")
    sigg = vg.alloc_signature(cs, (sig[0] + 1, sig[1]))
    msg = [FpG.alloc(cs, m) for m in message]
    vg.enforce_signature_verification(cs, pkg, sigg, msg)
    assert cs.which_is_unsatisfied() is not None
