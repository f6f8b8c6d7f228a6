"""ECVRF: host prove/verify + in-circuit proof-to-hash gadget."""

import random

import pytest

from gingerlib_tpu import params as PP
from gingerlib_tpu.params._gen import curves_gen as CG
from gingerlib_tpu.relations.r1cs import ConstraintSystem
from gingerlib_tpu.gadgets.std.fp import FpG
from gingerlib_tpu.gadgets.crypto.vrf import mnt4753_vrf_gadget
from gingerlib_tpu.gadgets.crypto.schnorr import _trunc
from gingerlib_tpu.primitives.group_hash_host import mnt6753_g1_group_hash
from gingerlib_tpu.primitives.poseidon_host import PoseidonHost
from gingerlib_tpu.proofs.groth16_host import ec_mul, ec_add_general, \
    ec_neg, _FqWrap
from gingerlib_tpu.gadgets.std.ext_fields import FpGOps

F = PP.MNT4753_FR
RF = PP.MNT6753_FR


class HostVrf:
    def __init__(self, gh):
        c = CG.MNT6753
        self.base = FpGOps(_FqWrap(F.modulus))
        self.a = [c["a"] % F.modulus]
        self.gen = ([c["g1_x"]], [c["g1_y"]])
        self.h = PoseidonHost.mnt4753()
        self.gh = gh

    def _msg_to_curve(self, message):
        width = 8 * (-(-F.modulus_bits // 64))
        data = b"".join(int(m).to_bytes(width, "little") for m in message)
        return self.gh.evaluate(data)

    def keygen(self, rng):
        sk = rng.randrange(1, RF.modulus)
        return ec_mul(self.base, self.a, self.gen, sk), sk

    def prove(self, pk, sk, message, rng):
        fb, rb = F.modulus_bits, RF.modulus_bits
        mh = self._msg_to_curve(message)
        gamma = ec_mul(self.base, self.a, mh, sk)
        while True:
            r = rng.randrange(1, RF.modulus)
            av = ec_mul(self.base, self.a, self.gen, r)
            bv = ec_mul(self.base, self.a, mh, r)
            c = self.h.evaluate(list(message) + [pk[0][0], av[0][0],
                                                 bv[0][0]])
            if fb - c.bit_length() < _trunc(fb, rb):
                continue
            s = (r + sk * c) % RF.modulus
            if rb - s.bit_length() < _trunc(rb, fb):
                continue
            return (gamma, c, s)

    def proof_to_hash(self, pk, message, proof):
        gamma, c, s = proof
        mh = self._msg_to_curve(message)
        sG = ec_mul(self.base, self.a, self.gen, s)
        u = ec_add_general(self.base, self.a, sG,
                           ec_neg(ec_mul(self.base, self.a, pk, c),
                                  F.modulus))
        v = ec_add_general(self.base, self.a,
                           ec_mul(self.base, self.a, mh, s),
                           ec_neg(ec_mul(self.base, self.a, gamma, c),
                                  F.modulus))
        cp = self.h.evaluate(list(message) + [pk[0][0], u[0][0], v[0][0]])
        if cp != c:
            raise ValueError("VRF verification failed")
        return self.h.evaluate(list(message) + [gamma[0][0], gamma[1][0]])


@pytest.fixture(scope="module")
def vrf_setup():
    rng = random.Random(9174123)
    # 96 message bytes -> 256 3-bit chunks; 4 segments of 64 chunks
    gh = mnt6753_g1_group_hash(window_size=64, num_windows=4).setup(rng)
    hv = HostVrf(gh)
    pk, sk = hv.keygen(rng)
    message = [987654321]
    proof = hv.prove(pk, sk, message, rng)
    out = hv.proof_to_hash(pk, message, proof)
    return gh, hv, pk, message, proof, out


def test_host_vrf_roundtrip(vrf_setup):
    gh, hv, pk, message, proof, out = vrf_setup
    assert out == hv.proof_to_hash(pk, message, proof)
    with pytest.raises(ValueError):
        hv.proof_to_hash(pk, [message[0] + 1], proof)


@pytest.mark.slow
def test_vrf_gadget(vrf_setup):
    gh, hv, pk, message, proof, out = vrf_setup
    vg = mnt4753_vrf_gadget(gh)
    cs = ConstraintSystem(F)
    pkg = vg.g.alloc_checked(cs, pk, "pk")
    gamma, c, s = proof
    proofg = vg.alloc_proof(cs, (gamma, c, s))
    msg = [FpG.alloc(cs, m) for m in message]
    outw = vg.enforce_proof_to_hash_verification(cs, pkg, proofg, msg)
    assert outw.value == out
    bad = cs.which_is_unsatisfied()
    assert bad is None, f"unsatisfied: {bad}"
