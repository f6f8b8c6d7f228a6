"""Byte-oriented Schnorr over twisted-Edwards groups with a hash digest
challenge (primitives/src/signature/schnorr/mod.rs — ZEXE lineage).

sign: e = H(salt ‖ R ‖ msg) with retry until the digest decodes into the
scalar field; s = k − e·sk; includes the pk/signature randomization API
(signature/mod.rs:41-52).  Host implementation (byte crypto is not a TPU
workload); the group is any TE curve instance (Jubjub by default).

Divergence note: the reference hashes the *projective* point encoding; we
hash affine x‖y little-endian bytes — self-consistent, random-setup scheme.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass


class _HostTE:
    """host twisted-Edwards affine ops (complete formulas)."""

    def __init__(self, p, a, d, gen_xy):
        self.p = p
        self.a = a % p
        self.d = d % p
        self.gen = gen_xy

    def add(self, P, Q):
        if P is None:
            return Q
        if Q is None:
            return P
        p = self.p
        (x1, y1), (x2, y2) = P, Q
        dxy = self.d * x1 * x2 % p * y1 % p * y2 % p
        x3 = (x1 * y2 + y1 * x2) * pow(1 + dxy, -1, p) % p
        y3 = (y1 * y2 - self.a * x1 * x2) * pow(1 - dxy, -1, p) % p
        return (x3, y3)

    def mul(self, P, k):
        acc = None
        while k:
            if k & 1:
                acc = self.add(acc, P)
            P = self.add(P, P)
            k >>= 1
        return acc


@dataclass
class SchnorrByteSig:
    prover_response: int
    verifier_challenge: int


class SchnorrByteSignature:
    def __init__(self, curve="jubjub"):
        from ..params._gen import curves_gen as CG
        from .. import params as PP
        if curve == "jubjub":
            c = CG.JUBJUB
            self.fq = PP.JUBJUB_FQ
            self.fr = PP.JUBJUB_FR
        elif curve == "edwards_bls12":
            c = CG.EDWARDS_BLS12
            self.fq = PP.EDWARDS_BLS12_FQ
            self.fr = PP.EDWARDS_BLS12_FR
        else:
            raise ValueError(curve)
        self.te = _HostTE(self.fq.modulus, c["a"], c["d"],
                          (c["g_x"], c["g_y"]))
        self.params = None  # (generator, salt)

    # -- SignatureScheme API (signature/mod.rs:14-52) --

    def setup(self, rng):
        salt = bytes(rng.randrange(256) for _ in range(32))
        k = rng.randrange(1, self.fr.modulus)
        generator = self.te.mul(self.te.gen, k)
        self.params = (generator, salt)
        return self

    def keygen(self, rng):
        gen, _ = self.params
        sk = rng.randrange(1, self.fr.modulus)
        return self.te.mul(gen, sk), sk

    def _point_bytes(self, P):
        w = 8 * (-(-self.fq.modulus_bits // 64))
        return P[0].to_bytes(w, "little") + P[1].to_bytes(w, "little")

    def _challenge(self, salt, R, message):
        digest = hashlib.blake2s(
            salt + self._point_bytes(R) + message, digest_size=32).digest()
        # from_random_bytes: LE int, shave excess top bits, reject >= r
        v = int.from_bytes(digest, "little")
        shave = 256 - self.fr.modulus_bits
        v &= (1 << (256 - shave)) - 1
        return v if v < self.fr.modulus else None

    def sign(self, sk: int, message: bytes, rng) -> SchnorrByteSig:
        gen, salt = self.params
        r = self.fr.modulus
        while True:
            k = rng.randrange(1, r)
            R = self.te.mul(gen, k)
            e = self._challenge(salt, R, message)
            if e is None:
                continue
            s = (k - e * sk) % r
            return SchnorrByteSig(prover_response=s, verifier_challenge=e)

    def verify(self, pk, message: bytes, sig: SchnorrByteSig) -> bool:
        gen, salt = self.params
        R = self.te.add(self.te.mul(gen, sig.prover_response),
                        self.te.mul(pk, sig.verifier_challenge))
        e = self._challenge(salt, R, message)
        return e == sig.verifier_challenge

    # -- randomization (schnorr/mod.rs:162-220) --

    def randomize_public_key(self, pk, randomness: bytes):
        gen, _ = self.params
        mult = int.from_bytes(randomness, "little")
        return self.te.add(pk, self.te.mul(gen, mult % self.fr.modulus))

    def randomize_signature(self, sig: SchnorrByteSig, randomness: bytes
                            ) -> SchnorrByteSig:
        mult = int.from_bytes(randomness, "little") % self.fr.modulus
        s = (sig.prover_response - sig.verifier_challenge * mult) \
            % self.fr.modulus
        return SchnorrByteSig(prover_response=s,
                              verifier_challenge=sig.verifier_challenge)
