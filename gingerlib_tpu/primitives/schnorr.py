"""Field-based Schnorr on the MNT cycle
(primitives/src/signature/schnorr/field_based_schnorr.rs).

sign: loop { k ← rand; R = kG; e = Poseidon(m ‖ R.x ‖ R.y ‖ pk.x);
retry unless e and s = k + e·sk have a leading zero bit (753↔753-bit
cross-field conversion, compute_truncation_size, primitives/src/lib.rs:75);
signature = (e, s) both represented in F = the hash field }.

The rejection loop is host-side python (data-dependent trip count — kept
off-device per SURVEY.md §7 hard part (e)); the group ops and Poseidon run
on device.
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import fp as fpmod
from ..ops import limbs
from .poseidon import PoseidonHash


@dataclass
class SchnorrSignature:
    e: int  # in F (hash field)
    s: int


class FieldBasedSchnorr:
    def __init__(self, curve, hasher: PoseidonHash):
        """curve: SWCurveOps whose base field == hasher field (the cycle
        wiring: sign over G with Poseidon on G's base field)."""
        self.g = curve
        self.h = hasher
        self.F = hasher.F                       # hash/base field
        self.Fr = curve.scalar_field            # scalar field
        assert curve.fp.modulus == hasher.F.modulus

    # -- helpers --

    def _trunc(self, from_bits: int, to_bits: int) -> int:
        d = from_bits - to_bits
        return d + 1 if d > 0 else (1 if d == 0 else 0)

    def _hash_ints(self, ints) -> int:
        arr = jnp.asarray(fpmod.fp_from_ints(self.F, ints))[None]
        out = jax.jit(self.h.evaluate)(arr)
        return fpmod.fp_to_int(self.F, np.asarray(out)[0])

    def _affine_ints(self, pt):
        x, y = jax.jit(self.g.to_affine)(pt)
        xi = fpmod.fp_to_int(self.g.fp, np.asarray(x)[..., 0, :].reshape(-1))
        yi = fpmod.fp_to_int(self.g.fp, np.asarray(y)[..., 0, :].reshape(-1))
        return xi, yi

    def _mul_gen(self, k: int):
        return jax.jit(lambda: self.g.mul_const(self.g.generator(()), k))()

    # -- api (signature/mod.rs:54-84) --

    def keygen(self, rng=None):
        sk = (rng.randrange(1, self.Fr.modulus) if rng
              else secrets.randbelow(self.Fr.modulus - 1) + 1)
        pk = self._mul_gen(sk)
        return pk, sk

    def get_public_key(self, sk: int):
        return self._mul_gen(sk)

    def sign(self, pk, sk: int, message, rng=None) -> SchnorrSignature:
        fbits = self.F.modulus_bits
        rbits = self.Fr.modulus_bits
        pk_x, _ = self._affine_ints(pk)
        while True:
            k = (rng.randrange(1, self.Fr.modulus) if rng
                 else secrets.randbelow(self.Fr.modulus - 1) + 1)
            R = self._mul_gen(k)
            rx, ry = self._affine_ints(R)
            e = self._hash_ints(list(message) + [rx, ry, pk_x])
            req = self._trunc(fbits, rbits)
            if fbits - e.bit_length() < req:
                continue
            s = (k + e * sk) % self.Fr.modulus
            req_s = self._trunc(rbits, fbits)
            if rbits - s.bit_length() < req_s:
                continue
            return SchnorrSignature(e=e, s=s)

    def verify(self, pk, message, sig: SchnorrSignature) -> bool:
        fbits = self.F.modulus_bits
        rbits = self.Fr.modulus_bits
        if fbits - sig.e.bit_length() < self._trunc(fbits, rbits):
            raise ValueError("signature.e too long")
        if rbits - sig.s.bit_length() < self._trunc(rbits, fbits):
            raise ValueError("signature.s too long")
        pk_x, _ = self._affine_ints(pk)
        # R' = s·G − e·pk
        sG = self._mul_gen(sig.s)
        kd = jnp.asarray(limbs.to_digits_batch([sig.e], self.Fr.n_digits))
        e_pk = jax.jit(lambda P, kd: self.g.mul_scalar_digits(P, kd))(
            tuple(c[None] for c in pk), kd)
        e_pk = tuple(c[0] for c in e_pk)
        r_prime = jax.jit(self.g.add)(sG, self.g.neg(e_pk))
        rx, ry = self._affine_ints(r_prime)
        e_prime = self._hash_ints(list(message) + [rx, ry, pk_x])
        return e_prime == sig.e

    def keyverify(self, pk) -> bool:
        x, y = jax.jit(self.g.to_affine)(pk)
        on = bool(np.asarray(jax.jit(self.g.on_curve)(x, y)))
        # prime-order subgroup check: [r]pk == 0
        z = jax.jit(lambda P: self.g.mul_const(P, self.Fr.modulus))(
            tuple(c[None] for c in pk))
        return on and bool(np.asarray(self.g.is_zero(z))[0])
