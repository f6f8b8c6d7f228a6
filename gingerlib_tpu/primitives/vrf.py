"""Field-based EC-VRF (primitives/src/vrf/ecvrf/mod.rs).

prove: mh = BoweHopwood(message bytes); γ = sk·mh;
  loop { r ← rand; a = r·G; b = r·mh; c = Poseidon(m ‖ pk.x ‖ a.x ‖ b.x);
         retry unless c and s = r + c·sk satisfy the cross-field truncation
         bounds }  → proof (γ, c, s).
proof_to_hash: length + subgroup checks on γ; u = s·G − c·pk;
  v = s·mh − c·γ; c' must equal c; output = Poseidon(m ‖ γ.x ‖ γ.y).
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
from .pedersen import BoweHopwoodCRH


@dataclass
class EcVrfProof:
    gamma: tuple   # affine (x digits, y digits) numpy
    c: int
    s: int


class FieldBasedEcVrf:
    def __init__(self, curve, hasher: PoseidonHash,
                 group_hash: BoweHopwoodCRH):
        self.g = curve
        self.h = hasher
        self.gh = group_hash
        self.F = hasher.F
        self.Fr = curve.scalar_field

    # -- helpers (shared with schnorr) --

    def _trunc(self, from_bits, to_bits):
        d = from_bits - to_bits
        return d + 1 if d > 0 else (1 if d == 0 else 0)

    def _hash_ints(self, ints) -> int:
        arr = jnp.asarray(fpmod.fp_from_ints(self.F, ints))[None]
        out = jax.jit(self.h.evaluate)(arr)
        return fpmod.fp_to_int(self.F, np.asarray(out)[0])

    def _affine_ints(self, pt):
        x, y = jax.jit(self.g.to_affine)(pt)
        xi = fpmod.fp_to_int(self.g.fp, np.asarray(x).reshape(-1))
        yi = fpmod.fp_to_int(self.g.fp, np.asarray(y).reshape(-1))
        return xi, yi

    def _msg_to_curve(self, message):
        """field elems -> reference ToBytes bytes -> BH group hash."""
        width = 8 * (-(-self.F.modulus_bits // 64))
        data = b"".join(int(m).to_bytes(width, "little") for m in message)
        return self.gh.evaluate(data)

    def _mul(self, pt, k: int):
        kd = jnp.asarray(limbs.to_digits_batch([k % self.Fr.modulus],
                                               self.Fr.n_digits))
        out = jax.jit(self.g.mul_scalar_digits)(
            tuple(c[None] for c in pt), kd)
        return tuple(c[0] for c in out)

    def keygen(self, rng=None):
        sk = (rng.randrange(1, self.Fr.modulus) if rng
              else secrets.randbelow(self.Fr.modulus - 1) + 1)
        pk = jax.jit(lambda: self.g.mul_const(self.g.generator(()), sk))()
        return pk, sk

    def prove(self, pk, sk: int, message, rng=None) -> EcVrfProof:
        fbits, rbits = self.F.modulus_bits, self.Fr.modulus_bits
        for m in message:
            if not (0 <= m < self.F.modulus):
                raise ValueError("message element out of range")
        mh = self._msg_to_curve(message)
        gamma = self._mul(mh, sk)
        pk_x, _ = self._affine_ints(pk)
        while True:
            r = (rng.randrange(1, self.Fr.modulus) if rng
                 else secrets.randbelow(self.Fr.modulus - 1) + 1)
            a = self._mul(self.g.generator(()), r)
            b = self._mul(mh, r)
            ax, _ = self._affine_ints(a)
            bx, _ = self._affine_ints(b)
            c = self._hash_ints(list(message) + [pk_x, ax, bx])
            if fbits - c.bit_length() < self._trunc(fbits, rbits):
                continue
            s = (r + sk * c) % self.Fr.modulus
            if rbits - s.bit_length() < self._trunc(rbits, fbits):
                continue
            gx, gy = self._affine_ints(gamma)
            return EcVrfProof(gamma=(gx, gy), c=c, s=s)

    def proof_to_hash(self, pk, message, proof: EcVrfProof) -> int:
        fbits, rbits = self.F.modulus_bits, self.Fr.modulus_bits
        if fbits - proof.c.bit_length() < self._trunc(fbits, rbits):
            raise ValueError("proof.c too long")
        if rbits - proof.s.bit_length() < self._trunc(rbits, fbits):
            raise ValueError("proof.s too long")
        gx, gy = proof.gamma
        gamma_pt = self.g.from_affine(
            jnp.asarray(fpmod.fp_from_int(self.g.fp, gx))[None],
            jnp.asarray(fpmod.fp_from_int(self.g.fp, gy))[None])
        gamma_pt = tuple(c[0] for c in gamma_pt)
        # subgroup check
        on = bool(np.asarray(jax.jit(self.g.on_curve)(
            gamma_pt[0], gamma_pt[1])))
        z = self._mul(gamma_pt, self.Fr.modulus)
        if not (on and bool(np.asarray(self.g.is_zero(z)))):
            raise ValueError("gamma not in prime-order subgroup")

        mh = self._msg_to_curve(message)
        sG = self._mul(self.g.generator(()), proof.s)
        c_pk = self._mul(pk, proof.c)
        u = jax.jit(self.g.add)(sG, self.g.neg(c_pk))
        s_mh = self._mul(mh, proof.s)
        c_gamma = self._mul(gamma_pt, proof.c)
        v = jax.jit(self.g.add)(s_mh, self.g.neg(c_gamma))
        pk_x, _ = self._affine_ints(pk)
        ux, _ = self._affine_ints(u)
        vx, _ = self._affine_ints(v)
        c_prime = self._hash_ints(list(message) + [pk_x, ux, vx])
        if c_prime != proof.c:
            raise ValueError("VRF verification failed")
        return self._hash_ints(list(message) + [gx, gy])
