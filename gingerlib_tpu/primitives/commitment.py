"""Commitment schemes (primitives/src/commitment/*).

* PedersenCommitment: CRH(input) + [randomness]·G over any curve ops
  (pedersen/mod.rs:132 LoC): setup adds a randomness-generator doubling
  chain to the Pedersen CRH parameters.
* InjectiveMap compressors (injective_map/mod.rs): TE/SW point -> x
  coordinate (injective on the prime-order subgroup up to sign handling).
* Blake2sCommitment lives in blake2s.py.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .pedersen import PedersenCRH, PedersenWindow, _bytes_to_bits


class PedersenCommitment:
    def __init__(self, curve, window: PedersenWindow):
        self.g = curve
        self.crh = PedersenCRH(curve, window)
        self.rand_powers = None  # doubling chain of a random generator

    def setup(self, rng):
        self.crh.setup(rng)
        g = self.g
        r = g.scalar_field.modulus
        k = rng.randrange(1, r)
        base = g.mul_const(g.generator(()), k)
        from .pedersen import affine_host
        self.rand_base_host = affine_host(g, base)
        nbits = g.scalar_field.modulus_bits
        pts = []
        cur = base
        for _ in range(nbits):
            pts.append(cur)
            cur = g.double(cur)
        self.rand_powers = tuple(jnp.stack([p[i] for p in pts])
                                 for i in range(3))
        return self

    def commit(self, data: bytes, randomness: int):
        g = self.g
        base = self.crh.evaluate(data)
        nbits = g.scalar_field.modulus_bits
        bits = [(randomness >> i) & 1 for i in range(nbits)]
        mask = jnp.asarray(np.asarray(bits, bool))
        sel = g.select(mask, self.rand_powers, g.zero((nbits,)))
        cur = sel
        n = nbits
        while n > 1:
            if n % 2:
                cur = tuple(jnp.concatenate([c, z], 0)
                            for c, z in zip(cur, g.zero((1,))))
                n += 1
            cur = g.add(tuple(c[0::2] for c in cur),
                        tuple(c[1::2] for c in cur))
            n = cur[0].shape[0]
        rand_pt = tuple(c[0] for c in cur)
        return g.add(base, rand_pt)


class TECompressor:
    """TE injective map: (x, y) -> x (injective_map/mod.rs)."""

    @staticmethod
    def injective_map(curve, pt):
        x, _ = curve.to_affine(pt)
        return x


class PedersenCRHCompressor:
    """Pedersen CRH followed by the injective x-coordinate compression."""

    def __init__(self, curve, window: PedersenWindow):
        self.crh = PedersenCRH(curve, window)
        self.g = curve

    def setup(self, rng):
        self.crh.setup(rng)
        return self

    def evaluate(self, data: bytes):
        return TECompressor.injective_map(self.g, self.crh.evaluate(data))
