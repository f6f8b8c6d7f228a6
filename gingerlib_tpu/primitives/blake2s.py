"""Blake2s PRF and commitment (primitives/src/prf/blake2s,
commitment/blake2s) — thin wrappers over hashlib's RFC-7693 blake2s,
matching the Rust `blake2` crate's unkeyed Blake2s256.
"""

from __future__ import annotations

import hashlib


class Blake2sPRF:
    """PRF::evaluate(seed, input) = blake2s(seed ‖ input)
    (prf/blake2s/mod.rs:15-25); 32-byte seed/input/output."""

    @staticmethod
    def evaluate(seed: bytes, data: bytes) -> bytes:
        if len(seed) != 32 or len(data) != 32:
            raise ValueError("blake2s PRF expects 32-byte seed and input")
        h = hashlib.blake2s(digest_size=32)
        h.update(seed)
        h.update(data)
        return h.digest()


class Blake2sCommitment:
    """commit(input, randomness) = blake2s(input ‖ randomness)
    (commitment/blake2s/mod.rs); 32-byte randomness."""

    @staticmethod
    def setup(_rng=None):
        return None

    @staticmethod
    def commit(_params, data: bytes, randomness: bytes) -> bytes:
        if len(randomness) != 32:
            raise ValueError("blake2s commitment expects 32-byte randomness")
        h = hashlib.blake2s(digest_size=32)
        h.update(data)
        h.update(randomness)
        return h.digest()
