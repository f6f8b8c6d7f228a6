"""Byte-oriented Merkle tree over any FixedLengthCRH
(primitives/src/merkle_tree/mod.rs — the ZEXE MerkleHashTree).

Leaves are byte strings hashed to group elements; inner nodes hash the
serialized (compressed x-coordinate) children.  Host orchestration; the
CRH evaluations can run on device through the Pedersen primitives.
"""

from __future__ import annotations

import hashlib


class ByteMerkleTree:
    """Generic over a crh object exposing evaluate(bytes) -> digest bytes.

    For parity with MerkleTreeConfig (mod.rs:460) the tree has a fixed
    HEIGHT; missing leaves are padded with the hash of an empty leaf.
    """

    def __init__(self, crh, height: int, leaf_size: int = 32):
        self.crh = crh
        self.height = height
        self.leaf_size = leaf_size
        self.levels = None

    def _hash_leaf(self, leaf: bytes) -> bytes:
        return self.crh.evaluate(leaf.ljust(self.leaf_size, b"\x00"))

    def _hash_inner(self, left: bytes, right: bytes) -> bytes:
        return self.crh.evaluate(left + right)

    def build(self, leaves):
        hashed = [self._hash_leaf(l) for l in leaves]
        n2 = 1 << max(0, (len(hashed) - 1).bit_length())
        empty = self._hash_leaf(b"")
        hashed += [empty] * (n2 - len(hashed))
        if n2.bit_length() > self.height:
            raise ValueError("tree exceeds height")
        levels = [hashed]
        cur = hashed
        while len(cur) > 1:
            cur = [self._hash_inner(cur[i], cur[i + 1])
                   for i in range(0, len(cur), 2)]
            levels.append(cur)
        root = cur[0]
        h = n2.bit_length()
        while h < self.height:
            root = self._hash_inner(root, empty)
            levels.append([root])
            h += 1
        self.levels = levels
        self.empty = empty
        self.n_real_levels = n2.bit_length()
        return self

    def root(self) -> bytes:
        return self.levels[-1][0]

    def generate_proof(self, index: int):
        path = []
        idx = index
        for lvl in range(self.n_real_levels - 1):
            sib = idx ^ 1
            path.append((self.levels[lvl][sib], bool(idx & 1)))
            idx >>= 1
        for _ in range(self.height - self.n_real_levels):
            path.append((self.empty, False))
        return path

    def verify_proof(self, root: bytes, leaf: bytes, path) -> bool:
        cur = self._hash_leaf(leaf)
        for sib, is_right in path:
            cur = self._hash_inner(sib, cur) if is_right \
                else self._hash_inner(cur, sib)
        return cur == root


class Blake2sCRH:
    """simple byte CRH for tests (stand-in for Pedersen byte digests)."""

    @staticmethod
    def evaluate(data: bytes) -> bytes:
        return hashlib.blake2s(data, digest_size=32).digest()
