"""Poseidon-friendly field-based Merkle tree (batched level-wise build).

Mirrors FieldBasedMerkleHashTree (primitives/src/merkle_tree/
field_based_mht/mod.rs:100-266) with the same semantics:
* leaves are field elements (caller pre-hashes),
* the last level is padded to a power of two with
  ``empty = H(one)`` (hash_empty, mod.rs:262-266),
* a padding chain ``root <- H(root, empty)`` extends the tree to a fixed
  target HEIGHT (mod.rs:176-184),
* paths are (sibling, direction) lists, direction=True meaning the current
  node is the right child; verification re-hashes to the root (mod.rs:64-98).

The build is TPU-batch-first: each level is ONE batched 2-to-1 Poseidon call
over all sibling pairs (the reference hashes nodes one by one and relies on
rayon in callers).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..fields import fp as fpmod
from .poseidon import PoseidonHash


class FieldBasedMerkleTree:
    def __init__(self, hasher: PoseidonHash, height: int):
        self.h = hasher
        self.height = height  # max levels incl. leaves (P::HEIGHT)
        self.F = hasher.F
        self.levels = None    # [leaf level, ..., top computed level]
        self.padding = None   # list of (hash, empty) pairs
        self.root_digits = None

    def empty_leaf(self):
        one = jnp.asarray(self.F.one_mont)[None, None, :]
        return self.h.evaluate(one)[0]  # H(one)

    # levels with >= 2*_FIXED_BATCH leaves hash through ONE jitted
    # fixed-batch 2->1 graph (host-side chunk loop, small levels padded
    # up): a 2^16-leaf build is 1 compile instead of 17 per-level shapes —
    # the remote-compile latency of the tunnel made the naive form
    # uncompilable inside any bench budget.  Results are positionally
    # identical to the per-level path (pad lanes are discarded).
    _FIXED_BATCH = 1 << 12

    def _hash_fixed(self):
        # cached on the (shared) hash object, not the tree: every tree
        # over the same PoseidonHash reuses ONE jitted fixed-batch graph
        # (a per-tree cache would recompile per FieldBasedMerkleTree
        # instance — one tunnel compile each on the remote backend)
        fn = getattr(self.h, "_fixed_2to1_jit", None)
        if fn is None:
            fn = jax.jit(lambda l, r: self.h.hash_2_1(l, r))
            self.h._fixed_2to1_jit = fn
        return fn

    def _level_up(self, cur, use_fixed: bool):
        l, r = cur[0::2], cur[1::2]
        m = l.shape[0]
        if not use_fixed:
            return self.h.hash_2_1(l, r)
        B = self._FIXED_BATCH
        fn = self._hash_fixed()
        if m < B:
            pad = B - m
            lp = jnp.concatenate([l, jnp.zeros((pad,) + l.shape[1:],
                                               l.dtype)])
            rp = jnp.concatenate([r, jnp.zeros((pad,) + r.shape[1:],
                                               r.dtype)])
            return fn(lp, rp)[:m]
        outs = [fn(l[s:s + B], r[s:s + B]) for s in range(0, m, B)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def build(self, leaves, use_fixed=None):
        """leaves: [N, nd] Montgomery field elements.

        use_fixed: None -> auto (fixed-batch graph once the tree is big
        enough to amortize the padding); True forces every level through
        the single fixed-batch graph — callers on the remote-compile
        tunnel use this so a SMALL tree still costs one compile instead
        of one per level shape (bench.py poseidon rung A).
        """
        n = leaves.shape[0]
        n2 = 1 << max(0, (n - 1).bit_length())
        if n2 != n:
            pad = jnp.broadcast_to(self.empty_leaf(),
                                   (n2 - n, leaves.shape[-1]))
            leaves = jnp.concatenate([leaves, pad], axis=0)
        tree_height = n2.bit_length()  # levels incl. leaf level
        if tree_height > self.height:
            raise ValueError("tree exceeds configured HEIGHT")
        if use_fixed is None:
            use_fixed = n2 >= 2 * self._FIXED_BATCH

        levels = [leaves]
        cur = leaves
        while cur.shape[0] > 1:
            cur = self._level_up(cur, use_fixed)
            levels.append(cur)
        root = cur[0]

        padding = []
        cur_h = tree_height
        if cur_h < self.height:
            empty = self.empty_leaf()
        while cur_h < self.height:
            root = self.h.hash_2_1(root[None], empty[None])[0]
            padding.append(root)
            cur_h += 1

        self.levels = levels
        self.padding = padding
        self.root_digits = root
        return self

    def root(self):
        return self.root_digits

    def generate_proof(self, index: int):
        """-> list of (sibling [nd], direction bool); length height-1."""
        path = []
        idx = index
        for lvl in self.levels[:-1]:
            sib = idx ^ 1
            direction = bool(idx & 1)  # True: current node is right child
            path.append((np.asarray(lvl[sib]), direction))
            idx >>= 1
        empty = np.asarray(self.empty_leaf())
        for _ in self.padding:
            path.append((empty, False))
        if len(path) != self.height - 1:
            raise ValueError("incorrect path length")
        return path

    def verify_proof(self, root, leaf, path) -> bool:
        if len(path) != self.height - 1:
            raise ValueError("incorrect path length")
        prev = jnp.asarray(leaf)[None]
        for sib, direction in path:
            s = jnp.asarray(sib)[None]
            prev = (self.h.hash_2_1(s, prev) if direction
                    else self.h.hash_2_1(prev, s))
        return bool(np.asarray(jnp.all(prev[0] == jnp.asarray(root))))
