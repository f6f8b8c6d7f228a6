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

    # ------------------------------------------------------------------
    # single-dispatch build: the whole tree in ONE jitted lax.scan
    # ------------------------------------------------------------------
    #
    # The level-wise build above issues one jitted call per fixed-batch
    # chunk (~27 calls for a 2^16-leaf tree).  On the tunneled TPU
    # backend every dispatch costs seconds of round-trip latency, so the
    # build is latency- not compute-bound (round-5 measurement: >25 min
    # for a 2^16 build that computes in ~15 s).  Here the whole build is
    # one scan over a host-precomputed (src, dst) chunk schedule into a
    # flat node buffer; offsets travel as traced operands, and the
    # schedule/buffer/leaves are padded to a caller-fixed maximum size so
    # ONE compiled executable serves every tree up to that size.

    @staticmethod
    def _scan_layout(n2: int, ch: int):
        """Per-level (offset, size) in the flat buffer + chunk schedule.

        Every level region is padded to a multiple of 2*ch and zero-
        initialized; real nodes are contiguous at each region start, so
        chunk hashes of padding land beyond the real node count and are
        never read back as real data.
        """
        th = n2.bit_length()          # levels incl. leaves
        sizes = [n2 >> i for i in range(th)]
        pads = [max(2 * ch, -(-s // (2 * ch)) * (2 * ch)) for s in sizes]
        offs = [0]
        for p in pads[:-1]:
            offs.append(offs[-1] + p)
        total = offs[-1] + pads[-1]
        srcs, dsts = [], []
        for i in range(th - 1):
            pairs = sizes[i] // 2
            for k in range(max(1, -(-pairs // ch))):
                srcs.append(offs[i] + k * 2 * ch)
                dsts.append(offs[i + 1] + k * ch)
        return sizes, offs, total, srcs, dsts

    def build_scan(self, leaves, max_leaves: int | None = None):
        """Build the tree with ONE device dispatch (see block comment).

        max_leaves: pad the compiled shapes to this leaf count so one
        executable serves every build up to that size (bench.py uses
        2^16 for both its rungs).  Result state (levels/padding/root) is
        positionally identical to :meth:`build`.
        """
        n = leaves.shape[0]
        n2 = 1 << max(0, (n - 1).bit_length())
        if n2 != n:
            pad = jnp.broadcast_to(self.empty_leaf(),
                                   (n2 - n, leaves.shape[-1]))
            leaves = jnp.concatenate([leaves, pad], axis=0)
        tree_height = n2.bit_length()
        if tree_height > self.height:
            raise ValueError("tree exceeds configured HEIGHT")
        if n2 < 4:
            return self.build(leaves)
        m2 = max(n2, max_leaves or 0)
        ch = min(self._FIXED_BATCH, m2 // 2)   # from m2: shape-stable
        nd = leaves.shape[-1]

        sizes, offs, total, srcs, dsts = self._scan_layout(n2, ch)
        # pad shapes to the max_leaves layout: buffer total + step count,
        # plus one extra 2*ch scratch region that no-op steps write into
        # (it is never read back)
        _, _, total_m, srcs_m, _ = self._scan_layout(m2, ch)
        total = max(total, total_m) + 2 * ch
        n_steps = max(len(srcs), len(srcs_m))
        scratch = total - 2 * ch
        srcs += [srcs[-1]] * (n_steps - len(srcs))
        dsts += [scratch] * (n_steps - len(dsts))

        key = ("_tree_scan_jit", total, n_steps, ch, m2, nd)
        fn = getattr(self.h, "_tree_scan_cache", None)
        if fn is None:
            self.h._tree_scan_cache = {}
        fn = self.h._tree_scan_cache.get(key)
        if fn is None:
            hash21 = self.h.hash_2_1

            def run(leaves_p, srcs_a, dsts_a):
                buf = jnp.zeros((total, nd), jnp.uint32)
                buf = jax.lax.dynamic_update_slice(buf, leaves_p, (0, 0))

                def step(b, x):
                    s, d = x
                    blk = jax.lax.dynamic_slice(b, (s, 0), (2 * ch, nd))
                    lr = blk.reshape(ch, 2, nd)
                    out = hash21(lr[:, 0], lr[:, 1])
                    return jax.lax.dynamic_update_slice(b, out, (d, 0)), None

                buf, _ = jax.lax.scan(step, buf, (srcs_a, dsts_a))
                return buf

            fn = jax.jit(run)
            self.h._tree_scan_cache[key] = fn

        if m2 != n2:
            leaves = jnp.concatenate(
                [leaves, jnp.zeros((m2 - n2, nd), jnp.uint32)], axis=0)
        buf = fn(leaves, jnp.asarray(srcs, jnp.int32),
                 jnp.asarray(dsts, jnp.int32))

        self.levels = [buf[offs[i]:offs[i] + sizes[i]]
                       for i in range(tree_height)]
        root = buf[offs[-1]]
        padding = []
        cur_h = tree_height
        if cur_h < self.height:
            empty = self.empty_leaf()
        while cur_h < self.height:
            root = self.h.hash_2_1(root[None], empty[None])[0]
            padding.append(root)
            cur_h += 1
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
