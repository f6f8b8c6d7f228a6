"""Merkle path gadget (r1cs/gadgets/crypto/src/merkle_tree/
field_based_mht/mod.rs:31-106).

Per level: conditional swap by the direction bit (2 select constraints) +
one in-circuit Poseidon 2-to-1; the final digest is enforced equal to the
root (hard, conditional, or boolean-verdict variants).
"""

from __future__ import annotations

from ..std.boolean import Boolean
from ..std.fp import FpG
from .poseidon import PoseidonGadget


class MerklePathGadget:
    def __init__(self, hasher: PoseidonGadget):
        self.h = hasher

    def alloc_path(self, cs, path=None, height=None, name="path"):
        """path: host list of (sibling_int, direction_bool) or None (setup).
        Returns list of (FpG sibling, Boolean direction)."""
        n = len(path) if path is not None else height - 1
        out = []
        for i in range(n):
            if path is not None:
                sib, d = path[i]
            else:
                sib, d = None, None
            out.append((FpG.alloc(cs, sib, f"{name}/sib{i}"),
                        Boolean.alloc(cs, d, f"{name}/dir{i}")))
        return out

    def root_from_leaf(self, cs, leaf: FpG, path, name="mht"):
        cur = leaf
        for i, (sib, direction) in enumerate(path):
            # direction=True: cur is the right child
            left = FpG.cond_select(direction, sib, cur, f"{name}/l{i}")
            right = FpG.cond_select(direction, cur, sib, f"{name}/r{i}")
            cur = self.h.hash_2_1(cs, left, right, f"{name}/h{i}")
        return cur

    def check_membership(self, cs, root: FpG, leaf: FpG, path, name="mht"):
        cur = self.root_from_leaf(cs, leaf, path, name)
        cur.enforce_equal(root, f"{name}/root_eq")

    def conditionally_check_membership(self, cs, root: FpG, leaf: FpG, path,
                                       should_enforce: Boolean, name="mht"):
        cur = self.root_from_leaf(cs, leaf, path, name)
        cur.conditionally_enforce_equal(root, should_enforce,
                                        f"{name}/root_cond_eq")

    def membership_verdict(self, cs, root: FpG, leaf: FpG, path,
                           name="mht") -> Boolean:
        cur = self.root_from_leaf(cs, leaf, path, name)
        return cur.is_eq(root, f"{name}/root_verdict")
