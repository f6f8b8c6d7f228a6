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


# ---------------------------------------------------------------------------
# byte-oriented Merkle path gadget (r1cs/gadgets/crypto/src/merkle_tree/
# mod.rs — the ZEXE byte-MHT gadget, here over the Blake2s CRH gadget to
# match primitives/merkle_bytes.ByteMerkleTree)
# ---------------------------------------------------------------------------

def _u8_cond_select(cs, cond, a, b, name):
    """byte select: cond ? a : b, and its complement (b if cond else a).

    Bitwise: t = a⊕b, s = t·cond, left = b⊕s, right = a⊕s — 3 constraints
    per bit, both orderings from one AND."""
    from ..std.uint import UInt8
    left_bits, right_bits = [], []
    for i in range(8):
        t = a.bits[i].xor(cs, b.bits[i])
        s = t.and_(cs, cond)
        left_bits.append(b.bits[i].xor(cs, s))
        right_bits.append(a.bits[i].xor(cs, s))
    cv = cond.get_value()
    if cv is None or a.value is None or b.value is None:
        lv = rv = None
    else:
        lv, rv = (a.value, b.value) if cv else (b.value, a.value)
    return UInt8(left_bits, lv), UInt8(right_bits, rv)


class ByteMerklePathGadget:
    """Path verification for ByteMerkleTree (primitives/merkle_bytes.py):
    leaf is padded to leaf_size and hashed; per level the current digest and
    the sibling are ordered by the direction bit and re-hashed; the final
    digest is enforced equal to the root bytes."""

    def __init__(self, leaf_size: int = 32):
        self.leaf_size = leaf_size

    def check_membership(self, cs, root_bytes, leaf_u8s, path,
                         name="bmht"):
        """root_bytes: host bytes (public constant); leaf_u8s: UInt8 wires;
        path: list of (sibling UInt8 list, direction Boolean)."""
        from ..std.uint import UInt8
        from .blake2s import blake2s_gadget
        padded = list(leaf_u8s) + [UInt8.constant(0)] * \
            (self.leaf_size - len(leaf_u8s))
        cur = blake2s_gadget(cs, padded, f"{name}/leaf")
        for lvl, (sib, is_right) in enumerate(path):
            left, right = [], []
            for bi in range(len(cur)):
                l, r = _u8_cond_select(cs, is_right, sib[bi], cur[bi],
                                       f"{name}/sel{lvl}_{bi}")
                left.append(l)
                right.append(r)
            cur = blake2s_gadget(cs, left + right, f"{name}/lvl{lvl}")
        for bi, byte in enumerate(cur):
            for i in range(8):
                byte.bits[i].enforce_equal(
                    cs, _const_bool((root_bytes[bi] >> i) & 1),
                    f"{name}/root{bi}_{i}")


def _const_bool(v):
    return Boolean.const(bool(v))
