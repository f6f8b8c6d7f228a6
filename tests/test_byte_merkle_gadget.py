"""Byte Merkle path gadget vs ByteMerkleTree primitive
(r1cs/gadgets/crypto/src/merkle_tree/mod.rs role, over the Blake2s CRH)."""

from gingerlib_tpu.primitives.merkle_bytes import ByteMerkleTree, Blake2sCRH
from gingerlib_tpu.relations.r1cs import ConstraintSystem
from gingerlib_tpu.gadgets.std.boolean import Boolean
from gingerlib_tpu.gadgets.std.uint import UInt8
from gingerlib_tpu.gadgets.crypto.merkle import ByteMerklePathGadget
from gingerlib_tpu import params as PP


def _build():
    tree = ByteMerkleTree(Blake2sCRH, height=3).build(
        [b"leaf0", b"leaf1", b"leaf2", b"leaf3"])
    return tree


def _alloc_path(cs, path):
    out = []
    for i, (sib, is_right) in enumerate(path):
        sib_u8 = UInt8.alloc_bytes(cs, sib, len(sib), f"sib{i}")
        d = Boolean.alloc(cs, is_right, f"dir{i}")
        out.append((sib_u8, d))
    return out


def test_byte_merkle_gadget_accepts_valid_path():
    tree = _build()
    leaf = b"leaf2"
    path = tree.generate_proof(2)
    assert tree.verify_proof(tree.root(), leaf, path)

    cs = ConstraintSystem(PP.MNT4753_FR)
    leaf_u8 = UInt8.alloc_bytes(cs, leaf.ljust(32, b"\x00"), 32, "leaf")
    gadget = ByteMerklePathGadget(leaf_size=32)
    gadget.check_membership(cs, tree.root(), leaf_u8, _alloc_path(cs, path))
    bad = cs.which_is_unsatisfied()
    assert bad is None, f"unsatisfied at {bad}"


def test_byte_merkle_gadget_rejects_wrong_leaf():
    tree = _build()
    path = tree.generate_proof(2)
    cs = ConstraintSystem(PP.MNT4753_FR)
    leaf_u8 = UInt8.alloc_bytes(cs, b"leafX".ljust(32, b"\x00"), 32, "leaf")
    gadget = ByteMerklePathGadget(leaf_size=32)
    gadget.check_membership(cs, tree.root(), leaf_u8, _alloc_path(cs, path))
    assert cs.which_is_unsatisfied() is not None
