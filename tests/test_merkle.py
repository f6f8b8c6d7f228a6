"""Field-based Merkle tree vs reference semantics
(merkle_tree/field_based_mht/mod.rs)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gingerlib_tpu.fields import fp
from gingerlib_tpu.primitives.poseidon import PoseidonParams, PoseidonHash
from gingerlib_tpu.primitives.merkle import FieldBasedMerkleTree

# slow: every test drives 753-bit Poseidon eagerly on this 1-core box (>420 s measured round 5); the fast tier covers Merkle via test_byte_merkle_gadget + serialization pins
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tree_setup():
    h = PoseidonHash(PoseidonParams.mnt4753())
    leaves_int = [101, 202, 303, 404]
    leaves = jnp.asarray(fp.fp_from_ints(h.F, leaves_int))
    t = FieldBasedMerkleTree(h, height=4).build(leaves)
    return h, t, leaves


def test_proofs_verify(tree_setup):
    h, t, leaves = tree_setup
    root = t.root()
    for i in range(4):
        path = t.generate_proof(i)
        assert t.verify_proof(root, np.asarray(leaves[i]), path)


def test_bad_root_rejected(tree_setup):
    h, t, leaves = tree_setup
    bad_root = np.asarray(t.root()).copy()
    bad_root[0] ^= 1
    path = t.generate_proof(0)
    assert not t.verify_proof(bad_root, np.asarray(leaves[0]), path)


def test_wrong_leaf_rejected(tree_setup):
    h, t, leaves = tree_setup
    path = t.generate_proof(0)
    assert not t.verify_proof(t.root(), np.asarray(leaves[1]), path)


def test_padding_tree_height(tree_setup):
    """4 leaves in a height-4 config: 1 padding level, path length 3."""
    h, t, leaves = tree_setup
    assert len(t.generate_proof(0)) == 3
    assert len(t.padding) == 1


def test_non_pow2_leaf_padding():
    h = PoseidonHash(PoseidonParams.mnt4753())
    l3 = jnp.asarray(fp.fp_from_ints(h.F, [1, 2, 3]))
    l4 = jnp.concatenate(
        [l3, h.evaluate(jnp.asarray(fp.fp_from_ints(h.F, [1]))[None])], axis=0)
    t3 = FieldBasedMerkleTree(h, height=4).build(l3)
    t4 = FieldBasedMerkleTree(h, height=4).build(l4)
    assert np.array_equal(np.asarray(t3.root()), np.asarray(t4.root()))


def test_fixed_batch_build_matches_per_level():
    """The chunked fixed-batch build (one compiled hash graph) must produce
    the same tree as the per-level path (merkle.py _level_up)."""
    import jax.numpy as jnp
    h = PoseidonHash(PoseidonParams.mnt4753())
    leaves = jnp.asarray(fp.fp_from_ints(h.F, list(range(1, 65))))
    t_legacy = FieldBasedMerkleTree(h, 7).build(leaves)
    t_fixed = FieldBasedMerkleTree(h, 7)
    t_fixed._FIXED_BATCH = 8  # force the chunked path at 64 leaves
    t_fixed.build(leaves)
    assert np.array_equal(np.asarray(t_legacy.root()),
                          np.asarray(t_fixed.root()))
    for a, b in zip(t_legacy.levels, t_fixed.levels):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_build_scan_matches_build():
    """The single-dispatch scan build (one jitted scan over a chunk
    schedule, bench.py's TPU path) must reproduce the level-wise build
    exactly — levels, root, proofs — including non-pow2 leaf padding and
    the shape-padded max_leaves executable."""
    h = PoseidonHash(PoseidonParams.mnt4753())
    leaves = jnp.asarray(fp.fp_from_ints(h.F, list(range(1, 49))))  # 48
    t1 = FieldBasedMerkleTree(h, 8).build(leaves)
    t2 = FieldBasedMerkleTree(h, 8).build_scan(leaves, max_leaves=128)
    assert np.array_equal(np.asarray(t1.root()), np.asarray(t2.root()))
    assert len(t1.levels) == len(t2.levels)
    for a, b in zip(t1.levels, t2.levels):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    path = t2.generate_proof(5)
    assert t2.verify_proof(t2.root(), np.asarray(leaves[5]), path)
