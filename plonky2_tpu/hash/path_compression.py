"""Merkle path compression: drop siblings shared across multi-index proofs.

Reference: plonky2/src/hash/path_compression.rs —
compress_merkle_proofs:11-52, decompress_merkle_proofs:54-112.

Proofs are lists of 4-element sibling digests (python ints, host-side —
compression is a proof-size optimization, not a compute path).
"""

from __future__ import annotations

from . import poseidon as ps


def compress_merkle_proofs(cap_height: int, indices, proofs):
    """Remove redundancy in Merkle paths across `indices`."""
    assert proofs
    height = cap_height + len(proofs[0])
    num_leaves = 1 << height
    known = [False] * (2 * num_leaves)
    for i in indices:
        for j in range(height - cap_height):
            known[(i + num_leaves) >> j] = True
    compressed = []
    for i, p in zip(indices, proofs):
        out = []
        index = i + num_leaves
        for sibling in p:
            sibling_index = index ^ 1
            if not known[sibling_index]:
                out.append([int(x) for x in sibling])
                known[sibling_index] = True
            index >>= 1
            known[index] = True
        compressed.append(out)
    return compressed


def decompress_merkle_proofs(leaves_data, leaves_indices, compressed_proofs,
                             height: int, cap_height: int):
    """Reconstruct full Merkle paths; leaves/indices must be in the same
    order as compression."""
    num_leaves = 1 << height
    seen: dict[int, list[int]] = {}
    for i, v in zip(leaves_indices, leaves_data):
        seen[i + num_leaves] = ps.hash_or_noop_oracle([int(x) for x in v])

    iters = [iter(p) for p in compressed_proofs]
    for layer in range(height - cap_height):
        for i, it in zip(leaves_indices, iters):
            index = (i + num_leaves) >> layer
            current = seen[index]
            sibling_index = index ^ 1
            if sibling_index not in seen:
                seen[sibling_index] = [int(x) for x in next(it)]
            sibling = seen[sibling_index]
            parent = (ps.compress_oracle(current, sibling) if index % 2 == 0
                      else ps.compress_oracle(sibling, current))
            seen[index >> 1] = parent

    decompressed = []
    for i in leaves_indices:
        out = []
        index = i + num_leaves
        for _ in range(height - cap_height):
            out.append(seen[index ^ 1])
            index >>= 1
        decompressed.append(out)
    return decompressed
