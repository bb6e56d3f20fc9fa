"""Merkle path compression: drop siblings shared across multi-index proofs.

Reference: plonky2/src/hash/path_compression.rs —
compress_merkle_proofs:11-52, decompress_merkle_proofs:54-112.

Proofs are lists of 4-element sibling digests (python ints, host-side —
compression is a proof-size optimization, not a compute path).
"""

from __future__ import annotations



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
                out.append(sibling if isinstance(sibling, (bytes, tuple))
                           else [int(x) for x in sibling])
                known[sibling_index] = True
            index >>= 1
            known[index] = True
        compressed.append(out)
    return compressed


def decompress_merkle_proofs(leaves_data, leaves_indices, compressed_proofs,
                             height: int, cap_height: int, hasher=None):
    """Reconstruct full Merkle paths; leaves/indices must be in the same
    order as compression."""
    if hasher is None:
        from .hashers import POSEIDON
        hasher = POSEIDON
    num_leaves = 1 << height
    seen: dict[int, object] = {}
    for i, v in zip(leaves_indices, leaves_data):
        seen[i + num_leaves] = hasher.hash_or_noop_oracle(
            [int(x) for x in v])

    def as_digest(d):
        if isinstance(d, (bytes, tuple)):
            return d
        return hasher.digest_from_row(d)

    iters = [iter(p) for p in compressed_proofs]
    for layer in range(height - cap_height):
        for i, it in zip(leaves_indices, iters):
            index = (i + num_leaves) >> layer
            current = seen[index]
            sibling_index = index ^ 1
            if sibling_index not in seen:
                seen[sibling_index] = as_digest(next(it))
            sibling = seen[sibling_index]
            parent = (hasher.two_to_one_oracle(current, sibling)
                      if index % 2 == 0
                      else hasher.two_to_one_oracle(sibling, current))
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
