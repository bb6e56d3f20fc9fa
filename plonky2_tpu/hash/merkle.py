"""Merkle tree with cap — TPU-native layered construction.

Equivalent surface to the reference MerkleTree/MerkleCap/MerkleProof
(reference: plonky2/src/hash/merkle_tree.rs:54-100, :809 prove;
merkle_proofs.rs:19-80). The reference builds subtree-contiguous digest
buffers recursively with rayon; on TPU the whole tree is log2(n) batched
hash calls (leaf layer = one batched hash_or_noop over [n, leaf_size];
each reduction = one batched compress over [m, 4] pairs), jitted as a single
program. The cap at height h is the layer with 2^h nodes (h-th from root).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field.goldilocks import GF
from ..utils.bits import log2_strict
from . import poseidon as ps


def host_layers_preferred() -> bool:
    """On CPU hosts the native C batch hashers build Merkle layers orders of
    magnitude faster than executing the XLA tree program on the host cores
    (measured ~12 us/leaf vs ~8 ms/leaf effective on the 1-core CI box);
    prefer them when available. PLONKY2_TPU_HOST_MERKLE=0 forces the device
    tree builder everywhere."""
    import os

    if os.environ.get("PLONKY2_TPU_HOST_MERKLE") == "0":
        return False
    if jax.default_backend() != "cpu":
        return False
    from .. import native
    return native.load() is not None


def build_layers(leaves: GF, cap_height: int, hasher=None):
    """Traceable tree builder: leaves [n, leaf_size] -> tuple of digest layers
    (leaf-hash layer first, cap layer last). Composable inside larger jits.
    Only for device hashers (hasher.device); byte-digest hashers build on
    host via MerkleTree.

    On TPU the whole tree runs in lanes layout ([elements, batch] — batch on
    the 128-wide vector lanes) with a single transpose at each boundary."""
    if hasher is None:
        from .hashers import POSEIDON
        hasher = POSEIDON
    lg_n = log2_strict(leaves.shape[0])
    if (jax.default_backend() == "tpu"
            and getattr(hasher, "hash_or_noop_lanes", None) is not None):
        return _build_layers_lanes(leaves, lg_n, cap_height, hasher)
    layers = []
    layer = hasher.hash_or_noop_dev(leaves)  # [n, 4]
    layers.append(layer)
    for _ in range(lg_n - cap_height):
        m = layer.shape[0] // 2
        left = layer.reshape(m, 2, 4)[:, 0]
        right = layer.reshape(m, 2, 4)[:, 1]
        layer = hasher.compress_dev(left, right)
        layers.append(layer)
    return tuple(layers)


def _build_layers_lanes(leaves: GF, lg_n: int, cap_height: int, hasher):
    layers = []
    layer = hasher.hash_or_noop_lanes(leaves.transpose(1, 0))   # [4, n]
    layers.append(layer.transpose(1, 0))
    for _ in range(lg_n - cap_height):
        left = layer[:, 0::2]
        right = layer[:, 1::2]
        layer = hasher.compress_lanes(left, right)
        layers.append(layer.transpose(1, 0))
    return tuple(layers)


@lru_cache(maxsize=None)
def _build_fn(lg_n: int, leaf_size: int, cap_height: int,
              hasher_name: str = "poseidon"):
    from .hashers import HASHERS_BY_NAME
    hasher = HASHERS_BY_NAME[hasher_name]
    return jax.jit(partial(build_layers, cap_height=cap_height,
                           hasher=hasher))


# ---------------------------------------------------------------------------
# Dispatched tree build — per-size cached programs instead of one monolith.
#
# The monolithic tree jit inlines one permutation instance per level; its
# per-shape XLA compile (~4 min for a 2^16-leaf commit) is what blew the
# round-3 bench step caps. Splitting by level makes each program tiny AND
# shared across every tree shape in the process (the prover builds 4+ trees
# per proof and FRI builds one per fold layer — they all reuse the same
# per-size compress programs, and the persistent cache reuses them across
# processes).
# ---------------------------------------------------------------------------

_LEVEL_GROUP_MAX = 256   # levels at or below this node count run in ONE
                         # grouped program (small data; scan path compiles
                         # fast); larger levels dispatch individually so the
                         # Pallas kernel programs are cached per size


@lru_cache(maxsize=None)
def _leaf_hash_fn(lg_n: int, leaf_size: int, hasher_name: str):
    """jit: leaves [n, leaf_size] -> leaf digest layer [n, 4]."""
    from .hashers import HASHERS_BY_NAME
    hasher = HASHERS_BY_NAME[hasher_name]

    def f(leaves: GF):
        if (jax.default_backend() == "tpu"
                and getattr(hasher, "hash_or_noop_lanes", None) is not None):
            return hasher.hash_or_noop_lanes(
                leaves.transpose(1, 0)).transpose(1, 0)
        return hasher.hash_or_noop_dev(leaves)

    return jax.jit(f)


@lru_cache(maxsize=None)
def _level_fn(m: int, hasher_name: str):
    """jit: digest layer [m, 4] -> [m//2, 4] (one compress level)."""
    from .hashers import HASHERS_BY_NAME
    hasher = HASHERS_BY_NAME[hasher_name]

    def f(layer: GF):
        if (jax.default_backend() == "tpu"
                and getattr(hasher, "compress_lanes", None) is not None):
            lanes = layer.transpose(1, 0)
            return hasher.compress_lanes(
                lanes[:, 0::2], lanes[:, 1::2]).transpose(1, 0)
        pairs = layer.reshape(m // 2, 2, 4)
        return hasher.compress_dev(pairs[:, 0], pairs[:, 1])

    return jax.jit(f)


@lru_cache(maxsize=None)
def _levels_grouped_fn(lg_m: int, cap_height: int, hasher_name: str):
    """jit: digest layer [2^lg_m, 4] -> tuple of the remaining layers down
    to the cap (small sizes — compiles fast even unrolled)."""
    from .hashers import HASHERS_BY_NAME
    hasher = HASHERS_BY_NAME[hasher_name]

    def f(layer: GF):
        outs = []
        for _ in range(lg_m - cap_height):
            m = layer.shape[0] // 2
            pairs = layer.reshape(m, 2, 4)
            layer = hasher.compress_dev(pairs[:, 0], pairs[:, 1])
            outs.append(layer)
        return tuple(outs)

    return jax.jit(f)


def build_tree_layers(leaves: GF, cap_height: int, hasher=None,
                      leaf_layer: GF | None = None) -> tuple:
    """Non-traced tree build: cached per-shape leaf program + cached per-size
    level programs (a handful of ~ms dispatches instead of one monolithic
    compile). `leaf_layer` lets callers that already computed the leaf digest
    layer (the fused commit program) skip the leaf pass."""
    if hasher is None:
        from .hashers import POSEIDON
        hasher = POSEIDON
    n, leaf_size = leaves.shape
    lg_n = log2_strict(n)
    if leaf_layer is None:
        leaf_layer = _leaf_hash_fn(lg_n, leaf_size, hasher.name)(leaves)
    layers = [leaf_layer]
    m = n
    cap_n = 1 << cap_height
    while m > max(cap_n, _LEVEL_GROUP_MAX):
        layers.append(_level_fn(m, hasher.name)(layers[-1]))
        m //= 2
    if m > cap_n:
        layers.extend(_levels_grouped_fn(log2_strict(m), cap_height,
                                         hasher.name)(layers[-1]))
    return tuple(layers)


class MerkleTree:
    """leaves: GF [n, leaf_size]. For device hashers (Poseidon family) the
    digest layers live on device; byte-digest hashers (Keccak) and host-only
    hashers (PoseidonBN128) build numpy layers on host — they exist for
    cheap external verification, not for the device hot path."""

    def __init__(self, leaves: GF, cap_height: int = 0, layers=None,
                 hasher=None):
        if hasher is None:
            from .hashers import POSEIDON
            hasher = POSEIDON
        n, leaf_size = leaves.shape
        self.lg_n = log2_strict(n)
        assert cap_height <= self.lg_n
        self.cap_height = cap_height
        self.leaves = leaves
        self.hasher = hasher
        if layers is not None:
            self.layers = layers
        elif hasher.device and not host_layers_preferred():
            self.layers = build_tree_layers(leaves, cap_height, hasher)
        else:
            self.layers = None
            self._layers_np = self._build_host_layers()

    def _build_host_layers(self):
        h = self.hasher
        layer = h.hash_leaves_np(self.leaves_host())
        layers = [layer]
        for _ in range(self.lg_n - self.cap_height):
            layer = h.compress_np(layer[0::2], layer[1::2])
            layers.append(layer)
        return layers

    @property
    def cap(self):
        """Device: GF [2^cap_height, 4]; host hashers: numpy array."""
        if self.layers is not None:
            return self.layers[-1]
        return self._layers_np[-1]

    def cap_u64(self) -> np.ndarray:
        if self.layers is not None:
            return self.cap.to_u64()
        return self._layers_np[-1]

    def cap_digests(self) -> list:
        """Cap as host digests (tuples of 4 ints, or 25-byte bytes).
        Reads back ONLY the cap layer (2^cap_height rows), never the full
        digest buffer — the prover observes a cap after every commit and a
        full-layer readback through the TPU tunnel costs ~MBs each time."""
        if self.layers is not None and not hasattr(self, "_layers_np"):
            cap = self.layers[-1].to_u64()
        else:
            cap = self._layers_host()[-1]
        return [self.hasher.digest_from_row(row) for row in cap]

    def leaves_host(self) -> np.ndarray:
        if not hasattr(self, "_leaves_np"):
            self._leaves_np = self.leaves.to_u64()
        return self._leaves_np

    def _layers_host(self):
        if not hasattr(self, "_layers_np"):
            self._layers_np = [l.to_u64() for l in self.layers]
        return self._layers_np

    def prove(self, leaf_index: int) -> np.ndarray:
        """Merkle path to the cap: uint64 [lg_n - cap_height, 4] of sibling
        digests, leaf level first."""
        layers = self._layers_host()
        sibs = []
        idx = leaf_index
        for level in range(self.lg_n - self.cap_height):
            sibs.append(layers[level][idx ^ 1])
            idx >>= 1
        if not sibs:
            return np.zeros((0, 4), dtype=np.uint64)
        return np.stack(sibs)

    def prove_batch(self, leaf_indices) -> np.ndarray:
        """uint64 [k, lg_n - cap_height, 4] for many indices at once.

        Device-layer trees gather all k sibling paths in ONE jitted program
        and one readback (the FRI query phase needs 28 paths per tree; the
        old per-path route pulled every digest layer to the host first)."""
        if self.layers is not None and not hasattr(self, "_layers_np"):
            idxs = np.asarray(list(leaf_indices), dtype=np.int32)
            depth = self.lg_n - self.cap_height
            if depth == 0:
                return np.zeros((len(idxs), 0, 4), dtype=np.uint64)
            out = _path_gather_fn(self.lg_n, self.cap_height)(
                self.layers[:depth], jnp.asarray(idxs))
            return out.to_u64()
        return np.stack([self.prove(int(i)) for i in leaf_indices])

    def rows_batch(self, leaf_indices) -> np.ndarray:
        """uint64 [k, leaf_size] leaf rows; device gather + one readback for
        device trees, host slice otherwise."""
        idxs = np.asarray(list(leaf_indices), dtype=np.int32)
        if not hasattr(self, "_leaves_np") and hasattr(self.leaves, "lo") \
                and not isinstance(self.leaves.lo, np.ndarray):
            rows = _rows_gather_fn(self.lg_n, self.leaves.shape[1])(
                self.leaves, jnp.asarray(idxs))
            return rows.to_u64()
        return self.leaves_host()[idxs]

    # -- okx mutable-tree ops -------------------------------------------------
    def change_leaf_and_update(self, leaf: GF, leaf_index: int) -> None:
        """Replace one leaf and recompute its root path
        (reference: merkle_tree.rs change_leaf_and_update:638-695).

        On TPU this is log2(n) single-pair hash calls plus in-place scatter
        updates of the layer arrays."""
        self.change_leaves_in_range_and_update(
            leaf.reshape(1, -1), leaf_index, leaf_index + 1)

    def change_leaves_in_range_and_update(self, new_leaves: GF,
                                          start: int, end: int) -> None:
        """Replace leaves[start:end] and recompute the affected subpaths
        (reference: merkle_tree.rs change_leaves_in_range_and_update:699-805).
        The touched index window shrinks by half per layer, so total work is
        O((end-start) + log n) batched hashes."""
        assert self.hasher.name == "poseidon", \
            "mutable-tree ops are implemented for the Poseidon device hasher"
        assert 0 <= start < end <= self.leaves.shape[0]
        assert new_leaves.shape == (end - start, self.leaves.shape[1])
        idx = jnp.arange(start, end)
        self.leaves = GF(self.leaves.lo.at[start:end].set(new_leaves.lo),
                         self.leaves.hi.at[start:end].set(new_leaves.hi))
        if self.layers is None:           # host-layer tree (CPU + C hashers)
            self._update_host_layers(start, end, new_leaves)
            return
        layers = list(self.layers)
        digests = ps.hash_or_noop(new_leaves)            # [k, 4]
        lo_idx, hi_idx = start, end
        layers[0] = GF(layers[0].lo.at[lo_idx:hi_idx].set(digests.lo),
                       layers[0].hi.at[lo_idx:hi_idx].set(digests.hi))
        for level in range(1, len(layers)):
            lo_idx >>= 1
            hi_idx = (hi_idx + 1) >> 1
            prev = layers[level - 1]
            pairs = prev[2 * lo_idx:2 * hi_idx].reshape(hi_idx - lo_idx, 2, 4)
            new_digests = ps.compress(pairs[:, 0], pairs[:, 1])
            layers[level] = GF(
                layers[level].lo.at[lo_idx:hi_idx].set(new_digests.lo),
                layers[level].hi.at[lo_idx:hi_idx].set(new_digests.hi))
        self.layers = tuple(layers)
        for attr in ("_leaves_np", "_layers_np"):
            if hasattr(self, attr):
                delattr(self, attr)

    def _update_host_layers(self, start: int, end: int, new_leaves: GF):
        """Same shrinking-window update over the numpy host layers."""
        h = self.hasher
        layers = self._layers_np
        layers[0][start:end] = h.hash_leaves_np(np.asarray(
            new_leaves.to_u64()))
        lo_idx, hi_idx = start, end
        for level in range(1, len(layers)):
            lo_idx >>= 1
            hi_idx = (hi_idx + 1) >> 1
            prev = layers[level - 1][2 * lo_idx:2 * hi_idx]
            layers[level][lo_idx:hi_idx] = h.compress_np(prev[0::2],
                                                         prev[1::2])
        if hasattr(self, "_leaves_np"):
            delattr(self, "_leaves_np")


@lru_cache(maxsize=None)
def _path_gather_fn(lg_n: int, cap_height: int):
    """jit: (digest layers tuple, idxs [k]) -> sibling paths GF [k, depth, 4].
    Level ℓ sibling of leaf index i is layers[ℓ][(i >> ℓ) ^ 1]."""
    depth = lg_n - cap_height

    def f(layers, idxs):
        sibs = []
        for level in range(depth):
            sel = (idxs >> level) ^ 1
            sibs.append(layers[level].take(sel, axis=0))
        return GF.stack(sibs, axis=1)

    return jax.jit(f)


@lru_cache(maxsize=None)
def _rows_gather_fn(lg_n: int, leaf_size: int):
    return jax.jit(lambda leaves, idxs: leaves.take(idxs, axis=0))


# ---------------------------------------------------------------------------
# Oracle (python ints) — verification side & tests
# ---------------------------------------------------------------------------

def merkle_root_oracle(leaves: list[list[int]], cap_height: int = 0,
                       hasher=None):
    """Returns (cap, all_layers) with host digests."""
    if hasher is None:
        from .hashers import POSEIDON
        hasher = POSEIDON
    n = len(leaves)
    lg_n = log2_strict(n)
    layer = [hasher.hash_or_noop_oracle(l) for l in leaves]
    layers = [layer]
    for _ in range(lg_n - cap_height):
        layer = [hasher.two_to_one_oracle(layer[2 * i], layer[2 * i + 1])
                 for i in range(len(layer) // 2)]
        layers.append(layer)
    return layer, layers


def verify_merkle_proof_oracle(leaf: list[int], leaf_index: int,
                               cap, proof, hasher=None) -> bool:
    """Matches verify_merkle_proof_to_cap (reference: merkle_proofs.rs:42-80).
    `cap`/`proof` rows may be host digests or numpy digest rows."""
    if hasher is None:
        from .hashers import POSEIDON
        hasher = POSEIDON
    digest = hasher.hash_or_noop_oracle(leaf)
    idx = leaf_index
    for sibling in proof:
        sib = hasher.digest_from_row(sibling) \
            if not isinstance(sibling, (bytes, tuple)) else sibling
        if idx & 1:
            digest = hasher.two_to_one_oracle(sib, digest)
        else:
            digest = hasher.two_to_one_oracle(digest, sib)
        idx >>= 1
    expected = cap[idx]
    if not isinstance(expected, (bytes, tuple)):
        expected = hasher.digest_from_row(expected) \
            if hasattr(expected, "dtype") else tuple(int(x) for x in expected)
    return digest == expected
