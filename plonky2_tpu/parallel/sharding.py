"""Multi-chip sharding of the prover's hot pipeline.

The reference's multi-GPU story is column-chunking with host copies
(reference: fri/oracle.rs:288-301 lde_batch_multi_gpu, hash/merkle_tree.rs
:350-438 multi-GPU Merkle). TPU-native replacement: a jax.sharding.Mesh and
explicit PartitionSpecs — polynomial columns are data-parallel across chips
for iNTT/LDE (zero communication), and the leaf transpose before Merkle
hashing becomes XLA's all-to-all over ICI. The Merkle cap reduction is a
log-depth tree with an all_gather at the cap boundary.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field.goldilocks import GF
from ..hash.merkle import build_layers
from ..ops import ntt
from ..utils.bits import reverse_index_bits_perm


def make_mesh(n_devices: int | None = None, axis: str = "col") -> Mesh:
    devs = jax.devices()[:n_devices] if n_devices else jax.devices()
    return Mesh(np.asarray(devs), (axis,))


_COMMIT_FNS: dict = {}
_PROVER_MESH: list = []


class prover_mesh:
    """Context manager: every PolynomialBatch commit inside the block runs
    column-sharded on this mesh (the multi-chip end-to-end prover switch —
    `with prover_mesh(make_mesh()): data.prove(pw)`). Commits that cannot
    shard (byte-digest hashers, salted/zk oracles) fall back to the
    single-device program; proofs are bit-identical either way."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self) -> Mesh:
        _PROVER_MESH.append(self.mesh)
        return self.mesh

    def __exit__(self, *exc) -> None:
        _PROVER_MESH.pop()


def current_prover_mesh() -> Mesh | None:
    return _PROVER_MESH[-1] if _PROVER_MESH else None


def _mesh_key(mesh: Mesh) -> tuple:
    return tuple(d.id for d in mesh.devices.flat) + mesh.axis_names


def _commit_sharded_fn(mesh: Mesh, num: int, n: int, rate_bits: int,
                       cap_height: int):
    """One traced program per (mesh, shape) — callers loop over proofs and
    benchmark iterations without paying a retrace per call."""
    key = (_mesh_key(mesh), num, n, rate_bits, cap_height)
    if key in _COMMIT_FNS:
        return _COMMIT_FNS[key]
    N = n << rate_bits
    col_sharded = NamedSharding(mesh, P("col", None))
    rev = jnp.asarray(reverse_index_bits_perm(N))

    @partial(jax.jit,
             in_shardings=(col_sharded, col_sharded),
             out_shardings=None)
    def commit(lo, hi):
        lde = ntt.coset_lde(GF(lo, hi), rate_bits)        # [num, N] col-shard
        leaves = lde.transpose(1, 0)                      # all-to-all via XLA
        leaves = leaves.take(rev, axis=0)
        layers = build_layers(leaves, cap_height)
        return (leaves.lo, leaves.hi), tuple(
            (l.lo, l.hi) for l in layers)

    _COMMIT_FNS[key] = commit
    return commit


def commit_sharded(mesh: Mesh, coeffs: GF, rate_bits: int, cap_height: int):
    """Polynomial-batch commit with columns sharded over the mesh.

    coeffs: GF [num_polys, n] with num_polys % n_devices == 0.
    Returns (leaves GF [N, num_polys] bit-reversed-row order, layers tuple).
    """
    num, n = coeffs.shape
    commit = _commit_sharded_fn(mesh, num, n, rate_bits, cap_height)
    (llo, lhi), layers = commit(coeffs.lo, coeffs.hi)
    return GF(llo, lhi), tuple(GF(lo, hi) for lo, hi in layers)


def commit_values_sharded(mesh: Mesh, values_or_coeffs: GF, rate_bits: int,
                          cap_height: int, from_values: bool,
                          hasher=None):
    """Full commit pipeline under the mesh: (optional iNTT) + coset LDE with
    polynomial columns data-parallel, leaf transpose riding ICI, Merkle
    layers on the repartitioned leaves. Returns (coeffs, leaves, layers) —
    the sharded drop-in for the prover's PolynomialBatch commits
    (reference's multi-GPU analog: fri/oracle.rs:288-301, which needs host
    staging copies; here the arrays never leave the mesh)."""
    from ..hash.merkle import build_layers as _build_layers

    num, n = values_or_coeffs.shape
    d = mesh.devices.size
    # explicit in_shardings require the column axis to divide evenly: pad
    # with zero polynomials and slice the LDE back before the leaf
    # transpose, so leaves/layers stay bit-identical to the unpadded commit
    num_pad = num + (-num) % d
    if num_pad != num:
        values_or_coeffs = GF.concatenate(
            [values_or_coeffs, GF.zeros((num_pad - num, n))], axis=0)
    hname = hasher.name if hasher is not None else "poseidon"
    col_sharded = NamedSharding(mesh, P("col", None))
    key = ("cv", _mesh_key(mesh), num, n, rate_bits, cap_height,
           from_values, hname)
    if key not in _COMMIT_FNS:
        from ..hash.hashers import HASHERS_BY_NAME
        h = HASHERS_BY_NAME[hname]
        N = n << rate_bits
        rev = jnp.asarray(reverse_index_bits_perm(N))

        @partial(jax.jit, in_shardings=(col_sharded, col_sharded))
        def commit(lo, hi):
            x = GF(lo, hi)
            coeffs = ntt.ifft(x) if from_values else x
            lde = ntt.coset_lde(coeffs, rate_bits)[:num]
            leaves = lde.transpose(1, 0).take(rev, axis=0)
            layers = _build_layers(leaves, cap_height, h)
            return ((coeffs.lo[:num], coeffs.hi[:num]),
                    (leaves.lo, leaves.hi),
                    tuple((l.lo, l.hi) for l in layers))

        _COMMIT_FNS[key] = commit
    # inputs may arrive committed with a different sharding (outputs of an
    # earlier mesh program); device_put reshards explicitly, which jit's
    # in_shardings alone refuses to do
    (clo, chi), (llo, lhi), layers = _COMMIT_FNS[key](
        jax.device_put(values_or_coeffs.lo, col_sharded),
        jax.device_put(values_or_coeffs.hi, col_sharded))
    return (GF(clo, chi), GF(llo, lhi),
            tuple(GF(lo, hi) for lo, hi in layers))


def commit_sharded_2d(mesh: Mesh, coeffs: GF, rate_bits: int,
                      cap_height: int, lg_n2: int | None = None):
    """Composed 2D-parallel polynomial-batch commit: mesh ("col", "x") of
    shape (C, S) — polynomial columns data-parallel over "col" while EACH
    polynomial's coset LDE spans the S sequence-parallel devices via the
    batched four-step NTT (`ntt_sharded.coset_lde_large_batch`). The leaf
    transpose and Merkle layers run under GSPMD on the same jit, with XLA
    placing the gathers on ICI. This is the pod-scale commit the reference's
    single-host multi-GPU path (fri/oracle.rs:288-301) cannot express:
    num_polys % C == 0 and one polynomial larger than a chip both scale.

    coeffs: GF [num_polys, n]. Returns (leaves, layers) bit-identical to
    the single-device `PolynomialBatch` commit."""
    from .ntt_sharded import coset_lde_large_batch

    num, n = coeffs.shape
    key = ("2d", _mesh_key(mesh), num, n, rate_bits, cap_height, lg_n2)
    if key not in _COMMIT_FNS:
        N = n << rate_bits
        rev = jnp.asarray(reverse_index_bits_perm(N))
        col2d = NamedSharding(mesh, P("col", None))

        def commit(lo, hi):
            lde = coset_lde_large_batch(GF(lo, hi), mesh, rate_bits,
                                        lg_n2=lg_n2)
            leaves = lde.transpose(1, 0).take(rev, axis=0)
            layers = build_layers(leaves, cap_height)
            return ((leaves.lo, leaves.hi),
                    tuple((l.lo, l.hi) for l in layers))

        # the shard_map inside coset_lde_large_batch is already jitted per
        # shape; wrap the whole pipeline so transpose+Merkle fuse with it
        _COMMIT_FNS[key] = jax.jit(commit, in_shardings=(col2d, col2d))
    (llo, lhi), layers = _COMMIT_FNS[key](coeffs.lo, coeffs.hi)
    return GF(llo, lhi), tuple(GF(lo, hi) for lo, hi in layers)


def training_step_sharded(mesh: Mesh, wires: GF, rate_bits: int,
                          cap_height: int):
    """One full 'prover step' shard-mapped over the mesh: per-column iNTT
    (data parallel), coset LDE, transpose (ICI all-to-all), Merkle layers.
    This is the multichip compile-check entry (see __graft_entry__)."""
    num, n = wires.shape
    key = ("step", _mesh_key(mesh), num, n, rate_bits, cap_height)
    if key not in _COMMIT_FNS:
        col_sharded = NamedSharding(mesh, P("col", None))
        N = n << rate_bits
        rev = jnp.asarray(reverse_index_bits_perm(N))

        @partial(jax.jit, in_shardings=(col_sharded, col_sharded))
        def step(lo, hi):
            values = GF(lo, hi)
            coeffs = ntt.ifft(values)
            lde = ntt.coset_lde(coeffs, rate_bits)
            leaves = lde.transpose(1, 0).take(rev, axis=0)
            layers = build_layers(leaves, cap_height)
            cap = layers[-1]
            return cap.lo, cap.hi

        _COMMIT_FNS[key] = step
    return _COMMIT_FNS[key](wires.lo, wires.hi)
