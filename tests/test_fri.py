"""End-to-end FRI: commit polynomial batches, batch-open at two points,
verify with the pure-Python verifier. This exercises the full
PolynomialBatch -> prove_openings -> fri_proof -> verify_fri_proof path the
PLONK prover is built on."""

import numpy as np
import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.fri.challenges import fri_challenges, observe_openings
from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.fri.oracle import PolynomialBatch
from plonky2_tpu.fri.structure import (
    FriBatchInfo, FriInstanceInfo, FriOpeningBatch, FriOpenings,
    FriOracleInfo, FriPolynomialInfo,
)
from plonky2_tpu.fri.verifier import verify_fri_proof
from plonky2_tpu.iop.challenger import Challenger

RNG = np.random.default_rng(11)


def eval_at_ext(coeffs_u64, z):
    acc = (0, 0)
    for c in reversed(coeffs_u64):
        acc = ref.ext2_add(ref.ext2_mul(acc, z), (int(c), 0))
    return acc


def setup(degree_bits=6, rate_bits=3, cap_height=1, num_query_rounds=6,
          pow_bits=8, arity_bits=2, final_poly_bits=2):
    config = FriConfig(
        rate_bits=rate_bits, cap_height=cap_height,
        proof_of_work_bits=pow_bits,
        reduction_strategy=FriReductionStrategy(
            kind="constant_arity", arity_bits=arity_bits,
            final_poly_bits=final_poly_bits),
        num_query_rounds=num_query_rounds)
    params = config.fri_params(degree_bits)
    return config, params


def test_fri_roundtrip():
    config, params = setup()
    n = 1 << params.degree_bits

    polys_a = RNG.integers(0, ref.ORDER, size=(5, n), dtype=np.uint64)
    polys_b = RNG.integers(0, ref.ORDER, size=(3, n), dtype=np.uint64)

    oracle_a = PolynomialBatch.from_coeffs(
        GF.from_u64(polys_a), config.rate_bits, False, config.cap_height)
    oracle_b = PolynomialBatch.from_coeffs(
        GF.from_u64(polys_b), config.rate_bits, False, config.cap_height)

    zeta = (123456789, 987654321)
    g = ref.primitive_root_of_unity(params.degree_bits)
    g_zeta = ref.ext2_scalar_mul(zeta, g)

    all_polys = (FriPolynomialInfo.from_range(0, 0, 5)
                 + FriPolynomialInfo.from_range(1, 0, 3))
    b_polys = FriPolynomialInfo.from_range(1, 0, 3)
    instance = FriInstanceInfo(
        oracles=(FriOracleInfo(5, False), FriOracleInfo(3, False)),
        batches=(FriBatchInfo(point=zeta, polynomials=tuple(all_polys)),
                 FriBatchInfo(point=g_zeta, polynomials=tuple(b_polys))))

    # openings (evaluate every batch poly at its point)
    rows = np.concatenate([polys_a, polys_b], axis=0)
    batch0 = tuple(eval_at_ext(rows[i], zeta) for i in range(8))
    batch1 = tuple(eval_at_ext(polys_b[i], g_zeta) for i in range(3))
    openings = FriOpenings(batches=(FriOpeningBatch(batch0),
                                    FriOpeningBatch(batch1)))

    # ---- prover transcript
    prover_ch = Challenger()
    for o in (oracle_a, oracle_b):
        prover_ch.observe_cap(o.merkle_tree.cap_u64())
    observe_openings(prover_ch, openings)
    proof = PolynomialBatch.prove_openings(
        instance, [oracle_a, oracle_b], prover_ch, params)

    # ---- verifier transcript replay
    verifier_ch = Challenger()
    caps = [oracle_a.merkle_tree.cap_u64(), oracle_b.merkle_tree.cap_u64()]
    for cap in caps:
        verifier_ch.observe_cap(cap)
    observe_openings(verifier_ch, openings)
    challenges = fri_challenges(verifier_ch, proof, params.degree_bits, config)

    verify_fri_proof(instance, openings, challenges, caps, proof, params)


def test_fri_rejects_wrong_opening():
    config, params = setup()
    n = 1 << params.degree_bits
    polys = RNG.integers(0, ref.ORDER, size=(2, n), dtype=np.uint64)
    oracle = PolynomialBatch.from_coeffs(
        GF.from_u64(polys), config.rate_bits, False, config.cap_height)
    zeta = (42, 43)
    instance = FriInstanceInfo(
        oracles=(FriOracleInfo(2, False),),
        batches=(FriBatchInfo(point=zeta,
                              polynomials=tuple(FriPolynomialInfo.from_range(0, 0, 2))),))
    good = tuple(eval_at_ext(polys[i], zeta) for i in range(2))
    openings = FriOpenings(batches=(FriOpeningBatch(good),))

    prover_ch = Challenger()
    prover_ch.observe_cap(oracle.merkle_tree.cap_u64())
    observe_openings(prover_ch, openings)
    proof = PolynomialBatch.prove_openings(instance, [oracle], prover_ch, params)

    # tamper with one opening value
    bad = (tuple((ref.add(good[0][0], 1), good[0][1])), good[1])
    bad_openings = FriOpenings(batches=(FriOpeningBatch(bad),))
    verifier_ch = Challenger()
    verifier_ch.observe_cap(oracle.merkle_tree.cap_u64())
    observe_openings(verifier_ch, bad_openings)
    challenges = fri_challenges(verifier_ch, proof, params.degree_bits, config)
    with pytest.raises(AssertionError):
        verify_fri_proof(instance, bad_openings, challenges,
                         [oracle.merkle_tree.cap_u64()], proof, params)


def test_min_size_reduction_strategy():
    """MinSize searches non-increasing arity sequences minimizing estimated
    proof size (reference: fri/reduction_strategies.rs:58-174)."""
    import dataclasses

    from plonky2_tpu.fri.config import FriReductionStrategy

    s = FriReductionStrategy(kind="min_size")
    bits = s.reduction_arity_bits(14, 3, 4, 28)
    assert sum(bits) <= 14
    assert list(bits) == sorted(bits, reverse=True)  # non-increasing
    # must beat (or match) the constant-arity default on its own metric
    from plonky2_tpu.fri.config import _min_size_arity_bits
    assert bits == _min_size_arity_bits(14, 3, 28, None)
