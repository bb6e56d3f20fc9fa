"""Compressed proof roundtrip (reference: plonk/proof.rs compress/decompress,
exercised by examples/bench_recursion.rs:149-178 compression roundtrip)."""

import dataclasses


def test_compressed_proof_roundtrip(fib_data_and_proof):
    data, proof = fib_data_and_proof
    compressed = data.compress(proof)
    # the compressed FRI proof must deduplicate repeated query indices
    qrp = compressed.proof.opening_proof.query_round_proofs
    assert len(qrp.initial_trees_proofs) <= len(qrp.indices)
    # siblings must actually shrink
    orig_sibs = sum(len(q.initial_trees_proof.evals_proofs[0][1])
                    for q in proof.proof.opening_proof.query_round_proofs)
    comp_sibs = sum(len(p.evals_proofs[0][1])
                    for p in qrp.initial_trees_proofs.values())
    assert comp_sibs < orig_sibs

    restored = data.decompress(compressed)
    data.verify(restored)
    data.verify_compressed(compressed)

    # the roundtrip must be exact on the FRI query rounds
    for a, b in zip(proof.proof.opening_proof.query_round_proofs,
                    restored.proof.opening_proof.query_round_proofs):
        for (ea, pa), (eb, pb) in zip(a.initial_trees_proof.evals_proofs,
                                      b.initial_trees_proof.evals_proofs):
            assert [int(x) for x in ea] == [int(x) for x in eb]
            assert [[int(x) for x in s] for s in pa] == \
                [[int(x) for x in s] for s in pb]
        for sa, sb in zip(a.steps, b.steps):
            assert [tuple(e) for e in sa.evals] == [tuple(e)
                                                    for e in sb.evals]
            assert [[int(x) for x in s] for s in sa.merkle_proof] == \
                [[int(x) for x in s] for s in sb.merkle_proof]


def test_compressed_rejects_tampering(fib_data_and_proof):
    import copy

    import pytest

    data, proof = fib_data_and_proof
    compressed = data.compress(proof)
    bad = copy.deepcopy(compressed)
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % (2**64 - 2**32 + 1)
    with pytest.raises((AssertionError, KeyError)):
        data.verify_compressed(bad)


def test_compressed_proof_serialization_roundtrip(fib_data_and_proof):
    from plonky2_tpu.utils.serialization import (
        deserialize_compressed_proof_with_pis,
        serialize_compressed_proof_with_pis,
    )

    data, proof = fib_data_and_proof
    compressed = data.compress(proof)
    blob = serialize_compressed_proof_with_pis(compressed, data.common)
    restored = deserialize_compressed_proof_with_pis(blob, data.common)
    data.verify_compressed(restored)
    # compression must actually shrink the serialized proof
    from plonky2_tpu.utils.serialization import serialize_proof_with_pis
    full = serialize_proof_with_pis(proof, data.common)
    assert len(blob) < len(full)
