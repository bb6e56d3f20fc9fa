"""Proof-shape validation (reference: plonk/validate_shape.rs,
fri/validate_shape.rs): a malformed proof must fail with a clear shape
error BEFORE any cryptographic checks run."""

import copy

import pytest

from plonky2_tpu.plonk.validate_shape import validate_proof_with_pis_shape


def test_valid_proof_has_valid_shape(fib_data_and_proof):
    data, proof = fib_data_and_proof
    validate_proof_with_pis_shape(proof, data.common)


def test_truncated_wire_openings_rejected(fib_data_and_proof):
    data, proof = fib_data_and_proof
    bad = copy.deepcopy(proof)
    bad.proof.openings.wires = bad.proof.openings.wires[:-1]
    with pytest.raises(AssertionError, match="wire openings"):
        data.verify(bad)


def test_extra_public_input_rejected(fib_data_and_proof):
    data, proof = fib_data_and_proof
    bad = copy.deepcopy(proof)
    bad.public_inputs = list(bad.public_inputs) + [0]
    with pytest.raises(AssertionError, match="public input count"):
        data.verify(bad)


def test_dropped_query_round_rejected(fib_data_and_proof):
    data, proof = fib_data_and_proof
    bad = copy.deepcopy(proof)
    bad.proof.opening_proof.query_round_proofs = \
        bad.proof.opening_proof.query_round_proofs[:-1]
    with pytest.raises(AssertionError, match="query round count"):
        data.verify(bad)


def test_short_final_poly_rejected(fib_data_and_proof):
    data, proof = fib_data_and_proof
    bad = copy.deepcopy(proof)
    bad.proof.opening_proof.final_poly = \
        bad.proof.opening_proof.final_poly[:-1]
    with pytest.raises(AssertionError, match="final polynomial length"):
        data.verify(bad)


def test_narrow_initial_leaf_rejected(fib_data_and_proof):
    data, proof = fib_data_and_proof
    bad = copy.deepcopy(proof)
    ep = bad.proof.opening_proof.query_round_proofs[0] \
        .initial_trees_proof.evals_proofs
    ep[1] = (ep[1][0][:-1], ep[1][1])
    with pytest.raises(AssertionError, match="leaf width"):
        data.verify(bad)


def test_wrong_cap_length_rejected(fib_data_and_proof):
    data, proof = fib_data_and_proof
    bad = copy.deepcopy(proof)
    bad.proof.wires_cap = bad.proof.wires_cap[:-1]
    with pytest.raises(AssertionError, match="wires cap length"):
        data.verify(bad)
