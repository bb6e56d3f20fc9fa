"""Circuit-data checkpoint/resume (reference: serialization/mod.rs
read/write_circuit_data:802,1812; circuit_data.rs:142-332 Mock/Prover/
Verifier splits; exercised like examples/fibonacci_serialization.rs)."""

import numpy as np
import pytest

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.utils.circuit_serialization import (
    deserialize_circuit_data, deserialize_common_circuit_data,
    deserialize_prover_circuit_data, deserialize_verifier_circuit_data,
    serialize_circuit_data, serialize_common_circuit_data,
    serialize_prover_circuit_data, serialize_verifier_circuit_data,
)


@pytest.fixture(scope="module")
def circuit():
    """One shared build for all roundtrip tests (building is expensive on
    this 1-core box; serialization itself is what's under test)."""
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(20):
        prev, cur = cur, builder.add(prev, cur)
    # exercise more generator/gate classes in the registry
    inv = builder.inverse(cur)
    builder.register_public_input(a)
    builder.register_public_input(b)
    builder.register_public_input(cur)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 0)
    pw.set_target(b, 1)
    return data, pw


def test_circuit_data_roundtrip_build_save_reload_prove_verify(circuit):
    data, pw = circuit
    blob = serialize_circuit_data(data)
    restored = deserialize_circuit_data(blob)
    assert restored.common.same_shape(data.common)
    assert (restored.verifier_only.circuit_digest
            == data.verifier_only.circuit_digest)
    assert (restored.prover_only.constants_sigmas_commitment.merkle_tree
            .cap_digests()
            == data.prover_only.constants_sigmas_commitment.merkle_tree
            .cap_digests())
    proof = restored.prove(pw)
    assert proof.public_inputs[2] == 10946
    restored.verify(proof)
    data.verify(proof)          # original accepts reloaded prover's proof


def test_common_circuit_data_roundtrip(circuit):
    data, _ = circuit
    blob = serialize_common_circuit_data(data.common)
    common = deserialize_common_circuit_data(blob)
    assert common.same_shape(data.common)
    assert common.k_is == data.common.k_is
    assert [g.id() for g in common.gates] == [g.id()
                                              for g in data.common.gates]


def test_prover_verifier_splits_roundtrip(circuit):
    data, pw = circuit
    pcd = data.prover_data()
    vcd = data.verifier_data()
    pblob = serialize_prover_circuit_data(pcd)
    vblob = serialize_verifier_circuit_data(vcd)
    prover = deserialize_prover_circuit_data(pblob)
    verifier = deserialize_verifier_circuit_data(vblob)
    proof = prover.prove(pw)
    verifier.verify(proof)


def test_mock_circuit_data_generates_witness_only(circuit):
    data, pw = circuit
    mock = data.mock()
    witness = mock.generate_witness(pw)
    full = witness.full_witness()
    assert isinstance(full, np.ndarray)
    pis = [witness.get(t) for t in data.prover_only.public_inputs]
    assert pis[2] == 10946
