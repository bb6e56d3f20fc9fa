"""Proof serialization roundtrip (reference: fibonacci_serialization example +
util/serialization tests). Reuses the module-scoped fibonacci proof."""

from plonky2_tpu.utils.serialization import (
    deserialize_proof_with_pis, deserialize_verifier_data,
    serialize_proof_with_pis, serialize_verifier_data,
)


def test_proof_roundtrip_and_verify(fib_data_and_proof):  # noqa: F811
    data, proof = fib_data_and_proof
    blob = serialize_proof_with_pis(proof, data.common)
    restored = deserialize_proof_with_pis(blob, data.common)
    assert restored.public_inputs == proof.public_inputs
    assert blob == serialize_proof_with_pis(restored, data.common)
    data.verify(restored)

    vblob = serialize_verifier_data(data.verifier_only)
    vd = deserialize_verifier_data(vblob)
    assert vd.circuit_digest == data.verifier_only.circuit_digest
    assert vd.constants_sigmas_cap == data.verifier_only.constants_sigmas_cap
