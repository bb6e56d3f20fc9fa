"""GenericConfig: full prove+verify under every hasher configuration
(reference: plonk/config.rs:115-208 — PoseidonGoldilocksConfig,
Poseidon2GoldilocksConfig, KeccakGoldilocksConfig,
PoseidonBN128GoldilocksConfig; the challenger is generic over C::Hasher,
prover.rs:178, and public inputs hash with C::InnerHasher, prover.rs:147)."""

import pytest

from plonky2_tpu.hash.hashers import (
    CONFIGS, KeccakGoldilocksConfig, Poseidon2GoldilocksConfig,
    PoseidonBN128GoldilocksConfig, PoseidonGoldilocksConfig,
)
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def _fib_circuit(gc):
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(20):
        prev, cur = cur, builder.add(prev, cur)
    for t in (a, b, cur):
        builder.register_public_input(t)
    data = builder.build(gc=gc)
    pw = PartialWitness()
    pw.set_target(a, 0)
    pw.set_target(b, 1)
    return data, pw


@pytest.fixture(scope="module")
def keccak_proof():
    """One shared Keccak-config build+prove for all keccak tests (proving is
    expensive on this 1-core box)."""
    data, pw = _fib_circuit(KeccakGoldilocksConfig)
    return data, data.prove(pw)


@pytest.fixture(scope="module")
def poseidon2_proof():
    data, pw = _fib_circuit(Poseidon2GoldilocksConfig)
    return data, data.prove(pw)


def _verify_tamper(gc, data, proof):
    assert data.common.gc.name == gc.name
    assert proof.public_inputs[2] == 10946  # fib(21)
    data.verify(proof)
    # Fiat-Shamir binding: tampering a public input must fail
    import copy
    bad = copy.deepcopy(proof)
    bad.public_inputs[2] += 1
    with pytest.raises(AssertionError):
        data.verify(bad)


def test_poseidon2_config_e2e(poseidon2_proof):
    _verify_tamper(Poseidon2GoldilocksConfig, *poseidon2_proof)


def test_keccak_config_e2e(keccak_proof):
    _verify_tamper(KeccakGoldilocksConfig, *keccak_proof)


def test_poseidon_bn128_config_e2e():
    data, pw = _fib_circuit(PoseidonBN128GoldilocksConfig)
    proof = data.prove(pw)
    _verify_tamper(PoseidonBN128GoldilocksConfig, data, proof)


def test_keccak_digests_are_bytes(keccak_proof):
    data, proof = keccak_proof
    assert isinstance(proof.proof.wires_cap[0], bytes)
    assert len(proof.proof.wires_cap[0]) == 25
    assert isinstance(data.verifier_only.circuit_digest, bytes)


def test_serialization_roundtrip_keccak(keccak_proof):
    from plonky2_tpu.utils.serialization import (
        deserialize_proof_with_pis, serialize_proof_with_pis,
    )
    data, proof = keccak_proof
    blob = serialize_proof_with_pis(proof, data.common)
    restored = deserialize_proof_with_pis(blob, data.common)
    assert blob == serialize_proof_with_pis(restored, data.common)
    data.verify(restored)


def test_compressed_proof_roundtrip_poseidon2(poseidon2_proof):
    data, proof = poseidon2_proof
    comp = data.compress(proof)
    data.verify_compressed(comp)


def test_configs_registry():
    assert set(CONFIGS) == {
        "PoseidonGoldilocksConfig", "Poseidon2GoldilocksConfig",
        "KeccakGoldilocksConfig", "PoseidonBN128GoldilocksConfig"}
    assert PoseidonGoldilocksConfig.hasher.algebraic
    assert not KeccakGoldilocksConfig.hasher.algebraic
    assert KeccakGoldilocksConfig.inner_hasher.name == "poseidon"
