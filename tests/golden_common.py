"""Shared helpers for the golden-transcript vectors (used by the freezing
script and the replay test)."""

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


GOLDEN_SEED = 1234


def build_fib100():
    # seeded builder => deterministic unused-PI-wire randomization =>
    # reproducible transcript (the golden-vector requirement)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config(),
                             seed=GOLDEN_SEED)
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)
    for t in (a, b, cur):
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 0)
    pw.set_target(b, 1)
    return data, data.prove(pw)


def build_fib21_config(gc_name: str):
    """Seeded fib(21) circuit under a named GenericConfig — one golden
    fixture per hasher configuration (Poseidon2 / Keccak / PoseidonBN128)."""
    from plonky2_tpu.hash.hashers import CONFIGS
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config(),
                             seed=GOLDEN_SEED)
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(20):
        prev, cur = cur, builder.add(prev, cur)
    for t in (a, b, cur):
        builder.register_public_input(t)
    data = builder.build(gc=CONFIGS[gc_name])
    pw = PartialWitness()
    pw.set_target(a, 0)
    pw.set_target(b, 1)
    return data, data.prove(pw)


def build_fib100_wrap(data=None, proof=None):
    """Seeded recursive wrap of the golden fib(100) proof — the second
    circuit SHAPE pinned by golden vectors (the recursive verifier circuit's
    transcript exercises interpolation/random-access/poseidon gate paths the
    plain fib circuit never touches)."""
    from plonky2_tpu.recursion.targets import (
        add_virtual_proof_with_pis, add_virtual_verifier_data,
        set_proof_with_pis_target, set_verifier_data_target,
    )
    from plonky2_tpu.recursion.verifier import verify_proof_circuit

    if data is None:
        data, proof = build_fib100()
    config = CircuitConfig.standard_recursion_config()
    builder = CircuitBuilder(config, seed=GOLDEN_SEED)
    pt = add_virtual_proof_with_pis(builder, data.common)
    vt = add_virtual_verifier_data(builder, config.fri_config.cap_height)
    verify_proof_circuit(builder, pt, vt, data.common)
    outer = builder.build()
    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, proof)
    set_verifier_data_target(pw, vt, data.verifier_only)
    return outer, outer.prove(pw)


def extract_transcript(data, proof):
    """Challenge sequence (betas/gammas/alphas/zeta/FRI betas/PoW/queries) +
    circuit digest + serialized proof bytes."""
    from plonky2_tpu.plonk.get_challenges import get_challenges
    from plonky2_tpu.utils.serialization import serialize_proof_with_pis

    common = data.common
    pi_hash = common.gc.hash_public_inputs(
        [x % ((1 << 64) - (1 << 32) + 1) for x in proof.public_inputs])
    ch = get_challenges(proof, pi_hash, data.verifier_only.circuit_digest,
                        common)
    return {
        "circuit_digest": [int(x) for x in data.verifier_only.circuit_digest],
        "public_inputs": [int(x) for x in proof.public_inputs],
        "pi_hash": [int(x) for x in pi_hash],
        "betas": [int(x) for x in ch.plonk_betas],
        "gammas": [int(x) for x in ch.plonk_gammas],
        "alphas": [int(x) for x in ch.plonk_alphas],
        "zeta": [int(x) for x in ch.plonk_zeta],
        "fri_alpha": [int(x) for x in ch.fri_challenges.fri_alpha],
        "fri_betas": [[int(x) for x in b]
                      for b in ch.fri_challenges.fri_betas],
        "fri_pow_response": int(ch.fri_challenges.fri_pow_response),
        "fri_query_indices": [int(x)
                              for x in ch.fri_challenges.fri_query_indices],
        "pow_witness": int(proof.proof.opening_proof.pow_witness),
        "proof_hex": serialize_proof_with_pis(proof, common).hex(),
    }
