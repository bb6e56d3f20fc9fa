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
