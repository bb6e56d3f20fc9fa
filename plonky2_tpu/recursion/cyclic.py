"""Cyclic recursion (IVC): a circuit that verifies a proof of ITSELF.

Reference: plonky2/src/recursion/cyclic_recursion.rs —
VerifierOnlyCircuitData::from_slice (:20-45), VerifierCircuitTarget::from_slice
(:65-90), conditionally_verify_cyclic_proof (:103-155),
conditionally_verify_cyclic_proof_or_dummy (:157-176),
check_cyclic_proof_verifier_data (:180-200).

The circuit's own verifier data (circuit digest + constants/sigmas cap) is
placed in its public inputs; each step connects the inner proof's embedded
verifier data to its own, so every proof in the chain uses the same key. The
base case verifies a dummy proof instead, selected by a boolean condition.
"""

from __future__ import annotations

from .conditional import conditionally_verify_proof
from .dummy import dummy_proof_and_vk
from .targets import ProofWithPublicInputsTarget, VerifierCircuitTarget


def _vk_pi_layout(common):
    cap_len = common.config.fri_config.num_cap_elements
    n = common.num_public_inputs
    assert n >= 4 + 4 * cap_len, "Not enough public inputs"
    return n - 4 - 4 * cap_len, cap_len


def verifier_data_from_pi_targets(pi_targets: list, common
                                  ) -> VerifierCircuitTarget:
    """[..., circuit_digest(4), constants_sigmas_cap(4*cap_len)]
    (reference: cyclic_recursion.rs:65-90)."""
    start, cap_len = _vk_pi_layout(common)
    digest = pi_targets[start:start + 4]
    cap = [pi_targets[start + 4 + 4 * i:start + 8 + 4 * i]
           for i in range(cap_len)]
    return VerifierCircuitTarget(constants_sigmas_cap=cap,
                                 circuit_digest=digest)


def verifier_data_from_public_inputs(public_inputs: list, common):
    """Value-level extraction (reference: cyclic_recursion.rs:20-45).
    Returns (circuit_digest, constants_sigmas_cap)."""
    start, cap_len = _vk_pi_layout(common)
    digest = [int(x) for x in public_inputs[start:start + 4]]
    cap = [[int(x) for x in public_inputs[start + 4 + 4 * i
                                          :start + 8 + 4 * i]]
           for i in range(cap_len)]
    return digest, cap


def conditionally_verify_cyclic_proof(builder, condition,
                                      cyclic_proof_with_pis:
                                      ProofWithPublicInputsTarget,
                                      other_proof_with_pis:
                                      ProofWithPublicInputsTarget,
                                      other_verifier_data:
                                      VerifierCircuitTarget,
                                      common) -> None:
    """If condition, verify a proof of the circuit being built; else verify
    other_proof (reference: cyclic_recursion.rs:103-155). Requires
    builder.add_verifier_data_public_inputs() to have been called; verifiers
    must separately run check_cyclic_proof_verifier_data."""
    verifier_data = builder.verifier_data_public_input
    assert verifier_data is not None, \
        "Must call add_verifier_data_public_inputs before cyclic recursion"

    if builder.goal_common_data is not None:
        assert builder.goal_common_data.same_shape(common)
    else:
        builder.goal_common_data = common

    inner_pis = verifier_data_from_pi_targets(
        cyclic_proof_with_pis.public_inputs, common)
    # every proof in the cycle must use the same verifier data
    for t, u in zip(inner_pis.circuit_digest, verifier_data.circuit_digest):
        builder.connect(t, u)
    for h_t, h_u in zip(inner_pis.constants_sigmas_cap,
                        verifier_data.constants_sigmas_cap):
        for t, u in zip(h_t, h_u):
            builder.connect(t, u)

    conditionally_verify_proof(builder, condition, cyclic_proof_with_pis,
                               verifier_data, other_proof_with_pis,
                               other_verifier_data, common)

    # make sure we have every gate to match common
    for g in common.gates:
        builder.add_gate_to_gate_set(g)


def conditionally_verify_cyclic_proof_or_dummy(builder, condition,
                                               cyclic_proof_with_pis,
                                               common) -> None:
    """reference: cyclic_recursion.rs:157-176."""
    dummy_pt, dummy_vt = dummy_proof_and_vk(builder, common)
    conditionally_verify_cyclic_proof(builder, condition,
                                      cyclic_proof_with_pis, dummy_pt,
                                      dummy_vt, common)


def check_cyclic_proof_verifier_data(proof_with_pis, verifier_only,
                                     common) -> None:
    """Host-side check that the proof's embedded verifier key matches the
    real one (reference: cyclic_recursion.rs:180-200)."""
    digest, cap = verifier_data_from_public_inputs(
        proof_with_pis.public_inputs, common)
    assert digest == [int(x) for x in verifier_only.circuit_digest], \
        "cyclic proof: circuit digest mismatch"
    assert cap == [[int(x) for x in h]
                   for h in verifier_only.constants_sigmas_cap], \
        "cyclic proof: constants/sigmas cap mismatch"
