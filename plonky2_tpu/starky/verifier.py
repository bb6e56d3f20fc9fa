"""STARK verifier — host-side (reference: starky/src/verifier.rs:29-210,
get_challenges.rs:26-80)."""

from __future__ import annotations

from ..field import reference as ref
from ..fri.challenges import fri_challenges, observe_openings
from ..fri.verifier import verify_fri_proof
from ..gates.gate import EXT
from ..iop.challenger import Challenger
from ..utils.bits import log2_strict
from .config import StarkConfig
from .proof import StarkProofWithPublicInputs
from .stark import ConstraintConsumer, EvaluationFrame, Stark


def verify_stark_proof(stark: Stark,
                       proof_with_pis: StarkProofWithPublicInputs,
                       config: StarkConfig) -> None:
    assert len(proof_with_pis.public_inputs) == stark.PUBLIC_INPUTS
    proof = proof_with_pis.proof
    public_inputs = [x % ref.ORDER for x in proof_with_pis.public_inputs]

    # recover degree from the FRI proof shape
    lde_bits = (config.fri_config.cap_height
                + len(proof.opening_proof.query_round_proofs[0]
                      .initial_trees_proof.evals_proofs[0][1]))
    degree_bits = lde_bits - config.fri_config.rate_bits
    degree = 1 << degree_bits

    # replay challenges (reference: starky get_challenges.rs:26-80)
    ch = Challenger()
    ch.observe_cap(proof.trace_cap)
    alphas = ch.get_n_challenges(config.num_challenges)
    ch.observe_cap(proof.quotient_polys_cap)
    zeta = tuple(ch.get_extension_challenge())
    observe_openings(ch, proof.openings.to_fri_openings())
    fri_ch = fri_challenges(ch, proof.opening_proof, degree_bits,
                            config.fri_config)

    # constraint check at zeta
    g = ref.primitive_root_of_unity(degree_bits)
    zeta_pow_deg = ref.ext2_exp(zeta, degree)
    z_h_zeta = ref.ext2_sub(zeta_pow_deg, (1, 0))
    n_e = degree % ref.ORDER
    l_first = ref.ext2_mul(z_h_zeta, ref.ext2_inverse(
        ref.ext2_scalar_mul(ref.ext2_sub(zeta, (1, 0)), n_e)))
    gz = ref.ext2_scalar_mul(zeta, g)
    l_last = ref.ext2_mul(z_h_zeta, ref.ext2_inverse(
        ref.ext2_scalar_mul(ref.ext2_sub(gz, (1, 0)), n_e)))
    last = ref.inverse(g)
    z_last = ref.ext2_sub(zeta, (last, 0))

    frame = EvaluationFrame(
        [tuple(v) for v in proof.openings.local_values],
        [tuple(v) for v in proof.openings.next_values],
        [(p, 0) for p in public_inputs])
    consumer = ConstraintConsumer(EXT, [EXT.const(a) for a in alphas],
                                  z_last, l_first, l_last)
    stark.eval(EXT, frame, consumer)
    vanishing = consumer.accs

    qdf = stark.quotient_degree_factor()
    for i in range(config.num_challenges):
        chunk = proof.openings.quotient_polys[i * qdf:(i + 1) * qdf]
        acc = (0, 0)
        for c in reversed(chunk):
            acc = ref.ext2_add(ref.ext2_mul(acc, zeta_pow_deg), tuple(c))
        assert tuple(vanishing[i]) == tuple(ref.ext2_mul(z_h_zeta, acc)), \
            f"quotient mismatch for challenge {i}"

    verify_fri_proof(
        stark.fri_instance(zeta, g, config),
        proof.openings.to_fri_openings(),
        fri_ch,
        [proof.trace_cap, proof.quotient_polys_cap],
        proof.opening_proof,
        config.fri_params(degree_bits),
    )
