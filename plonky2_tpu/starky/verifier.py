"""STARK verifier — host-side (reference: starky/src/verifier.rs:29-210,
get_challenges.rs:26-80), including logUp lookup constraint checks
(verifier.rs:126-160)."""

from __future__ import annotations

from ..field import reference as ref
from ..fri.challenges import fri_challenges, observe_openings
from ..fri.verifier import verify_fri_proof
from ..gates.gate import EXT
from ..iop.challenger import Challenger
from ..utils.bits import log2_strict
from .config import StarkConfig
from .lookup import eval_lookups, get_grand_product_challenge_set
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
    lookup_challenges = None
    if stark.uses_lookups():
        pairs = get_grand_product_challenge_set(ch, config.num_challenges)
        lookup_challenges = [beta for beta, _gamma in pairs]
        assert proof.auxiliary_polys_cap is not None
        ch.observe_cap(proof.auxiliary_polys_cap)
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

    local = [tuple(v) for v in proof.openings.local_values]
    next_vals = [tuple(v) for v in proof.openings.next_values]
    frame = EvaluationFrame(local, next_vals, [(p, 0) for p in public_inputs])
    consumer = ConstraintConsumer(EXT, [EXT.const(a) for a in alphas],
                                  z_last, l_first, l_last)
    stark.eval(EXT, frame, consumer)
    if stark.uses_lookups():
        num_lk = stark.num_lookup_helper_columns(config)
        aux = [tuple(v) for v in proof.openings.auxiliary_polys][:num_lk]
        aux_next = [tuple(v)
                    for v in proof.openings.auxiliary_polys_next][:num_lk]
        eval_lookups(EXT, stark, stark.lookups(), local, next_vals,
                     aux, aux_next, [EXT.const(c) for c in lookup_challenges],
                     consumer)
    vanishing = consumer.accs

    qdf = stark.quotient_degree_factor()
    for i in range(config.num_challenges):
        chunk = proof.openings.quotient_polys[i * qdf:(i + 1) * qdf]
        acc = (0, 0)
        for c in reversed(chunk):
            acc = ref.ext2_add(ref.ext2_mul(acc, zeta_pow_deg), tuple(c))
        assert tuple(vanishing[i]) == tuple(ref.ext2_mul(z_h_zeta, acc)), \
            f"quotient mismatch for challenge {i}"

    caps = [proof.trace_cap]
    if proof.auxiliary_polys_cap is not None:
        caps.append(proof.auxiliary_polys_cap)
    caps.append(proof.quotient_polys_cap)
    verify_fri_proof(
        stark.fri_instance(zeta, g, config),
        proof.openings.to_fri_openings(),
        fri_ch,
        caps,
        proof.opening_proof,
        config.fri_params(degree_bits),
    )
