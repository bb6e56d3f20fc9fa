"""STARK prover (reference: starky/src/prover.rs:37-260,
compute_quotient_polys:343-470). Lookups/CTLs not yet wired (aux oracle
omitted when absent, as in the reference).

TPU mapping mirrors the PLONK prover: trace commit = batched iNTT+LDE+Merkle;
quotient = ONE vectorized constraint evaluation over the quotient coset via
the algebra-generic Stark.eval; staged jits for XLA:CPU-friendly compiles.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..field import reference as ref
from ..field.goldilocks import GF, gf_powers
from ..fri.challenges import observe_openings
from ..fri.oracle import PolynomialBatch
from ..gates.gate import GFAlgebra
from ..iop.challenger import Challenger
from ..ops import ntt
from ..utils.bits import log2_strict, reverse_index_bits_perm
from ..utils.timing import TimingTree
from .config import StarkConfig
from .proof import StarkOpeningSet, StarkProof, StarkProofWithPublicInputs
from .stark import ConstraintConsumer, EvaluationFrame, Stark


def prove(stark: Stark, config: StarkConfig, trace: np.ndarray,
          public_inputs: list[int],
          timing: TimingTree | None = None) -> StarkProofWithPublicInputs:
    """trace: uint64 [COLUMNS, degree] of trace values (column-major rows)."""
    timing = timing or TimingTree()
    assert trace.shape[0] == stark.COLUMNS
    degree = trace.shape[1]
    degree_bits = log2_strict(degree)
    fri_params = config.fri_params(degree_bits)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    assert fri_params.total_arities <= degree_bits + rate_bits - cap_height
    assert stark.constraint_degree() <= (1 << rate_bits) + 1, \
        "constraint degree must be <= blowup + 1"

    trace_gf = GF.from_u64(trace)
    with timing.scope("compute trace commitment"):
        trace_commitment = PolynomialBatch.from_values(
            trace_gf, rate_bits, False, cap_height)

    challenger = Challenger()
    challenger.observe_cap(trace_commitment.merkle_tree.cap_u64())
    alphas = challenger.get_n_challenges(config.num_challenges)

    with timing.scope("compute quotient polys"):
        quotient_chunks = _compute_quotient_polys(
            stark, config, trace_commitment, public_inputs, alphas,
            degree_bits)
    with timing.scope("compute quotient commitment"):
        quotient_commitment = PolynomialBatch.from_coeffs(
            quotient_chunks, rate_bits, False, cap_height)
    challenger.observe_cap(quotient_commitment.merkle_tree.cap_u64())

    zeta = challenger.get_extension_challenge()
    g = ref.primitive_root_of_unity(degree_bits)
    assert ref.ext2_exp(zeta, degree) != (1, 0), \
        "Opening point is in the subgroup"
    zeta_next = ref.ext2_scalar_mul(zeta, g)

    from ..plonk.prover import _eval_polys_ext
    with timing.scope("openings"):
        openings = StarkOpeningSet(
            local_values=_eval_polys_ext(trace_commitment, zeta),
            next_values=_eval_polys_ext(trace_commitment, zeta_next),
            quotient_polys=_eval_polys_ext(quotient_commitment, zeta),
        )
    observe_openings(challenger, openings.to_fri_openings())

    instance = stark.fri_instance(zeta, g, config)
    with timing.scope("FRI opening proof"):
        opening_proof = PolynomialBatch.prove_openings(
            instance, [trace_commitment, quotient_commitment], challenger,
            fri_params)

    def cap_list(c):
        return [[int(x) for x in h] for h in c.merkle_tree.cap_u64()]

    return StarkProofWithPublicInputs(
        proof=StarkProof(
            trace_cap=cap_list(trace_commitment),
            quotient_polys_cap=cap_list(quotient_commitment),
            openings=openings,
            opening_proof=opening_proof,
        ),
        public_inputs=list(public_inputs))


_STARK_QUOTIENT_FNS: dict = {}


def _compute_quotient_polys(stark, config, trace_commitment, public_inputs,
                            alphas, degree_bits: int) -> GF:
    qdb = (stark.quotient_degree_factor() - 1).bit_length()
    rate_bits = config.fri_config.rate_bits
    assert qdb <= rate_bits
    step = 1 << (rate_bits - qdb)
    next_step = 1 << qdb

    from ..plonk.prover import _natural_lde
    trace_lde = _natural_lde(trace_commitment, step)   # [cols, N]
    fn = _stark_quotient_fn(stark, config, degree_bits, next_step)
    as_gf = lambda xs: GF.from_u64(np.asarray(xs, dtype=np.uint64))
    return fn(trace_lde, as_gf(alphas), as_gf(public_inputs))


def _stark_quotient_fn(stark, config, degree_bits: int, next_step: int):
    key = (id(stark), id(config), degree_bits, next_step)
    if key in _STARK_QUOTIENT_FNS:
        return _STARK_QUOTIENT_FNS[key]

    qdf = stark.quotient_degree_factor()
    qdb = (qdf - 1).bit_length()
    degree = 1 << degree_bits
    n_points = degree << qdb
    nc = config.num_challenges
    g_shift = ref.MULTIPLICATIVE_GROUP_GENERATOR
    w = ref.primitive_root_of_unity(degree_bits + qdb)
    g = ref.primitive_root_of_unity(degree_bits)
    last = ref.inverse(g)       # g^{n-1}

    # Z_H and Lagrange first/last on the coset
    rate = 1 << qdb
    g_pow_n = ref.exp(g_shift, degree)
    v = ref.primitive_root_of_unity(qdb) if qdb else 1
    zh = []
    cur = 1
    for _ in range(rate):
        zh.append(ref.sub(ref.mul(g_pow_n, cur), 1))
        cur = ref.mul(cur, v)
    zh_inv_np = np.tile(np.asarray([ref.inverse(t) for t in zh],
                                   dtype=np.uint64), n_points // rate)
    zh_np = np.tile(np.asarray(zh, dtype=np.uint64), n_points // rate)

    def f(trace_lde: GF, alphas: GF, public_inputs: GF):
        N = n_points
        alg = GFAlgebra((N,))
        x = gf_powers(GF.const(w), N) * GF.const(g_shift).broadcast_to((N,))
        one = GF.ones((N,))
        n_const = GF.const(degree % ref.ORDER).broadcast_to((N,))
        zh_full = GF.from_u64(zh_np)
        # L_0(x) = Z_H(x)/(n(x-1)); L_last(x) = Z_H(x)/(n(g x - 1))
        gx = x.mul_small(g) if g < (1 << 32) else \
            x * GF.const(g).broadcast_to((N,))
        denoms = GF.stack([n_const * (x - one), n_const * (gx - one)], axis=0)
        inv = denoms.inverse()
        l_first = zh_full * inv[0]
        l_last = zh_full * inv[1]
        z_last = x - GF.const(last).broadcast_to((N,))

        local = [trace_lde[j] for j in range(stark.COLUMNS)]
        next_rows = GF(jnp.roll(trace_lde.lo, -next_step, axis=-1),
                       jnp.roll(trace_lde.hi, -next_step, axis=-1))
        next_ = [next_rows[j] for j in range(stark.COLUMNS)]
        pis = [public_inputs[j].broadcast_to((N,))
               for j in range(stark.PUBLIC_INPUTS)]
        frame = EvaluationFrame(local, next_, pis)
        consumer = ConstraintConsumer(
            alg, [alphas[i].broadcast_to((N,)) for i in range(nc)],
            z_last, l_first, l_last)
        stark.eval(alg, frame, consumer)

        zh_inv_g = GF.from_u64(zh_inv_np)
        quotient_values = GF.stack(
            [acc * zh_inv_g for acc in consumer.accs], axis=0)   # [nc, N]
        coeffs = ntt.coset_ifft(quotient_values, shift=g_shift)
        return coeffs[:, :qdf * degree].reshape(nc * qdf, degree)

    jitted = jax.jit(f)
    _STARK_QUOTIENT_FNS[key] = jitted
    return jitted
