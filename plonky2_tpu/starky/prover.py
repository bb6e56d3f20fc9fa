"""STARK prover (reference: starky/src/prover.rs:37-260,
compute_quotient_polys:343-470) with logUp lookup support
(prover.rs:127-196).

TPU mapping mirrors the PLONK prover: trace commit = batched iNTT+LDE+Merkle;
quotient = ONE vectorized constraint evaluation over the quotient coset via
the algebra-generic Stark.eval; staged jits for XLA:CPU-friendly compiles.
Lookup helper columns are a jitted program over the whole trace (vectorized
combine + Fermat batch inverse + associative-scan running sum).
"""

from __future__ import annotations

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
from ..utils.bits import log2_strict
from ..utils.timing import TimingTree
from .config import StarkConfig
from .lookup import get_grand_product_challenge_set, lookup_helper_columns
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

    # logUp lookups: draw (beta, gamma) challenge pairs, use the betas
    # (reference: prover.rs:131-141)
    lookups = stark.lookups()
    lookup_challenges = None
    aux_commitment = None
    if stark.uses_lookups():
        pairs = get_grand_product_challenge_set(challenger,
                                                config.num_challenges)
        lookup_challenges = [beta for beta, _gamma in pairs]
        with timing.scope("compute lookup helper columns"):
            fn = _helper_columns_fn(stark, config, degree_bits)
            aux_polys = fn(trace_gf, GF.from_u64(np.asarray(
                lookup_challenges, dtype=np.uint64)))
        with timing.scope("compute auxiliary polynomials commitment"):
            aux_commitment = PolynomialBatch.from_values(
                aux_polys, rate_bits, False, cap_height)
        challenger.observe_cap(aux_commitment.merkle_tree.cap_u64())

    alphas = challenger.get_n_challenges(config.num_challenges)

    with timing.scope("compute quotient polys"):
        quotient_chunks = _compute_quotient_polys(
            stark, config, trace_commitment, aux_commitment,
            lookup_challenges, public_inputs, alphas, degree_bits)
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
            auxiliary_polys=(_eval_polys_ext(aux_commitment, zeta)
                             if aux_commitment else None),
            auxiliary_polys_next=(_eval_polys_ext(aux_commitment, zeta_next)
                                  if aux_commitment else None),
        )
    observe_openings(challenger, openings.to_fri_openings())

    instance = stark.fri_instance(zeta, g, config)
    commitments = [trace_commitment]
    if aux_commitment is not None:
        commitments.append(aux_commitment)
    commitments.append(quotient_commitment)
    with timing.scope("FRI opening proof"):
        opening_proof = PolynomialBatch.prove_openings(
            instance, commitments, challenger, fri_params)

    def cap_list(c):
        return [[int(x) for x in h] for h in c.merkle_tree.cap_u64()]

    return StarkProofWithPublicInputs(
        proof=StarkProof(
            trace_cap=cap_list(trace_commitment),
            quotient_polys_cap=cap_list(quotient_commitment),
            openings=openings,
            opening_proof=opening_proof,
            auxiliary_polys_cap=(cap_list(aux_commitment)
                                 if aux_commitment else None),
        ),
        public_inputs=list(public_inputs))


_STARK_QUOTIENT_FNS: dict = {}
_HELPER_FNS: dict = {}


def _helper_columns_fn(stark, config, degree_bits: int):
    """Jitted: trace [cols, n] + challenges [nc] -> aux columns [na, n]."""
    key = (id(stark), config.num_challenges, degree_bits)
    if key in _HELPER_FNS:
        return _HELPER_FNS[key]
    degree = stark.constraint_degree()
    lookups = stark.lookups()
    nc = config.num_challenges

    def f(trace: GF, challenges: GF):
        cols = []
        for lookup in lookups:
            for i in range(nc):
                cols.append(lookup_helper_columns(
                    lookup, trace, challenges[i], degree))
        return GF.concatenate(cols, axis=0)

    jitted = jax.jit(f)
    _HELPER_FNS[key] = jitted
    return jitted


def _compute_quotient_polys(stark, config, trace_commitment, aux_commitment,
                            lookup_challenges, public_inputs, alphas,
                            degree_bits: int) -> GF:
    qdb = (stark.quotient_degree_factor() - 1).bit_length()
    rate_bits = config.fri_config.rate_bits
    assert qdb <= rate_bits
    step = 1 << (rate_bits - qdb)
    next_step = 1 << qdb

    from ..plonk.prover import _natural_lde
    trace_lde = _natural_lde(trace_commitment, step)   # [cols, N]
    fn = _stark_quotient_fn(stark, config, degree_bits, next_step)
    as_gf = lambda xs: GF.from_u64(np.asarray(xs, dtype=np.uint64))
    if aux_commitment is not None:
        aux_lde = _natural_lde(aux_commitment, step)
        return fn(trace_lde, aux_lde, as_gf(lookup_challenges),
                  as_gf(alphas), as_gf(public_inputs))
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
    uses_lookups = stark.uses_lookups()

    def core(trace_lde: GF, aux_lde, lookup_challenges, alphas: GF,
             public_inputs: GF):
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

        def roll_next(arr: GF) -> GF:
            return GF(jnp.roll(arr.lo, -next_step, axis=-1),
                      jnp.roll(arr.hi, -next_step, axis=-1))

        local = [trace_lde[j] for j in range(stark.COLUMNS)]
        next_rows = roll_next(trace_lde)
        next_ = [next_rows[j] for j in range(stark.COLUMNS)]
        pis = [public_inputs[j].broadcast_to((N,))
               for j in range(stark.PUBLIC_INPUTS)]
        frame = EvaluationFrame(local, next_, pis)
        consumer = ConstraintConsumer(
            alg, [alphas[i].broadcast_to((N,)) for i in range(nc)],
            z_last, l_first, l_last)
        stark.eval(alg, frame, consumer)
        if uses_lookups:
            from .lookup import eval_lookups
            na = aux_lde.shape[0]
            aux_local = [aux_lde[j] for j in range(na)]
            aux_next_rows = roll_next(aux_lde)
            aux_next = [aux_next_rows[j] for j in range(na)]
            challenges = [lookup_challenges[i].broadcast_to((N,))
                          for i in range(nc)]
            eval_lookups(alg, stark, stark.lookups(), local, next_,
                         aux_local, aux_next, challenges, consumer)

        zh_inv_g = GF.from_u64(zh_inv_np)
        quotient_values = GF.stack(
            [acc * zh_inv_g for acc in consumer.accs], axis=0)   # [nc, N]
        coeffs = ntt.coset_ifft(quotient_values, shift=g_shift)
        return coeffs[:, :qdf * degree].reshape(nc * qdf, degree)

    if uses_lookups:
        jitted = jax.jit(core)
    else:
        jitted = jax.jit(lambda trace_lde, alphas, public_inputs: core(
            trace_lde, None, None, alphas, public_inputs))
    _STARK_QUOTIENT_FNS[key] = jitted
    return jitted
