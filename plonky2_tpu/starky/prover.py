"""STARK prover (reference: starky/src/prover.rs:37-260,
compute_quotient_polys:343-470) with logUp lookups (prover.rs:127-196) and
cross-table lookups (CTL aux columns batched into the same oracle,
prover.rs:165-196; multi-table orchestration mirrors what zk_evm builds on
get_ctl_data, cross_table_lookup.rs:226-252).

TPU mapping mirrors the PLONK prover: trace commit = batched iNTT+LDE+Merkle;
quotient = ONE vectorized constraint evaluation over the quotient coset via
the algebra-generic Stark.eval; staged jits for XLA:CPU-friendly compiles.
Lookup/CTL helper columns are jitted programs over the whole trace
(vectorized combine + Fermat batch inverse + associative-scan running sums).
"""

from __future__ import annotations

import copy

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
from .cross_table_lookup import (
    eval_cross_table_lookup_checks, ctl_check_vars_single, get_ctl_data,
    num_ctl_counts,
)
from .lookup import get_grand_product_challenge_set, lookup_helper_columns
from .proof import (
    MultiProof, StarkOpeningSet, StarkProof, StarkProofWithPublicInputs,
)
from .stark import ConstraintConsumer, EvaluationFrame, Stark


def prove(stark: Stark, config: StarkConfig, trace: np.ndarray,
          public_inputs: list[int],
          timing: TimingTree | None = None,
          challenger: Challenger | None = None,
          ctl_data=None, ctl_challenges=None, ctls=None,
          table: int = 0, gc=None) -> StarkProofWithPublicInputs:
    """trace: uint64 [COLUMNS, degree] of trace values (column-major rows).

    For CTL-linked tables, pass the shared post-CTL-challenge `challenger`
    plus this table's `ctl_data` and the system-wide `ctl_challenges`/`ctls`.
    `gc` selects the hashing configuration (GenericConfig; default Poseidon —
    the reference's starky is likewise generic over C).
    """
    if gc is None:
        from ..hash.hashers import PoseidonGoldilocksConfig
        gc = PoseidonGoldilocksConfig
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
            trace_gf, rate_bits, False, cap_height, hasher=gc.hasher)

    if challenger is None:
        challenger = Challenger(gc.hasher)
        challenger.observe_cap(trace_commitment.merkle_tree.cap_digests())

    # logUp lookups: draw (beta, gamma) challenge pairs, use the betas; with
    # CTLs the shared ctl challenges are reused (reference: prover.rs:131-141)
    lookup_challenges = None
    aux_commitment = None
    num_lookup_columns = 0
    num_ctl_helpers = 0
    num_ctl_zs = 0
    if stark.uses_lookups():
        if ctl_challenges is not None:
            pairs = ctl_challenges
        else:
            pairs = get_grand_product_challenge_set(challenger,
                                                    config.num_challenges)
        lookup_challenges = [beta for beta, _gamma in pairs]
        with timing.scope("compute lookup helper columns"):
            fn = _helper_columns_fn(stark, config, degree_bits)
            aux_polys = fn(trace_gf, GF.from_u64(np.asarray(
                lookup_challenges, dtype=np.uint64)))
        num_lookup_columns = aux_polys.shape[0]
    else:
        aux_polys = None

    if ctl_data is not None and ctl_data.zs_columns:
        assert stark.requires_ctls(), \
            "stark participating in CTLs must override requires_ctls()"
        ctl_aux = ctl_data.auxiliary_polys()
        num_ctl_zs = len(ctl_data.zs_columns)
        num_ctl_helpers = ctl_aux.shape[0] - num_ctl_zs
        aux_polys = (ctl_aux if aux_polys is None
                     else GF.concatenate([aux_polys, ctl_aux], axis=0))

    if aux_polys is not None:
        with timing.scope("compute auxiliary polynomials commitment"):
            aux_commitment = PolynomialBatch.from_values(
                aux_polys, rate_bits, False, cap_height, hasher=gc.hasher)
        challenger.observe_cap(aux_commitment.merkle_tree.cap_digests())

    alphas = challenger.get_n_challenges(config.num_challenges)

    with timing.scope("compute quotient polys"):
        quotient_chunks = _compute_quotient_polys(
            stark, config, trace_commitment, aux_commitment,
            lookup_challenges, ctl_challenges, ctls, table, public_inputs,
            alphas, degree_bits)
    with timing.scope("compute quotient commitment"):
        quotient_commitment = PolynomialBatch.from_coeffs(
            quotient_chunks, rate_bits, False, cap_height, hasher=gc.hasher)
    challenger.observe_cap(quotient_commitment.merkle_tree.cap_digests())

    zeta = challenger.get_extension_challenge()
    g = ref.primitive_root_of_unity(degree_bits)
    assert ref.ext2_exp(zeta, degree) != (1, 0), \
        "Opening point is in the subgroup"
    zeta_next = ref.ext2_scalar_mul(zeta, g)

    from ..plonk.prover import _eval_polys_ext
    requires_ctl = ctl_data is not None and ctl_data.zs_columns
    with timing.scope("openings"):
        ctl_zs_first = None
        if requires_ctl:
            aux_at_one = _eval_polys_ext(aux_commitment, (1, 0))
            ctl_zs_first = [v[0] for v in
                            aux_at_one[num_lookup_columns + num_ctl_helpers:]]
        openings = StarkOpeningSet(
            local_values=_eval_polys_ext(trace_commitment, zeta),
            next_values=_eval_polys_ext(trace_commitment, zeta_next),
            quotient_polys=_eval_polys_ext(quotient_commitment, zeta),
            auxiliary_polys=(_eval_polys_ext(aux_commitment, zeta)
                             if aux_commitment else None),
            auxiliary_polys_next=(_eval_polys_ext(aux_commitment, zeta_next)
                                  if aux_commitment else None),
            ctl_zs_first=ctl_zs_first,
        )
    observe_openings(challenger, openings.to_fri_openings())

    instance = stark.fri_instance(zeta, g, config,
                                  num_ctl_helpers=num_ctl_helpers,
                                  num_ctl_zs=num_ctl_zs)
    commitments = [trace_commitment]
    if aux_commitment is not None:
        commitments.append(aux_commitment)
    commitments.append(quotient_commitment)
    with timing.scope("FRI opening proof"):
        opening_proof = PolynomialBatch.prove_openings(
            instance, commitments, challenger, fri_params)

    def cap_list(c):
        return c.merkle_tree.cap_digests()

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


def prove_multi(starks: list[Stark], config: StarkConfig,
                traces: list[np.ndarray], ctls,
                public_inputs: list[list[int]],
                timing: TimingTree | None = None) -> MultiProof:
    """Prove a CTL-linked multi-STARK system: one shared challenger observes
    every trace cap, draws the CTL challenges, computes all tables' CTL aux
    columns, then each table is proven from a fork of that transcript state
    (reference flow: get_ctl_data, cross_table_lookup.rs:226-252)."""
    timing = timing or TimingTree()
    max_degree = max(s.constraint_degree() for s in starks)
    assert max_degree >= 2, "CTL helper chunks need constraint degree >= 2"
    trace_gfs = [GF.from_u64(t) for t in traces]
    caps = []
    challenger = Challenger()
    with timing.scope("trace commitments"):
        commitments = [PolynomialBatch.from_values(
            t, config.fri_config.rate_bits, False,
            config.fri_config.cap_height) for t in trace_gfs]
    for c in commitments:
        challenger.observe_cap(c.merkle_tree.cap_u64())
    with timing.scope("ctl data"):
        ctl_challenges, ctl_data_per_table = get_ctl_data(
            config, trace_gfs, ctls, challenger, max_degree)
    proofs = []
    for i, (stark, trace) in enumerate(zip(starks, traces)):
        fork = copy.deepcopy(challenger)
        proofs.append(prove(
            stark, config, trace, public_inputs[i], timing,
            challenger=fork, ctl_data=ctl_data_per_table[i],
            ctl_challenges=ctl_challenges, ctls=ctls, table=i))
    return MultiProof(stark_proofs=proofs, ctl_challenges=ctl_challenges)


_STARK_QUOTIENT_FNS: dict = {}
_HELPER_FNS: dict = {}


def _helper_columns_fn(stark, config, degree_bits: int):
    """Jitted: trace [cols, n] + challenges [nc] -> aux columns [na, n]."""
    key = (stark.jit_key(), config.num_challenges, degree_bits)
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
                            lookup_challenges, ctl_challenges, ctls, table,
                            public_inputs, alphas, degree_bits: int) -> GF:
    qdb = (stark.quotient_degree_factor() - 1).bit_length()
    rate_bits = config.fri_config.rate_bits
    assert qdb <= rate_bits
    step = 1 << (rate_bits - qdb)
    next_step = 1 << qdb

    from ..plonk.prover import _natural_lde
    trace_lde = _natural_lde(trace_commitment, step)   # [cols, N]
    fn = _stark_quotient_fn(stark, config, degree_bits, next_step, ctls,
                            table)
    as_gf = lambda xs: GF.from_u64(np.asarray(xs, dtype=np.uint64))
    args = [trace_lde]
    if aux_commitment is not None:
        args.append(_natural_lde(aux_commitment, step))
    if lookup_challenges is not None:
        args.append(as_gf(lookup_challenges))
    if ctls is not None:
        args.append(as_gf(ctl_challenges))   # [nc, 2]
    args += [as_gf(alphas), as_gf(public_inputs)]
    return fn(*args)


def _stark_quotient_fn(stark, config, degree_bits: int, next_step: int,
                       ctls=None, table: int = 0):
    # structural key: CTL tables with identical starks/configs share one
    # compiled quotient program (frozen dataclasses are hashable)
    key = (stark.jit_key(), config, degree_bits, next_step,
           tuple(ctls) if ctls is not None else None, table)
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
    has_ctls = ctls is not None
    if has_ctls:
        max_degree = max(2, stark.constraint_degree())
        per_ctl_helpers = num_ctl_counts(ctls, table, max_degree)

    def core(trace_lde: GF, aux_lde, lookup_challenges, ctl_challenges,
             alphas: GF, public_inputs: GF):
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
        num_lk = 0
        if uses_lookups or has_ctls:
            na = aux_lde.shape[0]
            aux_next_rows = roll_next(aux_lde)
            aux_local = [aux_lde[j] for j in range(na)]
            aux_next = [aux_next_rows[j] for j in range(na)]
        if uses_lookups:
            from .lookup import eval_lookups
            num_lk = stark.num_lookup_helper_columns(config)
            challenges = [lookup_challenges[i].broadcast_to((N,))
                          for i in range(nc)]
            eval_lookups(alg, stark, stark.lookups(), local, next_,
                         aux_local, aux_next, challenges, consumer)
        if has_ctls:
            ctl_chals = [(ctl_challenges[i, 0].broadcast_to((N,)),
                          ctl_challenges[i, 1].broadcast_to((N,)))
                         for i in range(nc)]
            ctl_zs = list(zip(aux_local[num_lk:], aux_next[num_lk:]))
            ctl_vars = ctl_check_vars_single(table, ctl_zs, ctls, ctl_chals,
                                             per_ctl_helpers)
            eval_cross_table_lookup_checks(alg, local, next_, ctl_vars,
                                           consumer,
                                           max(2, stark.constraint_degree()))

        zh_inv_g = GF.from_u64(zh_inv_np)
        quotient_values = GF.stack(
            [acc * zh_inv_g for acc in consumer.accs], axis=0)   # [nc, N]
        coeffs = ntt.coset_ifft(quotient_values, shift=g_shift)
        return coeffs[:, :qdf * degree].reshape(nc * qdf, degree)

    if uses_lookups and has_ctls:
        jitted = jax.jit(core)
    elif uses_lookups:
        jitted = jax.jit(lambda t, a, lc, al, pi: core(t, a, lc, None, al, pi))
    elif has_ctls:
        jitted = jax.jit(lambda t, a, cc, al, pi: core(t, a, None, cc, al, pi))
    else:
        jitted = jax.jit(lambda t, al, pi: core(t, None, None, None, al, pi))
    _STARK_QUOTIENT_FNS[key] = jitted
    return jitted
