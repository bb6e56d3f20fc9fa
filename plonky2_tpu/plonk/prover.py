"""PLONK prover — 5 rounds, each a fused device program.

Reference call stack: plonky2/src/plonk/prover.rs:104-355 (see SURVEY §3.1).
TPU-native mapping:
  - witness generation: host fixpoint (sparse, sequential by nature)
  - round 1 wires commit: batched iNTT+LDE+Merkle (PolynomialBatch)
  - round 2 partial products: vectorized over rows; the Z cumulative product
    (reference prover.rs:426-434, serial) becomes a log-depth
    jax.lax.associative_scan over field muls
  - round 3 quotient: ONE vectorized vanishing-poly evaluation over the whole
    LDE grid (replaces the 32-point batched rayon loop, prover.rs:598)
  - round 4 openings: batched polynomial evaluation at zeta via power-weighted
    tree sums
  - round 5: FRI (fri/prover.py)
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..field import reference as ref
from ..field.extension import GF2, gf2_powers
from ..field.goldilocks import GF, gf_powers
from ..fri.challenges import observe_openings
from ..fri.oracle import PolynomialBatch
from ..gates.gate import GFAlgebra
from ..iop.challenger import Challenger
from ..iop.generator import generate_partial_witness
from ..iop.witness import PartialWitness
from ..ops import ntt
from ..utils.bits import reverse_index_bits_perm
from ..utils.timing import TimingTree
from .circuit_data import CommonCircuitData, ProverOnlyData
from .proof import OpeningSet, Proof, ProofWithPublicInputs
from .vanishing import evaluate_gate_constraints_rows


def prove(prover_data: ProverOnlyData, common: CommonCircuitData,
          inputs: PartialWitness,
          timing: TimingTree | None = None) -> ProofWithPublicInputs:
    timing = timing or TimingTree()
    config = common.config
    fri_config = config.fri_config
    num_challenges = config.num_challenges

    with timing.scope('run generators'):
        witness = generate_partial_witness(inputs, prover_data, common)
    public_inputs = [witness.get(t) for t in prover_data.public_inputs]
    gc = common.gc
    public_inputs_hash = gc.hash_public_inputs(public_inputs)

    wires_gf = GF.from_u64(witness.full_witness())        # [num_wires, n]

    # ROUND 1: wires commitment
    with timing.scope('wires commitment'):
        wires_commitment = PolynomialBatch.from_values(
            wires_gf, fri_config.rate_bits,
            config.zero_knowledge, fri_config.cap_height, hasher=gc.hasher)

    challenger = Challenger(gc.hasher)
    challenger.observe_hash(prover_data.circuit_digest)
    challenger.observe_hash(public_inputs_hash)
    challenger.observe_cap(wires_commitment.merkle_tree.cap_digests())

    betas = challenger.get_n_challenges(num_challenges)
    gammas = challenger.get_n_challenges(num_challenges)

    # ROUND 2: permutation partial products + Z
    with timing.scope('compute partial products'):
        sigmas_gf, subgroup_gf = _prover_device_constants(prover_data)
        zs_rows, pp_rows = [], []
        pp_fn = _partial_products_fn(config.num_routed_wires, common.degree,
                                     common.quotient_degree_factor,
                                     tuple(common.k_is))
        for i in range(num_challenges):
            z, pps = pp_fn(wires_gf, sigmas_gf,
                           subgroup_gf, GF.const(betas[i]),
                           GF.const(gammas[i]))
            zs_rows.append(z.reshape(1, -1))
            pp_rows.append(pps)
        zs_partial_products = GF.concatenate(zs_rows + pp_rows, axis=0)

    with timing.scope('zs+partial_products commitment'):
        zs_pp_commitment = PolynomialBatch.from_values(
            zs_partial_products, fri_config.rate_bits,
            config.zero_knowledge, fri_config.cap_height, hasher=gc.hasher)
    challenger.observe_cap(zs_pp_commitment.merkle_tree.cap_digests())

    alphas = challenger.get_n_challenges(num_challenges)

    # ROUND 3: quotient polynomials
    with timing.scope('compute quotient polys'):
        quotient_chunks = compute_quotient_polys(
            common, prover_data, public_inputs_hash, wires_commitment,
            zs_pp_commitment, betas, gammas, alphas)
    with timing.scope('quotient commitment'):
        quotient_commitment = PolynomialBatch.from_coeffs(
            quotient_chunks, fri_config.rate_bits,
            config.zero_knowledge, fri_config.cap_height, hasher=gc.hasher)
    challenger.observe_cap(quotient_commitment.merkle_tree.cap_digests())

    # ROUND 4: openings at zeta, g*zeta
    zeta = challenger.get_extension_challenge()
    assert ref.ext2_exp(zeta, common.degree) != (1, 0), \
        "Opening point is in the subgroup"
    zeta_next = ref.ext2_scalar_mul(
        zeta, ref.primitive_root_of_unity(common.degree_bits))

    with timing.scope('openings at zeta'):
        cs_eval, wires_eval, zs_pp_eval, q_eval, zs_pp_next_eval = \
            _eval_openings_fused(
                prover_data.constants_sigmas_commitment.polynomials,
                wires_commitment.polynomials,
                zs_pp_commitment.polynomials,
                quotient_commitment.polynomials, zeta, zeta_next)
    openings = OpeningSet(
        constants=[cs_eval[j] for j in common.constants_range],
        plonk_sigmas=[cs_eval[j] for j in common.sigmas_range],
        wires=wires_eval,
        plonk_zs=[zs_pp_eval[j] for j in common.zs_range],
        plonk_zs_next=[zs_pp_next_eval[j] for j in common.zs_range],
        partial_products=[zs_pp_eval[j] for j in common.partial_products_range],
        quotient_polys=q_eval,
    )
    observe_openings(challenger, openings.to_fri_openings())

    # ROUND 5: FRI opening proof
    oracles = [prover_data.constants_sigmas_commitment, wires_commitment,
               zs_pp_commitment, quotient_commitment]
    instance = common.get_fri_instance(zeta)
    with timing.scope('FRI opening proof'):
        opening_proof = PolynomialBatch.prove_openings(
            instance, oracles, challenger, common.fri_params)

    proof = Proof(
        wires_cap=_cap_list(wires_commitment),
        plonk_zs_partial_products_cap=_cap_list(zs_pp_commitment),
        quotient_polys_cap=_cap_list(quotient_commitment),
        openings=openings,
        opening_proof=opening_proof,
    )
    return ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)


def _cap_list(commitment) -> list:
    return commitment.merkle_tree.cap_digests()


def _prover_device_constants(prover_data):
    """Device-resident copies of the per-circuit prover constants, uploaded
    once and memoized on the ProverOnlyData: re-creating them from numpy on
    every prove re-ships ~MBs through the tunnel per proof."""
    cached = getattr(prover_data, "_device_constants", None)
    if cached is None:
        import jax.numpy as _jnp
        s = GF.from_u64(prover_data.sigmas)
        g = GF.from_u64(prover_data.subgroup)
        cached = (GF(_jnp.asarray(s.lo), _jnp.asarray(s.hi)),
                  GF(_jnp.asarray(g.lo), _jnp.asarray(g.hi)))
        prover_data._device_constants = cached
    return cached


# ---------------------------------------------------------------------------
# Round 4: batched polynomial evaluation at an extension point
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _eval_polys_jit(num: int, n: int):
    def f(coeffs: GF, z: GF2):
        zp = gf2_powers(z, n)              # GF2 [n]
        c0 = (coeffs * zp.c0.reshape(1, n).broadcast_to(coeffs.shape)).sum(-1)
        c1 = (coeffs * zp.c1.reshape(1, n).broadcast_to(coeffs.shape)).sum(-1)
        return c0, c1

    return jax.jit(f)


def _eval_polys_ext(commitment, z) -> list:
    """Evaluate every committed polynomial at extension point z
    (reference: proof.rs:323-328 eval_commitment)."""
    coeffs = commitment.polynomials        # GF [num, n]
    num, n = coeffs.shape
    c0, c1 = _eval_polys_jit(num, n)(coeffs, GF2.const(*z))
    return [(int(a), int(b)) for a, b in zip(c0.to_u64(), c1.to_u64())]


@lru_cache(maxsize=None)
def _eval_openings_jit(nums: tuple, n: int):
    """ALL oracle evals for the opening set in ONE program and ONE stacked
    output: the old route (5 separate eval programs, each with its own
    readback) cost ~10 tunnel round trips ~= 280 ms of the warm prove."""
    def f(cs: GF, wires: GF, zs_pp: GF, quot: GF, z: GF2, zn: GF2):
        all_c = GF.concatenate([cs, wires, zs_pp, quot], axis=0)
        zp = gf2_powers(z, n)
        c0 = (all_c * zp.c0.reshape(1, n).broadcast_to(all_c.shape)).sum(-1)
        c1 = (all_c * zp.c1.reshape(1, n).broadcast_to(all_c.shape)).sum(-1)
        znp = gf2_powers(zn, n)
        n0 = (zs_pp * znp.c0.reshape(1, n).broadcast_to(zs_pp.shape)).sum(-1)
        n1 = (zs_pp * znp.c1.reshape(1, n).broadcast_to(zs_pp.shape)).sum(-1)
        return GF.concatenate([c0, n0], axis=0), GF.concatenate([c1, n1],
                                                                axis=0)

    return jax.jit(f)


def _eval_openings_fused(cs, wires, zs_pp, quot, zeta, zeta_next):
    """-> (cs_eval, wires_eval, zs_pp_eval, quotient_eval, zs_pp_next_eval)
    as lists of (c0, c1) int pairs; one dispatch + one readback total."""
    nums = (cs.shape[0], wires.shape[0], zs_pp.shape[0], quot.shape[0])
    n = cs.shape[-1]
    c0, c1 = _eval_openings_jit(nums, n)(
        cs, wires, zs_pp, quot, GF2.const(*zeta), GF2.const(*zeta_next))
    l0, h0, l1, h1 = (np.asarray(a) for a in
                      jax.device_get((c0.lo, c0.hi, c1.lo, c1.hi)))
    a0 = l0.astype(np.uint64) | (h0.astype(np.uint64) << np.uint64(32))
    a1 = l1.astype(np.uint64) | (h1.astype(np.uint64) << np.uint64(32))
    pairs = [(int(x), int(y)) for x, y in zip(a0, a1)]
    out, off = [], 0
    for k in nums:
        out.append(pairs[off:off + k])
        off += k
    out.append(pairs[off:])               # zs_pp at zeta_next
    return out[0], out[1], out[2], out[3], out[4]


# ---------------------------------------------------------------------------
# Round 2: partial products (vectorized)
# ---------------------------------------------------------------------------

def _gf_scan_mul_exclusive(x: GF) -> GF:
    """Exclusive prefix products along the last axis via associative scan."""
    def combine(a, b):
        p = GF(a[0], a[1]) * GF(b[0], b[1])
        return (p.lo, p.hi)

    lo, hi = jax.lax.associative_scan(combine, (x.lo, x.hi), axis=-1)
    incl = GF(lo, hi)
    one = GF.ones((*x.shape[:-1], 1))
    return GF.concatenate([one, incl[..., :-1]], axis=-1)


@lru_cache(maxsize=None)
def _pp_stages(num_routed: int, degree: int, max_degree: int, k_is: tuple):
    """Unjitted partial-product stage bodies, shared between the serial
    prover (jit per stage) and the batch prover (jit(vmap(stage)))."""
    # ragged chunking like the reference's chunks(max_degree) — the last
    # chunk may be smaller (util/partial_products.rs:55-78)
    chunk_bounds = [(i, min(i + max_degree, num_routed))
                    for i in range(0, num_routed, max_degree)]
    num_chunks = len(chunk_bounds)

    def chunks_stage(wires: GF, sigmas: GF, subgroup: GF, beta: GF,
                     gamma: GF):
        nr, n = num_routed, degree
        wires = wires[:nr]       # routed wires only (slice inside the trace)
        k_arr = GF.from_u64(np.asarray(k_is, dtype=np.uint64))
        x = subgroup.reshape(1, n).broadcast_to((nr, n))
        k = k_arr.reshape(nr, 1).broadcast_to((nr, n))
        b = beta.broadcast_to((nr, n))
        gmma = gamma.broadcast_to((nr, n))
        numer = wires + b * (k * x) + gmma
        denom = wires + b * sigmas + gmma
        quot = numer * denom.inverse()
        if num_routed % max_degree == 0:
            # uniform chunks: one reshape + max_degree slab multiplies
            # (fewer, larger ops — faster XLA compile and execution)
            quot_c = quot.reshape(num_chunks, max_degree, n)
            cp = quot_c[:, 0]
            for j in range(1, max_degree):
                cp = cp * quot_c[:, j]
        else:
            cps = []
            for lo, hi in chunk_bounds:
                acc = quot[lo]
                for j in range(lo + 1, hi):
                    acc = acc * quot[j]
                cps.append(acc.reshape(1, n))
            cp = GF.concatenate(cps, axis=0) if num_chunks > 1 else cps[0]
        row_prod = cp[0]
        for j in range(1, num_chunks):
            row_prod = row_prod * cp[j]
        return cp, row_prod

    def pps_stage(z: GF, cp: GF):
        n = degree
        pps = []
        acc = z
        for j in range(num_chunks - 1):
            acc = acc * cp[j]
            pps.append(acc.reshape(1, n))
        return GF.concatenate(pps, axis=0)

    return chunks_stage, pps_stage


@lru_cache(maxsize=None)
def _partial_products_fn(num_routed: int, degree: int, max_degree: int,
                         k_is: tuple):
    """Three small jits instead of one: fusing the prefix-product scan with
    the surrounding multiply chains triggers a pathological XLA:CPU compile
    (minutes); isolated stages compile in seconds each."""
    chunks_stage, pps_stage = _pp_stages(num_routed, degree, max_degree,
                                         k_is)
    j_chunks = jax.jit(chunks_stage)
    j_scan = jax.jit(_gf_scan_mul_exclusive)
    j_pps = jax.jit(pps_stage)

    def run(wires, sigmas, subgroup, beta, gamma):
        cp, row_prod = j_chunks(wires, sigmas, subgroup, beta, gamma)
        z = j_scan(row_prod)
        return z, j_pps(z, cp)

    return run


# ---------------------------------------------------------------------------
# Round 3: quotient polynomials (vectorized vanishing poly over the LDE grid)
# ---------------------------------------------------------------------------

def compute_quotient_polys(common, prover_data, public_inputs_hash,
                           wires_commitment, zs_pp_commitment, betas, gammas,
                           alphas) -> GF:
    """Returns GF [num_challenges * quotient_degree_factor, degree] coefficient
    chunks (reference: prover.rs:600-744 + 266-279)."""
    qdb = (common.quotient_degree_factor - 1).bit_length()
    rate_bits = common.config.fri_config.rate_bits
    # the reference has the identical limitation (prover.rs:617-622:
    # "Having constraints of degree higher than the rate is not supported
    # yet"); ragged chunking already covers num_routed % qdf != 0
    assert qdb <= rate_bits, "constraint degree above rate unsupported"
    step = 1 << (rate_bits - qdb)
    next_step = 1 << qdb

    cs_lde = _natural_lde(prover_data.constants_sigmas_commitment, step)
    wires_lde = _natural_lde(wires_commitment, step)
    zs_pp_lde = _natural_lde(zs_pp_commitment, step)

    fn = _quotient_fn(common, next_step)
    as_gf = lambda xs: GF.from_u64(np.asarray(xs, dtype=np.uint64))
    return fn(cs_lde, wires_lde, zs_pp_lde, as_gf(betas), as_gf(gammas),
              as_gf(alphas), as_gf(public_inputs_hash))


@lru_cache(maxsize=None)
def _natural_lde_fn(N: int, num: int, step: int, salt: int):
    rev = reverse_index_bits_perm(N)

    def f(leaves: GF):
        natural = leaves.take(jnp.asarray(rev), axis=0)
        if step > 1:
            natural = natural[::step]
        if salt:
            natural = natural[:, :natural.shape[1] - salt]
        return natural.transpose(1, 0)

    return jax.jit(f)


def _natural_lde(commitment, step: int) -> GF:
    """[num_polys, N/step] LDE values in natural point order, recovered from
    the commitment's bit-reversed leaves (reference: oracle.rs get_lde_values
    :474 — same data, one jitted device-side gather)."""
    leaves = commitment.merkle_tree.leaves   # [N, num+salt] bit-reversed
    N, cols = leaves.shape
    salt = 4 if commitment.blinding else 0
    return _natural_lde_fn(N, cols, step, salt)(leaves)


_QUOTIENT_FNS: dict = {}
_QUOTIENT_STAGES: dict = {}


def _quotient_stages(common, next_step):
    """Unjitted quotient stage bodies + the shared per-shape device
    constants (x, l_0_x), shared between the serial prover and the batch
    prover's vmapped variants."""
    key = (id(common), next_step)
    if key in _QUOTIENT_STAGES:
        return _QUOTIENT_STAGES[key]

    qdb = (common.quotient_degree_factor - 1).bit_length()
    n_points = common.degree << qdb
    degree = common.degree
    nc = common.config.num_challenges
    g_shift = ref.MULTIPLICATIVE_GROUP_GENERATOR
    w = ref.primitive_root_of_unity(common.degree_bits + qdb)

    # Z_H on coset: evals g^n * v^i - 1, period 2^qdb
    # (reference: field/src/zero_poly_coset.rs)
    rate = 1 << qdb
    g_pow_n = ref.exp(g_shift, degree)
    v = ref.primitive_root_of_unity(qdb)
    zh = []
    cur = 1
    for i in range(rate):
        zh.append(ref.sub(ref.mul(g_pow_n, cur), 1))
        cur = ref.mul(cur, v)
    zh_inv_np = np.tile(
        np.asarray([ref.inverse(t) for t in zh], dtype=np.uint64),
        n_points // rate)

    num_zs = nc
    pp_lo = common.partial_products_range.start
    pp_hi = common.partial_products_range.stop

    nr = common.config.num_routed_wires
    qdf = common.quotient_degree_factor
    chunk_bounds = [(lo, min(lo + qdf, nr)) for lo in range(0, nr, qdf)]
    num_chunks = len(chunk_bounds)
    k_np = np.asarray(common.k_is, dtype=np.uint64)
    N = n_points

    # per-shape constants computed once on device (isolated small jits)
    x = jax.jit(lambda: gf_powers(GF.const(w), N)
                * GF.const(g_shift).broadcast_to((N,)))()
    zh_tiled = np.tile(np.asarray(zh, dtype=np.uint64), N // rate)

    def l0_fn(xv: GF):
        n_const = GF.const(degree % ref.ORDER).broadcast_to((N,))
        one = GF.ones((N,))
        return GF.from_u64(zh_tiled) * (n_const * (xv - one)).inverse()

    l_0_x = jax.jit(l0_fn)(x)

    # Staged jits: fusing the whole quotient pass into one program triggers
    # pathological XLA:CPU compiles; the stages below each compile in seconds
    # and the intermediates are small relative to the LDE data.
    def terms_stage(cs_lde: GF, wires_lde: GF, zs_pp_lde: GF, betas: GF,
                    gammas: GF, pi_hash: GF, x: GF, l_0_x: GF):
        consts_rows = cs_lde[:common.num_constants]
        sigmas_rows = cs_lde[common.num_constants:]     # [nr, N]
        next_zs_pp = GF(jnp.roll(zs_pp_lde.lo, -next_step, axis=-1),
                        jnp.roll(zs_pp_lde.hi, -next_step, axis=-1))
        pi_rows = GF.stack([pi_hash[j].broadcast_to((N,)) for j in range(4)],
                           axis=0)

        constraint_rows = evaluate_gate_constraints_rows(
            common, consts_rows, wires_lde, pi_rows)    # [n_gc, N]

        routed = wires_lde[:nr]
        k_b = GF.from_u64(k_np).reshape(nr, 1).broadcast_to((nr, N))
        s_id = k_b * x.reshape(1, N).broadcast_to((nr, N))
        one = GF.ones((N,))

        def chunk_prods(rows: GF) -> GF:
            """[nr, N] -> [num_chunks, N]: product over each (ragged)
            max_degree-sized chunk of rows. Uniform case uses one reshape +
            qdf slab multiplies (fewer, larger ops)."""
            if nr % qdf == 0:
                chunked = rows.reshape(num_chunks, qdf, N)
                acc = chunked[:, 0]
                for j in range(1, qdf):
                    acc = acc * chunked[:, j]
                return acc
            outs = []
            for lo, hi in chunk_bounds:
                acc = rows[lo]
                for j in range(lo + 1, hi):
                    acc = acc * rows[j]
                outs.append(acc.reshape(1, N))
            return (GF.concatenate(outs, axis=0) if num_chunks > 1
                    else outs[0])

        num_prods = common.num_partial_products
        z1_terms, pp_terms = [], []
        for i in range(nc):
            z_x = zs_pp_lde[i]
            z_gx = next_zs_pp[i]
            z1_terms.append(l_0_x * (z_x - one))
            beta = betas[i].broadcast_to((nr, N))
            gamma = gammas[i].broadcast_to((nr, N))
            numer = routed + beta * s_id + gamma
            denom = routed + beta * sigmas_rows + gamma
            nprod = chunk_prods(numer)
            dprod = chunk_prods(denom)
            pps = zs_pp_lde[pp_lo + i * num_prods:pp_lo + (i + 1) * num_prods]
            accs = GF.concatenate(
                [z_x.reshape(1, N), pps, z_gx.reshape(1, N)], axis=0)
            checks = accs[:-1] * nprod - accs[1:] * dprod   # [num_chunks, N]
            pp_terms.append(checks)

        return GF.concatenate(
            [GF.stack(z1_terms, axis=0)] + pp_terms + [constraint_rows],
            axis=0)                                         # [T, N]

    def reduce_stage(terms: GF, alphas: GF):
        T = terms.shape[0]
        zh_inv_g = GF.from_u64(zh_inv_np)
        vals = []
        for i in range(nc):
            apow = gf_powers(alphas[i], T)                  # [T]
            weighted = terms * apow.reshape(T, 1).broadcast_to((T, N))
            vals.append(weighted.sum(axis=0) * zh_inv_g)
        return GF.stack(vals, axis=0)                       # [nc, N]

    def ifft_stage(quotient_values: GF):
        coeffs = ntt.coset_ifft(quotient_values, shift=g_shift)
        return coeffs[:, :qdf * degree].reshape(nc * qdf, degree)

    stages = (terms_stage, reduce_stage, ifft_stage, x, l_0_x)
    _QUOTIENT_STAGES[key] = stages
    return stages


def _quotient_fn(common, next_step):
    key = (id(common), next_step)
    if key in _QUOTIENT_FNS:
        return _QUOTIENT_FNS[key]
    terms_stage, reduce_stage, ifft_stage, x, l_0_x = _quotient_stages(
        common, next_step)

    j_terms = jax.jit(terms_stage)
    j_reduce = jax.jit(reduce_stage)
    j_ifft = jax.jit(ifft_stage)

    def run(cs_lde, wires_lde, zs_pp_lde, betas, gammas, alphas, pi_hash):
        terms = j_terms(cs_lde, wires_lde, zs_pp_lde, betas, gammas,
                        pi_hash, x, l_0_x)
        return j_ifft(j_reduce(terms, alphas))

    _QUOTIENT_FNS[key] = run
    return run
