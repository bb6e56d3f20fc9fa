"""Batch prover: B independent witnesses of ONE circuit through batched
device programs — the TPU-first capability the reference has no analog of
(its parallelism is within one proof, prover.rs:104-355; proving services
that prove the same circuit thousands of times get no cross-proof batching).

Design: every heavy device phase of the serial prover (rounds 1-4: iNTT,
coset LDE, Merkle layers, partial products, the quotient evaluation over
the LDE grid, openings at zeta) is `jax.vmap`-ed over a leading proof axis
and jitted ONCE, so B proofs fill the MXU/VPU with one dispatch per phase
instead of B. The host-side Fiat-Shamir challengers (cheap, per-proof) and
the query-bound FRI phase stay per-proof loops over the existing machinery.
The batched stages reuse the serial prover's *exact* stage bodies
(`prover._pp_stages`, `prover._quotient_stages`), so batched proofs are
bit-identical to serial ones — asserted in tests/test_batch_prover.py.

Zero-knowledge circuits are rejected (per-proof salt randomness makes
batched == serial impossible to assert; prove them serially)."""

from __future__ import annotations

from functools import lru_cache

import jax
import numpy as np

from ..field import reference as ref
from ..field.extension import GF2
from ..field.goldilocks import GF
from ..fri.challenges import observe_openings
from ..fri.oracle import PolynomialBatch
from ..hash.merkle import MerkleTree, build_layers
from ..iop.challenger import Challenger
from ..iop.generator import generate_partial_witness
from ..ops import ntt
from ..utils.bits import log2_strict, reverse_index_bits_perm
from ..utils.timing import TimingTree
from . import prover as serial
from .proof import OpeningSet, Proof, ProofWithPublicInputs


@lru_cache(maxsize=None)
def _commit_values_b(num: int, lg_n: int, rate_bits: int, cap_height: int,
                     hasher_name: str, from_values: bool):
    """jit(vmap) of the salt-free commit pipeline: values/coeffs
    [B, num, n] -> (coeffs, leaves [B, N, num], layers)."""
    from ..hash.hashers import HASHERS_BY_NAME
    hasher = HASHERS_BY_NAME[hasher_name]
    n = 1 << lg_n
    import jax.numpy as jnp
    rev = jnp.asarray(reverse_index_bits_perm(n << rate_bits))

    def body(x: GF):
        coeffs = ntt.ifft(x) if from_values else x
        lde = ntt.coset_lde(coeffs, rate_bits)
        leaves = lde.transpose(1, 0).take(rev, axis=0)
        layers = build_layers(leaves, cap_height, hasher)
        return coeffs, leaves, layers

    return jax.jit(jax.vmap(body))


@lru_cache(maxsize=None)
def _pp_fn_b(num_routed: int, degree: int, max_degree: int, k_is: tuple):
    """Batched partial products: per-proof wires/beta/gamma, shared
    sigmas/subgroup."""
    chunks_stage, pps_stage = serial._pp_stages(num_routed, degree,
                                                max_degree, k_is)
    j_chunks = jax.jit(jax.vmap(chunks_stage,
                                in_axes=(0, None, None, 0, 0)))
    j_scan = jax.jit(jax.vmap(serial._gf_scan_mul_exclusive))
    j_pps = jax.jit(jax.vmap(pps_stage))

    def run(wires_b, sigmas, subgroup, beta_b, gamma_b):
        cp, row_prod = j_chunks(wires_b, sigmas, subgroup, beta_b, gamma_b)
        z = j_scan(row_prod)
        return z, j_pps(z, cp)

    return run


_QUOTIENT_FNS_B: dict = {}


def _quotient_fn_b(common, next_step):
    key = (id(common), next_step)
    if key in _QUOTIENT_FNS_B:
        return _QUOTIENT_FNS_B[key]
    terms_stage, reduce_stage, ifft_stage, x, l_0_x = \
        serial._quotient_stages(common, next_step)

    j_terms = jax.jit(jax.vmap(
        terms_stage, in_axes=(None, 0, 0, 0, 0, 0, None, None)))
    j_reduce = jax.jit(jax.vmap(reduce_stage))
    j_ifft = jax.jit(jax.vmap(ifft_stage))

    def run(cs_lde, wires_lde_b, zs_pp_lde_b, betas_b, gammas_b, alphas_b,
            pi_hash_b):
        terms = j_terms(cs_lde, wires_lde_b, zs_pp_lde_b, betas_b, gammas_b,
                        pi_hash_b, x, l_0_x)
        return j_ifft(j_reduce(terms, alphas_b))

    _QUOTIENT_FNS_B[key] = run
    return run


@lru_cache(maxsize=None)
def _natural_lde_b_fn(step: int, N: int):
    import jax.numpy as jnp
    rev = jnp.asarray(reverse_index_bits_perm(N))

    def body(leaves: GF):                       # [B, N, num]
        natural = leaves.take(rev, axis=1)
        if step > 1:
            natural = natural[:, ::step]
        return natural.transpose(0, 2, 1)       # [B, num, N/step]

    return jax.jit(body)


@lru_cache(maxsize=None)
def _eval_polys_b(num: int, n: int, shared_coeffs: bool):
    base = serial._eval_polys_jit(num, n).__wrapped__
    return jax.jit(jax.vmap(base, in_axes=(None if shared_coeffs else 0, 0)))


def _eval_openings_b(coeffs, zs: list, shared: bool) -> list:
    """coeffs GF [B?, num, n]; zs per-proof extension points. Returns
    [B][num] list of (c0, c1) int pairs."""
    num, n = coeffs.shape[-2:]
    z = GF2.from_u64_pair(
        np.asarray([z[0] for z in zs], dtype=np.uint64),
        np.asarray([z[1] for z in zs], dtype=np.uint64))
    c0, c1 = _eval_polys_b(num, n, shared)(coeffs, z)
    c0 = np.asarray(c0.to_u64())
    c1 = np.asarray(c1.to_u64())
    return [[(int(a), int(b)) for a, b in zip(c0[i], c1[i])]
            for i in range(len(zs))]


def prove_batch(prover_data, common, inputs_list,
                timing: TimingTree | None = None
                ) -> list[ProofWithPublicInputs]:
    """B proofs of the same circuit, bit-identical to serial `prove` calls
    (reference semantics: prover.rs:104-355 per proof)."""
    timing = timing or TimingTree()
    config = common.config
    fri_config = config.fri_config
    nc = config.num_challenges
    gc = common.gc
    assert not config.zero_knowledge, \
        "batch prover covers non-zk circuits; prove zk circuits serially"
    assert gc.hasher.device, \
        "batch prover needs a device (algebraic) hasher config"
    B = len(inputs_list)
    cap_height = fri_config.cap_height
    rate_bits = fri_config.rate_bits
    n = common.degree
    lg_n = common.degree_bits
    hname = gc.hasher.name

    with timing.scope('run generators (batch)'):
        witnesses = [generate_partial_witness(pw, prover_data, common)
                     for pw in inputs_list]
    public_inputs = [[w.get(t) for t in prover_data.public_inputs]
                     for w in witnesses]
    pi_hashes = [gc.hash_public_inputs(pis) for pis in public_inputs]

    wires_b = GF.from_u64(np.stack([w.full_witness() for w in witnesses]))

    # ROUND 1 (batched): wires commitments
    with timing.scope('wires commitment (batch)'):
        num_wires = wires_b.shape[1]
        w_coeffs, w_leaves, w_layers = _commit_values_b(
            num_wires, lg_n, rate_bits, cap_height, hname, True)(wires_b)

    def caps_host(layers):
        return np.asarray(layers[-1].to_u64())          # [B, cap, 4]

    def observe_cap_b(ch, caps_np, b):
        ch.observe_cap([tuple(int(x) for x in h) for h in caps_np[b]])

    challengers = [Challenger(gc.hasher) for _ in range(B)]
    w_caps = caps_host(w_layers)
    betas_l, gammas_l = [], []
    for b, ch in enumerate(challengers):
        ch.observe_hash(prover_data.circuit_digest)
        ch.observe_hash(pi_hashes[b])
        observe_cap_b(ch, w_caps, b)
        betas_l.append(ch.get_n_challenges(nc))
        gammas_l.append(ch.get_n_challenges(nc))

    # ROUND 2 (batched): partial products + Z
    with timing.scope('partial products (batch)'):
        sigmas_gf = GF.from_u64(prover_data.sigmas)
        subgroup_gf = GF.from_u64(prover_data.subgroup)
        pp_fn = _pp_fn_b(config.num_routed_wires, n,
                         common.quotient_degree_factor, tuple(common.k_is))
        zs_rows, pp_rows = [], []
        for i in range(nc):
            beta_b = GF.from_u64(np.asarray([c[i] for c in betas_l],
                                            dtype=np.uint64))
            gamma_b = GF.from_u64(np.asarray([c[i] for c in gammas_l],
                                             dtype=np.uint64))
            z, pps = pp_fn(wires_b[:, :config.num_routed_wires], sigmas_gf,
                           subgroup_gf, beta_b, gamma_b)
            zs_rows.append(z.reshape(B, 1, n))
            pp_rows.append(pps)
        zs_pp_b = GF.concatenate(zs_rows + pp_rows, axis=1)  # [B, Z, n]

    with timing.scope('zs+partial_products commitment (batch)'):
        num_zpp = zs_pp_b.shape[1]
        z_coeffs, z_leaves, z_layers = _commit_values_b(
            num_zpp, lg_n, rate_bits, cap_height, hname, True)(zs_pp_b)

    z_caps = caps_host(z_layers)
    alphas_l = []
    for b, ch in enumerate(challengers):
        observe_cap_b(ch, z_caps, b)
        alphas_l.append(ch.get_n_challenges(nc))

    # ROUND 3 (batched): quotient over the LDE grid
    with timing.scope('quotient polys (batch)'):
        qdb = (common.quotient_degree_factor - 1).bit_length()
        assert qdb <= rate_bits, "constraint degree above rate unsupported"
        step = 1 << (rate_bits - qdb)
        next_step = 1 << qdb
        N_full = n << rate_bits
        cs_lde = serial._natural_lde(
            prover_data.constants_sigmas_commitment, step)
        nat = _natural_lde_b_fn(step, N_full)
        wires_lde_b = nat(w_leaves)
        zs_pp_lde_b = nat(z_leaves)
        as_b = lambda rows: GF.from_u64(np.asarray(rows, dtype=np.uint64))
        q_coeffs_b = _quotient_fn_b(common, next_step)(
            cs_lde, wires_lde_b, zs_pp_lde_b, as_b(betas_l), as_b(gammas_l),
            as_b(alphas_l), as_b(pi_hashes))

    with timing.scope('quotient commitment (batch)'):
        num_q = q_coeffs_b.shape[1]
        q_coeffs, q_leaves, q_layers = _commit_values_b(
            num_q, lg_n, rate_bits, cap_height, hname, False)(q_coeffs_b)

    q_caps = caps_host(q_layers)
    zetas, zeta_nexts = [], []
    g = ref.primitive_root_of_unity(lg_n)
    for b, ch in enumerate(challengers):
        observe_cap_b(ch, q_caps, b)
        zeta = ch.get_extension_challenge()
        assert ref.ext2_exp(zeta, n) != (1, 0), "Opening point in subgroup"
        zetas.append(zeta)
        zeta_nexts.append(ref.ext2_scalar_mul(zeta, g))

    # ROUND 4 (batched): openings at zeta, g*zeta
    with timing.scope('openings at zeta (batch)'):
        cs_coeffs = prover_data.constants_sigmas_commitment.polynomials
        cs_evals = _eval_openings_b(cs_coeffs, zetas, shared=True)
        w_evals = _eval_openings_b(w_coeffs, zetas, shared=False)
        z_evals = _eval_openings_b(z_coeffs, zetas, shared=False)
        z_next_evals = _eval_openings_b(z_coeffs, zeta_nexts, shared=False)
        q_evals = _eval_openings_b(q_coeffs, zetas, shared=False)

    # per-proof tails: openings observation + FRI (query-bound host work)
    proofs = []
    for b, ch in enumerate(challengers):
        openings = OpeningSet(
            constants=[cs_evals[b][j] for j in common.constants_range],
            plonk_sigmas=[cs_evals[b][j] for j in common.sigmas_range],
            wires=w_evals[b],
            plonk_zs=[z_evals[b][j] for j in common.zs_range],
            plonk_zs_next=[z_next_evals[b][j] for j in common.zs_range],
            partial_products=[z_evals[b][j]
                              for j in common.partial_products_range],
            quotient_polys=q_evals[b],
        )
        observe_openings(ch, openings.to_fri_openings())

        def mk_batch(coeffs, leaves, layers):
            tree = MerkleTree(leaves[b], cap_height,
                              layers=tuple(l[b] for l in layers),
                              hasher=gc.hasher)
            return PolynomialBatch(coeffs[b], tree, lg_n, rate_bits, False)

        wires_commitment = mk_batch(w_coeffs, w_leaves, w_layers)
        zs_pp_commitment = mk_batch(z_coeffs, z_leaves, z_layers)
        quotient_commitment = mk_batch(q_coeffs, q_leaves, q_layers)
        oracles = [prover_data.constants_sigmas_commitment,
                   wires_commitment, zs_pp_commitment, quotient_commitment]
        instance = common.get_fri_instance(zetas[b])
        with timing.scope(f'FRI opening proof {b}'):
            opening_proof = PolynomialBatch.prove_openings(
                instance, oracles, ch, common.fri_params)

        proofs.append(ProofWithPublicInputs(
            proof=Proof(
                wires_cap=wires_commitment.merkle_tree.cap_digests(),
                plonk_zs_partial_products_cap=(
                    zs_pp_commitment.merkle_tree.cap_digests()),
                quotient_polys_cap=(
                    quotient_commitment.merkle_tree.cap_digests()),
                openings=openings,
                opening_proof=opening_proof),
            public_inputs=public_inputs[b]))
    return proofs
