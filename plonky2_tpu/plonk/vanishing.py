"""Vanishing-polynomial evaluation.

Reference: plonky2/src/plonk/vanishing_poly.rs — eval_vanishing_poly:43
(extension scalar, verifier) and eval_vanishing_poly_base_batch:118 (prover
hot loop). The reference walks the LDE grid in 32-point batches with rayon;
here the WHOLE grid is one vectorized device program: every constraint term is
a GF array over all N points, gate filters included, fused by XLA.
"""

from __future__ import annotations

import numpy as np

from ..field import reference as ref
from ..field.goldilocks import GF
from ..gates.gate import EXT, GFAlgebra, compute_filter
from .circuit_data import CommonCircuitData

E = tuple[int, int]


def _check_partial_products(alg, numerators, denominators, partials, z_x, z_gx,
                            max_degree: int):
    """prev_acc * prod(num_chunk) - next_acc * prod(den_chunk) per chunk
    (reference: util/partial_products.rs:55-78)."""
    accs = [z_x] + list(partials) + [z_gx]
    out = []
    n = len(numerators)
    chunks = [(i, min(i + max_degree, n)) for i in range(0, n, max_degree)]
    assert len(chunks) == len(accs) - 1
    for (lo, hi), prev_acc, next_acc in zip(chunks, accs[:-1], accs[1:]):
        nprod = numerators[lo]
        dprod = denominators[lo]
        for j in range(lo + 1, hi):
            nprod = alg.mul(nprod, numerators[j])
            dprod = alg.mul(dprod, denominators[j])
        out.append(alg.sub(alg.mul(prev_acc, nprod), alg.mul(next_acc, dprod)))
    return out


def evaluate_gate_constraints(alg, common: CommonCircuitData, local_constants,
                              local_wires, pi_hash):
    """Sum of filtered per-gate constraints, bucketed by constraint index
    (reference: vanishing_poly.rs:563-626)."""
    num_selectors = common.selectors_info.num_selectors
    buckets = [None] * common.num_gate_constraints
    for i, gate in enumerate(common.gates):
        sel_idx = common.selectors_info.selector_indices[i]
        group = common.selectors_info.groups[sel_idx]
        s = local_constants[sel_idx]
        filt = compute_filter(alg, i, group, s, num_selectors > 1)
        consts = local_constants[num_selectors:]
        for j, c in enumerate(gate.eval_unfiltered(alg, consts, local_wires,
                                                   pi_hash)):
            fc = alg.mul(filt, c)
            buckets[j] = fc if buckets[j] is None else alg.add(buckets[j], fc)
    zero = alg.zero()
    return [b if b is not None else zero for b in buckets]


def evaluate_gate_constraints_rows(common: CommonCircuitData, consts_rows: GF,
                                   wires_rows: GF, pi_rows: GF) -> GF:
    """Tensorized gate-constraint accumulation: GF [num_gate_constraints, N].
    Filters and constraints are whole-grid device ops."""
    N = wires_rows.shape[-1]
    num_selectors = common.selectors_info.num_selectors
    alg = GFAlgebra((N,))
    gate_consts = consts_rows[num_selectors:]
    total = GF.zeros((common.num_gate_constraints, N))
    for i, gate in enumerate(common.gates):
        if gate.num_constraints() == 0:
            continue
        sel_idx = common.selectors_info.selector_indices[i]
        group = common.selectors_info.groups[sel_idx]
        s = consts_rows[sel_idx]
        filt = compute_filter(alg, i, group, s, num_selectors > 1)
        gc = gate.eval_unfiltered_rows(gate_consts, wires_rows, pi_rows)
        k = gc.shape[0]
        filtered = gc * filt.reshape(1, N).broadcast_to((k, N))
        if k < common.num_gate_constraints:
            filtered = GF.concatenate(
                [filtered, GF.zeros((common.num_gate_constraints - k, N))],
                axis=0)
        total = total + filtered
    return total


def reduce_with_powers(alg, terms, alpha):
    """sum_i terms[i] * alpha^i, Horner from the top
    (reference: plonk_common.rs reduce_with_powers)."""
    acc = alg.zero()
    for t in reversed(list(terms)):
        acc = alg.add(alg.mul(acc, alpha), t)
    return acc


def eval_vanishing_poly(alg, common: CommonCircuitData, x, local_constants,
                        local_wires, pi_hash, local_zs, next_zs,
                        partial_products, s_sigmas, betas, gammas, alphas,
                        l_0_x):
    """Generic over the algebra: ExtAlgebra at zeta (native verifier) or
    TargetAlgebra (recursive verifier). betas/gammas/alphas are already-lifted
    algebra elements. Returns one combined value per challenge."""
    constraint_terms = evaluate_gate_constraints(alg, common, local_constants,
                                                 local_wires, pi_hash)
    nc = common.config.num_challenges
    nr = common.config.num_routed_wires
    num_prods = common.num_partial_products

    z1_terms = []
    pp_terms = []
    one = alg.const(1)
    for i in range(nc):
        z_x = local_zs[i]
        z_gx = next_zs[i]
        z1_terms.append(alg.mul(l_0_x, alg.sub(z_x, one)))
        beta = betas[i]
        gamma = gammas[i]
        numerators = []
        denominators = []
        for j in range(nr):
            w = local_wires[j]
            s_id = alg.mul_const(x, common.k_is[j])
            numerators.append(alg.add(alg.add(w, alg.mul(beta, s_id)), gamma))
            denominators.append(
                alg.add(alg.add(w, alg.mul(beta, s_sigmas[j])), gamma))
        cur_pp = partial_products[i * num_prods:(i + 1) * num_prods]
        pp_terms.extend(_check_partial_products(
            alg, numerators, denominators, cur_pp, z_x, z_gx,
            common.quotient_degree_factor))

    terms = z1_terms + pp_terms + constraint_terms
    return [reduce_with_powers(alg, terms, alphas[i]) for i in range(nc)]


# ---------------------------------------------------------------------------
# Verifier-side scalar evaluation at zeta (python ints, ext2)
# ---------------------------------------------------------------------------

def eval_vanishing_poly_at_zeta(common: CommonCircuitData, zeta: E, openings,
                                pi_hash: list[int], betas, gammas,
                                alphas) -> list[E]:
    n = common.degree
    # L_0(zeta) = (zeta^n - 1) / (n * (zeta - 1))  (reference: plonk_common.rs
    # eval_l_0)
    zeta_pow_n = ref.ext2_exp(zeta, n)
    num = ref.ext2_sub(zeta_pow_n, (1, 0))
    den = ref.ext2_scalar_mul(ref.ext2_sub(zeta, (1, 0)), n % ref.ORDER)
    l_0 = ref.ext2_mul(num, ref.ext2_inverse(den))

    pi_hash_e = [(h, 0) for h in pi_hash]
    return eval_vanishing_poly(
        EXT, common, zeta,
        [tuple(v) for v in openings.constants],
        [tuple(v) for v in openings.wires],
        pi_hash_e,
        [tuple(v) for v in openings.plonk_zs],
        [tuple(v) for v in openings.plonk_zs_next],
        [tuple(v) for v in openings.partial_products],
        [tuple(v) for v in openings.plonk_sigmas],
        [EXT.const(b) for b in betas], [EXT.const(g) for g in gammas],
        [EXT.const(a) for a in alphas], l_0)
