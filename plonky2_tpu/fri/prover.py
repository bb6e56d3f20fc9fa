"""FRI prover: commit/fold phase, vectorized PoW grind, query phase.

Matches the reference protocol exactly (reference: plonky2/src/fri/prover.rs —
fri_committed_trees:70-114 bit-reverse + arity-chunk + Merkle + beta-fold +
coset_fft at shift^arity; fri_proof_of_work:117-161; query rounds:164-218).

TPU-native choices: the fold + re-evaluation per layer is device compute;
the PoW grind is a vectorized batched Poseidon search (the analog of the
reference's rayon find_any — any valid witness verifies); query rounds are
host-side gathers from cached leaf copies.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..field import reference as ref
from ..field.goldilocks import GF
from ..field.extension import GF2
from ..hash.merkle import MerkleTree
from ..hash import poseidon as ps
from ..iop.challenger import Challenger
from ..ops import ntt
from ..ops.polynomial import horner_fold
from ..utils.bits import log2_strict, reverse_index_bits_perm
from ..utils.devcache import dev_const
from .config import FriParams
from .proof import FriProof, FriQueryRound, FriQueryStep, FriInitialTreeProof


def _flatten_ext_leaves(values_brv: GF2, arity: int) -> GF:
    """[N] bit-reversed ext values -> [N/arity, 2*arity] leaves with each
    extension element flattened as (c0, c1) pairs (reference flatten())."""
    n = values_brv.shape[-1]
    rows = n // arity
    c0 = values_brv.c0.reshape(rows, arity)
    c1 = values_brv.c1.reshape(rows, arity)
    lo = jnp.stack([c0.lo, c1.lo], axis=-1).reshape(rows, 2 * arity)
    hi = jnp.stack([c0.hi, c1.hi], axis=-1).reshape(rows, 2 * arity)
    return GF(lo, hi)


@lru_cache(maxsize=None)
def _brv_leaves_fn(n: int, arity: int):
    """Jitted: ext values [n] -> bit-reversed arity-chunked leaves."""
    rev = reverse_index_bits_perm(n)

    def f(values: GF2):
        brv = values.take(dev_const(rev), axis=-1)
        return _flatten_ext_leaves(brv, arity)

    return jax.jit(f)


@lru_cache(maxsize=None)
def _fold_layer_fn(n: int, arity_bits: int, shift: int):
    """Jitted: (coeffs [n], beta) -> (folded coeffs [n/arity], values [n/arity])."""

    def fold(coeffs: GF2, beta: GF2):
        folded = horner_fold(coeffs, beta, arity_bits)
        values = GF2(ntt.coset_fft(folded.c0, shift),
                     ntt.coset_fft(folded.c1, shift))
        return folded, values

    return jax.jit(fold)


def fri_committed_trees(coeffs: GF2, values: GF2, challenger: Challenger,
                        fri_params: FriParams):
    trees = []
    shift = ref.MULTIPLICATIVE_GROUP_GENERATOR
    cap_height = fri_params.config.cap_height
    hasher = challenger.hasher
    for arity_bits in fri_params.reduction_arity_bits:
        arity = 1 << arity_bits
        n = values.shape[-1]
        leaves = _brv_leaves_fn(n, arity)(values)
        tree = MerkleTree(leaves, cap_height, hasher=hasher)
        challenger.observe_cap(tree.cap_digests())
        trees.append(tree)

        beta = challenger.get_extension_challenge()
        shift_next = pow(shift, arity, ref.ORDER)
        coeffs, values = _fold_layer_fn(n, arity_bits, shift_next)(
            coeffs, GF2.const(*beta))
        shift = shift_next

    final_len = coeffs.shape[-1] >> fri_params.config.rate_bits
    final0, final1 = coeffs[:final_len].to_u64_pair()
    final_coeffs = [(int(a), int(b)) for a, b in zip(final0, final1)]
    challenger.observe_extension_elements(final_coeffs)
    return trees, final_coeffs


# ---------------------------------------------------------------------------
# Proof of work
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _pow_wave_fn(pow_bits: int, batch: int, hasher_name: str = "poseidon"):
    """witness_pos is a TRACED argument (mask-select), not a static key: it
    equals the challenger's input-buffer length, which varies per transcript,
    and baking it in would recompile the wave for every proof."""
    assert 1 <= pow_bits < 64
    from ..hash.hashers import HASHERS_BY_NAME
    permute_dev = HASHERS_BY_NAME[hasher_name].permute_dev
    threshold = 1 << (64 - pow_bits)
    thresh_hi = np.uint32(threshold >> 32)
    thresh_lo = np.uint32(threshold & 0xFFFFFFFF)

    def wave(state: GF, witness_pos, cand_lo, cand_hi):
        # state [12] -> broadcast [batch, 12], overwrite witness position
        st = state.reshape(1, 12).broadcast_to((batch, 12))
        col = (jnp.arange(12, dtype=jnp.int32)
               == witness_pos).reshape(1, 12)
        lo = jnp.where(col, cand_lo.reshape(batch, 1), st.lo)
        hi = jnp.where(col, cand_hi.reshape(batch, 1), st.hi)
        out = permute_dev(GF(lo, hi))
        r_lo, r_hi = out.lo[:, ps.SPONGE_RATE - 1], out.hi[:, ps.SPONGE_RATE - 1]
        ok = (r_hi < thresh_hi) | ((r_hi == thresh_hi) & (r_lo < thresh_lo))
        idx = jnp.argmax(ok)
        return idx, ok[idx]

    return jax.jit(wave)


def fri_proof_of_work(challenger: Challenger, pow_bits: int,
                      batch: int | None = None) -> int:
    """Vectorized grind: find witness w such that the duplex response (the
    last squeezed element) has >= pow_bits leading zeros. Device wave for
    Poseidon-family permutations, numpy wave for Keccak, scalar fallback for
    host-only permutations (PoseidonBN128)."""
    if batch is None:
        if jax.default_backend() == "cpu":
            # small waves: a 1-core CPU pays real time per candidate
            batch = max(256, min(1 << 16, 2 << pow_bits))
        else:
            # ~8x the expected tries per wave (>=99.97% one-wave hit)
            batch = max(256, min(1 << 20, 8 << pow_bits))
    state = list(challenger.sponge_state)
    witness_pos = len(challenger.input_buffer)
    for i, x in enumerate(challenger.input_buffer):
        state[i] = x

    hasher = challenger.hasher
    threshold = 1 << (64 - pow_bits)
    hasher_name = hasher.name if hasher is not None else "poseidon"
    native_witness = None
    if hasher_name == "poseidon" and jax.default_backend() == "cpu":
        # CPU host: the native C permutation grinds ~1000x faster than the
        # XLA:CPU lanes kernel (which is laid out for the TPU VPU)
        native_witness = _pow_grind_native(state, witness_pos, threshold,
                                           batch)
    if native_witness is not None:
        witness = native_witness
    elif (hasher is not None
            and getattr(hasher, "permute_dev", None) is None):
        witness = _pow_grind_host(hasher, state, witness_pos, threshold,
                                  batch)
    else:
        gf_state = GF.from_u64(np.array(state, dtype=np.uint64))
        wave_fn = _pow_wave_fn(pow_bits, batch, hasher_name)
        pos = np.int32(witness_pos)
        start = 0
        while True:
            cands = start + np.arange(batch, dtype=np.uint64)
            c = GF.from_u64(cands)
            idx, found = jax.device_get(wave_fn(gf_state, pos, c.lo, c.hi))
            if bool(found):
                witness = start + int(idx)
                break
            start += batch
            assert start < (1 << 40), \
                "PoW grind failed (astronomically unlikely)"

    challenger.observe_element(witness)
    response = challenger.get_challenge()
    assert response < (1 << (64 - pow_bits))
    return witness


def _pow_grind_native(state: list[int], witness_pos: int, threshold: int,
                      batch: int) -> int | None:
    """Grind through the native C Poseidon (plonky2_tpu/native); None if the
    library is unavailable (callers fall back to the device wave)."""
    from ..native import permute_many
    base = np.array(state, dtype=np.uint64)
    start = 0
    while True:
        states = np.tile(base, (batch, 1))
        states[:, witness_pos] = start + np.arange(batch, dtype=np.uint64)
        out = permute_many(states)
        if out is None:
            return None
        ok = out[:, ps.SPONGE_RATE - 1] < np.uint64(threshold)
        hits = np.nonzero(ok)[0]
        if len(hits):
            return start + int(hits[0])
        start += batch
        assert start < (1 << 40), "PoW grind failed (astronomically unlikely)"


def _pow_grind_host(hasher, state: list[int], witness_pos: int,
                    threshold: int, batch: int) -> int:
    """Host grind: batched numpy permutation when the hasher provides one
    (Keccak), else scalar."""
    permute_batch = getattr(hasher, "permute_batch_np", None)
    start = 0
    while True:
        if permute_batch is not None:
            states = np.tile(np.array(state, dtype=np.uint64), (batch, 1))
            states[:, witness_pos] = start + np.arange(batch, dtype=np.uint64)
            out = permute_batch(states)
            ok = out[:, ps.SPONGE_RATE - 1] < np.uint64(threshold)
            hits = np.nonzero(ok)[0]
            if len(hits):
                return start + int(hits[0])
            start += batch
        else:
            for w in range(start, start + batch):
                s = list(state)
                s[witness_pos] = w
                if hasher.permute_oracle(s)[ps.SPONGE_RATE - 1] < threshold:
                    return w
            start += batch
        assert start < (1 << 40), "PoW grind failed (astronomically unlikely)"


# ---------------------------------------------------------------------------
# Query phase (host gathers)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _query_gather_all_fn(key: tuple):
    """ONE jitted program gathering every tree's query rows AND sibling
    paths, so the whole query phase costs one dispatch + one readback
    instead of 2 round trips per tree (~12 x ~30 ms through the axon
    tunnel — the dominant term of the warm FRI phase, measured r5).
    key = per-tree (depth,) tuple (shapes are carried by the args)."""
    def f(data, idx_list):
        outs = []
        for (leaves, layers), idxs, depth in zip(data, idx_list, key):
            rows = leaves.take(idxs, axis=0)
            if depth:
                sibs = [layers[lvl].take((idxs >> lvl) ^ 1, axis=0)
                        for lvl in range(depth)]
                path = GF.stack(sibs, axis=1)
            else:
                path = GF.zeros((idxs.shape[0], 0, 4))
            outs.append((rows, path))
        return outs

    return jax.jit(f)


def _gather_queries_fused(all_trees, all_idxs):
    """[(rows_u64, paths_u64)] per tree via the single fused program; None
    when any tree is host-resident (CPU fallback keeps the per-tree path)."""
    data, key = [], []
    for t in all_trees:
        if t.layers is None or hasattr(t, "_layers_np") \
                or isinstance(t.leaves.lo, np.ndarray):
            return None
        depth = t.lg_n - t.cap_height
        data.append((t.leaves, tuple(t.layers[:depth])))
        key.append(depth)
    idx_list = [jnp.asarray(np.asarray(ix, dtype=np.int32))
                for ix in all_idxs]
    outs = _query_gather_all_fn(tuple(key))(tuple(data), tuple(idx_list))
    outs_np = jax.device_get(outs)          # ONE transfer for everything

    def u64(g):
        return np.asarray(g.lo).astype(np.uint64) \
            | (np.asarray(g.hi).astype(np.uint64) << np.uint64(32))

    return [(u64(rows), u64(path)) for rows, path in outs_np]


def fri_prover_query_rounds(initial_merkle_trees, trees, challenger: Challenger,
                            n: int, fri_params: FriParams):
    """All query rounds via ONE fused device gather + ONE readback across
    every tree (rows and sibling paths together); per-tree batched gathers
    remain as the host-tree fallback."""
    indices = [c % n for c in
               challenger.get_n_challenges(fri_params.config.num_query_rounds)]
    k = len(indices)
    all_idxs = [indices] * len(initial_merkle_trees)
    cur = np.asarray(indices, dtype=np.int64)
    for i in range(len(trees)):
        cur = cur >> fri_params.reduction_arity_bits[i]
        all_idxs.append(cur)
    fused = _gather_queries_fused(list(initial_merkle_trees) + list(trees),
                                  all_idxs)
    if fused is not None:
        ni = len(initial_merkle_trees)
        init_rows = [fused[t][0] for t in range(ni)]
        init_paths = [fused[t][1] for t in range(ni)]
        step_rows = [fused[ni + i][0] for i in range(len(trees))]
        step_paths = [fused[ni + i][1] for i in range(len(trees))]
    else:
        init_rows = [t.rows_batch(indices) for t in initial_merkle_trees]
        init_paths = [t.prove_batch(indices) for t in initial_merkle_trees]
        step_rows = [trees[i].rows_batch(all_idxs[len(initial_merkle_trees)
                                                  + i])
                     for i in range(len(trees))]
        step_paths = [trees[i].prove_batch(all_idxs[len(initial_merkle_trees)
                                                    + i])
                      for i in range(len(trees))]
    rounds = []
    for q in range(k):
        initial = [(init_rows[t][q], init_paths[t][q])
                   for t in range(len(initial_merkle_trees))]
        steps = []
        for i in range(len(trees)):
            row = step_rows[i][q]
            evals = [(int(row[2 * j]), int(row[2 * j + 1]))
                     for j in range(len(row) // 2)]
            steps.append(FriQueryStep(evals=evals,
                                      merkle_proof=step_paths[i][q]))
        rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(evals_proofs=initial),
            steps=steps))
    return rounds, indices


def fri_proof(initial_merkle_trees, lde_polynomial_coeffs: GF2,
              lde_polynomial_values: GF2, challenger: Challenger,
              fri_params: FriParams) -> FriProof:
    n = lde_polynomial_values.shape[-1]
    assert lde_polynomial_coeffs.shape[-1] == n

    trees, final_coeffs = fri_committed_trees(
        lde_polynomial_coeffs, lde_polynomial_values, challenger, fri_params)
    pow_witness = fri_proof_of_work(
        challenger, fri_params.config.proof_of_work_bits)
    query_rounds, _ = fri_prover_query_rounds(
        initial_merkle_trees, trees, challenger, n, fri_params)

    return FriProof(
        commit_phase_merkle_caps=[t.cap_digests() for t in trees],
        query_round_proofs=query_rounds,
        final_poly=final_coeffs,
        pow_witness=pow_witness,
    )
