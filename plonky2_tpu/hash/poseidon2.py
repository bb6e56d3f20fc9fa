"""Poseidon2 permutation over Goldilocks, width 12 (okx addition).

Reference: plonky2/src/hash/poseidon2.rs — apply_m_4:329-345 (external M4
block matrix), matmul_internal:395-405 (diag + all-ones), poseidon2:448-476
(initial external layer, 4+4 full rounds, 22 internal rounds).

Provides the python-int oracle, an algebra-generic round function, and a
batched device kernel (state [..., 12]) with scanned rounds, mirroring
hash/poseidon.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import reference as ref
from ..field.goldilocks import GF
from .poseidon2_constants import (
    MATRIX_DIAG_12, RC12, ROUNDS_F, ROUNDS_P, SPONGE_RATE, SPONGE_WIDTH,
)

NUM_HASH_OUT_ELTS = 4


# ---------------------------------------------------------------------------
# Pure-python oracle
# ---------------------------------------------------------------------------

def _apply_m4(x: list[int]) -> list[int]:
    t0 = (x[0] + x[1]) % ref.ORDER
    t1 = (x[2] + x[3]) % ref.ORDER
    t2 = (2 * x[1] + t1) % ref.ORDER
    t3 = (2 * x[3] + t0) % ref.ORDER
    t4 = (4 * t1 + t3) % ref.ORDER
    t5 = (4 * t0 + t2) % ref.ORDER
    t6 = (t3 + t5) % ref.ORDER
    t7 = (t2 + t4) % ref.ORDER
    return [t6, t5, t7, t4]


def _external_layer(state: list[int]) -> list[int]:
    s = list(state)
    for i in range(0, SPONGE_WIDTH, 4):
        s[i:i + 4] = _apply_m4(s[i:i + 4])
    sums = [sum(s[j + k] for j in range(0, SPONGE_WIDTH, 4)) % ref.ORDER
            for k in range(4)]
    return [(s[i] + sums[i % 4]) % ref.ORDER for i in range(SPONGE_WIDTH)]


def _internal_layer(state: list[int]) -> list[int]:
    total = sum(state) % ref.ORDER
    return [(x * MATRIX_DIAG_12[i] + total) % ref.ORDER
            for i, x in enumerate(state)]


def _sbox(x: int) -> int:
    x2 = x * x % ref.ORDER
    x3 = x2 * x % ref.ORDER
    x4 = x2 * x2 % ref.ORDER
    return x3 * x4 % ref.ORDER


def poseidon2_oracle(state: list[int]) -> list[int]:
    s = [x % ref.ORDER for x in state]
    s = _external_layer(s)
    half_f = ROUNDS_F // 2
    for r in range(half_f):
        s = [(x + RC12[r][i]) % ref.ORDER for i, x in enumerate(s)]
        s = [_sbox(x) for x in s]
        s = _external_layer(s)
    for r in range(half_f, half_f + ROUNDS_P):
        s[0] = _sbox((s[0] + RC12[r][0]) % ref.ORDER)
        s = _internal_layer(s)
    for r in range(half_f + ROUNDS_P, ROUNDS_F + ROUNDS_P):
        s = [(x + RC12[r][i]) % ref.ORDER for i, x in enumerate(s)]
        s = [_sbox(x) for x in s]
        s = _external_layer(s)
    return s


def hash_no_pad_oracle(inputs: list[int]) -> list[int]:
    """Overwrite-mode sponge with the Poseidon2 permutation."""
    state = [0] * SPONGE_WIDTH
    for start in range(0, len(inputs), SPONGE_RATE):
        chunk = inputs[start:start + SPONGE_RATE]
        state[:len(chunk)] = [x % ref.ORDER for x in chunk]
        state = poseidon2_oracle(state)
    return state[:NUM_HASH_OUT_ELTS]


# ---------------------------------------------------------------------------
# Batched device kernel: state GF [..., 12]
# ---------------------------------------------------------------------------

def _apply_m4_gf(x: GF) -> GF:
    """x: GF [..., 4]."""
    x0, x1, x2, x3 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    t0 = x0 + x1
    t1 = x2 + x3
    t2 = x1 + x1 + t1
    t3 = x3 + x3 + t0
    t4 = (t1 + t1) + (t1 + t1) + t3
    t5 = (t0 + t0) + (t0 + t0) + t2
    t6 = t3 + t5
    t7 = t2 + t4
    return GF.stack([t6, t5, t7, t4], axis=-1)


def _external_layer_gf(state: GF) -> GF:
    lead = state.shape[:-1]
    blocks = state.reshape(*lead, 3, 4)
    blocks = _apply_m4_gf(blocks)
    sums = blocks[..., 0, :] + blocks[..., 1, :] + blocks[..., 2, :]
    out = blocks + sums.reshape(*lead, 1, 4).broadcast_to((*lead, 3, 4))
    return out.reshape(*lead, SPONGE_WIDTH)


def _internal_layer_gf(state: GF, diag: GF) -> GF:
    total = state.sum(axis=-1)
    lead = state.shape[:-1]
    t = total.reshape(*lead, 1).broadcast_to(state.shape)
    return state * diag.broadcast_to(state.shape) + t


def _sbox_gf(x: GF) -> GF:
    x2 = x.square()
    x3 = x2 * x
    x4 = x2.square()
    return x3 * x4


@jax.jit
def poseidon2_permute(state: GF) -> GF:
    """Batched Poseidon2; state [..., 12]. Full and internal rounds each run
    under one lax.scan."""
    assert state.shape[-1] == SPONGE_WIDTH
    rc = GF.from_u64(np.asarray(RC12, dtype=np.uint64))       # [30, 12]
    diag = GF.from_u64(np.asarray(MATRIX_DIAG_12, dtype=np.uint64))
    half_f = ROUNDS_F // 2
    lead = state.shape[:-1]

    state = _external_layer_gf(state)

    def full_round(carry, xs):
        lo, hi = carry
        rc_lo, rc_hi = xs
        st = GF(lo, hi) + GF(rc_lo, rc_hi).reshape(
            *(1,) * len(lead), SPONGE_WIDTH).broadcast_to(state.shape)
        st = _external_layer_gf(_sbox_gf(st))
        return (st.lo, st.hi), None

    (lo, hi), _ = jax.lax.scan(full_round, (state.lo, state.hi),
                               (rc[:half_f].lo, rc[:half_f].hi))
    state = GF(lo, hi)

    rc_p = rc[half_f:half_f + ROUNDS_P, 0]                    # [22]

    def internal_round(carry, xs):
        lo, hi = carry
        rc_lo, rc_hi = xs
        st = GF(lo, hi)
        s0 = _sbox_gf(st[..., 0] + GF(rc_lo, rc_hi).broadcast_to(lead))
        st = GF.concatenate([s0.reshape(*lead, 1), st[..., 1:]], axis=-1)
        st = _internal_layer_gf(st, diag)
        return (st.lo, st.hi), None

    (lo, hi), _ = jax.lax.scan(internal_round, (state.lo, state.hi),
                               (rc_p.lo, rc_p.hi))
    state = GF(lo, hi)

    (lo, hi), _ = jax.lax.scan(full_round, (state.lo, state.hi),
                               (rc[half_f + ROUNDS_P:].lo,
                                rc[half_f + ROUNDS_P:].hi))
    return GF(lo, hi)


def hash_no_pad(inputs: GF) -> GF:
    """Batched sponge: [..., L] -> [..., 4]."""
    L = inputs.shape[-1]
    lead = inputs.shape[:-1]
    state = GF.zeros((*lead, SPONGE_WIDTH))
    for start in range(0, L, SPONGE_RATE):
        chunk = inputs[..., start:start + SPONGE_RATE]
        state = GF.concatenate([chunk, state[..., chunk.shape[-1]:]], axis=-1)
        state = poseidon2_permute(state)
    return state[..., :NUM_HASH_OUT_ELTS]


# ---------------------------------------------------------------------------
# Lanes layout ([L, B] / [12, B]) — the Merkle/commit pipeline's layout.
# On TPU with a kernel-friendly batch these dispatch to the fused Pallas
# kernels (ops/pallas_poseidon2.py, the AVX2-Poseidon2 analog); otherwise
# they fall back to the batched [..., 12] path via a transpose.
# ---------------------------------------------------------------------------

def permute_lanes2(st: GF) -> GF:
    """st [12, B] -> [12, B]."""
    from ..ops import pallas_poseidon2 as pp2
    if pp2.should_use_pallas2(st.shape[-1]):
        return pp2.permute2_lanes_pallas(st)
    return poseidon2_permute(st.transpose(1, 0)).transpose(1, 0)


def hash_no_pad_lanes(inputs: GF) -> GF:
    """inputs [L, B] -> digests [4, B]."""
    L, B = inputs.shape
    from ..ops import pallas_poseidon2 as pp2
    if pp2.should_use_pallas2_leaf(L, B):
        return pp2.hash2_leaves_lanes_pallas(inputs)
    return hash_no_pad(inputs.transpose(1, 0)).transpose(1, 0)


def hash_or_noop_lanes(inputs: GF) -> GF:
    L, B = inputs.shape
    if L <= NUM_HASH_OUT_ELTS:
        return GF.concatenate(
            [inputs, GF.zeros((NUM_HASH_OUT_ELTS - L, B))], axis=0)
    return hash_no_pad_lanes(inputs)


def compress_lanes(x: GF, y: GF) -> GF:
    """Two-to-one in lanes layout: [4, B] x [4, B] -> [4, B]."""
    B = x.shape[-1]
    cap = GF.zeros((SPONGE_WIDTH - 2 * NUM_HASH_OUT_ELTS, B))
    state = GF.concatenate([x, y, cap], axis=0)
    return permute_lanes2(state)[:NUM_HASH_OUT_ELTS]
