"""Poseidon permutation over Goldilocks, width 12 — batched device kernel +
pure-Python oracle.

Implements the *naive* round schedule (full-width constant layer each round,
single S-box in partial rounds, full MDS every round), which is bit-identical
to the reference's optimized fast-partial-rounds path
(reference: plonky2/src/hash/poseidon.rs:790-812 poseidon_naive, :745-765;
MDS row r = sum_i CIRC[i]*v[(i+r)%12] + DIAG[r]*v[r], :236-246).

Device layout: state is a GF array [..., 12]; the MDS layer is 12 circular
rolls with small-constant multiplies accumulated in 96-bit (3xu32) lanes —
exact, branch-free, and VPU-friendly.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..field import reference as ref
from ..field.goldilocks import GF, _mul32, _reduce96, u32
from .poseidon_constants import (
    ALL_ROUND_CONSTANTS, HALF_N_FULL_ROUNDS, MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG, N_PARTIAL_ROUNDS, N_ROUNDS, SPONGE_RATE, SPONGE_WIDTH,
)

NUM_HASH_OUT_ELTS = 4


# ---------------------------------------------------------------------------
# Pure-Python oracle
# ---------------------------------------------------------------------------

def _mds_row_oracle(r: int, v: list[int]) -> int:
    acc = 0
    for i in range(SPONGE_WIDTH):
        acc += MDS_MATRIX_CIRC[i] * v[(i + r) % SPONGE_WIDTH]
    acc += MDS_MATRIX_DIAG[r] * v[r]
    return acc % ref.ORDER


def _mds_oracle(v: list[int]) -> list[int]:
    return [_mds_row_oracle(r, v) for r in range(SPONGE_WIDTH)]


def _sbox(x: int) -> int:
    x2 = (x * x) % ref.ORDER
    x3 = (x2 * x) % ref.ORDER
    return (x3 * x3 % ref.ORDER) * x % ref.ORDER


def poseidon_oracle(state: list[int]) -> list[int]:
    """The width-12 Poseidon permutation on host ints.

    Dispatches to the native C library (plonky2_tpu/native — the runtime's
    native component, replacing the reference's AVX2/NEON host permutation)
    with a pure-python fallback; `poseidon_oracle_py` is the reference
    implementation both are tested against."""
    from ..native import permute as native_permute
    out = native_permute([x % ref.ORDER for x in state])
    if out is not None:
        return out
    return poseidon_oracle_py(state)


def poseidon_oracle_py(state: list[int]) -> list[int]:
    """Pure-python reference permutation."""
    assert len(state) == SPONGE_WIDTH
    s = [x % ref.ORDER for x in state]
    rc = 0
    for _ in range(HALF_N_FULL_ROUNDS):
        s = [(x + ALL_ROUND_CONSTANTS[rc * SPONGE_WIDTH + i]) % ref.ORDER
             for i, x in enumerate(s)]
        s = [_sbox(x) for x in s]
        s = _mds_oracle(s)
        rc += 1
    for _ in range(N_PARTIAL_ROUNDS):
        s = [(x + ALL_ROUND_CONSTANTS[rc * SPONGE_WIDTH + i]) % ref.ORDER
             for i, x in enumerate(s)]
        s[0] = _sbox(s[0])
        s = _mds_oracle(s)
        rc += 1
    for _ in range(HALF_N_FULL_ROUNDS):
        s = [(x + ALL_ROUND_CONSTANTS[rc * SPONGE_WIDTH + i]) % ref.ORDER
             for i, x in enumerate(s)]
        s = [_sbox(x) for x in s]
        s = _mds_oracle(s)
        rc += 1
    assert rc == N_ROUNDS
    return s


def hash_n_to_m_no_pad_oracle(inputs: list[int], num_outputs: int) -> list[int]:
    """Overwrite-mode sponge (reference: plonky2/src/hash/hashing.rs:35-64)."""
    state = [0] * SPONGE_WIDTH
    for start in range(0, max(len(inputs), 1) if inputs else 0, SPONGE_RATE):
        chunk = inputs[start:start + SPONGE_RATE]
        state[:len(chunk)] = [x % ref.ORDER for x in chunk]
        state = poseidon_oracle(state)
    outputs: list[int] = []
    while True:
        for x in state[:SPONGE_RATE]:
            outputs.append(x)
            if len(outputs) == num_outputs:
                return outputs
        state = poseidon_oracle(state)


def hash_no_pad_oracle(inputs: list[int]) -> list[int]:
    return hash_n_to_m_no_pad_oracle(inputs, NUM_HASH_OUT_ELTS)


def hash_or_noop_oracle(inputs: list[int]) -> list[int]:
    if len(inputs) <= NUM_HASH_OUT_ELTS:
        return [x % ref.ORDER for x in inputs] + [0] * (NUM_HASH_OUT_ELTS - len(inputs))
    return hash_no_pad_oracle(inputs)


def compress_oracle(x: list[int], y: list[int]) -> list[int]:
    state = list(x) + list(y) + [0] * (SPONGE_WIDTH - 2 * NUM_HASH_OUT_ELTS)
    return poseidon_oracle(state)[:NUM_HASH_OUT_ELTS]


def hash_public_inputs_oracle(inputs: list[int]) -> list[int]:
    """Public-input hash always hashes, even for <=4 inputs
    (reference: plonky2/src/hash/poseidon.rs:895 hash_public_inputs)."""
    return hash_no_pad_oracle(inputs)


# ---------------------------------------------------------------------------
# Device kernel: batched over leading dims, state axis is last (size 12)
# ---------------------------------------------------------------------------

_RC_LIMBS = None


def _round_constants() -> GF:
    global _RC_LIMBS
    if _RC_LIMBS is None:
        arr = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(
            N_ROUNDS, SPONGE_WIDTH)
        _RC_LIMBS = ((arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                     (arr >> np.uint64(32)).astype(np.uint32))
    lo, hi = _RC_LIMBS
    return GF(jnp.asarray(lo), jnp.asarray(hi))


def _mul_small_96(c: int, lo, hi):
    """c * (hi,lo) as a 96-bit (w2, w1, w0) triple, c < 2^32 constant."""
    c = np.uint32(c)
    ll_h, ll_l = _mul32(c, lo)
    hl_h, hl_l = _mul32(c, hi)
    w0 = ll_l
    w1 = ll_h + hl_l
    c1 = (w1 < ll_h).astype(u32)
    w2 = hl_h + c1
    return w2, w1, w0


def _acc96(a, b):
    a2, a1, a0 = a
    b2, b1, b0 = b
    w0 = a0 + b0
    c0 = (w0 < a0).astype(u32)
    t1 = a1 + b1
    c1 = (t1 < a1).astype(u32)
    w1 = t1 + c0
    c2 = (w1 < t1).astype(u32)
    w2 = a2 + b2 + c1 + c2
    return w2, w1, w0


def _mds_layer(state: GF) -> GF:
    """out[..., r] = sum_i CIRC[i]*state[..., (r+i)%12] + DIAG[r]*state[..., r]."""
    acc = None
    for i in range(SPONGE_WIDTH):
        rolled_lo = jnp.roll(state.lo, -i, axis=-1)
        rolled_hi = jnp.roll(state.hi, -i, axis=-1)
        term = _mul_small_96(MDS_MATRIX_CIRC[i], rolled_lo, rolled_hi)
        acc = term if acc is None else _acc96(acc, term)
    # DIAG = [8, 0, ..., 0]: only output row 0 gets 8 * state[..., 0]
    d2, d1, d0 = _mul_small_96(MDS_MATRIX_DIAG[0], state.lo[..., 0:1],
                               state.hi[..., 0:1])
    zeros = jnp.zeros_like(state.lo[..., 1:])
    pad = lambda x: jnp.concatenate([x, zeros], axis=-1)
    acc = _acc96(acc, (pad(d2), pad(d1), pad(d0)))
    return GF(*_reduce96(*acc))


def _sbox_gf(x: GF) -> GF:
    x2 = x.square()
    x3 = x2 * x
    return x3 * x3 * x


def _sbox_mask() -> np.ndarray:
    """[30, 12] bool: which lanes get the S-box in each round (all lanes in
    full rounds, lane 0 only in the 22 partial rounds)."""
    m = np.zeros((N_ROUNDS, SPONGE_WIDTH), dtype=bool)
    m[:HALF_N_FULL_ROUNDS] = True
    m[-HALF_N_FULL_ROUNDS:] = True
    m[HALF_N_FULL_ROUNDS:HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS, 0] = True
    return m


@jax.jit
def _poseidon_permute_scan(state: GF) -> GF:
    """Scan formulation (small O(1) graph — the XLA:CPU-friendly path).
    Partial rounds compute the S-box on all lanes and mask; bit-identical to
    the per-lane schedule."""
    assert state.shape[-1] == SPONGE_WIDTH
    rc = _round_constants()
    mask = jnp.asarray(_sbox_mask())

    def body(carry, xs):
        lo, hi = carry
        rc_lo, rc_hi, m = xs
        st = GF(lo, hi) + GF(rc_lo, rc_hi).broadcast_to(GF(lo, hi).shape)
        st = GF.where(m, _sbox_gf(st), st)
        st = _mds_layer(st)
        return (st.lo, st.hi), None

    (lo, hi), _ = jax.lax.scan(body, (state.lo, state.hi),
                               (rc.lo, rc.hi, mask))
    return GF(lo, hi)


_FAST_TABLES_GF = None


def _fast_tables_gf():
    """Device copies of the fast-partial-round tables
    (derived in poseidon_fast, reference: poseidon.rs:175-179)."""
    global _FAST_TABLES_GF
    if _FAST_TABLES_GF is None:
        from .poseidon_fast import fast_partial_tables
        first_rc, partial_rc, vs, w_hats, init_mat = fast_partial_tables()
        # the last partial round adds no constant (poseidon_fast:220-222)
        partial_rc = list(partial_rc)[:N_PARTIAL_ROUNDS - 1] + [0]
        init_mat_t = np.asarray(init_mat, dtype=np.uint64).T  # [c][r] layout

        def limbs(a):
            arr = np.asarray(a, dtype=np.uint64)
            return ((arr & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                    (arr >> np.uint64(32)).astype(np.uint32))

        # cache HOST arrays only — jnp constants created under a jit trace
        # are tracers and must not be cached globally
        _FAST_TABLES_GF = tuple(
            limbs(a) for a in (first_rc, partial_rc, vs, w_hats, init_mat_t))
    return tuple(GF(jnp.asarray(lo), jnp.asarray(hi))
                 for lo, hi in _FAST_TABLES_GF)


@jax.jit
def _poseidon_permute_lanes(state: GF) -> GF:
    """TPU formulation: state transposed to [12, B] so the batch fills the
    128-wide vector lanes, with the fast-partial-rounds factorization
    (22 sparse layers instead of full MDS passes; reference:
    poseidon.rs:368-520). Rounds run under lax.scan to keep the graph small.
    Bit-identical to the scan path (tests cross-check both vs the oracle)."""
    lead = state.shape[:-1]
    st = state.reshape(-1, SPONGE_WIDTH).transpose(1, 0)   # [12, B]
    st = permute_lanes(st)
    return st.transpose(1, 0).reshape(*lead, SPONGE_WIDTH)


MDS0TO0 = (MDS_MATRIX_CIRC[0] + MDS_MATRIX_DIAG[0]) % ref.ORDER


def _full_round_lanes(s: GF, rc_row: GF) -> GF:
    """One full round on a lanes-layout state [12, B]: add round constants,
    S-box every lane, MDS. The MDS circulant sum runs on 4 u16 limbs: the
    6-bit MDS constants keep each limb accumulator under 2^26, so the whole
    sum is plain u32 mul/adds recombined to one 96-bit value per row before
    a single reduction."""
    B = s.shape[-1]
    s = s + rc_row.reshape(SPONGE_WIDTH, 1).broadcast_to((SPONGE_WIDTH, B))
    s = _sbox_gf(s)
    limbs = (s.lo & 0xFFFF, s.lo >> 16, s.hi & 0xFFFF, s.hi >> 16)
    accs = [None] * 4
    for i in range(SPONGE_WIDTH):
        c = np.uint32(MDS_MATRIX_CIRC[i])
        for k in range(4):
            # i == 0 must bypass jnp.roll: a zero shift lowers to a
            # concat with a 0-sized slice, which Mosaic (Pallas) rejects
            rolled = limbs[k] if i == 0 else jnp.roll(limbs[k], -i, axis=0)
            term = c * rolled
            accs[k] = term if accs[k] is None else accs[k] + term
    # DIAG = [8, 0, ...]: row 0 also gets 8 * s[0]
    zeros = jnp.zeros_like(limbs[0][1:])
    d = np.uint32(MDS_MATRIX_DIAG[0])
    for k in range(4):
        accs[k] = accs[k] + jnp.concatenate(
            [d * limbs[k][0:1], zeros], axis=0)
    # recombine: value = a0 + a1*2^16 + a2*2^32 + a3*2^48 (ai < 2^27)
    a0, a1, a2, a3 = accs
    t0 = (a1 & 0xFFFF) << 16
    w0 = a0 + t0
    c0 = (w0 < a0).astype(u32)
    mid = (a1 >> 16) + a2 + c0
    t1 = (a3 & 0xFFFF) << 16
    w1 = mid + t1
    c1 = (w1 < mid).astype(u32)
    w2 = (a3 >> 16) + c1
    return GF(*_reduce96(w2, w1, w0))


def _partial_init_lanes(st: GF, first_rc: GF, init_mat: GF) -> GF:
    """First partial-round constant layer + the init matrix (applied once
    before the 22 sparse layers; reference: poseidon.rs:368-420)."""
    B = st.shape[-1]
    st = st + first_rc.reshape(SPONGE_WIDTH, 1).broadcast_to(st.shape)
    rest = st[1:]                                            # [11, B]
    prod = init_mat.reshape(11, 11, 1).broadcast_to((11, 11, B)) * \
        rest.reshape(1, 11, B).broadcast_to((11, 11, B))
    # out[c] = sum_r init_mat[r][c] * rest[r]  -> sum over axis 1 of [c, r, B]
    new_rest = prod.sum(axis=1)                              # [11, B]
    return GF.concatenate([st[0:1], new_rest], axis=0)


def _partial_round_lanes(s: GF, rc: GF, v: GF, wh: GF) -> GF:
    """One sparse partial layer: S-box lane 0 only, then the factorized MDS
    (w_hat dot for row 0, rank-1 vs update for the rest)."""
    B = s.shape[-1]
    s0 = _sbox_gf(s[0:1]) + rc.reshape(1, 1).broadcast_to((1, B))
    rest = s[1:]
    whb = wh.reshape(11, 1).broadcast_to((11, B))
    d = s0.mul_small(MDS0TO0) + (whb * rest).sum(axis=0).reshape(1, B)
    vb = v.reshape(11, 1).broadcast_to((11, B))
    new_rest = rest + vb * s0.broadcast_to((11, B))
    return GF.concatenate([d, new_rest], axis=0)


def permute_lanes_unrolled(st: GF, tables=None) -> GF:
    """Fully unrolled lanes permutation — the Pallas kernel body (state stays
    in VMEM/registers across all 30 rounds) and valid plain-jnp on TPU.
    `tables` lets the Pallas kernel pass the constant tables as kernel
    inputs (pallas forbids captured array constants)."""
    if tables is None:
        rc = _round_constants()
        first_rc, partial_rc, vs, w_hats, init_mat = _fast_tables_gf()
    else:
        rc, first_rc, partial_rc, vs, w_hats, init_mat = tables
    for r in range(HALF_N_FULL_ROUNDS):
        st = _full_round_lanes(st, rc[r])
    st = _partial_init_lanes(st, first_rc, init_mat)
    for r in range(N_PARTIAL_ROUNDS):
        st = _partial_round_lanes(st, partial_rc[r], vs[r], w_hats[r])
    for r in range(N_ROUNDS - HALF_N_FULL_ROUNDS, N_ROUNDS):
        st = _full_round_lanes(st, rc[r])
    return st


def permute_lanes(st: GF) -> GF:
    """Poseidon permutation in lanes layout: st [12, B] -> [12, B].

    Dispatch: Pallas kernel on TPU for large batches (state resident in VMEM
    across all 30 rounds — the hand-kernel analog of the reference's
    AVX2/BMI2 permutation, hash/arch/x86_64/...avx2_bmi2.rs); lax.scan
    formulation otherwise (small O(1) graph, the XLA:CPU-friendly path)."""
    from ..ops import pallas_poseidon as pp
    B = st.shape[-1]
    if pp.should_use_pallas(B):
        return pp.permute_lanes_pallas(st)
    rc = _round_constants()
    first_rc, partial_rc, vs, w_hats, init_mat = _fast_tables_gf()

    def full_round(carry, xs):
        lo, hi = carry
        rc_lo, rc_hi = xs
        out = _full_round_lanes(GF(lo, hi), GF(rc_lo, rc_hi))
        return (out.lo, out.hi), None

    (lo, hi), _ = jax.lax.scan(full_round, (st.lo, st.hi),
                               (rc.lo[:HALF_N_FULL_ROUNDS],
                                rc.hi[:HALF_N_FULL_ROUNDS]))
    st = GF(lo, hi)

    st = _partial_init_lanes(st, first_rc, init_mat)

    def partial_round(carry, xs):
        lo, hi = carry
        rc_lo, rc_hi, vs_lo, vs_hi, wh_lo, wh_hi = xs
        out = _partial_round_lanes(GF(lo, hi), GF(rc_lo, rc_hi),
                                   GF(vs_lo, vs_hi), GF(wh_lo, wh_hi))
        return (out.lo, out.hi), None

    (lo, hi), _ = jax.lax.scan(
        partial_round, (st.lo, st.hi),
        (partial_rc.lo, partial_rc.hi, vs.lo, vs.hi, w_hats.lo, w_hats.hi))
    st = GF(lo, hi)

    (lo, hi), _ = jax.lax.scan(full_round, (st.lo, st.hi),
                               (rc.lo[-HALF_N_FULL_ROUNDS:],
                                rc.hi[-HALF_N_FULL_ROUNDS:]))
    return GF(lo, hi)


def hash_no_pad_lanes(inputs: GF) -> GF:
    """Sponge in lanes layout end-to-end: inputs [L, B] -> digests [4, B]
    (no per-permutation transposes — the whole Merkle leaf pass stays in the
    batch-fills-the-lanes layout).

    Full rate-8 chunks absorb under ONE lax.scan: a 135-element leaf would
    otherwise inline 17 separate permutation instances into the graph, and
    the per-shape XLA compile of that program is what blew the round-3 bench
    step caps on chip (~4 min for one Merkle commit program).

    On TPU with a kernel-friendly batch the whole absorb runs as ONE fused
    Pallas kernel with the state resident in VMEM (a 135-element leaf
    otherwise round-trips the state through HBM 17x)."""
    L, B = inputs.shape
    from ..ops import pallas_poseidon as pp
    if pp.should_use_pallas_leaf(L, B):
        return pp.hash_leaves_lanes_pallas(inputs)
    state = GF.zeros((SPONGE_WIDTH, B))
    n_full, rem = divmod(L, SPONGE_RATE)
    if n_full == 1:
        chunk = inputs[:SPONGE_RATE]
        state = GF.concatenate([chunk, state[SPONGE_RATE:]], axis=0)
        state = permute_lanes(state)
    elif n_full > 1:
        chunks = inputs[:n_full * SPONGE_RATE].reshape(n_full, SPONGE_RATE, B)

        def body(carry, xs):
            lo, hi = carry
            c_lo, c_hi = xs
            st = GF.concatenate(
                [GF(c_lo, c_hi), GF(lo, hi)[SPONGE_RATE:]], axis=0)
            st = permute_lanes(st)
            return (st.lo, st.hi), None

        (lo, hi), _ = jax.lax.scan(body, (state.lo, state.hi),
                                   (chunks.lo, chunks.hi))
        state = GF(lo, hi)
    if rem:
        chunk = inputs[n_full * SPONGE_RATE:]
        state = GF.concatenate([chunk, state[rem:]], axis=0)
        state = permute_lanes(state)
    return state[:NUM_HASH_OUT_ELTS]


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
    return permute_lanes(state)[:NUM_HASH_OUT_ELTS]


def poseidon_permute(state: GF) -> GF:
    """Batched Poseidon permutation; state shape [..., 12]."""
    if jax.default_backend() == "tpu":
        return _poseidon_permute_lanes(state)
    return _poseidon_permute_scan(state)


def hash_no_pad(inputs: GF) -> GF:
    """Batched hash_n_to_hash_no_pad: inputs [..., L] -> digests [..., 4].

    Full rate-8 chunks are absorbed under one lax.scan (one permutation graph
    regardless of L); a trailing partial chunk adds a second.
    """
    L = inputs.shape[-1]
    lead = inputs.shape[:-1]
    state = GF.zeros((*lead, SPONGE_WIDTH))
    n_full, rem = divmod(L, SPONGE_RATE)
    if n_full > 0:
        chunks = inputs[..., :n_full * SPONGE_RATE].reshape(
            *lead, n_full, SPONGE_RATE)
        # scan axis must lead: [n_full, ..., RATE]
        ax = list(range(chunks.lo.ndim))
        perm = [len(ax) - 2] + ax[:-2] + [ax[-1]]
        ch_lo = chunks.lo.transpose(perm)
        ch_hi = chunks.hi.transpose(perm)

        def body(carry, xs):
            lo, hi = carry
            c_lo, c_hi = xs
            st = GF.concatenate(
                [GF(c_lo, c_hi), GF(lo, hi)[..., SPONGE_RATE:]], axis=-1)
            st = poseidon_permute(st)
            return (st.lo, st.hi), None

        (slo, shi), _ = jax.lax.scan(body, (state.lo, state.hi),
                                     (ch_lo, ch_hi))
        state = GF(slo, shi)
    if rem:
        chunk = inputs[..., n_full * SPONGE_RATE:]
        state = GF.concatenate([chunk, state[..., rem:]], axis=-1)
        state = poseidon_permute(state)
    return state[..., :NUM_HASH_OUT_ELTS]


def hash_or_noop(inputs: GF) -> GF:
    """Batched hash_or_noop: [..., L] -> [..., 4]; L static per call."""
    L = inputs.shape[-1]
    if L <= NUM_HASH_OUT_ELTS:
        lead = inputs.shape[:-1]
        pad = GF.zeros((*lead, NUM_HASH_OUT_ELTS - L))
        return GF.concatenate([inputs, pad], axis=-1)
    return hash_no_pad(inputs)


def compress(x: GF, y: GF) -> GF:
    """Batched two-to-one compression: [..., 4] x [..., 4] -> [..., 4]."""
    lead = x.shape[:-1]
    cap = GF.zeros((*lead, SPONGE_WIDTH - 2 * NUM_HASH_OUT_ELTS))
    state = GF.concatenate([x, y, cap], axis=-1)
    return poseidon_permute(state)[..., :NUM_HASH_OUT_ELTS]
