/* Native host Poseidon permutation over Goldilocks.
 *
 * Reference: the Rust/AVX2/NEON host permutation
 * (plonky2/src/hash/poseidon.rs:771 + hash/arch/); here the host-side hot
 * path is witness generation (each PoseidonGate generator runs a full
 * permutation) and Merkle-proof oracles, which would otherwise run in
 * python-int arithmetic. The TPU compute path stays in XLA — this is the
 * runtime's native component.
 *
 * Constants are emitted at build time into poseidon_constants_gen.h from the
 * python tables (the analog of the reference's `gen` build crate).
 */

#include <stdint.h>
#include <stddef.h>

#include "poseidon_constants_gen.h"

typedef unsigned __int128 u128;
typedef uint64_t u64;

#define ORDER 0xFFFFFFFF00000001ULL
#define EPSILON 0xFFFFFFFFULL
#define WIDTH 12
#define N_ROUNDS 30
#define HALF_FULL 4
#define RATE 8

static inline u64 reduce128(u128 x) {
    u64 lo = (u64)x;
    u64 hi = (u64)(x >> 64);
    u64 hi_lo = hi & EPSILON;        /* hi mod 2^32 */
    u64 hi_hi = hi >> 32;            /* hi div 2^32 */
    /* x = lo + hi_lo*2^64 + hi_hi*2^96; 2^64 = EPSILON, 2^96 = -1 (mod p) */
    u64 t0 = lo - hi_hi;
    if (lo < hi_hi) t0 -= EPSILON;   /* wrapping borrow correction */
    u64 t1 = hi_lo * EPSILON;
    u64 r = t0 + t1;
    if (r < t1) r += EPSILON;        /* carry correction */
    if (r >= ORDER) r -= ORDER;
    return r;
}

static inline u64 gl_mul(u64 a, u64 b) { return reduce128((u128)a * b); }

static inline u64 gl_add(u64 a, u64 b) {
    u64 s = a + b;
    if (s < a) s += EPSILON;         /* wrapped past 2^64 */
    if (s >= ORDER) s -= ORDER;
    return s;
}

static inline u64 sbox(u64 x) {
    u64 x2 = gl_mul(x, x);
    u64 x3 = gl_mul(x2, x);
    u64 x6 = gl_mul(x3, x3);
    return gl_mul(x6, x);
}

static void mds_layer(const u64 *in, u64 *out) {
    for (int r = 0; r < WIDTH; r++) {
        u128 acc = 0;
        for (int i = 0; i < WIDTH; i++)
            acc += (u128)MDS_CIRC[i] * in[(r + i) % WIDTH];
        acc += (u128)MDS_DIAG[r] * in[r];
        out[r] = reduce128(acc);
    }
}

void poseidon_permute(u64 *state) {
    u64 tmp[WIDTH];
    for (int round = 0; round < N_ROUNDS; round++) {
        int full = round < HALF_FULL || round >= N_ROUNDS - HALF_FULL;
        for (int i = 0; i < WIDTH; i++) {
            u64 x = gl_add(state[i], ROUND_CONSTANTS[round * WIDTH + i]);
            state[i] = (full || i == 0) ? sbox(x) : x;
        }
        mds_layer(state, tmp);
        for (int i = 0; i < WIDTH; i++) state[i] = tmp[i];
    }
}

void poseidon_permute_many(u64 *states, size_t count) {
    for (size_t k = 0; k < count; k++)
        poseidon_permute(states + k * WIDTH);
}

/* hash_n_to_m_no_pad: overwrite-mode sponge (reference: hashing.rs) */
void poseidon_hash_no_pad(const u64 *inputs, size_t n, u64 *out4) {
    u64 state[WIDTH] = {0};
    size_t i = 0;
    while (i + RATE <= n) {
        for (int j = 0; j < RATE; j++) state[j] = inputs[i + j];
        poseidon_permute(state);
        i += RATE;
    }
    if (i < n) {
        for (size_t j = 0; j < n - i; j++) state[j] = inputs[i + j];
        poseidon_permute(state);
    }
    for (int j = 0; j < 4; j++) out4[j] = state[j];
}

/* hash_or_noop over [n_rows, row_len] -> [n_rows, 4] digests
 * (reference: config.rs:74-88 — rows of <= 4 elements pack directly) */
void poseidon_hash_leaves(const u64 *in, size_t n_rows, size_t row_len,
                          u64 *out) {
    for (size_t r = 0; r < n_rows; r++) {
        const u64 *row = in + r * row_len;
        u64 *o = out + r * 4;
        if (row_len <= 4) {
            for (size_t i = 0; i < 4; i++) {
                u64 v = i < row_len ? row[i] : 0;
                if (v >= ORDER) v -= ORDER;
                o[i] = v;
            }
        } else {
            poseidon_hash_no_pad(row, row_len, o);
        }
    }
}

/* two_to_one over digest pairs: left [n,4] + right [n,4] -> [n,4] */
void poseidon_compress_many(const u64 *left, const u64 *right, size_t n,
                            u64 *out) {
    u64 st[WIDTH];
    for (size_t r = 0; r < n; r++) {
        for (int i = 0; i < 4; i++) st[i] = left[r * 4 + i];
        for (int i = 0; i < 4; i++) st[4 + i] = right[r * 4 + i];
        for (int i = 8; i < WIDTH; i++) st[i] = 0;
        poseidon_permute(st);
        for (int i = 0; i < 4; i++) out[r * 4 + i] = st[i];
    }
}

/* ------------------------------------------------------------------------
 * PoseidonGate witness-generation trace (fast-partial-rounds formulation).
 *
 * The PLONK witness needs every committed intermediate of the FAST
 * formulation (reference: plonky2/src/gates/poseidon.rs generator :726-845),
 * not the naive schedule above — the committed S-box inputs differ between
 * the two even though the final permutation output is identical. Tables
 * FAST_* are emitted into poseidon_constants_gen.h from the derived python
 * tables (hash/poseidon_fast.py).
 *
 * Wire layout (gates/poseidon_gate.py): 0..12 inputs | 12..24 outputs |
 * 24 swap | 25..29 deltas | 29..65 full-round-0 sbox inputs |
 * 65..87 partial sbox inputs | 87..135 full-round-1 sbox inputs.
 * ---------------------------------------------------------------------- */

#define GATE_WIRES 135
#define WIRE_SWAP 24
#define START_DELTA 25
#define START_FULL_0 29
#define START_PARTIAL 65
#define START_FULL_1 87
#define N_PARTIAL 22

static inline u64 gl_sub(u64 a, u64 b) {   /* canonical inputs */
    return a >= b ? a - b : a - b + ORDER;
}

void poseidon_generator_trace(const u64 *in12, u64 swap, u64 *w) {
    u64 state[WIDTH], tmp[WIDTH];
    for (int i = 0; i < WIDTH; i++) {
        u64 v = in12[i];
        if (v >= ORDER) v -= ORDER;
        w[i] = v;
        state[i] = v;
    }
    w[WIRE_SWAP] = swap;
    for (int i = 0; i < 4; i++) {
        u64 delta = swap ? gl_sub(state[i + 4], state[i]) : 0;
        w[START_DELTA + i] = delta;
        state[i] = gl_add(state[i], delta);
        state[i + 4] = gl_sub(state[i + 4], delta);
    }

    int round_ctr = 0;
    for (int r = 0; r < HALF_FULL; r++) {
        for (int i = 0; i < WIDTH; i++)
            state[i] = gl_add(state[i], ROUND_CONSTANTS[round_ctr * WIDTH + i]);
        if (r)
            for (int i = 0; i < WIDTH; i++)
                w[START_FULL_0 + WIDTH * (r - 1) + i] = state[i];
        for (int i = 0; i < WIDTH; i++) state[i] = sbox(state[i]);
        mds_layer(state, tmp);
        for (int i = 0; i < WIDTH; i++) state[i] = tmp[i];
        round_ctr++;
    }

    /* partial_first_constant_layer + mds_partial_layer_init (transposed) */
    for (int i = 0; i < WIDTH; i++)
        state[i] = gl_add(state[i], FAST_FIRST_RC[i]);
    tmp[0] = state[0];
    for (int c = 1; c < WIDTH; c++) {
        u64 acc = 0;
        for (int r = 1; r < WIDTH; r++)
            acc = gl_add(acc, gl_mul(state[r],
                                     FAST_INIT_MAT[(r - 1) * 11 + (c - 1)]));
        tmp[c] = acc;
    }
    for (int i = 0; i < WIDTH; i++) state[i] = tmp[i];

    const u64 m00 = (u64)MDS_CIRC[0] + (u64)MDS_DIAG[0];
    for (int r = 0; r < N_PARTIAL; r++) {
        w[START_PARTIAL + r] = state[0];
        u64 s0 = sbox(state[0]);
        s0 = gl_add(s0, FAST_PARTIAL_RC[r]);       /* last entry is 0 */
        u64 d = gl_mul(s0, m00);
        for (int i = 1; i < WIDTH; i++)
            d = gl_add(d, gl_mul(state[i], FAST_W_HATS[r * 11 + i - 1]));
        for (int i = 1; i < WIDTH; i++)
            state[i] = gl_add(state[i], gl_mul(s0, FAST_VS[r * 11 + i - 1]));
        state[0] = d;
    }
    round_ctr += N_PARTIAL;

    for (int r = 0; r < HALF_FULL; r++) {
        for (int i = 0; i < WIDTH; i++)
            state[i] = gl_add(state[i], ROUND_CONSTANTS[round_ctr * WIDTH + i]);
        for (int i = 0; i < WIDTH; i++)
            w[START_FULL_1 + WIDTH * r + i] = state[i];
        for (int i = 0; i < WIDTH; i++) state[i] = sbox(state[i]);
        mds_layer(state, tmp);
        for (int i = 0; i < WIDTH; i++) state[i] = tmp[i];
        round_ctr++;
    }
    for (int i = 0; i < WIDTH; i++) w[WIDTH + i] = state[i];
}

void poseidon_generator_trace_many(const u64 *in13, size_t n, u64 *out) {
    for (size_t k = 0; k < n; k++)
        poseidon_generator_trace(in13 + k * 13, in13[k * 13 + 12],
                                 out + k * GATE_WIRES);
}
