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
