"""MXU-native Goldilocks NTT: DFT-as-limb-matmul four-step.

The butterfly NTT (ops/ntt.py) is VPU/layout-bound on TPU (~1% of the HBM
roofline measured in round 2) because every radix-4 stage is a relayout plus
~90 scalar-equivalent u32 VPU ops per element, and none of the FLOPs touch
the MXU — the unit with ~two orders of magnitude more throughput. This module
reformulates the NTT so ~all multiplies run on the MXU systolic array:

  * Bailey/four-step decomposition (reference field/src/fft.rs:202-239 is the
    radix-2 analog; projects/cache-friendly-fft is the reference's own
    four-step): N = D_0 * ... * D_{L-1} with every D_s <= 256, so each level
    is a batch of D_s-point DFTs — dense [K, R] matrix products.
  * Goldilocks elements (u64) are split into NINE BALANCED 8-bit limbs
    b_i in [-128, 127] with value = sum b_i 2^(8i)  (borrow-propagated, so no
    zero-point corrections are needed). Both the data and the DFT matrix are
    limb-split; the product of two elements summed over a K<=256 contraction
    becomes 17 "diagonal" sums  S_d = sum_{i+j=d} A_i B_j  with
    |S_d| <= 9*256*128^2 < 2^26 — EXACT in int32.
  * All 9x9 limb products for all 17 diagonals are ONE int8 matmul per level
    against a block-banded matrix  B[(i,k), (d,r)] = W_limb[d-i][k,r]  of
    shape [9, K, 17, R]: s8 x s8 -> s32 on the MXU (int8 is the MXU's
    fastest mode; the zero half of the band costs idle MACs, not accuracy).
  * The VPU only recombines the 17 diagonals mod p (bias to unsigned, pack
    into five u32 words, fold 2^128/2^96/2^64 identities — ~100 ops/elem)
    and applies the between-level twiddles as at most two broadcast GF muls
    from factored sqrt(N)-sized tables.
  * Coset shifts (input scale c^n), inverse-transform output scales e^k, and
    the 1/N scalar all FOLD INTO the host-precomputed level matrices and
    twiddle tables — coset LDE costs the same as a plain NTT, and the
    zero-padding of an LDE shrinks the level-0 contraction to K0 = D_0/rate
    (the reference's r-skip, fft.rs:223-229, becomes a thinner matmul).

Semantics match ops/ntt.py exactly (bit-exact tests in
tests/test_ntt_mxu.py); polynomials are dense GF arrays [..., N] and the
transform is over the last axis, batched over the rest — the prover's
[135, 2^n] shape turns every level into a [135*N/R, 9K] x [9K, 17R] matmul,
which is exactly what the systolic array wants.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..field import reference as ref
from ..field.goldilocks import (
    GF, ORDER, _reduce128, sub as gf_sub, u32,
)
from ..utils.bits import log2_strict
from ..utils.devcache import dev_const

MAX_LG_RADIX = 8      # 256-point base DFTs: K=256 keeps |S_d| < 2^26 (exact)
MIN_LG_MXU = 8        # below this, the butterfly path wins (latency-bound)
BIAS = 1 << 26        # unsigned bias per diagonal; |S_d| < 2^26
NUM_LIMBS = 9         # balanced 8-bit limbs covering [0, 2^64)
NUM_DIAGS = 2 * NUM_LIMBS - 1


def _digits_for(lg_n: int, rate_bits: int = 0) -> tuple:
    """Split lg_n into per-level radix logs (largest first, each <= 8).
    The first digit must exceed rate_bits so the LDE zero-skip stays a
    row-slice of the level-0 matrix."""
    L = max(1, -(-lg_n // MAX_LG_RADIX))
    while True:
        base, rem = divmod(lg_n, L)
        digits = [base + 1] * rem + [base] * (L - rem)
        if digits[0] > rate_bits or L * MAX_LG_RADIX < lg_n + 1:
            return tuple(digits)
        L += 1


# ---------------------------------------------------------------------------
# host-side table construction (numpy / python ints; lru-cached per shape)
# ---------------------------------------------------------------------------

def _balanced_limbs_np(vals: np.ndarray) -> np.ndarray:
    """u64 array -> int8 [9, ...]: balanced digits b_i in [-128, 127] with
    value = sum b_i 2^(8i) (borrow-propagated; the 9th digit absorbs the
    final carry and lies in {0, 1})."""
    v = vals.astype(np.uint64)
    out = np.empty((NUM_LIMBS,) + v.shape, dtype=np.int8)
    carry = np.zeros(v.shape, dtype=np.uint64)
    for i in range(8):
        d = ((v >> np.uint64(8 * i)) & np.uint64(0xFF)) + carry
        ge = d >= 128
        out[i] = (d.astype(np.int64) - np.where(ge, 256, 0)).astype(np.int8)
        carry = ge.astype(np.uint64)
    out[8] = carry.astype(np.int8)
    return out


def _band_matrix(w_u64: np.ndarray) -> np.ndarray:
    """[K, R] u64 field matrix -> banded s8 [9, K, 17, R] with
    band[i, k, d, r] = limb_{d-i}(W[k, r]) for 0 <= d-i < 9, else 0."""
    K, R = w_u64.shape
    wl = _balanced_limbs_np(w_u64)          # [9, K, R]
    band = np.zeros((NUM_LIMBS, K, NUM_DIAGS, R), dtype=np.int8)
    for i in range(NUM_LIMBS):
        band[i, :, i:i + NUM_LIMBS, :] = np.transpose(wl, (1, 0, 2))
    return band


def _gf_np(vals_u64: np.ndarray):
    v = np.asarray(vals_u64, dtype=np.uint64)
    return ((v & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (v >> np.uint64(32)).astype(np.uint32))


def _pow_table(base: int, rows: int, cols: int) -> np.ndarray:
    """[rows, cols] u64 table t[k, d] = base^(k*d) mod p."""
    t = np.empty((rows, cols), dtype=np.uint64)
    row_base = 1
    for k in range(rows):
        acc = 1
        for d in range(cols):
            t[k, d] = acc
            acc = acc * row_base % ORDER
        row_base = row_base * base % ORDER
    return t


@functools.lru_cache(maxsize=None)
def _plan(lg_N: int, lg_in: int, c: int, e: int, s: int, inverse: bool):
    """Precompute all per-level tables for
        OUT[k] = s * e^k * sum_{n < 2^lg_in} x[n] c^n omega^(n k)
    with omega the 2^lg_N-th root of unity (or its inverse). Returns a list
    of per-stage dicts: banded matrix, input K, output R, twiddle factors."""
    rate = lg_N - lg_in
    digits = _digits_for(lg_N, rate)
    L = len(digits)
    omega = ref.primitive_root_of_unity(lg_N)
    if inverse:
        omega = ref.inverse(omega)
    stages = []
    done_weight = 1                  # output-digit weight prod_{u<s} D_u
    for st in range(L):
        D = 1 << digits[st]
        K = D >> rate if st == 0 else D
        rem_lg = sum(digits[st:])                  # lg of N_s
        w_Ns = pow(omega, 1 << (lg_N - rem_lg), ORDER)   # 2^rem_lg-th root
        w_D = pow(omega, 1 << (lg_N - digits[st]), ORDER)  # D-th root
        # level matrix W[n, k] = rowscale[n] * colscale[k] * w_D^(n k)
        mat = _pow_table(w_D, K, D)                # [K rows n, D cols k]
        if st == 0 and c != 1:
            # input scale c^n folded into rows: n's weight in the INPUT
            # flat index is 2^lg_in / K0
            w_row = (1 << lg_in) // K
            rs = np.array([pow(c, n * w_row, ORDER) for n in range(K)],
                          dtype=np.uint64)
            mat = (mat.astype(object) * rs[:, None].astype(object)) % ORDER
        if e != 1:
            cs = np.array([pow(e, k * done_weight, ORDER) for k in range(D)],
                          dtype=np.uint64)
            mat = (mat.astype(object) * cs[None, :].astype(object)) % ORDER
        if st == L - 1 and s != 1:
            mat = (mat.astype(object) * (s % ORDER)) % ORDER
        band = _band_matrix(mat.astype(np.uint64))
        # factored twiddles: for each remaining digit t > st,
        # factor_t[k, d_t] = w_Ns^(k * d_t * M_t) * (st==0: c^(d_t * M_t))
        factors = []
        M = 1
        for t in range(L - 1, st, -1):
            Dt = 1 << digits[t]
            base = pow(w_Ns, M, ORDER)
            tab = _pow_table(base, D, Dt)          # [k, d_t]
            if st == 0 and c != 1:
                ctab = np.array([pow(c, d * M, ORDER) for d in range(Dt)],
                                dtype=np.uint64)
                tab = (tab.astype(object) * ctab[None, :].astype(object)) \
                    % ORDER
            factors.append((t, _gf_np(tab.astype(np.uint64))))
            M *= Dt
        stages.append({
            "band": band, "K": K, "R": D, "factors": factors,
        })
        done_weight *= D
    # bias constant subtracted after each diagonal recombine
    bias_total = sum(BIAS << (8 * d) for d in range(NUM_DIAGS)) % ORDER
    return digits, stages, bias_total


# ---------------------------------------------------------------------------
# device-side pieces
# ---------------------------------------------------------------------------

def _balanced_limbs(x: GF) -> jax.Array:
    """GF [...] -> s8 [9, ...] balanced limbs (same digit set as host)."""
    parts = []
    carry = jnp.zeros_like(x.lo)
    for i in range(8):
        src = x.lo if i < 4 else x.hi
        d = ((src >> np.uint32(8 * (i % 4))) & np.uint32(0xFF)) + carry
        ge = d >= 128
        b = d.astype(jnp.int32) - jnp.where(ge, 256, 0)
        parts.append(b.astype(jnp.int8))
        carry = ge.astype(u32)
    parts.append(carry.astype(jnp.int8))
    return jnp.stack(parts)


def _addto(words: list, idx: int, val):
    """words[idx] += val (u32), carry-propagating upward."""
    s = words[idx] + val
    carry = (s < val).astype(u32)
    words[idx] = s
    i = idx + 1
    while i < len(words):
        s2 = words[i] + carry
        carry = (s2 < carry).astype(u32)
        words[i] = s2
        i += 1


def _combine_diags(S, bias_total: int) -> GF:
    """s32 [..., 17, R] diagonal sums -> GF [..., R]:
    value = sum_d S_d 2^(8d) mod p, computed as the biased-unsigned packing
    sum (S_d + 2^26) 2^(8d) minus the constant, folded 160 -> 64 bits via
    2^96 = -1, 2^64 = eps, 2^128 = -2^32 (mod p)."""
    U = (S + np.int32(BIAS)).astype(u32)          # < 2^27
    words = [jnp.zeros(U.shape[:-2] + U.shape[-1:], u32) for _ in range(5)]
    for d in range(NUM_DIAGS):
        v = U[..., d, :]
        w, sh = divmod(8 * d, 32)
        _addto(words, w, (v << sh) if sh else v)
        if sh:
            _addto(words, w + 1, v >> (32 - sh))
    lo, hi = _reduce128(words[3], words[2], words[1], words[0])
    # minus W4 * 2^32 (canonical: W4 < 2^29 << 2^32 - 1)
    lo, hi = gf_sub(lo, hi, jnp.zeros_like(words[4]), words[4])
    bl = np.uint32(bias_total & 0xFFFFFFFF)
    bh = np.uint32(bias_total >> 32)
    lo, hi = gf_sub(lo, hi, jnp.full_like(lo, bl), jnp.full_like(hi, bh))
    return GF(lo, hi)


# budget for the per-level s32 diagonal intermediate: the [.., 17, R] dot
# output is ~68 B per output element before the mod-p recombine (~1.1 GB
# transient at the default), so levels bigger than this are chunked through
# a fori_loop of dynamic slices (bounds peak HBM — an unchunked
# [135, 2^17] -> 2^20 LDE level would materialize ~9 GB and OOM the 16 GB
# chip, as the round-3 ECDSA run demonstrated). Transpose-free: chunks are
# last-axis slices written back into a preallocated output.
CHUNK_OUT_ELEMS = int(os.environ.get("PLONKY2_TPU_NTT_CHUNK", 1 << 24))


def _stage_matmul(x3: GF, band_np, bias_total: int) -> GF:
    """One level's banded limb-matmul: x3 [F, K, G] -> GF [F, G, R],
    chunked over G when the s32 diagonal intermediate would be too large.
    On TPU the fused Pallas kernel (ntt_mxu_pallas) keeps the diagonal
    intermediate in VMEM — no HBM round-trip and no chunking needed."""
    F, K, G = x3.shape
    from . import ntt_mxu_pallas as nmp
    if nmp.use_pallas():
        out = nmp.stage_matmul_pallas(x3, band_np, bias_total)
        if out is not None:
            return out
    band = dev_const(band_np)                      # s8 [9, K, 17, R]
    R = band.shape[-1]

    def one(xc: GF) -> GF:
        a9 = _balanced_limbs(xc)                   # s8 [9, F, K, Gc]
        out = jax.lax.dot_general(
            a9, band,
            dimension_numbers=(((0, 2), (0, 1)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                          # [F, Gc, 17, R]
        return _combine_diags(out, bias_total)     # GF [F, Gc, R]

    # static python-unrolled chunks (XLA schedules them with bounded live
    # intermediates; dynamic-slice loops and lax.map relayouts both measured
    # slower on chip). Batched shapes chunk the leading axis (contiguous
    # slices, uneven sizes ok) with the full budget; single-poly shapes
    # chunk the trailing axis with a smaller one (2^21 measured ~20% faster
    # than 2^23 at N=2^24 — locality beats dispatch count there).
    if F > 1:
        if F * G * R <= CHUNK_OUT_ELEMS:
            return one(x3)
        fc = max(1, CHUNK_OUT_ELEMS // (G * R))
        parts = [one(x3[a:a + fc]) for a in range(0, F, fc)]
        return GF.concatenate(parts, axis=0)
    g_budget = max(CHUNK_OUT_ELEMS >> 3, 1 << 18)
    if G * R <= g_budget:
        return one(x3)
    gc = max(1, g_budget // R)
    gc = min(1 << (gc.bit_length() - 1), G)        # power-of-2 divisor of G
    parts = [one(GF(x3.lo[:, :, a:a + gc], x3.hi[:, :, a:a + gc]))
             for a in range(0, G, gc)]
    return GF.concatenate(parts, axis=1)


def _core(x: GF, lg_N: int, lg_in: int, c: int, e: int, s: int,
          inverse: bool) -> GF:
    digits, stages, bias_total = _plan(lg_N, lg_in, c % ORDER, e % ORDER,
                                       s % ORDER, inverse)
    L = len(digits)
    batch = x.shape[:-1]
    nb = len(batch)
    shape_digits = [stages[0]["K"]] + [1 << d for d in digits[1:]]
    x = x.reshape(*batch, *shape_digits)
    for st in range(L):
        info = stages[st]
        K, R = info["K"], info["R"]
        pre = x.shape                              # [batch.., K, rest..]
        F = int(np.prod(pre[:nb], dtype=np.int64)) if nb else 1
        G = int(np.prod(pre[nb + 1:], dtype=np.int64)) if len(pre) > nb + 1 \
            else 1
        g3 = _stage_matmul(x.reshape(F, K, G), info["band"], bias_total)
        g = g3.reshape(*pre[:nb], *pre[nb + 1:], R)  # [batch.., rest.., R]
        for t, (tlo, thi) in info["factors"]:
            # factor[k, d_t]: k = last axis; d_t sits at nb + (t - st - 1)
            tab = GF(dev_const(tlo), dev_const(thi))
            bshape = [1] * g.ndim
            bshape[nb + (t - st - 1)] = tab.shape[1]
            bshape[-1] = tab.shape[0]
            tab = tab.transpose(1, 0).reshape(bshape)
            g = g * tab.broadcast_to(g.shape)
        x = g
    # axes now [batch.., K_0, ..., K_{L-1}]; natural order reverses them
    perm = tuple(range(nb)) + tuple(range(nb + L - 1, nb - 1, -1))
    x = x.transpose(*perm)
    return x.reshape(*batch, 1 << lg_N)


# ---------------------------------------------------------------------------
# public API (semantics identical to ops/ntt.py)
# ---------------------------------------------------------------------------

def fft(coeffs: GF) -> GF:
    lg = log2_strict(coeffs.shape[-1])
    return _core(coeffs, lg, lg, 1, 1, 1, False)


def coset_fft(coeffs: GF, shift: int) -> GF:
    lg = log2_strict(coeffs.shape[-1])
    return _core(coeffs, lg, lg, shift, 1, 1, False)


def lde_fft(coeffs: GF, rate_bits: int, shift: int | None = None) -> GF:
    lg_in = log2_strict(coeffs.shape[-1])
    return _core(coeffs, lg_in + rate_bits, lg_in,
                 shift if shift is not None else 1, 1, 1, False)


def ifft(values: GF) -> GF:
    lg = log2_strict(values.shape[-1])
    return _core(values, lg, lg, 1, 1, ref.inverse_2exp(lg), True)


def coset_ifft(values: GF, shift: int) -> GF:
    lg = log2_strict(values.shape[-1])
    return _core(values, lg, lg, 1, ref.inverse(shift),
                 ref.inverse_2exp(lg), True)
