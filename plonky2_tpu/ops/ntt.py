"""Batched Goldilocks NTT / iNTT / coset LDE on the last axis.

Semantics match the reference FFT (reference: field/src/fft.rs —
fft_classic:202-239 radix-2 DIT after bit-reversal; ifft:101-128 = forward FFT
+ tail reversal + scale by 1/n; the r-zero-stage skip:223-229 becomes a
broadcast/repeat; polynomial/mod.rs coset_fft = scale coeffs by shift powers).

TPU-first design: polynomials are dense GF arrays [..., N]; every butterfly
stage is one vectorized pass (XLA fuses the limb arithmetic); twiddle tables
are computed once per size on device via log-doubling and cached (the analog
of the reference's precomputed FftRootTable, field/src/fft.rs:16-35).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..field import reference as ref
from ..field.goldilocks import GF, gf_powers
from ..field.extension import GF2
from ..utils.bits import log2_strict, reverse_index_bits_perm, ifft_reverse_perm
from ..utils.devcache import dev_const

MULTIPLICATIVE_GROUP_GENERATOR = 7  # default coset shift

_MIN_LG_MXU = 8  # output size from which the MXU limb-matmul NTT dispatches


def _use_mxu(lg_out: int) -> bool:
    """TPU backend: route big transforms to the DFT-as-int8-limb-matmul
    four-step (ops/ntt_mxu.py) — the butterfly path is VPU/layout-bound at
    ~1% of the HBM roofline, the matmul path runs on the MXU. Kill switch:
    PLONKY2_TPU_NO_MXU_NTT=1."""
    import os
    if lg_out < _MIN_LG_MXU or os.environ.get("PLONKY2_TPU_NO_MXU_NTT"):
        return False
    return jax.default_backend() == "tpu"


@lru_cache(maxsize=None)
def _half_twiddles(lg_n: int):
    """Powers g^0..g^{n/2-1} of the 2^lg_n-th root of unity, as host numpy
    limb arrays (become jit-time constants). Pure-numpy precompute: the old
    eager-jnp path compiled ~10 one-op XLA programs per table."""
    from ..field.goldilocks import powers_np
    n = 1 << lg_n
    g = ref.primitive_root_of_unity(lg_n)
    tw = powers_np(g, max(n // 2, 1))
    return ((tw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (tw >> np.uint64(32)).astype(np.uint32))


def stage_twiddles(lg_n: int, stage: int) -> GF:
    """Twiddles for butterfly stage `stage` (block size m = 2^{stage+1}):
    w_m^j for j in 0..m/2. Strided view of the half table."""
    lo, hi = _stage_twiddles_np(lg_n, stage)
    return GF(dev_const(lo), dev_const(hi))


@lru_cache(maxsize=None)
def _stage_twiddles_np(lg_n: int, stage: int):
    lo, hi = _half_twiddles(lg_n)
    stride = 1 << (lg_n - 1 - stage)
    return (np.ascontiguousarray(lo[::stride]),
            np.ascontiguousarray(hi[::stride]))


def _butterfly_stages(x: GF, lg_n: int, start_stage: int) -> GF:
    """Radix-2 DIT butterflies (input bit-reversed, output natural order).

    Formulations, picked by backend/shape:
    - TPU batched + PLONKY2_TPU_NTT_BATCHLANES: batch on the LANE axis —
      every butterfly is a leading-axis view, twiddles broadcast across
      lanes, zero lane-crossing ops (the layout the Merkle pipeline uses).
    - TPU: per-stage static reshapes/slices (NO gathers — lane-crossing
      gathers are slow on the VPU; a reshape view makes every butterfly a
      contiguous vector op the compiler tiles onto (8,128) registers).
    - CPU (tests): uniform-stage lax.scan (XOR-partner gather), O(1) graph
      in lg_n — per-stage unrolled graphs trigger pathological XLA:CPU
      compile times.
    """
    import os
    if jax.default_backend() == "tpu":
        if (x.ndim == 2 and x.shape[0] >= 8
                and os.environ.get("PLONKY2_TPU_NTT_BATCHLANES")):
            return _butterfly_stages_batch_lanes(x, lg_n, start_stage)
        return _butterfly_stages_reshaped(x, lg_n, start_stage)
    return _butterfly_stages_scan(x, lg_n, start_stage)


def _butterfly_stages_batch_lanes(x: GF, lg_n: int, start_stage: int) -> GF:
    """Batched butterflies with the batch dim moved to the lane axis:
    x [B, n] -> work in [n, B] -> [B, n]. Stage views index the LEADING
    axis (free relayout); each twiddle is one scalar broadcast across the
    B-wide lane vectors. Radix-4 (two stages per memory pass) like the
    lane-major path."""
    B, n = x.shape
    y = x.transpose(1, 0)                                # [n, B]
    s = start_stage
    while s < lg_n:
        m = 1 << s
        if s + 1 < lg_n:
            tw1 = stage_twiddles(lg_n, s)                # [m]
            tw2 = stage_twiddles(lg_n, s + 1)            # [2m]
            yr = y.reshape(n // (4 * m), 4, m, B)
            u0, u1 = yr[:, 0], yr[:, 1]
            u2, u3 = yr[:, 2], yr[:, 3]
            t1 = tw1.reshape(1, m, 1).broadcast_to(u1.shape)
            a0 = u0 + t1 * u1
            a1 = u0 - t1 * u1
            a2 = u2 + t1 * u3
            a3 = u2 - t1 * u3
            w_lo = tw2[:m].reshape(1, m, 1).broadcast_to(a2.shape)
            w_hi = tw2[m:].reshape(1, m, 1).broadcast_to(a3.shape)
            b2 = w_lo * a2
            b3 = w_hi * a3
            o0, o2 = a0 + b2, a0 - b2
            o1, o3 = a1 + b3, a1 - b3
            lo = jnp.stack([o0.lo, o1.lo, o2.lo, o3.lo], axis=1)
            hi = jnp.stack([o0.hi, o1.hi, o2.hi, o3.hi], axis=1)
            y = GF(lo, hi).reshape(n, B)
            s += 2
        else:
            tw = stage_twiddles(lg_n, s)                 # [m]
            yr = y.reshape(n // (2 * m), 2, m, B)
            u, v = yr[:, 0], yr[:, 1]
            t = tw.reshape(1, m, 1).broadcast_to(v.shape) * v
            a = u + t
            b = u - t
            lo = jnp.stack([a.lo, b.lo], axis=1)
            hi = jnp.stack([a.hi, b.hi], axis=1)
            y = GF(lo, hi).reshape(n, B)
            s += 1
    return y.transpose(1, 0)


def _butterfly_stages_reshaped(x: GF, lg_n: int, start_stage: int) -> GF:
    """Butterflies as static reshapes (no gathers), radix-4 where possible:
    two radix-2 stages fused into one memory pass over the array (same
    multiply count, half the HBM traffic — the NTT is bandwidth-bound).
    Stage s has butterfly distance 2^s; view [..., n/4m, 4, m] with m=2^s,
    twiddles w_{2m}^j (inner) and w_{4m}^{j}, w_{4m}^{j+m} (outer)."""
    n = x.shape[-1]
    batch = x.shape[:-1]
    s = start_stage
    while s < lg_n:
        m = 1 << s
        if s + 1 < lg_n:
            tw1 = stage_twiddles(lg_n, s)                # [m]   w_{2m}^j
            tw2 = stage_twiddles(lg_n, s + 1)            # [2m]  w_{4m}^j
            xr = x.reshape(*batch, n // (4 * m), 4, m)
            u0, u1 = xr[..., 0, :], xr[..., 1, :]
            u2, u3 = xr[..., 2, :], xr[..., 3, :]
            t1 = tw1.broadcast_to(u1.shape)
            a0 = u0 + t1 * u1
            a1 = u0 - t1 * u1
            a2 = u2 + t1 * u3
            a3 = u2 - t1 * u3
            w_lo = tw2[:m].broadcast_to(a2.shape)
            w_hi = tw2[m:].broadcast_to(a3.shape)
            b2 = w_lo * a2
            b3 = w_hi * a3
            o0, o2 = a0 + b2, a0 - b2
            o1, o3 = a1 + b3, a1 - b3
            lo = jnp.stack([o0.lo, o1.lo, o2.lo, o3.lo], axis=-2)
            hi = jnp.stack([o0.hi, o1.hi, o2.hi, o3.hi], axis=-2)
            x = GF(lo, hi).reshape(*batch, n)
            s += 2
        else:
            tw = stage_twiddles(lg_n, s)                 # [m]
            xr = x.reshape(*batch, n // (2 * m), 2, m)
            u = xr[..., 0, :]
            v = xr[..., 1, :]
            t = tw.broadcast_to(v.shape) * v
            a = u + t
            b = u - t
            lo = jnp.stack([a.lo, b.lo], axis=-2)
            hi = jnp.stack([a.hi, b.hi], axis=-2)
            x = GF(lo, hi).reshape(*batch, n)
            s += 1
    return x


def _butterfly_stages_scan(x: GF, lg_n: int, start_stage: int) -> GF:
    n = x.shape[-1]
    if lg_n == start_stage:
        return x
    from .. import field  # noqa: F401  (keep import order stable)
    half_lo, half_hi = _half_twiddles(lg_n)
    tw_lo = dev_const(half_lo)
    tw_hi = dev_const(half_hi)
    i_arr = jnp.arange(n, dtype=jnp.uint32)
    stages = np.arange(start_stage, lg_n, dtype=np.uint32)
    bs = (np.uint32(1) << stages)               # butterfly distance 2^s
    shs = (np.uint32(lg_n - 1) - stages)        # twiddle index shift

    def body(carry, xs):
        lo, hi = carry
        b, sh = xs
        partner = (i_arr ^ b).astype(jnp.int32)
        p_lo = jnp.take(lo, partner, axis=-1)
        p_hi = jnp.take(hi, partner, axis=-1)
        tw_idx = ((i_arr & (b - 1)) << sh).astype(jnp.int32)
        w = GF(jnp.take(tw_lo, tw_idx), jnp.take(tw_hi, tw_idx))
        is_v = (i_arr & b) != 0                  # odd half of each block
        xg = GF(lo, hi)
        pg = GF(p_lo, p_hi)
        u = GF.where(is_v, pg, xg)
        v = GF.where(is_v, xg, pg)
        t = w.broadcast_to(v.shape) * v
        out = GF.where(is_v, u - t, u + t)
        return (out.lo, out.hi), None

    (lo, hi), _ = jax.lax.scan(body, (x.lo, x.hi), (bs, shs))
    return GF(lo, hi)


def fft(coeffs: GF) -> GF:
    """values[j] = P(g^j) over the size-n two-adic subgroup; last axis."""
    n = coeffs.shape[-1]
    lg_n = log2_strict(n)
    if _use_mxu(lg_n):
        from . import ntt_mxu
        return ntt_mxu.fft(coeffs)
    x = coeffs.take(dev_const(reverse_index_bits_perm(n)), axis=-1)
    return _butterfly_stages(x, lg_n, 0)


def ifft(values: GF) -> GF:
    n = values.shape[-1]
    lg_n = log2_strict(n)
    if _use_mxu(lg_n):
        from . import ntt_mxu
        return ntt_mxu.ifft(values)
    buf = fft(values)
    buf = buf.take(dev_const(ifft_reverse_perm(n)), axis=-1)
    n_inv = GF.const(ref.inverse_2exp(lg_n))
    return buf * n_inv.broadcast_to(buf.shape)


def coset_fft(coeffs: GF, shift: int = MULTIPLICATIVE_GROUP_GENERATOR) -> GF:
    """Evaluate on the coset shift * <g>."""
    n = coeffs.shape[-1]
    if _use_mxu(log2_strict(n)):
        from . import ntt_mxu
        return ntt_mxu.coset_fft(coeffs, shift)
    sp = _shift_powers(shift, n)
    return fft(coeffs * sp.broadcast_to(coeffs.shape))


def coset_ifft(values: GF, shift: int = MULTIPLICATIVE_GROUP_GENERATOR) -> GF:
    n = values.shape[-1]
    if _use_mxu(log2_strict(n)):
        from . import ntt_mxu
        return ntt_mxu.coset_ifft(values, shift)
    sp = _shift_powers(ref.inverse(shift), n)
    return ifft(values) * sp.broadcast_to(values.shape)


@lru_cache(maxsize=None)
def _shift_powers_np(shift: int, n: int):
    from ..field.goldilocks import powers_np
    tw = powers_np(shift, n)
    return ((tw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (tw >> np.uint64(32)).astype(np.uint32))


def _shift_powers(shift: int, n: int) -> GF:
    lo, hi = _shift_powers_np(shift, n)
    return GF(dev_const(lo), dev_const(hi))


def lde_fft(coeffs: GF, rate_bits: int,
            shift: int | None = None) -> GF:
    """Low-degree extension: evaluate a degree-<n poly on a (coset of a)
    2^rate_bits-times larger subgroup, skipping the first rate_bits butterfly
    stages (the zero-padding broadcast trick, reference fft.rs:223-229)."""
    n_small = coeffs.shape[-1]
    lg_small = log2_strict(n_small)
    lg_n = lg_small + rate_bits
    n = 1 << lg_n
    if _use_mxu(lg_n):
        from . import ntt_mxu
        return ntt_mxu.lde_fft(coeffs, rate_bits, shift=shift)
    if shift is not None:
        sp = _shift_powers(shift, n_small)
        coeffs = coeffs * sp.broadcast_to(coeffs.shape)
    # bit-reverse the small array, then broadcast each entry 2^rate_bits times
    x = coeffs.take(dev_const(reverse_index_bits_perm(n_small)), axis=-1)
    if rate_bits > 0:
        rep = 1 << rate_bits
        x = GF(jnp.repeat(x.lo, rep, axis=-1), jnp.repeat(x.hi, rep, axis=-1))
    return _butterfly_stages(x, lg_n, rate_bits)


def coset_lde(coeffs: GF, rate_bits: int,
              shift: int = MULTIPLICATIVE_GROUP_GENERATOR) -> GF:
    """Matches PolynomialCoeffs::lde().coset_fft(): zero-pad to 2^rate_bits * n
    then evaluate on shift * <g_{2^{lg+r}}>. The shift powers apply to the
    PADDED coefficient vector, so they are folded in before padding."""
    return lde_fft(coeffs, rate_bits, shift=shift)


# -- extension-field FFT: twiddles are base-field, so componentwise ----------

def fft_ext(coeffs: GF2) -> GF2:
    return GF2(fft(coeffs.c0), fft(coeffs.c1))


def coset_fft_ext(coeffs: GF2, shift: int = MULTIPLICATIVE_GROUP_GENERATOR) -> GF2:
    return GF2(coset_fft(coeffs.c0, shift), coset_fft(coeffs.c1, shift))
