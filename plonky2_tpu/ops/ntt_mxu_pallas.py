"""Pallas-fused level kernel for the MXU NTT (ops/ntt_mxu.py).

The XLA formulation materializes the [.., 17, R] s32 diagonal intermediate
in HBM (~68 B per output element written + read back per level — the
dominant traffic term). This kernel keeps the whole chain in VMEM per tile:

    load x tile [K, Gc] (u32 lo/hi)
      -> balanced 9x s8 limb split            (VPU)
      -> ONE banded matmul [9K, Gc]^T x [9K, 17*Rc]   (MXU)
      -> biased diagonal recombine mod p      (VPU, registers/VMEM)
      -> store GF tile [Gc, Rc]

Grid: (G tiles, R tiles); the R axis streams band slices so the 10 MB
radix-256 banded matrix never has to sit in VMEM whole; the x tile is
reused across the inner R steps.

Used by ntt_mxu._stage_matmul on the TPU backend (kill switch:
PLONKY2_TPU_NO_PALLAS_NTT=1); bit-exactness is pinned by
tests/test_ntt_mxu.py (interpret mode) and scripts/tpu_ntt_bench.py on
chip.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..field.goldilocks import GF, _reduce128, sub as gf_sub, u32
from ..utils.devcache import dev_const

NUM_LIMBS = 9
NUM_DIAGS = 17
BIAS = 1 << 26


def _kernel(lo_ref, hi_ref, band_ref, out_lo_ref, out_hi_ref, *, bias_total):
    """lo/hi [K, Gc]; band [9K, 17*Rc] s8; out [Gc, Rc]."""
    K, Gc = lo_ref.shape
    Rc = out_lo_ref.shape[-1]
    lo = lo_ref[...]
    hi = hi_ref[...]
    # balanced limb split (borrow-propagated, 9th limb = carry)
    planes = []
    carry = jnp.zeros_like(lo)
    for i in range(8):
        src = lo if i < 4 else hi
        d = ((src >> np.uint32(8 * (i % 4))) & np.uint32(0xFF)) + carry
        ge = d >= 128
        planes.append((d.astype(jnp.int32) - jnp.where(ge, 256, 0))
                      .astype(jnp.int8))
        carry = ge.astype(u32)
    planes.append(carry.astype(jnp.int8))
    a = jnp.concatenate(planes, axis=0)            # [9K, Gc]
    S = jax.lax.dot_general(
        a, band_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                              # [Gc, 17*Rc]
    # biased recombine: words W0..W4 of sum_d (S_d + 2^26) 2^(8d)
    words = [jnp.zeros((Gc, Rc), u32) for _ in range(5)]

    def addto(idx, val):
        s = words[idx] + val
        c = (s < val).astype(u32)
        words[idx] = s
        i = idx + 1
        while i < 5:
            s2 = words[i] + c
            c = (s2 < c).astype(u32)
            words[i] = s2
            i += 1

    for d in range(NUM_DIAGS):
        v = (S[:, d * Rc:(d + 1) * Rc] + np.int32(BIAS)).astype(u32)
        w, sh = divmod(8 * d, 32)
        addto(w, (v << sh) if sh else v)
        if sh:
            addto(w + 1, v >> (32 - sh))
    lo_o, hi_o = _reduce128(words[3], words[2], words[1], words[0])
    lo_o, hi_o = gf_sub(lo_o, hi_o, jnp.zeros_like(words[4]), words[4])
    bl = np.uint32(bias_total & 0xFFFFFFFF)
    bh = np.uint32(bias_total >> 32)
    lo_o, hi_o = gf_sub(lo_o, hi_o, jnp.full_like(lo_o, bl),
                        jnp.full_like(hi_o, bh))
    out_lo_ref[...] = lo_o
    out_hi_ref[...] = hi_o


@functools.lru_cache(maxsize=None)
def _level_fn(K: int, G: int, R: int, gc: int, rc: int, bias_total: int,
              interpret: bool):
    from jax.experimental import pallas as pl

    grid = (G // gc, R // rc)
    in_spec = pl.BlockSpec((K, gc), lambda g, r: (0, g))
    band_spec = pl.BlockSpec((NUM_LIMBS * K, NUM_DIAGS * rc),
                             lambda g, r: (0, r))
    out_spec = pl.BlockSpec((gc, rc), lambda g, r: (g, r))

    def run(lo, hi, band2d):
        kern = functools.partial(_kernel, bias_total=bias_total)
        olo, ohi = pl.pallas_call(
            kern, grid=grid,
            in_specs=[in_spec, in_spec, band_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((G, R), jnp.uint32)] * 2,
            interpret=interpret,
        )(lo, hi, band2d)
        return olo, ohi

    return run if interpret else jax.jit(run)


_BAND_CACHE: dict = {}


def _prepare_band(band_np: np.ndarray, rc: int) -> np.ndarray:
    """[9, K, 17, R] s8 -> [9K, 17R] laid out so the r-th grid step's
    columns [r*17*rc : (r+1)*17*rc] hold diagonals d=0..16 of outputs
    [r*rc : (r+1)*rc]: band2d[i*K+k, (rblk*17 + d)*rc + rr]."""
    key = (id(band_np), rc)
    hit = _BAND_CACHE.get(key)
    if hit is not None:
        return hit
    L, K, D, R = band_np.shape
    nr = R // rc
    b = band_np.reshape(L, K, D, nr, rc)           # [9,K,17,nr,rc]
    b = np.transpose(b, (0, 1, 3, 2, 4))           # [9,K,nr,17,rc]
    out = np.ascontiguousarray(b.reshape(L * K, nr * D * rc))
    _BAND_CACHE[key] = out
    return out


def use_pallas() -> bool:
    return (jax.default_backend() == "tpu"
            and not os.environ.get("PLONKY2_TPU_NO_PALLAS_NTT"))


def stage_matmul_pallas(x3: GF, band_np: np.ndarray, bias_total: int,
                        gc: int = 256, interpret: bool = False) -> GF:
    """x3 [F, K, G] -> GF [F, G, R] via the fused kernel. F is folded into
    the G grid axis (the kernel is agnostic to which free index a column
    is). Falls back to caller's XLA path when shapes don't tile."""
    F, K, G = x3.shape
    R = band_np.shape[-1]
    # R < 128 makes rc < 128, so the [Gc, 17*rc] dot output's minor axis is
    # not lane-aligned — Mosaic MISCOMPILES that tiling (measured on chip,
    # round 5: coset_fft[2048] (R=64) returned 474/2048 wrong values, every
    # error a multiple of 2^16, while R=128/256 shapes were bit-exact; this
    # was the root cause of the r4 recursion-chain "final polynomial
    # evaluation invalid"). Fall back to the XLA MXU path — bit-exact at all
    # shapes and faster than the kernel at these small sizes anyway.
    if R % 128:
        return None
    rc = 128
    FG = F * G
    gc = min(gc, FG)
    if FG % gc:
        return None
    # kernel wants columns = free index: [K, F*G]
    lo = x3.lo.transpose(1, 0, 2).reshape(K, FG)
    hi = x3.hi.transpose(1, 0, 2).reshape(K, FG)
    band2d = dev_const(_prepare_band(band_np, rc))
    olo, ohi = _level_fn(K, FG, R, gc, rc, bias_total, interpret)(
        lo, hi, band2d)
    return GF(olo.reshape(F, G, R), ohi.reshape(F, G, R))
