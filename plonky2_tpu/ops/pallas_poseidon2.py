"""Pallas TPU kernels for the Poseidon2 permutation (lanes layout).

The device-kernel analog of the reference's AVX2 Poseidon2
(plonky2/src/hash/arch/x86_64/poseidon2_goldilocks_avx2.rs): the 12-plane
state lives in VMEM for all rounds. Mirrors ops/pallas_poseidon.py's v3
design — structure-of-arrays planes, rounds under fori_loop with the round
constants in SMEM, matrix constants baked as scalar immediates.

Poseidon2's layers are far cheaper than Poseidon's MDS: the external layer
is 4x4 block adds/doublings plus cross-block sums (zero general multiplies),
the internal layer is one diagonal multiply per plane plus a broadcast
total. Round schedule per hash/poseidon2.py: initial external layer, 4 full
rounds, 22 internal rounds, 4 full rounds (reference poseidon2.rs:448-476).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..field.goldilocks import GF, add
from .pallas_poseidon import (
    TILE_SOA, _addc, _mulc, _sbox7, should_use_pallas,
)

NUM_HASH_OUT_ELTS = 4
SPONGE_RATE = 8
SPONGE_WIDTH = 12


def _external_layer_planes(s: list) -> list:
    """External (full-round) matrix on 12 planes: three M4 blocks + the
    column-sum broadcast (reference apply_m_4:329-345 / external:348-392)."""
    blocks = []
    for b in (0, 4, 8):
        x0, x1, x2, x3 = s[b], s[b + 1], s[b + 2], s[b + 3]
        t0 = x0 + x1
        t1 = x2 + x3
        t2 = (x1 + x1) + t1
        t3 = (x3 + x3) + t0
        t4 = (t1 + t1) + (t1 + t1) + t3
        t5 = (t0 + t0) + (t0 + t0) + t2
        t6 = t3 + t5
        t7 = t2 + t4
        blocks.append([t6, t5, t7, t4])
    sums = [blocks[0][k] + blocks[1][k] + blocks[2][k] for k in range(4)]
    return [blocks[j][k] + sums[k] for j in range(3) for k in range(4)]


def _internal_layer_planes(s: list, diag: list) -> list:
    """Diagonal multiply + broadcast total (reference matmul_internal)."""
    total = s[0]
    for si in s[1:]:
        total = total + si
    return [_mulc(si, diag[i]) + total for i, si in enumerate(s)]


def _permute2_planes_looped(s: list, tables) -> list:
    """Poseidon2 on 12 planes; full/internal rounds under fori_loop, round
    constants read from SMEM tables, matrix constants as immediates."""
    from ..hash.poseidon2_constants import (
        MATRIX_DIAG_12, ROUNDS_F, ROUNDS_P,
    )
    rc_lo, rc_hi, prc_lo, prc_hi = tables
    half_f = ROUNDS_F // 2
    diag = [int(d) for d in MATRIX_DIAG_12]

    def pack(s):
        return tuple(si.lo for si in s) + tuple(si.hi for si in s)

    def unpack(c):
        return [GF(c[i], c[12 + i]) for i in range(12)]

    def full_body(r, carry):
        s = unpack(carry)
        s = [GF(*add(si.lo, si.hi, rc_lo[r, i], rc_hi[r, i]))
             for i, si in enumerate(s)]
        s = [_sbox7(si) for si in s]
        return pack(_external_layer_planes(s))

    def internal_body(pr, carry):
        s = unpack(carry)
        s0 = GF(*add(s[0].lo, s[0].hi, prc_lo[0, pr], prc_hi[0, pr]))
        s = [_sbox7(s0)] + s[1:]
        return pack(_internal_layer_planes(s, diag))

    s = _external_layer_planes(s)
    carry = jax.lax.fori_loop(0, half_f, full_body, pack(s))
    carry = jax.lax.fori_loop(0, ROUNDS_P, internal_body, carry)
    carry = jax.lax.fori_loop(half_f, ROUNDS_F, full_body, carry)
    return unpack(carry)


@functools.lru_cache(maxsize=1)
def _round_tables2_np():
    """rc [8, 12] full-round constants (rows half_f..ROUNDS_F follow the
    oracle's indexing RC12[half_f + ROUNDS_P + r]) and prc [1, 22] internal
    constants, as u32 lo/hi pairs."""
    from ..hash.poseidon2_constants import RC12, ROUNDS_F, ROUNDS_P

    def split(arr):
        a = np.asarray(arr, dtype=np.uint64)
        return ((a & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (a >> np.uint64(32)).astype(np.uint32))

    half_f = ROUNDS_F // 2
    rc = np.asarray(
        [RC12[r] for r in range(half_f)]
        + [RC12[half_f + ROUNDS_P + r] for r in range(half_f)],
        dtype=np.uint64)                                   # [ROUNDS_F, 12]
    prc = np.asarray([RC12[half_f + r][0] for r in range(ROUNDS_P)],
                     dtype=np.uint64).reshape(1, -1)       # [1, ROUNDS_P]
    out = []
    out.extend(split(rc))
    out.extend(split(prc))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _permute2_fn_soa(batch: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t8 = tile // 8
    b8 = batch // 8
    grid = (b8 // t8,)
    spec = pl.BlockSpec((12, 8, t8), lambda g: (0, 0, g))
    tables_np = _round_tables2_np()
    table_specs = [
        pl.BlockSpec(t.shape, (lambda g, nd=t.ndim: (0,) * nd),
                     memory_space=pltpu.SMEM)
        for t in tables_np
    ]
    out_shape = [jax.ShapeDtypeStruct((12, 8, b8), jnp.uint32)] * 2

    def kernel(lo_ref, hi_ref, *rest):
        table_refs, (out_lo_ref, out_hi_ref) = rest[:-2], rest[-2:]
        s = [GF(lo_ref[i], hi_ref[i]) for i in range(12)]
        s = _permute2_planes_looped(s, table_refs)
        for i in range(12):
            out_lo_ref[i] = s[i].lo
            out_hi_ref[i] = s[i].hi

    def run(lo, hi):
        olo, ohi = pl.pallas_call(
            kernel, grid=grid, in_specs=[spec, spec] + table_specs,
            out_specs=[spec, spec], out_shape=out_shape,
            interpret=interpret,
        )(lo.reshape(12, 8, b8), hi.reshape(12, 8, b8),
          *[jnp.asarray(t) for t in tables_np])
        return olo.reshape(12, batch), ohi.reshape(12, batch)

    return run if interpret else jax.jit(run)


@functools.lru_cache(maxsize=None)
def _leaf2_hash_fn_pallas(L: int, batch: int, tile: int, interpret: bool):
    """Fused leaf sponge: the state stays in VMEM across every absorb
    (mirrors pallas_poseidon._leaf_hash_fn_pallas)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t8 = tile // 8
    b8 = batch // 8
    grid = (b8 // t8,)
    in_spec = pl.BlockSpec((L, 8, t8), lambda g: (0, 0, g))
    out_spec = pl.BlockSpec((NUM_HASH_OUT_ELTS, 8, t8), lambda g: (0, 0, g))
    tables_np = _round_tables2_np()
    table_specs = [
        pl.BlockSpec(t.shape, (lambda g, nd=t.ndim: (0,) * nd),
                     memory_space=pltpu.SMEM)
        for t in tables_np
    ]
    out_shape = [jax.ShapeDtypeStruct((NUM_HASH_OUT_ELTS, 8, b8),
                                      jnp.uint32)] * 2
    n_full, rem = divmod(L, SPONGE_RATE)

    def kernel(lo_ref, hi_ref, *rest):
        table_refs, (out_lo_ref, out_hi_ref) = rest[:-2], rest[-2:]
        zero = jnp.zeros((8, t8), jnp.uint32)
        s = [GF(zero, zero) for _ in range(SPONGE_WIDTH)]
        for k in range(n_full):
            for i in range(SPONGE_RATE):
                s[i] = GF(lo_ref[k * SPONGE_RATE + i],
                          hi_ref[k * SPONGE_RATE + i])
            s = _permute2_planes_looped(s, table_refs)
        if rem:
            for i in range(rem):
                s[i] = GF(lo_ref[n_full * SPONGE_RATE + i],
                          hi_ref[n_full * SPONGE_RATE + i])
            s = _permute2_planes_looped(s, table_refs)
        for i in range(NUM_HASH_OUT_ELTS):
            out_lo_ref[i] = s[i].lo
            out_hi_ref[i] = s[i].hi

    def run(lo, hi):
        olo, ohi = pl.pallas_call(
            kernel, grid=grid, in_specs=[in_spec, in_spec] + table_specs,
            out_specs=[out_spec, out_spec], out_shape=out_shape,
            interpret=interpret,
        )(lo.reshape(L, 8, b8), hi.reshape(L, 8, b8),
          *[jnp.asarray(t) for t in tables_np])
        return (olo.reshape(NUM_HASH_OUT_ELTS, batch),
                ohi.reshape(NUM_HASH_OUT_ELTS, batch))

    return run if interpret else jax.jit(run)


def permute2_lanes_pallas(st: GF, tile: int | None = None,
                          interpret: bool = False) -> GF:
    """st [12, B] -> [12, B]; B % 512 == 0."""
    B = st.shape[-1]
    t = tile or min(TILE_SOA, B)
    while B % t:
        t //= 2
    lo, hi = _permute2_fn_soa(B, t, interpret)(st.lo, st.hi)
    return GF(lo, hi)


def hash2_leaves_lanes_pallas(inputs: GF, tile: int | None = None,
                              interpret: bool = False) -> GF:
    """inputs [L, B] lanes layout -> digests [4, B]; B % 512 == 0, L > 4."""
    L, B = inputs.shape
    t = tile or min(TILE_SOA, B)
    while B % t:
        t //= 2
    lo, hi = _leaf2_hash_fn_pallas(L, B, t, interpret)(inputs.lo, inputs.hi)
    return GF(lo, hi)


def should_use_pallas2(batch: int) -> bool:
    return (should_use_pallas(batch) and batch % 512 == 0
            and not os.environ.get("PLONKY2_TPU_NO_PALLAS2"))


def should_use_pallas2_leaf(L: int, batch: int) -> bool:
    return (should_use_pallas2(batch) and L > NUM_HASH_OUT_ELTS
            and not os.environ.get("PLONKY2_TPU_NO_PALLAS_LEAF"))
