"""Pallas TPU kernels for the Poseidon permutation (lanes layout).

The hand-kernel analog of the reference's AVX2/BMI2 + NEON permutations
(plonky2/src/hash/arch/x86_64/poseidon_goldilocks_avx2_bmi2.rs, aarch64/
poseidon_goldilocks_neon.rs): the state tile lives in VMEM for ALL 30
rounds — the XLA lax.scan formulation round-trips the carry through HBM
every round, and Poseidon/Merkle is ~87% of commit time.

Two kernel generations:

* v2 (default, `_kernel_soa`): STRUCTURE-OF-ARRAYS state — twelve separate
  [8, T] planes, each a perfectly-tiled VPU register block. The MDS
  circulant "rolls" become Python-level index renames (zero lane-crossing
  ops — the v1 kernel spent most of its time in jnp.roll relayouts on a
  [12, B] block whose 12-row tiles also wasted a third of every sublane
  group), every round constant is baked as a scalar immediate (no table
  operands), and the S-box uses the dedicated 3-multiply squaring.
* v1 (`_kernel`, PLONKY2_TPU_POSEIDON_V1=1): the round-2 [12, TILE]-block
  kernel, kept as a fallback/ablation.

Batch B is tiled along the lane axis; B must be a multiple of 512 for the
kernel path (callers in the Merkle/commit pipeline always are — power-of-two
leaf counts), everything else falls back to the scan path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..field.goldilocks import GF, add, mul, square, mul_small, u32, _reduce96

TILE = 512            # lanes per kernel program (VMEM use ~ a few hundred KB)
MIN_PALLAS_BATCH = 512


def should_use_pallas(batch: int) -> bool:
    if os.environ.get("PLONKY2_TPU_NO_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    return batch % 128 == 0 and batch >= MIN_PALLAS_BATCH


def _kernel(lo_ref, hi_ref,
            rc_lo, rc_hi, frc_lo, frc_hi, prc_lo, prc_hi,
            vs_lo, vs_hi, wh_lo, wh_hi, im_lo, im_hi,
            out_lo_ref, out_hi_ref):
    from ..hash.poseidon import permute_lanes_unrolled
    # 1-D tables travel as (1, n) blocks (TPU VMEM wants >=2D); restore
    tables = (GF(rc_lo[:], rc_hi[:]),
              GF(frc_lo[:].reshape(-1), frc_hi[:].reshape(-1)),
              GF(prc_lo[:].reshape(-1), prc_hi[:].reshape(-1)),
              GF(vs_lo[:], vs_hi[:]),
              GF(wh_lo[:], wh_hi[:]), GF(im_lo[:], im_hi[:]))
    st = permute_lanes_unrolled(GF(lo_ref[:], hi_ref[:]), tables)
    out_lo_ref[:] = st.lo
    out_hi_ref[:] = st.hi


def _tables_flat():
    from ..hash.poseidon import _fast_tables_gf, _round_constants
    rc = _round_constants()
    first_rc, partial_rc, vs, w_hats, init_mat = _fast_tables_gf()
    out = []
    for t in (rc, first_rc, partial_rc, vs, w_hats, init_mat):
        for a in (t.lo, t.hi):
            out.append(a.reshape(1, -1) if a.ndim == 1 else a)
    return out


@functools.lru_cache(maxsize=None)
def _permute_fn(batch: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl

    grid = (batch // tile,)
    spec = pl.BlockSpec((12, tile), lambda i: (0, i))
    out_shape = [jax.ShapeDtypeStruct((12, batch), jnp.uint32)] * 2

    def run(lo, hi):
        tables = _tables_flat()
        table_specs = [
            pl.BlockSpec(t.shape, (lambda i, nd=t.ndim: (0,) * nd))
            for t in tables
        ]
        return pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[spec, spec] + table_specs,
            out_specs=[spec, spec],
            out_shape=out_shape,
            interpret=interpret,
        )(lo, hi, *tables)

    # interpret mode (CPU validation) must NOT be jitted: XLA:CPU hangs
    # compiling the fully-unrolled 30-round graph (known pathology)
    return run if interpret else jax.jit(run)


# ---------------------------------------------------------------------------
# v2: structure-of-arrays kernel — 12 perfectly-tiled [8, T/8] planes,
# circulant rolls are Python index renames, constants are scalar immediates
# ---------------------------------------------------------------------------

TILE_SOA = 2048


def _c32(c: int):
    return np.uint32(c & 0xFFFFFFFF), np.uint32(c >> 32)


def _addc(x: GF, c: int) -> GF:
    if c == 0:
        return x
    cl, ch = _c32(c)
    return GF(*add(x.lo, x.hi, cl, ch))


def _mulc(x: GF, c: int) -> GF:
    if c == 1:
        return x
    if c < (1 << 32):
        return GF(*mul_small(int(c), x.lo, x.hi))
    cl, ch = _c32(c)
    return GF(*mul(x.lo, x.hi, cl, ch))


def _sbox7(x: GF) -> GF:
    """x^7 = (x^3)^2 * x: two dedicated squarings + two multiplies."""
    x2 = GF(*square(x.lo, x.hi))
    x3 = x2 * x
    x6 = GF(*square(x3.lo, x3.hi))
    return x6 * x


def _recomb16(a):
    """u16-limb accumulators (a0..a3, each < 2^26) -> 96-bit (w2, w1, w0)."""
    a0, a1, a2, a3 = a
    t0 = (a1 & 0xFFFF) << 16
    w0 = a0 + t0
    c0 = (w0 < a0).astype(u32)
    mid = (a1 >> 16) + a2 + c0
    t1 = (a3 & 0xFFFF) << 16
    w1 = mid + t1
    c1 = (w1 < mid).astype(u32)
    w2 = (a3 >> 16) + c1
    return w2, w1, w0


def _mds_soa(s: list) -> list:
    """MDS on a list of 12 per-element GF planes. No rolls: row r reads
    plane (r+i)%12 by name. The 6-bit circulant constants keep each u16-limb
    accumulator under 2^26 (12 * 41 * 0xFFFF + 8 * 0xFFFF)."""
    from ..hash.poseidon_constants import MDS_MATRIX_CIRC, MDS_MATRIX_DIAG
    limbs = [(si.lo & 0xFFFF, si.lo >> 16, si.hi & 0xFFFF, si.hi >> 16)
             for si in s]
    out = []
    for r in range(12):
        acc = [None] * 4
        for i in range(12):
            c = np.uint32(MDS_MATRIX_CIRC[i])
            L = limbs[(r + i) % 12]
            for k in range(4):
                t = c * L[k]
                acc[k] = t if acc[k] is None else acc[k] + t
        if MDS_MATRIX_DIAG[r]:
            d = np.uint32(MDS_MATRIX_DIAG[r])
            for k in range(4):
                acc[k] = acc[k] + d * limbs[r][k]
        out.append(GF(*_reduce96(*_recomb16(acc))))
    return out


def _permute_soa(s: list) -> list:
    """Fully-unrolled width-12 permutation on 12 separate planes; every
    constant is a compile-time scalar immediate (no table operands).
    Bit-identical schedule to hash/poseidon.permute_lanes_unrolled."""
    from ..hash.poseidon import MDS0TO0
    from ..hash.poseidon_constants import (
        ALL_ROUND_CONSTANTS, HALF_N_FULL_ROUNDS, N_PARTIAL_ROUNDS, N_ROUNDS,
    )
    from ..hash.poseidon_fast import fast_partial_tables

    first_rc, partial_rc, vs, w_hats, init_mat = fast_partial_tables()
    # the last partial round adds no constant (poseidon_fast:220-222)
    partial_rc = list(partial_rc)[:N_PARTIAL_ROUNDS - 1] + [0]

    def full_round(s, r):
        s = [_addc(si, ALL_ROUND_CONSTANTS[r * 12 + i])
             for i, si in enumerate(s)]
        s = [_sbox7(si) for si in s]
        return _mds_soa(s)

    for r in range(HALF_N_FULL_ROUNDS):
        s = full_round(s, r)

    # partial-rounds init: first constant layer + 11x11 init matrix
    s = [_addc(si, int(first_rc[i])) for i, si in enumerate(s)]
    rest = s[1:]
    new_rest = []
    for ci in range(11):
        acc = None
        for ri in range(11):
            t = _mulc(rest[ri], int(init_mat[ri][ci]))
            acc = t if acc is None else acc + t
        new_rest.append(acc)
    s = [s[0]] + new_rest

    for pr in range(N_PARTIAL_ROUNDS):
        s0 = _sbox7(s[0])
        s0 = _addc(s0, int(partial_rc[pr]))
        rest = s[1:]
        d = _mulc(s0, int(MDS0TO0))
        acc = None
        for i in range(11):
            t = _mulc(rest[i], int(w_hats[pr][i]))
            acc = t if acc is None else acc + t
        d = d + acc
        s = [d] + [rest[i] + _mulc(s0, int(vs[pr][i])) for i in range(11)]

    for r in range(N_ROUNDS - HALF_N_FULL_ROUNDS, N_ROUNDS):
        s = full_round(s, r)
    return s


# ---------------------------------------------------------------------------
# v3 (default): SoA kernel with ROUNDS UNDER fori_loop — round constants
# travel as small table operands instead of baked immediates. The fully
# unrolled v2 body is ~25k Mosaic ops and costs 1-3 MINUTES to compile per
# batch shape (measured r4; the Merkle tree instantiates ~12 shapes, which is
# exactly why round-3 bench steps blew their caps); the looped body is ~20x
# smaller and compiles in seconds, with identical per-permutation work.
# ---------------------------------------------------------------------------

def _full_round_soa_t(s: list, rc_lo, rc_hi, r) -> list:
    """One full round; constants read from [30, 12] SMEM tables at traced
    row r (scalar reads — SMEM is the TPU home for control-flow scalars)."""
    s = [GF(*add(si.lo, si.hi, rc_lo[r, i], rc_hi[r, i]))
         for i, si in enumerate(s)]
    s = [_sbox7(si) for si in s]
    return _mds_soa(s)


def _permute_soa_looped(s: list, tables) -> list:
    """Same schedule as _permute_soa but with the 8 full rounds and 22
    partial rounds under lax.fori_loop. The 11x11 init matrix (applied once)
    stays unrolled with immediates."""
    from ..hash.poseidon import MDS0TO0
    from ..hash.poseidon_constants import (
        HALF_N_FULL_ROUNDS, N_PARTIAL_ROUNDS, N_ROUNDS,
    )
    from ..hash.poseidon_fast import fast_partial_tables
    rc_lo, rc_hi, prc_lo, prc_hi, wh_lo, wh_hi, vs_lo, vs_hi = tables
    first_rc, _partial_rc, _vs, _w_hats, init_mat = fast_partial_tables()

    def pack(s):
        return tuple(si.lo for si in s) + tuple(si.hi for si in s)

    def unpack(c):
        return [GF(c[i], c[12 + i]) for i in range(12)]

    def full_body(r, carry):
        return pack(_full_round_soa_t(unpack(carry), rc_lo, rc_hi, r))

    carry = jax.lax.fori_loop(0, HALF_N_FULL_ROUNDS, full_body, pack(s))
    s = unpack(carry)

    # partial-rounds init: first constant layer + 11x11 init matrix (once)
    s = [_addc(si, int(first_rc[i])) for i, si in enumerate(s)]
    rest = s[1:]
    new_rest = []
    for ci in range(11):
        acc = None
        for ri in range(11):
            t = _mulc(rest[ri], int(init_mat[ri][ci]))
            acc = t if acc is None else acc + t
        new_rest.append(acc)
    s = [s[0]] + new_rest

    def partial_body(pr, carry):
        s = unpack(carry)
        s0 = _sbox7(s[0])
        s0 = GF(*add(s0.lo, s0.hi, prc_lo[0, pr], prc_hi[0, pr]))
        rest = s[1:]
        d = _mulc(s0, int(MDS0TO0))
        acc = None
        for i in range(11):
            t = GF(*mul(rest[i].lo, rest[i].hi, wh_lo[pr, i], wh_hi[pr, i]))
            acc = t if acc is None else acc + t
        d = d + acc
        out = [d] + [rest[i]
                     + GF(*mul(s0.lo, s0.hi, vs_lo[pr, i], vs_hi[pr, i]))
                     for i in range(11)]
        return pack(out)

    carry = jax.lax.fori_loop(0, N_PARTIAL_ROUNDS, partial_body, pack(s))
    s = unpack(carry)

    carry = jax.lax.fori_loop(N_ROUNDS - HALF_N_FULL_ROUNDS, N_ROUNDS,
                              full_body, pack(s))
    return unpack(carry)


@functools.lru_cache(maxsize=1)
def _round_tables_np():
    """Constant tables for the looped kernel as u32 numpy pairs:
    rc [30, 12], prc [1, 22] (2-D for TPU layout), w_hats/vs [22, 11]."""
    from ..hash.poseidon_constants import (
        ALL_ROUND_CONSTANTS, N_PARTIAL_ROUNDS, N_ROUNDS,
    )
    from ..hash.poseidon_fast import fast_partial_tables
    _first_rc, partial_rc, vs, w_hats, _init_mat = fast_partial_tables()
    partial_rc = list(partial_rc)[:N_PARTIAL_ROUNDS - 1] + [0]

    def split(arr2d):
        a = np.asarray(arr2d, dtype=np.uint64)
        return (a & np.uint64(0xFFFFFFFF)).astype(np.uint32), \
            (a >> np.uint64(32)).astype(np.uint32)

    rc = np.asarray(ALL_ROUND_CONSTANTS[:N_ROUNDS * 12],
                    dtype=np.uint64).reshape(N_ROUNDS, 12)
    out = []
    out.extend(split(rc))
    out.extend(split(np.asarray(partial_rc, dtype=np.uint64).reshape(1, -1)))
    out.extend(split(np.asarray(w_hats, dtype=np.uint64)))
    out.extend(split(np.asarray(vs, dtype=np.uint64)))
    return tuple(out)


@functools.lru_cache(maxsize=None)
def _permute_fn_soa_v3(batch: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t8 = tile // 8
    b8 = batch // 8
    grid = (b8 // t8,)
    spec = pl.BlockSpec((12, 8, t8), lambda g: (0, 0, g))
    tables_np = _round_tables_np()
    table_specs = [
        pl.BlockSpec(t.shape, (lambda g, nd=t.ndim: (0,) * nd),
                     memory_space=pltpu.SMEM)
        for t in tables_np
    ]
    out_shape = [jax.ShapeDtypeStruct((12, 8, b8), jnp.uint32)] * 2

    def kernel(lo_ref, hi_ref, *rest):
        table_refs, (out_lo_ref, out_hi_ref) = rest[:-2], rest[-2:]
        s = [GF(lo_ref[i], hi_ref[i]) for i in range(12)]
        s = _permute_soa_looped(s, table_refs)
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
def _permute_fn_soa(batch: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl

    t8 = tile // 8
    b8 = batch // 8
    grid = (b8 // t8,)
    spec = pl.BlockSpec((12, 8, t8), lambda g: (0, 0, g))
    out_shape = [jax.ShapeDtypeStruct((12, 8, b8), jnp.uint32)] * 2

    def kernel(lo_ref, hi_ref, out_lo_ref, out_hi_ref):
        s = [GF(lo_ref[i], hi_ref[i]) for i in range(12)]
        s = _permute_soa(s)
        for i in range(12):
            out_lo_ref[i] = s[i].lo
            out_hi_ref[i] = s[i].hi

    def run(lo, hi):
        olo, ohi = pl.pallas_call(
            kernel, grid=grid, in_specs=[spec, spec],
            out_specs=[spec, spec], out_shape=out_shape,
            interpret=interpret,
        )(lo.reshape(12, 8, b8), hi.reshape(12, 8, b8))
        return olo.reshape(12, batch), ohi.reshape(12, batch)

    # interpret mode (CPU validation) must NOT be jitted: XLA:CPU hangs
    # compiling the fully-unrolled 30-round graph (known pathology)
    return run if interpret else jax.jit(run)


# ---------------------------------------------------------------------------
# Fused leaf-hash kernel: the ENTIRE sponge absorb runs in VMEM. A 135-element
# leaf takes 17 permutations; as separate pallas calls the state round-trips
# HBM 17x (~3.3 KB/leaf of traffic vs ~1.1 KB of leaf data). This kernel
# reads the leaf block once, keeps the 12-plane state in VMEM across all
# absorb steps, and writes only the 4-plane digest.
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _leaf_hash_fn_pallas(L: int, batch: int, tile: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ..hash.poseidon import SPONGE_RATE, SPONGE_WIDTH, NUM_HASH_OUT_ELTS

    t8 = tile // 8
    b8 = batch // 8
    grid = (b8 // t8,)
    in_spec = pl.BlockSpec((L, 8, t8), lambda g: (0, 0, g))
    out_spec = pl.BlockSpec((NUM_HASH_OUT_ELTS, 8, t8), lambda g: (0, 0, g))
    tables_np = _round_tables_np()
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
            s = _permute_soa_looped(s, table_refs)
        if rem:
            for i in range(rem):
                s[i] = GF(lo_ref[n_full * SPONGE_RATE + i],
                          hi_ref[n_full * SPONGE_RATE + i])
            s = _permute_soa_looped(s, table_refs)
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


def hash_leaves_lanes_pallas(inputs: GF, tile: int | None = None,
                             interpret: bool = False) -> GF:
    """inputs [L, B] lanes layout -> digests [4, B]; B % 512 == 0, L > 4."""
    L, B = inputs.shape
    t = tile or min(TILE_SOA, B)
    while B % t:
        t //= 2
    lo, hi = _leaf_hash_fn_pallas(L, B, t, interpret)(inputs.lo, inputs.hi)
    return GF(lo, hi)


def should_use_pallas_leaf(L: int, batch: int) -> bool:
    from ..hash.poseidon import NUM_HASH_OUT_ELTS
    return should_use_pallas(batch) and batch % 512 == 0 \
        and L > NUM_HASH_OUT_ELTS \
        and not os.environ.get("PLONKY2_TPU_NO_PALLAS_LEAF")


def permute_lanes_pallas(st: GF, tile: int | None = None,
                         interpret: bool = False) -> GF:
    """st [12, B] -> [12, B]; B % 512 == 0 (SoA) / % 128 (v1)."""
    B = st.shape[-1]
    if not os.environ.get("PLONKY2_TPU_POSEIDON_V1") and B % 512 == 0:
        t = tile or min(TILE_SOA, B)
        while B % t:
            t //= 2
        fn = (_permute_fn_soa if os.environ.get("PLONKY2_TPU_POSEIDON_V2")
              else _permute_fn_soa_v3)
        lo, hi = fn(B, t, interpret)(st.lo, st.hi)
        return GF(lo, hi)
    t = tile or min(TILE, B)
    while B % t:
        t //= 2
    lo, hi = _permute_fn(B, t, interpret)(st.lo, st.hi)
    return GF(lo, hi)
