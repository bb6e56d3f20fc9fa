"""Pallas TPU kernel for the Poseidon permutation (lanes layout).

The hand-kernel analog of the reference's AVX2/BMI2 + NEON permutations
(plonky2/src/hash/arch/x86_64/poseidon_goldilocks_avx2_bmi2.rs, aarch64/
poseidon_goldilocks_neon.rs): the [12, TILE] state tile lives in VMEM for
ALL 30 rounds — the XLA lax.scan formulation round-trips the carry through
HBM every round, and Poseidon/Merkle is ~87% of commit time, so keeping the
state on-chip is the single biggest single-chip lever (VERDICT r1 item 3).

Kernel body = the same algebra as hash/poseidon.py (u16-limb MDS circulant,
fast-partial-round factorization), fully unrolled: Pallas compiles each tile
program once; jnp ops inside the kernel lower to VPU vector ops.

Batch B is tiled along the lane axis; B must be a multiple of 128 for the
kernel path (callers in the Merkle/commit pipeline always are — power-of-two
leaf counts), everything else falls back to the scan path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..field.goldilocks import GF

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


def permute_lanes_pallas(st: GF, tile: int | None = None,
                         interpret: bool = False) -> GF:
    """st [12, B] -> [12, B]; B % 128 == 0."""
    B = st.shape[-1]
    t = tile or min(TILE, B)
    while B % t:
        t //= 2
    lo, hi = _permute_fn(B, t, interpret)(st.lo, st.hi)
    return GF(lo, hi)
