"""Four-step (Bailey) NTT sharded across a device mesh — the sequence-parallel
axis of this framework: ONE polynomial larger than a chip's HBM spans the
mesh, with the inter-stage "transpose" riding ICI as all_to_all.

Reference anchors: the reference's cache-friendly FFT prototype
(projects/cache-friendly-fft/transpose.py:4-30) and its multi-GPU batched LDE
(fri/oracle.rs:288-301) — neither can split a single polynomial across
devices; this module is the TPU-native design that does.

Math: N = N1*N2, j = j1*N2 + j2, k = k2*N1 + k1, w = w_N. Then

  X[k2*N1 + k1] = sum_{j2} w_{N2}^{j2 k2} * ( w_N^{j2 k1}
                  * sum_{j1} x[j1*N2 + j2] * w_{N1}^{j1 k1} )

Four steps over the [N2, N1] matrix M[j2][k? ] with M[j2][j1] = x[j1*N2+j2]
(each device owns a contiguous block of j2 rows):
  1. local N1-point NTT along each row         (batched, zero comms)
  2. multiply by twiddles w_N^{j2*k1}          (elementwise, zero comms)
  3. all_to_all: reshard rows j2 -> columns k1 (the distributed transpose)
  4. local N2-point NTT along each j2-column   (batched, zero comms)
plus a final all_to_all transpose back to natural output order.

The twiddle matrix w_N^{j2*k1} (N elements — too large to bake) factors as
U[j2_hi][k1] * V[j2_lo][k1] with j2 = j2_hi*2^h + j2_lo, so only two
O(sqrt(N2) * N1) tables ship as jit constants.

LDE composes for free: zero-padded input means only the first n/N2 = N1/rate
entries of each step-1 row are nonzero, so step 1 is `lde_fft` with its
rate_bits stage skip (reference fft.rs:223-229).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import reference as ref
from ..field.goldilocks import GF, gf_powers
from ..ops import ntt
from ..utils.bits import log2_strict


@lru_cache(maxsize=None)
def _twiddle_factor_tables(lg_n: int, lg_n1: int, lg_n2: int):
    """U [2^(lg_n2-h), N1], V [2^h, N1] host limb arrays with
    w_N^{j2*k1} = U[j2 >> h][k1] * V[j2 & (2^h-1)][k1], h = lg_n2//2."""
    n1 = 1 << lg_n1
    h = lg_n2 // 2
    w = ref.primitive_root_of_unity(lg_n)

    def rows(base_exp: int, count: int):
        from ..field.goldilocks import powers_np
        los, his = [], []
        for a in range(count):
            base = ref.exp(w, base_exp * a)
            tw = powers_np(base, n1)
            los.append((tw & np.uint64(0xFFFFFFFF)).astype(np.uint32))
            his.append((tw >> np.uint64(32)).astype(np.uint32))
        return np.stack(los), np.stack(his)

    u = rows(1 << h, 1 << (lg_n2 - h))   # U[a] = powers of w^(2^h * a)
    v = rows(1, 1 << h)                  # V[b] = powers of w^b
    return u, v, h


def _apply_middle_twiddles(y: GF, lg_n: int, lg_n1: int, lg_n2: int,
                           row_offset) -> GF:
    """y: [rows_local, N1] block starting at global row `row_offset`
    (a traced scalar); multiply elementwise by w_N^{(row_offset+r)*k1}."""
    (u_lo, u_hi), (v_lo, v_hi), h = _twiddle_factor_tables(
        lg_n, lg_n1, lg_n2)
    rows_local, n1 = y.shape
    r = jax.lax.broadcasted_iota(jnp.uint32, (rows_local, 1), 0)
    j2 = r + jnp.uint32(row_offset)
    hi_idx = (j2 >> h).astype(jnp.int32)
    lo_idx = (j2 & ((1 << h) - 1)).astype(jnp.int32)
    U = GF(jnp.asarray(u_lo), jnp.asarray(u_hi))
    V = GF(jnp.asarray(v_lo), jnp.asarray(v_hi))
    tu = GF(jnp.take(U.lo, hi_idx[:, 0], axis=0),
            jnp.take(U.hi, hi_idx[:, 0], axis=0))      # [rows, N1]
    tv = GF(jnp.take(V.lo, lo_idx[:, 0], axis=0),
            jnp.take(V.hi, lo_idx[:, 0], axis=0))
    return y * tu * tv


def _four_step_local(m: GF, lg_n: int, lg_n1: int, lg_n2: int,
                     axis: str, rate_bits: int, shift: int | None):
    """shard_map body. m: local block [N2/D, n_cols] of the input matrix,
    where n_cols = N1 (rate_bits=0) or N1/2^rate_bits (LDE: step 1 runs the
    zero-stage-skip lde_fft to width N1). Returns the local block
    [N/D] of the natural-order output vector."""
    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    n1 = 1 << lg_n1
    n2 = 1 << lg_n2
    rows_local = n2 // d

    # step 0 (coset): scale x[j] by shift^j, j = j1*N2 + j2 global.
    # column j1 factor: (shift^{N2})^{j1}; row j2 factor: shift^{j2}.
    if shift is not None:
        n_cols = m.shape[-1]
        col_pows = ntt._shift_powers(ref.exp(shift, n2), n_cols)  # [n_cols]
        row_base = ntt._shift_powers(shift, n2)                   # [N2]
        r = jax.lax.broadcasted_iota(jnp.int32, (rows_local,), 0) \
            + jnp.int32(idx * rows_local)
        row_pows = GF(jnp.take(row_base.lo, r), jnp.take(row_base.hi, r))
        m = m * col_pows.reshape(1, n_cols).broadcast_to(m.shape)
        m = m * row_pows.reshape(rows_local, 1).broadcast_to(m.shape)

    # step 1: local N1-point NTT per row (LDE stage-skip if rate_bits > 0)
    y = ntt.lde_fft(m, rate_bits) if rate_bits else ntt.fft(m)  # [rows, N1]

    # step 2: middle twiddles w_N^{j2*k1}
    y = _apply_middle_twiddles(y, lg_n, lg_n1, lg_n2, idx * rows_local)

    # step 3: distributed transpose (rows j2 -> columns k1 sharded)
    # local [rows, N1] -> split k1 into D chunks -> all_to_all -> [N2, N1/D]
    y3 = y.reshape(rows_local, d, n1 // d)
    lo = jax.lax.all_to_all(y3.lo, axis, split_axis=1, concat_axis=0,
                            tiled=False)
    hi = jax.lax.all_to_all(y3.hi, axis, split_axis=1, concat_axis=0,
                            tiled=False)
    # shape [D, rows_local, N1/D] -> [N2, N1/D]
    z = GF(lo.reshape(n2, n1 // d), hi.reshape(n2, n1 // d))

    # step 4: local N2-point NTT along each k1 column
    zt = z.transpose(1, 0)                       # [N1/D, N2]
    zt = ntt.fft(zt)                             # Z[k1_local][k2]

    # output order: X[k2*N1 + k1] = Z[k1][k2]; the natural-order vector
    # viewed as an [N2, N1] matrix is exactly Z^T. all_to_all back:
    # local [N1/D, N2] -> split k2 into D chunks -> concat on k1 axis
    z4 = zt.reshape(n1 // d, d, n2 // d)
    lo = jax.lax.all_to_all(z4.lo, axis, split_axis=1, concat_axis=0,
                            tiled=False)
    hi = jax.lax.all_to_all(z4.hi, axis, split_axis=1, concat_axis=0,
                            tiled=False)
    xt = GF(lo.reshape(n1, n2 // d), hi.reshape(n1, n2 // d))
    out = xt.transpose(1, 0).reshape(rows_local * n1)   # [N/D] natural order
    return out


def _four_step_local_batched(m: GF, lg_n: int, lg_n1: int, lg_n2: int,
                             axis: str, rate_bits: int, shift: int | None):
    """Batched shard_map body: m [b_local, N2/D, n_cols] — a block of
    polynomials (batch axis sharded on ANOTHER mesh axis) each spanning the
    `axis` devices. Same four steps as `_four_step_local` with a leading
    batch dim; the all_to_alls exchange only along `axis`, so batch
    parallelism and sequence parallelism compose without extra traffic."""
    d = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    n1 = 1 << lg_n1
    n2 = 1 << lg_n2
    rows_local = n2 // d
    b = m.shape[0]

    if shift is not None:
        n_cols = m.shape[-1]
        col_pows = ntt._shift_powers(ref.exp(shift, n2), n_cols)
        row_base = ntt._shift_powers(shift, n2)
        r = jax.lax.broadcasted_iota(jnp.int32, (rows_local,), 0) \
            + jnp.int32(idx * rows_local)
        row_pows = GF(jnp.take(row_base.lo, r), jnp.take(row_base.hi, r))
        m = m * col_pows.reshape(1, 1, n_cols).broadcast_to(m.shape)
        m = m * row_pows.reshape(1, rows_local, 1).broadcast_to(m.shape)

    y = ntt.lde_fft(m, rate_bits) if rate_bits else ntt.fft(m)

    # middle twiddles w_N^{j2*k1}, identical for every batch element
    (u_lo, u_hi), (v_lo, v_hi), h = _twiddle_factor_tables(
        lg_n, lg_n1, lg_n2)
    r = jax.lax.broadcasted_iota(jnp.uint32, (rows_local,), 0) \
        + jnp.uint32(idx * rows_local)
    hi_idx = (r >> h).astype(jnp.int32)
    lo_idx = (r & ((1 << h) - 1)).astype(jnp.int32)
    tu = GF(jnp.take(jnp.asarray(u_lo), hi_idx, axis=0),
            jnp.take(jnp.asarray(u_hi), hi_idx, axis=0))    # [rows, N1]
    tv = GF(jnp.take(jnp.asarray(v_lo), lo_idx, axis=0),
            jnp.take(jnp.asarray(v_hi), lo_idx, axis=0))
    tw = (tu * tv).reshape(1, rows_local, n1)
    y = y * tw.broadcast_to(y.shape)

    y3 = y.reshape(b, rows_local, d, n1 // d)
    lo = jax.lax.all_to_all(y3.lo, axis, split_axis=2, concat_axis=1,
                            tiled=False)
    hi = jax.lax.all_to_all(y3.hi, axis, split_axis=2, concat_axis=1,
                            tiled=False)
    z = GF(lo.reshape(b, n2, n1 // d), hi.reshape(b, n2, n1 // d))

    zt = ntt.fft(z.transpose(0, 2, 1))                  # [b, N1/D, N2]

    z4 = zt.reshape(b, n1 // d, d, n2 // d)
    lo = jax.lax.all_to_all(z4.lo, axis, split_axis=2, concat_axis=1,
                            tiled=False)
    hi = jax.lax.all_to_all(z4.hi, axis, split_axis=2, concat_axis=1,
                            tiled=False)
    xt = GF(lo.reshape(b, n1, n2 // d), hi.reshape(b, n1, n2 // d))
    return xt.transpose(0, 2, 1).reshape(b, rows_local * n1)


@lru_cache(maxsize=None)
def _lde_batch_2d_fn(lg_n: int, lg_n2: int, rate_bits: int,
                     shift: int | None, mesh_key):
    """Batch-of-polynomials coset LDE over a 2D mesh (batch_axis, seq_axis):
    each polynomial spans the seq axis via the four-step NTT while distinct
    polynomials ride the batch axis — the composed data-parallel ×
    sequence-parallel program. Input coeffs [B, n_in]; output [B, N]
    natural order, sharded (batch_axis, seq_axis)."""
    mesh = _MESHES[mesh_key]
    batch_axis, seq_axis = mesh.axis_names
    lg_n1 = lg_n - lg_n2
    n2 = 1 << lg_n2
    in_cols = 1 << (lg_n1 - rate_bits)

    body = partial(_four_step_local_batched, lg_n=lg_n, lg_n1=lg_n1,
                   lg_n2=lg_n2, axis=seq_axis, rate_bits=rate_bits,
                   shift=shift)

    @jax.jit
    def run(lo, hi):
        bsz = lo.shape[0]
        m = GF(lo, hi).reshape(bsz, in_cols, n2).transpose(0, 2, 1)
        f = jax.shard_map(lambda g: body(g),
                          mesh=mesh,
                          in_specs=P(batch_axis, seq_axis, None),
                          out_specs=P(batch_axis, seq_axis))
        out = f(m)
        return out.lo, out.hi

    return run


def coset_lde_large_batch(coeffs: GF, mesh: Mesh, rate_bits: int,
                          shift: int = ref.MULTIPLICATIVE_GROUP_GENERATOR,
                          lg_n2: int | None = None) -> GF:
    """Composed 2D-parallel LDE: coeffs [B, n], mesh (batch_axis, seq_axis)
    of shape (C, S) with B % C == 0; each polynomial's transform spans the
    S sequence-parallel devices. Returns GF [B, N] in natural order."""
    bsz, n_in = coeffs.shape
    lg_in = log2_strict(n_in)
    lg_n = lg_in + rate_bits
    c, s = mesh.devices.shape
    assert bsz % c == 0, (bsz, c)
    if lg_n2 is None:
        lg_n2 = max((lg_n + 1) // 2, (s - 1).bit_length() + 1
                    if s > 1 else 1)
    assert (1 << lg_n2) % s == 0, "N2 must be divisible by the seq axis"
    assert lg_n2 < lg_n and lg_n - lg_n2 >= rate_bits
    fn = _lde_batch_2d_fn(lg_n, lg_n2, rate_bits, shift, _mesh_key(mesh))
    lo, hi = fn(coeffs.lo, coeffs.hi)
    return GF(lo, hi)


@lru_cache(maxsize=None)
def _fft_large_fn(lg_n: int, lg_n2: int, n_devices: int, rate_bits: int,
                  shift: int | None, mesh_key):
    mesh = _MESHES[mesh_key]
    lg_n1 = lg_n - lg_n2
    lg_in = lg_n - rate_bits
    n2 = 1 << lg_n2
    in_cols = 1 << (lg_n1 - rate_bits)
    axis = mesh.axis_names[0]

    body = partial(_four_step_local, lg_n=lg_n, lg_n1=lg_n1, lg_n2=lg_n2,
                   axis=axis, rate_bits=rate_bits, shift=shift)

    @jax.jit
    def run(lo, hi):
        # input vector x [n_in] -> matrix M[j2][j1] = x[j1*N2 + j2]
        m = GF(lo, hi).reshape(in_cols, n2).transpose(1, 0)
        f = jax.shard_map(lambda g: body(g),
                          mesh=mesh,
                          in_specs=P(axis, None),
                          out_specs=P(axis))
        out = f(m)
        return out.lo, out.hi

    del lg_in
    return run


_MESHES: dict = {}


def _mesh_key(mesh: Mesh) -> tuple:
    key = (tuple(d.id for d in mesh.devices.flat), mesh.axis_names)
    _MESHES[key] = mesh
    return key


def fft_large(coeffs: GF, mesh: Mesh, lg_n2: int | None = None) -> GF:
    """Natural-order NTT of one length-N vector sharded over `mesh`.
    N = N1*N2; each device holds N2/D rows of the four-step matrix."""
    return _dispatch(coeffs, mesh, rate_bits=0, shift=None, lg_n2=lg_n2)


def coset_lde_large(coeffs: GF, mesh: Mesh, rate_bits: int,
                    shift: int = ref.MULTIPLICATIVE_GROUP_GENERATOR,
                    lg_n2: int | None = None) -> GF:
    """Distributed equivalent of ntt.coset_lde: one degree-<n polynomial,
    output on the 2^rate_bits-times larger coset, natural order, sharded."""
    return _dispatch(coeffs, mesh, rate_bits=rate_bits, shift=shift,
                     lg_n2=lg_n2)


def _dispatch(coeffs: GF, mesh: Mesh, rate_bits: int, shift: int | None,
              lg_n2: int | None) -> GF:
    (n_in,) = coeffs.shape
    lg_in = log2_strict(n_in)
    lg_n = lg_in + rate_bits
    d = mesh.devices.size
    if lg_n2 is None:
        # Split so both local NTTs stay balanced and N2 is divisible by D
        lg_n2 = max((lg_n + 1) // 2, (d - 1).bit_length() + 1
                    if d > 1 else 1)
    assert (1 << lg_n2) % d == 0, "N2 must be divisible by the mesh size"
    assert lg_n2 < lg_n, "need at least two columns"
    assert lg_n - lg_n2 >= rate_bits, "N1 must cover the blowup"
    fn = _fft_large_fn(lg_n, lg_n2, d, rate_bits, shift, _mesh_key(mesh))
    lo, hi = fn(coeffs.lo, coeffs.hi)
    return GF(lo, hi)
