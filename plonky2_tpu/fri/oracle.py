"""PolynomialBatch — the central FRI commitment object.

Matches the reference semantics (reference: plonky2/src/fri/oracle.rs —
from_values:62 IFFT per column; from_coeffs_cpu:134 LDE + transpose +
bit-reverse rows + Merkle; get_lde_values:474; prove_openings:508 with the okx
final-poly-times-X tweak at :547).

TPU-native design: the whole commit pipeline (batched iNTT -> batched
coset-LDE -> transpose -> bit-reversed leaf gather -> layered Poseidon Merkle)
is ONE jitted device program per shape — this is the equivalent of the
reference's fused CUDA path (lde_batch + transpose_rev_batch +
new_from_gpu_leaves, oracle.rs:235-335).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..field import reference as ref
from ..field.goldilocks import GF
from ..field.extension import GF2, gf2_powers
from ..hash.merkle import MerkleTree, build_layers
from ..iop.challenger import Challenger
from ..ops import ntt
from ..ops.polynomial import (
    divide_by_linear, mul_poly_by_x, reduce_polys_base,
)
from ..utils.bits import log2_strict, reverse_bits, reverse_index_bits_perm
from .config import FriParams
from .prover import fri_proof
from .structure import FriInstanceInfo

SALT_SIZE = 4


@lru_cache(maxsize=None)
def _commit_fn(num_polys: int, lg_n: int, rate_bits: int, cap_height: int,
               salt_size: int, hasher_name: str = "poseidon"):
    """Commit pipeline: coeffs [num, n] (+ salt [salt, N]) ->
    (leaves [N, num+salt], merkle layers). The jitted device program covers
    LDE + transpose + bit-reverse + the LEAF hash (in lanes layout, absorb
    loop under scan); the compress levels dispatch as per-size cached
    programs shared across every tree shape (hash/merkle.build_tree_layers)
    — one monolithic per-shape tree program took minutes of XLA compile and
    blew the round-3 bench caps. For host-only hashers the device program
    stops at the leaves and Merkle layers build on host."""
    from ..hash.hashers import HASHERS_BY_NAME
    from ..hash.merkle import build_tree_layers, host_layers_preferred
    hasher = HASHERS_BY_NAME[hasher_name]
    n = 1 << lg_n
    N = n << rate_bits
    rev = jnp.asarray(reverse_index_bits_perm(N))
    # on CPU hosts the native C batch hashers beat executing the XLA tree
    # program by orders of magnitude; stop the device program at the leaves
    host_layers = not hasher.device or host_layers_preferred()
    lanes = getattr(hasher, "hash_or_noop_lanes", None) is not None

    def commit(coeffs: GF, salt: GF):
        lde = ntt.coset_lde(coeffs, rate_bits)       # [num, N]
        if salt_size:
            lde = GF.concatenate([lde, salt], axis=0)
        leaves = lde.transpose(1, 0)                 # [N, num+salt]
        leaves = leaves.take(rev, axis=0)            # bit-reversed row order
        if host_layers:
            return leaves, None
        # leaf digests straight off the lanes-layout LDE: hash first, then
        # bit-reverse the [4, N] digest lanes (4 rows vs num_polys rows)
        if jax.default_backend() == "tpu" and lanes:
            dig = hasher.hash_or_noop_lanes(lde)     # [4, N]
            leaf_layer = dig.take(rev, axis=-1).transpose(1, 0)
        else:
            leaf_layer = hasher.hash_or_noop_dev(leaves)
        return leaves, leaf_layer

    jfn = jax.jit(commit)

    def run(coeffs: GF, salt: GF):
        leaves, leaf_layer = jfn(coeffs, salt)
        if leaf_layer is None:
            return leaves, None
        layers = build_tree_layers(leaves, cap_height, hasher,
                                   leaf_layer=leaf_layer)
        return leaves, layers

    return run


@lru_cache(maxsize=None)
def _ifft_fn(num_polys: int, lg_n: int):
    return jax.jit(ntt.ifft)


class PolynomialBatch:
    """polynomials: GF [num_polys, 2^degree_log] coefficient rows."""

    def __init__(self, polynomials: GF, merkle_tree: MerkleTree,
                 degree_log: int, rate_bits: int, blinding: bool):
        self.polynomials = polynomials
        self.merkle_tree = merkle_tree
        self.degree_log = degree_log
        self.rate_bits = rate_bits
        self.blinding = blinding

    @staticmethod
    def _sharded(x: GF, rate_bits: int, blinding: bool, cap_height: int,
                 hasher, from_values: bool):
        """Multi-chip commit when a `parallel.sharding.prover_mesh` context
        is active; None -> caller uses the single-device path."""
        from ..hash.hashers import POSEIDON
        h = hasher or POSEIDON
        if blinding or not h.device:
            return None
        from ..parallel import sharding as shard
        mesh = shard.current_prover_mesh()
        if mesh is None:
            return None
        coeffs, leaves, layers = shard.commit_values_sharded(
            mesh, x, rate_bits, cap_height, from_values, h)
        tree = MerkleTree(leaves, cap_height, layers=layers, hasher=h)
        return PolynomialBatch(coeffs, tree, log2_strict(x.shape[1]),
                               rate_bits, blinding)

    @staticmethod
    def from_values(values: GF, rate_bits: int, blinding: bool,
                    cap_height: int, hasher=None) -> "PolynomialBatch":
        num, n = values.shape
        sharded = PolynomialBatch._sharded(values, rate_bits, blinding,
                                           cap_height, hasher, True)
        if sharded is not None:
            return sharded
        coeffs = _ifft_fn(num, log2_strict(n))(values)
        return PolynomialBatch.from_coeffs(coeffs, rate_bits, blinding,
                                           cap_height, hasher)

    @staticmethod
    def from_coeffs(coeffs: GF, rate_bits: int, blinding: bool,
                    cap_height: int, hasher=None) -> "PolynomialBatch":
        from ..hash.hashers import POSEIDON
        sharded = PolynomialBatch._sharded(coeffs, rate_bits, blinding,
                                           cap_height, hasher, False)
        if sharded is not None:
            return sharded
        hasher = hasher or POSEIDON
        num, n = coeffs.shape
        lg_n = log2_strict(n)
        salt_size = SALT_SIZE if blinding else 0
        if salt_size:
            rng = np.random.default_rng()
            salt_np = rng.integers(0, ref.ORDER, size=(salt_size, n << rate_bits),
                                   dtype=np.uint64)
            salt = GF.from_u64(salt_np)
        else:
            salt = GF.zeros((0, n << rate_bits))
        leaves, layers = _commit_fn(num, lg_n, rate_bits, cap_height,
                                    salt_size, hasher.name)(coeffs, salt)
        tree = MerkleTree(leaves, cap_height, layers=layers, hasher=hasher)
        return PolynomialBatch(coeffs, tree, lg_n, rate_bits, blinding)

    @property
    def lde_bits(self) -> int:
        return self.degree_log + self.rate_bits

    def get_lde_values(self, index: int, step: int = 1) -> np.ndarray:
        """Row of LDE values at point index*step (host, salt stripped)."""
        idx = reverse_bits(index * step, self.lde_bits)
        row = self.merkle_tree.leaves_host()[idx]
        salt = SALT_SIZE if self.blinding else 0
        return row[:len(row) - salt] if salt else row

    def get_lde_values_batch(self, indices: np.ndarray, step: int = 1):
        """[k, num_polys] rows for many indices (host)."""
        lg = self.lde_bits
        idxs = np.array([reverse_bits(int(i) * step, lg) for i in indices])
        rows = self.merkle_tree.leaves_host()[idxs]
        salt = SALT_SIZE if self.blinding else 0
        return rows[:, :rows.shape[1] - salt] if salt else rows

    # -----------------------------------------------------------------------
    @staticmethod
    def prove_openings(instance: FriInstanceInfo, oracles: list,
                       challenger: Challenger,
                       fri_params: FriParams) -> "FriProof":
        alpha = challenger.get_extension_challenge()
        galpha = GF2.const(*alpha)

        n = oracles[0].polynomials.shape[-1]
        final = GF2.zeros((n,))
        for batch in instance.batches:
            polys = _gather_batch_polys(oracles, batch.polynomials)
            assert polys.shape[-1] == n
            count = len(batch.polynomials)
            comp = _reduce_fn(count, n)(polys, galpha)       # GF2 [n]
            quotient = _quotient_stages(n, GF2.const(*batch.point), comp)
            final = _acc_fn(count, n)(final, galpha, quotient)

        # okx circom tweak: multiply by X (top coefficient is provably zero)
        rate_bits = fri_params.config.rate_bits
        lde_coeffs, lde_values = _final_lde_fn(n, rate_bits)(final)

        return fri_proof([o.merkle_tree for o in oracles], lde_coeffs,
                         lde_values, challenger, fri_params)


@lru_cache(maxsize=None)
def _reduce_fn(num_polys: int, n: int):
    return jax.jit(reduce_polys_base)


@lru_cache(maxsize=None)
def _quotient_prep_fn(n: int):
    def f(comp: GF2, z: GF2):
        zinv = z.inverse()
        zinv_pow = gf2_powers(zinv, n) * zinv.broadcast_to((n,))
        w = comp * gf2_powers(z, n)
        return w, zinv_pow
    return jax.jit(f)


@lru_cache(maxsize=None)
def _suffix_fn(n: int):
    from ..ops.polynomial import _suffix_scan_add
    return jax.jit(_suffix_scan_add)


@lru_cache(maxsize=None)
def _q_fn(n: int):
    def f(s: GF2, zinv_pow: GF2):
        s_shift = GF2.concatenate([s[1:], GF2.zeros((1,))], axis=-1)
        return s_shift * zinv_pow
    return jax.jit(f)


def _quotient_stages(n: int, z: GF2, comp: GF2) -> GF2:
    """divide_by_linear as isolated jit stages (the fused suffix-scan +
    multiply-chain program hits a pathological XLA:CPU compile; the prep,
    suffix-scan and final multiply stages each compile in seconds)."""
    w, zinv_pow = _quotient_prep_fn(n)(comp, z)
    s = _suffix_fn(n)(w)
    return _q_fn(n)(s, zinv_pow)


@lru_cache(maxsize=None)
def _acc_fn(count: int, n: int):
    def f(final: GF2, alpha: GF2, quotient: GF2):
        shift = alpha.exp(count)
        return final * shift.broadcast_to((n,)) + quotient
    return jax.jit(f)


@lru_cache(maxsize=None)
def _final_lde_fn(n: int, rate_bits: int):
    def f(final: GF2):
        shifted = mul_poly_by_x(final)[:n]
        lde_coeffs = GF2(_pad_poly(shifted.c0, rate_bits),
                         _pad_poly(shifted.c1, rate_bits))
        lde_values = GF2(ntt.coset_lde(shifted.c0, rate_bits),
                         ntt.coset_lde(shifted.c1, rate_bits))
        return lde_coeffs, lde_values
    return jax.jit(f)


def _pad_poly(c: GF, rate_bits: int) -> GF:
    n = c.shape[-1]
    return GF.concatenate([c, GF.zeros((n * ((1 << rate_bits) - 1),))], axis=-1)


def _gather_batch_polys(oracles, polynomials) -> GF:
    """Stack the referenced polynomial rows in batch order, grouping
    consecutive runs from the same oracle into single slices."""
    parts = []
    i = 0
    k = len(polynomials)
    while i < k:
        oi = polynomials[i].oracle_index
        start = polynomials[i].polynomial_index
        j = i
        while (j + 1 < k and polynomials[j + 1].oracle_index == oi
               and polynomials[j + 1].polynomial_index
               == polynomials[j].polynomial_index + 1):
            j += 1
        parts.append(oracles[oi].polynomials[start:start + (j - i + 1)])
        i = j + 1
    return parts[0] if len(parts) == 1 else GF.concatenate(parts, axis=0)
