"""Pluggable hasher configurations (GenericConfig).

Reference: plonky2/src/plonk/config.rs:45-208 — the `Hasher` trait (Merkle
trees, challenger transcript) + `AlgebraicHasher` (in-circuit hashing), and
the four concrete configs:

  PoseidonGoldilocksConfig       Hasher=Poseidon      InnerHasher=Poseidon
  Poseidon2GoldilocksConfig      Hasher=Poseidon2     InnerHasher=Poseidon2
  KeccakGoldilocksConfig         Hasher=Keccak<25>    InnerHasher=Poseidon
  PoseidonBN128GoldilocksConfig  Hasher=PoseidonBN128 InnerHasher=PoseidonBN128
                                 (whose PI-hash/in-circuit ops delegate to
                                  Poseidon, poseidon_bn128.rs:162-197)

The challenger transcript uses Hasher's sponge permutation
(plonk/prover.rs:178 `Challenger::<F, C::Hasher>`); public inputs hash with
InnerHasher::hash_public_inputs (prover.rs:147); Merkle caps are observed as
the digest's field-element decomposition (`GenericHashOut::to_vec` —
HashOut = the 4 elements; BytesHash = 7-byte LE chunks, hash_types.rs:182-192).

TPU-native design: digests of algebraic hashers stay device-resident GF
arrays and the whole Merkle build fuses into the commit program; byte-digest
hashers (Keccak) run as vectorized numpy batches on host (they exist for
cheap *external* verification, never inside device recursion).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache
from typing import Callable

import numpy as np

from ..field import reference as ref
from . import keccak as kk
from . import poseidon as ps
from . import poseidon2 as ps2
from . import poseidon_bn128 as bn

# A host-side digest is either a tuple of 4 ints (HashOut) or bytes
# (BytesHash<N>); the python type tags the interpretation.
Digest = "tuple[int, ...] | bytes"


def digest_to_elements(d) -> list[int]:
    """GenericHashOut::to_vec (reference: hash_types.rs:109-117, :182-192)."""
    if isinstance(d, (bytes, bytearray)):
        return [int.from_bytes(d[i:i + 7], "little")
                for i in range(0, len(d), 7)]
    return [int(x) for x in d]


def digest_to_bytes(d) -> bytes:
    if isinstance(d, (bytes, bytearray)):
        return bytes(d)
    return b"".join(int(x).to_bytes(8, "little") for x in d)


class Hasher:
    """Host+device surface of one hash configuration. Concrete instances are
    singletons (POSEIDON, POSEIDON2, KECCAK, POSEIDON_BN128)."""

    name: str = ""
    hash_size: int = 32          # HASH_SIZE in bytes
    digest_width: int = 4        # last-dim of numpy digest arrays
    digest_dtype = np.uint64
    algebraic: bool = True       # digests are 4 field elements
    device: bool = False         # has traceable GF merkle-layer builder

    # ---- host oracle side -------------------------------------------------
    def permute_oracle(self, state: list[int]) -> list[int]:
        raise NotImplementedError

    def hash_no_pad_oracle(self, inputs: list[int]):
        raise NotImplementedError

    def hash_pad_oracle(self, inputs: list[int]):
        """pad10*1 then hash (reference: config.rs:62-71; RATE=8)."""
        padded = list(inputs) + [1]
        while (len(padded) + 1) % 8 != 0:
            padded.append(0)
        padded.append(1)
        return self.hash_no_pad_oracle(padded)

    def hash_or_noop_oracle(self, inputs: list[int]):
        """reference: config.rs:74-88 — pack as HASH_SIZE bytes if it fits."""
        if len(inputs) * 8 <= self.hash_size:
            raw = b"".join((int(x) % ref.ORDER).to_bytes(8, "little")
                           for x in inputs)
            return self.digest_from_bytes(
                raw + b"\x00" * (self.hash_size - len(raw)))
        return self.hash_no_pad_oracle(inputs)

    def two_to_one_oracle(self, left, right):
        raise NotImplementedError

    def digest_from_bytes(self, b: bytes):
        if self.algebraic:
            return tuple(int.from_bytes(b[8 * i:8 * i + 8], "little")
                         for i in range(4))
        return bytes(b)

    def digest_from_row(self, row: np.ndarray):
        """numpy layer row -> host digest."""
        if self.algebraic:
            return tuple(int(x) for x in row)
        return bytes(bytearray(row))

    # ---- batched host side (byte-digest hashers' Merkle path) --------------
    def hash_leaves_np(self, leaves_u64: np.ndarray) -> np.ndarray:
        """hash_or_noop over [n, L] u64 rows -> [n, digest_width] digests."""
        raise NotImplementedError

    def compress_np(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        """two_to_one over [m, digest_width] pairs."""
        raise NotImplementedError

    # ---- device side (algebraic hashers) ------------------------------------
    # hash_or_noop_dev / compress_dev / lanes variants set per subclass; the
    # merkle builder consumes them inside jit.


class PoseidonHasher(Hasher):
    name = "poseidon"
    algebraic = True
    device = True

    permute_oracle = staticmethod(ps.poseidon_oracle)
    hash_no_pad_oracle = staticmethod(
        lambda inputs: tuple(ps.hash_no_pad_oracle(list(inputs))))

    def two_to_one_oracle(self, left, right):
        return tuple(ps.compress_oracle(list(left), list(right)))

    # device fns
    hash_or_noop_dev = staticmethod(ps.hash_or_noop)
    compress_dev = staticmethod(ps.compress)
    hash_or_noop_lanes = staticmethod(ps.hash_or_noop_lanes)
    compress_lanes = staticmethod(ps.compress_lanes)
    permute_dev = staticmethod(ps.poseidon_permute)

    def hash_leaves_np(self, leaves_u64):
        from .. import native
        out = native.poseidon_hash_leaves(leaves_u64)
        if out is not None:
            return out
        return np.asarray([ps.hash_or_noop_oracle([int(x) for x in row])
                           for row in leaves_u64], dtype=np.uint64)

    def compress_np(self, left, right):
        from .. import native
        out = native.poseidon_compress_many(left, right)
        if out is not None:
            return out
        return np.asarray(
            [ps.compress_oracle([int(x) for x in l], [int(x) for x in r])
             for l, r in zip(left, right)], dtype=np.uint64)


class Poseidon2Hasher(Hasher):
    """okx Poseidon2 (reference: hash/poseidon2.rs:599-637). Same overwrite
    sponge shape as Poseidon; the in-circuit hooks are todo!() upstream, so
    this config proves/verifies natively but is not a recursion inner config."""
    name = "poseidon2"
    algebraic = True
    device = True

    permute_oracle = staticmethod(ps2.poseidon2_oracle)
    hash_no_pad_oracle = staticmethod(
        lambda inputs: tuple(ps2.hash_no_pad_oracle(list(inputs))))

    def two_to_one_oracle(self, left, right):
        return self.hash_no_pad_oracle(list(left) + list(right))

    @staticmethod
    def hash_or_noop_dev(leaves):
        from ..field.goldilocks import GF
        n, L = leaves.shape
        if L * 8 <= 32:
            pad = GF.zeros((n, 4 - L))
            return GF.concatenate([leaves, pad], axis=-1) if L < 4 else leaves
        return ps2.hash_no_pad(leaves)

    @staticmethod
    def compress_dev(x, y):
        from ..field.goldilocks import GF
        return ps2.hash_no_pad(GF.concatenate([x, y], axis=-1))

    hash_or_noop_lanes = staticmethod(ps2.hash_or_noop_lanes)
    compress_lanes = staticmethod(ps2.compress_lanes)
    permute_dev = staticmethod(ps2.poseidon2_permute)

    def hash_leaves_np(self, leaves_u64):
        return np.asarray([self.hash_or_noop_oracle([int(x) for x in row])
                           for row in leaves_u64], dtype=np.uint64)

    def compress_np(self, left, right):
        return np.asarray(
            [self.two_to_one_oracle([int(x) for x in l], [int(x) for x in r])
             for l, r in zip(left, right)], dtype=np.uint64)


# ---------------------------------------------------------------------------
# Vectorized numpy keccak (host batches: Merkle layers + PoW waves)
# ---------------------------------------------------------------------------

_KK_RC = np.asarray(kk._RC, dtype=np.uint64)
_KK_ROT = kk._ROT


def _rotl_np(x: np.ndarray, n: int) -> np.ndarray:
    if n == 0:
        return x
    return (x << np.uint64(n)) | (x >> np.uint64(64 - n))


def keccak_f_np(state: np.ndarray) -> np.ndarray:
    """keccak-f[1600] over a batch: state [n, 25] uint64 (lane order
    state[i] = A[i%5, i//5], matching the scalar _keccak_f)."""
    a = [[state[:, x + 5 * y] for y in range(5)] for x in range(5)]
    for rc in _KK_RC:
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl_np(c[(x + 1) % 5], 1) for x in range(5)]
        a = [[a[x][y] ^ d[x] for y in range(5)] for x in range(5)]
        b = [[None] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl_np(a[x][y], _KK_ROT[x][y])
        a = [[b[x][y] ^ (~b[(x + 1) % 5][y] & b[(x + 2) % 5][y])
              for y in range(5)] for x in range(5)]
        a[0][0] = a[0][0] ^ rc
    return np.stack([a[x][y] for y in range(5) for x in range(5)], axis=1)


def keccak256_np(data: np.ndarray) -> np.ndarray:
    """Batched keccak256: data [n, L] uint8 (same L for all rows) ->
    [n, 32] uint8."""
    n, L = data.shape
    rate = 136
    pad_len = rate - (L % rate)
    padded = np.zeros((n, L + pad_len), dtype=np.uint8)
    padded[:, :L] = data
    padded[:, L] = 0x01
    padded[:, -1] ^= 0x80
    state = np.zeros((n, 25), dtype=np.uint64)
    blocks = padded.shape[1] // rate
    lanes = padded.reshape(n, blocks, rate // 8, 8)
    for b in range(blocks):
        block_lanes = lanes[:, b].astype(np.uint64)
        words = np.zeros((n, rate // 8), dtype=np.uint64)
        for j in range(8):
            words |= block_lanes[:, :, j] << np.uint64(8 * j)
        state[:, :rate // 8] ^= words
        state = keccak_f_np(state)
    out = np.zeros((n, 32), dtype=np.uint8)
    for i in range(4):
        for j in range(8):
            out[:, 8 * i + j] = (state[:, i] >> np.uint64(8 * j)).astype(
                np.uint8)
    return out


class KeccakHasher(Hasher):
    """Truncated keccak256 (reference: hash/keccak.rs:103-131, N=25). The
    challenger permutation is the keccak "hash onion" with u64 rejection
    sampling (keccak.rs:63-98)."""
    name = "keccak25"
    hash_size = 25
    digest_width = 25
    digest_dtype = np.uint8
    algebraic = False
    device = False

    def permute_oracle(self, state: list[int]) -> list[int]:
        raw = b"".join((int(x) % ref.ORDER).to_bytes(8, "little")
                       for x in state)
        out: list[int] = []
        h = raw
        while len(out) < 12:
            h = kk.keccak256(h)
            for i in range(4):
                w = int.from_bytes(h[8 * i:8 * i + 8], "little")
                if w < ref.ORDER and len(out) < 12:
                    out.append(w)
        return out

    def hash_no_pad_oracle(self, inputs: list[int]) -> bytes:
        data = b"".join((int(x) % ref.ORDER).to_bytes(8, "little")
                        for x in inputs)
        return kk.keccak256(data)[:25]

    def two_to_one_oracle(self, left: bytes, right: bytes) -> bytes:
        return kk.keccak256(bytes(left) + bytes(right))[:25]

    def hash_leaves_np(self, leaves_u64: np.ndarray) -> np.ndarray:
        n, L = leaves_u64.shape
        if L * 8 <= 25:
            out = np.zeros((n, 25), dtype=np.uint8)
            out[:, :L * 8] = (
                leaves_u64[:, :, None]
                >> np.uint64(8 * np.arange(8))[None, None, :]
            ).astype(np.uint8).reshape(n, L * 8)
            return out
        data = (leaves_u64[:, :, None]
                >> np.uint64(8 * np.arange(8))[None, None, :]).astype(
                    np.uint8).reshape(n, L * 8)
        return keccak256_np(data)[:, :25]

    def compress_np(self, left: np.ndarray, right: np.ndarray) -> np.ndarray:
        return keccak256_np(
            np.concatenate([left, right], axis=1).astype(np.uint8))[:, :25]

    def permute_batch_np(self, states_u64: np.ndarray) -> np.ndarray:
        """Batched challenger permutation for the PoW grind:
        [n, 12] u64 -> [n, 12] u64 (two onion layers cover 8 u64s; the
        astronomically-rare rejection overflow falls back to scalar)."""
        n = states_u64.shape[0]
        data = (states_u64[:, :, None]
                >> np.uint64(8 * np.arange(8))[None, None, :]).astype(
                    np.uint8).reshape(n, 96)
        h1 = keccak256_np(data)
        h2 = keccak256_np(h1)
        h3 = keccak256_np(h2)
        words = np.concatenate([
            h.view(np.uint64).reshape(n, 4) for h in (h1, h2, h3)], axis=1)
        ok = words < np.uint64(ref.ORDER)
        out = np.zeros((n, 12), dtype=np.uint64)
        need_scalar = []
        for i in range(n):
            good = words[i][ok[i]]
            if len(good) >= 12:
                out[i] = good[:12]
            else:
                need_scalar.append(i)
        for i in need_scalar:
            out[i] = self.permute_oracle([int(x) for x in states_u64[i]])
        return out


class PoseidonBN128Hasher(Hasher):
    """Poseidon over the BN254 scalar field on the packed 12-u64 state
    (reference: hash/poseidon_bn128.rs — Go FFI permute). Its InnerHasher
    roles (public-input hashing, in-circuit ops) delegate to Goldilocks
    Poseidon exactly like the reference workaround (:162-197)."""
    name = "poseidon_bn128"
    algebraic = True
    device = False

    # host hot paths dispatch to the native C library (the analog of the
    # reference's Go static lib, build.rs:63-88), python spec as fallback
    def permute_oracle(self, state):
        from .. import native
        out = native.bn128_permute(state)
        return out if out is not None else bn.permute_bn128(state)

    def hash_no_pad_oracle(self, inputs: list[int]):
        from .. import native
        out = native.bn128_hash_no_pad(list(inputs))
        return out if out is not None \
            else tuple(bn.hash_no_pad_bn128(list(inputs)))

    def two_to_one_oracle(self, left, right):
        return self.hash_no_pad_oracle(list(left) + list(right))

    def hash_leaves_np(self, leaves_u64):
        from .. import native
        out = native.bn128_hash_leaves(leaves_u64)
        if out is not None:
            return out
        return np.asarray([self.hash_or_noop_oracle([int(x) for x in row])
                           for row in leaves_u64], dtype=np.uint64)

    def compress_np(self, left, right):
        from .. import native
        out = native.bn128_compress_many(left, right)
        if out is not None:
            return out
        return np.asarray(
            [self.two_to_one_oracle([int(x) for x in l], [int(x) for x in r])
             for l, r in zip(left, right)], dtype=np.uint64)


POSEIDON = PoseidonHasher()
POSEIDON2 = Poseidon2Hasher()
KECCAK = KeccakHasher()
POSEIDON_BN128 = PoseidonBN128Hasher()


# ---------------------------------------------------------------------------
# GenericConfig
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GenericConfig:
    """reference: plonk/config.rs:115-208. `hasher` builds Merkle trees and
    drives the challenger; `inner_hasher` hashes public inputs and is the
    in-circuit hash (must produce HashOut digests)."""
    name: str
    hasher: Hasher
    inner_hasher: Hasher

    def hash_public_inputs(self, inputs: list[int]) -> list[int]:
        """InnerHasher::hash_public_inputs (reference: prover.rs:147).

        The native hash MUST match the in-circuit `public_inputs_hash`
        gadget the builder routes into the PublicInputGate
        (circuit_builder.rs:1063-1072). Only Poseidon has an in-circuit
        permutation here, so non-Poseidon inner hashers delegate PI hashing
        to Goldilocks Poseidon — exactly the reference's PoseidonBN128
        workaround (poseidon_bn128.rs:162-197). For Poseidon2 the reference
        leaves the gadget `todo!()` (poseidon2.rs:640-662), i.e. it cannot
        build public-input circuits under Poseidon2 at all; delegating keeps
        this config fully functional instead."""
        if self.inner_hasher.name != "poseidon":
            return list(POSEIDON.hash_no_pad_oracle(inputs))
        return list(self.inner_hasher.hash_no_pad_oracle(inputs))


PoseidonGoldilocksConfig = GenericConfig(
    "PoseidonGoldilocksConfig", POSEIDON, POSEIDON)
Poseidon2GoldilocksConfig = GenericConfig(
    "Poseidon2GoldilocksConfig", POSEIDON2, POSEIDON2)
KeccakGoldilocksConfig = GenericConfig(
    "KeccakGoldilocksConfig", KECCAK, POSEIDON)
PoseidonBN128GoldilocksConfig = GenericConfig(
    "PoseidonBN128GoldilocksConfig", POSEIDON_BN128, POSEIDON_BN128)

HASHERS_BY_NAME = {h.name: h for h in (POSEIDON, POSEIDON2, KECCAK,
                                        POSEIDON_BN128)}

CONFIGS = {c.name: c for c in (
    PoseidonGoldilocksConfig, Poseidon2GoldilocksConfig,
    KeccakGoldilocksConfig, PoseidonBN128GoldilocksConfig)}
