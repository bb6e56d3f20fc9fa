"""Keccak-256 hasher for non-recursive outer proofs.

Reference: plonky2/src/hash/keccak.rs:103-219 (KeccakHash<N>: BytesHash
digests over the LE-byte serialization of field elements; two_to_one =
keccak256(left || right)). Python's hashlib sha3 uses the SHA-3 padding, NOT
the original Keccak padding (0x01) that keccak256 uses, so keccak-f[1600] is
implemented here directly.
"""

from __future__ import annotations

from ..field import reference as ref

_ROT = [[0, 36, 3, 41, 18], [1, 44, 10, 45, 2], [62, 6, 43, 15, 61],
        [28, 55, 25, 21, 56], [27, 20, 39, 8, 14]]
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_MASK = (1 << 64) - 1


def _rotl(x, n):
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(state: list[int]) -> list[int]:
    a = [[state[x + 5 * y] for y in range(5)] for x in range(5)]
    for rc in _RC:
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        a = [[a[x][y] ^ d[x] for y in range(5)] for x in range(5)]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rotl(a[x][y], _ROT[x][y])
        # chi
        a = [[b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
              for y in range(5)] for x in range(5)]
        # iota
        a[0][0] ^= rc
    return [a[x][y] for y in range(5) for x in range(5)]


def keccak256(data: bytes) -> bytes:
    rate = 136  # 1088-bit rate for keccak-256
    padded = bytearray(data)
    padded.append(0x01)
    while len(padded) % rate:
        padded.append(0x00)
    padded[-1] ^= 0x80
    state = [0] * 25
    for off in range(0, len(padded), rate):
        block = padded[off:off + rate]
        for i in range(rate // 8):
            state[i] ^= int.from_bytes(block[8 * i:8 * i + 8], "little")
        state = _keccak_f(state)
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out[:32]


class KeccakHash:
    """N-byte truncated keccak256 digests over field-element LE bytes
    (reference: keccak.rs KeccakHash<N>, N=25 in KeccakGoldilocksConfig)."""

    def __init__(self, n: int = 25):
        self.n = n

    def hash_no_pad(self, inputs: list[int]) -> bytes:
        data = b"".join((x % ref.ORDER).to_bytes(8, "little") for x in inputs)
        return keccak256(data)[:self.n]

    def two_to_one(self, left: bytes, right: bytes) -> bytes:
        return keccak256(bytes(left) + bytes(right))[:self.n]

    def hash_or_noop(self, inputs: list[int]) -> bytes:
        if len(inputs) * 8 <= self.n:
            out = b"".join((x % ref.ORDER).to_bytes(8, "little")
                           for x in inputs)
            return out + b"\x00" * (self.n - len(out))
        return self.hash_no_pad(inputs)
