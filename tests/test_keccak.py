"""Keccak-256 known-answer tests (ethereum-style keccak, original padding)."""

from plonky2_tpu.hash.keccak import KeccakHash, keccak256


def test_keccak256_kats():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert keccak256(b"x" * 200).hex() == keccak256(b"x" * 200).hex()


def test_keccak_hasher_shapes():
    h = KeccakHash(25)
    d = h.hash_no_pad([1, 2, 3, 4, 5])
    assert len(d) == 25
    assert len(h.two_to_one(d, d)) == 25
    assert h.hash_or_noop([7]) == (7).to_bytes(8, "little") + b"\x00" * 17
