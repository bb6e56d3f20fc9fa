"""Poseidon KATs + device-vs-oracle conformance.

KAT vectors are the reference's published test vectors
(reference: plonky2/src/hash/poseidon_goldilocks.rs:455-490, computed with the
hadeshash reference implementation).
"""

import numpy as np

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.hash import poseidon as ps

NEG_ONE = ref.ORDER - 1

KATS = [
    ([0] * 12,
     [0x3c18a9786cb0b359, 0xc4055e3364a246c3, 0x7953db0ab48808f4, 0xc71603f33a1144ca,
      0xd7709673896996dc, 0x46a84e87642f44ed, 0xd032648251ee0b3c, 0x1c687363b207df62,
      0xdf8565563e8045fe, 0x40f5b37ff4254dae, 0xd070f637b431067c, 0x1792b1c4342109d7]),
    (list(range(12)),
     [0xd64e1e3efc5b8e9e, 0x53666633020aaa47, 0xd40285597c6a8825, 0x613a4f81e81231d2,
      0x414754bfebd051f0, 0xcb1f8980294a023f, 0x6eb2a9e4d54a9d0f, 0x1902bc3af467e056,
      0xf045d5eafdc6021f, 0xe4150f77caaa3be5, 0xc9bfd01d39b50cce, 0x5c0a27fcb0e1459b]),
    ([NEG_ONE] * 12,
     [0xbe0085cfc57a8357, 0xd95af71847d05c09, 0xcf55a13d33c1c953, 0x95803a74f4530e82,
      0xfcd99eb30a135df1, 0xe095905e913a3029, 0xde0392461b42919b, 0x7d3260e24e81d031,
      0x10d3d0465d9deaa0, 0xa87571083dfc2a47, 0xe18263681e9958f8, 0xe28e96f1ae5e60d3]),
    ([0x8ccbbbea4fe5d2b7, 0xc2af59ee9ec49970, 0x90f7e1a9e658446a, 0xdcc0630a3ab8b1b8,
      0x7ff8256bca20588c, 0x5d99a7ca0c44ecfb, 0x48452b17a70fbee3, 0xeb09d654690b6c88,
      0x4a55d3a39c676a88, 0xc0407a38d2285139, 0xa234bac9356386d1, 0xe1633f2bad98a52f],
     [0xa89280105650c4ec, 0xab542d53860d12ed, 0x5704148e9ccab94f, 0xd3a826d4b62da9f5,
      0x8a7a6ca87892574f, 0xc7017e1cad1a674e, 0x1f06668922318e34, 0xa3b203bc8102676f,
      0xfcc781b0ce382bf2, 0x934c69ff3ed14ba5, 0x504688a5996e8f13, 0x401f3f2ed524a2ba]),
]


def test_oracle_kats():
    for inp, want in KATS:
        assert ps.poseidon_oracle(inp) == [w % ref.ORDER for w in want]


def test_device_kats_batched():
    inp = GF.from_u64(np.array([k[0] for k in KATS], dtype=np.uint64))
    out = ps.poseidon_permute(inp).to_u64()
    want = np.array([k[1] for k in KATS], dtype=np.uint64)
    np.testing.assert_array_equal(out, want)


def test_device_vs_oracle_random():
    rng = np.random.default_rng(3)
    states = rng.integers(0, ref.ORDER, size=(5, 12), dtype=np.uint64)
    got = ps.poseidon_permute(GF.from_u64(states)).to_u64()
    for i in range(5):
        want = ps.poseidon_oracle([int(x) for x in states[i]])
        np.testing.assert_array_equal(got[i], np.array(want, dtype=np.uint64))


def test_hash_no_pad_device_vs_oracle():
    rng = np.random.default_rng(4)
    for L in [1, 4, 7, 8, 9, 16, 20, 135]:
        inputs = rng.integers(0, ref.ORDER, size=(2, L), dtype=np.uint64)
        got = ps.hash_no_pad(GF.from_u64(inputs)).to_u64()
        for b in range(2):
            want = ps.hash_no_pad_oracle([int(x) for x in inputs[b]])
            np.testing.assert_array_equal(got[b], np.array(want, dtype=np.uint64))


def test_compress_device_vs_oracle():
    rng = np.random.default_rng(5)
    x = rng.integers(0, ref.ORDER, size=(3, 4), dtype=np.uint64)
    y = rng.integers(0, ref.ORDER, size=(3, 4), dtype=np.uint64)
    got = ps.compress(GF.from_u64(x), GF.from_u64(y)).to_u64()
    for b in range(3):
        want = ps.compress_oracle([int(v) for v in x[b]], [int(v) for v in y[b]])
        np.testing.assert_array_equal(got[b], np.array(want, dtype=np.uint64))


def test_hash_or_noop():
    small = GF.from_u64(np.array([[5, 6]], dtype=np.uint64))
    out = ps.hash_or_noop(small).to_u64()
    np.testing.assert_array_equal(out, [[5, 6, 0, 0]])


def test_native_host_permutation_matches_python():
    """The C host library (plonky2_tpu/native) must be bit-identical to the
    python reference permutation."""
    import random

    from plonky2_tpu.hash.poseidon import poseidon_oracle_py
    from plonky2_tpu.native import permute

    rng = random.Random(77)
    if permute([0] * 12) is None:
        import pytest
        pytest.skip("no C compiler available")
    for _ in range(10):
        st = [rng.randrange(2**64 - 2**32 + 1) for _ in range(12)]
        assert permute(st) == poseidon_oracle_py(st)


def test_native_generator_trace_parity(monkeypatch):
    """The C fast-partial witness trace must be bit-identical to the
    python-int generator path for random inputs and both swap values."""
    import random

    import pytest

    from plonky2_tpu import native
    from plonky2_tpu.field import reference as ref
    from plonky2_tpu.gates.poseidon_gate import PoseidonGate, PoseidonGenerator
    from plonky2_tpu.iop.target import wire

    if native.load() is None:
        pytest.skip("native lib unavailable")

    class FW:
        def __init__(self, d):
            self.d = d

        def get(self, t):
            return self.d[t]

    rng = random.Random(99)
    g = PoseidonGenerator(0)
    for swap in (0, 1):
        for _ in range(5):
            d = {wire(0, i): rng.randrange(ref.ORDER) for i in range(12)}
            d[wire(0, PoseidonGate.WIRE_SWAP)] = swap
            fw = FW(d)
            native_out = []
            g.run_once(fw, native_out)
            py_out = []
            monkeypatch.setattr(native, "poseidon_generator_trace",
                                lambda *a: None)
            g.run_once(fw, py_out)
            monkeypatch.undo()
            assert dict(native_out) == dict(py_out)
            assert len(native_out) == len(py_out) == 122
