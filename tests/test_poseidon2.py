"""Poseidon2 oracle vs batched device kernel consistency."""

import numpy as np

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.hash.poseidon2 import (
    hash_no_pad, hash_no_pad_oracle, poseidon2_oracle, poseidon2_permute,
)


def test_poseidon2_kernel_matches_oracle():
    rng = np.random.default_rng(11)
    states = rng.integers(0, ref.ORDER, size=(5, 12), dtype=np.uint64)
    out = poseidon2_permute(GF.from_u64(states)).to_u64()
    for i in range(5):
        assert list(out[i]) == poseidon2_oracle([int(x) for x in states[i]])


def test_poseidon2_hash_matches_oracle():
    rng = np.random.default_rng(12)
    inputs = rng.integers(0, ref.ORDER, size=(3, 11), dtype=np.uint64)
    out = hash_no_pad(GF.from_u64(inputs)).to_u64()
    for i in range(3):
        assert list(out[i]) == hash_no_pad_oracle([int(x) for x in inputs[i]])
