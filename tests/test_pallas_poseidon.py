"""Pallas Poseidon kernel equivalence.

Interpret-mode/eager validation costs tens of thousands of per-op XLA:CPU
dispatches on this 1-core box (>30 min), so these run only under
PLONKY2_TPU_HEAVY or on the TPU backend, where the kernel compiles in
seconds (scripts/tpu_validate.py runs the same checks on the chip).
"""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    "PLONKY2_TPU_HEAVY" not in os.environ
    and jax.default_backend() != "tpu",
    reason="eager/interpret Poseidon is ~30min of per-op XLA:CPU dispatch "
           "on this box; validated on the TPU backend (scripts/tpu_validate)")

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.hash import poseidon as ps
from plonky2_tpu.ops.pallas_poseidon import permute_lanes_pallas


def test_pallas_kernel_matches_oracle():
    rng = np.random.default_rng(0)
    B = 256
    state = rng.integers(0, ref.ORDER, size=(12, B), dtype=np.uint64)
    got = permute_lanes_pallas(GF.from_u64(state), tile=128,
                               interpret=True).to_u64()
    for j in range(0, B, 97):   # spot-check lanes against the scalar oracle
        want = ps.poseidon_oracle([int(state[i, j]) for i in range(12)])
        assert [int(got[i, j]) for i in range(12)] == want


def test_unrolled_matches_scan():
    rng = np.random.default_rng(1)
    B = 128
    state = rng.integers(0, ref.ORDER, size=(12, B), dtype=np.uint64)
    st = GF.from_u64(state)
    # eager (NOT jitted): the unrolled graph is TPU-only jit territory —
    # XLA:CPU hangs compiling it
    a = ps.permute_lanes_unrolled(st).to_u64()
    b = ps.permute_lanes(st).to_u64()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
