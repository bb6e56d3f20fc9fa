"""On-chip validation of the TPU-only code paths (Pallas Poseidon kernel,
lanes pipeline) against the host oracle. Run on the real chip:
    python scripts/tpu_validate.py
"""
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

assert jax.default_backend() == "tpu", "run this on the TPU box"

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.hash import poseidon as ps
from plonky2_tpu.ops.pallas_poseidon import permute_lanes_pallas

rng = np.random.default_rng(0)
B = 1024
state = rng.integers(0, ref.ORDER, size=(12, B), dtype=np.uint64)
got = np.asarray(permute_lanes_pallas(GF.from_u64(state)).to_u64())
for j in range(0, B, 211):
    want = ps.poseidon_oracle([int(state[i, j]) for i in range(12)])
    assert [int(got[i, j]) for i in range(12)] == want, f"lane {j} mismatch"
print("pallas kernel vs oracle: OK (1024 lanes)")

# kernel vs scan formulation, bit-exact across the full batch
scan = np.asarray(ps._poseidon_permute_scan(
    GF.from_u64(state.T)).to_u64()).T
np.testing.assert_array_equal(got, scan)
print("pallas kernel vs scan path: OK")
