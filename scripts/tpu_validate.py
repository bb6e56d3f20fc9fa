"""On-chip validation of the TPU-only code paths (Pallas Poseidon kernels —
SoA v2 and v1 — and the lanes pipeline) against the host oracle, plus a
kernel throughput comparison. Run on the real chip:
    python scripts/tpu_validate.py
"""
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from bench import _cache_dir
jax.config.update("jax_compilation_cache_dir", _cache_dir("tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
assert jax.default_backend() == "tpu", "run this on the TPU box"

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.hash import poseidon as ps
from plonky2_tpu.ops.pallas_poseidon import (
    _permute_fn, _permute_fn_soa, permute_lanes_pallas,
)

rng = np.random.default_rng(0)
B = 1024
state = rng.integers(0, ref.ORDER, size=(12, B), dtype=np.uint64)
st = GF.from_u64(state)

got = np.asarray(permute_lanes_pallas(st).to_u64())   # default = SoA v2
for j in range(0, B, 211):
    want = ps.poseidon_oracle([int(state[i, j]) for i in range(12)])
    assert [int(got[i, j]) for i in range(12)] == want, f"lane {j} mismatch"
print("pallas SoA kernel vs oracle: OK (1024 lanes)", flush=True)

v1 = GF(*_permute_fn(B, 512, False)(st.lo, st.hi)).to_u64()
np.testing.assert_array_equal(got, np.asarray(v1))
print("pallas SoA kernel vs v1 kernel: OK", flush=True)

scan = np.asarray(ps._poseidon_permute_scan(GF.from_u64(state.T)).to_u64()).T
np.testing.assert_array_equal(got, scan)
print("pallas kernel vs scan path: OK", flush=True)

# throughput: permutations/s for each kernel at a large batch.
# NOTE axon-remote measurement rules: block_until_ready does not actually
# wait and identical executions can be served from a cache, so each call is
# XOR-perturbed and completion is forced with a tiny readback; a measured
# readback floor is subtracted.
Bb = 1 << 20
big = GF.from_u64(rng.integers(0, ref.ORDER, size=(12, Bb), dtype=np.uint64))


def _floor():
    import jax.numpy as jnp
    x = jnp.zeros((8, 128), jnp.int32)
    f = jax.jit(lambda a, s: a + s)
    np.asarray(f(x, 1).ravel()[:1])
    t0 = time.perf_counter()
    np.asarray(f(x, 2).ravel()[:1])
    return time.perf_counter() - t0


FLOOR = _floor()


def bench(fn, iters=10):
    lo, hi = fn(big.lo ^ np.uint32(255), big.hi)
    np.asarray(lo.ravel()[:1])
    t0 = time.perf_counter()
    for i in range(iters):
        lo, hi = fn(big.lo ^ np.uint32(i + 1), big.hi)
    np.asarray(lo.ravel()[:1])
    return Bb * iters / (time.perf_counter() - t0 - FLOOR)


for name, fn in (("soa_v2", _permute_fn_soa(Bb, 2048, False)),
                 ("v1", _permute_fn(Bb, 512, False))):
    rate = bench(fn)
    print(f"kernel {name}: {rate/1e6:.2f} M permutations/s", flush=True)

# -- fused leaf-hash kernel: bit parity + throughput -------------------------
from plonky2_tpu.ops.pallas_poseidon import hash_leaves_lanes_pallas

for L in (8, 20, 135):
    leaves = rng.integers(0, ref.ORDER, size=(L, 1024), dtype=np.uint64)
    lv = GF.from_u64(leaves)
    got_lv = np.asarray(hash_leaves_lanes_pallas(lv).to_u64())
    for j in range(0, 1024, 307):
        want = ps.hash_or_noop_oracle([int(leaves[i, j]) for i in range(L)])
        assert [int(got_lv[i, j]) for i in range(4)] == list(want), \
            f"leaf L={L} lane {j} mismatch"
    print(f"fused leaf kernel vs oracle (L={L}): OK", flush=True)

Lb = 135
big_leaves = GF.from_u64(rng.integers(0, ref.ORDER, size=(Lb, 1 << 16),
                                      dtype=np.uint64))


def bench_leaf(iters=10):
    g = hash_leaves_lanes_pallas(GF(big_leaves.lo ^ np.uint32(255),
                                    big_leaves.hi))
    np.asarray(g.lo.ravel()[:1])
    t0 = time.perf_counter()
    for i in range(iters):
        g = hash_leaves_lanes_pallas(GF(big_leaves.lo ^ np.uint32(i + 1),
                                        big_leaves.hi))
    np.asarray(g.lo.ravel()[:1])
    dt = time.perf_counter() - t0 - FLOOR
    n = (1 << 16) * iters
    perms = n * ((Lb + 7) // 8)
    return n / dt, perms / dt


leaves_rate, perm_rate = bench_leaf()
print(f"fused leaf kernel 135x2^16: {leaves_rate/1e6:.2f} M leaves/s "
      f"({perm_rate/1e6:.2f} M permutations/s)", flush=True)

# -- Poseidon2 Pallas kernels: bit parity on chip ----------------------------
from plonky2_tpu.hash import poseidon2 as ps2
from plonky2_tpu.ops.pallas_poseidon2 import (
    hash2_leaves_lanes_pallas, permute2_lanes_pallas,
)

state2 = rng.integers(0, ref.ORDER, size=(12, 1024), dtype=np.uint64)
got2 = np.asarray(permute2_lanes_pallas(GF.from_u64(state2)).to_u64())
for j in range(0, 1024, 211):
    want = ps2.poseidon2_oracle([int(state2[i, j]) for i in range(12)])
    assert [int(got2[i, j]) for i in range(12)] == want, f"p2 lane {j}"
print("pallas Poseidon2 kernel vs oracle: OK (1024 lanes)", flush=True)

for L in (8, 135):
    leaves2 = rng.integers(0, ref.ORDER, size=(L, 1024), dtype=np.uint64)
    got_l2 = np.asarray(
        hash2_leaves_lanes_pallas(GF.from_u64(leaves2)).to_u64())
    for j in range(0, 1024, 307):
        want = ps2.hash_no_pad_oracle([int(leaves2[i, j]) for i in range(L)])
        assert [int(got_l2[i, j]) for i in range(4)] == list(want), \
            f"p2 leaf L={L} lane {j}"
    print(f"fused Poseidon2 leaf kernel vs oracle (L={L}): OK", flush=True)

# -- MXU/Pallas NTT parity at the recursive-wrap prover shapes ---------------
# (r4 lesson: the Poseidon-only validation missed a Mosaic miscompile in the
# NTT kernel at R<128 that invalidated the flagship recursion chain. This
# runs every round now.)
import subprocess
rc = subprocess.run(
    [sys.executable,
     os.path.join(os.path.dirname(os.path.abspath(__file__)),
                  "r5_fold_parity.py")])
assert rc.returncode == 0, "NTT/fold parity hunt FAILED"
print("NTT/fold parity (recursive-wrap shapes): OK", flush=True)
