"""On-chip parity hunt for the r4 recursion-chain failure
("final polynomial evaluation invalid", VERDICT r5 item 1).

The verifier's check order on the failing proof localizes the bug to the
FRI commit-phase device programs at the OUTER proof's shapes:
  - tree-0 values  = coset_lde(shifted[4096], rate 3)      -> 2^15  (MXU)
  - fold layer 0   = horner_fold(2^15 -> 2^11) + coset_fft(2^11, 7^16)
  - fold layer 1   = horner_fold(2^11 -> 2^7)  + coset_fft(2^7, 7^256)
  - final_poly     = coeffs[:16] readback
Fold-consistency passed at 28 query positions but the final check failed,
which fingers positions NOT probed per-query: sparse wrong outputs in the
MXU/Pallas coset_fft at 2^11, or a wrong horner_fold.

This script computes each piece on chip under three backends
(default=Pallas, NO_PALLAS_NTT=XLA-MXU, NO_MXU=butterflies), cross-checks
the full arrays, and spot-checks against an exact python-int Horner oracle.
"""
import os
import sys
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
from plonky2_tpu.field.extension import GF2
from plonky2_tpu.ops import ntt
from plonky2_tpu.ops.polynomial import horner_fold

rng = np.random.default_rng(42)
FAILURES = []


def host_eval(coeffs_u64, x):
    """P(x) by Horner, python ints (exact)."""
    acc = 0
    for c in reversed(coeffs_u64):
        acc = (acc * x + int(c)) % ref.ORDER
    return acc


def spot_check(name, coeffs_u64, out_u64, lg_out, shift, k=8):
    """out[j] should be P(shift * g^j) for the 2^lg_out root g."""
    g = ref.primitive_root_of_unity(lg_out)
    n_out = 1 << lg_out
    idxs = sorted(set(rng.integers(0, n_out, size=k).tolist()) | {0, 1, n_out - 1})
    bad = []
    for j in idxs:
        x = ref.mul(shift, ref.exp(g, j))
        want = host_eval(coeffs_u64, x)
        got = int(out_u64[j])
        if want != got:
            bad.append((j, got, want))
    if bad:
        FAILURES.append((name, "oracle", bad[:4]))
        print(f"FAIL {name}: {len(bad)}/{len(idxs)} spot mismatches "
              f"e.g. j={bad[0][0]} got={bad[0][1]} want={bad[0][2]}",
              flush=True)
    else:
        print(f"ok   {name}: {len(idxs)} oracle spots", flush=True)


def run_paths(fn_name, x, *args):
    """Run ntt.<fn_name> under the three backends; return dict path->u64."""
    outs = {}
    for path, env in (("pallas", {}),
                      ("xla_mxu", {"PLONKY2_TPU_NO_PALLAS_NTT": "1"}),
                      ("butterfly", {"PLONKY2_TPU_NO_MXU_NTT": "1"})):
        for k in ("PLONKY2_TPU_NO_PALLAS_NTT", "PLONKY2_TPU_NO_MXU_NTT"):
            os.environ.pop(k, None)
        os.environ.update(env)
        t0 = time.time()
        out = getattr(ntt, fn_name)(x, *args)
        outs[path] = np.asarray(out.to_u64())
        print(f"     {fn_name}{list(x.shape)}x{args} [{path}] "
              f"{time.time()-t0:.1f}s", flush=True)
    for k in ("PLONKY2_TPU_NO_PALLAS_NTT", "PLONKY2_TPU_NO_MXU_NTT"):
        os.environ.pop(k, None)
    return outs


def cross_check(name, outs):
    ref_path = "butterfly"
    for path in ("pallas", "xla_mxu"):
        a, b = outs[path], outs[ref_path]
        if not np.array_equal(a, b):
            ix = np.argwhere(a != b)
            FAILURES.append((name, f"{path} vs {ref_path}", ix[:8].tolist()))
            print(f"FAIL {name}: {path} vs {ref_path}: {len(ix)} mismatching "
                  f"positions, first {ix[:8].ravel().tolist()}", flush=True)
        else:
            print(f"ok   {name}: {path} == {ref_path} ({a.size} elems)",
                  flush=True)


# ---- piece 1: tree-0 values — coset_lde single poly [4096] rate 3 ----------
c = rng.integers(0, ref.ORDER, size=4096, dtype=np.uint64)
# realistic tail: full-degree (the combined FRI poly is degree ~4096)
x = GF.from_u64(c)
outs = run_paths("coset_lde", x, 3)
cross_check("coset_lde[4096]r3", outs)
spot_check("coset_lde[4096]r3", c, outs["pallas"], 15,
           ref.MULTIPLICATIVE_GROUP_GENERATOR)

# ---- piece 2: fold layer 0 re-eval — coset_fft [2048] shift 7^16 -----------
shift16 = pow(7, 16, ref.ORDER)
c2 = np.zeros(2048, dtype=np.uint64)
c2[:256] = rng.integers(0, ref.ORDER, size=256, dtype=np.uint64)  # real sparsity
outs = run_paths("coset_fft", GF.from_u64(c2), shift16)
cross_check("coset_fft[2048]s7^16", outs)
spot_check("coset_fft[2048]s7^16", c2, outs["pallas"], 11, shift16)

# dense variant too (sparsity should not matter, but be thorough)
c2d = rng.integers(0, ref.ORDER, size=2048, dtype=np.uint64)
outs = run_paths("coset_fft", GF.from_u64(c2d), shift16)
cross_check("coset_fft[2048]dense", outs)
spot_check("coset_fft[2048]dense", c2d, outs["pallas"], 11, shift16)

# ---- piece 3: fold layer 1 re-eval — coset_fft [128] shift 7^256 -----------
shift256 = pow(7, 256, ref.ORDER)
c3 = np.zeros(128, dtype=np.uint64)
c3[:16] = rng.integers(0, ref.ORDER, size=16, dtype=np.uint64)
outs = run_paths("coset_fft", GF.from_u64(c3), shift256)
cross_check("coset_fft[128]s7^256", outs)
spot_check("coset_fft[128]s7^256", c3, outs["pallas"], 7, shift256)

# ---- piece 4: batch oracle commit shape [85, 4096] rate 3 ------------------
cb = rng.integers(0, ref.ORDER, size=(85, 4096), dtype=np.uint64)
outs = run_paths("coset_lde", GF.from_u64(cb), 3)
cross_check("coset_lde[85,4096]r3", outs)
spot_check("coset_lde[85,4096]r3 row0", cb[0], outs["pallas"][0], 15,
           ref.MULTIPLICATIVE_GROUP_GENERATOR)
spot_check("coset_lde[85,4096]r3 row84", cb[84], outs["pallas"][84], 15,
           ref.MULTIPLICATIVE_GROUP_GENERATOR)

# ---- piece 5: the exact jitted fold program (horner_fold + coset_fft) ------
def host_fold(coeffs_pairs, beta, arity_bits):
    arity = 1 << arity_bits
    out = []
    for j in range(0, len(coeffs_pairs), arity):
        acc = (0, 0)
        for i in range(arity - 1, -1, -1):
            acc = ref.ext2_add(ref.ext2_mul(acc, beta), coeffs_pairs[j + i])
        out.append(acc)
    return out


for (n, arity_bits, shift, nz) in ((1 << 15, 4, shift16, 1 << 12),
                                   (1 << 11, 4, shift256, 1 << 8)):
    beta = (int(rng.integers(0, ref.ORDER, dtype=np.uint64)),
            int(rng.integers(0, ref.ORDER, dtype=np.uint64)))
    c0 = np.zeros(n, dtype=np.uint64)
    c1 = np.zeros(n, dtype=np.uint64)
    c0[:nz] = rng.integers(0, ref.ORDER, size=nz, dtype=np.uint64)
    c1[:nz] = rng.integers(0, ref.ORDER, size=nz, dtype=np.uint64)
    coeffs = GF2(GF.from_u64(c0), GF.from_u64(c1))

    @jax.jit
    def fold_fn(cf, b):
        folded = horner_fold(cf, b, arity_bits)
        values = GF2(ntt.coset_fft(folded.c0, shift),
                     ntt.coset_fft(folded.c1, shift))
        return folded, values

    t0 = time.time()
    folded, values = fold_fn(coeffs, GF2.const(*beta))
    f0, f1 = np.asarray(folded.c0.to_u64()), np.asarray(folded.c1.to_u64())
    v0 = np.asarray(values.c0.to_u64())
    print(f"     fold[{n}]a{arity_bits} jit+run {time.time()-t0:.1f}s",
          flush=True)
    pairs = list(zip(c0.tolist(), c1.tolist()))
    want = host_fold(pairs, beta, arity_bits)
    got = list(zip(f0.tolist(), f1.tolist()))
    if got != [tuple(map(int, w)) for w in want]:
        bad = [i for i, (g, w) in enumerate(zip(got, want)) if g != tuple(w)]
        FAILURES.append((f"horner_fold[{n}]", "host", bad[:8]))
        print(f"FAIL horner_fold[{n}]: {len(bad)} coeff mismatches at "
              f"{bad[:8]}", flush=True)
    else:
        print(f"ok   horner_fold[{n}] == host oracle ({n >> arity_bits} "
              "coeffs)", flush=True)
    spot_check(f"fold_values[{n>>arity_bits}]", f0,
               v0, (n.bit_length() - 1) - arity_bits, shift)

print("=" * 60, flush=True)
if FAILURES:
    print(f"{len(FAILURES)} FAILURES:", flush=True)
    for f in FAILURES:
        print("  ", f[0], f[1], f[2], flush=True)
    sys.exit(1)
print("ALL PARITY CHECKS PASSED ON CHIP", flush=True)
