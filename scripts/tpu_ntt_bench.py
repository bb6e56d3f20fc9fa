#!/usr/bin/env python
"""On-chip validation + throughput sweep for the MXU limb-matmul NTT.

1. bit-exactness: TPU-executed ntt_mxu vs the SAME code on the CPU backend
   (which the test suite pins to the butterfly path and the host oracle).
   A butterfly-vs-mxu on-chip cross-check exists too but is opt-in — each
   butterfly compile costs ~3 min through the remote-compile tunnel
   (PLONKY2_TPU_BENCH_BUTTERFLY=1).
2. throughput sweep: single-poly 2^13..2^24 and the prover shape
   [135, 2^k], plain fft and coset LDE, with HBM roofline fractions.

Prints one JSON line per result. Run when the axon tunnel is up.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    from bench import _cache_dir
    jax.config.update("jax_compilation_cache_dir", _cache_dir("tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    assert jax.devices()[0].platform == "tpu", jax.devices()
    cpu = jax.devices("cpu")[0]

    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.ops import ntt, ntt_mxu

    ORDER = (1 << 64) - (1 << 32) + 1
    HBM = 819e9
    rng = np.random.default_rng(0)

    def rand(shape):
        return GF.from_u64(rng.integers(0, ORDER, size=shape,
                                        dtype=np.uint64))

    def on_cpu(fn, x):
        with jax.default_device(cpu):
            lo = jax.device_put(np.asarray(jax.device_get(x.lo)), cpu)
            hi = jax.device_put(np.asarray(jax.device_get(x.hi)), cpu)
            return fn(GF(lo, hi)).to_u64()

    # -- correctness: TPU execution vs CPU execution of the same transforms
    #    (CPU is pinned bit-exact to the butterfly path + host oracle by
    #    tests/test_ntt_mxu.py). Includes a chunked-path size.
    checks = [
        ("fft_2^10x4", lambda c: ntt_mxu.fft(c), (4, 1 << 10)),
        ("lde_2^13x3_rate8", lambda c: ntt_mxu.lde_fft(c, 3, shift=7),
         (3, 1 << 13)),
        ("coset_ifft_2^12", lambda c: ntt_mxu.coset_ifft(c, 7), (1 << 12,)),
    ]
    for name, fn, shape in checks:
        x = rand(shape)
        t0 = time.perf_counter()
        got = jax.jit(fn)(x).to_u64()
        want = on_cpu(fn, x)
        ok = bool(np.array_equal(got, want))
        print(json.dumps({"check": name, "tpu_matches_cpu": ok,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
        if not ok:
            print(json.dumps({"error": "MISMATCH - do not ship"}), flush=True)
            return 1

    if os.environ.get("PLONKY2_TPU_BENCH_BUTTERFLY"):
        os.environ["PLONKY2_TPU_NO_MXU_NTT"] = "1"
        x = rand((4, 1 << 10))
        a = jax.jit(ntt.fft)(x).to_u64()
        b = jax.jit(ntt_mxu.fft)(x).to_u64()
        print(json.dumps({"check": "butterfly_vs_mxu_on_chip",
                          "equal": bool(np.array_equal(a, b))}), flush=True)
        del os.environ["PLONKY2_TPU_NO_MXU_NTT"]

    def bench(fn, x, iters=10):
        out = fn(x)
        jax.block_until_ready(out.lo)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        jax.block_until_ready(out.lo)
        return (time.perf_counter() - t0) / iters

    for lg in (13, 16, 18, 20, 22, 24):
        x = rand((1 << lg,))
        dt = bench(jax.jit(ntt_mxu.fft), x)
        n = 1 << lg
        print(json.dumps({
            "metric": f"ntt_mxu_2^{lg}", "elements_per_s": round(n / dt),
            "ms": round(dt * 1e3, 2),
            "hbm_frac_lower_bound": round(n * 32 / dt / HBM, 3)}),
            flush=True)

    for lg in (13, 16, 18):
        x = rand((135, 1 << lg))
        f = jax.jit(lambda c: ntt_mxu.lde_fft(c, 3, shift=7))
        dt = bench(f, x, iters=5)
        n_out = 135 << (lg + 3)
        print(json.dumps({
            "metric": f"lde_mxu_135x2^{lg}_rate8",
            "out_elements_per_s": round(n_out / dt),
            "ms": round(dt * 1e3, 2),
            "hbm_frac_lower_bound": round(n_out * 32 / dt / HBM, 3)}),
            flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
