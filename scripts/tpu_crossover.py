#!/usr/bin/env python
"""NTT dispatch-threshold calibration + timing-methodology reconciliation
(VERDICT r3 weak #4: bench.py's chained-loop numbers and tpu_ntt_bench's
single-dispatch numbers disagreed 11x; the chained loop measures sustained
throughput, the single dispatch measures latency incl. the ~3 ms tunnel
round-trip — both are reported here side by side so neither is mistaken
for the other).

Per size lg_n in 8..22 it times the butterfly path vs the MXU limb-matmul
path, BOTH with the same chained-iteration harness, and prints the measured
crossover to set ops/ntt._MIN_LG_MXU from data.

Run on the chip:  python scripts/tpu_crossover.py [batch]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

import hashlib


def _cache():
    jax.config.update(
        "jax_compilation_cache_dir",
        "/tmp/plonky2_tpu_jax_cache_" + hashlib.sha1(
            f"tpu|{jax.__version__}|".encode()).hexdigest()[:12])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    _cache()
    assert jax.devices()[0].platform == "tpu"
    from jax import lax

    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.ops import ntt, ntt_mxu

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    rng = np.random.default_rng(0)
    ORDER = (1 << 64) - (1 << 32) + 1

    def sync(x):
        np.asarray(jax.device_get(x.lo.ravel()[:1]))

    def chained(step, x, iters):
        @jax.jit
        def run(lo, hi):
            def body(i, c):
                o = step(GF(c[0] ^ i.astype(jnp.uint32), c[1]))
                return (o.lo, o.hi)
            return lax.fori_loop(0, iters, body, (lo, hi))
        sync(GF(*run(x.lo, x.hi)))
        t0 = time.perf_counter()
        out = run(x.lo, x.hi)
        sync(GF(*out))
        return (time.perf_counter() - t0) / iters

    def single(step, x, iters=5):
        f = jax.jit(step)
        sync(f(x))
        t0 = time.perf_counter()
        for i in range(iters):
            sync(f(GF(x.lo ^ np.uint32(i + 1), x.hi)))
        return (time.perf_counter() - t0) / iters

    results = {}
    crossover = None
    for lg_n in range(8, 23, 2):
        n = 1 << lg_n
        shape = (batch, n) if batch > 1 else (n,)
        x = GF.from_u64(rng.integers(0, ORDER, size=shape, dtype=np.uint64))
        iters = max(4, min(50, (1 << 24) // (batch * n)))

        os.environ["PLONKY2_TPU_NO_MXU_NTT"] = "1"
        t_bfly = chained(ntt.fft, x, iters)
        t_blanes = None
        if batch >= 8:
            os.environ["PLONKY2_TPU_NTT_BATCHLANES"] = "1"
            t_blanes = chained(ntt.fft, x, iters)
            del os.environ["PLONKY2_TPU_NTT_BATCHLANES"]
        del os.environ["PLONKY2_TPU_NO_MXU_NTT"]
        t_mxu = chained(ntt_mxu.fft, x, iters)
        t_single = single(ntt.fft, x)
        el = batch * n
        rec = {
            "butterfly_el_per_s": round(el / t_bfly, 0),
            "mxu_el_per_s": round(el / t_mxu, 0),
            "single_dispatch_el_per_s": round(el / t_single, 0),
            "single_dispatch_latency_ms": round(t_single * 1e3, 3),
            "mxu_faster": bool(t_mxu < t_bfly),
        }
        if t_blanes is not None:
            rec["batchlanes_el_per_s"] = round(el / t_blanes, 0)
        results[f"2^{lg_n}x{batch}"] = rec
        if rec["mxu_faster"] and crossover is None:
            crossover = lg_n
        print(json.dumps({f"2^{lg_n}x{batch}": rec}), flush=True)

    print(json.dumps({"measured_mxu_crossover_lg_n": crossover,
                      "current_MIN_LG_MXU": ntt._MIN_LG_MXU}), flush=True)


if __name__ == "__main__":
    main()
