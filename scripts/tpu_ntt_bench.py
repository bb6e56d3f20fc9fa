#!/usr/bin/env python
"""On-chip validation + throughput sweep for the MXU limb-matmul NTT.

1. bit-exactness vs the butterfly path (which itself is pinned to the
   host oracle by tests) at representative sizes
2. throughput sweep: single-poly 2^13..2^24 and the prover shape
   [135, 2^k], both plain fft and coset LDE, with HBM roofline fractions

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
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/plonky2_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    assert jax.devices()[0].platform == "tpu", jax.devices()

    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.ops import ntt, ntt_mxu

    ORDER = (1 << 64) - (1 << 32) + 1
    HBM = 819e9
    rng = np.random.default_rng(0)

    def rand(shape):
        return GF.from_u64(rng.integers(0, ORDER, size=shape,
                                        dtype=np.uint64))

    # -- correctness on chip (butterfly path forced via env kill switch
    #    inside a fresh jit; compare to the mxu module directly)
    os.environ["PLONKY2_TPU_NO_MXU_NTT"] = "1"
    for lg, batch in ((10, 4), (13, 2)):
        x = rand((batch, 1 << lg))
        a = jax.jit(ntt.fft)(x).to_u64()
        b = jax.jit(ntt_mxu.fft)(x).to_u64()
        ok_fft = bool(np.array_equal(a, b))
        al = jax.jit(lambda c: ntt.coset_lde(c, 3))(x).to_u64()
        bl = jax.jit(lambda c: ntt_mxu.lde_fft(c, 3, shift=7))(x).to_u64()
        ok_lde = bool(np.array_equal(al, bl))
        ai = jax.jit(ntt.coset_ifft)(x).to_u64()
        bi = jax.jit(lambda c: ntt_mxu.coset_ifft(c, 7))(x).to_u64()
        ok_ifft = bool(np.array_equal(ai, bi))
        print(json.dumps({"check": f"mxu_vs_butterfly_2^{lg}x{batch}",
                          "fft": ok_fft, "lde": ok_lde,
                          "coset_ifft": ok_ifft}), flush=True)
        if not (ok_fft and ok_lde and ok_ifft):
            print(json.dumps({"error": "MISMATCH — do not ship"}),
                  flush=True)
            return 1
    del os.environ["PLONKY2_TPU_NO_MXU_NTT"]

    def bench(fn, x, iters=10):
        out = fn(x)
        jax.block_until_ready(out.lo)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        jax.block_until_ready(out.lo)
        return (time.perf_counter() - t0) / iters

    # -- single-poly sweep: butterfly vs mxu
    for lg in (13, 16, 18, 20, 22, 24):
        x = rand((1 << lg,))
        dt_m = bench(jax.jit(ntt_mxu.fft), x)
        n = 1 << lg
        print(json.dumps({
            "metric": f"ntt_mxu_2^{lg}", "elements_per_s": round(n / dt_m),
            "ms": round(dt_m * 1e3, 2),
            "hbm_frac_lower_bound": round(n * 32 / dt_m / HBM, 3)}),
            flush=True)

    # -- prover shape [135, 2^k]: coset LDE rate 8
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

    # -- butterfly baselines for the comparison table
    os.environ["PLONKY2_TPU_NO_MXU_NTT"] = "1"
    for lg in (18, 24):
        x = rand((1 << lg,))
        dt_b = bench(jax.jit(ntt.fft), x, iters=3)
        print(json.dumps({"metric": f"ntt_butterfly_2^{lg}",
                          "elements_per_s": round((1 << lg) / dt_b),
                          "ms": round(dt_b * 1e3, 2)}), flush=True)
    x = rand((135, 1 << 13))
    dt_b = bench(jax.jit(lambda c: ntt.coset_lde(c, 3)), x, iters=3)
    print(json.dumps({"metric": "lde_butterfly_135x2^13_rate8",
                      "out_elements_per_s": round((135 << 16) / dt_b),
                      "ms": round(dt_b * 1e3, 2)}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
