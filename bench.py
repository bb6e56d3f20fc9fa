#!/usr/bin/env python
"""Headline benchmark: polynomial-batch commit throughput (batched coset-LDE +
bit-reversed transpose + Poseidon-Merkle), the PLONK prover's dominant kernel
(reference workload shape: plonky2/benches/ffts.rs + benches/merkle.rs).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's CPU path commits 135 polys of 2^13 (rate 8) in
~1.1 s on a modern 16-core box (criterion ffts+merkle sums, extrapolated) —
recorded here as elements/s to compare against.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.fri.oracle import _commit_fn

    num_polys = 135
    lg_n = 13
    rate_bits = 3
    cap_height = 4
    n = 1 << lg_n

    rng = np.random.default_rng(0)
    coeffs = GF.from_u64(rng.integers(0, (1 << 64) - (1 << 32) + 1,
                                      size=(num_polys, n), dtype=np.uint64))
    salt = GF.zeros((0, n << rate_bits))
    fn = _commit_fn(num_polys, lg_n, rate_bits, cap_height, 0)

    # warmup/compile
    leaves, layers = fn(coeffs, salt)
    jax.block_until_ready(layers[-1].lo)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        leaves, layers = fn(coeffs, salt)
    jax.block_until_ready(layers[-1].lo)
    dt = (time.perf_counter() - t0) / iters

    total_elems = num_polys * (n << rate_bits)
    throughput = total_elems / dt
    # reference CPU estimate: 135 * 2^16 LDE elements in ~1.1 s ≈ 8.0e6 elem/s
    baseline = 8.0e6
    print(json.dumps({
        "metric": "poly_batch_commit_135x2^13_rate8",
        "value": round(throughput, 1),
        "unit": "lde_elements_per_s",
        "vs_baseline": round(throughput / baseline, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
