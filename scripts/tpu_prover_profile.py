#!/usr/bin/env python
"""Host-vs-device breakdown of the full prover on the real chip
(VERDICT r2 item 4): fib(100) prove + the recursive wrap, each phase timed
via TimingTree (set PLONKY2_TPU_TIMING=1 to print the tree), warm numbers
after a cache-priming first run.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("PLONKY2_TPU_TIMING", "1")

import jax

from bench import _cache_dir
jax.config.update("jax_compilation_cache_dir", _cache_dir("tpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    assert jax.devices()[0].platform == "tpu"
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.recursion.targets import (
        add_virtual_proof_with_pis, add_virtual_verifier_data,
        set_proof_with_pis_target, set_verifier_data_target,
    )
    from plonky2_tpu.recursion.verifier import verify_proof_circuit
    from plonky2_tpu.utils.timing import TimingTree
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tests"))
    from golden_common import build_fib100

    print("== fib(100) prove ==", flush=True)
    data, proof = build_fib100()
    pw = PartialWitness()
    pw.set_target(data.prover_only.public_inputs[0], 0)
    pw.set_target(data.prover_only.public_inputs[1], 1)
    t0 = time.perf_counter()
    proof = data.prove(pw)          # warm (build_fib100 already proved once)
    print(f"fib warm prove: {time.perf_counter()-t0:.3f}s", flush=True)
    data.verify(proof)

    print("== recursive wrap ==", flush=True)
    config = CircuitConfig.standard_recursion_config()
    builder = CircuitBuilder(config)
    pt = add_virtual_proof_with_pis(builder, data.common)
    vt = add_virtual_verifier_data(builder, config.fri_config.cap_height)
    verify_proof_circuit(builder, pt, vt, data.common)
    t0 = time.perf_counter()
    outer = builder.build()
    print(f"outer build: {time.perf_counter()-t0:.1f}s", flush=True)
    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, proof)
    set_verifier_data_target(pw, vt, data.verifier_only)
    t0 = time.perf_counter()
    op = outer.prove(pw)
    print(f"wrap prove (cold): {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    op = outer.prove(pw)
    print(f"wrap prove (warm): {time.perf_counter()-t0:.3f}s", flush=True)
    outer.verify(op)
    print("wrap verified OK", flush=True)


if __name__ == "__main__":
    main()
