#!/usr/bin/env python
"""Recursion benchmark (reference: plonky2/examples/bench_recursion.rs):
dummy inner proof of ~2^size gates -> recursive wrap -> verify, with timings.

Usage: python examples/bench_recursion.py [--size 12]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _bootstrap import setup  # noqa: E402

setup()

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.recursion.dummy import dummy_circuit, dummy_proof
from plonky2_tpu.recursion.targets import (
    add_virtual_proof_with_pis, add_virtual_verifier_data,
    set_proof_with_pis_target, set_verifier_data_target,
)
from plonky2_tpu.recursion.verifier import verify_proof_circuit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=12,
                    help="log2 size of the inner dummy circuit")
    args = ap.parse_args()

    config = CircuitConfig.standard_recursion_config()
    t0 = time.perf_counter()
    inner, pis = dummy_circuit(config, args.size, 4)
    inner_proof = dummy_proof(inner, pis, {0: 42})
    inner.verify(inner_proof)
    t1 = time.perf_counter()
    print(f"inner 2^{args.size} proof: {t1 - t0:.2f}s")

    builder = CircuitBuilder(config)
    pt = add_virtual_proof_with_pis(builder, inner.common)
    vt = add_virtual_verifier_data(builder, config.fri_config.cap_height)
    verify_proof_circuit(builder, pt, vt, inner.common)
    builder.register_public_inputs(pt.public_inputs)
    outer = builder.build()
    t2 = time.perf_counter()
    print(f"wrap circuit build (degree 2^{outer.common.degree_bits}): "
          f"{t2 - t1:.2f}s")

    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vt, inner.verifier_only)
    wrap_proof = outer.prove(pw)
    t3 = time.perf_counter()
    print(f"recursive wrap proof: {t3 - t2:.2f}s")
    outer.verify(wrap_proof)
    print(f"wrap verified; public inputs {wrap_proof.public_inputs}")


if __name__ == "__main__":
    main()
