#!/usr/bin/env python
"""Fibonacci example (reference: plonky2/examples/fibonacci.rs): prove
knowledge of the 100th Fibonacci number from public initial values."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _bootstrap import setup  # noqa: E402

setup()

from plonky2_tpu.field import reference as ref
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.utils.timing import TimingTree


def main():
    config = CircuitConfig.standard_recursion_config()
    builder = CircuitBuilder(config)

    initial_a = builder.add_virtual_target()
    initial_b = builder.add_virtual_target()
    prev, cur = initial_a, initial_b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)

    builder.register_public_input(initial_a)
    builder.register_public_input(initial_b)
    builder.register_public_input(cur)

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial_a, 0)
    pw.set_target(initial_b, 1)

    timing = TimingTree(enabled=True)
    proof = data.prove(pw)
    print(f"100th Fibonacci number (mod p): {proof.public_inputs[2]}")
    data.verify(proof)
    print("proof verified")


if __name__ == "__main__":
    main()
