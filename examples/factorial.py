#!/usr/bin/env python
"""Factorial example (reference: plonky2/examples/factorial.rs): prove
knowledge of 100! starting from a public initial value."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _bootstrap import setup  # noqa: E402

setup()

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def main():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    initial = builder.add_virtual_target()
    cur = initial
    for i in range(2, 101):
        cur = builder.mul_const(i, cur)
    builder.register_public_input(initial)
    builder.register_public_input(cur)

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial, 1)
    proof = data.prove(pw)
    print(f"100! (mod p): {proof.public_inputs[1]}")
    data.verify(proof)
    print("proof verified")


if __name__ == "__main__":
    main()
