#!/usr/bin/env python
"""Range check example (reference: plonky2/examples/range_check.rs): prove a
public value fits in 6 bits."""

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
    value = builder.add_virtual_target()
    builder.range_check(value, 6)
    builder.register_public_input(value)

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(value, 42)
    proof = data.prove(pw)
    print(f"value {proof.public_inputs[0]} is in [0, 2^6)")
    data.verify(proof)
    print("proof verified")


if __name__ == "__main__":
    main()
