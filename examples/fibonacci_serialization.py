#!/usr/bin/env python
"""Circuit-data checkpoint/reload example (reference:
plonky2/examples/fibonacci_serialization.rs): build the fibonacci circuit,
serialize the full CircuitData to bytes, reload it, and prove + verify with
the reloaded instance — a built circuit is a persistable artifact, not a
per-process object."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _bootstrap import setup  # noqa: E402

setup()

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.utils.circuit_serialization import (
    deserialize_circuit_data, serialize_circuit_data,
    serialize_prover_circuit_data, serialize_verifier_circuit_data,
)


def main():
    config = CircuitConfig.standard_recursion_config()
    builder = CircuitBuilder(config)
    initial_a = builder.add_virtual_target()
    initial_b = builder.add_virtual_target()
    prev, cur = initial_a, initial_b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)
    for t in (initial_a, initial_b, cur):
        builder.register_public_input(t)
    data = builder.build()

    blob = serialize_circuit_data(data)
    print(f"CircuitData: {len(blob)} bytes "
          f"(prover split: {len(serialize_prover_circuit_data(data.prover_data()))}, "
          f"verifier split: {len(serialize_verifier_circuit_data(data.verifier_data()))})")

    restored = deserialize_circuit_data(blob)
    pw = PartialWitness()
    pw.set_target(initial_a, 0)
    pw.set_target(initial_b, 1)
    proof = restored.prove(pw)
    print(f"100th Fibonacci number (mod p): {proof.public_inputs[2]}")
    data.verify(proof)  # the ORIGINAL instance accepts the reloaded prover's proof
    print("proof from reloaded circuit verified")


if __name__ == "__main__":
    main()
