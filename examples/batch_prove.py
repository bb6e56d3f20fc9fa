#!/usr/bin/env python
"""Batch proving demo (no reference analog): prove B fibonacci witnesses of
one circuit through the vmapped device phases and verify each proof.

Usage: python examples/batch_prove.py [B]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _bootstrap import setup  # noqa: E402

setup()

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.batch_prover import prove_batch
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)
    for t in (a, b, cur):
        builder.register_public_input(t)
    t0 = time.perf_counter()
    data = builder.build()
    print(f"build: {time.perf_counter() - t0:.2f}s "
          f"(degree 2^{data.common.degree_bits})")

    def inputs(x, y):
        pw = PartialWitness()
        pw.set_target(a, x)
        pw.set_target(b, y)
        return pw

    batch_inputs = [inputs(i, i + 1) for i in range(B)]
    t0 = time.perf_counter()
    proofs = prove_batch(data.prover_only, data.common, batch_inputs)
    dt = time.perf_counter() - t0
    for p in proofs:
        data.verify(p)
    print(f"{B} proofs in {dt:.2f}s ({B / dt:.2f} proofs/s), all verified")
    print("fib(100) for (a=0,b=1):",
          proofs[0].public_inputs[2] if B else None)


if __name__ == "__main__":
    main()
