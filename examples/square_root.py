#!/usr/bin/env python
"""Square root example (reference: plonky2/examples/square_root.rs): a custom
SimpleGenerator computes sqrt(x) out-of-circuit while the circuit constrains
x == sqrt^2, plus a circuit+proof serialization roundtrip."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _bootstrap import setup  # noqa: E402

setup()

from plonky2_tpu.field import reference as ref
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.utils.serialization import (
    deserialize_proof_with_pis, serialize_proof_with_pis,
)


class SquareRootGenerator(SimpleGenerator):
    """x_squared -> x = sqrt(x_squared) (reference: square_root.rs
    SquareRootGenerator)."""

    def __init__(self, x, x_squared):
        self.x, self.x_squared = x, x_squared

    def dependencies(self):
        return [self.x_squared]

    def run_once(self, witness, out):
        x2 = witness.get(self.x_squared)
        # sqrt in Goldilocks: exponent (p+1)/4 fails (p % 4 == 1); use
        # Tonelli-Shanks via the 2-adic structure
        out.append((self.x, _sqrt(x2)))


def _sqrt(a: int) -> int:
    """Tonelli-Shanks for p = 2^64 - 2^32 + 1 (2-adicity 32)."""
    p = ref.ORDER
    if a == 0:
        return 0
    assert pow(a, (p - 1) // 2, p) == 1, "not a quadratic residue"
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 7  # multiplicative group generator is a non-residue
    while pow(z, (p - 1) // 2, p) == 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t, r = t * c % p, r * b % p
    return r


def main():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    x_squared = builder.square(x)
    builder.register_public_input(x_squared)
    builder.add_simple_generator(SquareRootGenerator(x, x_squared))

    data = builder.build()
    x_value = 8846460
    x2_value = x_value * x_value % ref.ORDER
    pw = PartialWitness()
    pw.set_target(x_squared, x2_value)
    proof = data.prove(pw)
    print(f"proved knowledge of sqrt({x2_value})")
    data.verify(proof)

    blob = serialize_proof_with_pis(proof, data.common)
    restored = deserialize_proof_with_pis(blob, data.common)
    data.verify(restored)
    print(f"serialization roundtrip OK ({len(blob)} bytes)")


if __name__ == "__main__":
    main()
