"""Dummy circuits/proofs — base cases for conditional and cyclic recursion.

Reference: plonky2/src/recursion/dummy_circuit.rs (dummy_circuit:20-45,
dummy_proof:47-80, cyclic_base_proof:37).
"""

from __future__ import annotations

from ..iop.witness import PartialWitness
from ..plonk.circuit_builder import CircuitBuilder
from ..plonk.circuit_data import CircuitData
from ..plonk.config import CircuitConfig


def dummy_circuit(config: CircuitConfig, degree_bits: int,
                  num_public_inputs: int) -> tuple[CircuitData, list]:
    """A NoopGate-padded circuit of the given degree with unconstrained
    public inputs. Returns (data, pi_targets)."""
    builder = CircuitBuilder(config)
    pis = builder.add_virtual_targets(num_public_inputs)
    builder.register_public_inputs(pis)
    data = builder.build(min_degree_bits=degree_bits)
    assert data.common.degree_bits == degree_bits, \
        f"dummy circuit degree {data.common.degree_bits} != {degree_bits}"
    return data, pis


def dummy_proof(data: CircuitData, pi_targets: list,
                nonzero_public_inputs: dict[int, int] | None = None):
    """Prove the dummy circuit; unspecified public inputs default to zero."""
    nonzero_public_inputs = nonzero_public_inputs or {}
    pw = PartialWitness()
    for i, t in enumerate(pi_targets):
        pw.set_target(t, nonzero_public_inputs.get(i, 0))
    return data.prove(pw)
