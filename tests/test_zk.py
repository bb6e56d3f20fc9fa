"""Zero-knowledge config: blinding rows + salted oracles
(reference: CircuitConfig::standard_recursion_zk_config, circuit_builder.rs
blind:894-940)."""

import dataclasses

import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


@pytest.mark.slow
def test_zk_fibonacci_prove_verify():
    config = dataclasses.replace(CircuitConfig.standard_recursion_config(),
                                 zero_knowledge=True)
    builder = CircuitBuilder(config)
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(30):
        prev, cur = cur, builder.add(prev, cur)
    for t in (a, b, cur):
        builder.register_public_input(t)
    data = builder.build()
    assert data.common.fri_params.hiding

    pw = PartialWitness()
    pw.set_target(a, 0)
    pw.set_target(b, 1)
    proof = data.prove(pw)
    fib = [0, 1]
    for _ in range(30):
        fib.append((fib[-1] + fib[-2]) % ref.ORDER)
    assert proof.public_inputs == [0, 1, fib[31]]
    data.verify(proof)

    # two proofs of the same statement must differ (blinding randomness)
    proof2 = data.prove(pw)
    assert proof2.proof.wires_cap != proof.proof.wires_cap
