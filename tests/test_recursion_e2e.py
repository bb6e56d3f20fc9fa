"""Full recursion e2e: outer proof verifying an inner proof (slow — the outer
circuit is ~2^12 rows and every prover stage compiles for its shapes).

Reference: plonky2 recursion tests (test_recursive_verifier) and
examples/bench_recursion.rs single-wrap step.
"""

import pytest

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.recursion.targets import (
    add_virtual_proof_with_pis, add_virtual_verifier_data,
    set_proof_with_pis_target, set_verifier_data_target,
)
from plonky2_tpu.recursion.verifier import verify_proof_circuit


@pytest.mark.slow
def test_recursive_wrap_proves_and_verifies():
    # inner: fibonacci
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)
    for t in (a, b, cur):
        builder.register_public_input(t)
    inner = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 0)
    pw.set_target(b, 1)
    inner_proof = inner.prove(pw)
    inner.verify(inner_proof)

    # outer: verifies the inner proof in-circuit
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_proof_with_pis(builder, inner.common)
    vt = add_virtual_verifier_data(builder,
                                   inner.common.config.fri_config.cap_height)
    verify_proof_circuit(builder, pt, vt, inner.common)
    builder.register_public_inputs(pt.public_inputs)
    outer = builder.build()

    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vt, inner.verifier_only)
    outer_proof = outer.prove(pw)
    assert outer_proof.public_inputs == inner_proof.public_inputs
    outer.verify(outer_proof)
