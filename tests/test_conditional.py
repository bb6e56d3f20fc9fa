"""Conditional recursion: verify one of two proofs selected by a boolean
(reference: conditional_recursive_verifier.rs tests).

Witness-satisfaction check on the outer circuit for both condition values."""

import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.recursion.conditional import conditionally_verify_proof
from plonky2_tpu.recursion.targets import (
    add_virtual_proof_with_pis, add_virtual_verifier_data,
    set_proof_with_pis_target, set_verifier_data_target,
)

from test_starky_recursive import _check_all_rows


def _proof_of(n_steps):
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(n_steps):
        prev, cur = cur, builder.add(prev, cur)
    for t in (a, b, cur):
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 0)
    pw.set_target(b, 1)
    return data, data.prove(pw)


@pytest.mark.slow
@pytest.mark.skipif("PLONKY2_TPU_HEAVY" not in __import__("os").environ,
                    reason="double-verifier outer circuit: hour-scale on "
                           "this 1-core box; set PLONKY2_TPU_HEAVY=1")
def test_conditionally_verify_proof():
    # two DIFFERENT circuits with the same common data shape (same degree)
    data0, proof0 = _proof_of(99)
    data1, proof1 = _proof_of(98)
    assert data0.common.same_shape(data1.common)

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    condition = builder.add_virtual_target()
    builder.assert_bool(condition)
    pt0 = add_virtual_proof_with_pis(builder, data0.common)
    pt1 = add_virtual_proof_with_pis(builder, data1.common)
    cap_h = data0.common.config.fri_config.cap_height
    vt0 = add_virtual_verifier_data(builder, cap_h)
    vt1 = add_virtual_verifier_data(builder, cap_h)
    conditionally_verify_proof(builder, condition, pt0, vt0, pt1, vt1,
                               data0.common)
    outer = builder.build()

    for cond in (1, 0):
        pw = PartialWitness()
        pw.set_target(condition, cond)
        set_proof_with_pis_target(pw, pt0, proof0)
        set_proof_with_pis_target(pw, pt1, proof1)
        set_verifier_data_target(pw, vt0, data0.verifier_only)
        set_verifier_data_target(pw, vt1, data1.verifier_only)
        witness = generate_partial_witness(pw, outer.prover_only,
                                           outer.common)
        _check_all_rows(outer, witness)
