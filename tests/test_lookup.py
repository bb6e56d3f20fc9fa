"""Lookup builder API (reference: plonky2/src/lookup_test.rs — builder-level
LUT API; the okx fork runs lookups generator-only with the logUp prover path
disabled). Witness-level check, no device prover needed."""

import pytest

from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def test_one_lookup_witness():
    table = [(i, (i * i + 7) % 256) for i in range(256)]
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    idx = builder.add_lookup_table_from_pairs(table)
    out_a = builder.add_lookup_from_index(a, idx)
    out_b = builder.add_lookup_from_index(b, idx)
    for t in (a, b, out_a, out_b):
        builder.register_public_input(t)
    data = builder.build()

    pw = PartialWitness()
    pw.set_target(a, 1)
    pw.set_target(b, 2)
    witness = generate_partial_witness(pw, data.prover_only, data.common)
    pis = [witness.get(t) for t in data.prover_only.public_inputs]
    assert pis == [1, 2, 8, 11]


def test_missing_table_panics():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    with pytest.raises(AssertionError):
        builder.add_lookup_from_index(a, 0)


def test_two_luts():
    t1 = [(i, i + 1) for i in range(16)]
    t2 = [(i, 2 * i) for i in range(16)]
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    i1 = builder.add_lookup_table_from_pairs(t1)
    i2 = builder.add_lookup_table_from_pairs(t2)
    o1 = builder.add_lookup_from_index(a, i1)
    o2 = builder.add_lookup_from_index(o1, i2)
    for t in (a, o1, o2):
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 5)
    witness = generate_partial_witness(pw, data.prover_only, data.common)
    pis = [witness.get(t) for t in data.prover_only.public_inputs]
    assert pis == [5, 6, 12]
