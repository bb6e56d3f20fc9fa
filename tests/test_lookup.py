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


def _witness_pis(data, pw):
    witness = generate_partial_witness(pw, data.prover_only, data.common)
    return [witness.get(t) for t in data.prover_only.public_inputs]


def test_many_lookups():
    """514 extra lookup slots force many LookupGate rows (reference:
    lookup_test.rs test_many_lookups:288-369)."""
    table = [(i, (i * 97 + 31) % 256) for i in range(256)]
    t_fn = dict(table)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    idx = builder.add_lookup_table_from_pairs(table)
    out_a = builder.add_lookup_from_index(a, idx)
    out_b = builder.add_lookup_from_index(b, idx)
    s = builder.add(out_a, out_b)
    for _ in range(514):
        builder.add_lookup_from_index(a, idx)
    table2 = [(i, (3 * i) % 512) for i in range(512)]
    idx2 = builder.add_lookup_table_from_pairs(table2)
    out_final = builder.add_lookup_from_index(s, idx2)
    for t in (a, b, s, out_a, out_b, out_final):
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 1)
    pw.set_target(b, 2)
    sum_val = t_fn[1] + t_fn[2]
    assert _witness_pis(data, pw) == [
        1, 2, sum_val, t_fn[1], t_fn[2], (3 * sum_val) % 512]


def test_same_luts():
    """The same table registered twice gets independent indices (reference:
    lookup_test.rs test_same_luts:371-425).

    Values are kept < 128 so `sum = t[1] + t[2]` stays inside the 0..255
    input domain of the second lookup (the reference's TIP5 values at 1, 2
    likewise sum in-domain)."""
    table = [(i, (i * 97 + 31) % 128) for i in range(256)]
    t_fn = dict(table)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    i1 = builder.add_lookup_table_from_pairs(table)
    o_a = builder.add_lookup_from_index(a, i1)
    o_b = builder.add_lookup_from_index(b, i1)
    s = builder.add(o_a, o_b)
    i2 = builder.add_lookup_table_from_pairs(table)
    assert i2 != i1
    o_final = builder.add_lookup_from_index(s, i2)
    for t in (a, b, s, o_a, o_b, o_final):
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 1)
    pw.set_target(b, 2)
    sum_val = t_fn[1] + t_fn[2]
    assert _witness_pis(data, pw) == [
        1, 2, sum_val, t_fn[1], t_fn[2], t_fn[sum_val]]


def test_out_of_domain_input_fails_loudly():
    """An input outside the table domain must abort witness generation
    (the fork's lookups are generator-only — no logUp constraint exists to
    reject it at verify time, so silent defaulting would be unsound)."""
    table = [(i, (i * 97 + 31) % 256) for i in range(256)]
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    idx = builder.add_lookup_table_from_pairs(table)
    out = builder.add_lookup_from_index(a, idx)
    for t in (a, out):
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 256)          # domain is 0..255
    with pytest.raises(ValueError, match="outside the table domain"):
        generate_partial_witness(pw, data.prover_only, data.common)


def test_different_inputs():
    """Two lookups into one multi-row LUT with different input targets
    (reference: lookup_test.rs test_different_inputs:210-286)."""
    lut_size = 1 << 10
    table = [(i, (i * 7 + 5) % lut_size) for i in range(lut_size)]
    t_fn = dict(table)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    idx = builder.add_lookup_table_from_pairs(table)
    o_a = builder.add_lookup_from_index(a, idx)
    o_b = builder.add_lookup_from_index(b, idx)
    for t in (a, b, o_a, o_b):
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 123)
    pw.set_target(b, 800)
    assert _witness_pis(data, pw) == [123, 800, t_fn[123], t_fn[800]]


def test_big_lut():
    """LUT larger than one gate row (reference: lookup_test.rs
    test_big_lut:427-469 with LUT_SIZE entries, fn = i // 10)."""
    lut_size = 1 << 12
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    idx = builder.add_lookup_table_from_fn(lambda i: i // 10,
                                           range(lut_size))
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    o_a = builder.add_lookup_from_index(a, idx)
    o_b = builder.add_lookup_from_index(b, idx)
    for t in (o_a, o_b):
        builder.register_public_input(t)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 51)
    pw.set_target(b, 2)
    assert _witness_pis(data, pw) == [5, 0]


def test_lookup_table_not_used():
    """Registering a table without any lookup still builds (reference:
    lookup_test.rs test_lookup_table_not_used:50-63)."""
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add(a, a)
    builder.add_lookup_table_from_pairs([(i, i + 1) for i in range(16)])
    builder.register_public_input(b)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 3)
    assert _witness_pis(data, pw) == [6]
