"""u32 gate + gadget tests: generator/constraint consistency (python-int),
and a circuit-level witness-satisfaction check of the u32 gadget layer."""

import random

from plonky2_tpu.field import reference as ref
from plonky2_tpu.gadgets.u32 import (
    U32AddManyGate, U32ArithmeticGate, U32SubtractionGate,
)
from plonky2_tpu.hash.poseidon_fast import INT
from plonky2_tpu.plonk.config import CircuitConfig

from test_gates import assert_vanishes, run_gate

CFG = CircuitConfig.standard_recursion_config()
rng = random.Random(21)


def test_u32_arithmetic_gate():
    g = U32ArithmeticGate.from_config(CFG)
    ins = {}
    for i in range(g.num_ops()):
        ins[g.wire_multiplicand_0(i)] = rng.randrange(1 << 32)
        ins[g.wire_multiplicand_1(i)] = rng.randrange(1 << 32)
        ins[g.wire_addend(i)] = rng.randrange(1 << 32)
    wires = run_gate(g, ins)
    assert_vanishes(g, wires)
    # output halves recombine to x*y+z
    x = ins[g.wire_multiplicand_0(0)]
    y = ins[g.wire_multiplicand_1(0)]
    z = ins[g.wire_addend(0)]
    assert (wires[g.wire_output_high(0)] << 32) | wires[g.wire_output_low(0)] \
        == x * y + z


def test_u32_add_many_gate():
    g = U32AddManyGate.from_config(CFG, 11)
    ins = {}
    for i in range(g.num_ops()):
        for j in range(11):
            ins[g.wire_addend(i, j)] = rng.randrange(1 << 32)
        ins[g.wire_carry(i)] = rng.randrange(4)
    wires = run_gate(g, ins)
    assert_vanishes(g, wires)


def test_u32_subtraction_gate():
    g = U32SubtractionGate.from_config(CFG)
    ins = {}
    for i in range(g.num_ops()):
        ins[g.wire_input_x(i)] = rng.randrange(1 << 32)
        ins[g.wire_input_y(i)] = rng.randrange(1 << 32)
        ins[g.wire_input_borrow(i)] = rng.randrange(2)
    wires = run_gate(g, ins)
    assert_vanishes(g, wires)
    x = ins[g.wire_input_x(0)]
    y = ins[g.wire_input_y(0)]
    b = ins[g.wire_input_borrow(0)]
    r, bo = wires[g.wire_output_result(0)], wires[g.wire_output_borrow(0)]
    assert r - (bo << 32) == x - y - b


def test_u32_gadget_circuit_witness():
    """Build a circuit with u32 ops and check every row's constraints vanish
    on the generated witness (no device prover needed)."""
    from plonky2_tpu.iop.generator import generate_partial_witness
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder

    builder = CircuitBuilder(CFG)
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    lo, hi = builder.mul_add_u32(a, b, builder.constant_u32(77))
    s, c = builder.add_many_u32([lo, hi, builder.constant_u32(5)])
    d, borrow = builder.sub_u32(s, lo)
    for t in (a, b, lo, hi, s, d):
        builder.register_public_input(t)
    data = builder.build()

    pw = PartialWitness()
    av, bv = 0xDEADBEEF, 0x12345678
    pw.set_target(a, av)
    pw.set_target(b, bv)
    witness = generate_partial_witness(pw, data.prover_only, data.common)
    pis = [witness.get(t) for t in data.prover_only.public_inputs]
    val = av * bv + 77
    assert pis[2] == val & 0xFFFFFFFF
    assert pis[3] == val >> 32
    assert pis[4] == (pis[2] + pis[3] + 5) & 0xFFFFFFFF
    assert pis[5] == (pis[4] - pis[2]) % (1 << 32)


def test_comparison_gate():
    from plonky2_tpu.gadgets.u32 import ComparisonGate
    g = ComparisonGate(32, 16)
    for a, b in [(0, 0), (5, 5), (3, 9), (9, 3),
                 (rng.randrange(1 << 32), rng.randrange(1 << 32)),
                 ((1 << 32) - 1, 0), (0, (1 << 32) - 1)]:
        ins = {g.wire_first_input(): a, g.wire_second_input(): b}
        wires = run_gate(g, ins)
        assert_vanishes(g, wires)
        assert wires[g.wire_result_bool()] == (1 if a <= b else 0)


def test_u32_range_check_gate():
    from plonky2_tpu.gadgets.u32 import U32RangeCheckGate
    g = U32RangeCheckGate(4)
    ins = {g.wire_ith_input_limb(i): rng.randrange(1 << 32) for i in range(4)}
    wires = run_gate(g, ins)
    assert_vanishes(g, wires)
    # an out-of-range input must violate a constraint
    g2 = U32RangeCheckGate(1)
    ins2 = {g2.wire_ith_input_limb(0): 1 << 32}
    wires2 = run_gate(g2, ins2)
    import pytest
    with pytest.raises(AssertionError):
        assert_vanishes(g2, wires2)
