"""Circom/solidity export: the emitted straight-line program must compute
the same constraint values as the python-int evaluation
(reference: gates' export_circom_verification_code)."""

import random
import re

from plonky2_tpu.field import reference as ref
from plonky2_tpu.gates.basic_gates import ArithmeticGate, ConstantGate
from plonky2_tpu.gates.extension_gates import MulExtensionGate
from plonky2_tpu.gates.poseidon_gate import PoseidonGate
from plonky2_tpu.hash.poseidon_fast import INT
from plonky2_tpu.plonk.config import CircuitConfig

from test_gates import run_gate

rng = random.Random(51)
CFG = CircuitConfig.standard_recursion_config()


def _interpret_circom(code: str, consts, wires, pi_hash):
    """Evaluate the emitted program with ext2 semantics."""
    env = {}

    def val(expr):
        expr = expr.strip()
        m = re.fullmatch(r"constants\[\$NUM_SELECTORS \+ (\d+)\]", expr)
        if m:
            return (consts[int(m.group(1))] % ref.ORDER, 0)
        m = re.fullmatch(r"wires\[(\d+)\]", expr)
        if m:
            return (wires[int(m.group(1))] % ref.ORDER, 0)
        m = re.fullmatch(r"GlExt\(public_input_hash\[(\d+)\], 0\)\(\)", expr)
        if m:
            return (pi_hash[int(m.group(1))] % ref.ORDER, 0)
        return env[expr]

    outs = {}
    for line in code.splitlines():
        line = line.strip()
        m = re.fullmatch(r"(c_\d+)\[0\] <== (\d+); \1\[1\] <== 0;", line)
        if m:
            env[m.group(1)] = (int(m.group(2)), 0)
            continue
        m = re.fullmatch(
            r"(ev_\d+) <== (GlExtAdd|GlExtSub|GlExtMul)\(\)\((.*), (.*)\);",
            line)
        if m:
            # the args are simple tokens (no nested calls with commas except
            # the GlExt pi pattern, which contains no ', ' after the first)
            name, op, a, b = m.groups()
            fa, fb = val(a), val(b)
            fn = {"GlExtAdd": ref.ext2_add, "GlExtSub": ref.ext2_sub,
                  "GlExtMul": ref.ext2_mul}[op]
            env[name] = fn(fa, fb)
            continue
        m = re.fullmatch(
            r"out\[(\d+)\] <== ConstraintPush\(\)\(constraints\[\d+\], "
            r"filter, (.*)\);", line)
        if m:
            outs[int(m.group(1))] = val(m.group(2))
    return [outs[k] for k in sorted(outs)]


def _check_gate(gate, inputs, consts=None):
    consts = consts or [rng.randrange(ref.ORDER)
                        for _ in range(gate.num_constants())]
    wires = run_gate(gate, inputs, consts)
    pi = [rng.randrange(ref.ORDER) for _ in range(4)]
    want = [(c % ref.ORDER, 0) if isinstance(c, int) else tuple(c)
            for c in gate.eval_unfiltered(INT, consts, wires, pi)]
    # INT algebra yields ints; compare against circom program's c0
    code = gate.export_circom_verification_code()
    assert "template" in code and "ConstraintPush" in code
    got = _interpret_circom(code, consts, wires, pi)
    assert len(got) == gate.num_constraints()
    for g, w in zip(got, want):
        assert g[0] == (w if isinstance(w, int) else w[0]) % ref.ORDER


def test_arithmetic_gate_export():
    g = ArithmeticGate.from_config(CFG)
    ins = {}
    for i in range(g.num_ops()):
        ins[g.wire_multiplicand_0(i)] = rng.randrange(ref.ORDER)
        ins[g.wire_multiplicand_1(i)] = rng.randrange(ref.ORDER)
        ins[g.wire_addend(i)] = rng.randrange(ref.ORDER)
    _check_gate(g, ins)


def test_poseidon_gate_export_structure():
    code = PoseidonGate().export_circom_verification_code()
    assert "template" in code
    assert code.count("ConstraintPush") == PoseidonGate().num_constraints()
    sol = ConstantGate(2).export_solidity_verification_code()
    assert "library" in sol and "GatesUtilsLib.push" in sol
