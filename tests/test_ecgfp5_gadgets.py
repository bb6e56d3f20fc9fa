"""EcGFp5 gadget tests: quintic-extension ops and curve add/double in-circuit
must match the native layer (reference: ecgfp5 gadgets tests)."""

import random

from plonky2_tpu.ecgfp5 import curve as ec
from plonky2_tpu.ecgfp5.gadgets import (
    MulGFp5Gate, set_curve_target, set_quintic_ext_target,
)
from plonky2_tpu.field import reference as ref
from plonky2_tpu.hash.poseidon_fast import INT
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

from test_gates import assert_vanishes, run_gate
from test_starky_recursive import _check_all_rows

rng = random.Random(61)


def _rand5():
    return tuple(rng.randrange(ref.ORDER) for _ in range(5))


def test_mul_gfp5_gate():
    g = MulGFp5Gate.from_config(CircuitConfig.standard_recursion_config())
    c = rng.randrange(ref.ORDER)
    ins = {}
    for i in range(g.num_ops()):
        for w in list(g.wires_multiplicand_0(i)) + \
                list(g.wires_multiplicand_1(i)):
            ins[w] = rng.randrange(ref.ORDER)
    wires = run_gate(g, ins, [c])
    assert_vanishes(g, wires, [c])
    a = tuple(wires[w] for w in g.wires_multiplicand_0(0))
    b = tuple(wires[w] for w in g.wires_multiplicand_1(0))
    out = tuple(wires[w] for w in g.wires_output(0))
    assert out == ref.extn_scalar_mul(ref.extn_mul(a, b, ec.W), c)


def test_quintic_and_curve_gadgets_witness():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a_val, b_val = _rand5(), _rand5()
    a = builder.add_virtual_quintic_ext_target()
    b = builder.add_virtual_quintic_ext_target()
    prod = builder.mul_quintic_ext(a, b)
    quot = builder.div_or_zero_quintic_ext(a, b)
    inv = builder.inverse_quintic_ext(b)

    p_val = ec.GENERATOR.mul(rng.randrange(2, 1000))
    q_val = ec.GENERATOR.mul(rng.randrange(1000, 2000))
    p = builder.add_virtual_curve_target()
    q = builder.add_virtual_curve_target()
    s = builder.curve_add_gfp5(p, q)
    d = builder.curve_double_gfp5(p)
    enc = builder.curve_encode_to_quintic_ext(p)
    data = builder.build()

    pw = PartialWitness()
    set_quintic_ext_target(pw, a, a_val)
    set_quintic_ext_target(pw, b, b_val)
    set_curve_target(pw, p, p_val)
    set_curve_target(pw, q, q_val)
    witness = generate_partial_witness(pw, data.prover_only, data.common)

    get5 = lambda t: tuple(witness.get(x) for x in t)
    assert get5(prod) == ref.extn_mul(a_val, b_val, ec.W)
    assert get5(quot) == ref.extn_mul(
        a_val, ref.extn_inverse(b_val, ec.W, ec.DTH_ROOT), ec.W)
    assert get5(inv) == ref.extn_inverse(b_val, ec.W, ec.DTH_ROOT)
    sv = p_val.add(q_val)
    dv = p_val.double()
    assert get5(s.x) == sv.x and get5(s.y) == sv.y
    assert witness.get(s.is_inf) == 0
    assert get5(d.x) == dv.x and get5(d.y) == dv.y
    assert get5(enc) == p_val.encode()
    _check_all_rows(data, witness)
