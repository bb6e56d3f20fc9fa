"""BigUint gadget tests: witness generation + full constraint-row check
(reference: ecdsa/src/gadgets/biguint.rs tests)."""

import random

from plonky2_tpu.ecdsa.biguint import get_biguint_target, set_biguint_target
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

from test_starky_recursive import _check_all_rows

rng = random.Random(17)


def test_biguint_ops_witness():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a_val = rng.getrandbits(256)
    b_val = rng.getrandbits(192)
    a = builder.add_virtual_biguint_target(8)
    b = builder.add_virtual_biguint_target(6)
    s = builder.add_biguint(a, b)
    d = builder.sub_biguint(a, b)     # a > b whp
    p = builder.mul_biguint(a, b)
    q, r = builder.div_rem_biguint(a, b)
    le = builder.cmp_biguint(b, a)    # b <= a
    data = builder.build()

    pw = PartialWitness()
    set_biguint_target(pw, a, a_val)
    set_biguint_target(pw, b, b_val)
    witness = generate_partial_witness(pw, data.prover_only, data.common)

    assert get_biguint_target(witness, s) == a_val + b_val
    assert get_biguint_target(witness, d) == a_val - b_val
    assert get_biguint_target(witness, p) == a_val * b_val
    assert get_biguint_target(witness, q) == a_val // b_val
    assert get_biguint_target(witness, r) == a_val % b_val
    assert witness.get(le) == 1
    _check_all_rows(data, witness)
