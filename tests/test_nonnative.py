"""Nonnative field gadget tests over the secp256k1 base field
(reference: ecdsa/src/gadgets/nonnative.rs tests)."""

import random

from plonky2_tpu.ecdsa.curve import P as SECP_P
from plonky2_tpu.ecdsa.nonnative import (
    get_nonnative_target, set_nonnative_target,
)
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

from test_starky_recursive import _check_all_rows

rng = random.Random(23)


def test_nonnative_ops_witness():
    builder = CircuitBuilder(CircuitConfig.standard_ecc_config())
    a_val = rng.randrange(SECP_P)
    b_val = rng.randrange(1, SECP_P)
    a = builder.add_virtual_nonnative_target(SECP_P)
    b = builder.add_virtual_nonnative_target(SECP_P)
    s = builder.add_nonnative(a, b)
    d = builder.sub_nonnative(a, b)
    p = builder.mul_nonnative(a, b)
    inv = builder.inv_nonnative(b)
    neg = builder.neg_nonnative(a)
    data = builder.build()

    pw = PartialWitness()
    set_nonnative_target(pw, a, a_val)
    set_nonnative_target(pw, b, b_val)
    witness = generate_partial_witness(pw, data.prover_only, data.common)

    assert get_nonnative_target(witness, s) == (a_val + b_val) % SECP_P
    assert get_nonnative_target(witness, d) == (a_val - b_val) % SECP_P
    assert get_nonnative_target(witness, p) == (a_val * b_val) % SECP_P
    assert get_nonnative_target(witness, inv) == pow(b_val, SECP_P - 2, SECP_P)
    assert get_nonnative_target(witness, neg) == (-a_val) % SECP_P
    _check_all_rows(data, witness)
