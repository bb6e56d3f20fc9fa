"""secp256k1 curve gadget tests: witness values must match the native curve
(reference: ecdsa/src/gadgets/curve.rs tests)."""

import random

import pytest

from plonky2_tpu.ecdsa import curve as native
from plonky2_tpu.ecdsa.curve_gadgets import set_affine_point_target
from plonky2_tpu.ecdsa.nonnative import (
    get_nonnative_target, set_nonnative_target,
)
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

from test_starky_recursive import _check_all_rows

rng = random.Random(31)


def _point_value(witness, t):
    return (get_nonnative_target(witness, t.x),
            get_nonnative_target(witness, t.y))


def test_curve_add_double_valid():
    builder = CircuitBuilder(CircuitConfig.standard_ecc_config())
    g = native.GENERATOR
    p_val = g.mul(rng.randrange(2, native.N))
    q_val = g.mul(rng.randrange(2, native.N))
    p = builder.add_virtual_affine_point_target()
    q = builder.add_virtual_affine_point_target()
    builder.curve_assert_valid(p)
    s = builder.curve_add(p, q)
    d = builder.curve_double(p)
    n = builder.curve_neg(p)
    data = builder.build()

    pw = PartialWitness()
    set_affine_point_target(pw, p, p_val)
    set_affine_point_target(pw, q, q_val)
    witness = generate_partial_witness(pw, data.prover_only, data.common)

    sv = p_val.add(q_val)
    dv = p_val.double()
    assert _point_value(witness, s) == (sv.x, sv.y)
    assert _point_value(witness, d) == (dv.x, dv.y)
    assert _point_value(witness, n) == (p_val.x, (-p_val.y) % native.P)
    _check_all_rows(data, witness)


@pytest.mark.slow
@pytest.mark.skipif("PLONKY2_TPU_HEAVY" not in __import__("os").environ,
                    reason="two 320-bit scalar-mul circuits: hour-scale "
                           "build on this 1-core box; set PLONKY2_TPU_HEAVY=1")
def test_ecdsa_verify_message_circuit():
    """Full in-circuit ECDSA verification witness e2e (reference:
    ecdsa/src/gadgets/ecdsa.rs test_ecdsa_circuit_narrow): sign natively,
    verify in-circuit, every gate row must be satisfied."""
    from plonky2_tpu.ecdsa.curve import ECDSASecretKey, sign_message
    from plonky2_tpu.ecdsa.curve_gadgets import (
        ECDSAPublicKeyTarget, ECDSASignatureTarget, verify_message_circuit,
    )

    builder = CircuitBuilder(CircuitConfig.standard_ecc_config())
    msg_val = rng.randrange(1, native.N)
    sk = ECDSASecretKey(rng.randrange(1, native.N))
    pk_val = sk.to_public()
    sig_val = sign_message(msg_val, sk, k=0xABCDEF0123456789)

    msg = builder.add_virtual_nonnative_target(native.N)
    r = builder.add_virtual_nonnative_target(native.N)
    s = builder.add_virtual_nonnative_target(native.N)
    pk = ECDSAPublicKeyTarget(builder.add_virtual_affine_point_target())
    verify_message_circuit(builder, msg, ECDSASignatureTarget(r, s), pk)
    data = builder.build()

    pw = PartialWitness()
    set_nonnative_target(pw, msg, msg_val)
    set_nonnative_target(pw, r, sig_val.r)
    set_nonnative_target(pw, s, sig_val.s)
    set_affine_point_target(pw, pk.point, pk_val.point)
    witness = generate_partial_witness(pw, data.prover_only, data.common)
    _check_all_rows(data, witness)


@pytest.mark.slow
@pytest.mark.skipif("PLONKY2_TPU_HEAVY" not in __import__("os").environ,
                    reason="320-bit scalar-mul circuit: hour-scale build on "
                           "this 1-core box; set PLONKY2_TPU_HEAVY=1")
def test_curve_scalar_mul_and_glv():
    builder = CircuitBuilder(CircuitConfig.standard_ecc_config())
    g = native.GENERATOR
    p_val = g.mul(rng.randrange(2, native.N))
    k_val = rng.randrange(2, native.N)
    p = builder.add_virtual_affine_point_target()
    k = builder.add_virtual_nonnative_target(native.N)
    out = builder.glv_mul(p, k)
    data = builder.build()

    pw = PartialWitness()
    set_affine_point_target(pw, p, p_val)
    set_nonnative_target(pw, k, k_val)
    witness = generate_partial_witness(pw, data.prover_only, data.common)
    expect = p_val.mul(k_val)
    assert _point_value(witness, out) == (expect.x, expect.y)


@pytest.mark.slow
@pytest.mark.skipif("PLONKY2_TPU_HEAVY" not in __import__("os").environ,
                    reason="full prove of the ECDSA circuit; set "
                           "PLONKY2_TPU_HEAVY=1")
def test_ecdsa_verify_message_circuit_proves_e2e():
    """Full PROVE + verify of in-circuit ECDSA verification — the reference
    proves this (reference: ecdsa/src/gadgets/ecdsa.rs:57-106
    test_ecdsa_circuit_narrow builds AND data.prove + data.verify)."""
    from plonky2_tpu.ecdsa.curve import ECDSASecretKey, sign_message
    from plonky2_tpu.ecdsa.curve_gadgets import (
        ECDSAPublicKeyTarget, ECDSASignatureTarget, verify_message_circuit,
    )

    builder = CircuitBuilder(CircuitConfig.standard_ecc_config())
    msg_val = rng.randrange(1, native.N)
    sk = ECDSASecretKey(rng.randrange(1, native.N))
    pk_val = sk.to_public()
    sig_val = sign_message(msg_val, sk, k=0xABCDEF0123456789)

    msg = builder.add_virtual_nonnative_target(native.N)
    r = builder.add_virtual_nonnative_target(native.N)
    s = builder.add_virtual_nonnative_target(native.N)
    pk = ECDSAPublicKeyTarget(builder.add_virtual_affine_point_target())
    verify_message_circuit(builder, msg, ECDSASignatureTarget(r, s), pk)
    data = builder.build()

    pw = PartialWitness()
    set_nonnative_target(pw, msg, msg_val)
    set_nonnative_target(pw, r, sig_val.r)
    set_nonnative_target(pw, s, sig_val.s)
    set_affine_point_target(pw, pk.point, pk_val.point)
    proof = data.prove(pw)
    data.verify(proof)
