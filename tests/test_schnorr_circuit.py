"""In-circuit Schnorr verification over EcGFp5 (reference:
ecgfp5/src/gadgets/schnorr.rs:82-105 and its test): sign natively, verify
in-circuit with baked message/pk/sig constants, and require every gate row
to be satisfied; a tampered signature must NOT produce a satisfiable
witness."""

import os
import random

import pytest

from plonky2_tpu.ecgfp5 import curve as ec
from plonky2_tpu.ecgfp5.gadgets import schnorr_verify_circuit
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

from test_starky_recursive import _check_all_rows

rng = random.Random(97)


def _signed_message():
    pk, sk = ec.schnorr_keygen(rng.randrange(1, ec.N))
    msg = [rng.randrange(0xFFFFFFFF00000001) for _ in range(4)]
    sig = ec.schnorr_sign(msg, sk, k=rng.randrange(1, ec.N))
    assert ec.schnorr_verify(msg, pk, sig)
    return msg, pk, sig


@pytest.mark.slow
@pytest.mark.skipif("PLONKY2_TPU_HEAVY" not in os.environ,
                    reason="two 319-bit curve scalar-mul circuits: "
                           "hour-scale on this box; set PLONKY2_TPU_HEAVY=1")
def test_schnorr_verify_circuit_witness():
    msg, pk, sig = _signed_message()
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    schnorr_verify_circuit(builder, msg, pk, sig)
    data = builder.build()
    witness = generate_partial_witness(PartialWitness(), data.prover_only,
                                       data.common)
    _check_all_rows(data, witness)


@pytest.mark.slow
@pytest.mark.skipif("PLONKY2_TPU_HEAVY" not in os.environ,
                    reason="set PLONKY2_TPU_HEAVY=1")
def test_schnorr_verify_circuit_rejects_tampered_sig():
    msg, pk, sig = _signed_message()
    bad = ec.SchnorrSignature((sig.s + 1) % ec.N, sig.e)
    assert not ec.schnorr_verify(msg, pk, bad)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    schnorr_verify_circuit(builder, msg, pk, bad)
    data = builder.build()
    with pytest.raises(Exception):
        witness = generate_partial_witness(PartialWitness(),
                                           data.prover_only, data.common)
        _check_all_rows(data, witness)


@pytest.mark.slow
@pytest.mark.skipif("PLONKY2_TPU_HEAVY" not in os.environ,
                    reason="full prove of the Schnorr circuit; set "
                           "PLONKY2_TPU_HEAVY=1")
def test_schnorr_verify_circuit_proves_e2e():
    """Full PROVE + verify of the in-circuit Schnorr verification —
    the reference's schnorr gadget test proves end-to-end
    (reference: ecgfp5/src/gadgets/schnorr.rs:82-105 test)."""
    msg, pk, sig = _signed_message()
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    schnorr_verify_circuit(builder, msg, pk, sig)
    data = builder.build()
    proof = data.prove(PartialWitness())
    data.verify(proof)
