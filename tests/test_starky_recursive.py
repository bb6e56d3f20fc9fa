"""Recursive STARK verification: an outer plonky2 circuit verifies a STARK
proof; the outer witness must satisfy every gate constraint
(reference: starky/src/recursive_verifier.rs tests; strategy mirrors
tests/test_recursion_build.py)."""

import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.starky.config import StarkConfig
from plonky2_tpu.starky.fibonacci_stark import FibonacciStark
from plonky2_tpu.starky.prover import prove
from plonky2_tpu.starky.recursive_verifier import (
    add_virtual_stark_proof_with_pis, set_stark_proof_with_pis_target,
    verify_stark_proof_circuit,
)
from plonky2_tpu.starky.verifier import verify_stark_proof


def _check_all_rows(outer, witness):
    import jax
    import numpy as np

    from plonky2_tpu.hash.poseidon import hash_public_inputs_oracle
    from plonky2_tpu.hash.poseidon_fast import INT
    from plonky2_tpu.ops import ntt

    wires_np = witness.full_witness()
    pis = [witness.get(t) for t in outer.prover_only.public_inputs]
    pi_hash = hash_public_inputs_oracle(pis)
    num_selectors = outer.common.selectors_info.num_selectors
    cs = outer.prover_only.constants_sigmas_commitment.polynomials
    cs_vals = np.asarray(jax.device_get(ntt.fft(cs).to_u64()))
    n = outer.common.degree
    gates = outer.common.gates
    for row in range(n):
        gate_idx = None
        for s in range(num_selectors):
            sv = int(cs_vals[s][row])
            if sv != (1 << 32) - 1 and sv < len(gates):
                gate_idx = sv
                break
        assert gate_idx is not None
        gate = gates[gate_idx]
        if gate.num_constraints() == 0:
            continue
        consts = [int(cs_vals[num_selectors + j][row])
                  for j in range(outer.common.num_constants - num_selectors)]
        wires_row = [int(wires_np[w][row])
                     for w in range(outer.common.config.num_wires)]
        cons = gate.eval_unfiltered(INT, consts, wires_row, pi_hash)
        bad = [k for k, c in enumerate(cons) if c % ref.ORDER != 0]
        assert not bad, f"row {row} gate {gate.id()}: constraints {bad} != 0"


@pytest.mark.slow
def test_recursive_stark_verifier_witness_satisfied():
    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)

    def fib(n, x0, x1):
        for _ in range(n):
            x0, x1 = x1, (x0 + x1) % ref.ORDER
        return x1

    public_inputs = [0, 1, fib(num_rows - 1, 0, 1)]
    trace = stark.generate_trace(0, 1)
    proof = prove(stark, config, trace, public_inputs)
    verify_stark_proof(stark, proof, config)

    degree_bits = 5
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_stark_proof_with_pis(builder, stark, config, degree_bits)
    verify_stark_proof_circuit(builder, stark, pt, config, degree_bits)
    builder.register_public_inputs(pt.public_inputs)
    outer = builder.build()

    pw = PartialWitness()
    set_stark_proof_with_pis_target(pw, pt, proof)
    witness = generate_partial_witness(pw, outer.prover_only, outer.common)
    _check_all_rows(outer, witness)


@pytest.mark.slow
def test_recursive_stark_verifier_with_lookups():
    """logUp lookup constraints inside the recursive verifier
    (reference: permutation_stark.rs recursive test)."""
    from plonky2_tpu.starky.permutation_stark import PermutationStark

    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = PermutationStark()
    trace = stark.generate_trace(7, num_rows)
    proof = prove(stark, config, trace, [7])
    verify_stark_proof(stark, proof, config)

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_stark_proof_with_pis(builder, stark, config, 5)
    verify_stark_proof_circuit(builder, stark, pt, config, 5)
    builder.register_public_inputs(pt.public_inputs)
    outer = builder.build()

    pw = PartialWitness()
    set_stark_proof_with_pis_target(pw, pt, proof)
    witness = generate_partial_witness(pw, outer.prover_only, outer.common)
    _check_all_rows(outer, witness)


@pytest.mark.skipif("PLONKY2_TPU_HEAVY" not in __import__("os").environ,
                    reason="full outer prove is minutes-scale on the "
                           "1-core box; set PLONKY2_TPU_HEAVY=1")
def test_recursive_stark_verifier_proves_e2e():
    """Full outer PROVE + verify of the recursive STARK verifier circuit —
    the reference proves this end-to-end
    (reference: starky/src/recursive_verifier.rs tests
    test_recursive_stark_verifier)."""
    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)

    def fib(n, x0, x1):
        for _ in range(n):
            x0, x1 = x1, (x0 + x1) % ref.ORDER
        return x1

    public_inputs = [0, 1, fib(num_rows - 1, 0, 1)]
    trace = stark.generate_trace(0, 1)
    proof = prove(stark, config, trace, public_inputs)
    verify_stark_proof(stark, proof, config)

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_stark_proof_with_pis(builder, stark, config, 5)
    verify_stark_proof_circuit(builder, stark, pt, config, 5)
    builder.register_public_inputs(pt.public_inputs)
    outer = builder.build()

    pw = PartialWitness()
    set_stark_proof_with_pis_target(pw, pt, proof)
    outer_proof = outer.prove(pw)
    assert outer_proof.public_inputs[:3] == public_inputs
    outer.verify(outer_proof)
