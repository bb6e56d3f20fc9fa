"""Recursive-verifier circuit: build + witness-satisfaction test.

Builds an inner fibonacci proof, then an OUTER circuit that verifies it
in-circuit, generates the outer witness, and checks every gate constraint
row vanishes on the witness (pure python-int evaluation — validates the whole
recursive gadget stack without paying the device prover compile).

The full outer prove+verify is exercised by tests/test_recursion_e2e.py
(slow, device-bound).
"""

import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.hash.poseidon_fast import INT
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.recursion.targets import (
    add_virtual_proof_with_pis, add_virtual_verifier_data,
    set_proof_with_pis_target, set_verifier_data_target,
)
from plonky2_tpu.recursion.verifier import verify_proof_circuit


def _inner_proof():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)
    builder.register_public_input(a)
    builder.register_public_input(b)
    builder.register_public_input(cur)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(a, 0)
    pw.set_target(b, 1)
    return data, data.prove(pw)


@pytest.mark.slow
def test_recursive_circuit_witness_satisfied():
    inner, inner_proof = _inner_proof()
    inner.verify(inner_proof)

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_proof_with_pis(builder, inner.common)
    vt = add_virtual_verifier_data(builder,
                                   inner.common.config.fri_config.cap_height)
    verify_proof_circuit(builder, pt, vt, inner.common)
    builder.register_public_inputs(pt.public_inputs)
    outer = builder.build()
    print(f"outer degree: {outer.common.degree}, "
          f"gates: {[g.id()[:30] for g in outer.common.gates]}")

    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vt, inner.verifier_only)
    witness = generate_partial_witness(pw, outer.prover_only, outer.common)

    # every gate row's constraints must vanish on the generated witness
    wires_np = witness.full_witness()   # [num_wires, n]
    pis = [witness.get(t) for t in outer.prover_only.public_inputs]
    from plonky2_tpu.hash.poseidon import hash_public_inputs_oracle
    pi_hash = hash_public_inputs_oracle(pis)

    # reconstruct per-row gate instances from the builder... the builder is
    # consumed by build(); re-evaluate via selectors: find each row's gate by
    # its selector value.
    num_selectors = outer.common.selectors_info.num_selectors
    # selector columns are the first rows of the constants_sigmas polynomials
    cs = outer.prover_only.constants_sigmas_commitment.polynomials
    cs_vals = None  # selector values at subgroup points = committed values
    # Rather than IFFT back, recompute from the builder path: constants
    # columns are stored in the commitment in *coefficient* form; easiest is
    # to evaluate via the stored sigmas? Instead: regenerate selector values
    # from gate instances is not available post-build; so check constraints
    # through the LDE-free path: evaluate each gate directly by scanning all
    # gates and using the filter semantics on the selector value.
    import numpy as np
    from plonky2_tpu.ops import ntt
    import jax
    cs_vals = np.asarray(
        jax.device_get(ntt.fft(cs).to_u64()))  # [num_preprocessed, n]

    n = outer.common.degree
    gates = outer.common.gates
    checked_rows = 0
    for row in range(n):
        sel_vals = [int(cs_vals[s][row]) for s in range(num_selectors)]
        gate_idx = None
        for s, sv in enumerate(sel_vals):
            if sv != (1 << 32) - 1 and sv < len(gates):
                gate_idx = sv
                break
        assert gate_idx is not None, f"row {row}: no live selector"
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
        checked_rows += 1
    print(f"checked {checked_rows} constraint rows — all satisfied")
