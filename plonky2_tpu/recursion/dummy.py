"""Dummy circuits/proofs — base cases for conditional and cyclic recursion.

Reference: plonky2/src/recursion/dummy_circuit.rs (cyclic_base_proof:37-66,
dummy_proof:71-88, dummy_circuit:90-122, dummy_proof_and_vk:124-148,
DummyProofGenerator:150-230).
"""

from __future__ import annotations

from ..iop.generator import SimpleGenerator
from ..iop.witness import PartialWitness
from ..plonk.circuit_builder import CircuitBuilder
from ..plonk.circuit_data import CircuitData, CommonCircuitData
from ..plonk.config import CircuitConfig
from .targets import (
    add_virtual_proof_with_pis, add_virtual_verifier_data,
    set_proof_with_pis_target, set_verifier_data_target,
)


def dummy_circuit(config: CircuitConfig, degree_bits: int,
                  num_public_inputs: int) -> tuple[CircuitData, list]:
    """A NoopGate-padded circuit of the given degree with unconstrained
    public inputs. Returns (data, pi_targets)."""
    builder = CircuitBuilder(config)
    pis = builder.add_virtual_targets(num_public_inputs)
    builder.register_public_inputs(pis)
    data = builder.build(min_degree_bits=degree_bits)
    assert data.common.degree_bits == degree_bits, \
        f"dummy circuit degree {data.common.degree_bits} != {degree_bits}"
    return data, pis


_DUMMY_CACHE: dict = {}


def dummy_circuit_for_common(common: CommonCircuitData
                             ) -> tuple[CircuitData, list]:
    """Generate a circuit matching the given CommonCircuitData
    (reference: dummy_circuit.rs:90-122)."""
    key = (id(common), common.num_public_inputs)
    if key in _DUMMY_CACHE:
        return _DUMMY_CACHE[key]
    assert not common.config.zero_knowledge, \
        "Degree calculation can be off if zero-knowledge is on."
    builder = CircuitBuilder(common.config)
    pis = builder.add_virtual_targets(common.num_public_inputs)
    builder.register_public_inputs(pis)
    for gate in common.gates:
        builder.add_gate_to_gate_set(gate)
    data = builder.build(min_degree_bits=common.degree_bits)
    assert data.common.same_shape(common), \
        "dummy circuit does not match the goal CommonCircuitData"
    _DUMMY_CACHE[key] = (data, pis)
    return data, pis


def dummy_proof(data: CircuitData, pi_targets: list,
                nonzero_public_inputs: dict[int, int] | None = None):
    """Prove the dummy circuit; unspecified public inputs default to zero."""
    nonzero_public_inputs = nonzero_public_inputs or {}
    pw = PartialWitness()
    for i, t in enumerate(pi_targets):
        pw.set_target(t, nonzero_public_inputs.get(i, 0))
    return data.prove(pw)


def cyclic_base_proof(common: CommonCircuitData, verifier_only,
                      nonzero_public_inputs: dict[int, int] | None = None):
    """Base proof for a cyclic recursion chain: a dummy proof whose trailing
    public inputs carry the cyclic verification key
    (reference: dummy_circuit.rs:37-66)."""
    pis = dict(nonzero_public_inputs or {})
    cap_elements = common.config.fri_config.num_cap_elements
    start = common.num_public_inputs - 4 - 4 * cap_elements
    for j, v in enumerate(verifier_only.circuit_digest):
        pis[start + j] = int(v)
    for i in range(cap_elements):
        for j, v in enumerate(verifier_only.constants_sigmas_cap[i]):
            pis[start + 4 + 4 * i + j] = int(v)
    data, pi_targets = dummy_circuit_for_common(common)
    return dummy_proof(data, pi_targets, pis)


class _OutShim:
    """PartialWitness-shaped collector for generator outputs."""

    def __init__(self, out):
        self.out = out

    def set_target(self, t, v):
        self.out.append((t, int(v)))


class DummyProofGenerator(SimpleGenerator):
    """Fills a proof target (and verifier data target) with a baked dummy
    proof (reference: dummy_circuit.rs:150-230)."""

    def __init__(self, pt, proof_with_pis, vt, verifier_data):
        self.pt = pt
        self.proof_with_pis = proof_with_pis
        self.vt = vt
        self.verifier_data = verifier_data

    def dependencies(self):
        return []

    def run_once(self, witness, out):
        shim = _OutShim(out)
        set_proof_with_pis_target(shim, self.pt, self.proof_with_pis)
        set_verifier_data_target(shim, self.vt, self.verifier_data)


def dummy_proof_and_vk(builder, common: CommonCircuitData):
    """Allocate targets pre-filled (by generator) with a dummy proof matching
    `common` (reference: dummy_circuit.rs:124-148)."""
    data, pi_targets = dummy_circuit_for_common(common)
    proof = dummy_proof(data, pi_targets)
    pt = add_virtual_proof_with_pis(builder, common)
    vt = add_virtual_verifier_data(builder, common.config.fri_config.cap_height)
    builder.add_simple_generator(
        DummyProofGenerator(pt, proof, vt, data.verifier_only))
    return pt, vt
