"""Multi-chip end-to-end PLONK prover: with a prover_mesh context active,
every PolynomialBatch commit runs column-sharded over the mesh, and the
resulting proof must be byte-identical to the single-device proof of an
identically-seeded circuit (reference's multi-GPU path, fri/oracle.rs
:288-301, only chunks one commit on one host — here the WHOLE prover's
commits span the mesh)."""

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.parallel.sharding import make_mesh, prover_mesh
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.utils.serialization import serialize_proof_with_pis


def _build_fib(seed):
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config(),
                             seed=seed)
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    prev, cur = a, b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)
    for t in (a, b, cur):
        builder.register_public_input(t)
    return builder.build()


def _inputs(data, a_val, b_val):
    pw = PartialWitness()
    pw.set_target(data.prover_only.public_inputs[0], a_val)
    pw.set_target(data.prover_only.public_inputs[1], b_val)
    return pw


def test_sharded_prove_bit_identical_to_single_device():
    data_s = _build_fib(seed=909)
    want = data_s.prove(_inputs(data_s, 0, 1))

    data_m = _build_fib(seed=909)
    with prover_mesh(make_mesh(8)):
        got = data_m.prove(_inputs(data_m, 0, 1))
    assert serialize_proof_with_pis(got, data_m.common) == \
        serialize_proof_with_pis(want, data_s.common)
    data_m.verify(got)
