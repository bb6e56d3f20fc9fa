"""Batch prover: B proofs of one circuit through vmapped device phases must
be BIT-IDENTICAL to serial `prove` calls (same transcripts, same bytes) and
verify. Reference semantics per proof: prover.rs:104-355; the cross-proof
batching axis itself has no reference analog."""

import numpy as np

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.batch_prover import prove_batch
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.utils.serialization import serialize_proof_with_pis


def _fib_inputs(data, a_val, b_val):
    # targets a, b are the first two public inputs
    a, b = data.prover_only.public_inputs[0], data.prover_only.public_inputs[1]
    pw = PartialWitness()
    pw.set_target(a, a_val)
    pw.set_target(b, b_val)
    return pw


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


def test_batch_prover_bit_identical_to_serial():
    """Two identically-seeded circuits: unconstrained-wire randomness
    (RandomValueGenerator) draws from the builder's stateful rng, so the
    serial pair and the batch pair must consume the stream in the same
    order for byte equality to be meaningful."""
    data_s = _build_fib(seed=77)
    serial_proofs = [data_s.prove(_fib_inputs(data_s, 0, 1)),
                     data_s.prove(_fib_inputs(data_s, 2, 5))]

    data_b = _build_fib(seed=77)
    batch = prove_batch(data_b.prover_only, data_b.common,
                        [_fib_inputs(data_b, 0, 1),
                         _fib_inputs(data_b, 2, 5)])
    assert len(batch) == 2
    for got, want in zip(batch, serial_proofs):
        assert got.public_inputs == want.public_inputs
        assert serialize_proof_with_pis(got, data_b.common) == \
            serialize_proof_with_pis(want, data_s.common)
        data_b.verify(got)


def test_batch_prover_distinct_witnesses_distinct_proofs(fib_data_and_proof):
    data, _ = fib_data_and_proof
    batch = prove_batch(data.prover_only, data.common,
                        [_fib_inputs(data, 1, 1), _fib_inputs(data, 1, 2)])
    assert batch[0].public_inputs[2] != batch[1].public_inputs[2]
    blobs = {serialize_proof_with_pis(p, data.common) for p in batch}
    assert len(blobs) == 2
    for p in batch:
        data.verify(p)


def test_batch_prover_hash_circuit_bit_identical():
    """Batch proving generalizes past arithmetic gates: a circuit with
    Poseidon + random-access gates must also batch bit-identically."""
    def build(seed):
        builder = CircuitBuilder(CircuitConfig.standard_recursion_config(),
                                 seed=seed)
        x = builder.add_virtual_target()
        h = builder.hash_n_to_hash_no_pad([x, x, x])
        idx = builder.add_virtual_target()
        pick = builder.random_access(idx, list(h))
        builder.register_public_input(x)
        builder.register_public_input(idx)
        builder.register_public_input(pick)
        return builder.build()

    def inputs(data, x_val, idx_val):
        pw = PartialWitness()
        pw.set_target(data.prover_only.public_inputs[0], x_val)
        pw.set_target(data.prover_only.public_inputs[1], idx_val)
        return pw

    data_s = build(seed=31)
    serial = [data_s.prove(inputs(data_s, 7, 0)),
              data_s.prove(inputs(data_s, 9, 3))]
    data_b = build(seed=31)
    batch = prove_batch(data_b.prover_only, data_b.common,
                        [inputs(data_b, 7, 0), inputs(data_b, 9, 3)])
    for got, want in zip(batch, serial):
        assert serialize_proof_with_pis(got, data_b.common) == \
            serialize_proof_with_pis(want, data_s.common)
        data_b.verify(got)
