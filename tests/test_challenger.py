"""Challenger semantics (reference: plonky2/src/iop/challenger.rs:310-377
`no_duplicate_challenges` + `test_consistency`): the duplex sponge never
repeats a challenge across absorb/squeeze patterns, and the in-circuit
RecursiveChallenger reproduces the native Challenger element-for-element."""

import random

from plonky2_tpu.field import reference as ref
from plonky2_tpu.iop.challenger import Challenger
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.recursive_challenger import RecursiveChallenger
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig

rng = random.Random(0xC4A11E)


def test_no_duplicate_challenges():
    challenger = Challenger()
    challenges = []
    for i in range(1, 10):
        challenges.extend(challenger.get_n_challenges(i))
        challenger.observe_element(rng.randrange(ref.ORDER))
    assert len(set(challenges)) == len(challenges)


def test_native_vs_recursive_consistency():
    """Absorb/squeeze rounds sized to force multiple duplexing calls; the
    recursive transcript must equal the native one exactly."""
    num_inputs_per_round = [2, 5, 3]
    num_outputs_per_round = [1, 2, 4]
    inputs_per_round = [[rng.randrange(ref.ORDER) for _ in range(n)]
                        for n in num_inputs_per_round]

    challenger = Challenger()
    outputs_per_round = []
    for inputs, n_out in zip(inputs_per_round, num_outputs_per_round):
        challenger.observe_elements(inputs)
        outputs_per_round.append(challenger.get_n_challenges(n_out))

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    rc = RecursiveChallenger(builder)
    recursive_outputs = []
    for inputs, n_out in zip(inputs_per_round, num_outputs_per_round):
        rc.observe_elements([builder.constant(x) for x in inputs])
        recursive_outputs.append(rc.get_n_challenges(n_out))
    data = builder.build()
    witness = generate_partial_witness(PartialWitness(), data.prover_only,
                                       data.common)
    got = [[witness.get(t) % ref.ORDER for t in outs]
           for outs in recursive_outputs]
    assert got == outputs_per_round
