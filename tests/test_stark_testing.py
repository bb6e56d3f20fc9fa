"""STARK degree/coherence harness + UnconstrainedStark fixture
(reference: starky/src/stark_testing.rs:25-140, unconstrained_stark.rs)."""

import pytest

from plonky2_tpu.starky.config import StarkConfig
from plonky2_tpu.starky.fibonacci_stark import FibonacciStark
from plonky2_tpu.starky.permutation_stark import PermutationStark
from plonky2_tpu.starky.prover import prove
from plonky2_tpu.starky.stark_testing import (
    assert_stark_eval_coherence, assert_stark_low_degree,
)
from plonky2_tpu.starky.unconstrained_stark import UnconstrainedStark
from plonky2_tpu.starky.verifier import verify_stark_proof

STARKS = [FibonacciStark(32), PermutationStark(), UnconstrainedStark(32)]


@pytest.mark.parametrize("stark", STARKS, ids=lambda s: type(s).__name__)
def test_stark_low_degree(stark):
    assert_stark_low_degree(stark)


@pytest.mark.parametrize("stark", STARKS, ids=lambda s: type(s).__name__)
def test_stark_eval_coherence(stark):
    assert_stark_eval_coherence(stark)


def test_degree_audit_catches_underdeclared_degree():
    """The harness must FAIL a stark whose declared degree is too low."""

    class LyingStark(FibonacciStark):
        def eval(self, alg, frame, consumer):
            x = frame.local_values[0]
            # a degree-3 constraint under a declared degree of 2
            consumer.constraint(alg.mul(alg.mul(x, x), x))

    with pytest.raises(AssertionError, match="degree too high"):
        assert_stark_low_degree(LyingStark(32))


def test_unconstrained_stark_e2e():
    """reference: unconstrained_stark.rs test — proof of trace knowledge."""
    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = UnconstrainedStark(num_rows)
    trace = stark.generate_trace()
    proof = prove(stark, config, trace, [])
    verify_stark_proof(stark, proof, config)


def test_stark_generic_config_keccak():
    """STARK prove/verify under KeccakGoldilocksConfig (byte digests in the
    transcript and Merkle caps)."""
    from plonky2_tpu.hash.hashers import KeccakGoldilocksConfig

    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)
    from plonky2_tpu.field import reference as ref

    def fib(n, x0, x1):
        for _ in range(n):
            x0, x1 = x1, (x0 + x1) % ref.ORDER
        return x1

    public_inputs = [0, 1, fib(num_rows - 1, 0, 1)]
    trace = stark.generate_trace(0, 1)
    proof = prove(stark, config, trace, public_inputs,
                  gc=KeccakGoldilocksConfig)
    assert isinstance(proof.proof.trace_cap[0], bytes)
    verify_stark_proof(stark, proof, config, gc=KeccakGoldilocksConfig)
