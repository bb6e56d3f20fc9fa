"""STARK prover/verifier e2e (reference: starky fibonacci_stark tests)."""

import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.starky.config import StarkConfig
from plonky2_tpu.starky.fibonacci_stark import FibonacciStark
from plonky2_tpu.starky.prover import prove
from plonky2_tpu.starky.verifier import verify_stark_proof


def fib(n, x0, x1):
    for _ in range(n):
        x0, x1 = x1, (x0 + x1) % ref.ORDER
    return x1


def test_fibonacci_stark():
    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)
    public_inputs = [0, 1, fib(num_rows - 1, 0, 1)]
    trace = stark.generate_trace(0, 1)
    proof = prove(stark, config, trace, public_inputs)
    verify_stark_proof(stark, proof, config)


def test_fibonacci_stark_rejects_wrong_result():
    """Tamper a VALID proof's public input (cheaper than re-proving on this
    1-core box; binding is what's under test)."""
    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)
    public_inputs = [0, 1, fib(num_rows - 1, 0, 1)]
    trace = stark.generate_trace(0, 1)
    proof = prove(stark, config, trace, public_inputs)
    proof.public_inputs[2] = (proof.public_inputs[2] + 1) % ref.ORDER
    with pytest.raises(AssertionError):
        verify_stark_proof(stark, proof, config)


def test_permutation_stark_logup():
    """logUp lookup argument end-to-end (reference:
    starky/src/permutation_stark.rs tests)."""
    from plonky2_tpu.starky.permutation_stark import PermutationStark

    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = PermutationStark()
    trace = stark.generate_trace(7, num_rows)
    proof = prove(stark, config, trace, [7])
    assert proof.proof.auxiliary_polys_cap is not None
    verify_stark_proof(stark, proof, config)


def test_permutation_stark_rejects_non_permutation():
    from plonky2_tpu.starky.permutation_stark import PermutationStark

    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = PermutationStark()
    trace = stark.generate_trace(7, num_rows)
    trace[0][3] = 12345  # no longer a permutation of column 1
    with pytest.raises(AssertionError):
        proof = prove(stark, config, trace, [7])
        verify_stark_proof(stark, proof, config)
