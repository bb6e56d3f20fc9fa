"""STARK prover/verifier e2e (reference: starky fibonacci_stark tests)."""

import copy

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


NUM_ROWS = 1 << 5


@pytest.fixture(scope="module")
def fib_stark_proof():
    """One shared fibonacci STARK proof (proving is expensive on this 1-core
    box; consumers deepcopy before tampering)."""
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(NUM_ROWS)
    public_inputs = [0, 1, fib(NUM_ROWS - 1, 0, 1)]
    trace = stark.generate_trace(0, 1)
    return stark, config, prove(stark, config, trace, public_inputs)


def test_fibonacci_stark(fib_stark_proof):
    stark, config, proof = fib_stark_proof
    verify_stark_proof(stark, proof, config)


def test_fibonacci_stark_rejects_wrong_result(fib_stark_proof):
    """Tamper a VALID proof's public input (cheaper than re-proving on this
    1-core box; binding is what's under test)."""
    stark, config, proof = fib_stark_proof
    bad = copy.deepcopy(proof)
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % ref.ORDER
    with pytest.raises(AssertionError):
        verify_stark_proof(stark, bad, config)


@pytest.fixture(scope="module")
def perm_stark():
    from plonky2_tpu.starky.permutation_stark import PermutationStark
    return PermutationStark(), StarkConfig.standard_fast_config()


def test_permutation_stark_logup(perm_stark):
    """logUp lookup argument end-to-end (reference:
    starky/src/permutation_stark.rs tests)."""
    stark, config = perm_stark
    trace = stark.generate_trace(7, NUM_ROWS)
    proof = prove(stark, config, trace, [7])
    assert proof.proof.auxiliary_polys_cap is not None
    verify_stark_proof(stark, proof, config)


def test_permutation_stark_rejects_non_permutation(perm_stark):
    """Proving a NON-permutation trace must yield a rejected proof (the
    compiled prover programs are shared with the valid run above via
    Stark.jit_key, so this re-prove costs runtime only)."""
    stark, config = perm_stark
    trace = stark.generate_trace(7, NUM_ROWS)
    trace[0][3] = 12345  # no longer a permutation of column 1
    with pytest.raises(AssertionError):
        proof = prove(stark, config, trace, [7])
        verify_stark_proof(stark, proof, config)


def test_stark_prove_under_prover_mesh_matches(fib_stark_proof):
    """The prover_mesh context shards STARK commitments too (same
    PolynomialBatch path as PLONK); the proof transcript must be identical
    to the single-device one."""
    import numpy as np

    from plonky2_tpu.parallel.sharding import make_mesh, prover_mesh

    stark, config, want = fib_stark_proof
    trace = stark.generate_trace(0, 1)
    public_inputs = [0, 1, fib(NUM_ROWS - 1, 0, 1)]
    with prover_mesh(make_mesh(8)):
        got = prove(stark, config, trace, public_inputs)
    verify_stark_proof(stark, got, config)

    assert got.public_inputs == want.public_inputs
    gp, wp = got.proof, want.proof
    assert np.array_equal(np.asarray(gp.trace_cap), np.asarray(wp.trace_cap))
    assert np.array_equal(np.asarray(gp.quotient_polys_cap),
                          np.asarray(wp.quotient_polys_cap))
    assert gp.openings.to_fri_openings() == wp.openings.to_fri_openings()
    assert gp.opening_proof.final_poly == wp.opening_proof.final_poly
    assert int(gp.opening_proof.pow_witness) == \
        int(wp.opening_proof.pow_witness)
