"""Host utility coverage: bit helpers (reference: util/src/lib.rs tests),
PartitionWitness union-find semantics (iop/witness.rs), and the TimingTree
scope accounting (util/timing.rs)."""

import numpy as np
import pytest

from plonky2_tpu.utils.bits import (
    ifft_reverse_perm, log2_ceil, log2_strict, reverse_bits,
    reverse_index_bits_perm,
)
from plonky2_tpu.utils.timing import TimingTree


def test_log2_strict_and_ceil():
    for k in range(20):
        assert log2_strict(1 << k) == k
    with pytest.raises(AssertionError):
        log2_strict(12)
    assert [log2_ceil(n) for n in (1, 2, 3, 4, 5, 8, 9)] == \
        [0, 1, 2, 2, 3, 3, 4]


def test_reverse_index_bits_involution():
    for lg in (1, 4, 7):
        n = 1 << lg
        perm = reverse_index_bits_perm(n)
        assert sorted(perm.tolist()) == list(range(n))     # a permutation
        assert np.array_equal(perm[perm], np.arange(n))    # an involution
        assert all(perm[i] == reverse_bits(i, lg) for i in range(n))


def test_ifft_reverse_perm_is_index_negation():
    """ifft reorder = index negation mod n: forward-NTT at inverse-ordered
    points is the inverse transform up to 1/n scaling."""
    n = 16
    perm = np.asarray(ifft_reverse_perm(n))
    assert np.array_equal(perm, (n - np.arange(n)) % n)
    assert np.array_equal(perm[perm], np.arange(n))        # an involution


def test_partition_witness_copy_constraints():
    """Targets wired together share one representative: setting one sets
    all, and conflicting sets are rejected (reference: iop/witness.rs
    PartitionWitness + CircuitBuilder::connect)."""
    from plonky2_tpu.iop.generator import generate_partial_witness
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    c = builder.add_virtual_target()
    builder.connect(a, b)
    builder.connect(b, c)
    builder.register_public_input(c)
    data = builder.build()

    pw = PartialWitness()
    pw.set_target(a, 41)
    witness = generate_partial_witness(pw, data.prover_only, data.common)
    assert witness.get(b) == 41 and witness.get(c) == 41

    # conflicting assignment to the same equivalence class must fail fast
    pw2 = PartialWitness()
    pw2.set_target(a, 1)
    with pytest.raises(AssertionError):
        pw2.set_target(c, 2)
        generate_partial_witness(pw2, data.prover_only, data.common)


def test_timing_tree_nesting(capsys):
    t = TimingTree(enabled=True)
    with t.scope("outer"):
        with t.scope("inner"):
            pass
        with t.scope("inner2"):
            pass
    # tree structure: outer holds the two inner scopes, durations recorded
    (label, _t0, kids) = t.root
    assert [n[0] for n in kids] == ["outer"]
    assert [n[0] for n in kids[0][2]] == ["inner", "inner2"]
    assert all(n[3] is not None for n in kids[0][2])
    # scopes print eagerly with child scopes indented deeper than the parent
    lines = [l for l in capsys.readouterr().out.splitlines() if "[timing]" in l]
    assert len(lines) == 3
    outer_line = next(l for l in lines if l.endswith("outer"))
    inner_line = next(l for l in lines if l.endswith(" inner"))
    assert inner_line.index("ms") > outer_line.index("ms")

    # disabled tree: scopes are no-ops and print nothing
    t2 = TimingTree(enabled=False)
    with t2.scope("quiet"):
        pass
    assert "quiet" not in capsys.readouterr().out
