"""Degree audit for EVERY gate: measured constraint degree must not exceed
the declared `degree()` (reference runs test_low_degree on every gate,
gates/gate_testing.rs:24-87). A wrong declaration would silently corrupt
selector grouping and quotient decomposition."""

import pytest

from plonky2_tpu.ecgfp5.gadgets import MulGFp5Gate
from plonky2_tpu.gadgets.u32 import (
    ComparisonGate, U32AddManyGate, U32ArithmeticGate, U32RangeCheckGate,
    U32SubtractionGate,
)
from plonky2_tpu.gates.basic_gates import (
    ArithmeticGate, ConstantGate, NoopGate, PublicInputGate,
)
from plonky2_tpu.gates.coset_interpolation_gate import CosetInterpolationGate
from plonky2_tpu.gates.extension_gates import (
    ArithmeticExtensionGate, MulExtensionGate, ReducingExtensionGate,
    ReducingGate,
)
from plonky2_tpu.gates.gate_testing import assert_low_degree
from plonky2_tpu.gates.interpolation_gates import (
    HighDegreeInterpolationGate, LowDegreeInterpolationGate,
)
from plonky2_tpu.gates.lookup_gates import LookupGate, LookupTableGate
from plonky2_tpu.gates.misc_gates import (
    BaseSumGate, ExponentiationGate, PoseidonMdsGate, RandomAccessGate,
)
from plonky2_tpu.gates.poseidon_gate import PoseidonGate
from plonky2_tpu.plonk.config import CircuitConfig

CFG = CircuitConfig.standard_recursion_config()

GATES = [
    ArithmeticGate.from_config(CFG),
    ConstantGate(CFG.num_constants),
    PublicInputGate(),
    NoopGate(),
    ArithmeticExtensionGate(10),
    MulExtensionGate(13),
    ReducingGate(21),
    ReducingExtensionGate(16),
    BaseSumGate(63, base=2),
    ExponentiationGate(17),
    RandomAccessGate(4, 4, 2),
    PoseidonMdsGate(),
    PoseidonGate(),
    CosetInterpolationGate(4, 6),
    LookupGate(4, tuple((i, i * i) for i in range(8))),
    LookupTableGate(4, tuple((i, i * i) for i in range(8)), 0),
    U32ArithmeticGate(3),
    U32AddManyGate(num_addends=3, num_ops=2),
    U32SubtractionGate(3),
    ComparisonGate(num_bits=32, num_chunks=16),
    U32RangeCheckGate(2),
    MulGFp5Gate(num_ops=2),
    HighDegreeInterpolationGate(2),
    LowDegreeInterpolationGate(2),
]


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id()[:48])
def test_low_degree(gate):
    assert_low_degree(gate)


def test_degree_audit_catches_underdeclared_degree():
    """The harness must FAIL a gate whose declared degree() is too low."""
    from plonky2_tpu.gates.gate import Gate

    class LyingGate(Gate):
        def id(self):
            return "LyingGate"

        def num_wires(self):
            return 2

        def num_constants(self):
            return 0

        def degree(self):
            return 2          # lie: the constraint below is degree 3

        def num_constraints(self):
            return 1

        def eval_unfiltered(self, alg, consts, wires, pi_hash):
            x, y = wires
            return [alg.mul(alg.mul(x, x), y)]

    with pytest.raises(AssertionError, match="exceed declared degree"):
        assert_low_degree(LyingGate())
