"""ContextTree gate-count attribution (reference: util/context_tree.rs,
circuit_builder.rs push_context:681/print_gate_counts:1003)."""

from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def test_context_attribution_and_gate_counts():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    with builder.context("adds"):
        cur = a
        for _ in range(25):   # 20 ops per ArithmeticGate row -> 2 rows
            cur = builder.add(cur, b)
    with builder.context("hash"):
        with builder.context("inner"):
            builder.hash_n_to_hash_no_pad([a, b, cur])

    counts = builder.gate_counts()
    assert counts.get("ArithmeticGate { num_ops: 20 }", 0) >= 2
    assert any("Poseidon" in k for k in counts)

    root = builder._context_stack.root
    assert root.children["adds"].gate_count == 2
    hash_node = root.children["hash"]
    assert hash_node.children["inner"].gate_count >= 1

    report = builder.print_gate_counts()
    assert "2 gates to adds" in report
    assert "instances of ArithmeticGate" in report


def test_context_reentry_accumulates():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    for _ in range(2):
        with builder.context("scope"):
            # each entry adds one fresh ArithmeticGate row (21 ops > 20 slots)
            cur = a
            for _ in range(21):
                cur = builder.add(cur, b)
    assert builder._context_stack.root.children["scope"].gate_count >= 2
