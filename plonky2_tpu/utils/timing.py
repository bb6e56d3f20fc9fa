"""TimingTree — hierarchical scoped profiler.

Analog of the reference's util/timing.rs (TimingTree:8 + timed! macro :179):
nested scopes accumulate wall-clock durations and print an indented tree.
Enabled when constructed with enabled=True or when PLONKY2_TPU_TIMING is set.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager


class TimingTree:
    def __init__(self, name: str = "root", enabled: bool | None = None):
        if enabled is None:
            enabled = bool(os.environ.get("PLONKY2_TPU_TIMING"))
        self.enabled = enabled
        self.root = (name, time.perf_counter(), [])  # (label, t0, children)
        self._stack = [self.root]

    @contextmanager
    def scope(self, label: str):
        if not self.enabled:
            yield
            return
        node = [label, time.perf_counter(), [], None]  # label, t0, kids, dt
        self._stack[-1][2].append(node)
        self._stack.append(node)
        try:
            yield
        finally:
            node[3] = time.perf_counter() - node[1]
            self._stack.pop()
            print(f"[timing] {'  ' * (len(self._stack) - 1)}"
                  f"{node[3]*1e3:9.1f} ms  {label}", flush=True)

    def print(self):
        pass  # scopes print eagerly; kept for API parity


_NULL = TimingTree(enabled=False)


def null_timing() -> TimingTree:
    return _NULL
