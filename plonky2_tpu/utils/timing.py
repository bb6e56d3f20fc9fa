"""TimingTree — hierarchical scoped profiler.

Analog of the reference's util/timing.rs (TimingTree:8 + timed! macro :179):
nested scopes accumulate wall-clock durations and print an indented tree.
Enabled when constructed with enabled=True or when PLONKY2_TPU_TIMING is set.

TPU profiler integration: set PLONKY2_TPU_PROFILE=<dir> to capture a
jax.profiler trace (viewable in XProf/TensorBoard) with every TimingTree
scope emitted as a named TraceAnnotation — the prover's phase tree lands on
the device timeline (the jax-native analog of the reference's cuda_timing
feature + PGO script, merkle_tree.rs:38-44, pgo-profile.sh).
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager


_PROFILE_DIR = os.environ.get("PLONKY2_TPU_PROFILE")
_PROFILE_STARTED = False


def _maybe_start_profiler():
    global _PROFILE_STARTED
    if _PROFILE_DIR and not _PROFILE_STARTED:
        import jax
        jax.profiler.start_trace(_PROFILE_DIR)
        _PROFILE_STARTED = True


def stop_profiler():
    """Flush the jax.profiler trace (call at the end of a profiled run)."""
    global _PROFILE_STARTED
    if _PROFILE_STARTED:
        import jax
        jax.profiler.stop_trace()
        _PROFILE_STARTED = False


class TimingTree:
    def __init__(self, name: str = "root", enabled: bool | None = None):
        if enabled is None:
            enabled = bool(os.environ.get("PLONKY2_TPU_TIMING")
                           or _PROFILE_DIR)
        self.enabled = enabled
        if enabled:
            _maybe_start_profiler()
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
        annotation = None
        if _PROFILE_DIR:
            import jax
            annotation = jax.profiler.TraceAnnotation(label)
            annotation.__enter__()
        try:
            yield
        finally:
            if annotation is not None:
                annotation.__exit__(None, None, None)
            node[3] = time.perf_counter() - node[1]
            self._stack.pop()
            print(f"[timing] {'  ' * (len(self._stack) - 1)}"
                  f"{node[3]*1e3:9.1f} ms  {label}", flush=True)

    def print(self):
        pass  # scopes print eagerly; kept for API parity


_NULL = TimingTree(enabled=False)


def null_timing() -> TimingTree:
    return _NULL
