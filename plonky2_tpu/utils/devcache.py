"""Device-resident constant cache.

`jnp.asarray(big_numpy)` inside (or captured by) a jit bakes the array into
the program as an inline literal; on this box's remote TPU compiler an 18 MB
literal turns a trivial matmul's compile into >400 s (measured r5), and the
resulting multi-MB executables defeat the persistent cache. Capturing a
jax.Array (uploaded once with device_put) instead lifts the constant into an
executable PARAMETER: the same matmul compiles in ~4 s.

Every NTT band matrix, twiddle table, and bit-reversal permutation flows
through `dev_const` so it is uploaded once per process and referenced as a
parameter everywhere.
"""

from __future__ import annotations

import jax
import numpy as np

_CACHE: dict[int, object] = {}


def dev_const(arr: np.ndarray):
    """Upload a (long-lived) numpy array once; return the cached jax.Array.
    Keyed by id(): callers hold their arrays in lru_caches, so ids are
    stable for the process lifetime.

    The upload runs under ensure_compile_time_eval so a first call from
    INSIDE a jit trace still produces a concrete array (a traced device_put
    would return a Tracer — both a literal again and a cache poison)."""
    key = id(arr)
    hit = _CACHE.get(key)
    if hit is None:
        with jax.ensure_compile_time_eval():
            dev = jax.device_put(arr)
        _CACHE[key] = (dev, arr)  # keep the numpy alive so the id is stable
        return dev
    return hit[0]
