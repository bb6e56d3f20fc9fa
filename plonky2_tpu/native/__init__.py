"""Native host runtime components (C, built on demand, ctypes-loaded).

The reference's host runtime is native Rust with AVX2/NEON Poseidon
(plonky2/src/hash/arch/); here the host-side hot paths — witness generation
(PoseidonGate generators) and Merkle/hash oracles — call a small C library.
Constants are generated at build time from the python tables (the analog of
the reference's `gen` crate). Falls back to pure python if no compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_LIB = None
_TRIED = False


def _emit_constants_header(path: str) -> None:
    from ..hash.poseidon_constants import (
        ALL_ROUND_CONSTANTS, MDS_MATRIX_CIRC, MDS_MATRIX_DIAG,
    )
    with open(path, "w") as f:
        f.write("/* generated from plonky2_tpu.hash.poseidon_constants */\n")
        f.write("static const uint64_t ROUND_CONSTANTS[%d] = {\n"
                % len(ALL_ROUND_CONSTANTS))
        f.write(",\n".join("  %dULL" % c for c in ALL_ROUND_CONSTANTS))
        f.write("\n};\n")
        f.write("static const uint64_t MDS_CIRC[12] = {%s};\n"
                % ", ".join("%dULL" % c for c in MDS_MATRIX_CIRC))
        f.write("static const uint64_t MDS_DIAG[12] = {%s};\n"
                % ", ".join("%dULL" % c for c in MDS_MATRIX_DIAG))


def load():
    """ctypes handle to the host library, building it if needed; None if
    unavailable (callers fall back to python)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    here = os.path.dirname(__file__)
    src = os.path.join(here, "host_poseidon.c")
    lib_path = os.path.join(here, "_libplonky2_host.so")
    try:
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            _emit_constants_header(
                os.path.join(here, "poseidon_constants_gen.h"))
            cc = os.environ.get("CC", "cc")
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", lib_path, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(lib_path)
        lib.poseidon_permute.argtypes = [ctypes.POINTER(ctypes.c_uint64)]
        lib.poseidon_permute_many.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t]
        lib.poseidon_hash_no_pad.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint64)]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def permute(state):
    """state: list of 12 ints -> list of 12 ints, or None if no native lib."""
    lib = load()
    if lib is None:
        return None
    buf = (ctypes.c_uint64 * 12)(*[int(x) & 0xFFFFFFFFFFFFFFFF
                                   for x in state])
    lib.poseidon_permute(buf)
    return list(buf)


def permute_many(states):
    """states: uint64 ndarray [n, 12] -> permuted copy, or None if no
    native lib (used by the FRI proof-of-work grind on CPU hosts, where
    the XLA lanes kernel is ~1000x slower than this C loop)."""
    lib = load()
    if lib is None:
        return None
    import numpy as np
    buf = np.ascontiguousarray(states, dtype=np.uint64).copy()
    lib.poseidon_permute_many(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)), buf.shape[0])
    return buf
