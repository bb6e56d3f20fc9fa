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
        # fast-partial-rounds tables (derived; hash/poseidon_fast.py) for the
        # PoseidonGate witness-trace entry point
        from ..hash.poseidon_fast import fast_partial_tables
        first_rc, partial_rc, vs, w_hats, init_mat = fast_partial_tables()
        flat = lambda rows: [x for row in rows for x in row]
        for name, vals in (("FAST_FIRST_RC", first_rc),
                           ("FAST_PARTIAL_RC", partial_rc),
                           ("FAST_VS", flat(vs)),
                           ("FAST_W_HATS", flat(w_hats)),
                           ("FAST_INIT_MAT", flat(init_mat))):
            f.write("static const uint64_t %s[%d] = {\n%s\n};\n"
                    % (name, len(vals),
                       ",\n".join("  %dULL" % v for v in vals)))


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
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.poseidon_hash_leaves.argtypes = [u64p, ctypes.c_size_t,
                                             ctypes.c_size_t, u64p]
        lib.poseidon_compress_many.argtypes = [u64p, u64p, ctypes.c_size_t,
                                               u64p]
        lib.poseidon_generator_trace.argtypes = [u64p, ctypes.c_uint64, u64p]
        lib.poseidon_generator_trace_many.argtypes = [u64p, ctypes.c_size_t,
                                                      u64p]
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


# ---------------------------------------------------------------------------
# BN128 Poseidon (native analog of the reference's Go static library,
# plonky2/build.rs:63-88 / hash/poseidon_bn128.rs:60-100)
# ---------------------------------------------------------------------------

_BN_LIB = None
_BN_TRIED = False


def _emit_bn128_header(path: str) -> None:
    """Round constants + MDS in Montgomery form (R = 2^256), plus the field
    parameters, derived from the KAT-verified python Grain derivation."""
    from ..hash.poseidon_bn128 import P_BN254, _constants

    rc, mds = _constants()
    R = (1 << 256) % P_BN254

    def limbs(x):
        return ", ".join("0x%xULL" % ((x >> (64 * i)) & 0xFFFFFFFFFFFFFFFF)
                         for i in range(4))

    def mont(x):
        return limbs(x * R % P_BN254)

    p_inv = (-pow(P_BN254, -1, 1 << 64)) % (1 << 64)
    with open(path, "w") as f:
        f.write("/* generated from plonky2_tpu.hash.poseidon_bn128 */\n")
        f.write("static const uint64_t P_LIMBS[4] = {%s};\n" % limbs(P_BN254))
        f.write("static const uint64_t P_INV = 0x%xULL;\n" % p_inv)
        f.write("static const uint64_t R2_LIMBS[4] = {%s};\n"
                % limbs(R * R % P_BN254))
        flat_rc = [c for row in rc for c in row]
        f.write("static const uint64_t RC_MONT[%d][4] = {\n" % len(flat_rc))
        f.write(",\n".join("  {%s}" % mont(c) for c in flat_rc))
        f.write("\n};\n")
        flat_mds = [c for row in mds for c in row]
        f.write("static const uint64_t MDS_MONT[25][4] = {\n")
        f.write(",\n".join("  {%s}" % mont(c) for c in flat_mds))
        f.write("\n};\n")


def load_bn128():
    global _BN_LIB, _BN_TRIED
    if _BN_LIB is not None or _BN_TRIED:
        return _BN_LIB
    _BN_TRIED = True
    here = os.path.dirname(__file__)
    src = os.path.join(here, "bn128_poseidon.c")
    lib_path = os.path.join(here, "_libplonky2_bn128.so")
    try:
        if (not os.path.exists(lib_path)
                or os.path.getmtime(lib_path) < os.path.getmtime(src)):
            _emit_bn128_header(os.path.join(here, "bn128_constants_gen.h"))
            cc = os.environ.get("CC", "cc")
            subprocess.run(
                [cc, "-O2", "-shared", "-fPIC", "-o", lib_path, src],
                check=True, capture_output=True)
        lib = ctypes.CDLL(lib_path)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.bn128_permute.argtypes = [u64p]
        lib.bn128_hash_no_pad.argtypes = [u64p, ctypes.c_size_t, u64p]
        lib.bn128_hash_leaves.argtypes = [u64p, ctypes.c_size_t,
                                          ctypes.c_size_t, u64p]
        lib.bn128_compress_many.argtypes = [u64p, u64p, ctypes.c_size_t,
                                            u64p]
        _BN_LIB = lib
    except Exception:
        _BN_LIB = None
    return _BN_LIB


def bn128_permute(state):
    """12 ints -> 12 ints, or None if no native lib."""
    lib = load_bn128()
    if lib is None:
        return None
    buf = (ctypes.c_uint64 * 12)(*[int(x) & 0xFFFFFFFFFFFFFFFF
                                   for x in state])
    lib.bn128_permute(buf)
    return list(buf)


def bn128_hash_no_pad(inputs):
    lib = load_bn128()
    if lib is None:
        return None
    n = len(inputs)
    buf = (ctypes.c_uint64 * n)(*[int(x) & 0xFFFFFFFFFFFFFFFF
                                  for x in inputs])
    out = (ctypes.c_uint64 * 4)()
    lib.bn128_hash_no_pad(buf, n, out)
    return tuple(out)


def bn128_hash_leaves(leaves_u64):
    """[n, L] uint64 -> [n, 4] digests, or None if no native lib."""
    lib = load_bn128()
    if lib is None:
        return None
    import numpy as np
    a = np.ascontiguousarray(leaves_u64, dtype=np.uint64)
    out = np.empty((a.shape[0], 4), dtype=np.uint64)
    lib.bn128_hash_leaves(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        a.shape[0], a.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def bn128_compress_many(left, right):
    """[n, 4] x [n, 4] uint64 -> [n, 4], or None if no native lib."""
    lib = load_bn128()
    if lib is None:
        return None
    import numpy as np
    l = np.ascontiguousarray(left, dtype=np.uint64)
    r = np.ascontiguousarray(right, dtype=np.uint64)
    out = np.empty((l.shape[0], 4), dtype=np.uint64)
    lib.bn128_compress_many(
        l.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        l.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def poseidon_hash_leaves(leaves_u64):
    """hash_or_noop over [n, L] uint64 rows -> [n, 4], or None."""
    lib = load()
    if lib is None:
        return None
    import numpy as np
    a = np.ascontiguousarray(leaves_u64, dtype=np.uint64)
    out = np.empty((a.shape[0], 4), dtype=np.uint64)
    lib.poseidon_hash_leaves(
        a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        a.shape[0], a.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


def poseidon_compress_many(left, right):
    """two_to_one over [n, 4] digest pairs -> [n, 4], or None."""
    lib = load()
    if lib is None:
        return None
    import numpy as np
    l = np.ascontiguousarray(left, dtype=np.uint64)
    r = np.ascontiguousarray(right, dtype=np.uint64)
    out = np.empty((l.shape[0], 4), dtype=np.uint64)
    lib.poseidon_compress_many(
        l.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        l.shape[0],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)))
    return out


_TRACE_BUFS = None


def poseidon_generator_trace(inputs, swap):
    """Full PoseidonGate wire row (fast-partial formulation): 12 canonical
    ints + swap -> list of 135 ints, or None if no native lib. Reuses scratch
    buffers — the witness fixpoint calls this once per Poseidon gate row."""
    global _TRACE_BUFS
    lib = load()
    if lib is None:
        return None
    if _TRACE_BUFS is None:
        _TRACE_BUFS = ((ctypes.c_uint64 * 12)(), (ctypes.c_uint64 * 135)())
    buf_in, buf_out = _TRACE_BUFS
    buf_in[:] = inputs
    lib.poseidon_generator_trace(buf_in, int(swap), buf_out)
    return buf_out[:]
