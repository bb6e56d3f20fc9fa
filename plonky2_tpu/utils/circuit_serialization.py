"""Circuit-data checkpoint/resume: (de)serialization of CommonCircuitData,
ProverOnlyData, VerifierOnlyData and the CircuitData splits.

Reference: plonky2/src/util/serialization/mod.rs (read/write_circuit_data
:802,1812 — the largest file in the crate) with its GateSerializer /
WitnessGeneratorSerializer vtables (serialization/gate_serialization.rs:15-69,
generator_serialization.rs:15-73). The reference hand-writes a byte codec per
gate and generator; here a single structural codec covers every registered
class: objects serialize as (qualified class name, encoded __dict__),
numpy arrays as .npy blobs inside a zip container, targets/ranges/extension
targets as tagged JSON. The constants+sigmas commitment stores only the
polynomial values; the Merkle tree is rebuilt deterministically on load
(device recompute is cheaper than shipping LDE-sized layers, and blinding is
always off for the preprocessed oracle).

Format: a zip archive with `structure.json` + `blob_<n>.npy` entries. This is
a designed-for-debuggability container, not a byte-parity clone of the Rust
format (proof bytes — the interoperable surface — live in serialization.py).
"""

from __future__ import annotations

import importlib
import io
import json
import zipfile

import numpy as np


# ---------------------------------------------------------------------------
# structural codec
# ---------------------------------------------------------------------------

class _Encoder:
    def __init__(self):
        self.blobs: list[np.ndarray] = []

    def enc(self, v):
        import jax
        from ..field.goldilocks import GF
        from ..iop.target import ExtTarget
        if isinstance(v, GF):
            self.blobs.append(np.asarray(v.to_u64()))
            return {"__gf__": len(self.blobs) - 1}
        if isinstance(v, ExtTarget):
            return {"__ext__": [self.enc(v[0]), self.enc(v[1])]}
        if isinstance(v, bool) or v is None or isinstance(v, (int, str, float)):
            return v
        if isinstance(v, (np.integer,)):
            return int(v)
        if isinstance(v, bytes):
            return {"__bytes__": v.hex()}
        if isinstance(v, tuple):
            return {"__t__": [self.enc(x) for x in v]}
        if isinstance(v, list):
            return [self.enc(x) for x in v]
        if isinstance(v, range):
            return {"__range__": [v.start, v.stop, v.step]}
        if isinstance(v, dict):
            return {"__d__": [[self.enc(k), self.enc(x)]
                              for k, x in v.items()]}
        if isinstance(v, np.ndarray):
            self.blobs.append(v)
            return {"__np__": len(self.blobs) - 1}
        if isinstance(v, jax.Array):
            self.blobs.append(np.asarray(v))
            return {"__np__": len(self.blobs) - 1}
        if isinstance(v, np.random.Generator):
            return {"__rng__": 1}
        if hasattr(v, "__dict__"):
            cls = type(v)
            return {"__obj__": f"{cls.__module__}:{cls.__qualname__}",
                    "state": {k: self.enc(x) for k, x in v.__dict__.items()}}
        raise TypeError(f"cannot serialize {type(v)!r}: {v!r}")


class _Decoder:
    def __init__(self, blobs):
        self.blobs = blobs

    def dec(self, v):
        if isinstance(v, (bool, int, str, float)) or v is None:
            return v
        if isinstance(v, list):
            return [self.dec(x) for x in v]
        assert isinstance(v, dict)
        if "__ext__" in v:
            from ..iop.target import ExtTarget
            a, b = v["__ext__"]
            return ExtTarget(self.dec(a), self.dec(b))
        if "__t__" in v:
            return tuple(self.dec(x) for x in v["__t__"])
        if "__bytes__" in v:
            return bytes.fromhex(v["__bytes__"])
        if "__range__" in v:
            s, e, st = v["__range__"]
            return range(s, e, st)
        if "__d__" in v:
            return {self.dec(k): self.dec(x) for k, x in v["__d__"]}
        if "__np__" in v:
            return self.blobs[v["__np__"]]
        if "__gf__" in v:
            from ..field.goldilocks import GF
            return GF.from_u64(self.blobs[v["__gf__"]])
        if "__rng__" in v:
            return np.random.default_rng()
        if "__obj__" in v:
            mod_name, _, qual = v["__obj__"].partition(":")
            mod = importlib.import_module(mod_name)
            cls = mod
            for part in qual.split("."):
                cls = getattr(cls, part)
            obj = cls.__new__(cls)
            obj.__dict__.update(
                {k: self.dec(x) for k, x in v["state"].items()})
            return obj
        raise TypeError(f"cannot deserialize {v!r}")


def _pack(structure: dict, blobs: list[np.ndarray]) -> bytes:
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("structure.json", json.dumps(structure))
        for i, b in enumerate(blobs):
            bio = io.BytesIO()
            np.save(bio, b, allow_pickle=False)
            z.writestr(f"blob_{i}.npy", bio.getvalue())
    return out.getvalue()


def _unpack(data: bytes):
    z = zipfile.ZipFile(io.BytesIO(data))
    structure = json.loads(z.read("structure.json"))
    blobs = []
    i = 0
    while f"blob_{i}.npy" in z.namelist():
        blobs.append(np.load(io.BytesIO(z.read(f"blob_{i}.npy")),
                             allow_pickle=False))
        i += 1
    return structure, blobs


# ---------------------------------------------------------------------------
# CommonCircuitData
# ---------------------------------------------------------------------------

def _encode_common(common, enc: _Encoder) -> dict:
    return {
        "config": enc.enc(common.config),
        "fri_params": enc.enc(common.fri_params),
        "gates": [enc.enc(g) for g in common.gates],
        "selectors_info": enc.enc(common.selectors_info),
        "quotient_degree_factor": common.quotient_degree_factor,
        "num_gate_constraints": common.num_gate_constraints,
        "num_constants": common.num_constants,
        "num_public_inputs": common.num_public_inputs,
        "k_is": common.k_is,
        "num_partial_products": common.num_partial_products,
        "gc": common.gc.name,
    }


def _decode_common(d: dict, dec: _Decoder):
    from ..hash.hashers import CONFIGS
    from ..plonk.circuit_data import CommonCircuitData
    return CommonCircuitData(
        config=dec.dec(d["config"]),
        fri_params=dec.dec(d["fri_params"]),
        gates=[dec.dec(g) for g in d["gates"]],
        selectors_info=dec.dec(d["selectors_info"]),
        quotient_degree_factor=d["quotient_degree_factor"],
        num_gate_constraints=d["num_gate_constraints"],
        num_constants=d["num_constants"],
        num_public_inputs=d["num_public_inputs"],
        k_is=list(d["k_is"]),
        num_partial_products=d["num_partial_products"],
        gc=CONFIGS[d["gc"]],
    )


def serialize_common_circuit_data(common) -> bytes:
    enc = _Encoder()
    return _pack({"common": _encode_common(common, enc)}, enc.blobs)


def deserialize_common_circuit_data(data: bytes):
    structure, blobs = _unpack(data)
    return _decode_common(structure["common"], _Decoder(blobs))


# ---------------------------------------------------------------------------
# Prover / verifier data
# ---------------------------------------------------------------------------

def _encode_prover_only(po, common, enc: _Encoder) -> dict:
    digest = po.circuit_digest
    return {
        "generators": [enc.enc(g) for g in po.generators],
        "constants_sigmas_coeffs": enc.enc(
            np.asarray(po.constants_sigmas_commitment.polynomials.to_u64())),
        "sigmas": enc.enc(np.asarray(po.sigmas)),
        "subgroup": enc.enc(np.asarray(po.subgroup)),
        "public_inputs": enc.enc(list(po.public_inputs)),
        "representative_map": enc.enc(np.asarray(po.representative_map)),
        "circuit_digest": enc.enc(digest),
    }


def _decode_prover_only(d: dict, dec: _Decoder, common):
    from ..field.goldilocks import GF
    from ..fri.oracle import PolynomialBatch
    from ..plonk.circuit_data import ProverOnlyData
    coeffs = dec.dec(d["constants_sigmas_coeffs"])
    commitment = PolynomialBatch.from_coeffs(
        GF.from_u64(coeffs), common.config.fri_config.rate_bits, False,
        common.config.fri_config.cap_height, hasher=common.gc.hasher)
    return ProverOnlyData(
        generators=[dec.dec(g) for g in d["generators"]],
        constants_sigmas_commitment=commitment,
        sigmas=dec.dec(d["sigmas"]),
        subgroup=dec.dec(d["subgroup"]),
        public_inputs=dec.dec(d["public_inputs"]),
        representative_map=dec.dec(d["representative_map"]),
        circuit_digest=dec.dec(d["circuit_digest"]),
    )


def _encode_verifier_only(vo, enc: _Encoder) -> dict:
    return {"constants_sigmas_cap": enc.enc(list(vo.constants_sigmas_cap)),
            "circuit_digest": enc.enc(vo.circuit_digest)}


def _decode_verifier_only(d: dict, dec: _Decoder):
    from ..plonk.circuit_data import VerifierOnlyData
    return VerifierOnlyData(
        constants_sigmas_cap=dec.dec(d["constants_sigmas_cap"]),
        circuit_digest=dec.dec(d["circuit_digest"]))


# ---------------------------------------------------------------------------
# Entry points (reference: write_circuit_data / read_circuit_data and the
# prover/verifier-only variants, serialization/mod.rs:802-1812)
# ---------------------------------------------------------------------------

def serialize_circuit_data(data) -> bytes:
    enc = _Encoder()
    structure = {
        "common": _encode_common(data.common, enc),
        "prover_only": _encode_prover_only(data.prover_only, data.common,
                                           enc),
        "verifier_only": _encode_verifier_only(data.verifier_only, enc),
    }
    return _pack(structure, enc.blobs)


def deserialize_circuit_data(blob: bytes):
    from ..plonk.circuit_data import CircuitData
    structure, blobs = _unpack(blob)
    dec = _Decoder(blobs)
    common = _decode_common(structure["common"], dec)
    return CircuitData(
        prover_only=_decode_prover_only(structure["prover_only"], dec,
                                        common),
        verifier_only=_decode_verifier_only(structure["verifier_only"], dec),
        common=common)


def serialize_prover_circuit_data(pcd) -> bytes:
    enc = _Encoder()
    structure = {
        "common": _encode_common(pcd.common, enc),
        "prover_only": _encode_prover_only(pcd.prover_only, pcd.common, enc),
    }
    return _pack(structure, enc.blobs)


def deserialize_prover_circuit_data(blob: bytes):
    from ..plonk.circuit_data import ProverCircuitData
    structure, blobs = _unpack(blob)
    dec = _Decoder(blobs)
    common = _decode_common(structure["common"], dec)
    return ProverCircuitData(
        prover_only=_decode_prover_only(structure["prover_only"], dec,
                                        common),
        common=common)


def serialize_verifier_circuit_data(vcd) -> bytes:
    enc = _Encoder()
    structure = {
        "common": _encode_common(vcd.common, enc),
        "verifier_only": _encode_verifier_only(vcd.verifier_only, enc),
    }
    return _pack(structure, enc.blobs)


def deserialize_verifier_circuit_data(blob: bytes):
    from ..plonk.circuit_data import VerifierCircuitData
    structure, blobs = _unpack(blob)
    dec = _Decoder(blobs)
    common = _decode_common(structure["common"], dec)
    return VerifierCircuitData(
        verifier_only=_decode_verifier_only(structure["verifier_only"], dec),
        common=common)
