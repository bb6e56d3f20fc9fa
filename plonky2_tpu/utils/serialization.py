"""Byte-level serialization: proofs, circuit data, Merkle structures.

Reference: plonky2/src/util/serialization/mod.rs (Buffer:2166, proof and
circuit-data read/write). Layout follows the reference's conventions — u64 LE
field elements, u8 for small counts embedded in shapes known from
CommonCircuitData — so shapes round-trip without self-describing tags.
Gate serialization uses the gate `id()` string registry (the analog of the
reference's GateSerializer vtables, serialization/gate_serialization.rs:15).
"""

from __future__ import annotations

import io
import struct

import numpy as np

from ..field import reference as ref
from ..fri.proof import (
    FriInitialTreeProof, FriProof, FriQueryRound, FriQueryStep,
)
from ..plonk.proof import OpeningSet, Proof, ProofWithPublicInputs


class Buffer:
    def __init__(self, data: bytes = b""):
        self._r = io.BytesIO(data)
        self._w = io.BytesIO() if not data else None

    # -- writing ---------------------------------------------------------------
    def write_u8(self, x: int):
        self._w.write(struct.pack("<B", x))

    def write_u32(self, x: int):
        self._w.write(struct.pack("<I", x))

    def write_usize(self, x: int):
        self._w.write(struct.pack("<Q", x))

    def write_field(self, x: int):
        self._w.write(struct.pack("<Q", x % ref.ORDER))

    def write_ext(self, x):
        self.write_field(int(x[0]))
        self.write_field(int(x[1]))

    def write_field_vec(self, xs):
        for x in xs:
            self.write_field(int(x))

    def write_ext_vec(self, xs):
        for x in xs:
            self.write_ext(x)

    def write_hash(self, h):
        # HashOut: 4 LE u64; BytesHash<N>: raw bytes (reference:
        # serialization/mod.rs writes Hash via GenericHashOut::to_bytes)
        import numpy as _np
        if isinstance(h, (bytes, bytearray)):
            self._w.write(bytes(h))
        elif isinstance(h, _np.ndarray) and h.dtype == _np.uint8:
            self._w.write(h.tobytes())
        else:
            self.write_field_vec(h)

    def write_cap(self, cap):
        for h in cap:
            self.write_hash(h)

    def bytes(self) -> bytes:
        return self._w.getvalue()

    # -- reading ---------------------------------------------------------------
    def read_u8(self) -> int:
        return struct.unpack("<B", self._r.read(1))[0]

    def read_u32(self) -> int:
        return struct.unpack("<I", self._r.read(4))[0]

    def read_usize(self) -> int:
        return struct.unpack("<Q", self._r.read(8))[0]

    def read_field(self) -> int:
        return struct.unpack("<Q", self._r.read(8))[0]

    def read_ext(self):
        return (self.read_field(), self.read_field())

    def read_field_vec(self, n) -> list:
        return [self.read_field() for _ in range(n)]

    def read_ext_vec(self, n) -> list:
        return [self.read_ext() for _ in range(n)]

    def read_hash(self, hasher=None):
        if hasher is not None and not hasher.algebraic:
            return self._r.read(hasher.hash_size)
        return tuple(self.read_field_vec(4))

    def read_cap(self, cap_height: int, hasher=None) -> list:
        return [self.read_hash(hasher) for _ in range(1 << cap_height)]


# ---------------------------------------------------------------------------
# Proof (de)serialization, shaped by CommonCircuitData
# (reference: serialization/mod.rs write_proof/read_proof)
# ---------------------------------------------------------------------------

def serialize_proof_with_pis(pwp: ProofWithPublicInputs, common) -> bytes:
    buf = Buffer()
    p = pwp.proof
    buf.write_cap(p.wires_cap)
    buf.write_cap(p.plonk_zs_partial_products_cap)
    buf.write_cap(p.quotient_polys_cap)
    o = p.openings
    for vec in (o.constants, o.plonk_sigmas, o.wires, o.plonk_zs,
                o.plonk_zs_next, o.partial_products, o.quotient_polys):
        buf.write_ext_vec(vec)
    _write_fri_proof(buf, p.opening_proof)
    buf.write_field_vec(pwp.public_inputs)
    return buf.bytes()


def deserialize_proof_with_pis(data: bytes, common) -> ProofWithPublicInputs:
    buf = Buffer(data)
    hasher = common.gc.hasher
    ch = common.config.fri_config.cap_height
    wires_cap = buf.read_cap(ch, hasher)
    zs_pp_cap = buf.read_cap(ch, hasher)
    quotient_cap = buf.read_cap(ch, hasher)
    o = OpeningSet(
        constants=buf.read_ext_vec(len(common.constants_range)),
        plonk_sigmas=buf.read_ext_vec(len(common.sigmas_range)),
        wires=buf.read_ext_vec(common.config.num_wires),
        plonk_zs=buf.read_ext_vec(len(common.zs_range)),
        plonk_zs_next=buf.read_ext_vec(len(common.zs_range)),
        partial_products=buf.read_ext_vec(len(common.partial_products_range)),
        quotient_polys=buf.read_ext_vec(common.num_quotient_polys),
    )
    num_leaves = [common.num_preprocessed_polys, common.config.num_wires,
                  common.num_zs_partial_products_polys,
                  common.num_quotient_polys]
    opening_proof = _read_fri_proof(buf, common.fri_params, num_leaves,
                                    hasher)
    public_inputs = buf.read_field_vec(common.num_public_inputs)
    return ProofWithPublicInputs(
        proof=Proof(wires_cap=wires_cap,
                    plonk_zs_partial_products_cap=zs_pp_cap,
                    quotient_polys_cap=quotient_cap,
                    openings=o, opening_proof=opening_proof),
        public_inputs=public_inputs)


def _write_merkle_proof(buf: Buffer, sibs) -> None:
    """u8 sibling count, then the sibling digests (reference:
    serialization/mod.rs:1467 write_merkle_proof)."""
    n = len(sibs)
    assert n < 256, "Merkle proof length must fit in u8"
    buf.write_u8(n)
    buf.write_cap(sibs)


def _write_fri_proof(buf: Buffer, fp: FriProof) -> None:
    for cap in fp.commit_phase_merkle_caps:
        buf.write_cap(cap)
    for qr in fp.query_round_proofs:
        for evals, sibs in qr.initial_trees_proof.evals_proofs:
            buf.write_field_vec([int(x) for x in evals])
            _write_merkle_proof(buf, sibs)
        for step in qr.steps:
            buf.write_ext_vec(step.evals)
            _write_merkle_proof(buf, step.merkle_proof)
    buf.write_ext_vec(fp.final_poly)
    buf.write_field(int(fp.pow_witness))


def _read_fri_proof(buf: Buffer, fri_params, num_leaves_per_oracle,
                    hasher=None):
    cap_height = fri_params.config.cap_height
    caps = [buf.read_cap(cap_height, hasher)
            for _ in fri_params.reduction_arity_bits]

    def read_merkle_proof():
        k = buf.read_u8()
        if hasher is not None and not hasher.algebraic:
            return [buf.read_hash(hasher) for _ in range(k)]
        return np.asarray([buf.read_hash() for _ in range(k)],
                          dtype=np.uint64).reshape(k, 4)

    rounds = []
    for _ in range(fri_params.config.num_query_rounds):
        evals_proofs = []
        for n_leaves in num_leaves_per_oracle:
            evals = np.asarray(buf.read_field_vec(n_leaves), dtype=np.uint64)
            evals_proofs.append((evals, read_merkle_proof()))
        steps = []
        for arity_bits in fri_params.reduction_arity_bits:
            evals = buf.read_ext_vec(1 << arity_bits)
            steps.append(FriQueryStep(evals=evals,
                                      merkle_proof=read_merkle_proof()))
        rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(evals_proofs=evals_proofs),
            steps=steps))
    final_poly = buf.read_ext_vec(fri_params.final_poly_len)
    pow_witness = buf.read_field()
    return FriProof(commit_phase_merkle_caps=caps, query_round_proofs=rounds,
                    final_poly=final_poly, pow_witness=pow_witness)


# ---------------------------------------------------------------------------
# Verifier data (checkpoint/resume of the verification key)
# ---------------------------------------------------------------------------

def serialize_verifier_data(vd) -> bytes:
    """reference: serialization/mod.rs:1924 write_verifier_only_circuit_data
    — the cap is prefixed by its HEIGHT (log2 of its length), not length."""
    buf = Buffer()
    n = len(vd.constants_sigmas_cap)
    height = n.bit_length() - 1
    assert 1 << height == n, n
    buf.write_usize(height)
    buf.write_cap(vd.constants_sigmas_cap)
    buf.write_hash(vd.circuit_digest)
    return buf.bytes()


def deserialize_verifier_data(data: bytes):
    from ..plonk.circuit_data import VerifierOnlyData
    buf = Buffer(data)
    n = 1 << buf.read_usize()
    cap = [buf.read_hash() for _ in range(n)]
    digest = buf.read_hash()
    return VerifierOnlyData(constants_sigmas_cap=cap, circuit_digest=digest)


# ---------------------------------------------------------------------------
# Compressed proofs (reference: serialization/mod.rs write_compressed_proof)
# ---------------------------------------------------------------------------

def serialize_compressed_proof_with_pis(cpwp, common) -> bytes:
    from ..fri.compressed import CompressedFriProof, CompressedFriQueryRounds
    buf = Buffer()
    p = cpwp.proof
    buf.write_cap(p.wires_cap)
    buf.write_cap(p.plonk_zs_partial_products_cap)
    buf.write_cap(p.quotient_polys_cap)
    o = p.openings
    for vec in (o.constants, o.plonk_sigmas, o.wires, o.plonk_zs,
                o.plonk_zs_next, o.partial_products, o.quotient_polys):
        buf.write_ext_vec(vec)
    fp = p.opening_proof
    for cap in fp.commit_phase_merkle_caps:
        buf.write_cap([[int(x) for x in h] for h in cap])
    # reference: serialization/mod.rs:2032 write_compressed_fri_query_rounds
    # — indices as raw u32 (count = num_query_rounds from common data), then
    # the dedup'd maps in sorted-key order with NO counts or keys (the
    # reader reconstructs keys by replaying the index folding)
    qrp = fp.query_round_proofs
    for i in qrp.indices:
        buf.write_u32(i)
    for idx in sorted(qrp.initial_trees_proofs):
        itp = qrp.initial_trees_proofs[idx]
        for evals, sibs in itp.evals_proofs:
            buf.write_field_vec([int(x) for x in evals])
            _write_merkle_proof(buf, [[int(x) for x in s] for s in sibs])
    for level in qrp.steps:
        for idx in sorted(level):
            step = level[idx]
            buf.write_ext_vec(step.evals)
            _write_merkle_proof(buf,
                                [[int(x) for x in s]
                                 for s in step.merkle_proof])
    buf.write_ext_vec(fp.final_poly)
    buf.write_field(int(fp.pow_witness))
    buf.write_field_vec(cpwp.public_inputs)
    return buf.bytes()


def deserialize_compressed_proof_with_pis(data: bytes, common):
    from ..fri.compressed import CompressedFriProof, CompressedFriQueryRounds
    from ..fri.proof import FriInitialTreeProof, FriQueryStep
    from ..plonk.compressed_proof import (
        CompressedProof, CompressedProofWithPublicInputs,
    )
    buf = Buffer(data)
    ch = common.config.fri_config.cap_height
    wires_cap = buf.read_cap(ch)
    zs_pp_cap = buf.read_cap(ch)
    quotient_cap = buf.read_cap(ch)
    o = OpeningSet(
        constants=buf.read_ext_vec(len(common.constants_range)),
        plonk_sigmas=buf.read_ext_vec(len(common.sigmas_range)),
        wires=buf.read_ext_vec(common.config.num_wires),
        plonk_zs=buf.read_ext_vec(len(common.zs_range)),
        plonk_zs_next=buf.read_ext_vec(len(common.zs_range)),
        partial_products=buf.read_ext_vec(len(common.partial_products_range)),
        quotient_polys=buf.read_ext_vec(common.num_quotient_polys),
    )
    fri_params = common.fri_params
    caps = [buf.read_cap(ch) for _ in fri_params.reduction_arity_bits]
    num_leaves = [common.num_preprocessed_polys, common.config.num_wires,
                  common.num_zs_partial_products_polys,
                  common.num_quotient_polys]
    # reference: serialization/mod.rs:1039 read_compressed_fri_query_rounds
    # — counts and keys are reconstructed from the query indices by
    # replaying the per-level index folding
    original_indices = [buf.read_u32()
                        for _ in range(fri_params.config.num_query_rounds)]
    idx_work = sorted(set(original_indices))
    initial = {}
    for idx in idx_work:
        evals_proofs = []
        for n_leaves in num_leaves:
            evals = buf.read_field_vec(n_leaves)
            n_sibs = buf.read_u8()
            sibs = [buf.read_hash() for _ in range(n_sibs)]
            evals_proofs.append((evals, sibs))
        initial[idx] = FriInitialTreeProof(evals_proofs=evals_proofs)
    steps = []
    for arity_bits in fri_params.reduction_arity_bits:
        idx_work = sorted(set(i >> arity_bits for i in idx_work))
        level = {}
        for idx in idx_work:
            evals = buf.read_ext_vec((1 << arity_bits) - 1)
            sibs = [buf.read_hash() for _ in range(buf.read_u8())]
            level[idx] = FriQueryStep(evals=evals, merkle_proof=sibs)
        steps.append(level)
    indices = original_indices
    final_poly = buf.read_ext_vec(fri_params.final_poly_len)
    pow_witness = buf.read_field()
    public_inputs = buf.read_field_vec(common.num_public_inputs)
    return CompressedProofWithPublicInputs(
        proof=CompressedProof(
            wires_cap=wires_cap, plonk_zs_partial_products_cap=zs_pp_cap,
            quotient_polys_cap=quotient_cap, openings=o,
            opening_proof=CompressedFriProof(
                commit_phase_merkle_caps=caps,
                query_round_proofs=CompressedFriQueryRounds(
                    indices=indices, initial_trees_proofs=initial,
                    steps=steps),
                final_poly=final_poly, pow_witness=pow_witness)),
        public_inputs=public_inputs)
