"""Proof serialization roundtrip (reference: fibonacci_serialization example +
util/serialization tests). Reuses the module-scoped fibonacci proof."""

from plonky2_tpu.utils.serialization import (
    deserialize_proof_with_pis, deserialize_verifier_data,
    serialize_proof_with_pis, serialize_verifier_data,
)


def test_proof_roundtrip_and_verify(fib_data_and_proof):  # noqa: F811
    data, proof = fib_data_and_proof
    blob = serialize_proof_with_pis(proof, data.common)
    restored = deserialize_proof_with_pis(blob, data.common)
    assert restored.public_inputs == proof.public_inputs
    assert blob == serialize_proof_with_pis(restored, data.common)
    data.verify(restored)

    vblob = serialize_verifier_data(data.verifier_only)
    vd = deserialize_verifier_data(vblob)
    assert vd.circuit_digest == data.verifier_only.circuit_digest
    assert vd.constants_sigmas_cap == data.verifier_only.constants_sigmas_cap


def test_proof_byte_layout_matches_reference_format(fib_data_and_proof):
    """Pin the exact wire format of write_proof_with_public_inputs
    (reference: util/serialization/mod.rs:1974-2014): caps as raw 32-byte
    digests, openings as D=2 extension u64-LE pairs, Merkle proofs with a
    single u8 length prefix, u64-LE field elements everywhere, NO other
    prefixes. Any accidental tag/length insertion changes the total size
    and fails this formula."""
    data, proof = fib_data_and_proof
    common = data.common
    config = common.config
    fri = common.fri_params
    blob = serialize_proof_with_pis(proof, common)

    cap_bytes = (1 << config.fri_config.cap_height) * 32
    n_openings = (len(common.constants_range) + len(common.sigmas_range)
                  + config.num_wires + 2 * len(common.zs_range)
                  + len(common.partial_products_range)
                  + common.num_quotient_polys)
    openings_bytes = n_openings * 16

    init_sibs = fri.lde_bits - config.fri_config.cap_height
    oracle_widths = [common.num_preprocessed_polys, config.num_wires,
                     common.num_zs_partial_products_polys,
                     common.num_quotient_polys]
    per_round = sum(w * 8 + 1 + init_sibs * 32 for w in oracle_widths)
    sibs = init_sibs
    for arity_bits in fri.reduction_arity_bits:
        sibs -= arity_bits
        per_round += (1 << arity_bits) * 16 + 1 + sibs * 32
    fri_bytes = (len(fri.reduction_arity_bits) * cap_bytes
                 + fri.config.num_query_rounds * per_round
                 + fri.final_poly_len * 16 + 8)

    expected = (3 * cap_bytes + openings_bytes + fri_bytes
                + common.num_public_inputs * 8)
    assert len(blob) == expected, (len(blob), expected)

    # spot-check offset 0: the first wires-cap digest, 4 u64 LE words
    import struct
    first = struct.unpack("<4Q", blob[:32])
    assert list(first) == [int(x) for x in proof.proof.wires_cap[0]]
