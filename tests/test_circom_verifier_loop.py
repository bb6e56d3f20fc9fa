"""Close the circom loop on a REAL proof: export the whole vanishing-at-zeta
verifier as one straight-line GlExt circom program, execute it (python
evaluation of the goldilocks.circom template semantics) against the fib(100)
proof's actual openings and challenges, and require Z_H(zeta)*t(zeta)
equality; a tampered opening must fail the exported verifier.
(Reference: circom/circuits/goldilocks.circom templates +
circom/test/goldilcoks.test.js; verifier.rs:78-95 for the identity.)"""

import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.plonk.get_challenges import get_challenges
from plonky2_tpu.utils.circom_export import (
    evaluate_circom_program, export_vanishing_verifier_circom,
)

from golden_common import build_fib100


@pytest.fixture(scope="module")
def fib(fib_data_and_proof):
    return fib_data_and_proof


def _run_exported(data, proof, tamper=None):
    common = data.common
    pi_hash = common.gc.hash_public_inputs(
        [x % ref.ORDER for x in proof.public_inputs])
    ch = get_challenges(proof, pi_hash, data.verifier_only.circuit_digest,
                        common)
    zeta = tuple(ch.plonk_zeta)
    n = common.degree
    zeta_pow_n = ref.ext2_exp(zeta, n)
    num = ref.ext2_sub(zeta_pow_n, (1, 0))
    den = ref.ext2_scalar_mul(ref.ext2_sub(zeta, (1, 0)), n % ref.ORDER)
    l0 = ref.ext2_mul(num, ref.ext2_inverse(den))

    o = proof.proof.openings
    wires = [tuple(v) for v in o.wires]
    if tamper is not None:
        i, delta = tamper
        wires[i] = ((wires[i][0] + delta) % ref.ORDER, wires[i][1])
    code = export_vanishing_verifier_circom(common)
    bindings = {
        "zeta": zeta, "l0": l0,
        "constants": [tuple(v) for v in o.constants],
        "wires": wires,
        "plonk_zs": [tuple(v) for v in o.plonk_zs],
        "plonk_zs_next": [tuple(v) for v in o.plonk_zs_next],
        "partial_products": [tuple(v) for v in o.partial_products],
        "sigmas": [tuple(v) for v in o.plonk_sigmas],
        "betas": [(int(b), 0) for b in ch.plonk_betas],
        "gammas": [(int(g), 0) for g in ch.plonk_gammas],
        "alphas": [(int(a), 0) for a in ch.plonk_alphas],
        "public_input_hash": [int(h) for h in pi_hash],
    }
    outs = evaluate_circom_program(code, bindings)

    # rhs: Z_H(zeta) * t(zeta) reassembled from quotient chunks
    z_h = ref.ext2_sub(zeta_pow_n, (1, 0))
    qdf = common.quotient_degree_factor
    ok = []
    for i in range(common.config.num_challenges):
        chunk = o.quotient_polys[i * qdf:(i + 1) * qdf]
        acc = (0, 0)
        for cq in reversed(chunk):
            acc = ref.ext2_add(ref.ext2_mul(acc, zeta_pow_n), tuple(cq))
        ok.append(tuple(outs[i]) == tuple(ref.ext2_mul(z_h, acc)))
    return ok, code


def test_exported_verifier_accepts_real_proof(fib):
    data, proof = fib
    ok, code = _run_exported(data, proof)
    assert all(ok), ok
    # the emitted artifact looks like the reference's generated circom
    assert code.startswith("template VanishingAtZeta()")
    assert "GlExtMul()(" in code and "signal input wires" in code


def test_exported_verifier_rejects_tampered_opening(fib):
    data, proof = fib
    ok, _ = _run_exported(data, proof, tamper=(0, 1))
    assert not all(ok), "tampered wire opening must fail the exported check"
