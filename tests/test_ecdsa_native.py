"""Native secp256k1 curve + GLV + ECDSA tests
(reference: ecdsa/src/curve/ tests)."""

import random

from plonky2_tpu.ecdsa.curve import (
    ECDSASecretKey, GENERATOR, GLV_S, N, decompose_secp256k1_scalar, glv_mul,
    msm, sign_message, verify_message,
)

rng = random.Random(41)


def test_curve_ops():
    assert GENERATOR.is_valid()
    g2 = GENERATOR.double()
    assert g2.is_valid()
    assert GENERATOR.add(GENERATOR) == g2
    assert GENERATOR.mul(N).zero
    assert GENERATOR.add(GENERATOR.neg()).zero


def test_glv_decomposition():
    for _ in range(5):
        k = rng.randrange(1, N)
        k1, k2, k1_neg, k2_neg = decompose_secp256k1_scalar(k)
        s1 = (-k1 if k1_neg else k1) % N
        s2 = (-k2 if k2_neg else k2) % N
        assert (s1 + GLV_S * s2) % N == k
        assert k1 < (1 << 129) and k2 < (1 << 129)


def test_mul_msm_glv_agree():
    for _ in range(3):
        k = rng.randrange(1, N)
        a = GENERATOR.mul(k)
        b = msm([k], [GENERATOR])
        c = glv_mul(GENERATOR, k)
        assert (a.x, a.y) == (b.x, b.y) == (c.x, c.y)


def test_ecdsa_sign_verify():
    sk = ECDSASecretKey(rng.randrange(1, N))
    pk = sk.to_public()
    msg = rng.randrange(N)
    sig = sign_message(msg, sk)
    assert verify_message(msg, sig, pk)
    assert not verify_message((msg + 1) % N, sig, pk)
