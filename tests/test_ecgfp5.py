"""EcGFp5 curve + Schnorr tests (reference: ecgfp5/src/curve tests,
gadgets/schnorr.rs tests)."""

import random

from plonky2_tpu.ecgfp5.curve import (
    GENERATOR, N, NEUTRAL, schnorr_keygen, schnorr_sign, schnorr_verify,
)

rng = random.Random(43)


def test_curve_group_law():
    assert GENERATOR.is_valid()
    g2 = GENERATOR.double()
    assert g2.is_valid()
    assert GENERATOR.add(GENERATOR).x == g2.x
    assert GENERATOR.mul(N).is_inf
    assert GENERATOR.add(GENERATOR.neg()).is_inf
    # (a+b)G == aG + bG
    a = rng.randrange(1, N)
    b = rng.randrange(1, N)
    lhs = GENERATOR.mul((a + b) % N)
    rhs = GENERATOR.mul(a).add(GENERATOR.mul(b))
    assert (lhs.x, lhs.y) == (rhs.x, rhs.y)
    assert NEUTRAL.add(GENERATOR).x == GENERATOR.x


def test_schnorr_sign_verify():
    pk, sk = schnorr_keygen(rng.randrange(1, N))
    msg = [rng.randrange(2**64 - 2**32 + 1) for _ in range(6)]
    sig = schnorr_sign(msg, sk, k=rng.randrange(1, N))
    assert schnorr_verify(msg, pk, sig)
    assert not schnorr_verify(msg[:-1] + [1], pk, sig)
