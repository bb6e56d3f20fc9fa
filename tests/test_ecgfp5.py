"""EcGFp5 curve + Schnorr tests (reference: ecgfp5/src/curve tests,
gadgets/schnorr.rs tests, scalar_field.rs tests, mul_table.rs/test_mulgen
curve.rs:1667-1680)."""

import random

from plonky2_tpu.ecgfp5.curve import (
    GENERATOR, N, NEUTRAL, mulgen, schnorr_keygen, schnorr_sign,
    schnorr_verify,
)
from plonky2_tpu.ecgfp5.scalar_field import Scalar

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


# -- scalar field (reference: scalar_field.rs inline tests) -------------------

def test_scalar_field_axioms():
    a = Scalar(rng.randrange(N))
    b = Scalar(rng.randrange(N))
    c = Scalar(rng.randrange(N))
    assert a + b == b + a
    assert (a + b) + c == a + (b + c)
    assert a * (b + c) == a * b + a * c
    assert a - a == Scalar.zero()
    assert a + (-a) == Scalar.zero()
    assert a * Scalar.one() == a
    assert (a * b) * c == a * (b * c)
    if not a.is_zero():
        assert a * a.inverse() == Scalar.one()
        assert (a / b) * b == a if not b.is_zero() else True
    assert Scalar.zero().inverse() == Scalar.zero()
    assert a.square() == a * a
    assert a.double() == a + a
    assert a.exp(5) == a * a * a * a * a


def test_scalar_encode_decode():
    a = Scalar(rng.randrange(N))
    buf = a.encode()
    assert len(buf) == 40
    assert Scalar.from_canonical_bytes(buf) == a
    # non-canonical 40-byte value must be rejected
    big = (N + 1).to_bytes(40, "little")
    assert Scalar.from_canonical_bytes(big) is None
    # noncanonical decode reduces mod n
    assert Scalar.from_noncanonical_bytes(big) == Scalar(1)
    # from_gfp5 embedding
    limbs = tuple(rng.randrange(2**64 - 2**32 + 1) for _ in range(5))
    want = sum(x << (64 * i) for i, x in enumerate(limbs)) % N
    assert Scalar.from_gfp5(limbs) == Scalar(want)
    assert Scalar.from_hashout(limbs[1:]) == Scalar.from_gfp5(
        (0,) + limbs[1:])


def test_scalar_recode_signed():
    for w in (2, 5, 10):
        a = Scalar(rng.randrange(N))
        num = -(-320 // w) + 1
        digits = a.recode_signed(num, w)
        assert all(-(1 << (w - 1)) <= d < (1 << (w - 1)) for d in digits)
        assert digits[-1] >= 0
        assert sum(d << (w * i) for i, d in enumerate(digits)) == a.v


def test_mulgen_matches_generic_mul():
    """Fixed-base window path == generic double-and-add
    (reference: curve.rs test_mulgen:1667-1680)."""
    for k in (0, 1, 2, N - 1, rng.randrange(N), rng.randrange(N)):
        p = mulgen(k)
        q = GENERATOR.mul(k)
        assert p.is_inf == q.is_inf
        if not p.is_inf:
            assert (p.x, p.y) == (q.x, q.y)
