"""Quadratic extension field vs oracle (reference: field/src/extension/quadratic.rs)."""

import numpy as np

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.extension import (
    GF2, EXT_POWER_OF_TWO_GENERATOR, gf2_powers,
)

RNG = np.random.default_rng(1)


def rand_pairs(n):
    return (RNG.integers(0, ref.ORDER, size=n, dtype=np.uint64),
            RNG.integers(0, ref.ORDER, size=n, dtype=np.uint64))


def test_mul_add_sub():
    a0, a1 = rand_pairs(64)
    b0, b1 = rand_pairs(64)
    ga, gb = GF2.from_u64_pair(a0, a1), GF2.from_u64_pair(b0, b1)
    for name, got, fn in [
        ("mul", ga * gb, ref.ext2_mul),
        ("add", ga + gb, ref.ext2_add),
        ("sub", ga - gb, ref.ext2_sub),
    ]:
        g0, g1 = got.to_u64_pair()
        for i in range(64):
            w = fn((int(a0[i]), int(a1[i])), (int(b0[i]), int(b1[i])))
            assert (int(g0[i]), int(g1[i])) == w, name


def test_inverse():
    a0, a1 = rand_pairs(16)
    ga = GF2.from_u64_pair(a0, a1)
    inv = ga.inverse()
    prod = ga * inv
    p0, p1 = prod.to_u64_pair()
    assert (p0 == 1).all() and (p1 == 0).all()


def test_exp_and_two_adic_generator():
    # EXT_POWER_OF_TWO_GENERATOR has order 2^33
    g = GF2.const(*EXT_POWER_OF_TWO_GENERATOR)
    sq = g
    for _ in range(33):
        sq = sq * sq
    s0, s1 = sq.to_u64_pair()
    assert int(s0) == 1 and int(s1) == 0
    half = g.exp(1 << 32)
    h0, h1 = half.to_u64_pair()
    assert (int(h0), int(h1)) != (1, 0)


def test_frobenius():
    a0, a1 = rand_pairs(8)
    ga = GF2.from_u64_pair(a0, a1)
    frob = ga.frobenius()
    want = ga.exp(ref.ORDER)
    f0, f1 = frob.to_u64_pair()
    w0, w1 = want.to_u64_pair()
    np.testing.assert_array_equal(f0, w0)
    np.testing.assert_array_equal(f1, w1)


def test_powers():
    a0, a1 = 12345, 6789
    p = gf2_powers(GF2.const(a0, a1), 16)
    p0, p1 = p.to_u64_pair()
    acc = (1, 0)
    for i in range(16):
        assert (int(p0[i]), int(p1[i])) == acc
        acc = ref.ext2_mul(acc, (a0, a1))


def test_quartic_quintic_extension_axioms():
    """Field axioms for D=4,5 OEFs (reference: goldilocks_extensions.rs
    quartic W=7, quintic W=3; field_testing macros)."""
    import random

    from plonky2_tpu.field import reference as ref

    rng = random.Random(11)
    for d, w, dth in [(4, ref.EXT4_W, ref.EXT4_DTH_ROOT),
                      (5, ref.EXT5_W, ref.EXT5_DTH_ROOT)]:
        # DTH_ROOT = W^((p-1)/D)
        assert dth == ref.exp(w, (ref.ORDER - 1) // d)
        one = tuple([1] + [0] * (d - 1))
        for _ in range(8):
            a = tuple(rng.randrange(ref.ORDER) for _ in range(d))
            b = tuple(rng.randrange(ref.ORDER) for _ in range(d))
            c = tuple(rng.randrange(ref.ORDER) for _ in range(d))
            # associativity + distributivity
            assert ref.extn_mul(ref.extn_mul(a, b, w), c, w) == \
                ref.extn_mul(a, ref.extn_mul(b, c, w), w)
            assert ref.extn_mul(ref.extn_add(a, b), c, w) == \
                ref.extn_add(ref.extn_mul(a, c, w), ref.extn_mul(b, c, w))
            # inverse
            inv = ref.extn_inverse(a, w, dth)
            assert ref.extn_mul(a, inv, w) == one
            # frobenius is the p-power map and has order D
            assert ref.extn_frobenius(a, dth, 1) == \
                ref.extn_exp(a, ref.ORDER, w)
            assert ref.extn_frobenius(a, dth, d) == a
