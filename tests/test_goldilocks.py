"""Goldilocks field: device kernels vs pure-Python oracle.

Mirrors the reference's test_field_arithmetic! macro coverage
(reference: field/src/field_testing.rs:6-181).
"""

import numpy as np
import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.goldilocks import GF, gf_powers

RNG = np.random.default_rng(0)


def rand_u64(n, include_edge=True):
    vals = RNG.integers(0, ref.ORDER, size=n, dtype=np.uint64)
    if include_edge and n >= 8:
        edge = [0, 1, 2, ref.ORDER - 1, ref.ORDER - 2, 0xFFFFFFFF,
                0x100000000, ref.ORDER >> 1]
        vals[: len(edge)] = edge
    return vals


def test_roundtrip():
    x = rand_u64(64)
    assert (GF.from_u64(x).to_u64() == x).all()


@pytest.mark.parametrize("op,oracle", [
    ("add", ref.add), ("sub", ref.sub), ("mul", ref.mul),
])
def test_binary_ops(op, oracle):
    n = 256
    a, b = rand_u64(n), rand_u64(n)
    # adversarial pairs: both near p-1, values with hi=0xffffffff, etc.
    a[:8] = [ref.ORDER - 1, ref.ORDER - 1, 0xFFFFFFFF, 1,
             0xFFFFFFFF00000000, ref.ORDER - 1, 0, 0x123456789ABCDEF0 % ref.ORDER]
    b[:8] = [ref.ORDER - 1, 1, 0xFFFFFFFF, ref.ORDER - 1,
             0xFFFFFFFF00000000, 2, 0, 0xFEDCBA9876543210 % ref.ORDER]
    ga, gb = GF.from_u64(a), GF.from_u64(b)
    got = {"add": ga + gb, "sub": ga - gb, "mul": ga * gb}[op].to_u64()
    want = np.array([oracle(int(x), int(y)) for x, y in zip(a, b)],
                    dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_neg_square():
    a = rand_u64(128)
    ga = GF.from_u64(a)
    np.testing.assert_array_equal(
        (-ga).to_u64(), [ref.neg(int(x)) for x in a])
    np.testing.assert_array_equal(
        ga.square().to_u64(), [ref.mul(int(x), int(x)) for x in a])


def test_mul_small():
    a = rand_u64(64)
    ga = GF.from_u64(a)
    for c in [0, 1, 7, 41, 0xFFFFFFFF]:
        np.testing.assert_array_equal(
            ga.mul_small(c).to_u64(), [ref.mul(int(x), c) for x in a])


def test_inverse():
    a = rand_u64(32)
    a[a == 0] = 1
    ga = GF.from_u64(a)
    inv = ga.inverse()
    np.testing.assert_array_equal(
        inv.to_u64(), [ref.inverse(int(x)) for x in a])
    np.testing.assert_array_equal((ga * inv).to_u64(), np.ones(32, np.uint64))


def test_exp():
    a = rand_u64(16)
    for e in [0, 1, 2, 7, 12345, ref.ORDER - 2]:
        np.testing.assert_array_equal(
            GF.from_u64(a).exp(e).to_u64(), [ref.exp(int(x), e) for x in a])


def test_powers():
    g = ref.primitive_root_of_unity(10)
    p = gf_powers(GF.const(g), 1024).to_u64()
    want = ref.two_adic_subgroup(10)
    np.testing.assert_array_equal(p, np.array(want, dtype=np.uint64))


def test_sum():
    a = rand_u64(100)
    got = GF.from_u64(a).sum().to_u64()
    want = 0
    for x in a:
        want = ref.add(want, int(x))
    assert int(got) == want


def test_root_of_unity_orders():
    # primitive_root_of_unity(k)^(2^k) == 1 and ^(2^(k-1)) == -1
    for k in [1, 5, 20, 32]:
        g = ref.primitive_root_of_unity(k)
        assert ref.exp(g, 1 << k) == 1
        if k > 0:
            assert ref.exp(g, 1 << (k - 1)) == ref.ORDER - 1
