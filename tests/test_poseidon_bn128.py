"""PoseidonBN128 hasher tests (reference: hash/poseidon_bn128.rs)."""

import pytest

from plonky2_tpu.hash.poseidon_bn128 import (
    GOLDILOCKS, P_BN254, _constants, _permute_bn254, hash_no_pad_bn128,
    permute_bn128, two_to_one_bn128,
)


def test_parameters_shape():
    rc, mds = _constants()
    assert len(rc) == 68 and all(len(r) == 5 for r in rc)
    assert all(0 < c < P_BN254 for row in rc for c in row)
    # MDS must be invertible (Cauchy matrices are); quick rank check mod p
    m = [row[:] for row in mds]
    p = P_BN254
    t = len(m)
    for col in range(t):
        piv = next(r for r in range(col, t) if m[r][col] % p != 0)
        m[col], m[piv] = m[piv], m[col]
        inv = pow(m[col][col], p - 2, p)
        for r in range(col + 1, t):
            f = m[r][col] * inv % p
            for c in range(t):
                m[r][c] = (m[r][c] - f * m[col][c]) % p
    assert all(m[i][i] % p != 0 for i in range(t))


def test_permutation_properties():
    s = list(range(12))
    out = permute_bn128(s)
    assert len(out) == 12
    assert all(0 <= x < GOLDILOCKS for x in out)
    assert out != s
    assert permute_bn128(s) == out   # deterministic
    # sponge + compression behave like the other hashers
    h = hash_no_pad_bn128([1, 2, 3, 4, 5])
    assert len(h) == 4
    assert two_to_one_bn128(h, h) != h


def test_reference_kat_hash_no_pad():
    """reference: poseidon_bn128.rs:218-237 (bit parity with the Go blob)."""
    v = [8917524657281059100, 13029010200779371910, 16138660518493481604,
         17277322750214136960, 1441151880423231822]
    assert hash_no_pad_bn128(v) == [16736853722845225729, 1446699130810517790,
                                    15445626857806971868, 6331160477881736675]


def test_reference_kat_two_to_one():
    """reference: poseidon_bn128.rs:239-268."""
    left = bytes([1, 2, 3, 4, 5, 6, 7, 8] * 4)
    right = bytes([8, 9, 3, 4, 5, 6, 7, 8] + [1, 2, 3, 4, 5, 6, 7, 8] * 2
                  + [1, 2, 3, 4, 5, 6, 7, 1])
    l = [int.from_bytes(left[8 * i:8 * i + 8], "little") for i in range(4)]
    r = [int.from_bytes(right[8 * i:8 * i + 8], "little") for i in range(4)]
    assert two_to_one_bn128(l, r) == [
        5894400909438531414, 4814851992117646301,
        17814584260098324190, 15859500576163309036]


def test_reference_kat_hash_public_inputs():
    """reference: poseidon_bn128.rs:270-289 — PI hashing delegates to
    Goldilocks Poseidon."""
    from plonky2_tpu.hash.hashers import PoseidonBN128GoldilocksConfig
    v = [8917524657281059100, 13029010200779351910, 16138660518493481604,
         17277322750214136960, 1441151880423231811]
    assert PoseidonBN128GoldilocksConfig.hash_public_inputs(v) == [
        2325439551141788444, 15244397589056680708,
        5900587506047513594, 7217031981798124005]


def test_native_c_library_matches_python_spec():
    """The C 4-limb Montgomery implementation (native/bn128_poseidon.c, the
    analog of the reference's Go static lib) must match the python Grain
    spec on permutation, sponge, leaf hashing, and digest compression."""
    import random

    import numpy as np

    from plonky2_tpu import native
    from plonky2_tpu.hash.hashers import POSEIDON_BN128

    if native.load_bn128() is None:
        import pytest
        pytest.skip("no C compiler for the native library")

    rng = random.Random(0xB128)
    for _ in range(3):
        st = [rng.randrange(1 << 64) for _ in range(12)]
        assert native.bn128_permute(st) == permute_bn128(st)
    for n in (1, 8, 9, 17):
        xs = [rng.randrange(1 << 64) for _ in range(n)]
        assert native.bn128_hash_no_pad(xs) == tuple(hash_no_pad_bn128(xs))
    leaves = np.array([[rng.randrange(1 << 64) for _ in range(6)]
                       for _ in range(4)] , dtype=np.uint64)
    want = np.asarray([POSEIDON_BN128.hash_or_noop_oracle(
        [int(x) for x in row]) for row in leaves], dtype=np.uint64)
    np.testing.assert_array_equal(POSEIDON_BN128.hash_leaves_np(leaves), want)
