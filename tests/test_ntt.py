"""NTT/LDE vs naive oracle evaluation (reference: field/src/fft.rs tests)."""

import jax
import numpy as np
import pytest

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.ops import ntt

RNG = np.random.default_rng(2)


def rand_poly(n):
    return RNG.integers(0, ref.ORDER, size=n, dtype=np.uint64)


@pytest.mark.parametrize("lg_n", [0, 1, 2, 5, 8])
def test_fft_vs_naive(lg_n):
    n = 1 << lg_n
    c = rand_poly(n)
    got = ntt.fft(GF.from_u64(c)).to_u64()
    want = ref.naive_fft([int(x) for x in c])
    np.testing.assert_array_equal(got, np.array(want, dtype=np.uint64))


def test_fft_ifft_roundtrip():
    c = rand_poly(256)
    gc = GF.from_u64(c)
    back = ntt.ifft(ntt.fft(gc)).to_u64()
    np.testing.assert_array_equal(back, c)


def test_batched_fft():
    c = rand_poly(4 * 64).reshape(4, 64)
    got = ntt.fft(GF.from_u64(c)).to_u64()
    for i in range(4):
        want = ref.naive_fft([int(x) for x in c[i]])
        np.testing.assert_array_equal(got[i], np.array(want, dtype=np.uint64))


def test_coset_fft():
    n = 64
    c = rand_poly(n)
    got = ntt.coset_fft(GF.from_u64(c)).to_u64()
    g = ref.primitive_root_of_unity(6)
    shift = ref.MULTIPLICATIVE_GROUP_GENERATOR
    for j in range(n):
        x = ref.mul(shift, ref.exp(g, j))
        assert int(got[j]) == ref.poly_eval([int(v) for v in c], x)


def test_coset_ifft_roundtrip():
    c = rand_poly(128)
    gc = GF.from_u64(c)
    back = ntt.coset_ifft(ntt.coset_fft(gc)).to_u64()
    np.testing.assert_array_equal(back, c)


@pytest.mark.parametrize("rate_bits", [1, 3])
def test_lde_matches_padded_fft(rate_bits):
    n = 32
    c = rand_poly(n)
    padded = np.zeros(n << rate_bits, dtype=np.uint64)
    padded[:n] = c
    want = ntt.fft(GF.from_u64(padded)).to_u64()
    got = ntt.lde_fft(GF.from_u64(c), rate_bits).to_u64()
    np.testing.assert_array_equal(got, want)


def test_coset_lde_matches_padded_coset_fft():
    n, r = 32, 3
    c = rand_poly(n)
    padded = np.zeros(n << r, dtype=np.uint64)
    padded[:n] = c
    want = ntt.coset_fft(GF.from_u64(padded)).to_u64()
    got = ntt.coset_lde(GF.from_u64(c), r).to_u64()
    np.testing.assert_array_equal(got, want)


def test_fft_under_jit():
    c = rand_poly(128)
    f = jax.jit(ntt.fft)
    got = f(GF.from_u64(c)).to_u64()
    want = ntt.fft(GF.from_u64(c)).to_u64()
    np.testing.assert_array_equal(got, want)
