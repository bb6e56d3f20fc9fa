"""MXU limb-matmul NTT (ops/ntt_mxu.py) must be bit-exact vs the butterfly
path for every transform variant, across multi-level size decompositions,
batching, and extreme field values (0, 1, p-1). On TPU this path dispatches
automatically from ops.ntt (>= 2^8); here it is called directly so the CPU
suite covers the same code."""

import numpy as np
import pytest

from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.ops import ntt, ntt_mxu

ORDER = (1 << 64) - (1 << 32) + 1
rng = np.random.default_rng(11)


def _rand(shape):
    return GF.from_u64(rng.integers(0, ORDER, size=shape, dtype=np.uint64))


@pytest.mark.parametrize("lg,batch", [(4, 3), (9, 2), (10, 2)])
def test_all_transforms_bit_exact(lg, batch):
    x = _rand((batch, 1 << lg))
    assert np.array_equal(ntt.fft(x).to_u64(), ntt_mxu.fft(x).to_u64())
    assert np.array_equal(ntt.ifft(x).to_u64(), ntt_mxu.ifft(x).to_u64())
    assert np.array_equal(ntt.coset_fft(x).to_u64(),
                          ntt_mxu.coset_fft(x, 7).to_u64())
    assert np.array_equal(ntt.coset_lde(x, 3).to_u64(),
                          ntt_mxu.lde_fft(x, 3, shift=7).to_u64())
    assert np.array_equal(ntt.coset_ifft(x).to_u64(),
                          ntt_mxu.coset_ifft(x, 7).to_u64())


def test_edge_values_and_1d():
    x = GF.from_u64(np.array([0, 1, ORDER - 1, ORDER - 2] * 64,
                             dtype=np.uint64))
    assert np.array_equal(ntt.fft(x).to_u64(), ntt_mxu.fft(x).to_u64())
    assert np.array_equal(ntt.ifft(x).to_u64(), ntt_mxu.ifft(x).to_u64())


def test_roundtrip():
    x = _rand((2, 1 << 9))
    back = ntt_mxu.ifft(ntt_mxu.fft(x))
    assert np.array_equal(back.to_u64(), x.to_u64())
    back = ntt_mxu.coset_ifft(ntt_mxu.coset_fft(x, 7), 7)
    assert np.array_equal(back.to_u64(), x.to_u64())


def test_balanced_limbs_roundtrip():
    v = rng.integers(0, ORDER, size=(257,), dtype=np.uint64)
    v[:4] = [0, 1, ORDER - 1, (1 << 64) - (1 << 32)]
    limbs = ntt_mxu._balanced_limbs_np(v).astype(object)
    recon = sum(limbs[i] * (1 << (8 * i)) for i in range(9))
    assert all(int(r) == int(x) for r, x in zip(recon, v))
    assert limbs.max() <= 127 and limbs.min() >= -128
