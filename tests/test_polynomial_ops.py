"""Device polynomial kernels vs host-integer oracles (reference:
field/src/polynomial/mod.rs tests — division roundtrip, evaluation).
Shapes are tiny; every kernel is checked against plain modular arithmetic
over the quadratic extension."""

import random

import numpy as np

from plonky2_tpu.field import reference as ref
from plonky2_tpu.field.extension import GF2
from plonky2_tpu.ops.polynomial import (
    divide_by_linear, eval_poly_ext, horner_fold, mul_poly_by_x,
)

rng = random.Random(0x9013)
N = 16


def _rand_ext():
    return (rng.randrange(ref.ORDER), rng.randrange(ref.ORDER))


def _gf2_from_list(coeffs):
    c0 = np.asarray([c[0] for c in coeffs], dtype=np.uint64)
    c1 = np.asarray([c[1] for c in coeffs], dtype=np.uint64)
    return GF2.from_u64_pair(c0, c1)


def _to_list(p: GF2):
    c0, c1 = p.to_u64_pair()
    return list(zip(np.asarray(c0).tolist(), np.asarray(c1).tolist()))


def _host_eval(coeffs, x):
    acc = (0, 0)
    for c in reversed(coeffs):
        acc = ref.ext2_add(ref.ext2_mul(acc, x), c)
    return acc


def test_eval_poly_ext_matches_host_horner():
    coeffs = [_rand_ext() for _ in range(N)]
    x = _rand_ext()
    got = eval_poly_ext(_gf2_from_list(coeffs), _gf2_from_list([x])[0])
    assert _to_list(got.reshape((1,)))[0] == _host_eval(coeffs, x)


def test_divide_by_linear_reconstructs():
    """p(X) = q(X)·(X − z) + p(z) with q = divide_by_linear(p, z); verified
    by host multiply-back at full precision."""
    coeffs = [_rand_ext() for _ in range(N)]
    z = _rand_ext()
    q = _to_list(divide_by_linear(_gf2_from_list(coeffs),
                                  _gf2_from_list([z])[0]))
    assert q[-1] == (0, 0)          # static-shape padding slot
    rem = _host_eval(coeffs, z)
    # reconstruct q·(X−z)+rem coefficient by coefficient
    recon = []
    for i in range(N):
        qi = q[i] if i < N else (0, 0)
        qim1 = q[i - 1] if i >= 1 else (0, 0)
        term = ref.ext2_sub(qim1, ref.ext2_mul(qi, z))
        if i == 0:
            term = ref.ext2_add(term, rem)
        recon.append(term)
    assert recon == coeffs


def test_horner_fold_matches_host():
    """FRI fold: out[j] = sum_i coeffs[j*arity+i]·beta^i, arity 4."""
    arity_bits = 2
    arity = 1 << arity_bits
    coeffs = [_rand_ext() for _ in range(N)]
    beta = _rand_ext()
    got = _to_list(horner_fold(_gf2_from_list(coeffs),
                               _gf2_from_list([beta])[0], arity_bits))
    want = [_host_eval(coeffs[j * arity:(j + 1) * arity], beta)
            for j in range(N // arity)]
    assert got == want


def test_mul_poly_by_x_shifts():
    """Coefficients shift up one degree, length grows by one (the okx
    circom-compat sum·X tweak, reference: fri/oracle.rs:547)."""
    coeffs = [_rand_ext() for _ in range(N)]
    got = _to_list(mul_poly_by_x(_gf2_from_list(coeffs)))
    assert got == [(0, 0)] + coeffs
