"""Device polynomial kernels for the FRI opening path.

TPU-first replacements for the reference's sequential polynomial routines:
- reduce_polys_base (reference: util/reducing.rs:83-97): batched weighted sum
  over the poly axis (tree reduction, log depth).
- divide_by_linear (reference: field/src/polynomial/division.rs:75-89):
  synthetic division is a sequential recurrence q_{i-1} = p_i + z*q_i; here it
  becomes a *parallel* suffix scan: q_i = z^{-(i+1)} * sum_{j>i} p_j z^j,
  computed with jax.lax.associative_scan over field adds — log-depth instead
  of N sequential steps.
- Horner arity-fold for FRI commit layers (reference: fri/prover.rs:94-105).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field.goldilocks import GF, gf_powers
from ..field.extension import GF2, gf2_powers


def reduce_polys_base(polys: GF, alpha: GF2) -> GF2:
    """sum_j alpha^j * polys[j] for base-field polys [num, N] -> GF2 [N]."""
    num = polys.shape[0]
    apow = gf2_powers(alpha, num)  # [num]
    a0 = apow.c0.reshape(num, 1).broadcast_to(polys.shape)
    a1 = apow.c1.reshape(num, 1).broadcast_to(polys.shape)
    c0 = (a0 * polys).sum(axis=0)
    c1 = (a1 * polys).sum(axis=0)
    return GF2(c0, c1)


def _suffix_scan_add(x: GF2) -> GF2:
    """Suffix sums s_i = sum_{j>=i} x_j via associative scan (exact field add)."""
    def combine(a, b):
        ga = GF2(GF(a[0], a[1]), GF(a[2], a[3]))
        gb = GF2(GF(b[0], b[1]), GF(b[2], b[3]))
        s = ga + gb
        return (s.c0.lo, s.c0.hi, s.c1.lo, s.c1.hi)

    out = jax.lax.associative_scan(
        combine, (x.c0.lo, x.c0.hi, x.c1.lo, x.c1.hi), reverse=True)
    return GF2(GF(out[0], out[1]), GF(out[2], out[3]))


def divide_by_linear(p: GF2, z: GF2) -> GF2:
    """Quotient of p(X) by (X - z), dropping the remainder p(z).

    p: GF2 [N] (coeff order low->high). Returns GF2 [N-1]? No — returns [N]
    with the last entry zero, so downstream shapes stay static; callers treat
    coefficient N-1 as absent (it is exactly zero).
    """
    n = p.shape[-1]
    zpow = gf2_powers(z, n)                      # z^0..z^{n-1}
    zinv = z.inverse()
    zinv_pow = gf2_powers(zinv, n) * zinv.broadcast_to((n,))  # z^{-1}..z^{-n}
    w = p * zpow                                  # p_j z^j
    s = _suffix_scan_add(w)                       # s_i = sum_{j>=i} p_j z^j
    # q_i = z^{-(i+1)} * s_{i+1}; define s_n = 0
    s_shift = GF2.concatenate([s[1:], GF2.zeros((1,))], axis=-1)
    return s_shift * zinv_pow


def horner_fold(coeffs: GF2, beta: GF2, arity_bits: int) -> GF2:
    """FRI coefficient fold: chunks of 2^arity_bits reduced by Horner in beta:
    out[j] = sum_i coeffs[j*arity + i] * beta^i."""
    arity = 1 << arity_bits
    n = coeffs.shape[-1]
    ch = coeffs.reshape(n // arity, arity)
    acc = ch[..., arity - 1]
    for i in range(arity - 2, -1, -1):
        acc = acc * beta.broadcast_to(acc.shape) + ch[..., i]
    return acc


def eval_poly_ext(coeffs: GF2, x: GF2) -> GF2:
    """p(x) for scalar extension x, parallel form: sum_i c_i x^i (tree sum)."""
    n = coeffs.shape[-1]
    xpow = gf2_powers(x, n)
    return (coeffs * xpow).sum(axis=-1)


def mul_poly_by_x(p: GF2) -> GF2:
    """Shift coefficients up by one (multiply by X), appending at the low end
    and extending the length by 1 (the okx circom-compat tweak,
    reference: fri/oracle.rs:547)."""
    return GF2.concatenate([GF2.zeros((1,)), p], axis=-1)
