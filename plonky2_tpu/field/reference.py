"""Pure-Python (arbitrary-precision int) Goldilocks oracle.

This module is the bit-exactness oracle for every device kernel: slow,
obviously-correct modular arithmetic used only in tests and host-side
precomputation (twiddle tables, circuit constants).

Semantics match the reference field (reference: field/src/goldilocks_field.rs:
ORDER, EPSILON, TWO_ADICITY=32, MULTIPLICATIVE_GROUP_GENERATOR=7,
POWER_OF_TWO_GENERATOR=1753635133440165772).
"""

from __future__ import annotations

ORDER = 0xFFFFFFFF00000001  # 2^64 - 2^32 + 1
EPSILON = 0xFFFFFFFF  # 2^32 - 1 == 2^64 mod ORDER
TWO_ADICITY = 32
MULTIPLICATIVE_GROUP_GENERATOR = 7
POWER_OF_TWO_GENERATOR = 1753635133440165772
# Quadratic extension F[X]/(X^2 - 7): W = 7, DTH_ROOT for Frobenius
# (reference: field/src/extension/quadratic.rs, goldilocks_extensions.rs).
EXT2_W = 7
EXT2_DTH_ROOT = 18446744069414584320  # ORDER - 1


def add(a: int, b: int) -> int:
    return (a + b) % ORDER


def sub(a: int, b: int) -> int:
    return (a - b) % ORDER


def neg(a: int) -> int:
    return (-a) % ORDER


def mul(a: int, b: int) -> int:
    return (a * b) % ORDER


def exp(a: int, e: int) -> int:
    return pow(a, e, ORDER)


def inverse(a: int) -> int:
    assert a % ORDER != 0, "0 has no inverse"
    return pow(a, ORDER - 2, ORDER)


def primitive_root_of_unity(n_log: int) -> int:
    """2^n_log-th primitive root of unity."""
    assert 0 <= n_log <= TWO_ADICITY
    base = POWER_OF_TWO_GENERATOR
    return pow(base, 1 << (TWO_ADICITY - n_log), ORDER)


def two_adic_subgroup(n_log: int) -> list[int]:
    g = primitive_root_of_unity(n_log)
    out = [1]
    for _ in range((1 << n_log) - 1):
        out.append(mul(out[-1], g))
    return out


def inverse_2exp(exp_: int) -> int:
    """1 / 2^exp_ mod p."""
    return inverse(pow(2, exp_, ORDER))


# ---------------------------------------------------------------------------
# Quadratic extension ops: element = (a0, a1) meaning a0 + a1*X, X^2 = 7.
# ---------------------------------------------------------------------------

def ext2_add(a, b):
    return (add(a[0], b[0]), add(a[1], b[1]))


def ext2_sub(a, b):
    return (sub(a[0], b[0]), sub(a[1], b[1]))


def ext2_mul(a, b):
    # (a0 + a1 X)(b0 + b1 X) = a0b0 + 7 a1b1 + (a0b1 + a1b0) X
    c0 = add(mul(a[0], b[0]), mul(EXT2_W, mul(a[1], b[1])))
    c1 = add(mul(a[0], b[1]), mul(a[1], b[0]))
    return (c0, c1)


def ext2_scalar_mul(a, s: int):
    return (mul(a[0], s), mul(a[1], s))


def ext2_inverse(a):
    # Norm = a0^2 - 7 a1^2; inverse = conj(a) / Norm.
    norm = sub(mul(a[0], a[0]), mul(EXT2_W, mul(a[1], a[1])))
    ninv = inverse(norm)
    return (mul(a[0], ninv), mul(neg(a[1]), ninv))


def ext2_exp(a, e: int):
    result = (1, 0)
    base = a
    while e:
        if e & 1:
            result = ext2_mul(result, base)
        base = ext2_mul(base, base)
        e >>= 1
    return result


# ---------------------------------------------------------------------------
# Generic degree-D OEF extensions F_p[X]/(X^D - W)
# (reference: field/src/extension/mod.rs OEF/Frobenius traits,
#  quartic.rs/quintic.rs; goldilocks_extensions.rs:40-93 — quartic W=7
#  DTH_ROOT=281474976710656, quintic W=3 DTH_ROOT=1041288259238279555).
# ---------------------------------------------------------------------------

EXT4_W = 7
EXT4_DTH_ROOT = 281474976710656
EXT5_W = 3
EXT5_DTH_ROOT = 1041288259238279555


def extn_add(a, b):
    return tuple(add(x, y) for x, y in zip(a, b))


def extn_sub(a, b):
    return tuple(sub(x, y) for x, y in zip(a, b))


def extn_neg(a):
    return tuple(neg(x) for x in a)


def extn_scalar_mul(a, s: int):
    return tuple(mul(x, s) for x in a)


def extn_mul(a, b, w: int):
    """c_k = sum_{i+j=k} a_i b_j + W sum_{i+j=k+D} a_i b_j."""
    d = len(a)
    c = [0] * d
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            t = mul(ai, bj)
            if i + j < d:
                c[i + j] = add(c[i + j], t)
            else:
                c[i + j - d] = add(c[i + j - d], mul(w, t))
    return tuple(c)


def extn_frobenius(a, dth_root: int, count: int = 1):
    """a -> a^(p^count): multiply coefficient i by DTH_ROOT^(i*count)
    (reference: extension/mod.rs:29-60 repeated_frobenius)."""
    d = len(a)
    z0 = exp(dth_root, count % d)
    z = 1
    out = []
    for x in a:
        out.append(mul(x, z))
        z = mul(z, z0)
    return tuple(out)


def extn_inverse(a, w: int, dth_root: int):
    """Inverse via the norm: a^-1 = (prod_{k=1..D-1} a^(p^k)) / N(a)
    (reference: extension/quartic.rs try_inverse)."""
    d = len(a)
    t = extn_frobenius(a, dth_root, 1)
    acc = t
    for k in range(2, d):
        acc = extn_mul(acc, extn_frobenius(a, dth_root, k), w)
    norm = extn_mul(a, acc, w)
    # the product of all conjugates lies in the base field
    assert all(x == 0 for x in norm[1:]), "norm not in base field"
    return extn_scalar_mul(acc, inverse(norm[0]))


def extn_exp(a, e: int, w: int):
    d = len(a)
    result = tuple([1] + [0] * (d - 1))
    base = a
    while e:
        if e & 1:
            result = extn_mul(result, base, w)
        base = extn_mul(base, base, w)
        e >>= 1
    return result


def ext4_mul(a, b):
    return extn_mul(a, b, EXT4_W)


def ext5_mul(a, b):
    return extn_mul(a, b, EXT5_W)


def ext4_inverse(a):
    return extn_inverse(a, EXT4_W, EXT4_DTH_ROOT)


def ext5_inverse(a):
    return extn_inverse(a, EXT5_W, EXT5_DTH_ROOT)


# ---------------------------------------------------------------------------
# Naive polynomial ops for oracle checks.
# ---------------------------------------------------------------------------

def poly_eval(coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = add(mul(acc, x), c)
    return acc


def naive_fft(coeffs: list[int]) -> list[int]:
    """Evaluate at all 2^k-th roots of unity in subgroup order g^0, g^1, ..."""
    n = len(coeffs)
    n_log = n.bit_length() - 1
    assert 1 << n_log == n
    g = primitive_root_of_unity(n_log)
    out = []
    x = 1
    for _ in range(n):
        out.append(poly_eval(coeffs, x))
        x = mul(x, g)
    return out
