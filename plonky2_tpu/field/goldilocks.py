"""Goldilocks field (p = 2^64 - 2^32 + 1) as vectorized 2x-uint32-limb JAX ops.

TPU has no native 64-bit integer multiplier, so a field element is stored as a
pair of uint32 arrays (lo, hi). All arithmetic is branch-free u32 limb math
that XLA vectorizes on the VPU; the identical formulas are reused inside
Pallas kernels (they operate on plain uint32 arrays).

Every stored element is kept fully canonical (< p). This removes all
canonicalization hazards for Fiat-Shamir transcript parity with the reference
(reference: field/src/goldilocks_field.rs — reduce128 at :406-462, branchy
add/sub with EPSILON correction at :81-160).

The functional layer (`add`, `mul`, ... on raw (lo, hi) pairs) is the kernel
building block; the `GF` pytree class wraps it with operators for readable
prover code.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import reference as ref

ORDER = 0xFFFFFFFF00000001
ORDER_LO = np.uint32(0x00000001)
ORDER_HI = np.uint32(0xFFFFFFFF)
EPSILON = np.uint32(0xFFFFFFFF)  # 2^64 mod p (fits in u32)

u32 = jnp.uint32
_1 = np.uint32(1)
_0 = np.uint32(0)


# ---------------------------------------------------------------------------
# u32 limb primitives
# ---------------------------------------------------------------------------

def _mul32(x, y):
    """Full 32x32 -> 64-bit product as (hi, lo) uint32, via 16-bit halves."""
    x0 = x & 0xFFFF
    x1 = x >> 16
    y0 = y & 0xFFFF
    y1 = y >> 16
    p00 = x0 * y0
    p01 = x0 * y1
    p10 = x1 * y0
    p11 = x1 * y1
    mid = (p00 >> 16) + (p01 & 0xFFFF) + (p10 & 0xFFFF)  # < 2^18
    lo = (p00 & 0xFFFF) | (mid << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def _add64(ah, al, bh, bl):
    """64-bit add with carry-out: returns (hi, lo, carry)."""
    lo = al + bl
    c = (lo < al).astype(u32)
    t = ah + bh
    c1 = (t < ah).astype(u32)
    hi = t + c
    c2 = (hi < t).astype(u32)
    return hi, lo, c1 + c2


def _sub64(ah, al, bh, bl):
    """64-bit subtract with borrow-out: returns (hi, lo, borrow)."""
    lo = al - bl
    b0 = (al < bl).astype(u32)
    t = ah - bh
    b1 = (ah < bh).astype(u32)
    hi = t - b0
    b2 = (t < b0).astype(u32)
    return hi, lo, b1 + b2


def _ge64(ah, al, bh, bl):
    return (ah > bh) | ((ah == bh) & (al >= bl))


def _mul64_full(alo, ahi, blo, bhi):
    """64x64 -> 128-bit product as four uint32 words (w3, w2, w1, w0)."""
    hh_h, hh_l = _mul32(ahi, bhi)
    hl_h, hl_l = _mul32(ahi, blo)
    lh_h, lh_l = _mul32(alo, bhi)
    ll_h, ll_l = _mul32(alo, blo)
    w0 = ll_l
    s1 = ll_h + hl_l
    c1 = (s1 < ll_h).astype(u32)
    w1 = s1 + lh_l
    c2 = (w1 < s1).astype(u32)
    s2 = hl_h + lh_h
    c3 = (s2 < hl_h).astype(u32)
    s2b = s2 + hh_l
    c4 = (s2b < s2).astype(u32)
    w2 = s2b + c1 + c2
    c5 = (w2 < s2b).astype(u32)
    w3 = hh_h + c3 + c4 + c5
    return w3, w2, w1, w0


def _reduce128(w3, w2, w1, w0):
    """Reduce a 128-bit value mod p to a canonical (lo, hi) pair.

    Uses 2^64 = EPSILON and 2^96 = -1 (mod p), i.e.
    x = w3*2^96 + w2*2^64 + lo64  ===  lo64 - w3 + w2*EPSILON (mod p).
    Same algorithm as the reference reduce128.
    """
    # t0 = lo64 - w3 (64-bit); on borrow subtract EPSILON (wrapping).
    b0 = (w0 < w3).astype(u32)
    t0_l = w0 - w3
    t0_h = w1 - b0
    borrow = (w1 < b0)  # borrow out of the 64-bit subtract (w1==0 and w0<w3)
    # subtracting EPSILON = 2^32-1: new_l = l+1; borrow from hi iff new_l != 0
    adj_l = t0_l + _1
    adj_h = t0_h - (adj_l != 0).astype(u32)
    t0_l = jnp.where(borrow, adj_l, t0_l)
    t0_h = jnp.where(borrow, adj_h, t0_h)
    # t1 = w2 * EPSILON = (w2<<32) - w2
    nz = (w2 != 0).astype(u32)
    t1_h = w2 - nz
    t1_l = _0 - w2
    # res = t0 + t1; on carry add EPSILON (cannot carry twice)
    rh, rl, carry = _add64(t0_h, t0_l, t1_h, t1_l)
    rl2 = rl + EPSILON
    rh2 = rh + (rl2 < rl).astype(u32)
    rl = jnp.where(carry > 0, rl2, rl)
    rh = jnp.where(carry > 0, rh2, rh)
    return _canonicalize(rl, rh)


def _canonicalize(lo, hi):
    """Conditionally subtract p once: input < 2^64, output < p."""
    ge = _ge64(hi, lo, ORDER_HI, ORDER_LO)
    sh, sl, _ = _sub64(hi, lo, ORDER_HI, ORDER_LO)
    return jnp.where(ge, sl, lo), jnp.where(ge, sh, hi)


# ---------------------------------------------------------------------------
# Host-side (numpy) vectorized field mul — for precomputed tables.
#
# Twiddle/shift-power tables were previously built with eager jnp ops, and
# every eager op compiles its own one-op XLA program: a single prove triggered
# ~60 such compiles, each costing seconds through the TPU tunnel. Table
# precompute is host work; numpy does it with zero compiles.
# ---------------------------------------------------------------------------

_U64_EPS = np.uint64(0xFFFFFFFF)
_U64_ORDER = np.uint64(ORDER)
_U64_32 = np.uint64(32)
_U64_MASK = np.uint64(0xFFFFFFFF)


def mul_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized Goldilocks multiply on canonical uint64 numpy arrays
    (same reduce128 schedule as the device path / reference
    field/src/goldilocks_field.rs:406-462)."""
    a = np.asarray(a, dtype=np.uint64)
    b = np.asarray(b, dtype=np.uint64)
    a_lo, a_hi = a & _U64_MASK, a >> _U64_32
    b_lo, b_hi = b & _U64_MASK, b >> _U64_32
    ll = a_lo * b_lo
    cross1 = a_lo * b_hi + (ll >> _U64_32)
    cross2 = a_hi * b_lo + (cross1 & _U64_MASK)
    hi128 = a_hi * b_hi + (cross1 >> _U64_32) + (cross2 >> _U64_32)
    lo128 = (cross2 << _U64_32) | (ll & _U64_MASK)
    # reduce: x = hi128*2^64 + lo128 === lo128 - hi_hi + hi_lo*EPSILON (mod p)
    hi_hi, hi_lo = hi128 >> _U64_32, hi128 & _U64_MASK
    borrow = lo128 < hi_hi
    t0 = lo128 - hi_hi
    t0 = np.where(borrow, t0 - _U64_EPS, t0)
    t1 = hi_lo * _U64_EPS
    res = t0 + t1
    res = np.where(res < t0, res + _U64_EPS, res)
    return np.where(res >= _U64_ORDER, res - _U64_ORDER, res)


def powers_np(base: int, n: int) -> np.ndarray:
    """[base^0 .. base^{n-1}] as canonical uint64, via log-doubling."""
    out = np.ones(max(n, 1), dtype=np.uint64)
    if n <= 1:
        return out[:n]
    out[1] = base % ORDER
    filled = 2
    while filled < n:
        k = min(filled, n - filled)
        step = mul_np(out[filled - 1:filled], out[1:2])   # base^filled
        out[filled:filled + k] = mul_np(step, out[:k])
        filled += k
    return out[:n]


# ---------------------------------------------------------------------------
# Field ops on raw (lo, hi) uint32 pairs — canonical in, canonical out
# ---------------------------------------------------------------------------

def add(alo, ahi, blo, bhi):
    sh, sl, carry = _add64(ahi, alo, bhi, blo)
    # carry: sum wrapped past 2^64, add EPSILON (result provably < p)
    wl = sl + EPSILON
    wh = sh + (wl < sl).astype(u32)
    sl = jnp.where(carry > 0, wl, sl)
    sh = jnp.where(carry > 0, wh, sh)
    return _canonicalize(sl, sh)


def sub(alo, ahi, blo, bhi):
    dh, dl, borrow = _sub64(ahi, alo, bhi, blo)
    # borrow: result wrapped below 0; true value is d - 2^64 + p = d - EPSILON
    wl = dl + _1  # subtracting EPSILON = 2^32-1
    wh = dh - (wl != 0).astype(u32)
    dl = jnp.where(borrow > 0, wl, dl)
    dh = jnp.where(borrow > 0, wh, dh)
    return dl, dh


def neg(alo, ahi):
    zl, zh = jnp.zeros_like(alo), jnp.zeros_like(ahi)
    return sub(zl, zh, alo, ahi)


def mul(alo, ahi, blo, bhi):
    return _reduce128(*_mul64_full(alo, ahi, blo, bhi))


def square(alo, ahi):
    """Dedicated squaring: 3 32x32 multiplies instead of mul()'s 4
    (x = lo + hi*2^32 -> x^2 = lo^2 + 2*lo*hi*2^32 + hi^2*2^64)."""
    ll_h, ll_l = _mul32(alo, alo)
    hh_h, hh_l = _mul32(ahi, ahi)
    c_h, c_l = _mul32(alo, ahi)
    # cross*2 as a 65-bit (c2_h, c2_m, c2_l); then total = ll + (c2 << 32)
    # + hh << 64
    c2_l = c_l << 1
    c2_m = (c_h << 1) | (c_l >> 31)
    c2_h = c_h >> 31
    w0 = ll_l
    w1 = ll_h + c2_l
    k1 = (w1 < ll_h).astype(u32)
    s2 = hh_l + c2_m
    k2 = (s2 < hh_l).astype(u32)
    w2 = s2 + k1
    k3 = (w2 < s2).astype(u32)
    w3 = hh_h + c2_h + k2 + k3
    return _reduce128(w3, w2, w1, w0)


def mul_small(c: int, alo, ahi):
    """Multiply by a small (< 2^32) compile-time constant, cheaper than mul."""
    c = np.uint32(c)
    ll_h, ll_l = _mul32(jnp.full_like(alo, c), alo)
    hl_h, hl_l = _mul32(jnp.full_like(ahi, c), ahi)
    w0 = ll_l
    w1 = ll_h + hl_l
    c1 = (w1 < ll_h).astype(u32)
    w2 = hl_h + c1
    return _reduce96(w2, w1, w0)


def _reduce96(w2, w1, w0):
    """Reduce w2*2^64 + (w1,w0) mod p: add w2*EPSILON to the low 64 bits."""
    nz = (w2 != 0).astype(u32)
    t1_h = w2 - nz
    t1_l = _0 - w2
    rh, rl, carry = _add64(w1, w0, t1_h, t1_l)
    wl = rl + EPSILON
    wh = rh + (wl < rl).astype(u32)
    rl = jnp.where(carry > 0, wl, rl)
    rh = jnp.where(carry > 0, wh, rh)
    return _canonicalize(rl, rh)


def exp_u64(alo, ahi, e: int):
    """Raise to a compile-time-constant power by square-and-multiply."""
    rl = jnp.full_like(alo, _1)
    rh = jnp.zeros_like(ahi)
    bl, bh = alo, ahi
    while e:
        if e & 1:
            rl, rh = mul(rl, rh, bl, bh)
        e >>= 1
        if e:
            bl, bh = square(bl, bh)
    return rl, rh


def inverse(alo, ahi):
    """Fermat inversion a^(p-2) by square-and-multiply under lax.scan.

    The scan keeps the compiled graph O(1) in the 64 exponent bits (2 muls
    per step instead of ~100 inlined muls), which matters because inversion
    appears inside already-large jitted prover programs."""
    e = ORDER - 2
    bits = np.array([(e >> i) & 1 for i in range(e.bit_length())],
                    dtype=np.bool_)
    # process bits high->low: r = r^2; if bit: r *= a
    bits = bits[::-1].copy()

    def body(carry, bit):
        rl, rh = carry
        rl, rh = square(rl, rh)
        ml, mh = mul(rl, rh, alo, ahi)
        rl = jnp.where(bit, ml, rl)
        rh = jnp.where(bit, mh, rh)
        return (rl, rh), None

    one_l = jnp.full_like(alo, _1)
    one_h = jnp.zeros_like(ahi)
    (rl, rh), _ = jax.lax.scan(body, (one_l, one_h), jnp.asarray(bits))
    return rl, rh


# ---------------------------------------------------------------------------
# GF: pytree wrapper with operators
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GF:
    """An array of Goldilocks field elements as two uint32 limb arrays."""

    lo: jax.Array
    hi: jax.Array

    def tree_flatten(self):
        return (self.lo, self.hi), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors -------------------------------------------------------
    @staticmethod
    def from_u64(x) -> "GF":
        """From numpy uint64 / python ints (host-side). Values reduced mod p."""
        arr = np.asarray(x, dtype=np.object_) if isinstance(x, (list, tuple)) \
            else np.asarray(x)
        if arr.dtype == np.object_:
            arr = np.vectorize(lambda v: int(v) % ORDER, otypes=[np.uint64])(arr)
        else:
            arr = arr.astype(np.uint64)
            arr = np.where(arr >= np.uint64(ORDER), arr - np.uint64(ORDER), arr)
        lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        hi = (arr >> np.uint64(32)).astype(np.uint32)
        return GF(jnp.asarray(lo), jnp.asarray(hi))

    @staticmethod
    def zeros(shape) -> "GF":
        # numpy-backed: inside a trace these become constants; outside they
        # avoid compiling a one-op XLA program per call site
        return GF(np.zeros(shape, np.uint32), np.zeros(shape, np.uint32))

    @staticmethod
    def ones(shape) -> "GF":
        return GF(np.ones(shape, np.uint32), np.zeros(shape, np.uint32))

    @staticmethod
    def const(value: int, shape=()) -> "GF":
        value %= ORDER
        return GF(np.full(shape, np.uint32(value & 0xFFFFFFFF), np.uint32),
                  np.full(shape, np.uint32(value >> 32), np.uint32))

    def to_u64(self) -> np.ndarray:
        """Host-side read-back as numpy uint64. ONE device_get for both limb
        planes: through the axon tunnel every separate readback costs a
        ~30 ms round trip (measured r5), and the warm prover is round-trip
        bound, not compute bound."""
        lo, hi = jax.device_get((self.lo, self.hi))
        return np.asarray(lo).astype(np.uint64) \
            | (np.asarray(hi).astype(np.uint64) << np.uint64(32))

    # -- shape plumbing ------------------------------------------------------
    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def __len__(self):
        return self.lo.shape[0]

    def __getitem__(self, idx) -> "GF":
        return GF(self.lo[idx], self.hi[idx])

    def reshape(self, *shape) -> "GF":
        return GF(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def transpose(self, *axes) -> "GF":
        return GF(self.lo.transpose(*axes), self.hi.transpose(*axes))

    def broadcast_to(self, shape) -> "GF":
        return GF(jnp.broadcast_to(self.lo, shape),
                  jnp.broadcast_to(self.hi, shape))

    def take(self, indices, axis=0) -> "GF":
        return GF(jnp.take(self.lo, indices, axis=axis),
                  jnp.take(self.hi, indices, axis=axis))

    def at_set(self, idx, value: "GF") -> "GF":
        return GF(self.lo.at[idx].set(value.lo), self.hi.at[idx].set(value.hi))

    @staticmethod
    def concatenate(parts, axis=0) -> "GF":
        return GF(jnp.concatenate([p.lo for p in parts], axis=axis),
                  jnp.concatenate([p.hi for p in parts], axis=axis))

    @staticmethod
    def stack(parts, axis=0) -> "GF":
        return GF(jnp.stack([p.lo for p in parts], axis=axis),
                  jnp.stack([p.hi for p in parts], axis=axis))

    @staticmethod
    def where(cond, a: "GF", b: "GF") -> "GF":
        return GF(jnp.where(cond, a.lo, b.lo), jnp.where(cond, a.hi, b.hi))

    # -- arithmetic ----------------------------------------------------------
    def __add__(self, other: "GF") -> "GF":
        return GF(*add(self.lo, self.hi, other.lo, other.hi))

    def __sub__(self, other: "GF") -> "GF":
        return GF(*sub(self.lo, self.hi, other.lo, other.hi))

    def __neg__(self) -> "GF":
        return GF(*neg(self.lo, self.hi))

    def __mul__(self, other: "GF") -> "GF":
        return GF(*mul(self.lo, self.hi, other.lo, other.hi))

    def square(self) -> "GF":
        return GF(*square(self.lo, self.hi))

    def mul_small(self, c: int) -> "GF":
        return GF(*mul_small(c, self.lo, self.hi))

    def exp(self, e: int) -> "GF":
        return GF(*exp_u64(self.lo, self.hi, e))

    def inverse(self) -> "GF":
        return GF(*inverse(self.lo, self.hi))

    def double(self) -> "GF":
        return self + self

    # -- comparisons (field equality; inputs canonical) ----------------------
    def equal(self, other: "GF"):
        return (self.lo == other.lo) & (self.hi == other.hi)

    def is_zero(self):
        return (self.lo == 0) & (self.hi == 0)

    def sum(self, axis=None) -> "GF":
        """Tree-reduction sum along an axis (log-depth, exact).

        Uses static slices (never gathers or concats of computed values —
        those trigger pathological XLA:CPU compiles when fed by multiply
        chains)."""
        x = self
        if axis is None:
            x = x.reshape(-1)
            axis = 0
        if axis < 0:
            axis += x.ndim
        n = x.shape[axis]
        pow2 = 1 << (n - 1).bit_length() if n > 1 else 1
        if pow2 != n:
            # one concat with CONSTANT zeros up front; concats of computed
            # values inside the reduction trigger pathological XLA:CPU
            # compiles. jnp (not numpy) zeros: a numpy array would be a
            # captured array constant inside a Pallas kernel body, which
            # Mosaic rejects.
            pad_shape = list(x.shape)
            pad_shape[axis] = pow2 - n
            z = jnp.zeros(tuple(pad_shape), u32)
            x = GF.concatenate([x, GF(z, z)], axis=axis)
            n = pow2
        lo, hi = x.lo, x.hi
        sl = lambda a, s, e: jax.lax.slice_in_dim(a, s, e, axis=axis)
        while n > 1:
            h = n // 2
            lo, hi = add(sl(lo, 0, h), sl(hi, 0, h),
                         sl(lo, h, 2 * h), sl(hi, h, 2 * h))
            n = h
        idx = [slice(None)] * lo.ndim
        idx[axis] = 0
        return GF(lo[tuple(idx)], hi[tuple(idx)])


def _scan_powers(base: GF, k: int) -> GF:
    """[1, b, ..., b^{k-1}] via a k-step scan (one tiny compiled kernel)."""
    def body(carry, _):
        nl, nh = mul(carry[0], carry[1], base.lo, base.hi)
        return (nl, nh), (carry[0], carry[1])

    one = (jnp.full((), _1, u32), jnp.zeros((), u32))
    _, (lo, hi) = jax.lax.scan(body, one, None, length=k)
    return GF(lo, hi)


def gf_powers(base: GF, n: int) -> GF:
    """[1, b, b^2, ..., b^{n-1}] as an outer product of radix-16 digit tables:
    out[i] = prod_l T_l[digit_l(i)] with T_l = scanned powers of b^(16^l).
    No selects, no scalar-op chains inside fused kernels — both trigger
    pathological XLA:CPU compile times; a handful of broadcast muls instead."""
    assert base.shape == ()
    if n == 1:
        return GF.ones((1,))
    lg = (n - 1).bit_length()
    radices = []
    while lg > 0:
        r = min(4, lg)
        radices.append(1 << r)
        lg -= r
    tables = []
    cur = base
    for li, radix in enumerate(radices):
        t = _scan_powers(cur, radix)
        tables.append(t)
        if li + 1 < len(radices):
            # cur^radix = t[-1] * cur
            cur = t[radix - 1] * cur
    # combine: broadcast-product over digit axes (level 0 = least significant)
    total = 1
    for radix in radices:
        total *= radix
    out = tables[0]
    span = radices[0]
    for li in range(1, len(radices)):
        radix = radices[li]
        big = tables[li].reshape(radix, 1).broadcast_to((radix, span))
        out = (big * out.reshape(1, span).broadcast_to((radix, span))) \
            .reshape(radix * span)
        span *= radix
    return out[:n]


def random_gf(key, shape) -> GF:
    """Uniform field elements by rejection-free reduction of 64 random bits."""
    k1, k2 = jax.random.split(key)
    lo = jax.random.bits(k1, shape, dtype=jnp.uint32)
    hi = jax.random.bits(k2, shape, dtype=jnp.uint32)
    # value mod p: at most one conditional subtract is wrong for
    # uniformity-critical use, but fine for tests. Reduce properly:
    # x mod p where x < 2^64: canonicalize handles [p, 2^64).
    return GF(*_canonicalize(lo, hi))
