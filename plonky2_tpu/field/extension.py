"""Quadratic extension field F_{p^2} = F_p[X]/(X^2 - 7) — the proving extension.

Matches the reference OEF (reference: field/src/extension/quadratic.rs;
goldilocks_extensions.rs:14-28 — W=7, DTH_ROOT=p-1,
EXT_POWER_OF_TWO_GENERATOR=(0, 15659105665374529263)).

Elements are pairs of GF arrays (componentwise layout keeps TPU lanes dense).
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from .goldilocks import GF

W = 7
DTH_ROOT = 18446744069414584320  # = p - 1
EXT_MULTIPLICATIVE_GROUP_GENERATOR = (18081566051660590251, 16121475356294670766)
EXT_POWER_OF_TWO_GENERATOR = (0, 15659105665374529263)
EXT_TWO_ADICITY = 33


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class GF2:
    """Array of F_{p^2} elements: c0 + c1*X with X^2 = 7."""

    c0: GF
    c1: GF

    def tree_flatten(self):
        return (self.c0, self.c1), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- constructors --------------------------------------------------------
    @staticmethod
    def from_base(x: GF) -> "GF2":
        return GF2(x, GF.zeros(x.shape))

    @staticmethod
    def from_u64_pair(c0, c1) -> "GF2":
        return GF2(GF.from_u64(c0), GF.from_u64(c1))

    @staticmethod
    def zeros(shape) -> "GF2":
        return GF2(GF.zeros(shape), GF.zeros(shape))

    @staticmethod
    def ones(shape) -> "GF2":
        return GF2(GF.ones(shape), GF.zeros(shape))

    @staticmethod
    def const(c0: int, c1: int = 0, shape=()) -> "GF2":
        return GF2(GF.const(c0, shape), GF.const(c1, shape))

    def to_u64_pair(self):
        import jax
        l0, h0, l1, h1 = jax.device_get(
            (self.c0.lo, self.c0.hi, self.c1.lo, self.c1.hi))
        u64 = np.uint64
        return (np.asarray(l0).astype(u64)
                | (np.asarray(h0).astype(u64) << u64(32)),
                np.asarray(l1).astype(u64)
                | (np.asarray(h1).astype(u64) << u64(32)))

    # -- shape plumbing --------------------------------------------------------
    @property
    def shape(self):
        return self.c0.shape

    def __getitem__(self, idx) -> "GF2":
        return GF2(self.c0[idx], self.c1[idx])

    def reshape(self, *shape) -> "GF2":
        return GF2(self.c0.reshape(*shape), self.c1.reshape(*shape))

    def broadcast_to(self, shape) -> "GF2":
        return GF2(self.c0.broadcast_to(shape), self.c1.broadcast_to(shape))

    def take(self, indices, axis=0) -> "GF2":
        return GF2(self.c0.take(indices, axis), self.c1.take(indices, axis))

    @staticmethod
    def concatenate(parts, axis=0) -> "GF2":
        return GF2(GF.concatenate([p.c0 for p in parts], axis),
                   GF.concatenate([p.c1 for p in parts], axis))

    @staticmethod
    def stack(parts, axis=0) -> "GF2":
        return GF2(GF.stack([p.c0 for p in parts], axis),
                   GF.stack([p.c1 for p in parts], axis))

    @staticmethod
    def where(cond, a: "GF2", b: "GF2") -> "GF2":
        return GF2(GF.where(cond, a.c0, b.c0), GF.where(cond, a.c1, b.c1))

    # -- arithmetic ------------------------------------------------------------
    def __add__(self, other: "GF2") -> "GF2":
        return GF2(self.c0 + other.c0, self.c1 + other.c1)

    def __sub__(self, other: "GF2") -> "GF2":
        return GF2(self.c0 - other.c0, self.c1 - other.c1)

    def __neg__(self) -> "GF2":
        return GF2(-self.c0, -self.c1)

    def __mul__(self, other: "GF2") -> "GF2":
        a0, a1, b0, b1 = self.c0, self.c1, other.c0, other.c1
        c0 = a0 * b0 + (a1 * b1).mul_small(W)
        c1 = a0 * b1 + a1 * b0
        return GF2(c0, c1)

    def scalar_mul(self, s: GF) -> "GF2":
        return GF2(self.c0 * s, self.c1 * s)

    def square(self) -> "GF2":
        return self * self

    def frobenius(self) -> "GF2":
        """x -> x^p: c0 + DTH_ROOT * c1 * X."""
        return GF2(self.c0, self.c1 * GF.const(DTH_ROOT).broadcast_to(self.c1.shape))

    def inverse(self) -> "GF2":
        # 1/a = conj(a) / Norm(a), Norm = c0^2 - W*c1^2 in F_p.
        norm = self.c0 * self.c0 - (self.c1 * self.c1).mul_small(W)
        ninv = norm.inverse()
        return GF2(self.c0 * ninv, -(self.c1 * ninv))

    def exp(self, e: int) -> "GF2":
        """Compile-time-constant power. Small exponents inline; larger ones
        run square-and-multiply under lax.scan (inlined scalar multiply
        chains trigger pathological XLA:CPU compiles)."""
        if e == 0:
            return GF2.ones(self.shape)
        if e.bit_length() <= 3:
            result = GF2.ones(self.shape)
            base = self
            while e:
                if e & 1:
                    result = result * base
                e >>= 1
                if e:
                    base = base * base
            return result

        import jax
        import jax.numpy as jnp

        bits = np.array([(e >> i) & 1 for i in range(e.bit_length())],
                        dtype=np.bool_)[::-1].copy()

        def body(carry, bit):
            r = GF2(GF(carry[0], carry[1]), GF(carry[2], carry[3]))
            r = r * r
            m = r * self
            rl0 = jnp.where(bit, m.c0.lo, r.c0.lo)
            rh0 = jnp.where(bit, m.c0.hi, r.c0.hi)
            rl1 = jnp.where(bit, m.c1.lo, r.c1.lo)
            rh1 = jnp.where(bit, m.c1.hi, r.c1.hi)
            return (rl0, rh0, rl1, rh1), None

        ones = GF2.ones(self.shape)
        (l0, h0, l1, h1), _ = jax.lax.scan(
            body, (ones.c0.lo, ones.c0.hi, ones.c1.lo, ones.c1.hi),
            jnp.asarray(bits))
        return GF2(GF(l0, h0), GF(l1, h1))

    def equal(self, other: "GF2"):
        return self.c0.equal(other.c0) & self.c1.equal(other.c1)

    def is_zero(self):
        return self.c0.is_zero() & self.c1.is_zero()

    def sum(self, axis=None) -> "GF2":
        return GF2(self.c0.sum(axis), self.c1.sum(axis))


def _scan_powers2(base: GF2, k: int) -> GF2:
    """[1, b, ..., b^{k-1}] via a k-step scan."""
    import jax
    import jax.numpy as jnp

    def body(carry, _):
        c = GF2(GF(carry[0], carry[1]), GF(carry[2], carry[3]))
        n = c * base
        return (n.c0.lo, n.c0.hi, n.c1.lo, n.c1.hi), carry

    u32 = jnp.uint32
    one = (jnp.full((), 1, u32), jnp.zeros((), u32),
           jnp.zeros((), u32), jnp.zeros((), u32))
    _, (l0, h0, l1, h1) = jax.lax.scan(body, one, None, length=k)
    return GF2(GF(l0, h0), GF(l1, h1))


def gf2_powers(base: GF2, n: int) -> GF2:
    """[1, b, ..., b^{n-1}] via radix-16 digit tables + broadcast products
    (see gf_powers for the rationale)."""
    assert base.shape == ()
    if n == 1:
        return GF2.ones((1,))
    lg = (n - 1).bit_length()
    radices = []
    while lg > 0:
        r = min(4, lg)
        radices.append(1 << r)
        lg -= r
    tables = []
    cur = base
    for li, radix in enumerate(radices):
        t = _scan_powers2(cur, radix)
        tables.append(t)
        if li + 1 < len(radices):
            cur = t[radix - 1] * cur
    out = tables[0]
    span = radices[0]
    for li in range(1, len(radices)):
        radix = radices[li]
        big = tables[li].reshape(radix, 1).broadcast_to((radix, span))
        out = (big * out.reshape(1, span).broadcast_to((radix, span))) \
            .reshape(radix * span)
        span *= radix
    return out[:n]
