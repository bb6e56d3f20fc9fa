"""Gate base + evaluation algebras.

Reference: plonky2/src/gates/gate.rs:54 (Gate trait), :325 compute_filter.

TPU-first design: instead of the reference's three hand-written evaluation
paths per gate (base-batch / extension / in-circuit), each gate implements
`eval_unfiltered(alg, ...)` ONCE over an abstract algebra. Instantiations:
  - GFAlgebra:  batched device arrays (GF [N]) — the prover's quotient pass,
    vectorized over the whole LDE grid (replaces the reference's 32-point
    BATCH_SIZE loop, plonk/prover.rs:598).
  - ExtAlgebra: python-int quadratic-extension scalars — the verifier's
    evaluation at zeta.
  - (later) a Target algebra emitting circuit gadgets — the recursive
    verifier.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..field import reference as ref
from ..field.goldilocks import GF
from ..field.extension import GF2

UNUSED_SELECTOR = (1 << 32) - 1  # u32::MAX (reference: selectors.rs:14)


class ExtAlgebra:
    """Quadratic-extension scalars as (c0, c1) python-int tuples."""

    add = staticmethod(ref.ext2_add)
    sub = staticmethod(ref.ext2_sub)
    mul = staticmethod(ref.ext2_mul)

    @staticmethod
    def mul_const(a, c):
        return ref.ext2_scalar_mul(a, c % ref.ORDER)

    @staticmethod
    def add_const(a, c):
        return (ref.add(a[0], c), a[1])

    @staticmethod
    def const(c):
        return (c % ref.ORDER, 0)

    @staticmethod
    def zero():
        return (0, 0)


EXT = ExtAlgebra()


class GFAlgebra:
    """Batched base-field device arrays; every element is a GF of `shape`."""

    def __init__(self, shape):
        self.shape = shape

    @staticmethod
    def add(a: GF, b: GF) -> GF:
        return a + b

    @staticmethod
    def sub(a: GF, b: GF) -> GF:
        return a - b

    @staticmethod
    def mul(a: GF, b: GF) -> GF:
        return a * b

    def mul_const(self, a: GF, c: int) -> GF:
        c %= ref.ORDER
        if c < (1 << 32):
            return a.mul_small(c)
        return a * GF.const(c).broadcast_to(a.shape)

    def add_const(self, a: GF, c: int) -> GF:
        return a + GF.const(c % ref.ORDER).broadcast_to(a.shape)

    def const(self, c: int) -> GF:
        return GF.const(c % ref.ORDER).broadcast_to(self.shape)

    def zero(self) -> GF:
        return GF.zeros(self.shape)


class Gate:
    """Base gate. Subclasses define wires/constants/constraints and witness
    generators. `id` must be unique per configured gate type (it is the sort
    key for selector grouping, mirroring the reference's Debug-format ids)."""

    def id(self) -> str:
        raise NotImplementedError

    def num_wires(self) -> int:
        raise NotImplementedError

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        raise NotImplementedError

    def num_constraints(self) -> int:
        raise NotImplementedError

    def num_ops(self) -> int:
        """Batched op slots per row (find_slot); 1 for unbatched gates."""
        return 1

    def extra_constant_wires(self):
        """[(constant_index, wire_index)] pairs that receive build-time
        constants (reference: gate.rs extra_constant_wires)."""
        return []

    def export_circom_verification_code(self) -> str:
        """okx addition (reference: gate.rs:67) — generic over the gate's
        algebra-parametric constraint evaluation."""
        from ..utils.circom_export import export_circom_verification_code
        return export_circom_verification_code(self)

    def export_solidity_verification_code(self) -> str:
        """okx addition (reference: gate.rs:68)."""
        from ..utils.circom_export import export_solidity_verification_code
        return export_solidity_verification_code(self)

    def eval_unfiltered(self, alg, local_constants, local_wires,
                        public_inputs_hash):
        """Constraint values over `alg`; constants exclude selector columns."""
        raise NotImplementedError

    def eval_unfiltered_rows(self, consts_rows: GF, wires_rows: GF,
                             pi_rows: GF) -> GF:
        """Vectorized device evaluation: consts_rows [n_consts, N] (selector
        prefix removed), wires_rows [num_wires, N], pi_rows [4, N] ->
        GF [num_constraints, N]. Default wraps the scalar-algebra eval; hot
        gates override with stacked tensor implementations."""
        N = wires_rows.shape[-1]
        alg = GFAlgebra((N,))
        consts = [consts_rows[i] for i in range(consts_rows.shape[0])]
        wires = [wires_rows[i] for i in range(wires_rows.shape[0])]
        pi = [pi_rows[i] for i in range(pi_rows.shape[0])]
        out = self.eval_unfiltered(alg, consts, wires, pi)
        if not out:
            return GF.zeros((0, N))
        return GF.stack(out, axis=0)

    def generators(self, row: int, local_constants: list):
        return []

    # -- comparability for deterministic gate ordering -----------------------
    def __eq__(self, other):
        return isinstance(other, Gate) and self.id() == other.id()

    def __hash__(self):
        return hash(self.id())


def compute_filter(alg, row: int, group_range: range, s, many_selectors: bool):
    """prod_{i in group, i != row} (i - s), times (UNUSED - s) if more than one
    selector group exists (reference: gate.rs:325-337)."""
    acc = None
    idxs = [i for i in group_range if i != row]
    if many_selectors:
        idxs.append(UNUSED_SELECTOR)
    for i in idxs:
        term = alg.sub(alg.const(i), s)
        acc = term if acc is None else alg.mul(acc, term)
    assert acc is not None
    return acc
