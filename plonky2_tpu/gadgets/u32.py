"""u32 arithmetic gates + gadgets (the `u32` gadget crate).

Reference: u32/src/gates/arithmetic_u32.rs:44-290 (x*y+z -> (lo32, hi32) with
base-4 limb range checks + canonical-encoding check), add_many_u32.rs:45-290,
subtraction_u32.rs:50-280; u32/src/gadgets/arithmetic_u32.rs (U32Target,
CircuitBuilderU32).
"""

from __future__ import annotations

from ..field import reference as ref
from ..gates.gate import Gate
from ..iop.generator import SimpleGenerator
from ..iop.target import wire

U32_MAX = (1 << 32) - 1


class U32ArithmeticGate(Gate):
    """out = x*y + z decomposed into 32-bit halves with range checks."""

    LIMB_BITS = 2
    NUM_LIMBS = 64 // LIMB_BITS
    ROUTED_PER_OP = 6

    def __init__(self, num_ops: int):
        self._num_ops = num_ops

    @staticmethod
    def from_config(config):
        per_op = U32ArithmeticGate.ROUTED_PER_OP + U32ArithmeticGate.NUM_LIMBS
        return U32ArithmeticGate(min(
            config.num_wires // per_op,
            config.num_routed_wires // U32ArithmeticGate.ROUTED_PER_OP))

    def id(self):
        return f"U32ArithmeticGate {{ num_ops: {self._num_ops} }}"

    def wire_multiplicand_0(self, i):
        return self.ROUTED_PER_OP * i

    def wire_multiplicand_1(self, i):
        return self.ROUTED_PER_OP * i + 1

    def wire_addend(self, i):
        return self.ROUTED_PER_OP * i + 2

    def wire_output_low(self, i):
        return self.ROUTED_PER_OP * i + 3

    def wire_output_high(self, i):
        return self.ROUTED_PER_OP * i + 4

    def wire_inverse(self, i):
        return self.ROUTED_PER_OP * i + 5

    def wire_limb(self, i, j):
        return self.ROUTED_PER_OP * self._num_ops + self.NUM_LIMBS * i + j

    def num_wires(self):
        return self._num_ops * (self.ROUTED_PER_OP + self.NUM_LIMBS)

    def degree(self):
        return 1 << self.LIMB_BITS

    def num_constraints(self):
        return self._num_ops * (4 + self.NUM_LIMBS)

    def num_ops(self):
        return self._num_ops

    def eval_unfiltered(self, alg, consts, wires, pi_hash):
        out = []
        one = alg.const(1)
        for i in range(self._num_ops):
            m0 = wires[self.wire_multiplicand_0(i)]
            m1 = wires[self.wire_multiplicand_1(i)]
            z = wires[self.wire_addend(i)]
            computed = alg.add(alg.mul(m0, m1), z)
            lo = wires[self.wire_output_low(i)]
            hi = wires[self.wire_output_high(i)]
            inv = wires[self.wire_inverse(i)]
            # canonicity: hi==u32::MAX forces lo==0
            diff = alg.sub(alg.const(U32_MAX), hi)
            hi_not_max = alg.sub(alg.mul(inv, diff), one)
            out.append(alg.mul(hi_not_max, lo))
            combined = alg.add(alg.mul_const(hi, 1 << 32), lo)
            out.append(alg.sub(combined, computed))
            # limb range checks + recomposition
            comb_lo = alg.zero()
            comb_hi = alg.zero()
            mid = self.NUM_LIMBS // 2
            for j in reversed(range(self.NUM_LIMBS)):
                limb = wires[self.wire_limb(i, j)]
                prod = None
                for x in range(1 << self.LIMB_BITS):
                    t = alg.add_const(limb, (-x) % ref.ORDER)
                    prod = t if prod is None else alg.mul(prod, t)
                out.append(prod)
                if j < mid:
                    comb_lo = alg.add(alg.mul_const(comb_lo,
                                                    1 << self.LIMB_BITS), limb)
                else:
                    comb_hi = alg.add(alg.mul_const(comb_hi,
                                                    1 << self.LIMB_BITS), limb)
            out.append(alg.sub(comb_lo, lo))
            out.append(alg.sub(comb_hi, hi))
        return out

    def generators(self, row, local_constants):
        return [_U32ArithmeticGenerator(row, self, i)
                for i in range(self._num_ops)]


class _U32ArithmeticGenerator(SimpleGenerator):
    def __init__(self, row, gate, i):
        self.row, self.gate, self.i = row, gate, i

    def dependencies(self):
        g, i = self.gate, self.i
        return [wire(self.row, g.wire_multiplicand_0(i)),
                wire(self.row, g.wire_multiplicand_1(i)),
                wire(self.row, g.wire_addend(i))]

    def run_once(self, witness, out):
        g, i = self.gate, self.i
        m0 = witness.get(wire(self.row, g.wire_multiplicand_0(i)))
        m1 = witness.get(wire(self.row, g.wire_multiplicand_1(i)))
        z = witness.get(wire(self.row, g.wire_addend(i)))
        val = (m0 * m1 + z) % ref.ORDER
        lo, hi = val & U32_MAX, val >> 32
        out.append((wire(self.row, g.wire_output_low(i)), lo))
        out.append((wire(self.row, g.wire_output_high(i)), hi))
        diff = U32_MAX - hi
        out.append((wire(self.row, g.wire_inverse(i)),
                    ref.inverse(diff) if diff else 0))
        v = val
        for j in range(g.NUM_LIMBS):
            out.append((wire(self.row, g.wire_limb(i, j)),
                        v % (1 << g.LIMB_BITS)))
            v >>= g.LIMB_BITS


class U32AddManyGate(Gate):
    """sum of num_addends u32s + small carry -> (result u32, carry)."""

    LIMB_BITS = 2
    LOG2_MAX_NUM_ADDENDS = 4
    RESULT_LIMBS = 32 // LIMB_BITS
    CARRY_LIMBS = LOG2_MAX_NUM_ADDENDS // LIMB_BITS

    def __init__(self, num_addends: int, num_ops: int):
        self.num_addends = num_addends
        self._num_ops = num_ops

    @staticmethod
    def from_config(config, num_addends: int):
        assert num_addends <= 16
        nl = U32AddManyGate.RESULT_LIMBS + U32AddManyGate.CARRY_LIMBS
        per_op = num_addends + 3 + nl
        routed = num_addends + 3
        return U32AddManyGate(num_addends, min(
            config.num_wires // per_op, config.num_routed_wires // routed))

    def id(self):
        return (f"U32AddManyGate {{ num_addends: {self.num_addends}, "
                f"num_ops: {self._num_ops} }}")

    def _stride(self):
        return self.num_addends + 3

    def wire_addend(self, i, j):
        return self._stride() * i + j

    def wire_carry(self, i):
        return self._stride() * i + self.num_addends

    def wire_output_result(self, i):
        return self._stride() * i + self.num_addends + 1

    def wire_output_carry(self, i):
        return self._stride() * i + self.num_addends + 2

    def _num_limbs(self):
        return self.RESULT_LIMBS + self.CARRY_LIMBS

    def wire_limb(self, i, j):
        return self._stride() * self._num_ops + self._num_limbs() * i + j

    def num_wires(self):
        return (self._stride() + self._num_limbs()) * self._num_ops

    def degree(self):
        return 1 << self.LIMB_BITS

    def num_constraints(self):
        return self._num_ops * (3 + self._num_limbs())

    def num_ops(self):
        return self._num_ops

    def eval_unfiltered(self, alg, consts, wires, pi_hash):
        out = []
        for i in range(self._num_ops):
            computed = wires[self.wire_carry(i)]
            for j in range(self.num_addends):
                computed = alg.add(computed, wires[self.wire_addend(i, j)])
            result = wires[self.wire_output_result(i)]
            carry = wires[self.wire_output_carry(i)]
            combined = alg.add(alg.mul_const(carry, 1 << 32), result)
            out.append(alg.sub(combined, computed))
            comb_res = alg.zero()
            comb_car = alg.zero()
            for j in reversed(range(self._num_limbs())):
                limb = wires[self.wire_limb(i, j)]
                prod = None
                for x in range(1 << self.LIMB_BITS):
                    t = alg.add_const(limb, (-x) % ref.ORDER)
                    prod = t if prod is None else alg.mul(prod, t)
                out.append(prod)
                if j < self.RESULT_LIMBS:
                    comb_res = alg.add(
                        alg.mul_const(comb_res, 1 << self.LIMB_BITS), limb)
                else:
                    comb_car = alg.add(
                        alg.mul_const(comb_car, 1 << self.LIMB_BITS), limb)
            out.append(alg.sub(comb_res, result))
            out.append(alg.sub(comb_car, carry))
        return out

    def generators(self, row, local_constants):
        return [_U32AddManyGenerator(row, self, i)
                for i in range(self._num_ops)]


class _U32AddManyGenerator(SimpleGenerator):
    def __init__(self, row, gate, i):
        self.row, self.gate, self.i = row, gate, i

    def dependencies(self):
        g, i = self.gate, self.i
        return ([wire(self.row, g.wire_addend(i, j))
                 for j in range(g.num_addends)]
                + [wire(self.row, g.wire_carry(i))])

    def run_once(self, witness, out):
        g, i = self.gate, self.i
        total = witness.get(wire(self.row, g.wire_carry(i)))
        for j in range(g.num_addends):
            total += witness.get(wire(self.row, g.wire_addend(i, j)))
        result, carry = total & U32_MAX, total >> 32
        out.append((wire(self.row, g.wire_output_result(i)), result))
        out.append((wire(self.row, g.wire_output_carry(i)), carry))
        v = result | (carry << 32)
        for j in range(g._num_limbs()):
            out.append((wire(self.row, g.wire_limb(i, j)),
                        v % (1 << g.LIMB_BITS)))
            v >>= g.LIMB_BITS


class U32SubtractionGate(Gate):
    """x - y - borrow_in -> (result u32, borrow_out bit)."""

    LIMB_BITS = 2
    NUM_LIMBS = 32 // LIMB_BITS

    def __init__(self, num_ops: int):
        self._num_ops = num_ops

    @staticmethod
    def from_config(config):
        per_op = 5 + U32SubtractionGate.NUM_LIMBS
        return U32SubtractionGate(min(config.num_wires // per_op,
                                      config.num_routed_wires // 5))

    def id(self):
        return f"U32SubtractionGate {{ num_ops: {self._num_ops} }}"

    def wire_input_x(self, i):
        return 5 * i

    def wire_input_y(self, i):
        return 5 * i + 1

    def wire_input_borrow(self, i):
        return 5 * i + 2

    def wire_output_result(self, i):
        return 5 * i + 3

    def wire_output_borrow(self, i):
        return 5 * i + 4

    def wire_limb(self, i, j):
        return 5 * self._num_ops + self.NUM_LIMBS * i + j

    def num_wires(self):
        return (5 + self.NUM_LIMBS) * self._num_ops

    def degree(self):
        return 1 << self.LIMB_BITS

    def num_constraints(self):
        return self._num_ops * (3 + self.NUM_LIMBS)

    def num_ops(self):
        return self._num_ops

    def eval_unfiltered(self, alg, consts, wires, pi_hash):
        out = []
        one = alg.const(1)
        for i in range(self._num_ops):
            x = wires[self.wire_input_x(i)]
            y = wires[self.wire_input_y(i)]
            bin_ = wires[self.wire_input_borrow(i)]
            result = wires[self.wire_output_result(i)]
            bout = wires[self.wire_output_borrow(i)]
            initial = alg.sub(alg.sub(x, y), bin_)
            out.append(alg.sub(result,
                               alg.add(initial, alg.mul_const(bout, 1 << 32))))
            comb = alg.zero()
            for j in reversed(range(self.NUM_LIMBS)):
                limb = wires[self.wire_limb(i, j)]
                prod = None
                for v in range(1 << self.LIMB_BITS):
                    t = alg.add_const(limb, (-v) % ref.ORDER)
                    prod = t if prod is None else alg.mul(prod, t)
                out.append(prod)
                comb = alg.add(alg.mul_const(comb, 1 << self.LIMB_BITS), limb)
            out.append(alg.sub(comb, result))
            out.append(alg.mul(bout, alg.sub(one, bout)))
        return out

    def generators(self, row, local_constants):
        return [_U32SubtractionGenerator(row, self, i)
                for i in range(self._num_ops)]


class _U32SubtractionGenerator(SimpleGenerator):
    def __init__(self, row, gate, i):
        self.row, self.gate, self.i = row, gate, i

    def dependencies(self):
        g, i = self.gate, self.i
        return [wire(self.row, g.wire_input_x(i)),
                wire(self.row, g.wire_input_y(i)),
                wire(self.row, g.wire_input_borrow(i))]

    def run_once(self, witness, out):
        g, i = self.gate, self.i
        x = witness.get(wire(self.row, g.wire_input_x(i)))
        y = witness.get(wire(self.row, g.wire_input_y(i)))
        b = witness.get(wire(self.row, g.wire_input_borrow(i)))
        diff = x - y - b
        borrow = 1 if diff < 0 else 0
        result = diff + (borrow << 32)
        out.append((wire(self.row, g.wire_output_result(i)), result))
        out.append((wire(self.row, g.wire_output_borrow(i)), borrow))
        v = result
        for j in range(g.NUM_LIMBS):
            out.append((wire(self.row, g.wire_limb(i, j)),
                        v % (1 << g.LIMB_BITS)))
            v >>= g.LIMB_BITS


# ---------------------------------------------------------------------------
# CircuitBuilderU32 gadgets (reference: u32/src/gadgets/arithmetic_u32.rs)
# ---------------------------------------------------------------------------

class U32Gadgets:
    """Mixin for CircuitBuilder. A U32Target is a base Target whose value is
    constrained (by the producing gate) to fit in 32 bits."""

    def add_virtual_u32_target(self):
        return self.add_virtual_target()

    def constant_u32(self, c: int):
        assert 0 <= c <= U32_MAX
        return self.constant(c)

    def zero_u32(self):
        return self.zero()

    def one_u32(self):
        return self.one()

    def mul_add_u32(self, a, b, c):
        """(a*b + c) -> (low, high) U32Targets."""
        gate = U32ArithmeticGate.from_config(self.config)
        row, i = self.find_slot(gate, ("u32arith",), [])
        self.connect(a, wire(row, gate.wire_multiplicand_0(i)))
        self.connect(b, wire(row, gate.wire_multiplicand_1(i)))
        self.connect(c, wire(row, gate.wire_addend(i)))
        return (wire(row, gate.wire_output_low(i)),
                wire(row, gate.wire_output_high(i)))

    def mul_u32(self, a, b):
        return self.mul_add_u32(a, b, self.zero())

    def add_u32(self, a, b):
        return self.add_many_u32([a, b])

    def add_many_u32(self, addends: list, carry=None):
        """(sum + carry) -> (result, carry_out)."""
        assert 2 <= len(addends) <= 16
        carry = carry if carry is not None else self.zero()
        gate = U32AddManyGate.from_config(self.config, len(addends))
        row, i = self.find_slot(gate, ("u32add", len(addends)), [])
        for j, a in enumerate(addends):
            self.connect(a, wire(row, gate.wire_addend(i, j)))
        self.connect(carry, wire(row, gate.wire_carry(i)))
        return (wire(row, gate.wire_output_result(i)),
                wire(row, gate.wire_output_carry(i)))

    def sub_u32(self, x, y, borrow=None):
        """(x - y - borrow) -> (result, borrow_out)."""
        borrow = borrow if borrow is not None else self.zero()
        gate = U32SubtractionGate.from_config(self.config)
        row, i = self.find_slot(gate, ("u32sub",), [])
        self.connect(x, wire(row, gate.wire_input_x(i)))
        self.connect(y, wire(row, gate.wire_input_y(i)))
        self.connect(borrow, wire(row, gate.wire_input_borrow(i)))
        return (wire(row, gate.wire_output_result(i)),
                wire(row, gate.wire_output_borrow(i)))

    def split_u64_to_u32(self, t):
        """Decompose a field element known < 2^64 into (low32, high32)."""
        lo, hi = self.mul_add_u32(self.zero(), self.zero(), t)
        return lo, hi