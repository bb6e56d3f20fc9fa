"""Circom / Solidity verification-code export for gates (okx addition).

Reference: plonky2/src/gates/gate.rs:67-68 declares
export_circom_verification_code / export_solidity_verification_code, and each
gate hand-writes a template over GlExt* operations
(e.g. arithmetic_base.rs:75-98, circom side: circom/circuits/goldilocks.circom
GlExtAdd/GlExtSub/GlExtMul templates).

TPU-first twist: gates here evaluate constraints through an abstract algebra,
so ONE generic exporter covers every gate — an emitting algebra records each
extension-field operation as a straight-line statement (fresh intermediate
signal per op, so shared subexpressions stay linear instead of exploding the
expression tree), then wraps the program in the reference's template shape.
"""

from __future__ import annotations

from ..field import reference as ref


class _EmitAlgebra:
    """Algebra whose elements are signal names; ops append statements."""

    def __init__(self, emit_op):
        self._emit = emit_op        # (op, a, b) -> new name

    def add(self, a, b):
        return self._emit("add", a, b)

    def sub(self, a, b):
        return self._emit("sub", a, b)

    def mul(self, a, b):
        return self._emit("mul", a, b)

    def mul_const(self, a, c: int):
        return self._emit("mul", a, self.const(c))

    def add_const(self, a, c: int):
        return self._emit("add", a, self.const(c))

    def const(self, c: int):
        return self._emit("const", c % ref.ORDER, None)

    def zero(self):
        return self.const(0)


def _sanitize(gate_id: str) -> str:
    out = []
    for ch in gate_id:
        if ch.isalnum():
            out.append(ch)
        elif ch in "{}:,<>= ._+()":
            continue
        else:
            continue
    return "".join(out)[:64] or "Gate"


def export_circom_verification_code(gate) -> str:
    """Circom template evaluating the gate's filtered constraints
    (reference output shape: arithmetic_base.rs:75-98)."""
    lines: list[str] = []
    counter = [0]
    consts_cache: dict[int, str] = {}

    def emit(op, a, b):
        if op == "const":
            if a in consts_cache:
                return consts_cache[a]
            name = f"c_{len(consts_cache)}"
            lines.append(f"  signal {name}[2];")
            lines.append(f"  {name}[0] <== {a}; {name}[1] <== 0;")
            consts_cache[a] = name
            return name
        name = f"ev_{counter[0]}"
        counter[0] += 1
        fn = {"add": "GlExtAdd", "sub": "GlExtSub", "mul": "GlExtMul"}[op]
        lines.append(f"  signal {name}[2];")
        lines.append(f"  {name} <== {fn}()({a}, {b});")
        return name

    alg = _EmitAlgebra(emit)
    consts = [f"constants[$NUM_SELECTORS + {j}]"
              for j in range(gate.num_constants())]
    wires = [f"wires[{i}]" for i in range(gate.num_wires())]
    pi = [f"GlExt(public_input_hash[{k}], 0)()" for k in range(4)]
    constraints = gate.eval_unfiltered(alg, consts, wires, pi)

    name = _sanitize(gate.id())
    body = "\n".join(lines)
    pushes = "\n".join(
        f"  out[{k}] <== ConstraintPush()(constraints[{k}], filter, {c});"
        for k, c in enumerate(constraints))
    nc = gate.num_constraints()
    return f"""template {name}() {{
  signal input constants[NUM_OPENINGS_CONSTANTS()][2];
  signal input wires[NUM_OPENINGS_WIRES()][2];
  signal input public_input_hash[4];
  signal input constraints[NUM_GATE_CONSTRAINTS()][2];
  signal output out[NUM_GATE_CONSTRAINTS()][2];

  signal filter[2];
  $SET_FILTER;

{body}
{pushes}
  for (var i = {nc}; i < NUM_GATE_CONSTRAINTS(); i++) {{
    out[i] <== constraints[i];
  }}
}}"""


def export_solidity_verification_code(gate) -> str:
    """Solidity library evaluating the gate's filtered constraints
    (reference output shape: arithmetic_base.rs:99-120)."""
    lines: list[str] = []
    counter = [0]

    def emit(op, a, b):
        if op == "const":
            return f"GoldilocksExtLib.from(uint64({a}))"
        name = f"ev_{counter[0]}"
        counter[0] += 1
        fn = {"add": "add", "sub": "sub", "mul": "mul"}[op]
        lines.append(f"        uint64[2] memory {name} = {a}.{fn}({b});")
        return name

    alg = _EmitAlgebra(emit)
    consts = [f"ev.constants[$NUM_SELECTORS + {j}]"
              for j in range(gate.num_constants())]
    wires = [f"ev.wires[{i}]" for i in range(gate.num_wires())]
    pi = [f"GoldilocksExtLib.from(ev.public_input_hash[{k}])"
          for k in range(4)]
    constraints = gate.eval_unfiltered(alg, consts, wires, pi)

    name = _sanitize(gate.id())
    body = "\n".join(lines)
    pushes = "\n".join(
        f"        GatesUtilsLib.push(constraints, ev.filter, {k}, {c});"
        for k, c in enumerate(constraints))
    return f"""library {name}Lib {{
    using GoldilocksExtLib for uint64[2];
    function set_filter(GatesUtilsLib.EvaluationVars memory ev) internal pure {{
        $SET_FILTER;
    }}
    function eval(GatesUtilsLib.EvaluationVars memory ev, uint64[2][$NUM_GATE_CONSTRAINTS] memory constraints) internal pure {{
{body}
{pushes}
    }}
}}"""
