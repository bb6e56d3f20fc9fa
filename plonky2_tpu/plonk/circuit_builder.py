"""CircuitBuilder — host-side circuit construction and compilation.

Reference: plonky2/src/plonk/circuit_builder.rs — CircuitBuilder:139,
add_gate:445, connect:516, find_slot:786, blind_and_pad:884,
try_build_with_options:1045-1265. The `build()` step is the trace/compile
analog on TPU: selectors, sigmas and constants become device-resident
committed polynomials (PolynomialBatch), and everything else the prover needs
is staged as numpy arrays ready for device upload.
"""

from __future__ import annotations

import numpy as np

from ..field import reference as ref
from ..field.goldilocks import GF
from ..fri.oracle import PolynomialBatch
from ..gadgets.extension import ExtensionGadgets
from ..gadgets.misc import MiscGadgets
from ..gadgets.u32 import U32Gadgets
from ..gates.lookup_gates import LookupGadgets
from ..gates.basic_gates import (
    ArithmeticGate, ConstantGate, NoopGate, PublicInputGate,
)
from ..gates.gate import UNUSED_SELECTOR, Gate
from ..gates.poseidon_gate import PoseidonGate
from ..hash.poseidon import (
    NUM_HASH_OUT_ELTS, SPONGE_RATE, SPONGE_WIDTH, hash_no_pad_oracle,
)
from ..iop.generator import ConstantGenerator, RandomValueGenerator
from ..iop.target import virtual, wire
from .circuit_data import (
    CircuitData, CommonCircuitData, ProverOnlyData, SelectorsInfo,
    VerifierOnlyData,
)
from .config import CircuitConfig
from .permutation import Forest


def _is_pow2(n):
    return n & (n - 1) == 0 and n > 0


from ..ecdsa.biguint import BigUintGadgets
from ..ecdsa.curve_gadgets import CurveGadgets
from ..ecdsa.nonnative import NonNativeGadgets
from ..ecgfp5.gadgets import Gfp5Gadgets


class CircuitBuilder(ExtensionGadgets, MiscGadgets, U32Gadgets,
                     LookupGadgets, BigUintGadgets, NonNativeGadgets,
                     CurveGadgets, Gfp5Gadgets):
    def __init__(self, config: CircuitConfig | None = None,
                 seed: int | None = None):
        # `seed` makes the builder's blinding RNG deterministic (golden
        # transcript vectors, reproducible proofs); default is fresh entropy
        # like the reference's rand()
        self.config = config or CircuitConfig.standard_recursion_config()
        self.gate_instances: list[tuple[Gate, list[int]]] = []
        self.gate_types: dict[str, Gate] = {}
        self.copy_constraints: list[tuple] = []
        self.public_inputs: list = []
        self.virtual_target_count = 0
        self.constants_to_targets: dict[int, tuple] = {}
        self.targets_to_constants: dict[tuple, int] = {}
        self.constant_generators: list[ConstantGenerator] = []
        self.base_arithmetic_results: dict = {}
        self.current_slots: dict[str, dict[tuple, tuple[int, int]]] = {}
        self.generators: list = []
        self._rng = np.random.default_rng(seed)
        # cyclic recursion state (reference: circuit_builder.rs:196-200)
        self.verifier_data_public_input = None
        self.goal_common_data = None
        # reference: circuit_builder.rs:260-263 set_domain_separator
        self.domain_separator: list[int] | None = None
        from ..utils.context_tree import ContextStack
        self._context_stack = ContextStack()

    # -- targets --------------------------------------------------------------
    def add_virtual_target(self):
        t = virtual(self.virtual_target_count)
        self.virtual_target_count += 1
        return t

    def add_virtual_targets(self, n: int):
        return [self.add_virtual_target() for _ in range(n)]

    def register_public_input(self, t) -> None:
        self.public_inputs.append(t)

    def register_public_inputs(self, ts) -> None:
        self.public_inputs.extend(ts)

    # -- gates ----------------------------------------------------------------
    def num_gates(self) -> int:
        return len(self.gate_instances)

    # -- context attribution (reference: circuit_builder.rs:681-699,
    #    util/context_tree.rs; print_gate_counts :1003-1030) ---------------
    def push_context(self, name: str) -> None:
        self._context_stack.push(name, self.num_gates())

    def pop_context(self) -> None:
        self._context_stack.pop(self.num_gates())

    def context(self, name: str):
        """`with builder.context("fri verifier"): ...` — the with_context!
        macro analog."""
        import contextlib

        @contextlib.contextmanager
        def _ctx():
            self.push_context(name)
            try:
                yield
            finally:
                self.pop_context()
        return _ctx()

    def gate_counts(self) -> dict[str, int]:
        """Instance count per gate type (reference: print_gate_counts)."""
        counts: dict[str, int] = {}
        for gate, _ in self.gate_instances:
            counts[gate.id()] = counts.get(gate.id(), 0) + 1
        return counts

    def print_gate_counts(self, min_delta: int = 1) -> str:
        lines = [f"{n} instances of {gid}"
                 for gid, n in sorted(self.gate_counts().items(),
                                      key=lambda kv: -kv[1])]
        ctx = self._context_stack.root.report(min_delta)
        report = "\n".join(lines + ([ctx] if ctx else []))
        print(report)
        return report

    def add_gate(self, gate: Gate, constants: list[int]) -> int:
        assert gate.num_wires() <= self.config.num_wires, \
            f"{gate.id()} needs {gate.num_wires()} wires"
        assert len(constants) <= gate.num_constants()
        constants = list(constants) + [0] * (gate.num_constants() - len(constants))
        row = len(self.gate_instances)
        for const_idx, wire_idx in gate.extra_constant_wires():
            self.constant_generators.append(
                ConstantGenerator(row, const_idx, wire_idx, 0))
        self.gate_types.setdefault(gate.id(), gate)
        self.gate_instances.append((gate, constants))
        return row

    def add_gate_to_gate_set(self, gate: Gate) -> None:
        """Register a gate type in the selector set without adding an
        instance — needed so cyclic circuits' CommonCircuitData matches their
        goal (reference: circuit_builder.rs add_gate_to_gate_set)."""
        self.gate_types.setdefault(gate.id(), gate)

    def add_verifier_data_public_inputs(self):
        """Register this circuit's own verifier data as the FINAL public
        inputs: [..., circuit_digest(4), constants_sigmas_cap(4*2^h)]
        (reference: circuit_builder.rs:427-442). Do not register public
        inputs after this."""
        assert self.verifier_data_public_input is None, \
            "add_verifier_data_public_inputs only needs to be called once"
        from ..recursion.targets import add_virtual_verifier_data
        vd = add_virtual_verifier_data(self, self.config.fri_config.cap_height)
        self.register_public_inputs(vd.circuit_digest)
        for h in vd.constants_sigmas_cap:
            self.register_public_inputs(h)
        self.verifier_data_public_input = vd
        return vd

    def find_slot(self, gate: Gate, params: tuple, constants: list[int]):
        """Batched-op slot allocation (reference: circuit_builder.rs:786)."""
        num_ops = gate.num_ops()
        slots = self.current_slots.setdefault(gate.id(), {})
        if params in slots:
            gate_idx, slot_idx = slots[params]
        else:
            gate_idx, slot_idx = self.add_gate(gate, constants), 0
        if slot_idx == num_ops - 1:
            slots.pop(params, None)
        else:
            slots[params] = (gate_idx, slot_idx + 1)
        return gate_idx, slot_idx

    def connect(self, x, y) -> None:
        self.copy_constraints.append((x, y))

    def assert_zero(self, x) -> None:
        self.connect(x, self.zero())

    def assert_one(self, x) -> None:
        self.connect(x, self.one())

    # -- constants --------------------------------------------------------------
    def constant(self, c: int):
        c %= ref.ORDER
        if c in self.constants_to_targets:
            return self.constants_to_targets[c]
        t = self.add_virtual_target()
        self.constants_to_targets[c] = t
        self.targets_to_constants[t] = c
        return t

    def zero(self):
        return self.constant(0)

    def one(self):
        return self.constant(1)

    def two(self):
        return self.constant(2)

    def target_as_constant(self, t):
        return self.targets_to_constants.get(t)

    # -- arithmetic gadget (reference: gadgets/arithmetic.rs) -------------------
    def arithmetic(self, const_0: int, const_1: int, m0, m1, addend):
        """Returns a target for const_0 * m0 * m1 + const_1 * addend."""
        const_0 %= ref.ORDER
        const_1 %= ref.ORDER
        # Constant folding when all operands are known constants.
        c0 = self.target_as_constant(m0)
        c1 = self.target_as_constant(m1)
        ca = self.target_as_constant(addend)
        if c0 is not None and c1 is not None and ca is not None:
            return self.constant((const_0 * c0 % ref.ORDER * c1
                                  + const_1 * ca) % ref.ORDER)

        key = (const_0, const_1, m0, m1, addend)
        if key in self.base_arithmetic_results:
            return self.base_arithmetic_results[key]
        gate = ArithmeticGate.from_config(self.config)
        params = (const_0, const_1)
        row, i = self.find_slot(gate, params, [const_0, const_1])
        self.connect(m0, wire(row, gate.wire_multiplicand_0(i)))
        self.connect(m1, wire(row, gate.wire_multiplicand_1(i)))
        self.connect(addend, wire(row, gate.wire_addend(i)))
        out = wire(row, gate.wire_output(i))
        self.base_arithmetic_results[key] = out
        return out

    def add(self, a, b):
        return self.arithmetic(1, 1, a, self.one(), b)

    def sub(self, a, b):
        return self.arithmetic(1, ref.ORDER - 1, a, self.one(), b)

    def mul(self, a, b):
        return self.arithmetic(1, 0, a, b, self.zero())

    def mul_add(self, a, b, c):
        return self.arithmetic(1, 1, a, b, c)

    def mul_const(self, c: int, a):
        return self.arithmetic(c, 0, a, self.one(), self.zero())

    def add_const(self, a, c: int):
        return self.arithmetic(1, c, a, self.one(), self.one())

    def square(self, a):
        return self.mul(a, a)

    def inverse(self, x):
        """x_inv with x * x_inv = 1 (x must be nonzero)."""
        x_inv = self.add_virtual_target()
        self.generators.append(_InverseGenerator(x, x_inv))
        prod = self.mul(x, x_inv)
        self.assert_one(prod)
        return x_inv

    # -- hashing gadgets (reference: hash/hashing.rs:18-64) ---------------------
    def permute_swapped(self, inputs: list, swap):
        gate = PoseidonGate()
        row = self.add_gate(gate, [])
        self.connect(swap, wire(row, gate.WIRE_SWAP))
        for i in range(SPONGE_WIDTH):
            self.connect(inputs[i], wire(row, gate.wire_input(i)))
        return [wire(row, gate.wire_output(i)) for i in range(SPONGE_WIDTH)]

    def permute(self, inputs: list):
        return self.permute_swapped(inputs, self.zero())

    def hash_n_to_m_no_pad(self, inputs: list, num_outputs: int):
        state = [self.zero()] * SPONGE_WIDTH
        for start in range(0, len(inputs), SPONGE_RATE):
            chunk = inputs[start:start + SPONGE_RATE]
            state = chunk + state[len(chunk):]
            state = self.permute(state)
        outputs = []
        while True:
            for s in state[:SPONGE_RATE]:
                outputs.append(s)
                if len(outputs) == num_outputs:
                    return outputs
            state = self.permute(state)

    def hash_n_to_hash_no_pad(self, inputs: list):
        return self.hash_n_to_m_no_pad(inputs, NUM_HASH_OUT_ELTS)

    def hash_or_noop(self, inputs: list):
        if len(inputs) <= NUM_HASH_OUT_ELTS:
            return inputs + [self.zero()] * (NUM_HASH_OUT_ELTS - len(inputs))
        return self.hash_n_to_hash_no_pad(inputs)

    def public_inputs_hash_gadget(self, inputs: list):
        """okx circom tweak: PIs are always hashed, even when <= 4
        (reference: gadgets/hash.rs:27-33 + hash/poseidon.rs
        AlgebraicHasher::public_inputs_hash)."""
        return self.hash_n_to_m_no_pad(inputs, NUM_HASH_OUT_ELTS)

    def add_simple_generator(self, g) -> None:
        self.generators.append(g)

    # -- build ------------------------------------------------------------------
    def _num_blinding_gates(self, degree_estimate: int):
        """reference: circuit_builder.rs:839-858 (D=2)."""
        D = 2
        degree_bits = degree_estimate.bit_length() - 1
        fri_cfg = self.config.fri_config
        arity_bits = fri_cfg.reduction_strategy.reduction_arity_bits(
            degree_bits, fri_cfg.rate_bits, fri_cfg.cap_height,
            fri_cfg.num_query_rounds)
        arities = [1 << a for a in arity_bits]
        total_folding = sum(a - 1 for a in arities)
        prod = 1
        for a in arities:
            prod *= a
        final_coeffs = degree_estimate // prod
        fri_openings = fri_cfg.num_query_rounds * (
            1 + D * total_folding + D * final_coeffs)
        return (D + fri_openings, 2 * D + fri_openings)

    def _blind(self) -> None:
        """zk blinding rows (reference: circuit_builder.rs:863-940): one
        random row per regular opening; two copy-constrained random rows per
        Z opening."""
        num_gates = len(self.gate_instances)
        degree_estimate = 1 << (num_gates - 1).bit_length()
        while True:
            regular, z = self._num_blinding_gates(degree_estimate)
            if num_gates + regular + 2 * z <= degree_estimate:
                break
            degree_estimate *= 2
        nw, nr = self.config.num_wires, self.config.num_routed_wires
        for _ in range(regular):
            row = self.add_gate(NoopGate(), [])
            for w in range(nw):
                self.add_simple_generator(
                    RandomValueGenerator(wire(row, w), self._rng))
        for _ in range(z):
            g1 = self.add_gate(NoopGate(), [])
            g2 = self.add_gate(NoopGate(), [])
            for w in range(nr):
                self.add_simple_generator(
                    RandomValueGenerator(wire(g1, w), self._rng))
                self.connect(wire(g1, w), wire(g2, w))

    def blind_and_pad(self, min_degree_bits: int | None = None) -> None:
        if self.config.zero_knowledge:
            self._blind()
        while not _is_pow2(len(self.gate_instances)) or (
                min_degree_bits is not None
                and len(self.gate_instances) < (1 << min_degree_bits)):
            self.add_gate(NoopGate(), [])

    def build(self, min_degree_bits: int | None = None,
              gc=None) -> CircuitData:
        config = self.config
        rate_bits = config.fri_config.rate_bits
        cap_height = config.fri_config.cap_height

        num_public_inputs = len(self.public_inputs)
        pi_hash_parts = self.public_inputs_hash_gadget(list(self.public_inputs))
        pi_gate_obj = PublicInputGate()
        pi_gate = self.add_gate(pi_gate_obj, [])
        for h, w in zip(pi_hash_parts, pi_gate_obj.wires_public_inputs_hash()):
            self.connect(h, wire(pi_gate, w))
        # randomize unused pi wires (reference: circuit_builder.rs:1025)
        for col in range(4, config.num_wires):
            self.add_simple_generator(
                RandomValueGenerator(wire(pi_gate, col), self._rng))

        # constants: route each constant to a ConstantGate slot
        while len(self.constants_to_targets) > len(self.constant_generators):
            self.add_gate(ConstantGate(config.num_constants), [])
        for (c, t), cg in zip(
                sorted(self.constants_to_targets.items(), key=lambda kv: kv[0]),
                self.constant_generators):
            self.gate_instances[cg.row][1][cg.constant_index] = c
            self.connect(wire(cg.row, cg.wire_index), t)
            cg.constant = c
            self.add_simple_generator(cg)

        self.blind_and_pad(min_degree_bits)
        degree = len(self.gate_instances)
        degree_bits = degree.bit_length() - 1
        fri_params = config.fri_config.fri_params(degree_bits,
                                                  config.zero_knowledge)
        assert fri_params.total_arities <= degree_bits + rate_bits - cap_height, \
            "FRI total reduction arity is too large."

        quotient_degree_factor = config.max_quotient_degree_factor
        # deterministic gate order: (degree, id)
        gates = sorted(self.gate_types.values(),
                       key=lambda g: (g.degree(), g.id()))
        selector_values, selectors_info = _selector_polynomials(
            gates, self.gate_instances, quotient_degree_factor + 1)

        # gate-constant columns
        max_gate_constants = config.num_constants
        constant_cols = np.zeros((max_gate_constants, degree), dtype=np.uint64)
        for row, (_, consts) in enumerate(self.gate_instances):
            assert len(consts) <= max_gate_constants, \
                f"gate at row {row} has {len(consts)} constants"
            for j, c in enumerate(consts):
                constant_cols[j, row] = c
        constant_vecs = np.concatenate([selector_values, constant_cols], axis=0)
        num_constants = constant_vecs.shape[0]

        subgroup = np.asarray(ref.two_adic_subgroup(degree_bits),
                              dtype=np.uint64)
        k_is = [ref.exp(ref.MULTIPLICATIVE_GROUP_GENERATOR, i)
                for i in range(config.num_routed_wires)]

        # copy constraints -> union-find -> sigmas
        forest = Forest(config.num_wires, config.num_routed_wires, degree)
        forest.add_virtual(self.virtual_target_count)
        for x, y in self.copy_constraints:
            forest.merge(x, y)
        representative_map = forest.compress_paths()
        sigma_vecs = forest.sigma_vecs(k_is, subgroup)

        constants_sigmas = np.concatenate([constant_vecs, sigma_vecs], axis=0)
        if gc is None:
            from ..hash.hashers import PoseidonGoldilocksConfig
            gc = PoseidonGoldilocksConfig
        constants_sigmas_commitment = PolynomialBatch.from_values(
            GF.from_u64(constants_sigmas), rate_bits, False, cap_height,
            hasher=gc.hasher)

        # generators: per gate instance, dropping unused batched-op slots
        incomplete = {}
        for slots in self.current_slots.values():
            for gate_idx, next_slot in slots.values():
                incomplete[gate_idx] = next_slot
        generators = list(self.generators)
        for row, (gate, consts) in enumerate(self.gate_instances):
            gens = gate.generators(row, consts)
            if row in incomplete:
                gens = gens[:incomplete[row]]
            generators.extend(gens)

        num_gate_constraints = max(g.num_constraints() for g in gates)
        num_partial_products = _num_partial_products(
            config.num_routed_wires, quotient_degree_factor)

        cap_digests = constants_sigmas_commitment.merkle_tree.cap_digests()
        # circuit digest over C::Hasher (reference: circuit_builder.rs:
        # 1200-1212): hash(cap.flatten() || hash_pad(domain_separator).to_vec()
        # || degree_bits); caps flatten via GenericHashOut::to_vec.
        from ..hash.hashers import digest_to_elements
        domain_separator_digest = gc.hasher.hash_pad_oracle(
            list(self.domain_separator or []))
        digest_inputs = (
            [x for d in cap_digests for x in digest_to_elements(d)]
            + digest_to_elements(domain_separator_digest) + [degree_bits])
        circuit_digest = gc.hasher.hash_no_pad_oracle(digest_inputs)

        common = CommonCircuitData(
            config=config,
            fri_params=fri_params,
            gates=gates,
            selectors_info=selectors_info,
            quotient_degree_factor=quotient_degree_factor,
            num_gate_constraints=num_gate_constraints,
            num_constants=num_constants,
            num_public_inputs=num_public_inputs,
            k_is=k_is,
            num_partial_products=num_partial_products,
            gc=gc,
        )
        if self.goal_common_data is not None:
            assert common.same_shape(self.goal_common_data), \
                ("cyclic recursion: built CommonCircuitData does not match "
                 "the goal passed to conditionally_verify_cyclic_proof")
        prover_only = ProverOnlyData(
            generators=generators,
            constants_sigmas_commitment=constants_sigmas_commitment,
            sigmas=sigma_vecs,
            subgroup=subgroup,
            public_inputs=list(self.public_inputs),
            representative_map=representative_map,
            circuit_digest=circuit_digest,
        )
        verifier_only = VerifierOnlyData(
            constants_sigmas_cap=cap_digests,
            circuit_digest=circuit_digest,
        )
        return CircuitData(prover_only, verifier_only, common)


class _InverseGenerator:
    """Fills x_inv = 1/x (reference: gadgets/arithmetic.rs inverse gadget)."""

    def __init__(self, x, x_inv):
        self.x, self.x_inv = x, x_inv

    def watch_list(self):
        return [self.x]

    def run(self, witness, out):
        if not witness.is_set(self.x):
            return False
        x = witness.get(self.x)
        out.append((self.x_inv, ref.inverse(x) if x else 0))
        return True


def _num_partial_products(num_routed: int, max_degree: int) -> int:
    """reference: util/partial_products.rs:41-48."""
    return (num_routed + max_degree - 1) // max_degree - 1


def _selector_polynomials(gates, instances, max_degree: int):
    """reference: gates/selectors.rs:103-190."""
    n = len(instances)
    num_gates = len(gates)
    max_gate_degree = gates[-1].degree()
    index = {g.id(): i for i, g in enumerate(gates)}

    if max_gate_degree + num_gates - 1 <= max_degree:
        poly = np.asarray([index[g.id()] for g, _ in instances],
                          dtype=np.uint64)[None, :]
        return poly, SelectorsInfo(selector_indices=[0] * num_gates,
                                   groups=[range(0, num_gates)])

    assert max_gate_degree < max_degree, \
        f"{gates[-1].id()} has too high degree"

    groups = []
    start = 0
    while start < num_gates:
        size = 0
        while (start + size < num_gates
               and size + gates[start + size].degree() < max_degree):
            size += 1
        groups.append(range(start, start + size))
        start += size

    def group_of(i):
        for gi, r in enumerate(groups):
            if i in r:
                return gi
        raise AssertionError

    selector_indices = [group_of(i) for i in range(num_gates)]
    polys = np.full((len(groups), n), UNUSED_SELECTOR, dtype=np.uint64)
    for j, (g, _) in enumerate(instances):
        i = index[g.id()]
        gr = selector_indices[i]
        for gidx in range(len(groups)):
            polys[gidx, j] = i if gidx == gr else UNUSED_SELECTOR
    return polys, SelectorsInfo(selector_indices=selector_indices,
                                groups=groups)
