"""PoseidonGate — full width-12 permutation in one row (135 wires).

Reference: plonky2/src/gates/poseidon.rs — wire layout :42-99, constraints
:418-500 (fast-partial-rounds formulation), generator :726-845. The constraint
system checks every S-box input against a committed intermediate wire, so the
constraint degree stays at 7 while spanning 30 rounds.

Wire layout: 0..12 inputs | 12..24 outputs | 24 swap | 25..29 deltas |
29..65 full-round-0 sbox inputs (rounds 1..3) | 65..87 partial sbox inputs |
87..135 full-round-1 sbox inputs. Total 135 = the default num_wires.
"""

from __future__ import annotations

from ..field import reference as ref
from ..hash import poseidon_fast as pf
from ..hash.poseidon_constants import (
    HALF_N_FULL_ROUNDS, N_PARTIAL_ROUNDS, SPONGE_WIDTH,
)
from ..iop.generator import SimpleGenerator
from ..iop.target import wire
from .gate import Gate

W = SPONGE_WIDTH


class PoseidonGate(Gate):
    WIRE_SWAP = 2 * W
    START_DELTA = 2 * W + 1
    START_FULL_0 = START_DELTA + 4
    START_PARTIAL = START_FULL_0 + (HALF_N_FULL_ROUNDS - 1) * W
    START_FULL_1 = START_PARTIAL + N_PARTIAL_ROUNDS

    @staticmethod
    def wire_input(i):
        return i

    @staticmethod
    def wire_output(i):
        return W + i

    @classmethod
    def wire_delta(cls, i):
        assert i < 4
        return cls.START_DELTA + i

    @classmethod
    def wire_full_sbox_0(cls, round_, i):
        assert 0 < round_ < HALF_N_FULL_ROUNDS
        return cls.START_FULL_0 + W * (round_ - 1) + i

    @classmethod
    def wire_partial_sbox(cls, round_):
        return cls.START_PARTIAL + round_

    @classmethod
    def wire_full_sbox_1(cls, round_, i):
        return cls.START_FULL_1 + W * round_ + i

    def id(self):
        return "PoseidonGate(PhantomData<plonky2_field::goldilocks_field::GoldilocksField>)<WIDTH=12>"

    def num_wires(self):
        return self.START_FULL_1 + HALF_N_FULL_ROUNDS * W  # 135

    def degree(self):
        return 7

    def num_constraints(self):
        return (1 + 4 + (HALF_N_FULL_ROUNDS - 1) * W + N_PARTIAL_ROUNDS
                + HALF_N_FULL_ROUNDS * W + W)  # 123

    def eval_unfiltered(self, alg, consts, wires, pi_hash):
        cons = []
        one = alg.const(1)
        swap = wires[self.WIRE_SWAP]
        cons.append(alg.mul(swap, alg.sub(swap, one)))

        for i in range(4):
            lhs = wires[self.wire_input(i)]
            rhs = wires[self.wire_input(i + 4)]
            delta = wires[self.wire_delta(i)]
            cons.append(alg.sub(alg.mul(swap, alg.sub(rhs, lhs)), delta))

        state = [None] * W
        for i in range(4):
            delta = wires[self.wire_delta(i)]
            state[i] = alg.add(wires[self.wire_input(i)], delta)
            state[i + 4] = alg.sub(wires[self.wire_input(i + 4)], delta)
        for i in range(8, W):
            state[i] = wires[self.wire_input(i)]

        round_ctr = 0
        for r in range(HALF_N_FULL_ROUNDS):
            state = pf.constant_layer(alg, state, round_ctr)
            if r != 0:
                for i in range(W):
                    sbox_in = wires[self.wire_full_sbox_0(r, i)]
                    cons.append(alg.sub(state[i], sbox_in))
                    state[i] = sbox_in
            state = pf.sbox_layer(alg, state)
            state = pf.mds_layer(alg, state)
            round_ctr += 1

        partial_rc = pf.fast_partial_tables()[1]
        state = pf.partial_first_constant_layer(alg, state)
        state = pf.mds_partial_layer_init(alg, state)
        for r in range(N_PARTIAL_ROUNDS):
            sbox_in = wires[self.wire_partial_sbox(r)]
            cons.append(alg.sub(state[0], sbox_in))
            s0 = pf.sbox_monomial(alg, sbox_in)
            if r < N_PARTIAL_ROUNDS - 1:
                s0 = alg.add_const(s0, partial_rc[r])
            state = [s0] + state[1:]
            state = pf.mds_partial_layer_fast(alg, state, r)
        round_ctr += N_PARTIAL_ROUNDS

        for r in range(HALF_N_FULL_ROUNDS):
            state = pf.constant_layer(alg, state, round_ctr)
            for i in range(W):
                sbox_in = wires[self.wire_full_sbox_1(r, i)]
                cons.append(alg.sub(state[i], sbox_in))
                state[i] = sbox_in
            state = pf.sbox_layer(alg, state)
            state = pf.mds_layer(alg, state)
            round_ctr += 1

        for i in range(W):
            cons.append(alg.sub(state[i], wires[self.wire_output(i)]))
        return cons

    def generators(self, row, local_constants):
        return [PoseidonGenerator(row)]

    # -- stacked device evaluation -------------------------------------------
    def eval_unfiltered_rows(self, consts_rows, wires_rows, pi_rows):
        """Tensorized constraint eval: state is GF [N, 12]; the full MDS is
        the same roll-based kernel as the hashing path (hash/poseidon.py).
        Repeated rounds run under lax.scan so the compiled graph is O(1) in
        the round count. Constraint order matches eval_unfiltered exactly."""
        import jax
        import numpy as np

        from ..field.goldilocks import GF
        from ..hash.poseidon import _mds_layer
        from ..hash.poseidon_constants import (
            ALL_ROUND_CONSTANTS, MDS_MATRIX_CIRC, MDS_MATRIX_DIAG,
        )

        N = wires_rows.shape[-1]
        first_rc, partial_rc, vs, w_hats, init_mat = pf.fast_partial_tables()
        as_gf = lambda a: GF.from_u64(np.asarray(a, dtype=np.uint64))
        rc_rows = as_gf(np.asarray(ALL_ROUND_CONSTANTS,
                                   dtype=np.uint64).reshape(30, W))
        first_rc_g = as_gf(first_rc)
        init_mat_g = as_gf(init_mat)        # [11, 11]
        w_hats_g = as_gf(w_hats)            # [22, 11]
        vs_g = as_gf(vs)                    # [22, 11]
        # partial_rc with a trailing 0 so the last round adds nothing
        partial_rc_g = as_gf(partial_rc)    # [22] (last entry is 0)

        def sbox(x: GF) -> GF:
            x2 = x.square()
            x3 = x2 * x
            return x3 * x3 * x

        cons = []
        one = GF.ones((N,))
        swap = wires_rows[self.WIRE_SWAP]
        cons.append(swap * (swap - one))

        ins = wires_rows[:W].transpose(1, 0)                    # [N, 12]
        deltas = wires_rows[self.START_DELTA:self.START_DELTA + 4] \
            .transpose(1, 0)                                    # [N, 4]
        swap_c = swap.reshape(N, 1).broadcast_to((N, 4))
        delta_check = swap_c * (ins[:, 4:8] - ins[:, 0:4]) - deltas
        for i in range(4):
            cons.append(delta_check[:, i])

        state = GF.concatenate(
            [ins[:, 0:4] + deltas, ins[:, 4:8] - deltas, ins[:, 8:]], axis=1)

        def full_round(state: GF, rc_row: GF, sbox_in: GF):
            """One full round reading sbox inputs from wires; returns
            (new_state, diff_row) with diff = state_after_constants - wire."""
            st = state + rc_row.reshape(1, W).broadcast_to((N, W))
            diff = st - sbox_in
            return _mds_layer(sbox(sbox_in)), diff

        # round 0: no committed sbox inputs — S-box applies to the state
        st0 = state + rc_rows[0].reshape(1, W).broadcast_to((N, W))
        state = _mds_layer(sbox(st0))

        def scan_full(carry, xs):
            st = GF(carry[0], carry[1])
            rc_lo, rc_hi, w_lo, w_hi = xs
            new_st, diff = full_round(st, GF(rc_lo, rc_hi), GF(w_lo, w_hi))
            return (new_st.lo, new_st.hi), (diff.lo, diff.hi)

        sbox0 = wires_rows[self.START_FULL_0:
                           self.START_FULL_0 + (HALF_N_FULL_ROUNDS - 1) * W]
        sbox0 = sbox0.reshape(HALF_N_FULL_ROUNDS - 1, W, N) \
            .transpose(0, 2, 1)                                 # [3, N, 12]
        rc0 = rc_rows[1:HALF_N_FULL_ROUNDS]
        (slo, shi), (dlo, dhi) = jax.lax.scan(
            scan_full, (state.lo, state.hi),
            (rc0.lo, rc0.hi, sbox0.lo, sbox0.hi))
        state = GF(slo, shi)
        diffs0 = GF(dlo, dhi)                                   # [3, N, 12]
        for r in range(HALF_N_FULL_ROUNDS - 1):
            for i in range(W):
                cons.append(diffs0[r, :, i])

        # partial rounds
        state = state + first_rc_g.reshape(1, W).broadcast_to((N, W))
        tail = state[:, 1:]                                     # [N, 11]
        prod = tail.reshape(N, 11, 1).broadcast_to((N, 11, 11)) * \
            init_mat_g.reshape(1, 11, 11).broadcast_to((N, 11, 11))
        state = GF.concatenate([state[:, 0:1], prod.sum(axis=1)], axis=1)

        m00 = MDS_MATRIX_CIRC[0] + MDS_MATRIX_DIAG[0]
        sbox_p = wires_rows[self.START_PARTIAL:
                            self.START_PARTIAL + N_PARTIAL_ROUNDS]  # [22, N]

        # Split (head, tail) carry: feeding a concatenate of the S-box output
        # back as the scan carry triggers a pathological XLA:CPU compile
        # (~70s vs ~2s); separate components avoid it.
        def scan_partial(carry, xs):
            h_lo, h_hi, t_lo, t_hi = carry
            head, tail = GF(h_lo, h_hi), GF(t_lo, t_hi)
            w_lo, w_hi, rc_lo, rc_hi, wh_lo, wh_hi, v_lo, v_hi = xs
            sbox_in = GF(w_lo, w_hi)                            # [N]
            diff = head - sbox_in
            s0 = sbox(sbox_in) + GF(rc_lo, rc_hi).broadcast_to((N,))
            wh = GF(wh_lo, wh_hi).reshape(1, 11).broadcast_to((N, 11))
            row = tail * wh
            acc = row[:, 0]
            for i in range(1, 11):
                acc = acc + row[:, i]
            d = acc + s0.mul_small(m00)
            v_row = GF(v_lo, v_hi).reshape(1, 11).broadcast_to((N, 11))
            new_tail = tail + s0.reshape(N, 1).broadcast_to((N, 11)) * v_row
            return (d.lo, d.hi, new_tail.lo, new_tail.hi), (diff.lo, diff.hi)

        head0, tail0 = state[:, 0], state[:, 1:]
        (hlo, hhi, tlo, thi), (dlo, dhi) = jax.lax.scan(
            scan_partial, (head0.lo, head0.hi, tail0.lo, tail0.hi),
            (sbox_p.lo, sbox_p.hi, partial_rc_g.lo, partial_rc_g.hi,
             w_hats_g.lo, w_hats_g.hi, vs_g.lo, vs_g.hi))
        state = GF.concatenate(
            [GF(hlo, hhi).reshape(N, 1), GF(tlo, thi)], axis=1)
        diffs_p = GF(dlo, dhi)                                  # [22, N]
        for r in range(N_PARTIAL_ROUNDS):
            cons.append(diffs_p[r])

        # final full rounds
        sbox1 = wires_rows[self.START_FULL_1:
                           self.START_FULL_1 + HALF_N_FULL_ROUNDS * W]
        sbox1 = sbox1.reshape(HALF_N_FULL_ROUNDS, W, N).transpose(0, 2, 1)
        rc1 = rc_rows[HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS:]
        (slo, shi), (dlo, dhi) = jax.lax.scan(
            scan_full, (state.lo, state.hi),
            (rc1.lo, rc1.hi, sbox1.lo, sbox1.hi))
        state = GF(slo, shi)
        diffs1 = GF(dlo, dhi)
        for r in range(HALF_N_FULL_ROUNDS):
            for i in range(W):
                cons.append(diffs1[r, :, i])

        outs = wires_rows[W:2 * W].transpose(1, 0)
        final = state - outs
        for i in range(W):
            cons.append(final[:, i])
        return GF.stack(cons, axis=0)


# generated wire columns (deltas, committed sbox inputs, outputs) in the
# reference's emission order — everything but inputs and swap
_TRACE_COLS = (
    list(range(PoseidonGate.START_DELTA, PoseidonGate.START_DELTA + 4))
    + list(range(PoseidonGate.START_FULL_0, PoseidonGate.START_FULL_0
                 + (HALF_N_FULL_ROUNDS - 1) * W))
    + list(range(PoseidonGate.START_PARTIAL,
                 PoseidonGate.START_PARTIAL + N_PARTIAL_ROUNDS))
    + list(range(PoseidonGate.START_FULL_1, PoseidonGate.START_FULL_1
                 + HALF_N_FULL_ROUNDS * W))
    + [PoseidonGate.wire_output(i) for i in range(W)]
)


class PoseidonGenerator(SimpleGenerator):
    def __init__(self, row):
        self.row = row

    def dependencies(self):
        g = PoseidonGate
        return ([wire(self.row, g.wire_input(i)) for i in range(W)]
                + [wire(self.row, g.WIRE_SWAP)])

    def run_once(self, witness, out):
        g = PoseidonGate
        alg = pf.INT
        row = self.row
        inputs = [witness.get(wire(row, g.wire_input(i))) for i in range(W)]
        swap = witness.get(wire(row, g.WIRE_SWAP))
        assert swap in (0, 1)

        from .. import native
        trace = native.poseidon_generator_trace(inputs, swap)
        if trace is not None:
            # native C fast-partial trace; bit-parity with the python-int
            # path asserted by tests/test_poseidon.py
            out.extend((("w", row, c), trace[c]) for c in _TRACE_COLS)
            return

        state = list(inputs)
        for i in range(4):
            delta = swap * (inputs[i + 4] - inputs[i]) % ref.ORDER
            out.append((wire(row, g.wire_delta(i)), delta))
            state[i] = (inputs[i] + delta) % ref.ORDER
            state[i + 4] = (inputs[i + 4] - delta) % ref.ORDER

        round_ctr = 0
        for r in range(HALF_N_FULL_ROUNDS):
            state = pf.constant_layer(alg, state, round_ctr)
            if r != 0:
                for i in range(W):
                    out.append((wire(row, g.wire_full_sbox_0(r, i)), state[i]))
            state = pf.sbox_layer(alg, state)
            state = pf.mds_layer(alg, state)
            round_ctr += 1

        partial_rc = pf.fast_partial_tables()[1]
        state = pf.partial_first_constant_layer(alg, state)
        state = pf.mds_partial_layer_init(alg, state)
        for r in range(N_PARTIAL_ROUNDS):
            out.append((wire(row, g.wire_partial_sbox(r)), state[0]))
            s0 = pf.sbox_monomial(alg, state[0])
            if r < N_PARTIAL_ROUNDS - 1:
                s0 = (s0 + partial_rc[r]) % ref.ORDER
            state = [s0] + state[1:]
            state = pf.mds_partial_layer_fast(alg, state, r)
        round_ctr += N_PARTIAL_ROUNDS

        for r in range(HALF_N_FULL_ROUNDS):
            state = pf.constant_layer(alg, state, round_ctr)
            for i in range(W):
                out.append((wire(row, g.wire_full_sbox_1(r, i)), state[i]))
            state = pf.sbox_layer(alg, state)
            state = pf.mds_layer(alg, state)
            round_ctr += 1

        for i in range(W):
            out.append((wire(row, g.wire_output(i)), state[i]))
