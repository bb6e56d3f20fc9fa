#!/bin/bash
# Round-4 TPU work queue, priority order. Each step independently
# time-bounded and logged; a tunnel drop costs only the step in flight.
# Run: bash scripts/tpu_queue_r4.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-tpu_logs}"
mkdir -p "$LOGDIR"
echo "logs -> $LOGDIR"

probe() {
    timeout 90 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
        >/dev/null 2>&1
}

run_step() {  # name timeout_s cmd...
    local name="$1" tmo="$2"; shift 2
    if ! probe; then echo "[$name] SKIP: tunnel down"; return 1; fi
    echo "[$name] start $(date +%H:%M:%S)"
    timeout "$tmo" "$@" >"$LOGDIR/r4_$name.log" 2>&1
    local rc=$?
    echo "[$name] exit=$rc $(date +%H:%M:%S)  (log: $LOGDIR/r4_$name.log)"
    return $rc
}

# 1. Pallas validation incl. the fused leaf kernel (bit parity on chip)
run_step tpu_validate 1200 python scripts/tpu_validate.py

# 2. Bench pass 1 (cold compiles -> persistent cache) then pass 2 (warm
#    numbers — what the driver's run will reproduce)
run_step bench_cold 8000 env PLONKY2_TPU_BENCH_BUDGET_S=7200 python bench.py
run_step bench_warm 4000 env PLONKY2_TPU_BENCH_BUDGET_S=3000 python bench.py

# 3. NTT crossover calibration (sets _MIN_LG_MXU from data)
run_step crossover 2400 python scripts/tpu_crossover.py
run_step crossover_b135 2400 python scripts/tpu_crossover.py 135

# 4. Heavy e2e proves (EVIDENCE.md entries)
run_step stark_outer 7200 env PLONKY2_TPU_TEST_BACKEND=tpu PLONKY2_TPU_HEAVY=1 \
    python -m pytest tests/test_starky_recursive.py::test_recursive_stark_verifier_proves_e2e -q
run_step schnorr_prove 10800 env PLONKY2_TPU_TEST_BACKEND=tpu PLONKY2_TPU_HEAVY=1 \
    python -m pytest tests/test_schnorr_circuit.py::test_schnorr_verify_circuit_proves_e2e -q
run_step ecdsa_prove 10800 env PLONKY2_TPU_TEST_BACKEND=tpu PLONKY2_TPU_HEAVY=1 \
    python -m pytest "tests/test_curve_gadgets.py::test_ecdsa_verify_message_circuit_proves_e2e" -q

# 5. Prover phase profile (TimingTree attribution for EVIDENCE.md)
run_step prover_profile 7200 python scripts/tpu_prover_profile.py

echo "queue done; logs in $LOGDIR"
