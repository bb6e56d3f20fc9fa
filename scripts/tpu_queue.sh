#!/bin/bash
# TPU work queue: everything that needs the real chip, in priority order.
# Run when the axon tunnel is up:  bash scripts/tpu_queue.sh [logdir]
# Each step is independently time-bounded and logs to its own file, so a
# mid-queue tunnel drop loses only the step in flight.
set -u
cd "$(dirname "$0")/.."
LOGDIR="${1:-/tmp/tpu_queue_$(date +%H%M)}"
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
    timeout "$tmo" "$@" >"$LOGDIR/$name.log" 2>&1
    local rc=$?
    echo "[$name] exit=$rc $(date +%H:%M:%S)  (log: $LOGDIR/$name.log)"
    return $rc
}

# 1. Pallas Poseidon on-chip validation (bit parity + throughput), ~5 min
run_step pallas_validate 900 python scripts/tpu_validate.py

# 2. The remaining heavy e2e reruns (cyclic had the num_cap_elements fix,
#    curve/ecdsa had the Pallas roll fix) — the final EVIDENCE.md entries
run_step heavy_cyclic 7200 env PLONKY2_TPU_TEST_BACKEND=tpu PLONKY2_TPU_HEAVY=1 \
    python -m pytest tests/test_cyclic.py -q --durations=5

run_step heavy_curve 10800 env PLONKY2_TPU_TEST_BACKEND=tpu PLONKY2_TPU_HEAVY=1 \
    python -m pytest tests/test_curve_gadgets.py tests/test_ecgfp5_gadgets.py \
    -q --durations=10

# 3. The BASELINE bench suite (NTT sweep, merkle 2^20, FRI open 2^18,
#    fib prove, headline commit) — BENCH_r02 source of truth
run_step bench 7200 python bench.py

# 4. Recursion-chain bench (host-witness-bound, long); only that step
run_step bench_recursion 10800 env PLONKY2_TPU_BENCH_RECURSION=1 \
    PLONKY2_TPU_BENCH_ONLY=bench_recursion_chain python bench.py

echo "queue done; logs in $LOGDIR"
