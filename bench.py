#!/usr/bin/env python
"""BASELINE.md benchmark suite on the real chip. Prints one JSON line per
metric, MOST IMPORTANT FIRST so a truncated driver window still captures the
headline numbers (round-2 lesson: the old ordering put them last and the
driver hit rc=124 before reaching them):

  poly_batch_commit_135x2^13_rate8 — headline (round-1 comparable)
  fibonacci_prove         — full PLONK prove (fib(100), standard config)
  recursion_chain         — build+prove inner, then prove the recursive
                            wrapper (bench_recursion analog; reference anchor
                            ~170 ms/wrap, plonky2/README.md:5)
  fri_commit_open_2^18    — PolynomialBatch commit + full FRI opening proof
                            (blowup 8, 28 queries — default config, BASELINE)
  merkle_2^20x8           — Poseidon Merkle tree over 2^20 leaves x 8 elems
  merkle_2^13x135         — the prover's leaf shape (reference
                            plonky2/benches/merkle.rs:13-27: 135-elem leaves)
  lde_batch_135x2^k_rate8 — batched coset LDE, the prover's ACTUAL shape
  ntt_batch_135x2^k       — batched forward NTT
  ntt_2^k / lde_2^k_rate8 — single-poly sweeps (latency-bound; diagnostic)
  batch_prove_fib         — B proofs through the vmapped prover

Robustness: every step runs in a CHILD process with a hard per-step timeout
(a hung XLA compile or a dropped TPU tunnel then costs one step, not the
whole suite). Children share the persistent compilation cache, so repeated
runs are warm. PLONKY2_TPU_BENCH_INPROC=1 restores in-process execution.

Each line carries a roofline note where meaningful: bytes moved per pass and
achieved fraction of the chip's ~819 GB/s HBM bandwidth (v5e).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

HBM_GBPS = 819e9   # v5e per-chip HBM bandwidth (roofline denominator)
ORDER = (1 << 64) - (1 << 32) + 1


def _cache_dir(platform: str) -> str:
    """Persistent-cache dir keyed by a host fingerprint. Round-3 failure
    mode: /tmp/plonky2_tpu_jax_cache was shared verbatim across machines, and
    XLA:CPU AOT executables embed the COMPILE machine's CPU features — loading
    them on a different host churns endlessly ("Compile machine features ...
    vs host machine features", BENCH_r03.json). Keying the dir by
    (platform, cpu-flags, jax version) makes cross-machine poisoning
    structurally impossible."""
    import hashlib
    try:
        import jax
        ver = jax.__version__
    except Exception:  # noqa: BLE001
        ver = "?"
    flags = ""
    if platform == "cpu":
        # only XLA:CPU AOT blobs embed host CPU features; TPU executables are
        # portable across hosts, so keep the TPU cache shared across machines
        try:
            with open("/proc/cpuinfo") as f:
                flags = next((l for l in f if l.startswith("flags")), "")
        except OSError:
            pass
    key = hashlib.sha1(
        f"{platform}|{ver}|{flags}".encode()).hexdigest()[:12]
    return f"/tmp/plonky2_tpu_jax_cache_{key}"


def _pin_platform():
    """Pin the jax platform BEFORE any backend init. The TPU plugin blocks
    indefinitely (0% CPU) when its tunnel is down, so probe it in a
    subprocess with a hard timeout and fall back to CPU — a degraded bench
    line beats a hung driver. PLONKY2_TPU_BENCH_PLATFORM overrides the
    probe. NOTE: must be jax.config.update, not the JAX_PLATFORMS env var
    (the env-var route still hangs on this box's plugin shim)."""
    want = os.environ.get("PLONKY2_TPU_BENCH_PLATFORM")
    if want is None:
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert jax.devices()[0].platform == 'tpu'"],
                timeout=120, check=True, capture_output=True)
            want = ""          # TPU reachable: keep the default platform
        except Exception:
            want = "cpu"
    import jax
    if want:
        jax.config.update("jax_platforms", want)
    jax.config.update("jax_compilation_cache_dir",
                      _cache_dir(want or "tpu"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_threefry_partitionable", True)
    if want == "cpu":
        # belt and braces: never load machine-feature-sensitive CPU AOT blobs
        try:
            jax.config.update("jax_persistent_cache_enable_xla_caches",
                              "none")
        except Exception:  # noqa: BLE001
            pass
    return want


_FLOOR = None


def _sync(out):
    """Force REAL completion: a tiny host readback. On the axon remote
    backend block_until_ready returns before execution finishes, and
    identical executions can be served from a cache, so honest timing needs
    (a) a readback sync and (b) per-iteration input perturbation."""
    import jax
    arr = out.lo if hasattr(out, "lo") else out
    if isinstance(arr, (tuple, list)):
        arr = arr[0]
    np.asarray(jax.device_get(arr.ravel()[:1] if arr.ndim else arr))


def _floor_s():
    """Measured readback round-trip floor (subtracted from timings)."""
    global _FLOOR
    if _FLOOR is None:
        import jax
        import jax.numpy as jnp
        x = jnp.zeros((8, 128), jnp.int32)
        f = jax.jit(lambda a, s: a + s)
        _sync(f(x, 1))
        t0 = time.perf_counter()
        _sync(f(x, 2))
        _FLOOR = time.perf_counter() - t0
    return _FLOOR


class InvalidMeasurement(RuntimeError):
    """Raised when a timing cannot be distinguished from the readback floor.
    Emitting a number from such a run produced physically impossible values
    in round 4 (ntt_2^16 at 6.55e13 el/s); refusing is the only honest
    output (VERDICT r4 weak #2)."""


def _net_dt(elapsed: float, iters: int, what: str) -> float:
    """elapsed wall-time for `iters` iterations -> seconds/iter net of the
    readback floor; refuses when the measurement is floor-dominated."""
    floor = _floor_s()
    if elapsed < max(2.0 * floor, 20e-3):
        raise InvalidMeasurement(
            f"{what}: elapsed {elapsed*1e3:.2f} ms for {iters} iters is "
            f"within 2x the readback floor ({floor*1e3:.2f} ms) — "
            "increase iters; refusing to emit")
    return (elapsed - floor) / iters


def _bench(fn, warmup=1, iters=5, ready=None):
    """fn(i) runs one perturbed iteration (i varies so the remote runtime
    cannot dedupe identical executions); returns seconds/iteration net of
    the readback floor. Accepts legacy zero-arg fns too."""
    import inspect
    takes_i = len(inspect.signature(fn).parameters) >= 1
    call = (lambda i: fn(i)) if takes_i else (lambda i: fn())
    for w in range(warmup):
        out = call(-1 - w)
    _sync(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = call(i)
    _sync(out)
    return _net_dt(time.perf_counter() - t0, iters, "_bench")


def _chained_run_fn(step_fn, x, iters, n_last):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from plonky2_tpu.field.goldilocks import GF

    @jax.jit
    def run(lo, hi):
        def body(i, c):
            l, h = c
            o = step_fn(GF(l ^ i.astype(jnp.uint32), h))
            if o.shape[-1] != n_last:
                o = GF(o.lo[..., :n_last], o.hi[..., :n_last])
            return (o.lo, o.hi)
        return lax.fori_loop(0, iters, body, (lo, hi))

    return run


def _bench_chained(step_fn, x, iters):
    """Chain `iters` dependent in-graph iterations of step_fn (GF -> GF)
    inside one jit and sync once: per-dispatch overhead (~3 ms through the
    tunnel) would otherwise swamp ms-scale kernels. The input is XOR-
    perturbed per iteration; outputs larger than the input (LDE) are sliced
    back so the loop carry keeps one shape. Auto-scales the chain length
    until the run time dwarfs the readback floor (never emits a
    floor-clamped number)."""
    n_last = x.shape[-1]
    run = _chained_run_fn(step_fn, x, iters, n_last)

    _sync(run(x.lo, x.hi)[0])
    total_iters = iters
    for _attempt in range(6):
        t0 = time.perf_counter()
        out = run(x.lo, x.hi)
        _sync(out[0])
        elapsed = time.perf_counter() - t0
        if elapsed >= max(8.0 * _floor_s(), 0.1):
            return _net_dt(elapsed, total_iters, "_bench_chained")
        # floor-dominated (round-4 ntt_2^16 failure mode): chain more
        # iterations in-graph until the run time dwarfs the readback floor
        iters *= 8
        total_iters = iters
        run = _chained_run_fn(step_fn, x, iters, n_last)
        _sync(run(x.lo, x.hi)[0])
    return _net_dt(elapsed, total_iters, "_bench_chained")


_COLLECTED: list = []


def emit(metric, value, unit, baseline=None, estimate=None, **extra):
    """One JSON metric line. `baseline` is reserved for MEASURED, CITED
    anchors (pass baseline_src naming the source); an uncited anchor goes in
    `estimate` and is reported as vs_estimate (VERDICT r4 weak #3). Emitting
    a physically impossible number (roofline fraction > 1, non-finite value)
    is a hard error on the record, not a value."""
    fracs = {k: extra.get(k) for k in ("hbm_roofline_frac", "mxu_util_frac")
             if extra.get(k) is not None}
    if (not np.isfinite(value)) or value <= 0 or any(
            f > 1.0 for f in fracs.values()):
        rec = {"metric": metric, "invalid":
               f"rejected: value={value:.4g} {unit}"
               + "".join(f", {k}={v}" for k, v in fracs.items())
               + " — measurement outside physical bounds"}
        _collect(rec)
        print(json.dumps(rec), flush=True)
        return
    # 4 significant digits, not 1 decimal place: sub-0.05/s rates (cold
    # proofs-per-s) must not print as a physically-impossible "0.0"
    rec = {"metric": metric, "value": float(f"{value:.4g}"), "unit": unit,
           "vs_baseline": round(value / baseline, 3) if baseline else None}
    if estimate:
        rec["vs_estimate"] = round(value / estimate, 3)
    rec.update(extra)
    _collect(rec)
    print(json.dumps(rec), flush=True)


def _collect(rec):
    _COLLECTED.append(rec)


def _collect_lines(text: str):
    """Parse emitted JSON lines out of a child's stdout and forward them."""
    for line in (text or "").splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except ValueError:
            continue
        if "metric" in rec:
            _collect(rec)
            print(line, flush=True)


def bench_headline():
    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.fri.oracle import _commit_fn

    num_polys, lg_n, rate_bits, cap_height = 135, 13, 3, 4
    n = 1 << lg_n
    rng = np.random.default_rng(0)
    coeffs = GF.from_u64(rng.integers(0, ORDER, size=(num_polys, n),
                                      dtype=np.uint64))
    salt = GF.zeros((0, n << rate_bits))
    # measures the prover's ACTUAL commit path per backend: on TPU the fused
    # device program ends in the Merkle layers (round-1 comparable); on the
    # CPU fallback the device program stops at the leaves and the layers
    # build through the native C batch hashers — compiling the 2^16-leaf
    # XLA:CPU tree program instead takes >18 min and would hang the driver
    from plonky2_tpu.hash.merkle import MerkleTree

    fn = _commit_fn(num_polys, lg_n, rate_bits, cap_height, 0)

    def commit_full(i):
        c = GF(coeffs.lo ^ np.uint32(i + 1), coeffs.hi)
        leaves, layers = fn(c, salt)
        return MerkleTree(leaves, cap_height, layers=layers).cap_u64()

    dt = _bench(commit_full)
    total_elems = num_polys * (n << rate_bits)
    # 8.0e6 el/s is an ESTIMATE of the reference CPU commit rate (no measured
    # Rust run exists on this box) — reported as vs_estimate, not vs_baseline
    emit("poly_batch_commit_135x2^13_rate8", total_elems / dt,
         "lde_elements_per_s", estimate=8.0e6)


def bench_fibonacci_prove():
    from tests.golden_common import build_fib100

    t0 = time.perf_counter()
    data, proof = build_fib100()
    t_total = time.perf_counter() - t0
    t0 = time.perf_counter()
    from plonky2_tpu.iop.witness import PartialWitness
    pw = PartialWitness()
    pw.set_target(data.prover_only.public_inputs[0], 0)
    pw.set_target(data.prover_only.public_inputs[1], 1)
    proof = data.prove(pw)
    t_prove = time.perf_counter() - t0
    data.verify(proof)
    emit("fibonacci_prove", 1.0 / t_prove, "proofs_per_s",
         build_plus_first_prove_s=round(t_total, 2),
         warm_prove_s=round(t_prove, 3))


def bench_recursion_chain():
    """bench_recursion analog: inner fib proof -> recursive wrap proof.
    Reference anchor: ~170 ms/recursive wrap (plonky2/README.md:5)."""
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.recursion.targets import (
        add_virtual_proof_with_pis, add_virtual_verifier_data,
        set_proof_with_pis_target, set_verifier_data_target,
    )
    from plonky2_tpu.recursion.verifier import verify_proof_circuit
    from tests.golden_common import build_fib100

    data, proof = build_fib100()
    config = CircuitConfig.standard_recursion_config()
    builder = CircuitBuilder(config)
    pt = add_virtual_proof_with_pis(builder, data.common)
    vt = add_virtual_verifier_data(builder, config.fri_config.cap_height)
    verify_proof_circuit(builder, pt, vt, data.common)
    t0 = time.perf_counter()
    outer = builder.build()
    t_build = time.perf_counter() - t0
    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, proof)
    set_verifier_data_target(pw, vt, data.verifier_only)
    outer_proof = outer.prove(pw)      # warm the compile cache
    t0 = time.perf_counter()
    outer_proof = outer.prove(pw)
    t_prove = time.perf_counter() - t0
    outer.verify(outer_proof)
    emit("recursion_chain", 1.0 / t_prove, "wraps_per_s", baseline=1 / 0.170,
         baseline_src="plonky2/README.md:5 (~170 ms/recursive wrap, "
                      "published reference measurement)",
         outer_build_s=round(t_build, 2), wrap_prove_s=round(t_prove, 3),
         outer_degree_bits=outer.common.degree_bits)


def bench_fri_open():
    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
    from plonky2_tpu.fri.oracle import PolynomialBatch
    from plonky2_tpu.fri.structure import (
        FriBatchInfo, FriInstanceInfo, FriOracleInfo, FriPolynomialInfo,
    )
    from plonky2_tpu.iop.challenger import Challenger

    lg_n, num_polys = 18, 16
    cfg = FriConfig(rate_bits=3, cap_height=4, proof_of_work_bits=16,
                    reduction_strategy=FriReductionStrategy(
                        kind="constant_arity", arity_bits=4,
                        final_poly_bits=5),
                    num_query_rounds=28)
    params = cfg.fri_params(lg_n, False)
    rng = np.random.default_rng(3)
    values = GF.from_u64(rng.integers(
        0, ORDER, size=(num_polys, 1 << lg_n), dtype=np.uint64))

    t0 = time.perf_counter()
    batch = PolynomialBatch.from_values(values, cfg.rate_bits, False,
                                        cfg.cap_height)
    batch.merkle_tree.leaves_host()
    t_commit = time.perf_counter() - t0
    # emit the commit half immediately: if the open half hits the step cap,
    # the driver still records a number for this config (VERDICT r5 item 3)
    emit("fri_commit_2^18x16", 1.0 / t_commit, "commits_per_s",
         commit_s=round(t_commit, 3), blowup=8, polys=num_polys)

    instance = FriInstanceInfo(
        oracles=(FriOracleInfo(num_polys=num_polys, blinding=False),),
        batches=(FriBatchInfo(
            point=(12345, 678),
            polynomials=tuple(FriPolynomialInfo.from_range(0, 0, num_polys))),
        ))
    ch = Challenger()
    ch.observe_cap(batch.merkle_tree.cap_digests())
    t0 = time.perf_counter()
    PolynomialBatch.prove_openings(instance, [batch], ch, params)
    t_open = time.perf_counter() - t0
    emit("fri_commit_open_2^18", 1.0 / (t_commit + t_open), "proofs_per_s",
         commit_s=round(t_commit, 3), open_s=round(t_open, 3),
         queries=28, blowup=8, polys=num_polys)


def bench_merkle():
    import jax
    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.hash.merkle import build_tree_layers

    rng = np.random.default_rng(2)
    lg_n, leaf_size, cap_height = 20, 8, 4
    n = 1 << lg_n
    leaves = GF.from_u64(
        rng.integers(0, ORDER, size=(n, leaf_size), dtype=np.uint64))
    fn = lambda lv: build_tree_layers(lv, cap_height)
    dt = _bench(lambda i: fn(GF(leaves.lo ^ np.uint32(i + 1),
                                leaves.hi))[-1].lo)
    hashes = n + (n - (1 << cap_height))   # leaf hashes + compressions
    emit("merkle_2^20x8", n / dt, "leaves_per_s",
         permutations_per_s=round(hashes / dt, 1))


def bench_merkle_wide():
    """The prover's real leaf shape: 135 field elements per leaf (two sponge
    blocks + 17 absorb rounds), reference plonky2/benches/merkle.rs:13-27."""
    import jax
    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.hash.merkle import build_tree_layers

    rng = np.random.default_rng(5)
    lg_n, leaf_size, cap_height = 13, 135, 4
    n = 1 << lg_n
    leaves = GF.from_u64(
        rng.integers(0, ORDER, size=(n, leaf_size), dtype=np.uint64))
    fn = lambda lv: build_tree_layers(lv, cap_height)
    dt = _bench(lambda i: fn(GF(leaves.lo ^ np.uint32(i + 1),
                                leaves.hi))[-1].lo)
    # 17 sponge permutations per leaf + 1 per compression
    perms = n * ((leaf_size + 7) // 8) + (n - (1 << cap_height))
    emit("merkle_2^13x135", n / dt, "leaves_per_s",
         permutations_per_s=round(perms / dt, 1))


def _batched_coeffs(num_polys, lg_n, seed):
    from plonky2_tpu.field.goldilocks import GF
    rng = np.random.default_rng(seed)
    return GF.from_u64(rng.integers(
        0, ORDER, size=(num_polys, 1 << lg_n), dtype=np.uint64))


MXU_INT8_MACS = 394e12 / 2   # v5e peak: 394 TOPS int8 = 197e12 MAC/s


def _mxu_macs(lg_out: int, rate_bits: int, batch: int) -> int:
    """Exact MAC count of the int8 limb-matmul NTT at this shape: stage s is
    a [batch*N/R_s, 9*K_s] x [9*K_s, 17*R_s] int8 matmul, so
    MACs = 153 * batch * N * sum_s K_s (the governing MXU ceiling for the
    limb path — the roofline the VERDICT r4 audit asked for. The block-band
    zero half is COUNTED: it occupies MXU cycles even though only ~9/17 of
    each band column is nonzero)."""
    from plonky2_tpu.ops.ntt_mxu import _digits_for
    digits = _digits_for(lg_out, rate_bits)
    n = 1 << lg_out
    k_sum = ((1 << digits[0]) >> rate_bits) + sum(1 << d for d in digits[1:])
    return 153 * batch * n * k_sum


def bench_ntt_batch():
    """The prover's actual NTT shape: [135, 2^k] batched on the last axis."""
    from plonky2_tpu.ops import ntt

    for lg_n, iters in ((13, 20), (16, 10), (18, 5)):
        x = _batched_coeffs(135, lg_n, 4)
        dt = _bench_chained(ntt.fft, x, iters)
        n_total = 135 * (1 << lg_n)
        gbps = n_total * 32 / dt   # >= 1 read + 1 write of 16 B/elem
        macs = _mxu_macs(lg_n, 0, 135)
        emit(f"ntt_batch_135x2^{lg_n}", n_total / dt, "elements_per_s",
             achieved_gbps_lower_bound=round(gbps / 1e9, 1),
             hbm_roofline_frac=round(gbps / HBM_GBPS, 3),
             mxu_util_frac=round(macs / dt / MXU_INT8_MACS, 3))


def bench_lde_batch():
    from plonky2_tpu.ops import ntt

    for lg_n, iters in ((13, 20), (16, 10), (18, 5)):
        x = _batched_coeffs(135, lg_n, 6)
        dt = _bench_chained(lambda c: ntt.coset_lde(c, 3), x, iters)
        n_out = 135 * (1 << (lg_n + 3))
        gbps = n_out * 32 / dt
        macs = _mxu_macs(lg_n + 3, 3, 135)
        emit(f"lde_batch_135x2^{lg_n}_rate8", n_out / dt,
             "lde_elements_per_s",
             achieved_gbps_lower_bound=round(gbps / 1e9, 1),
             hbm_roofline_frac=round(gbps / HBM_GBPS, 3),
             mxu_util_frac=round(macs / dt / MXU_INT8_MACS, 3))


def bench_ntt_sweep():
    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.ops import ntt

    rng = np.random.default_rng(0)
    for lg_n, iters in ((16, 20), (20, 10), (24, 5)):
        n = 1 << lg_n
        x = GF.from_u64(rng.integers(0, ORDER, size=(n,), dtype=np.uint64))
        dt = _bench_chained(ntt.fft, x, iters)
        gbps = n * 32 / dt
        emit(f"ntt_2^{lg_n}", n / dt, "elements_per_s",
             achieved_gbps_lower_bound=round(gbps / 1e9, 1),
             hbm_roofline_frac=round(gbps / HBM_GBPS, 3))


def bench_lde():
    from plonky2_tpu.field.goldilocks import GF
    from plonky2_tpu.ops import ntt

    rng = np.random.default_rng(1)
    for lg_n, iters in ((18, 10), (21, 5)):
        n = 1 << lg_n
        x = GF.from_u64(rng.integers(0, ORDER, size=(n,), dtype=np.uint64))
        dt = _bench_chained(lambda c: ntt.coset_lde(c, 3), x, iters)
        N = n << 3
        emit(f"lde_2^{lg_n}_rate8", N / dt, "lde_elements_per_s")


def bench_batch_prove():
    """Cross-proof batching (no reference analog): B fib proofs through the
    vmapped device phases vs B serial proves — the proving-service
    throughput axis."""
    from tests.golden_common import build_fib100

    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.batch_prover import prove_batch

    data, _ = build_fib100()

    def inputs(a, b):
        pw = PartialWitness()
        pw.set_target(data.prover_only.public_inputs[0], a)
        pw.set_target(data.prover_only.public_inputs[1], b)
        return pw

    B = int(os.environ.get("PLONKY2_TPU_BENCH_BATCH", "8"))
    prove_batch(data.prover_only, data.common, [inputs(0, 1)])  # warm B=1
    t0 = time.perf_counter()
    prove_batch(data.prover_only, data.common, [inputs(1, 1)])
    t1 = time.perf_counter() - t0
    batch_in = [inputs(i, i + 1) for i in range(B)]
    prove_batch(data.prover_only, data.common, batch_in)        # warm B=B
    t0 = time.perf_counter()
    proofs = prove_batch(data.prover_only, data.common, batch_in)
    tB = time.perf_counter() - t0
    data.verify(proofs[-1])
    emit("batch_prove_fib", B / tB, "proofs_per_s",
         vs_single_prove=round((B / tB) * t1, 3),
         batch_size=B, batch_s=round(tB, 3), single_s=round(t1, 3))


# (step fn, per-step wall-clock cap in seconds) — most important first.
STEPS = [
    (bench_headline, 1200),
    (bench_fibonacci_prove, 1200),   # measured cold: 835 s on a fresh box
    (bench_recursion_chain, 2400),
    (bench_fri_open, 1500),          # cold commit half alone measured 758 s
    (bench_merkle, 900),
    (bench_merkle_wide, 600),
    (bench_lde_batch, 600),
    (bench_ntt_batch, 600),
    (bench_ntt_sweep, 420),
    (bench_lde, 300),
    (bench_batch_prove, 900),
]


def _run_step_inproc(name):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    platform = _pin_platform()
    step = dict((f.__name__, f) for f, _ in STEPS)[name]
    try:
        step()
    except Exception as e:  # noqa: BLE001 — emit and continue
        print(json.dumps({"metric": name, "error": str(e)[:200]}),
              flush=True)


def main():
    if len(sys.argv) == 3 and sys.argv[1] == "--step":
        return _run_step_inproc(sys.argv[2])

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    inproc = os.environ.get("PLONKY2_TPU_BENCH_INPROC")
    if inproc:
        platform = _pin_platform()
        print(json.dumps({"metric": "bench_platform", "value":
                          ("cpu" if platform == "cpu" else "tpu")}),
              flush=True)

    # soft wall-clock budget: steps are ordered by importance; once the
    # budget is spent, the remaining steps report skipped instead of running
    budget = float(os.environ.get("PLONKY2_TPU_BENCH_BUDGET_S", "3000"))
    only = os.environ.get("PLONKY2_TPU_BENCH_ONLY")
    steps = STEPS
    if only:   # comma-separated step names, e.g. "bench_recursion_chain"
        names = {s.strip() for s in only.split(",")}
        steps = [(f, c) for f, c in STEPS if f.__name__ in names]

    if not inproc:
        # one probe up front so every child inherits the platform choice
        try:
            subprocess.run(
                [sys.executable, "-c",
                 "import jax; assert jax.devices()[0].platform == 'tpu'"],
                timeout=120, check=True, capture_output=True)
            os.environ.setdefault("PLONKY2_TPU_BENCH_PLATFORM", "")
            print(json.dumps({"metric": "bench_platform", "value": "tpu"}),
                  flush=True)
        except Exception:
            os.environ.setdefault("PLONKY2_TPU_BENCH_PLATFORM", "cpu")
            print(json.dumps({"metric": "bench_platform", "value": "cpu"}),
                  flush=True)

    t_start = time.perf_counter()
    for step, cap in steps:
        name = step.__name__
        elapsed = time.perf_counter() - t_start
        if elapsed > budget:
            rec = {"metric": name, "skipped": "bench time budget exhausted"}
            _collect(rec)
            print(json.dumps(rec), flush=True)
            continue
        cap = min(cap, max(60.0, budget - elapsed + 120))
        if inproc:
            try:
                step()
            except Exception as e:  # noqa: BLE001
                rec = {"metric": name, "error": str(e)[:200]}
                _collect(rec)
                print(json.dumps(rec), flush=True)
            continue
        # Children run with captured pipes: their metric lines are forwarded
        # to stdout AND collected for the end-of-run summary; their stderr
        # (XLA log spam) is dropped so it cannot drown the metric lines out
        # of a tail-limited capture window (the round-3 failure mode).
        try:
            res = subprocess.run([sys.executable, os.path.abspath(__file__),
                                  "--step", name],
                                 timeout=cap, env=os.environ.copy(),
                                 capture_output=True, text=True)
            _collect_lines(res.stdout)
        except subprocess.TimeoutExpired as e:
            out = e.stdout
            if isinstance(out, bytes):
                out = out.decode(errors="replace")
            _collect_lines(out or "")
            rec = {"metric": name, "skipped": f"step cap {int(cap)}s exceeded"}
            _collect(rec)
            print(json.dumps(rec), flush=True)
        except Exception as e:  # noqa: BLE001
            rec = {"metric": name, "error": str(e)[:200]}
            _collect(rec)
            print(json.dumps(rec), flush=True)

    # Re-emit everything, LEAST important first, so the final lines of the
    # run (what a tail-window capture keeps, and what "last JSON line"
    # parsing picks up) are the headline metrics.
    seen = set()
    ordered = []
    for rec in _COLLECTED:
        key = json.dumps(rec, sort_keys=True)
        if key not in seen:
            seen.add(key)
            ordered.append(rec)
    for rec in reversed(ordered):
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    sys.exit(main())
