"""Freeze the golden transcripts: full Fiat-Shamir challenge sequence +
proof bytes for (a) the fib(100) standard-config circuit, (b) fib(21) under
each alternative GenericConfig, (c) the recursive wrap of the fib(100)
proof — a second circuit SHAPE (reference intent: plonk/get_challenges.rs:
25-106 — any change to kernels/hashing that breaks transcript parity must
fail loudly; widened per VERDICT r2 item 8).

Run from repo root: python scripts/freeze_golden_transcript.py [--wrap]
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tests.golden_common import (  # noqa: E402
    build_fib100, build_fib100_wrap, build_fib21_config, extract_transcript,
)

GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden")


def freeze(name, data, proof):
    record = extract_transcript(data, proof)
    out = os.path.join(GOLDEN_DIR, name)
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print("wrote", out, "proof bytes:", len(record["proof_hex"]) // 2,
          flush=True)


data, proof = build_fib100()
freeze("fib100_transcript.json", data, proof)

for gc in ("Poseidon2GoldilocksConfig", "KeccakGoldilocksConfig",
           "PoseidonBN128GoldilocksConfig"):
    d, p = build_fib21_config(gc)
    freeze(f"fib21_{gc}_transcript.json", d, p)

if "--wrap" in sys.argv:
    outer, op = build_fib100_wrap(data, proof)
    freeze("fib100_wrap_transcript.json", outer, op)
