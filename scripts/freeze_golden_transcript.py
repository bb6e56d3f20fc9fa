"""Freeze the fib(100) golden transcript: full Fiat-Shamir challenge sequence
+ proof bytes (reference intent: plonk/get_challenges.rs:25-106 — any change
to kernels/hashing that breaks transcript parity must fail loudly).

Run from repo root: python scripts/freeze_golden_transcript.py
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

from tests.golden_common import build_fib100, extract_transcript  # noqa: E402

data, proof = build_fib100()
record = extract_transcript(data, proof)
out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "fib100_transcript.json")
with open(out, "w") as f:
    json.dump(record, f, indent=1)
print("wrote", out, "proof bytes:", len(record["proof_hex"]) // 2)
