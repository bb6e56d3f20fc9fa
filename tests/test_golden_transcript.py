"""Golden transcript replay: the committed fib(100) challenge sequence and
proof bytes must reproduce exactly — any kernel/hashing change that breaks
Fiat-Shamir parity fails here loudly (VERDICT r1 item 10; reference:
plonk/get_challenges.rs:25-106, util/serialization/mod.rs)."""

import json
import os

from tests.golden_common import extract_transcript

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "fib100_transcript.json")


def test_fib100_transcript_matches_golden(fib_data_and_proof):
    data, proof = fib_data_and_proof
    with open(GOLDEN) as f:
        want = json.load(f)
    got = extract_transcript(data, proof)
    for key in want:
        assert got[key] == want[key], f"transcript field {key!r} diverged"
