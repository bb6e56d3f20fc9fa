"""Golden transcript replay: the committed fib(100) challenge sequence and
proof bytes must reproduce exactly — any kernel/hashing change that breaks
Fiat-Shamir parity fails here loudly (VERDICT r1 item 10; reference:
plonk/get_challenges.rs:25-106, util/serialization/mod.rs)."""

import json
import os

import pytest

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


@pytest.mark.parametrize("gc", [
    "Poseidon2GoldilocksConfig", "KeccakGoldilocksConfig",
    "PoseidonBN128GoldilocksConfig",
])
def test_fib21_config_transcripts_match_golden(gc):
    """One golden fixture per alternative hasher configuration: pins the
    whole Fiat-Shamir sequence and proof bytes under Poseidon2 / Keccak /
    PoseidonBN128 (VERDICT r2 item 8)."""
    from tests.golden_common import build_fib21_config
    path = os.path.join(os.path.dirname(__file__), "golden",
                        f"fib21_{gc}_transcript.json")
    with open(path) as f:
        want = json.load(f)
    data, proof = build_fib21_config(gc)
    got = extract_transcript(data, proof)
    for key in want:
        assert got[key] == want[key], f"[{gc}] field {key!r} diverged"


@pytest.mark.slow
@pytest.mark.skipif(
    "PLONKY2_TPU_HEAVY" not in os.environ,
    reason="recursive wrap build+prove is minutes-scale on this box")
def test_fib100_wrap_transcript_matches_golden(fib_data_and_proof):
    """Second circuit SHAPE: the recursive-wrap transcript (exercises the
    recursive-verifier gate set the plain fib circuit never touches)."""
    from tests.golden_common import build_fib100_wrap
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "fib100_wrap_transcript.json")
    with open(path) as f:
        want = json.load(f)
    data, proof = fib_data_and_proof
    outer, op = build_fib100_wrap(data, proof)
    got = extract_transcript(outer, op)
    for key in want:
        assert got[key] == want[key], f"[wrap] field {key!r} diverged"
