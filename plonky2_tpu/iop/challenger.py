"""Fiat-Shamir challenger — duplex sponge over Poseidon, host-side python ints.

Bit-exact replica of the reference transcript semantics
(reference: plonky2/src/iop/challenger.rs — observe buffers inputs and
duplexes when RATE inputs accumulate (:41-49); get_challenge duplexes if
inputs are pending or outputs exhausted and POPS FROM THE END of the squeezed
output buffer (:85-95); duplexing overwrites state[0:len(inputs)] (:128-145)).

The challenger is O(1) work per prover round, so it runs on the host between
device phases; `compact()`/sponge_state expose the state for the vectorized
proof-of-work grind.
"""

from __future__ import annotations

from ..field import reference as ref
from ..hash.poseidon import (
    SPONGE_RATE, SPONGE_WIDTH, NUM_HASH_OUT_ELTS, poseidon_oracle,
)


class Challenger:
    """Generic over the config's Hasher permutation
    (reference: prover.rs:178 `Challenger::<F, C::Hasher>`); defaults to
    Poseidon. Pass a Hasher (hash/hashers.py) for other configs."""

    def __init__(self, hasher=None):
        self.hasher = hasher
        self._permute = (poseidon_oracle if hasher is None
                         else hasher.permute_oracle)
        self.sponge_state: list[int] = [0] * SPONGE_WIDTH
        self.input_buffer: list[int] = []
        self.output_buffer: list[int] = []

    def observe_element(self, x: int) -> None:
        self.output_buffer.clear()
        self.input_buffer.append(x % ref.ORDER)
        if len(self.input_buffer) == SPONGE_RATE:
            self._duplexing()

    def observe_elements(self, xs) -> None:
        for x in xs:
            self.observe_element(int(x))

    def observe_extension_element(self, x) -> None:
        self.observe_elements(x)  # (c0, c1) basefield array order

    def observe_extension_elements(self, xs) -> None:
        for x in xs:
            self.observe_extension_element(x)

    def observe_hash(self, h) -> None:
        """Observe a digest as its field-element decomposition
        (GenericHashOut::to_vec — HashOut: the 4 elements; BytesHash:
        7-byte LE chunks, reference: hash_types.rs:109,182-192)."""
        if isinstance(h, (bytes, bytearray)):
            from ..hash.hashers import digest_to_elements
            self.observe_elements(digest_to_elements(h))
        else:
            self.observe_elements(h)

    def observe_cap(self, cap) -> None:
        """cap: iterable of digests (4-element rows or byte digests)."""
        for h in cap:
            self.observe_hash(h)

    def get_challenge(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplexing()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> list[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_hash(self) -> list[int]:
        return self.get_n_challenges(NUM_HASH_OUT_ELTS)

    def get_extension_challenge(self) -> tuple[int, int]:
        c = self.get_n_challenges(2)
        return (c[0], c[1])

    def get_n_extension_challenges(self, n: int) -> list[tuple[int, int]]:
        return [self.get_extension_challenge() for _ in range(n)]

    def _duplexing(self) -> None:
        assert len(self.input_buffer) <= SPONGE_RATE
        for i, x in enumerate(self.input_buffer):
            self.sponge_state[i] = x
        self.input_buffer.clear()
        self.sponge_state = self._permute(self.sponge_state)
        self.output_buffer = list(self.sponge_state[:SPONGE_RATE])

    def compact(self) -> list[int]:
        """Flush pending inputs and return the sponge state
        (reference: challenger.rs:147-153)."""
        if self.input_buffer:
            self._duplexing()
        self.output_buffer.clear()
        return list(self.sponge_state)
