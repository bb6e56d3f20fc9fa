"""STARK proof containers (reference: starky/src/proof.rs:30-260)."""

from __future__ import annotations

import dataclasses

from ..fri.proof import FriProof
from ..fri.structure import FriOpeningBatch, FriOpenings

E = tuple[int, int]


@dataclasses.dataclass
class StarkOpeningSet:
    local_values: list[E]
    next_values: list[E]
    quotient_polys: list[E]

    def to_fri_openings(self) -> FriOpenings:
        zeta_batch = FriOpeningBatch(
            values=tuple(self.local_values + self.quotient_polys))
        zeta_next_batch = FriOpeningBatch(values=tuple(self.next_values))
        return FriOpenings(batches=(zeta_batch, zeta_next_batch))


@dataclasses.dataclass
class StarkProof:
    trace_cap: list
    quotient_polys_cap: list
    openings: StarkOpeningSet
    opening_proof: FriProof


@dataclasses.dataclass
class StarkProofWithPublicInputs:
    proof: StarkProof
    public_inputs: list[int]
