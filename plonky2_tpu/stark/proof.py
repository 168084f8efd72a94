"""STARK proof containers (twin of reference starky/src/proof.rs:24-183)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..fri.proof import FriChallenges, FriProof
from ..fri.structure import FriOpeningBatch, FriOpenings
from ..hash.merkle import MerkleCap


@dataclass
class StarkOpeningSet:
    local_values: np.ndarray   # (COLUMNS, 2)
    next_values: np.ndarray    # (COLUMNS, 2)
    quotient_polys: np.ndarray

    def to_fri_openings(self) -> FriOpenings:
        return FriOpenings(batches=[
            FriOpeningBatch(values=np.concatenate(
                [self.local_values, self.quotient_polys])),
            FriOpeningBatch(values=self.next_values),
        ])


@dataclass
class StarkProof:
    trace_cap: MerkleCap
    quotient_polys_cap: MerkleCap
    openings: StarkOpeningSet
    opening_proof: FriProof


@dataclass
class StarkProofWithPublicInputs:
    proof: StarkProof
    public_inputs: np.ndarray


@dataclass
class StarkProofChallenges:
    stark_alphas: np.ndarray
    stark_zeta: np.ndarray
    fri_challenges: FriChallenges
