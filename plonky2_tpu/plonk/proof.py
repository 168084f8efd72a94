"""PLONK proof containers (twin of reference plonk/proof.rs:28-307)."""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..fri.proof import FriChallenges, FriProof
from ..fri.structure import FriOpeningBatch, FriOpenings
from ..hash.merkle import MerkleCap


@dataclass
class OpeningSet:
    """Claimed evaluations at zeta (and g*zeta for the Zs); all (k, 2) ext."""

    constants: np.ndarray
    plonk_sigmas: np.ndarray
    wires: np.ndarray
    plonk_zs: np.ndarray
    plonk_zs_next: np.ndarray
    partial_products: np.ndarray
    quotient_polys: np.ndarray

    def to_fri_openings(self) -> FriOpenings:
        """Batch order (proof.rs:345): constants ++ sigmas ++ wires ++ zs ++
        partial_products ++ quotient at zeta; zs at g*zeta."""
        zeta_batch = FriOpeningBatch(values=np.concatenate([
            self.constants, self.plonk_sigmas, self.wires, self.plonk_zs,
            self.partial_products, self.quotient_polys,
        ]))
        zeta_next_batch = FriOpeningBatch(values=self.plonk_zs_next)
        return FriOpenings(batches=[zeta_batch, zeta_next_batch])


@dataclass
class Proof:
    wires_cap: MerkleCap
    plonk_zs_partial_products_cap: MerkleCap
    quotient_polys_cap: MerkleCap
    openings: OpeningSet
    opening_proof: FriProof


@dataclass
class ProofWithPublicInputs:
    proof: Proof
    public_inputs: np.ndarray  # (num_pis,) u64


@dataclass
class ProofChallenges:
    plonk_betas: np.ndarray
    plonk_gammas: np.ndarray
    plonk_alphas: np.ndarray
    plonk_zeta: np.ndarray  # (2,)
    fri_challenges: FriChallenges
