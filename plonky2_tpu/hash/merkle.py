"""Merkle tree with cap, built level-by-level with batched Poseidon.

TPU twin of reference plonky2/src/hash/merkle_tree.rs:18-173.  The reference
builds subtrees with a recursive rayon task tree into uninitialised buffers;
on TPU the natural shape is breadth-first: one batched `hash_or_noop` over
all leaves, then log2(n) - cap_height batched 2-to-1 compressions.  Digest
*values* (and therefore proofs and caps) are identical to the reference's.

The tree keeps every level on host (numpy) for cheap query-phase proof
extraction; level arrays are tiny compared to the leaves.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field.goldilocks import GF
from ..utils.bits import log2_strict
from .hashing import compress, compress_np, hash_or_noop, hash_or_noop_np


@dataclass
class MerkleCap:
    """The 2^cap_height roots (reference merkle_tree.rs:18)."""

    data: np.ndarray  # (2^cap_height, 4) u64

    def flatten(self) -> np.ndarray:
        return self.data.reshape(-1)

    @property
    def cap_height(self) -> int:
        return log2_strict(self.data.shape[0])

    def __eq__(self, other) -> bool:
        return isinstance(other, MerkleCap) and np.array_equal(self.data, other.data)


@dataclass
class MerkleProof:
    siblings: np.ndarray  # (depth, 4) u64


class MerkleTree:
    """leaves: GF (n, leaf_len) on device; n a power of two."""

    def __init__(self, leaves: GF, cap_height: int, leaves_np: np.ndarray | None = None):
        n = leaves.shape[0]
        bits = log2_strict(n)
        assert cap_height <= bits
        self.cap_height = cap_height
        self.leaf_len = leaves.shape[1]
        # level 0: leaf digests; level k: 2^(bits-k) digests
        digests = hash_or_noop(leaves)
        levels = [np.asarray(digests.to_u64())]
        cur = digests
        for _ in range(bits - cap_height):
            cur = compress(cur[0::2, :], cur[1::2, :])
            levels.append(np.asarray(cur.to_u64()))
        self.levels = levels
        self.cap = MerkleCap(levels[-1])
        # Host copy of leaves for query-phase opening extraction.
        self.leaves_np = leaves_np if leaves_np is not None else leaves.to_u64()

    def prove(self, leaf_index: int) -> MerkleProof:
        """Sibling path from leaf to cap (reference merkle_tree.rs:173)."""
        depth = len(self.levels) - 1
        sibs = np.empty((depth, 4), dtype=np.uint64)
        idx = leaf_index
        for lvl in range(depth):
            sibs[lvl] = self.levels[lvl][idx ^ 1]
            idx >>= 1
        return MerkleProof(sibs)

    def get_leaf(self, leaf_index: int) -> np.ndarray:
        return self.leaves_np[leaf_index]


def verify_merkle_proof_to_cap(
    leaf_data: np.ndarray, leaf_index: int, cap: MerkleCap, proof: MerkleProof
) -> bool:
    """Host verification (reference hash/merkle_proofs.rs:54)."""
    current = hash_or_noop_np(np.asarray(leaf_data, dtype=np.uint64))
    idx = leaf_index
    for sib in proof.siblings:
        if idx & 1:
            current = compress_np(sib, current)
        else:
            current = compress_np(current, sib)
        idx >>= 1
    return bool(np.array_equal(current, cap.data[idx]))
