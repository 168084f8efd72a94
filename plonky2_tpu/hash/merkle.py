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


_OPEN_FN_CACHE: dict = {}


def _open_all_fn(depth: int):
    """Jitted whole-path gather: (leaves, levels[0..depth), idx) ->
    (leaf rows, (depth, q, 4) sibling rows).  jax.jit's own dispatch
    cache handles the per-shape specialization."""
    import jax

    fn = _OPEN_FN_CACHE.get(depth)
    if fn is None:
        def run(leaves: GF, levels: tuple, ii):
            lv = leaves.take(ii, axis=0)
            sibs = GF.stack([levels[d].take((ii >> d) ^ 1, axis=0)
                             for d in range(depth)], axis=0)
            return lv, sibs

        if jax.default_backend() != "cpu":
            run = jax.jit(run)
        _OPEN_FN_CACHE[depth] = fn = run
    return fn


def _gather_rows_np(x: GF, idx: np.ndarray) -> np.ndarray:
    """Device row gather -> canonical host u64 rows (only the selected
    rows cross the host link — at the flagship 2^20 shapes pulling a
    full digest level costs ~67 MB over the tunnel; 84 query rows cost
    ~3 KB)."""
    import jax

    @jax.jit
    def g(lo, hi, i):
        return lo[i], hi[i]

    import jax.numpy as jnp
    lo, hi = g(x.lo, x.hi, jnp.asarray(np.asarray(idx), jnp.int32))
    from ..field import gl64
    raw = (np.asarray(lo, np.uint64)
           | (np.asarray(hi, np.uint64) << np.uint64(32)))
    return gl64.to_canonical(raw)


class MerkleTree:
    """leaves: GF (n, leaf_len) on device; n a power of two.

    Digest levels and leaves stay ON DEVICE; only the cap is pulled
    eagerly.  `levels` / `leaves_np` are lazy host views (first access
    pulls), kept assignable for deserialized / hand-assembled trees
    (utils/serialization.read_merkle_tree, parallel/groups.py).  The
    query phase should use the batched `open()` — it gathers just the
    requested rows of each level."""

    def __init__(self, leaves: GF, cap_height: int, leaves_np: np.ndarray | None = None):
        n = leaves.shape[0]
        bits = log2_strict(n)
        assert cap_height <= bits
        self.cap_height = cap_height
        self.leaf_len = leaves.shape[1]
        # level 0: leaf digests; level k: 2^(bits-k) digests
        digests = hash_or_noop(leaves)
        dev_levels = [digests]
        cur = digests
        for _ in range(bits - cap_height):
            cur = compress(cur[0::2, :], cur[1::2, :])
            dev_levels.append(cur)
        self._dev_leaves = leaves
        self._dev_levels = dev_levels
        self._levels_np = None
        self._leaves_np = leaves_np
        self.cap = MerkleCap(np.asarray(dev_levels[-1].to_u64()))

    # -- lazy host views (assignable: deserialized trees set them) ------
    @property
    def levels(self) -> list:
        if getattr(self, "_levels_np", None) is None:
            self._levels_np = [np.asarray(l.to_u64())
                               for l in self._dev_levels]
        return self._levels_np

    @levels.setter
    def levels(self, v):
        self._levels_np = list(v)
        self._dev_levels = None

    @property
    def leaves_np(self) -> np.ndarray:
        if getattr(self, "_leaves_np", None) is None:
            self._leaves_np = self._dev_leaves.to_u64()
        return self._leaves_np

    @leaves_np.setter
    def leaves_np(self, v):
        self._leaves_np = v

    def open(self, indices: np.ndarray):
        """(q,) leaf indices -> (leaves (q, leaf_len), sibs (q, depth, 4)),
        one gather per level (fri/prover.py batched query extraction)."""
        idx = np.asarray(indices, np.int64)
        if getattr(self, "_levels_np", None) is not None \
                or getattr(self, "_dev_levels", None) is None:
            leaves = np.asarray(self.leaves_np)[idx]
            depth = len(self.levels) - 1
            sibs = np.empty((idx.size, depth, 4), np.uint64)
            for lvl in range(depth):
                sibs[:, lvl] = self.levels[lvl][(idx >> lvl) ^ 1]
            return leaves, sibs
        # ONE fused device gather over every level + two fetches — a
        # per-level gather costs a tunnel round-trip each (~100 ms x
        # ~13 levels x ~8 trees dominated the 2^16 FRI query phase)
        import jax.numpy as jnp
        depth = len(self._dev_levels) - 1
        lv, sibs_gf = _open_all_fn(depth)(
            self._dev_leaves, tuple(self._dev_levels[:depth]),
            jnp.asarray(idx, jnp.int32))
        leaves = np.asarray(lv.to_u64())
        # (depth, q, 4) -> (q, depth, 4)
        sibs = np.asarray(sibs_gf.to_u64()).transpose(1, 0, 2)
        return leaves, np.ascontiguousarray(sibs)

    def prove(self, leaf_index: int) -> MerkleProof:
        """Sibling path from leaf to cap (reference merkle_tree.rs:173)."""
        _, sibs = self.open(np.array([leaf_index]))
        return MerkleProof(sibs[0])

    def get_leaf(self, leaf_index: int) -> np.ndarray:
        if getattr(self, "_leaves_np", None) is not None \
                or getattr(self, "_dev_leaves", None) is None:
            return np.asarray(self.leaves_np)[leaf_index]
        return _gather_rows_np(self._dev_leaves,
                               np.array([leaf_index]))[0]


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
