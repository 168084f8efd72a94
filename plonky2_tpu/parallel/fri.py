"""Sharded FRI commit phase: the β-folds and per-round Merkle commits
distributed over the device mesh.

TPU redesign of reference fri/prover.rs:69-113.  The reference folds in
COEFFICIENT space (strided β-reduction, then a fresh coset FFT per round);
that formulation needs a global transpose-like resharding every round.
Here the fold runs in the VALUE domain on bit-reversed-ordered rows, where
it is purely LOCAL:

  * in BR order, the arity-2^a fold coset of a value sits in the same
    contiguous 2^a-row chunk that becomes its Merkle leaf (that is why the
    reference flattens BR-adjacent chunks into leaves, oracle.rs:81-100);
  * an arity-2^a β-fold equals a radix-2 value folds with β^(2^j):
      fold_j(v)[m] = (v[2m] + v[2m+1])/2 + β_j * (v[2m] - v[2m+1])/(2 x_m)
    with x_m = shift * w^rev(m) the subgroup point of BR pair m — adjacent
    rows, so each device folds its block with zero communication;
  * the folded layer lands already in BR contiguous order, sharded exactly
    like its parent: NO resharding between rounds.

Communication per round: one all_gather of the (tiny) Merkle cap.  The
host-side challenger interleaves between per-round pjit steps exactly as in
the single-chip path, so caps, βs, and the final polynomial are bit-identical
to fri/prover.py fri_committed_trees (tests/test_sharded_fri.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as PSpec

from ..field import gl64
from ..field.extension import GF2
from ..field.goldilocks import GF
from ..hash.hashing import compress, hash_or_noop
from ..hash.merkle import MerkleCap, MerkleTree
from ..iop.challenger import Challenger
from ..utils.bits import log2_strict, reverse_index_bits_perm
from .mesh import shard_map

P = gl64.ORDER_INT


def _fold_tables(log_n: int, shift: int, arity_bits: int):
    """Per-stage 1/(2 x_m) tables for the radix-2 value folds of one round.

    Stage j folds a layer of size 2^(log_n - j) with coset shift^(2^j);
    x_m = shift_j * w_j^rev(m), so inv2x[m] = (2 x_m)^-1 =
    inv(2 shift_j) * w_j^-rev(m) — one vectorised powers() + a bit-reversal
    gather, no per-row host loop."""
    tables = []
    s = shift % P
    for j in range(arity_bits):
        half = 1 << (log_n - j - 1)
        w = gl64.primitive_root_of_unity(log_n - j)
        w_inv = pow(w, P - 2, P)
        inv2s = pow(2 * s % P, P - 2, P)
        nat = gl64.mul(np.uint64(inv2s), gl64.powers(w_inv, half))
        tables.append(nat[reverse_index_bits_perm(half)])
        s = s * s % P
    return tables


# the leaf-flattening convention ([a0,b0,a1,b1,...]) must stay identical
# to the single-chip prover's for transcript equality — share one impl
from ..fri.prover import _flatten_ext_leaves


def _shard_vec(x: GF, mesh, axis: str) -> GF:
    sh = NamedSharding(mesh, PSpec(axis))
    return GF(jax.device_put(x.lo, sh), jax.device_put(x.hi, sh))


@partial(jax.jit, static_argnums=())
def _gather_rows_jit(lo, hi, idx):
    return lo[idx], hi[idx]


def _gather_rows(x: GF, idx: np.ndarray) -> np.ndarray:
    """Device-side row gather on a (row-)sharded array -> host u64 rows.
    XLA inserts the cross-device collective; the host receives only the
    opened rows, never the full array.  Canonicalised: proof bytes must
    not depend on which (value-equal) limb representative the device
    computation happened to leave behind."""
    lo, hi = _gather_rows_jit(x.lo, x.hi, jnp.asarray(idx, jnp.int32))
    raw = np.asarray(lo, np.uint64) | (np.asarray(hi, np.uint64) << np.uint64(32))
    return gl64.to_canonical(raw)


class ShardedMerkleTree:
    """Commit-phase Merkle tree whose leaves and lower digest levels stay
    sharded on the mesh (reference fri/prover.rs:160-216 reads openings out
    of host Vecs; here the codeword never leaves the devices — the host
    sees num_queries * depth digests, not 2^n rows).

    Drop-in for hash.merkle.MerkleTree in the query phase: same cap /
    cap_height / prove(i) / get_leaf(i) surface, plus a batched open()
    that fetches all query rows of every level with one gather each.
    """

    def __init__(self, cap_height: int, leaf_len: int, leaves: GF,
                 levels, top_levels_np, cap_np: np.ndarray):
        self.cap_height = cap_height
        self.leaf_len = leaf_len
        self._leaves = leaves          # GF (n, leaf_len), rows sharded
        self._levels = list(levels)    # [GF (n_l, 4) sharded], leaf digests up
        # host levels STRICTLY ABOVE the sharded ones (cap last, if any)
        self._top = list(top_levels_np)
        self.cap = MerkleCap(np.asarray(cap_np, np.uint64))
        # sibling path stops below the cap
        self.depth = len(self._levels) - 1 + len(self._top)
        self.num_leaves = leaves.shape[0]

    def open(self, indices: np.ndarray):
        """(q,) leaf indices -> (leaves (q, leaf_len), sibs (q, depth, 4))."""
        idx = np.asarray(indices, np.int64)
        leaves = _gather_rows(self._leaves, idx)
        depth = self.depth
        sibs = np.empty((idx.size, depth, 4), dtype=np.uint64)
        for lvl in range(depth):
            rows = (idx >> lvl) ^ 1
            nloc = len(self._levels)
            if lvl < nloc:
                sibs[:, lvl] = _gather_rows(self._levels[lvl], rows)
            else:
                sibs[:, lvl] = self._top[lvl - nloc][rows]
        return leaves, sibs

    # ---- single-index MerkleTree compatibility (tests, serialization)
    def prove(self, leaf_index: int):
        from ..hash.merkle import MerkleProof
        _, sibs = self.open(np.array([leaf_index]))
        return MerkleProof(sibs[0])

    def get_leaf(self, leaf_index: int) -> np.ndarray:
        return _gather_rows(self._leaves, np.array([leaf_index]))[0]


@lru_cache(maxsize=None)
def _fri_commit_fn(mesh, axis: str, arity: int, local_levels: int,
                   top_levels: int):
    """Memoized commit program (see stark_prover._commit_fn rationale:
    a fresh closure per round would re-pay tracing + SPMD lowering)."""

    @partial(shard_map, mesh=mesh, in_specs=(PSpec(axis),),
             out_specs=(PSpec(None, None), PSpec(axis, None),
                        tuple(PSpec(axis, None)
                              for _ in range(local_levels + 1))))
    def commit(v: GF2):
        leaves = _flatten_ext_leaves(v, arity)      # (rows/nd, 2*arity)
        digests = hash_or_noop(leaves)
        levels = [digests]
        cur = digests
        for _ in range(local_levels):
            cur = compress(cur[0::2, :], cur[1::2, :])
            levels.append(cur)
        roots = GF(jax.lax.all_gather(cur.lo, axis, axis=0, tiled=True),
                   jax.lax.all_gather(cur.hi, axis, axis=0, tiled=True))
        for _ in range(top_levels):
            roots = compress(roots[0::2, :], roots[1::2, :])
        return roots, leaves, tuple(levels)

    return jax.jit(commit)  # jit: persistent-cache the SPMD executable


@lru_cache(maxsize=None)
def _fri_fold_fn(mesh, axis: str, arity_bits: int):
    inv2 = pow(2, P - 2, P)

    @partial(shard_map, mesh=mesh,
             in_specs=(PSpec(axis), PSpec(None), PSpec(None))
             + tuple(PSpec(axis) for _ in range(arity_bits)),
             out_specs=PSpec(axis))
    def fold(v: GF2, ba: GF, bb: GF, *tab_blks):
        inv2_c = GF.full((), inv2)
        for j in range(arity_bits):
            even = v[0::2]
            odd = v[1::2]
            half_sum = GF2((even.a + odd.a) * inv2_c,
                           (even.b + odd.b) * inv2_c)
            diff = even - odd  # table already carries the 1/2: 1/(2x_m)
            beta = GF2(ba[j], bb[j])
            v = half_sum + diff * tab_blks[j] * beta
        return v

    return jax.jit(fold)


def sharded_fri_committed_trees(values: GF2, challenger: Challenger,
                                fri_params, mesh, axis: str = "d",
                                device_trees: bool = False):
    """Distributed commit phase, bit-identical to fri_committed_trees.

    values: (n,) extension values of the composition polynomial over the
    shifted LDE coset, NATURAL order (host or single-device).  Returns
    (trees, final_coeffs) exactly like the single-chip version.
    device_trees=False gathers full host MerkleTree objects;
    device_trees=True returns ShardedMerkleTrees whose leaves/levels stay
    on the mesh — query openings then move only the opened rows.
    """
    nd = mesh.devices.size
    n = values.shape[0]
    cap_height = fri_params.config.cap_height
    shift = gl64.MULTIPLICATIVE_GROUP_GENERATOR

    # one global bit-reversal up front; every later layer stays BR-ordered
    perm = reverse_index_bits_perm(n)
    vals_br = values.take(perm, axis=0)
    blk = GF2(_shard_vec(vals_br.a, mesh, axis),
              _shard_vec(vals_br.b, mesh, axis))

    trees = []
    for arity_bits in fri_params.reduction_arity_bits:
        arity = 1 << arity_bits
        log_n = log2_strict(n)
        local_rows = (n // arity) // nd
        assert local_rows >= 1, "mesh out-numbers the layer's leaves"
        local_levels = min(log2_strict(n // arity) - cap_height,
                           log2_strict(local_rows))
        top_levels = (log2_strict(n // arity) - cap_height) - local_levels

        commit = _fri_commit_fn(mesh, axis, arity, local_levels, top_levels)
        cap_gf, leaves, levels = commit(blk)
        cap = np.asarray(cap_gf.to_u64())

        from ..hash.hashing import compress_np
        if device_trees:
            # leaves + local levels stay sharded; only the tiny levels
            # above them are recomputed on host from the gathered last
            # local level (size <= nd * 2^cap_height rows)
            top = []
            cur = np.asarray(levels[-1].to_u64())
            for _ in range(top_levels):
                cur = compress_np(cur[0::2], cur[1::2])
                top.append(cur)
            tree = ShardedMerkleTree(cap_height, 2 * arity, leaves,
                                     levels, top, cap)
            assert np.array_equal(gl64.to_canonical(tree.cap.data),
                                  gl64.to_canonical(cap))
            trees.append(tree)
        else:
            # assemble a host MerkleTree for query-path extraction: the
            # gathered per-device level stacks ARE the global levels
            # (row-contiguous sharding), plus top levels recomputed on host
            # from the gathered one (they are replicated in `roots` but
            # only the cap was returned)
            tree = object.__new__(MerkleTree)
            tree.cap_height = cap_height
            tree.leaf_len = 2 * arity
            tree.leaves_np = np.asarray(leaves.to_u64())
            host_levels = [np.asarray(l.to_u64()) for l in levels]
            cur = host_levels[-1]
            for _ in range(top_levels):
                cur = compress_np(cur[0::2], cur[1::2])
                host_levels.append(cur)
            tree.levels = host_levels
            tree.cap = MerkleCap(host_levels[-1])
            assert np.array_equal(gl64.to_canonical(tree.cap.data),
                                  gl64.to_canonical(cap))
            trees.append(tree)

        challenger.observe_cap(tree.cap)
        beta_np = challenger.get_extension_challenge()

        # value-domain fold: arity_bits local radix-2 stages with beta^(2^j)
        tabs = _fold_tables(log_n, shift, arity_bits)
        betas_np = np.zeros((arity_bits, 2), np.uint64)
        b = GF2.from_u64_pair(beta_np[0], beta_np[1])
        for j in range(arity_bits):
            betas_np[j] = b.to_u64()
            b = b * b
        ba = GF.from_u64(np.ascontiguousarray(betas_np[:, 0]))
        bb = GF.from_u64(np.ascontiguousarray(betas_np[:, 1]))

        tab_shards = [GF2(_shard_vec(GF.from_u64(t), mesh, axis),
                          _shard_vec(GF.zeros(t.shape), mesh, axis))
                      for t in tabs]

        # each stage's table is sized for that stage's layer; pass them as
        # separate sharded vectors (stage j table has n/2^(j+1) entries);
        # the betas ride as traced scalars so the fold program is
        # challenge-independent and its trace is reused across rounds
        blk = _fri_fold_fn(mesh, axis, arity_bits)(blk, ba, bb, *tab_shards)
        n //= arity
        shift = pow(shift, arity, P)

    # final polynomial: gather the (small) remaining values and recover the
    # coefficients with one host-side coset interpolation
    from ..field import ntt
    vals = GF2(GF.from_u64(np.asarray(blk.a.to_u64())),
               GF.from_u64(np.asarray(blk.b.to_u64())))
    # un-bit-reverse back to natural order
    inv_perm = reverse_index_bits_perm(n)
    vals = vals.take(inv_perm, axis=0)
    coeffs = ntt.coset_intt_ext(vals, shift)
    keep = n >> fri_params.config.rate_bits
    final_coeffs = gl64.to_canonical(np.asarray(coeffs.to_u64()))[:keep]
    for c in final_coeffs:
        challenger.observe_extension_element(c)
    return trees, final_coeffs


# -------------------------------------------------------------- query phase

def _batch_open(tree, idx: np.ndarray):
    """(leaves (q, leaf_len), sibs (q, depth, 4)) for a ShardedMerkleTree
    (device gathers) or a host MerkleTree (numpy indexing)."""
    idx = np.asarray(idx, np.int64)
    if isinstance(tree, ShardedMerkleTree):
        return tree.open(idx)
    leaves = tree.leaves_np[idx]
    depth = len(tree.levels) - 1
    sibs = np.empty((idx.size, depth, 4), np.uint64)
    for lvl in range(depth):
        sibs[:, lvl] = tree.levels[lvl][(idx >> lvl) ^ 1]
    return leaves, sibs


def sharded_fri_proof(initial_merkle_trees: list, values: GF2,
                      challenger: Challenger, fri_params, mesh,
                      axis: str = "d"):
    """Distributed FRI proof: sharded commit phase + device-resident query
    extraction.  Bit-identical to fri/prover.py fri_proof (same transcript,
    caps, openings) — reference fri/prover.rs:20-216 — but the codeword and
    every folded layer stay sharded; the host receives only the
    num_query_rounds opened rows of each level.

    initial_merkle_trees may mix host MerkleTrees and ShardedMerkleTrees.
    """
    from ..fri.proof import (FriInitialTreeProof, FriProof, FriQueryRound,
                             FriQueryStep)
    from ..fri.prover import fri_proof_of_work
    from ..hash.merkle import MerkleProof

    n = values.shape[0]
    trees, final_coeffs = sharded_fri_committed_trees(
        values, challenger, fri_params, mesh, axis, device_trees=True)
    pow_witness = fri_proof_of_work(challenger, fri_params.config)

    nq = fri_params.config.num_query_rounds
    x_indices = np.array([int(challenger.get_challenge()) % n
                          for _ in range(nq)], dtype=np.int64)

    # batched extraction: ONE open() per tree for all query rounds
    initial_opens = [_batch_open(t, x_indices) for t in initial_merkle_trees]
    step_opens = []
    idx = x_indices
    for i, tree in enumerate(trees):
        idx = idx >> fri_params.reduction_arity_bits[i]
        step_opens.append(_batch_open(tree, idx))

    rounds = []
    for q in range(nq):
        initial_proof = [
            (leaves[q].copy(), MerkleProof(sibs[q]))
            for leaves, sibs in initial_opens
        ]
        steps = []
        for i, (leaves, sibs) in enumerate(step_opens):
            evals = leaves[q].reshape(-1, 2)
            steps.append(FriQueryStep(evals, MerkleProof(sibs[q])))
        rounds.append(FriQueryRound(FriInitialTreeProof(initial_proof), steps))

    return FriProof(
        commit_phase_merkle_caps=[t.cap for t in trees],
        query_round_proofs=rounds,
        final_poly=final_coeffs,
        pow_witness=pow_witness,
    )
