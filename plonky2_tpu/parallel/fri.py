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

from functools import partial

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


def sharded_fri_committed_trees(values: GF2, challenger: Challenger,
                                fri_params, mesh, axis: str = "d"):
    """Distributed commit phase, bit-identical to fri_committed_trees.

    values: (n,) extension values of the composition polynomial over the
    shifted LDE coset, NATURAL order (host or single-device).  Returns
    (trees, final_coeffs) exactly like the single-chip version — trees are
    host MerkleTree objects (levels gathered) ready for query extraction.
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

        cap_gf, leaves, levels = commit(blk)
        cap = np.asarray(cap_gf.to_u64())

        # assemble a host MerkleTree for query-path extraction: the gathered
        # per-device level stacks ARE the global levels (row-contiguous
        # sharding), plus top levels recomputed on host from the gathered
        # one (they are replicated in `roots` but only the cap was returned)
        tree = object.__new__(MerkleTree)
        tree.cap_height = cap_height
        tree.leaf_len = 2 * arity
        tree.leaves_np = np.asarray(leaves.to_u64())
        host_levels = [np.asarray(l.to_u64()) for l in levels]
        from ..hash.hashing import compress_np
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
        betas = []
        b = GF2.from_u64_pair(beta_np[0], beta_np[1])
        for _ in range(arity_bits):
            betas.append(b)
            b = b * b

        tab_shards = [GF2(_shard_vec(GF.from_u64(t), mesh, axis),
                          _shard_vec(GF.zeros(t.shape), mesh, axis))
                      for t in tabs]
        inv2 = GF.full((), pow(2, P - 2, P))

        @partial(shard_map, mesh=mesh,
                 in_specs=(PSpec(axis),) + tuple(PSpec(axis)
                                                 for _ in tabs),
                 out_specs=PSpec(axis))
        def fold(v: GF2, *tab_blks):
            for j in range(arity_bits):
                even = v[0::2]
                odd = v[1::2]
                half_sum = GF2((even.a + odd.a) * inv2,
                               (even.b + odd.b) * inv2)
                diff = even - odd  # table already carries the 1/2: 1/(2x_m)
                v = half_sum + diff * tab_blks[j] * betas[j]
            return v

        # each stage's table is sized for that stage's layer; pass them as
        # separate sharded vectors (stage j table has n/2^(j+1) entries)
        blk = fold(blk, *tab_shards)
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
