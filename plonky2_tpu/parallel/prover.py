"""Sharded proving pipeline over a device mesh.

The prover's hot phases, laid out for ICI collectives (SURVEY §2.5: the
reference's rayon loops — fri/oracle.rs:55-107 parallel IFFT/LDE,
hash/merkle_tree.rs:69-131 parallel tree fill, prover.rs:576 quotient
batches — become sharded XLA programs):

- `sharded_commitment` — the PolynomialBatch commit
  (IFFT -> coset-LDE -> bit-reverse -> transpose -> leaf hash -> Merkle
  reduce, fri/oracle.rs:43-100) with polynomials sharded over the mesh
  for the transform phase, one `all_to_all` distributed transpose to
  switch to row sharding, local Merkle subtree reduction, and an
  `all_gather` of the tiny cap.  Communication: exactly one all-to-all
  of the LDE matrix plus the cap gather.
- `sharded_stark_quotient_values` — STARK constraint evaluation over
  the quotient coset sharded by rows; `next_values` cross the shard
  boundary through a one-row `ppermute` halo exchange.

Merkle query paths are still extracted host-side from the gathered
leaves (the query phase opens ~100 rows — bandwidth-trivial next to the
commit phase).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as PSpec

from ..field import gl64, ntt
from ..field.goldilocks import GF
from ..hash.hashing import compress, hash_or_noop
from ..hash.merkle import MerkleCap
from ..utils.bits import log2_strict, reverse_index_bits_perm
from .mesh import shard_map


def sharded_commitment(values: GF, rate_bits: int, shift: int,
                       cap_height: int, mesh, axis: str = "d"):
    """Commit a (num_polys, n) batch of subgroup evaluations.

    Returns (cap, leaves): the replicated MerkleCap and the
    (N, num_polys) leaf matrix in bit-reversed row order (gathered to
    the host for query extraction).  num_polys must divide by the mesh
    size (pad with zero polynomials otherwise).
    """
    nd = mesh.devices.size
    k, n = values.shape
    assert k % nd == 0, "pad the polynomial batch to a multiple of the mesh"
    big_n = n << rate_bits
    bits = log2_strict(big_n)
    local_rows = big_n // nd
    perm = reverse_index_bits_perm(big_n)
    local_levels = min(bits - cap_height, log2_strict(local_rows))

    @partial(shard_map, mesh=mesh, in_specs=(PSpec(axis, None),),
             out_specs=(PSpec(None, None), PSpec(axis, None)))
    def commit(blk: GF):
        coeffs = ntt.intt(blk)                          # (k/nd, n)
        lde = ntt.lde(coeffs, rate_bits, shift=shift)   # (k/nd, N)
        lde = lde.take(jnp.asarray(perm), axis=-1)      # bit-reversed rows
        # distributed transpose: split the row axis, gather the poly axis
        full = GF(
            jax.lax.all_to_all(lde.lo, axis, split_axis=1, concat_axis=0,
                               tiled=True),
            jax.lax.all_to_all(lde.hi, axis, split_axis=1, concat_axis=0,
                               tiled=True))             # (k, N/nd)
        leaves = full.transpose(1, 0)                   # (N/nd, k)
        digests = hash_or_noop(leaves)                  # (N/nd, 4)
        cur = digests
        for _ in range(local_levels):
            cur = compress(cur[0::2, :], cur[1::2, :])
        roots = GF(jax.lax.all_gather(cur.lo, axis, axis=0, tiled=True),
                   jax.lax.all_gather(cur.hi, axis, axis=0, tiled=True))
        # if the mesh out-numbers the cap, finish the top levels replicated
        for _ in range((bits - cap_height) - local_levels):
            roots = compress(roots[0::2, :], roots[1::2, :])
        return roots, leaves

    cap_gf, leaves = commit(values)
    return MerkleCap(np.asarray(cap_gf.to_u64())), leaves


def _next_with_halo(blk: GF, next_step: int, axis: str) -> GF:
    """Global roll(-next_step) of a row-sharded (..., M/nd) block: shift
    each device's leading rows to its left neighbour (ring ppermute)."""
    nd = jax.lax.psum(1, axis)
    perm = [(i, (i - 1) % nd) for i in range(nd)]

    def roll_one(x):
        halo = x[..., :next_step]
        recv = jax.lax.ppermute(halo, axis, perm)
        return jnp.concatenate([x[..., next_step:], recv], axis=-1)

    return GF(roll_one(blk.lo), roll_one(blk.hi))


def sharded_stark_quotient_values(stark, trace_lde: GF, xs: np.ndarray,
                                  alphas, degree_bits: int, qdb: int,
                                  mesh, axis: str = "d",
                                  public_inputs=(), perm_lde: GF = None,
                                  challenge_sets=None, config=None,
                                  num_perm_zs: int = None,
                                  ctl_zs_columns=None) -> GF:
    """Evaluate a STARK's alpha-folded constraint quotient on the coset,
    sharded by coset rows (stark analogue of plonk/prover.rs:576, laid
    out as SP over the row axis).

    trace_lde: (COLUMNS, M) natural-order coset evaluations, M = n<<qdb.
    xs: (M,) the coset points.  perm_lde (optional): (num_zs, M) coset
    evaluations of the permutation Z polynomials, same sharding — their
    checks (starky permutation.rs:232) fold into the same accumulators.

    Multi-table mode (stark/multi.py:272 sharded twin): when
    ctl_zs_columns is given, perm_lde carries BOTH permutation and CTL Z
    rows — the first num_perm_zs are permutation Zs, the remaining ones
    pair with ctl_zs_columns and their running-product checks
    (cross_table_lookup.rs:374) fold into the same accumulators.
    Returns (num_challenges, M) quotient values, row-sharded.
    """
    from ..field.goldilocks import batch_inv
    from ..stark.stark import ConstraintConsumer, StarkEvaluationVars
    from ..plonk.gates.base import BaseBatchCtx

    P = gl64.ORDER_INT
    n = 1 << degree_bits
    next_step = 1 << qdb
    g = gl64.primitive_root_of_unity(degree_bits)
    last = pow(int(g), P - 2, P)
    xsq = np.asarray(xs, np.uint64)
    for _ in range(degree_bits):
        xsq = gl64.mul(xsq, xsq)
    zh = gl64.sub(xsq, np.uint64(1))  # Z_H(x) = x^n - 1 on the coset
    xs_gf = GF.from_u64(xs)
    zh_gf = GF.from_u64(zh)

    with_perm = perm_lde is not None
    in_spec = (PSpec(None, axis), PSpec(axis), PSpec(axis))
    args = (trace_lde, xs_gf, zh_gf)
    if with_perm:
        in_spec = in_spec + (PSpec(None, axis),)
        args = args + (perm_lde,)

    @partial(shard_map, mesh=mesh, in_specs=in_spec,
             out_specs=PSpec(None, axis))
    def quotient(trace_blk: GF, xs_blk: GF, zh_blk: GF,
                 *perm_blks) -> GF:
        trace_next = _next_with_halo(trace_blk, next_step, axis)
        z_last = xs_blk - GF.full((), last)
        n_c = GF.full((), n)
        lag_first = zh_blk * batch_inv((xs_blk - GF.ones(())) * n_c)
        lag_last = zh_blk * batch_inv(z_last * n_c)
        ctx = BaseBatchCtx()
        vars = StarkEvaluationVars(
            local_values=[trace_blk[i] for i in range(stark.COLUMNS)],
            next_values=[trace_next[i] for i in range(stark.COLUMNS)],
            public_inputs=[GF.full((), int(pi)) for pi in public_inputs],
        )
        consumer = ConstraintConsumer(ctx, list(alphas), z_last, lag_first,
                                      lag_last)
        stark.eval_generic(ctx, vars, consumer)
        if with_perm:
            (zs_blk,) = perm_blks
            zs_next = _next_with_halo(zs_blk, next_step, axis)
            n_perm = (zs_blk.shape[0] if num_perm_zs is None
                      else num_perm_zs)
            if n_perm:
                from ..stark.permutation import eval_permutation_checks
                eval_permutation_checks(
                    ctx, stark, config, vars,
                    [zs_blk[i] for i in range(n_perm)],
                    [zs_next[i] for i in range(n_perm)],
                    challenge_sets, consumer)
            if ctl_zs_columns is not None:
                from ..stark.ctl import (CtlCheckVars,
                                         eval_cross_table_lookup_checks)
                ctl_vars = [
                    CtlCheckVars(zs_blk[n_perm + i], zs_next[n_perm + i],
                                 zc.challenge, zc.columns, zc.filter_column)
                    for i, zc in enumerate(ctl_zs_columns)]
                eval_cross_table_lookup_checks(ctx, vars, ctl_vars,
                                               consumer)
        zh_inv = batch_inv(zh_blk)
        return GF.stack([acc * zh_inv for acc in consumer.accumulators()],
                        axis=0)

    return quotient(*args)
