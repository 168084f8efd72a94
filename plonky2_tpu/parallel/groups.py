"""Device groups: expert-parallel table placement + pipelined proof streams.

Two SURVEY §2.5 strategies the flat mesh doesn't cover:

* **Per-table device groups** (the expert-parallel analogue): the zkEVM's
  tables are independent through their trace-commitment phase — the shared
  challenger consumes only the caps (reference evm/src/prover.rs:94) — so
  each table's IFFT→LDE→Merkle runs on its own sub-mesh.  JAX dispatch is
  asynchronous: all groups' programs are enqueued before any result is
  pulled, so the groups compute concurrently with zero cross-group traffic
  (each sub-mesh's collectives ride its own ICI slice).

* **Pipeline parallelism** over a stream of independent proofs (aggregation
  leaves, per-transaction proofs): group 0 commits the trace of proof i+1
  while group 1 evaluates quotient + FRI for proof i.  The intra-proof
  transcript is strictly sequential (each phase's challenge depends on the
  previous cap), so the profitable overlap is across proofs — the classic
  two-stage pipeline with the commitment as its first stage.

Both paths are bit-identical to the single-chip prover
(tests/test_groups.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..field import gl64, ntt
from ..field.goldilocks import GF
from ..fri.oracle import COSET_SHIFT, PolynomialBatch
from ..hash.hashing import compress, compress_np, hash_or_noop
from ..hash.merkle import MerkleCap, MerkleTree
from ..utils.bits import log2_strict, reverse_index_bits_perm
from .mesh import shard_map


def device_groups(num_groups: int, axis: str = "d",
                  devices=None) -> list[Mesh]:
    """Split the devices into `num_groups` equal sub-meshes."""
    devs = list(devices if devices is not None else jax.devices())
    per = len(devs) // num_groups
    assert per >= 1, "more groups than devices"
    return [Mesh(np.array(devs[g * per:(g + 1) * per]), (axis,))
            for g in range(num_groups)]


class PendingBatch:
    """A dispatched-but-not-materialised sharded commitment.

    Holds the device arrays of one group's commitment program;
    `finalize()` pulls them to the host and assembles a PolynomialBatch
    interchangeable with `PolynomialBatch.from_values` (same caps, same
    leaves, same Merkle levels).  Keeping the handle un-finalised is what
    lets several groups (or pipeline stages) run concurrently.
    """

    def __init__(self, coeffs, cap, leaves, levels, degree_log: int,
                 rate_bits: int, cap_height: int, top_levels: int):
        self._coeffs = coeffs
        self._cap = cap
        self._leaves = leaves
        self._levels = levels
        self._degree_log = degree_log
        self._rate_bits = rate_bits
        self._cap_height = cap_height
        self._top_levels = top_levels

    def finalize(self) -> PolynomialBatch:
        tree = object.__new__(MerkleTree)
        tree.cap_height = self._cap_height
        tree.leaf_len = self._leaves.shape[1]
        tree.leaves_np = np.asarray(self._leaves.to_u64())
        host_levels = [np.asarray(l.to_u64()) for l in self._levels]
        cur = host_levels[-1]
        for _ in range(self._top_levels):
            cur = compress_np(cur[0::2], cur[1::2])
            host_levels.append(cur)
        tree.levels = host_levels
        tree.cap = MerkleCap(host_levels[-1])
        coeffs = GF.from_u64(np.asarray(self._coeffs.to_u64()))
        return PolynomialBatch(coeffs, tree, self._degree_log,
                               self._rate_bits, blinding=False)


def sharded_polynomial_batch(values: GF, rate_bits: int, cap_height: int,
                             mesh: Mesh, axis: str = "d") -> PendingBatch:
    """Full distributed PolynomialBatch.from_values on one (sub-)mesh.

    Same program as `parallel.prover.sharded_commitment` (one all_to_all
    transpose + local Merkle reduce) extended to also emit the IFFT
    coefficients and every local digest level, so the result supports the
    whole downstream prover (openings, quotient, FRI), not just the cap.

    values: (num_polys, n) subgroup evaluations; num_polys is padded with
    zero polynomials to a mesh multiple for the transform phase and the
    pad is dropped before leaf hashing, so the commitment is bit-identical
    to the unpadded single-chip one.
    """
    nd = mesh.devices.size
    k, n = values.shape
    pad = (-k) % nd
    if pad:
        values = GF.concatenate([values, GF.zeros((pad, n))], axis=0)
    kp = k + pad
    big_n = n << rate_bits
    bits = log2_strict(big_n)
    local_rows = big_n // nd
    perm = reverse_index_bits_perm(big_n)
    local_levels = min(bits - cap_height, log2_strict(local_rows))
    top_levels = (bits - cap_height) - local_levels

    sh = NamedSharding(mesh, PSpec(axis, None))
    values = GF(jax.device_put(values.lo, sh), jax.device_put(values.hi, sh))

    @partial(shard_map, mesh=mesh, in_specs=(PSpec(axis, None),),
             out_specs=(PSpec(axis, None), PSpec(None, None),
                        PSpec(axis, None),
                        tuple(PSpec(axis, None)
                              for _ in range(local_levels + 1))))
    def commit(blk: GF):
        coeffs = ntt.intt(blk)                          # (kp/nd, n)
        lde = ntt.lde(coeffs, rate_bits, shift=COSET_SHIFT)
        lde = lde.take(jnp.asarray(perm), axis=-1)      # bit-reversed rows
        full = GF(
            jax.lax.all_to_all(lde.lo, axis, split_axis=1, concat_axis=0,
                               tiled=True),
            jax.lax.all_to_all(lde.hi, axis, split_axis=1, concat_axis=0,
                               tiled=True))             # (kp, N/nd)
        leaves = full[:k].transpose(1, 0)               # pad dropped: (N/nd, k)
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
        return coeffs, roots, leaves, tuple(levels)

    coeffs, cap, leaves, levels = commit(values)
    coeffs = coeffs[:k] if pad else coeffs
    return PendingBatch(coeffs, cap, leaves, levels, log2_strict(n),
                        rate_bits, cap_height, top_levels)


def grouped_trace_commitments(trace_poly_values: list, rate_bits: int,
                              cap_height: int,
                              groups: list[Mesh]) -> list[PolynomialBatch]:
    """Expert-parallel trace commitments: table t on group t % len(groups).

    All groups' programs are dispatched before any finalize, so the
    commitments run concurrently across the pod.  Returns per-table
    PolynomialBatches identical to `from_values`.
    """
    pending = [
        sharded_polynomial_batch(
            t if isinstance(t, GF) else GF.from_u64(np.asarray(t, np.uint64)),
            rate_bits, cap_height, groups[i % len(groups)])
        for i, t in enumerate(trace_poly_values)]
    return [p.finalize() for p in pending]


def pipeline_prove_stream(stark, config, traces: list, public_inputs: list,
                          groups: list[Mesh]) -> list:
    """Two-stage pipelined proving of independent STARK proofs.

    Stage 1 (groups[0]): distributed trace commitment of proof i+1.
    Stage 2 (groups[1]): permutation Zs, quotient, openings and FRI of
    proof i, placed on group 1's devices.  While the host sequences proof
    i's transcript (pulling caps/challenges from group 1), group 0's
    already-enqueued commitment for proof i+1 keeps running — the overlap
    that pipeline parallelism buys on a proof stream.

    Returns proofs bit-identical to `stark.prover.prove` run sequentially.
    """
    from ..stark.prover import prove

    assert len(groups) >= 2, "pipeline needs two device groups"
    stage2_dev = groups[1].devices.flat[0]
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height

    proofs = []
    pending = None
    for i in range(len(traces) + 1):
        nxt = None
        if i < len(traces):
            nxt = sharded_polynomial_batch(traces[i], rate_bits, cap_height,
                                           groups[0])
        if pending is not None:
            batch = pending.finalize()
            with jax.default_device(stage2_dev):
                proofs.append(prove(stark, config, traces[i - 1],
                                    public_inputs[i - 1],
                                    trace_commitment=batch))
        pending = nxt
    return proofs
