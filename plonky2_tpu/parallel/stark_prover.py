"""End-to-end distributed STARK prover over a device mesh.

Composes the sharded stages (parallel/prover.py commitment + quotient,
parallel/fri.py FRI commit/fold/query) into ONE `prove_sharded()` that
runs trace commitment -> permutation Zs -> quotient -> openings -> FRI
with every large array sharded, and returns a StarkProof byte-identical
to the single-chip `stark/prover.py prove` (same transcript, same caps,
same openings, same query paths) — the mesh analogue of the reference's
end-to-end pipeline (plonky2/src/plonk/prover.rs:102, starky prover.rs:32).

Why byte-identity holds: every u64 that lands in a proof goes through
`to_canonical` (GF.to_u64, _gather_rows), and Poseidon digests depend
only on field VALUES, not on which (value-equal) limb representative a
reduction order produced — so any exact-arithmetic re-bracketing of the
sums (per-device partials, halo exchanges) yields identical bytes.

Sharding layout per phase:
  * commitment (`sharded_batch_commit`): polynomials sharded for the
    IFFT/LDE (zero communication), ONE all_to_all to row sharding for
    leaf hashing + local Merkle reduce, an all_gather of the tiny cap;
    the quotient pass's strided natural-order rows ride a second
    all_to_all of 1/step of the matrix.  Leaves, digest levels, and
    coefficients never leave the mesh (ShardedMerkleTree).
  * quotient: row(SP)-sharded constraint evaluation with a one-row
    ppermute halo for next_values (parallel/prover.py).
  * openings: per-device polynomial evaluation at zeta (poly-sharded —
    each poly lives wholly on one device), gathered as (k, 2) scalars.
  * FRI composition: alpha-weighted reduce over each oracle's sharded
    coefficients (per-device partial sums + gathered GF tree-sum); the
    O(n log n) division tail is single-device (1/num_polys of the work);
    commit/fold/query run sharded (parallel/fri.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as PSpec

from ..field import gl64, gl64ext, ntt
from ..field.extension import GF2
from ..field.goldilocks import GF
from ..field.polynomial import eval_polys_at_ext, powers_ext
from ..fri.oracle import COSET_SHIFT, batch_opening_quotient
from ..hash.hashing import compress, compress_np, hash_or_noop
from ..iop.challenger import Challenger, permutation_for
from ..stark.proof import (StarkOpeningSet, StarkProof,
                           StarkProofWithPublicInputs)
from ..utils.bits import log2_strict, reverse_index_bits_perm
from .fri import ShardedMerkleTree, sharded_fri_proof
from .mesh import shard_map, shard_polys
from .prover import sharded_stark_quotient_values

P = gl64.ORDER_INT


class ShardedPolynomialBatch:
    """fri/oracle.py PolynomialBatch twin whose coefficients, LDE leaves,
    and Merkle digest levels stay sharded on the mesh.  `num_polys` is the
    logical count; the device arrays are zero-padded to a mesh multiple
    (the pad columns are dropped before leaf hashing, so commitments are
    identical to the unpadded single-chip ones)."""

    def __init__(self, coeffs_sharded: GF, num_polys: int,
                 merkle_tree: ShardedMerkleTree, degree_log: int,
                 rate_bits: int, mesh, axis: str,
                 strided_lde: GF | None = None):
        self.coeffs_sharded = coeffs_sharded  # (k_pad, n), poly-sharded
        self.num_polys = num_polys
        self.merkle_tree = merkle_tree
        self.degree_log = degree_log
        self.rate_bits = rate_bits
        self.mesh = mesh
        self.axis = axis
        # (k_pad, degree << qdb) natural-order coset rows, row-sharded
        self.strided_lde = strided_lde

    @property
    def padded_polys(self) -> int:
        return self.coeffs_sharded.shape[0]

    def eval_at_powers(self, zpow: GF2) -> np.ndarray:
        """Openings at the extension point whose powers table is zpow:
        (num_polys, 2) canonical u64 — identical to the single-chip
        eval_polys_at_ext(...).to_u64() (each poly lives wholly on one
        device, so the per-poly reduction order is unchanged)."""
        a, b = _eval_fn(self.mesh, self.axis)(self.coeffs_sharded,
                                              zpow.a, zpow.b)
        out = GF2(a, b).to_u64()  # gathers + canonicalises
        return out[: self.num_polys]


# The shard_map-wrapped programs are memoized on their STATIC parameters:
# a fresh closure per call would defeat jax's dispatch cache and re-pay
# Python tracing + SPMD lowering (~tens of seconds per program on a
# 1-core driver host) for every same-shaped call — the trace, Z, and
# quotient oracles usually pad to identical shapes and share one trace.

@lru_cache(maxsize=None)
def _eval_fn(mesh, axis: str):
    @partial(shard_map, mesh=mesh,
             in_specs=(PSpec(axis, None), PSpec(None), PSpec(None)),
             out_specs=(PSpec(axis), PSpec(axis)))
    def ev(blk: GF, za: GF, zb: GF):
        r = eval_polys_at_ext(blk, GF2(za, zb))
        return r.a, r.b

    return jax.jit(ev)  # jit: persistent-cache the SPMD executable


def sharded_batch_commit(values: GF, rate_bits: int, cap_height: int,
                         mesh, axis: str = "d", from_coeffs: bool = False,
                         quotient_step: int = 0) -> ShardedPolynomialBatch:
    """Distributed PolynomialBatch.from_values / from_coeffs
    (fri/oracle.rs:43-100): poly-sharded IFFT+LDE, one all_to_all to
    row-sharded bit-reversed leaves, local Merkle subtree reduce, cap
    gather.  quotient_step > 0 additionally returns the natural-order
    coset rows lde[:, ::quotient_step] row-sharded (one more all_to_all
    of 1/step of the matrix) for the quotient pass."""
    nd = mesh.devices.size
    k, n = values.shape
    k_pad = -(-k // nd) * nd
    if k_pad != k:
        values = GF.concatenate([values, GF.zeros((k_pad - k, n))], axis=0)
    big_n = n << rate_bits
    bits = log2_strict(big_n)
    local_rows = big_n // nd
    assert local_rows >= 1, "mesh out-numbers the LDE rows"
    local_levels = min(bits - cap_height, log2_strict(local_rows))
    top_levels = (bits - cap_height) - local_levels

    commit = _commit_fn(mesh, axis, k, n, rate_bits, cap_height,
                        from_coeffs, quotient_step)
    res = commit(shard_polys(values, mesh, axis))
    cap_gf, leaves, levels, coeffs = res[:4]
    strided = res[4] if quotient_step else None
    cap_np = np.asarray(cap_gf.to_u64())
    # host levels strictly above the sharded ones (<= nd*2^cap_height rows)
    top = []
    cur = np.asarray(levels[-1].to_u64())
    for _ in range(top_levels):
        cur = compress_np(cur[0::2], cur[1::2])
        top.append(cur)
    tree = ShardedMerkleTree(cap_height, k, leaves, list(levels), top, cap_np)
    return ShardedPolynomialBatch(coeffs, k, tree, log2_strict(n), rate_bits,
                                  mesh, axis, strided)


@lru_cache(maxsize=None)
def _commit_fn(mesh, axis: str, k: int, n: int, rate_bits: int,
               cap_height: int, from_coeffs: bool, quotient_step: int):
    nd = mesh.devices.size
    big_n = n << rate_bits
    bits = log2_strict(big_n)
    local_rows = big_n // nd
    perm = reverse_index_bits_perm(big_n)
    local_levels = min(bits - cap_height, log2_strict(local_rows))
    top_levels = (bits - cap_height) - local_levels

    out_specs = (PSpec(None, None), PSpec(axis, None),
                 tuple(PSpec(axis, None) for _ in range(local_levels + 1)),
                 PSpec(axis, None))
    if quotient_step:
        out_specs = out_specs + (PSpec(None, axis),)

    @partial(shard_map, mesh=mesh, in_specs=(PSpec(axis, None),),
             out_specs=out_specs)
    def commit(blk: GF):
        coeffs = blk if from_coeffs else ntt.intt(blk)
        lde = ntt.lde(coeffs, rate_bits, shift=COSET_SHIFT)  # (k_pad/nd, N)
        br = lde.take(jnp.asarray(perm), axis=-1)
        full = GF(
            jax.lax.all_to_all(br.lo, axis, split_axis=1, concat_axis=0,
                               tiled=True),
            jax.lax.all_to_all(br.hi, axis, split_axis=1, concat_axis=0,
                               tiled=True))                  # (k_pad, N/nd)
        # drop the zero pad columns BEFORE hashing: leaves (and therefore
        # every digest and cap) match the unpadded single-chip tree
        leaves = full.transpose(1, 0)[:, :k]                 # (N/nd, k)
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
        outs = (roots, leaves, tuple(levels), coeffs)
        if quotient_step:
            s = lde[:, ::quotient_step]
            strided = GF(
                jax.lax.all_to_all(s.lo, axis, split_axis=1, concat_axis=0,
                                   tiled=True),
                jax.lax.all_to_all(s.hi, axis, split_axis=1, concat_axis=0,
                                   tiled=True))
            outs = outs + (strided,)
        return outs

    return jax.jit(commit)


@lru_cache(maxsize=None)
def _wsum_fn(mesh, axis: str):
    @partial(shard_map, mesh=mesh,
             in_specs=(PSpec(axis, None), PSpec(axis), PSpec(axis)),
             out_specs=(PSpec(None), PSpec(None)))
    def red(blk: GF, wa_blk: GF, wb_blk: GF):
        pa = (blk * wa_blk.reshape(-1, 1)).sum(axis=0)  # GF (n,)
        pb = (blk * wb_blk.reshape(-1, 1)).sum(axis=0)
        ga = GF(jax.lax.all_gather(pa.lo, axis, axis=0),
                jax.lax.all_gather(pa.hi, axis, axis=0))  # (nd, n)
        gb = GF(jax.lax.all_gather(pb.lo, axis, axis=0),
                jax.lax.all_gather(pb.hi, axis, axis=0))
        return ga.sum(axis=0), gb.sum(axis=0)

    return jax.jit(red)


def _sharded_weighted_sum(coeffs: GF, w_np: np.ndarray, mesh,
                          axis: str) -> GF2:
    """sum_j w[j] * coeffs[j] with extension weights, coeffs poly-sharded:
    per-device partial sums, then a gathered log-depth GF tree-sum —
    value-identical to the single-chip (polys * apow).sum(axis=0)."""
    wa = GF.from_u64(np.ascontiguousarray(w_np[:, 0]))
    wb = GF.from_u64(np.ascontiguousarray(w_np[:, 1]))
    a, b = _wsum_fn(mesh, axis)(coeffs, wa, wb)
    return GF2(a, b)


def sharded_prove_openings(instance, oracles: list, challenger: Challenger,
                           fri_params, mesh, axis: str = "d"):
    """Distributed PolynomialBatch.prove_openings (fri/oracle.rs:162):
    the alpha-composition reduce runs sharded over each oracle's
    coefficients; the per-batch division (batch_opening_quotient — shared
    with the single-chip path) is single-device; FRI commit/fold/query
    run sharded (sharded_fri_proof)."""
    alpha_np = challenger.get_extension_challenge()
    alpha = GF2.from_u64_pair(alpha_np[0], alpha_np[1])

    n = 1 << fri_params.degree_bits
    subgroup = GF.from_u64(gl64.two_adic_subgroup(fri_params.degree_bits))
    final_poly = None
    for batch in instance.batches:
        k = len(batch.polynomials)
        # host alpha powers (tiny): apow[j] = alpha^j
        apow = np.zeros((k, 2), np.uint64)
        acc = gl64ext.ONE
        for j in range(k):
            apow[j] = acc
            acc = gl64ext.mul(acc, alpha_np)
        comp = None
        for oi, oracle in enumerate(oracles):
            w = np.zeros((oracle.padded_polys, 2), np.uint64)
            selected = False
            for j, p in enumerate(batch.polynomials):
                if p.oracle_index == oi:
                    w[p.polynomial_index] = apow[j]
                    selected = True
            if not selected:
                continue
            part = _sharded_weighted_sum(oracle.coeffs_sharded, w, mesh, axis)
            comp = part if comp is None else comp + part
        quotient = batch_opening_quotient(comp, batch.point, n, subgroup)
        if final_poly is None:
            final_poly = quotient
        else:
            final_poly = final_poly * alpha.pow_const(k) + quotient

    lde_values = ntt.lde_ext(final_poly, fri_params.config.rate_bits,
                             shift=COSET_SHIFT)
    return sharded_fri_proof([o.merkle_tree for o in oracles], lde_values,
                             challenger, fri_params, mesh, axis)


def prove_sharded(stark, config, trace_poly_values: GF,
                  public_inputs: np.ndarray, mesh,
                  axis: str = "d") -> StarkProofWithPublicInputs:
    """Distributed twin of stark/prover.py prove: same pipeline, same
    transcript, byte-identical proof (tests/test_distributed_prove.py
    asserts equality through utils/serialization.py)."""
    degree = trace_poly_values.shape[-1]
    degree_bits = log2_strict(degree)
    fri_params = config.fri_params(degree_bits)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    assert fri_params.total_arities() <= degree_bits + rate_bits - cap_height
    assert config.hasher == "poseidon", \
        "the sharded prover commits with device Poseidon"

    qdb = (stark.quotient_degree_factor() - 1).bit_length()
    assert qdb <= rate_bits
    step = 1 << (rate_bits - qdb)

    trace_commitment = sharded_batch_commit(
        trace_poly_values, rate_bits, cap_height, mesh, axis,
        quotient_step=step)
    challenger = Challenger(permutation_for(config.hasher))
    challenger.observe_cap(trace_commitment.merkle_tree.cap)

    # permutation arguments (starky/src/prover.rs:75-112)
    perm_commitment = None
    challenge_sets = None
    if stark.uses_permutation_args():
        from ..stark.permutation import (compute_permutation_z_polys_gf,
                                         get_n_permutation_challenge_sets)
        challenge_sets = get_n_permutation_challenge_sets(
            challenger, config.num_challenges, stark.permutation_batch_size())
        z_polys_gf = compute_permutation_z_polys_gf(
            stark, config, trace_poly_values, challenge_sets)
        perm_commitment = sharded_batch_commit(
            z_polys_gf, rate_bits, cap_height, mesh, axis,
            quotient_step=step)
        challenger.observe_cap(perm_commitment.merkle_tree.cap)

    alphas = challenger.get_n_challenges(config.num_challenges)

    # quotient over the coset, row(SP)-sharded with ppermute halo
    xs = gl64.mul(gl64.two_adic_subgroup(degree_bits + qdb),
                  np.uint64(COSET_SHIFT))
    trace_rows = trace_commitment.strided_lde[: stark.COLUMNS]
    perm_rows = (perm_commitment.strided_lde[: perm_commitment.num_polys]
                 if perm_commitment else None)
    quotient_values = sharded_stark_quotient_values(
        stark, trace_rows, xs, list(alphas), degree_bits, qdb, mesh, axis,
        public_inputs=public_inputs, perm_lde=perm_rows,
        challenge_sets=challenge_sets, config=config)
    # the (num_challenges, degree<<qdb) quotient is tiny next to the trace:
    # gather it and recover coefficients with one coset IFFT
    qv = GF.from_u64(quotient_values.to_u64())
    quotient_coeffs = ntt.coset_intt(qv, COSET_SHIFT)
    qdf = stark.quotient_degree_factor()
    chunks = quotient_coeffs.reshape(config.num_challenges, 1 << qdb, degree)
    chunks = chunks[:, :qdf, :].reshape(config.num_challenges * qdf, degree)
    quotient_commitment = sharded_batch_commit(
        chunks, rate_bits, cap_height, mesh, axis, from_coeffs=True)
    challenger.observe_cap(quotient_commitment.merkle_tree.cap)

    zeta_np = challenger.get_extension_challenge()
    g = gl64.primitive_root_of_unity(degree_bits)
    zeta = GF2.from_u64_pair(zeta_np[0], zeta_np[1])
    zeta_g = zeta * GF.full((), g)
    zpow = powers_ext(zeta, degree)
    zgpow = powers_ext(zeta_g, degree)

    openings = StarkOpeningSet(
        local_values=trace_commitment.eval_at_powers(zpow),
        next_values=trace_commitment.eval_at_powers(zgpow),
        quotient_polys=quotient_commitment.eval_at_powers(zpow),
        permutation_zs=perm_commitment.eval_at_powers(zpow)
        if perm_commitment else None,
        permutation_zs_next=perm_commitment.eval_at_powers(zgpow)
        if perm_commitment else None,
    )
    for batch in openings.to_fri_openings().batches:
        for v in batch.values:
            challenger.observe_extension_element(v)

    commitments = [trace_commitment]
    if perm_commitment is not None:
        commitments.append(perm_commitment)
    commitments.append(quotient_commitment)
    opening_proof = sharded_prove_openings(
        stark.fri_instance(zeta_np, g, config), commitments, challenger,
        fri_params, mesh, axis)

    proof = StarkProof(
        trace_cap=trace_commitment.merkle_tree.cap,
        quotient_polys_cap=quotient_commitment.merkle_tree.cap,
        openings=openings,
        opening_proof=opening_proof,
        permutation_zs_cap=perm_commitment.merkle_tree.cap
        if perm_commitment else None,
    )
    return StarkProofWithPublicInputs(proof,
                                      np.asarray(public_inputs, np.uint64))
