"""End-to-end distributed PLONK prover over a device mesh.

Plonk twin of parallel/stark_prover.py: composes the sharded commitment
(sharded_batch_commit), a row(SP)-sharded vanishing-polynomial quotient
with a ppermute halo for the next-row Z openings, per-device openings at
zeta, and the sharded FRI (sharded_prove_openings) into ONE
`prove(mesh=)` for plonk circuits — the reference's demo path
(plonky2/src/plonk/prover.rs:102, e.g. the matrix_multiplication
example) — returning a ProofWithPublicInputs byte-identical to the
single-chip plonk/prover.py prove.

Byte-identity argument is the stark_prover.py one: every proof u64 is
canonicalised at the boundary and Poseidon digests depend on field
VALUES only, so exact-arithmetic re-bracketing (per-device partials,
halo exchanges, all_to_all layouts) cannot change a byte.

Sharding layout per phase:
  * constants/sigmas oracle: re-committed ONCE per (circuit, mesh) as a
    ShardedPolynomialBatch from the prover's stored coefficients (cached
    on the ProverOnlyCircuitData), so its coefficients, LDE leaves and
    digest levels live on the mesh for the quotient/openings/FRI phases;
  * wires + partial-products/Z commitments: poly-sharded IFFT/LDE, one
    all_to_all to row sharding for leaf hashing (sharded_batch_commit),
    strided natural-order coset rows retained for the quotient pass;
  * quotient: the plonk vanishing polynomial (gate constraints +
    permutation argument, plonk/vanishing.py eval_vanishing_poly)
    evaluated over the 2^qdb*n coset sharded by rows; Z(g x) crosses the
    shard boundary through a 2^qdb-row ppermute halo; the (nc, 8n)
    quotient values are gathered for one small coset IFFT;
  * openings at zeta / g*zeta: per-device polynomial evaluation
    (each poly wholly on one device — reduction order unchanged);
  * FRI: alpha-composition over sharded coefficients + sharded
    commit/fold/query (parallel/fri.py).

Scope: zero-knowledge blinding (salt columns) and lookup arguments are
single-chip-only this round — the mesh path asserts both off (the
standard recursion/demo configs use neither).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import PartitionSpec as PSpec

from ..field import gl64, ntt
from ..field.extension import GF2
from ..field.goldilocks import GF, batch_inv
from ..field.polynomial import powers_ext
from ..fri.oracle import COSET_SHIFT
from ..hash.hashing import hash_no_pad_np
from ..iop.challenger import Challenger, permutation_for
from ..plonk.gates.base import BaseBatchCtx, EvalVars
from ..plonk.proof import OpeningSet, Proof, ProofWithPublicInputs
from ..plonk.prover import (_all_partial_products_and_zs, _in_subgroup,
                            _z_h_on_coset)
from ..plonk.vanishing import eval_vanishing_poly
from ..utils.bits import log2_strict
from .mesh import shard_map
from .prover import _next_with_halo
from .stark_prover import sharded_batch_commit, sharded_prove_openings


def _sharded_constants_sigmas(prover_data, common, step: int, mesh,
                              axis: str):
    """ShardedPolynomialBatch of the preprocessed constants/sigmas oracle,
    built once per (circuit, mesh) from the stored coefficients and cached
    on the ProverOnlyCircuitData (commit-phase work, not per-proof)."""
    cache = getattr(prover_data, "_sharded_cs_cache", None)
    if cache is None:
        cache = prover_data._sharded_cs_cache = {}
    key = (mesh, axis, step)
    if key not in cache:
        base = prover_data.constants_sigmas_commitment
        cache[key] = sharded_batch_commit(
            base.polynomials, base.rate_bits,
            common.config.fri_config.cap_height, mesh, axis,
            from_coeffs=True, quotient_step=step)
    return cache[key]


_QUOTIENT_FNS: dict = {}


def _sharded_quotient_fn(common, mesh, axis: str):
    """Row-sharded plonk vanishing/quotient program, memoized per
    (circuit, mesh) so prove-many loops re-trace nothing (cf. the
    stark_prover.py memoization note)."""
    key = (id(common), mesh, axis)
    fn = _QUOTIENT_FNS.get(key)
    if fn is not None:
        return fn

    nc = common.config.num_challenges
    num_prods = common.num_partial_products
    num_wires = common.config.num_wires
    num_constants = common.num_constants
    sig = common.sigmas_range()
    next_step = 1 << (common.quotient_degree_factor - 1).bit_length()
    n = common.degree()

    @partial(shard_map, mesh=mesh,
             in_specs=(PSpec(None, axis), PSpec(None, axis),
                       PSpec(None, axis), PSpec(axis), PSpec(axis),
                       PSpec(axis), PSpec(None), PSpec(None), PSpec(None),
                       PSpec(None)),
             out_specs=PSpec(None, axis))
    def quotient(cs_blk: GF, wires_blk: GF, pps_blk: GF, xs_blk: GF,
                 zh_blk: GF, zh_inv_blk: GF, pis_hash: GF, betas_gf: GF,
                 gammas_gf: GF, alphas_gf: GF) -> GF:
        pps_next = _next_with_halo(pps_blk, next_step, axis)
        ctx = BaseBatchCtx()
        l_0 = zh_blk * batch_inv((xs_blk - GF.ones(())) * GF.full((), n))
        vars = EvalVars(
            local_constants=[cs_blk[i] for i in range(num_constants)],
            local_wires=[wires_blk[i] for i in range(num_wires)],
            public_inputs_hash=[pis_hash[i] for i in range(4)])
        vanishing = eval_vanishing_poly(
            ctx, common, xs_blk, vars,
            local_zs=[pps_blk[i] for i in range(nc)],
            next_zs=[pps_next[i] for i in range(nc)],
            partial_products=[pps_blk[i]
                              for i in range(nc, nc * (1 + num_prods))],
            s_sigmas=[cs_blk[i] for i in range(sig.start, sig.stop)],
            betas=[betas_gf[i] for i in range(nc)],
            gammas=[gammas_gf[i] for i in range(nc)],
            alphas=[alphas_gf[i] for i in range(nc)], l_0_x=l_0)
        return GF.stack([v * zh_inv_blk for v in vanishing], axis=0)

    _QUOTIENT_FNS[key] = quotient
    return quotient


def prove_sharded(prover_data, common, inputs, mesh, axis: str = "d",
                  timing=None) -> ProofWithPublicInputs:
    """Distributed twin of plonk/prover.py prove: same pipeline, same
    transcript, byte-identical proof (tests/test_distributed_plonk.py
    asserts equality through utils/serialization.py)."""
    from ..utils.timing import TimingTree
    timing = timing if timing is not None else TimingTree("prove(mesh)")
    config = common.config
    assert not config.zero_knowledge, \
        "the mesh plonk prover does not shard salt columns yet"
    assert not common.has_lookup(), \
        "the mesh plonk prover does not shard lookup polynomials yet"
    assert config.hasher == "poseidon", \
        "the sharded prover commits with device Poseidon"
    num_challenges = config.num_challenges
    degree = common.degree()
    degree_bits = common.degree_bits()
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    qdb = (common.quotient_degree_factor - 1).bit_length()
    assert qdb <= rate_bits
    step = 1 << (rate_bits - qdb)
    lde_n = degree << qdb

    # 1. witness generation (host, leveled batches — unchanged)
    with timing.scope("generate witness"):
        wires_matrix, all_values = prover_data.schedule.generate(inputs)
    public_inputs = prover_data.schedule.values_of(all_values,
                                                   prover_data.public_inputs)
    public_inputs = gl64.to_canonical(public_inputs)
    public_inputs_hash = hash_no_pad_np(public_inputs)

    cs_commitment = _sharded_constants_sigmas(prover_data, common, step,
                                              mesh, axis)

    # 2. wires commitment (sharded)
    with timing.scope("compute wires commitment"):
        wires_commitment = sharded_batch_commit(
            GF.from_u64(wires_matrix), rate_bits, cap_height, mesh, axis,
            quotient_step=step)

    challenger = Challenger(permutation_for(config.hasher))
    challenger.observe_hash(prover_data.circuit_digest)
    challenger.observe_hash(public_inputs_hash)
    challenger.observe_cap(wires_commitment.merkle_tree.cap)

    betas = challenger.get_n_challenges(num_challenges)
    gammas = challenger.get_n_challenges(num_challenges)

    # 3. partial products + Z polys: (nc*(1+num_prods), n) is tiny next to
    # the wires — computed single-device exactly as the single-chip path,
    # then committed sharded
    with timing.scope("compute partial products"):
        zs_partial_products = _all_partial_products_and_zs(
            wires_matrix, betas, gammas, prover_data, common)
    with timing.scope("commit to partial products and Z's"):
        pp_commitment = sharded_batch_commit(
            zs_partial_products, rate_bits, cap_height, mesh, axis,
            quotient_step=step)
    challenger.observe_cap(pp_commitment.merkle_tree.cap)

    alphas = challenger.get_n_challenges(num_challenges)

    # 4. quotient polynomials: row-sharded vanishing eval over the coset
    with timing.scope("compute quotient polys"):
        big_subgroup = gl64.two_adic_subgroup(degree_bits + qdb)
        xs = gl64.mul(big_subgroup, np.uint64(COSET_SHIFT))
        zh = _z_h_on_coset(degree_bits, qdb)
        zh_tiled = np.tile(zh, degree)
        zh_inv_tiled = np.tile(gl64.batch_inv(zh), degree)
        quotient_fn = _sharded_quotient_fn(common, mesh, axis)
        quotient_values = quotient_fn(
            cs_commitment.strided_lde[: common.num_preprocessed_polys()],
            wires_commitment.strided_lde[: config.num_wires],
            pp_commitment.strided_lde[: pp_commitment.num_polys],
            GF.from_u64(xs), GF.from_u64(zh_tiled),
            GF.from_u64(zh_inv_tiled),
            GF.from_u64(np.asarray(public_inputs_hash, np.uint64)),
            GF.from_u64(np.asarray(betas, np.uint64)),
            GF.from_u64(np.asarray(gammas, np.uint64)),
            GF.from_u64(np.asarray(alphas, np.uint64)))
        # (nc, 8n) is small: gather, one coset IFFT, re-commit sharded
        qv = GF.from_u64(quotient_values.to_u64())
        quotient_coeffs = ntt.coset_intt(qv, COSET_SHIFT)
        chunks = quotient_coeffs.reshape(
            num_challenges * common.quotient_degree_factor, degree)
    with timing.scope("commit to quotient polys"):
        quotient_commitment = sharded_batch_commit(
            chunks, rate_bits, cap_height, mesh, axis, from_coeffs=True)
    challenger.observe_cap(quotient_commitment.merkle_tree.cap)

    # 5. openings at zeta, g*zeta (per-device evals, gathered scalars)
    zeta_np = challenger.get_extension_challenge()
    assert not _in_subgroup(zeta_np, degree_bits), \
        "opening point is in the subgroup"
    with timing.scope("construct the opening set"):
        zeta = GF2.from_u64_pair(zeta_np[0], zeta_np[1])
        g = gl64.primitive_root_of_unity(degree_bits)
        zpow = powers_ext(zeta, degree)
        zgpow = powers_ext(zeta * GF.full((), g), degree)
        cs_eval = cs_commitment.eval_at_powers(zpow)
        wires_eval = wires_commitment.eval_at_powers(zpow)
        pp_eval = pp_commitment.eval_at_powers(zpow)
        pp_next_eval = pp_commitment.eval_at_powers(zgpow)[:num_challenges]
        quot_eval = quotient_commitment.eval_at_powers(zpow)
        cr = common.constants_range()
        sr = common.sigmas_range()
        num_zs_pp = common.num_zs_partial_products_polys()
        openings = OpeningSet(
            constants=cs_eval[cr.start:cr.stop],
            plonk_sigmas=cs_eval[sr.start:sr.stop],
            wires=wires_eval,
            plonk_zs=pp_eval[:num_challenges],
            plonk_zs_next=pp_next_eval,
            partial_products=pp_eval[num_challenges:num_zs_pp],
            quotient_polys=quot_eval,
            lookup_zs=pp_eval[num_zs_pp:],
            lookup_zs_next=np.zeros((0, 2), dtype=np.uint64),
        )
    for batch in openings.to_fri_openings().batches:
        for v in batch.values:
            challenger.observe_extension_element(v)

    # 6. FRI opening proof (sharded composition + commit/fold/query)
    instance = common.get_fri_instance(zeta_np)
    with timing.scope("compute opening proofs (FRI)"):
        opening_proof = sharded_prove_openings(
            instance,
            [cs_commitment, wires_commitment, pp_commitment,
             quotient_commitment],
            challenger, common.fri_params, mesh, axis)

    proof = Proof(
        wires_cap=wires_commitment.merkle_tree.cap,
        plonk_zs_partial_products_cap=pp_commitment.merkle_tree.cap,
        quotient_polys_cap=quotient_commitment.merkle_tree.cap,
        openings=openings,
        opening_proof=opening_proof,
    )
    return ProofWithPublicInputs(proof, public_inputs)
