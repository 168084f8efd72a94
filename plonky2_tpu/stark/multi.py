"""Multi-table STARK proving with cross-table lookups.

Twin of the reference zkEVM proving machinery (evm/src/prover.rs:94-467,
evm/src/verifier.rs:29-216, evm/src/proof.rs:207-293, evm/src/stark.rs:83),
but generic over any list of Starks + CrossTableLookups rather than
hard-coded to the six EVM tables.

One Fiat–Shamir challenger threads through the whole proof: all trace caps
are observed first, then the CTL (beta, gamma) challenges are drawn, then
each table is proven in order, its permutation+CTL Z commitment, quotient,
opening and FRI phases continuing the same transcript
(evm/src/get_challenges.rs:18-49).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import gl64, ntt
from ..field.extension import GF2
from ..field.goldilocks import GF, batch_inv
from ..field.polynomial import eval_polys_at_ext, powers_ext
from ..fri.oracle import COSET_SHIFT, PolynomialBatch
from ..fri.proof import FriChallenges, FriProof
from ..fri.structure import (FriBatchInfo, FriInstanceInfo, FriOpeningBatch,
                             FriOpenings, FriOracleInfo, FriPolynomialInfo)
from ..fri.verifier import fri_challenges, verify_fri_proof
from ..field import gl64ext
from ..field.gl64ext import E2
from ..iop.challenger import Challenger, permutation_for
from ..plonk.gates.base import BaseBatchCtx, ExtCtx
from ..utils.bits import log2_strict
from ..utils.timing import TimingTree
from .config import StarkConfig
from .ctl import (CtlCheckVars, cross_table_lookup_data,
                  ctl_check_vars_per_table, eval_cross_table_lookup_checks,
                  get_grand_product_challenge_set, num_ctl_zs,
                  verify_cross_table_lookups)
from .proof import StarkProofChallenges
from .stark import ConstraintConsumer, Stark, StarkEvaluationVars

P = gl64.ORDER_INT


@dataclass
class MultiStarkOpeningSet:
    """Per-table openings (evm/src/proof.rs:209): permutation and CTL Z
    polys share one oracle; CTL Zs additionally open at g^{n-1} (base
    field) so the verifier can multiply final products across tables."""

    local_values: np.ndarray        # (COLUMNS, 2) at zeta
    next_values: np.ndarray         # (COLUMNS, 2) at g*zeta
    permutation_ctl_zs: np.ndarray  # (num_perm+num_ctl, 2) at zeta
    permutation_ctl_zs_next: np.ndarray
    ctl_zs_last: np.ndarray         # (num_ctl,) base felts at g^{n-1}
    quotient_polys: np.ndarray      # (num_quotient, 2) at zeta

    def to_fri_openings(self) -> FriOpenings:
        """(proof.rs:261): zeta batch, g*zeta batch, then the g^{n-1} batch
        holding only the CTL Zs (embedded into the extension)."""
        last_ext = np.zeros((len(self.ctl_zs_last), 2), np.uint64)
        last_ext[:, 0] = self.ctl_zs_last
        return FriOpenings(batches=[
            FriOpeningBatch(values=np.concatenate(
                [self.local_values, self.permutation_ctl_zs,
                 self.quotient_polys])),
            FriOpeningBatch(values=np.concatenate(
                [self.next_values, self.permutation_ctl_zs_next])),
            FriOpeningBatch(values=last_ext),
        ])


@dataclass
class MultiTableStarkProof:
    """(evm/src/proof.rs:87 StarkProof + :? StarkProofWithMetadata: the
    challenger state at the start of this table's transcript phases,
    recorded so per-table wrapper circuits can be proven independently
    and chained by state equality — evm/src/prover.rs compact())."""

    trace_cap: object
    permutation_ctl_zs_cap: object
    quotient_polys_cap: object
    openings: MultiStarkOpeningSet
    opening_proof: FriProof
    degree_bits: int
    init_challenger_state: np.ndarray = None


@dataclass
class MultiProof:
    """(evm/src/proof.rs:24 AllProof) — one proof per table; the CTL
    challenges are re-derived by the verifier from the trace caps."""

    stark_proofs: list

    def degree_bits(self) -> list:
        return [p.degree_bits for p in self.stark_proofs]


def fri_instance_ctl(stark: Stark, zeta: np.ndarray, g: int,
                     degree_bits: int, num_perm_zs: int, num_ctl: int,
                     config: StarkConfig) -> FriInstanceInfo:
    """(evm/src/stark.rs:83) oracles: trace | perm+ctl Zs | quotient;
    batches: zeta, g*zeta, g^{n-1} (CTL Zs only)."""
    num_zs = num_perm_zs + num_ctl
    oracles = [FriOracleInfo(stark.COLUMNS, False),
               FriOracleInfo(num_zs, False),
               FriOracleInfo(stark.num_quotient_polys(config), False)]
    trace_info = FriPolynomialInfo.from_range(0, 0, stark.COLUMNS)
    zs_info = FriPolynomialInfo.from_range(1, 0, num_zs)
    ctl_info = FriPolynomialInfo.from_range(1, num_perm_zs, num_zs)
    quotient_info = FriPolynomialInfo.from_range(
        2, 0, stark.num_quotient_polys(config))
    zeta = np.asarray(zeta, np.uint64)
    zeta_next = gl64ext.scalar_mul(zeta, np.uint64(g))
    last = pow(g, P - 2, P)  # g^{n-1} = g^{-1}
    last_ext = np.array([last, 0], np.uint64)
    return FriInstanceInfo(
        oracles=oracles,
        batches=[
            FriBatchInfo(point=zeta,
                         polynomials=trace_info + zs_info + quotient_info),
            FriBatchInfo(point=zeta_next, polynomials=trace_info + zs_info),
            FriBatchInfo(point=last_ext, polynomials=ctl_info),
        ],
    )


def prove_multi_table(starks: list, ctls: list, config: StarkConfig,
                      trace_poly_values: list, public_inputs: list = None,
                      timing: TimingTree = None,
                      mesh_groups: list = None) -> MultiProof:
    """(evm/src/prover.rs:94 prove_with_traces) trace_poly_values: per
    table an (COLUMNS, n) u64 array of subgroup evaluations.

    mesh_groups: optionally a list of device sub-meshes
    (parallel.groups.device_groups) — trace commitments then run
    expert-parallel, table t on group t % len(groups), concurrently
    across the pod and bit-identical to the single-chip path.
    """
    timing = timing or TimingTree()
    num_tables = len(starks)
    if public_inputs is None:
        public_inputs = [np.zeros(0, np.uint64)] * num_tables
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height

    with timing.scope("compute all trace commitments"):
        if mesh_groups:
            from ..parallel.groups import grouped_trace_commitments
            trace_commitments = grouped_trace_commitments(
                trace_poly_values, rate_bits, cap_height, mesh_groups)
        else:
            trace_commitments = [
                PolynomialBatch.from_values(GF.from_u64(t), rate_bits, False,
                                            cap_height, hasher=config.hasher)
                for t in trace_poly_values]

    challenger = Challenger(permutation_for(config.hasher))
    for c in trace_commitments:
        challenger.observe_cap(c.merkle_tree.cap)

    ctl_challenges = get_grand_product_challenge_set(
        challenger, config.num_challenges)
    with timing.scope("compute CTL data"):
        ctl_data_per_table = cross_table_lookup_data(
            trace_poly_values, ctls, ctl_challenges)

    stark_proofs = []
    for i, stark in enumerate(starks):
        # boundary compact: makes the shared transcript identical whether
        # tables are verified monolithically or by independent wrapper
        # circuits seeded from this state (evm/src/prover.rs:262)
        init_state = challenger.compact()
        with timing.scope(f"prove table {i}"):
            p = prove_single_table(
                stark, config, trace_poly_values[i], trace_commitments[i],
                ctl_data_per_table[i], public_inputs[i], challenger, timing)
            p.init_challenger_state = init_state
            stark_proofs.append(p)
    return MultiProof(stark_proofs)


def prove_single_table(stark: Stark, config: StarkConfig,
                       trace_np: np.ndarray, trace_commitment,
                       ctl_data, public_inputs: np.ndarray,
                       challenger: Challenger,
                       timing: TimingTree = None) -> MultiTableStarkProof:
    """(evm/src/prover.rs:288) — continues the shared challenger."""
    degree = trace_np.shape[-1]
    degree_bits = log2_strict(degree)
    fri_params = config.fri_params(degree_bits)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    assert fri_params.total_arities() <= degree_bits + rate_bits - cap_height

    # permutation challenges + Z polys, then CTL Zs share the commitment
    challenge_sets = None
    num_perm_zs = 0
    perm_z_polys = np.zeros((0, degree), np.uint64)
    if stark.uses_permutation_args():
        from .permutation import (compute_permutation_z_polys,
                                  get_n_permutation_challenge_sets)
        challenge_sets = get_n_permutation_challenge_sets(
            challenger, config.num_challenges, stark.permutation_batch_size())
        perm_z_polys = compute_permutation_z_polys(
            stark, config, trace_np, challenge_sets)
        num_perm_zs = perm_z_polys.shape[0]

    assert len(ctl_data) > 0, "no CTL Zs for this table"
    z_polys = np.concatenate([perm_z_polys, ctl_data.z_polys()], axis=0)
    zs_commitment = PolynomialBatch.from_values(
        GF.from_u64(z_polys), rate_bits, False, cap_height,
        hasher=config.hasher)
    challenger.observe_cap(zs_commitment.merkle_tree.cap)

    alphas = challenger.get_n_challenges(config.num_challenges)
    quotient_chunks = _compute_quotient_polys_ctl(
        stark, trace_commitment, zs_commitment, public_inputs, alphas,
        degree_bits, config, num_perm_zs, ctl_data, challenge_sets)
    quotient_commitment = PolynomialBatch.from_coeffs(
        quotient_chunks, rate_bits, False, cap_height,
        hasher=config.hasher)
    challenger.observe_cap(quotient_commitment.merkle_tree.cap)

    zeta_np = challenger.get_extension_challenge()
    g = gl64.primitive_root_of_unity(degree_bits)
    zeta = GF2.from_u64_pair(zeta_np[0], zeta_np[1])
    zeta_g = zeta * GF.full((), g)
    last = pow(g, P - 2, P)
    last_ext = GF2.from_u64_pair(np.uint64(last), np.uint64(0))
    zpow = powers_ext(zeta, degree)
    zgpow = powers_ext(zeta_g, degree)
    lastpow = powers_ext(last_ext, degree)

    zs_at_last = eval_polys_at_ext(zs_commitment.polynomials, lastpow).to_u64()
    openings = MultiStarkOpeningSet(
        local_values=eval_polys_at_ext(
            trace_commitment.polynomials, zpow).to_u64(),
        next_values=eval_polys_at_ext(
            trace_commitment.polynomials, zgpow).to_u64(),
        permutation_ctl_zs=eval_polys_at_ext(
            zs_commitment.polynomials, zpow).to_u64(),
        permutation_ctl_zs_next=eval_polys_at_ext(
            zs_commitment.polynomials, zgpow).to_u64(),
        ctl_zs_last=zs_at_last[num_perm_zs:, 0].copy(),
        quotient_polys=eval_polys_at_ext(
            quotient_commitment.polynomials, zpow).to_u64(),
    )
    for batch in openings.to_fri_openings().batches:
        for v in batch.values:
            challenger.observe_extension_element(v)

    opening_proof = PolynomialBatch.prove_openings(
        fri_instance_ctl(stark, zeta_np, g, degree_bits, num_perm_zs,
                         len(ctl_data), config),
        [trace_commitment, zs_commitment, quotient_commitment],
        challenger, fri_params)

    return MultiTableStarkProof(
        trace_cap=trace_commitment.merkle_tree.cap,
        permutation_ctl_zs_cap=zs_commitment.merkle_tree.cap,
        quotient_polys_cap=quotient_commitment.merkle_tree.cap,
        openings=openings,
        opening_proof=opening_proof,
        degree_bits=degree_bits,
    )


def _compute_quotient_polys_ctl(stark: Stark, trace_commitment,
                                zs_commitment, public_inputs, alphas,
                                degree_bits: int, config, num_perm_zs: int,
                                ctl_data, challenge_sets) -> GF:
    """Quotient over the whole coset in one batched pass (stark analogue of
    evm/src/prover.rs:471), with permutation + CTL Z checks folded in."""
    import jax.numpy as jnp

    degree = 1 << degree_bits
    rate_bits = config.fri_config.rate_bits
    qdb = (stark.quotient_degree_factor() - 1).bit_length()
    assert qdb <= rate_bits
    step = 1 << (rate_bits - qdb)
    next_step = 1 << qdb

    def lde_pair(commitment):
        vals = commitment.lde_values_natural()[:, ::step]
        nxt = GF(jnp.roll(vals.lo, -next_step, axis=-1),
                 jnp.roll(vals.hi, -next_step, axis=-1))
        return vals, nxt

    trace, trace_next = lde_pair(trace_commitment)
    zs, zs_next = lde_pair(zs_commitment)

    big = gl64.two_adic_subgroup(degree_bits + qdb)
    xs = GF.from_u64(gl64.mul(big, np.uint64(COSET_SHIFT)))
    last = pow(gl64.primitive_root_of_unity(degree_bits), P - 2, P)
    z_last = xs - GF.full((), last)

    from ..plonk.prover import _z_h_on_coset
    zh = _z_h_on_coset(degree_bits, qdb)
    zh_tiled = GF.from_u64(np.tile(zh, degree))
    n_c = GF.full((), degree)
    lag_first = zh_tiled * batch_inv((xs - GF.ones(())) * n_c)
    lag_last = zh_tiled * batch_inv((xs - GF.full((), last)) * n_c)

    ctx = BaseBatchCtx()
    vars = StarkEvaluationVars(
        local_values=[trace[i] for i in range(stark.COLUMNS)],
        next_values=[trace_next[i] for i in range(stark.COLUMNS)],
        public_inputs=[GF.full((), int(pi)) for pi in public_inputs],
    )
    consumer = ConstraintConsumer(ctx, alphas, z_last, lag_first, lag_last)
    stark.eval_generic(ctx, vars, consumer)
    if num_perm_zs:
        from .permutation import eval_permutation_checks
        eval_permutation_checks(
            ctx, stark, config, vars,
            [zs[i] for i in range(num_perm_zs)],
            [zs_next[i] for i in range(num_perm_zs)],
            challenge_sets, consumer)
    ctl_vars = [
        CtlCheckVars(zs[num_perm_zs + i], zs_next[num_perm_zs + i],
                     zc.challenge, zc.columns, zc.filter_column)
        for i, zc in enumerate(ctl_data.zs_columns)]
    eval_cross_table_lookup_checks(ctx, vars, ctl_vars, consumer)

    zh_inv_tiled = GF.from_u64(np.tile(gl64.batch_inv(zh), degree))
    quotient_values = GF.stack(
        [acc * zh_inv_tiled for acc in consumer.accumulators()], axis=0)
    quotient_coeffs = ntt.coset_intt(quotient_values, COSET_SHIFT)
    qdf = stark.quotient_degree_factor()
    chunks = quotient_coeffs.reshape(config.num_challenges, 1 << qdb, degree)
    chunks = chunks[:, :qdf, :]
    return chunks.reshape(config.num_challenges * qdf, degree)


def _get_challenges_multi(starks: list, proof: MultiProof,
                          config: StarkConfig) -> tuple:
    """Replay the shared transcript (evm/src/get_challenges.rs:18)."""
    challenger = Challenger(permutation_for(config.hasher))
    for p in proof.stark_proofs:
        challenger.observe_cap(p.trace_cap)
    ctl_challenges = get_grand_product_challenge_set(
        challenger, config.num_challenges)

    all_challenges = []
    for stark, p in zip(starks, proof.stark_proofs):
        challenger.compact()  # boundary, mirrors the prover
        challenge_sets = None
        if stark.uses_permutation_args():
            from .permutation import get_n_permutation_challenge_sets
            challenge_sets = get_n_permutation_challenge_sets(
                challenger, config.num_challenges,
                stark.permutation_batch_size())
        challenger.observe_cap(p.permutation_ctl_zs_cap)
        alphas = challenger.get_n_challenges(config.num_challenges)
        challenger.observe_cap(p.quotient_polys_cap)
        zeta = challenger.get_extension_challenge()
        for batch in p.openings.to_fri_openings().batches:
            for v in batch.values:
                challenger.observe_extension_element(v)
        fri = fri_challenges(
            challenger, p.opening_proof.commit_phase_merkle_caps,
            p.opening_proof.final_poly, p.opening_proof.pow_witness,
            p.degree_bits, config.fri_config)
        all_challenges.append(
            StarkProofChallenges(alphas, zeta, fri, challenge_sets))
    return ctl_challenges, all_challenges


def verify_multi_table(starks: list, ctls: list, proof: MultiProof,
                       config: StarkConfig,
                       public_inputs: list = None) -> None:
    """(evm/src/verifier.rs:29 verify_proof)"""
    num_tables = len(starks)
    if public_inputs is None:
        public_inputs = [np.zeros(0, np.uint64)] * num_tables
    ctl_challenges, all_challenges = _get_challenges_multi(
        starks, proof, config)

    zs_per_table = []
    for i, (stark, p) in enumerate(zip(starks, proof.stark_proofs)):
        num_perm = (stark.num_permutation_batches(config)
                    if stark.uses_permutation_args() else 0)
        expected_ctl = num_ctl_zs(ctls, i, config.num_challenges)
        openings = p.openings
        assert openings.permutation_ctl_zs.shape[0] == num_perm + expected_ctl
        assert openings.ctl_zs_last.shape[0] == expected_ctl
        zs_per_table.append([
            (E2(openings.permutation_ctl_zs[j]),
             E2(openings.permutation_ctl_zs_next[j]))
            for j in range(num_perm, num_perm + expected_ctl)])
    ctl_vars_per_table = ctl_check_vars_per_table(
        ctls, ctl_challenges, num_tables, zs_per_table)

    for i, (stark, p) in enumerate(zip(starks, proof.stark_proofs)):
        _verify_single_table(stark, p, all_challenges[i],
                             ctl_vars_per_table[i], public_inputs[i], config)

    verify_cross_table_lookups(
        ctls, [p.openings.ctl_zs_last for p in proof.stark_proofs],
        config.num_challenges)


def _verify_single_table(stark: Stark, proof: MultiTableStarkProof,
                         challenges: StarkProofChallenges, ctl_vars: list,
                         public_inputs: np.ndarray,
                         config: StarkConfig) -> None:
    """(evm/src/verifier.rs:116 verify_stark_proof_with_challenges)"""
    openings = proof.openings
    degree_bits = proof.degree_bits
    ctx = ExtCtx()
    zeta = E2(challenges.stark_zeta)
    degree = 1 << degree_bits
    g = gl64.primitive_root_of_unity(degree_bits)

    zeta_pow_n = zeta.pow_const(degree)
    z_h_zeta = zeta_pow_n - ctx.one()
    last = pow(g, P - 2, P)
    z_last = zeta - ctx.constant(last)
    l_first = z_h_zeta * ((zeta - ctx.one()) * ctx.constant(degree)).inv()
    l_last = z_h_zeta * ((zeta - ctx.constant(last))
                         * ctx.constant(degree)).inv()

    vars = StarkEvaluationVars(
        local_values=[E2(v) for v in openings.local_values],
        next_values=[E2(v) for v in openings.next_values],
        public_inputs=[ctx.constant(int(pi)) for pi in public_inputs],
    )
    consumer = ConstraintConsumer(ctx, challenges.stark_alphas, z_last,
                                  l_first, l_last)
    stark.eval_generic(ctx, vars, consumer)
    num_perm = (stark.num_permutation_batches(config)
                if stark.uses_permutation_args() else 0)
    if num_perm:
        from .permutation import eval_permutation_checks
        eval_permutation_checks(
            ctx, stark, config, vars,
            [E2(v) for v in openings.permutation_ctl_zs[:num_perm]],
            [E2(v) for v in openings.permutation_ctl_zs_next[:num_perm]],
            challenges.permutation_challenge_sets, consumer)
    eval_cross_table_lookup_checks(ctx, vars, ctl_vars, consumer)
    vanishing = consumer.accumulators()

    qdf = stark.quotient_degree_factor()
    for i, v in enumerate(vanishing):
        chunk = openings.quotient_polys[i * qdf:(i + 1) * qdf]
        acc = ctx.zero()
        for c in chunk[::-1]:
            acc = acc * zeta_pow_n + E2(c)
        assert v.equals(z_h_zeta * acc), \
            f"multi-table vanishing check failed (table challenge {i})"

    verify_fri_proof(
        fri_instance_ctl(stark, challenges.stark_zeta, g, degree_bits,
                         num_perm, len(ctl_vars), config),
        openings.to_fri_openings(),
        challenges.fri_challenges,
        [proof.trace_cap, proof.permutation_ctl_zs_cap,
         proof.quotient_polys_cap],
        proof.opening_proof,
        config.fri_params(degree_bits),
    )
