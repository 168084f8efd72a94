"""End-to-end distributed multi-table STARK prover (zkEVM pipeline).

Mesh twin of `stark/multi.py prove_multi_table` (reference
evm/src/prover.rs:94 prove_with_traces): EVERY per-table phase —
trace commitment, permutation+CTL Z commitment, quotient evaluation,
openings, and the FRI opening proof — runs sharded over the device
mesh, composing the same stages `parallel/stark_prover.py` proved
byte-identical for the single-table pipeline:

  * commitments via `sharded_batch_commit` (poly-sharded IFFT/LDE, one
    all_to_all to row sharding, on-mesh Merkle reduce);
  * quotient via `sharded_stark_quotient_values` in multi-table mode
    (row-sharded constraint eval with a ppermute halo; permutation AND
    cross-table-lookup running-product checks fold into the same
    accumulators — stark/multi.py:272's sharded twin);
  * openings at zeta / g*zeta / g^{n-1} via per-device polynomial
    evaluation (`ShardedPolynomialBatch.eval_at_powers`);
  * FRI via `sharded_prove_openings` (alpha-composition reduce over
    sharded coefficients + sharded commit/fold/query).

Host-side remains only what is genuinely cross-table or tiny: the one
shared Fiat–Shamir challenger, CTL Z-column construction
(`cross_table_lookup_data` — a per-column scan over ALL tables' traces
whose output is a handful of polynomials), and the per-table
permutation Z scan.  The proof is byte-identical to the single-chip
`prove_multi_table` (tests/test_distributed_multi.py asserts equality
through `zkevm/serialization.py`), for the same reason as the
single-table case: every value that reaches the transcript is
canonicalised, and exact-arithmetic re-bracketing cannot change it.
"""

from __future__ import annotations

import numpy as np

from ..field import gl64
from ..field.extension import GF2
from ..field.goldilocks import GF
from ..field.polynomial import powers_ext
from ..fri.oracle import COSET_SHIFT
from ..field import ntt
from ..iop.challenger import Challenger, permutation_for
from ..stark.config import StarkConfig
from ..stark.ctl import (cross_table_lookup_data,
                         get_grand_product_challenge_set)
from ..stark.multi import (MultiProof, MultiStarkOpeningSet,
                           MultiTableStarkProof, fri_instance_ctl)
from ..utils.bits import log2_strict
from ..utils.timing import TimingTree
from .prover import sharded_stark_quotient_values
from .stark_prover import sharded_batch_commit, sharded_prove_openings

P = gl64.ORDER_INT


def prove_multi_table_sharded(starks: list, ctls: list, config: StarkConfig,
                              trace_poly_values: list,
                              public_inputs: list = None, *, mesh,
                              axis: str = "d",
                              timing: TimingTree = None) -> MultiProof:
    """Distributed twin of stark/multi.py prove_multi_table: same shared
    transcript (all trace caps observed, then CTL challenges, then each
    table proven in order — evm/src/get_challenges.rs:18), byte-identical
    MultiProof."""
    timing = timing or TimingTree()
    num_tables = len(starks)
    if public_inputs is None:
        public_inputs = [np.zeros(0, np.uint64)] * num_tables
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    assert config.hasher == "poseidon", \
        "the sharded prover commits with device Poseidon"

    def step_of(stark):
        qdb = (stark.quotient_degree_factor() - 1).bit_length()
        assert qdb <= rate_bits
        return 1 << (rate_bits - qdb), qdb

    with timing.scope("compute all trace commitments (sharded)"):
        trace_commitments = []
        for stark, t in zip(starks, trace_poly_values):
            step, _ = step_of(stark)
            trace_commitments.append(sharded_batch_commit(
                GF.from_u64(np.asarray(t, np.uint64)), rate_bits, cap_height,
                mesh, axis, quotient_step=step))

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
        init_state = challenger.compact()
        with timing.scope(f"prove table {i} (sharded)"):
            p = _prove_single_table_sharded(
                stark, config, trace_poly_values[i], trace_commitments[i],
                ctl_data_per_table[i], public_inputs[i], challenger,
                mesh, axis)
            p.init_challenger_state = init_state
            stark_proofs.append(p)
    return MultiProof(stark_proofs)


def _prove_single_table_sharded(stark, config: StarkConfig,
                                trace_np: np.ndarray, trace_commitment,
                                ctl_data, public_inputs: np.ndarray,
                                challenger: Challenger, mesh,
                                axis: str) -> MultiTableStarkProof:
    """(stark/multi.py prove_single_table, every phase on the mesh)."""
    degree = np.asarray(trace_np).shape[-1]
    degree_bits = log2_strict(degree)
    fri_params = config.fri_params(degree_bits)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    assert fri_params.total_arities() <= degree_bits + rate_bits - cap_height

    qdb = (stark.quotient_degree_factor() - 1).bit_length()
    step = 1 << (rate_bits - qdb)

    # permutation Zs (host scan, same source as the single-chip multi
    # prover) + CTL Zs share one commitment (evm/src/prover.rs:310)
    challenge_sets = None
    num_perm_zs = 0
    perm_z_polys = np.zeros((0, degree), np.uint64)
    if stark.uses_permutation_args():
        from ..stark.permutation import (compute_permutation_z_polys,
                                         get_n_permutation_challenge_sets)
        challenge_sets = get_n_permutation_challenge_sets(
            challenger, config.num_challenges, stark.permutation_batch_size())
        perm_z_polys = compute_permutation_z_polys(
            stark, config, trace_np, challenge_sets)
        num_perm_zs = perm_z_polys.shape[0]

    assert len(ctl_data) > 0, "no CTL Zs for this table"
    z_polys = np.concatenate([perm_z_polys, ctl_data.z_polys()], axis=0)
    zs_commitment = sharded_batch_commit(
        GF.from_u64(z_polys), rate_bits, cap_height, mesh, axis,
        quotient_step=step)
    challenger.observe_cap(zs_commitment.merkle_tree.cap)

    alphas = challenger.get_n_challenges(config.num_challenges)

    # quotient: row-sharded constraint + permutation + CTL checks
    xs = gl64.mul(gl64.two_adic_subgroup(degree_bits + qdb),
                  np.uint64(COSET_SHIFT))
    trace_rows = trace_commitment.strided_lde[: stark.COLUMNS]
    zs_rows = zs_commitment.strided_lde[: zs_commitment.num_polys]
    quotient_values = sharded_stark_quotient_values(
        stark, trace_rows, xs, list(alphas), degree_bits, qdb, mesh, axis,
        public_inputs=public_inputs, perm_lde=zs_rows,
        challenge_sets=challenge_sets, config=config,
        num_perm_zs=num_perm_zs, ctl_zs_columns=ctl_data.zs_columns)
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
    last = pow(int(g), P - 2, P)
    last_ext = GF2.from_u64_pair(np.uint64(last), np.uint64(0))
    zpow = powers_ext(zeta, degree)
    zgpow = powers_ext(zeta_g, degree)
    lastpow = powers_ext(last_ext, degree)

    zs_at_last = zs_commitment.eval_at_powers(lastpow)
    openings = MultiStarkOpeningSet(
        local_values=trace_commitment.eval_at_powers(zpow),
        next_values=trace_commitment.eval_at_powers(zgpow),
        permutation_ctl_zs=zs_commitment.eval_at_powers(zpow),
        permutation_ctl_zs_next=zs_commitment.eval_at_powers(zgpow),
        ctl_zs_last=zs_at_last[num_perm_zs:, 0].copy(),
        quotient_polys=quotient_commitment.eval_at_powers(zpow),
    )
    for batch in openings.to_fri_openings().batches:
        for v in batch.values:
            challenger.observe_extension_element(v)

    opening_proof = sharded_prove_openings(
        fri_instance_ctl(stark, zeta_np, g, degree_bits, num_perm_zs,
                         len(ctl_data), config),
        [trace_commitment, zs_commitment, quotient_commitment],
        challenger, fri_params, mesh, axis)

    return MultiTableStarkProof(
        trace_cap=trace_commitment.merkle_tree.cap,
        permutation_ctl_zs_cap=zs_commitment.merkle_tree.cap,
        quotient_polys_cap=quotient_commitment.merkle_tree.cap,
        openings=openings,
        opening_proof=opening_proof,
        degree_bits=degree_bits,
    )
