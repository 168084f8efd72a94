"""STARK prover (twin of reference starky/src/prover.rs:32-318).

Same pipeline as the reference; the constraint evaluation runs once over
the whole quotient coset as batched device work instead of packed-SIMD
point batches."""

from __future__ import annotations

import numpy as np

from ..field import gl64, ntt
from ..field.extension import GF2
from ..field.goldilocks import GF, batch_inv
from ..field.polynomial import eval_polys_at_ext, powers_ext
from ..fri.oracle import COSET_SHIFT, PolynomialBatch
from ..iop.challenger import Challenger, permutation_for
from ..plonk.gates.base import BaseBatchCtx
from ..utils.bits import log2_strict
from .config import StarkConfig
from .proof import StarkOpeningSet, StarkProof, StarkProofWithPublicInputs
from .stark import ConstraintConsumer, Stark, StarkEvaluationVars

P = gl64.ORDER_INT


def prove(stark: Stark, config: StarkConfig, trace_poly_values: GF,
          public_inputs: np.ndarray, timing=None,
          trace_commitment=None, mesh=None) -> StarkProofWithPublicInputs:
    """trace_poly_values: (COLUMNS, degree) evaluations over the subgroup.

    trace_commitment: optionally a precomputed PolynomialBatch of the
    trace (e.g. from a pipelined device group, parallel/groups.py) —
    must equal `from_values(trace_poly_values, ...)`.

    mesh: a jax.sharding.Mesh runs the whole pipeline distributed
    (parallel/stark_prover.py) and returns a byte-identical proof.
    """
    if mesh is not None:
        assert trace_commitment is None, \
            "precomputed commitments are single-device"
        from ..parallel.stark_prover import prove_sharded
        return prove_sharded(stark, config, trace_poly_values,
                             public_inputs, mesh)
    degree = trace_poly_values.shape[-1]
    degree_bits = log2_strict(degree)
    fri_params = config.fri_params(degree_bits)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    assert fri_params.total_arities() <= degree_bits + rate_bits - cap_height

    from ..utils.timing import TimingTree
    if timing is None:
        timing = TimingTree("prove (unreported)")

    if trace_commitment is None:
        with timing.scope("trace commitment (LDE + Merkle)"):
            trace_commitment = PolynomialBatch.from_values(
                trace_poly_values, rate_bits, False, cap_height,
                hasher=config.hasher)
    challenger = Challenger(permutation_for(config.hasher))
    challenger.observe_cap(trace_commitment.merkle_tree.cap)

    # permutation arguments (starky/src/prover.rs:75-112)
    perm_zs_commitment = None
    challenge_sets = None
    if stark.uses_permutation_args():
        from .permutation import (compute_permutation_z_polys_gf,
                                  get_n_permutation_challenge_sets)
        challenge_sets = get_n_permutation_challenge_sets(
            challenger, config.num_challenges, stark.permutation_batch_size())
        with timing.scope("permutation Z polys (device)"):
            z_polys_gf = compute_permutation_z_polys_gf(
                stark, config, trace_poly_values, challenge_sets)
        with timing.scope("permutation Z commitment"):
            perm_zs_commitment = PolynomialBatch.from_values(
                z_polys_gf, rate_bits, False, cap_height,
                hasher=config.hasher)
        challenger.observe_cap(perm_zs_commitment.merkle_tree.cap)

    alphas = challenger.get_n_challenges(config.num_challenges)

    with timing.scope("quotient values + coefficients"):
        quotient_chunks = _compute_quotient_polys(
            stark, trace_commitment, public_inputs, alphas, degree_bits,
            config, perm_zs_commitment, challenge_sets)
    with timing.scope("quotient commitment"):
        quotient_commitment = PolynomialBatch.from_coeffs(
            quotient_chunks, rate_bits, False, cap_height,
            hasher=config.hasher)
    challenger.observe_cap(quotient_commitment.merkle_tree.cap)

    zeta_np = challenger.get_extension_challenge()
    g = gl64.primitive_root_of_unity(degree_bits)
    zeta = GF2.from_u64_pair(zeta_np[0], zeta_np[1])
    zeta_g = zeta * GF.full((), g)
    with timing.scope("openings at zeta / g*zeta"):
        zpow = powers_ext(zeta, degree)
        zgpow = powers_ext(zeta_g, degree)
        openings = StarkOpeningSet(
            local_values=eval_polys_at_ext(trace_commitment.polynomials,
                                           zpow).to_u64(),
            next_values=eval_polys_at_ext(trace_commitment.polynomials,
                                          zgpow).to_u64(),
            quotient_polys=eval_polys_at_ext(quotient_commitment.polynomials,
                                             zpow).to_u64(),
            permutation_zs=eval_polys_at_ext(perm_zs_commitment.polynomials,
                                             zpow).to_u64()
            if perm_zs_commitment else None,
            permutation_zs_next=eval_polys_at_ext(
                perm_zs_commitment.polynomials, zgpow).to_u64()
            if perm_zs_commitment else None,
        )
    for batch in openings.to_fri_openings().batches:
        for v in batch.values:
            challenger.observe_extension_element(v)

    commitments = [trace_commitment]
    if perm_zs_commitment is not None:
        commitments.append(perm_zs_commitment)
    commitments.append(quotient_commitment)
    with timing.scope("FRI opening proof"):
        opening_proof = PolynomialBatch.prove_openings(
            stark.fri_instance(zeta_np, g, config), commitments,
            challenger, fri_params, timing=timing)

    proof = StarkProof(
        trace_cap=trace_commitment.merkle_tree.cap,
        quotient_polys_cap=quotient_commitment.merkle_tree.cap,
        openings=openings,
        opening_proof=opening_proof,
        permutation_zs_cap=perm_zs_commitment.merkle_tree.cap
        if perm_zs_commitment else None,
    )
    return StarkProofWithPublicInputs(proof, np.asarray(public_inputs, np.uint64))


_Q_JIT_CACHE: dict = {}


def _compute_quotient_polys(stark: Stark, trace_commitment, public_inputs,
                            alphas, degree_bits: int, config,
                            perm_zs_commitment=None, challenge_sets=None) -> GF:
    """Whole-coset quotient as ONE jitted program per (stark, shape):
    alphas, public inputs, and permutation challenges enter as TRACED
    arrays so fresh Fiat-Shamir values never retrace, and the hundreds
    of constraint-evaluation ops never dispatch eagerly over a tunneled
    device."""
    import jax

    degree = 1 << degree_bits
    rate_bits = config.fri_config.rate_bits
    qdb = (stark.quotient_degree_factor() - 1).bit_length()
    assert qdb <= rate_bits
    step = 1 << (rate_bits - qdb)
    next_step = 1 << qdb

    trace = trace_commitment.lde_values_natural()[:, ::step]  # (COLS, size)
    perm = (perm_zs_commitment.lde_values_natural()[:, ::step]
            if perm_zs_commitment is not None else None)

    alphas_np = np.asarray([int(a) for a in alphas], np.uint64)
    pis_np = np.asarray([int(pi) for pi in public_inputs], np.uint64)
    with_perm = perm is not None
    ch_np = None
    if challenge_sets is not None:
        ch_np = np.array([[(int(b), int(g)) for (b, g) in cs]
                          for cs in challenge_sets], np.uint64)

    key = (id(stark), degree_bits, config.num_challenges, with_perm,
           None if ch_np is None else ch_np.shape, trace.shape)
    fn = _Q_JIT_CACHE.get(key)
    if fn is None:
        def run(trace, perm, al, pis, ch):
            import jax.numpy as jnp
            trace_next = GF(jnp.roll(trace.lo, -next_step, axis=-1),
                            jnp.roll(trace.hi, -next_step, axis=-1))
            big = gl64.two_adic_subgroup(degree_bits + qdb)
            xs = GF.from_u64(gl64.mul(big, np.uint64(COSET_SHIFT)))
            last = pow(gl64.primitive_root_of_unity(degree_bits), P - 2, P)
            z_last = xs - GF.full((), last)

            # L_0 = Z_H/(n(x-1)), L_{n-1} = Z_H/(n(x-g^{n-1}))
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
                public_inputs=[pis[i] for i in range(len(pis_np))],
            )
            consumer = ConstraintConsumer(
                ctx, [al[i] for i in range(len(alphas_np))], z_last,
                lag_first, lag_last)
            stark.eval_generic(ctx, vars, consumer)
            if with_perm:
                perm_next = GF(jnp.roll(perm.lo, -next_step, axis=-1),
                               jnp.roll(perm.hi, -next_step, axis=-1))
                cs = [[(ch[si, ci, 0], ch[si, ci, 1])
                       for ci in range(ch_np.shape[1])]
                      for si in range(ch_np.shape[0])]
                from .permutation import eval_permutation_checks
                eval_permutation_checks(
                    ctx, stark, config, vars,
                    [perm[i] for i in range(perm.shape[0])],
                    [perm_next[i] for i in range(perm_next.shape[0])],
                    cs, consumer)

            zh_inv_tiled = GF.from_u64(np.tile(gl64.batch_inv(zh), degree))
            quotient_values = GF.stack(
                [acc * zh_inv_tiled for acc in consumer.accumulators()],
                axis=0)
            quotient_coeffs = ntt.coset_intt(quotient_values, COSET_SHIFT)
            # trim to qdf*degree (the chunks beyond are zero) per challenge
            qdf = stark.quotient_degree_factor()
            chunks = quotient_coeffs.reshape(
                config.num_challenges, 1 << qdb, degree)
            chunks = chunks[:, :qdf, :]
            return chunks.reshape(config.num_challenges * qdf, degree)

        # jit only off-CPU (XLA:CPU pathological-compile guard)
        _Q_JIT_CACHE[key] = fn = (
            jax.jit(run) if jax.default_backend() != "cpu" else run)

    return fn(trace, perm,
              GF.from_u64(alphas_np), GF.from_u64(pis_np),
              None if ch_np is None else GF.from_u64(ch_np))
