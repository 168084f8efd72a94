"""End-to-end FRI test: commit a batch of polynomials, open at two extension
points, prove, and verify on the host — the same protocol flow the PLONK
prover drives (reference fri/oracle.rs:162, fri/verifier.rs:61)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64, gl64ext
from plonky2_tpu.field.extension import GF2
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.field.polynomial import eval_polys_at_ext, powers_ext
from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.fri.oracle import PolynomialBatch
from plonky2_tpu.fri.structure import (
    FriBatchInfo,
    FriInstanceInfo,
    FriOpeningBatch,
    FriOpenings,
    FriOracleInfo,
    FriPolynomialInfo,
)
from plonky2_tpu.fri.verifier import fri_challenges, verify_fri_proof
from plonky2_tpu.iop.challenger import Challenger

P = gl64.ORDER_INT


def small_config():
    return FriConfig(
        rate_bits=3,
        cap_height=2,
        proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(2, 3),
        num_query_rounds=12,
    )


def test_fri_commit_open_verify(rng):
    degree_bits = 6
    n = 1 << degree_bits
    num_polys = 5
    config = small_config()
    params = config.fri_params(degree_bits)

    values = rng.integers(0, P, size=(num_polys, n), dtype=np.uint64)
    oracle = PolynomialBatch.from_values(GF.from_u64(values), config.rate_bits,
                                         False, config.cap_height)

    # --- prover transcript ---
    challenger = Challenger()
    challenger.observe_cap(oracle.merkle_tree.cap)
    zeta_np = challenger.get_extension_challenge()
    zeta = GF2.from_u64_pair(zeta_np[0], zeta_np[1])
    g = gl64.primitive_root_of_unity(degree_bits)
    zeta_g = zeta * GF.full((), g)
    zeta_g_np = zeta_g.to_u64()

    instance = FriInstanceInfo(
        oracles=[FriOracleInfo(num_polys=num_polys, blinding=False)],
        batches=[
            FriBatchInfo(point=zeta_np,
                         polynomials=FriPolynomialInfo.from_range(0, 0, num_polys)),
            FriBatchInfo(point=zeta_g_np,
                         polynomials=FriPolynomialInfo.from_range(0, 0, 2)),
        ],
    )

    # openings: evaluate the committed polynomials at both points
    zp = powers_ext(zeta, n)
    vals_zeta = eval_polys_at_ext(oracle.polynomials, zp).to_u64()  # (k, 2)
    zgp = powers_ext(zeta_g, n)
    vals_zeta_g = eval_polys_at_ext(oracle.polynomials[:2], zgp).to_u64()
    openings = FriOpenings(batches=[FriOpeningBatch(vals_zeta),
                                    FriOpeningBatch(vals_zeta_g)])
    for batch in openings.batches:
        for v in batch.values:
            challenger.observe_extension_element(v)

    proof = PolynomialBatch.prove_openings(instance, [oracle], challenger, params)

    # --- verifier transcript (fresh challenger, replayed) ---
    v_challenger = Challenger()
    v_challenger.observe_cap(oracle.merkle_tree.cap)
    v_zeta = v_challenger.get_extension_challenge()
    np.testing.assert_array_equal(v_zeta, zeta_np)
    for batch in openings.batches:
        for v in batch.values:
            v_challenger.observe_extension_element(v)
    challenges = fri_challenges(v_challenger, proof.commit_phase_merkle_caps,
                                proof.final_poly, proof.pow_witness,
                                degree_bits, config)
    verify_fri_proof(instance, openings, challenges,
                     [oracle.merkle_tree.cap], proof, params)


def test_fri_rejects_wrong_openings(rng):
    degree_bits = 5
    n = 1 << degree_bits
    config = small_config()
    params = config.fri_params(degree_bits)
    values = rng.integers(0, P, size=(3, n), dtype=np.uint64)
    oracle = PolynomialBatch.from_values(GF.from_u64(values), config.rate_bits,
                                         False, config.cap_height)
    challenger = Challenger()
    challenger.observe_cap(oracle.merkle_tree.cap)
    zeta_np = challenger.get_extension_challenge()
    zeta = GF2.from_u64_pair(zeta_np[0], zeta_np[1])
    instance = FriInstanceInfo(
        oracles=[FriOracleInfo(num_polys=3, blinding=False)],
        batches=[FriBatchInfo(point=zeta_np,
                              polynomials=FriPolynomialInfo.from_range(0, 0, 3))],
    )
    vals = eval_polys_at_ext(oracle.polynomials, powers_ext(zeta, n)).to_u64()
    openings = FriOpenings(batches=[FriOpeningBatch(vals)])
    for v in openings.batches[0].values:
        challenger.observe_extension_element(v)
    proof = PolynomialBatch.prove_openings(instance, [oracle], challenger, params)

    # corrupt one claimed opening
    bad = FriOpenings(batches=[FriOpeningBatch(vals.copy())])
    bad.batches[0].values[0][0] = gl64.add(bad.batches[0].values[0][0], np.uint64(1))
    v_challenger = Challenger()
    v_challenger.observe_cap(oracle.merkle_tree.cap)
    v_challenger.get_extension_challenge()
    for v in bad.batches[0].values:
        v_challenger.observe_extension_element(v)
    challenges = fri_challenges(v_challenger, proof.commit_phase_merkle_caps,
                                proof.final_poly, proof.pow_witness,
                                degree_bits, config)
    with pytest.raises(AssertionError):
        verify_fri_proof(instance, bad, challenges,
                         [oracle.merkle_tree.cap], proof, params)
