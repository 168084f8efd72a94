"""Sharded FRI commit phase on the virtual 8-device CPU mesh: caps, folded
layers, final polynomial, transcript state, and query paths must agree with
the single-chip fri_committed_trees (parallel/fri.py)."""

import numpy as np

from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.extension import GF2
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.fri.config import FriConfig, FriParams, FriReductionStrategy
from plonky2_tpu.fri.oracle import COSET_SHIFT
from plonky2_tpu.fri.prover import fri_committed_trees
from plonky2_tpu.iop.challenger import Challenger
from plonky2_tpu.parallel.fri import sharded_fri_committed_trees
from plonky2_tpu.parallel.mesh import make_mesh


def _params(degree_bits: int, arities) -> FriParams:
    cfg = FriConfig(rate_bits=3, cap_height=2, proof_of_work_bits=0,
                    reduction_strategy=FriReductionStrategy.fixed(arities),
                    num_query_rounds=3)
    return FriParams(cfg, hiding=False, degree_bits=degree_bits,
                     reduction_arity_bits=tuple(arities))


def _lde_codeword(rng, degree_bits: int, rate_bits: int):
    n = 1 << degree_bits
    coeffs = GF2(
        GF.from_u64(rng.integers(0, gl64.ORDER_INT, size=n, dtype=np.uint64)),
        GF.from_u64(rng.integers(0, gl64.ORDER_INT, size=n, dtype=np.uint64)))
    pad = ((1 << rate_bits) - 1) * n
    lde_coeffs = GF2(GF.concatenate([coeffs.a, GF.zeros((pad,))]),
                     GF.concatenate([coeffs.b, GF.zeros((pad,))]))
    values = ntt.lde_ext(coeffs, rate_bits, shift=COSET_SHIFT)
    return lde_coeffs, values


def test_sharded_fri_commit_matches_single_chip():
    rng = np.random.default_rng(7)
    degree_bits = 6
    params = _params(degree_bits, [2, 2])
    lde_coeffs, values = _lde_codeword(rng, degree_bits, 3)

    c1 = Challenger()
    c1.observe_element(17)
    trees1, fc1 = fri_committed_trees(lde_coeffs, values, c1, params)

    c2 = Challenger()
    c2.observe_element(17)
    mesh = make_mesh(8)
    trees2, fc2 = sharded_fri_committed_trees(values, c2, params, mesh)

    assert len(trees1) == len(trees2)
    for t1, t2 in zip(trees1, trees2):
        assert np.array_equal(gl64.to_canonical(t1.cap.data),
                              gl64.to_canonical(t2.cap.data))
        assert np.array_equal(gl64.to_canonical(t1.leaves_np),
                              gl64.to_canonical(t2.leaves_np))
    assert np.array_equal(gl64.to_canonical(np.asarray(fc1, np.uint64)),
                          gl64.to_canonical(np.asarray(fc2, np.uint64)))
    # identical transcripts -> identical downstream challenges
    assert np.array_equal(c1.compact(), c2.compact())

    # query-path extraction from the assembled trees matches
    for idx in (0, 5, 100, 511):
        for t1, t2 in zip(trees1, trees2):
            i = idx % t1.leaves_np.shape[0]
            p1, p2 = t1.prove(i), t2.prove(i)
            assert np.array_equal(gl64.to_canonical(p1.siblings),
                                  gl64.to_canonical(p2.siblings))


def test_sharded_fri_single_round_mixed_arity():
    rng = np.random.default_rng(11)
    degree_bits = 5
    params = _params(degree_bits, [3])
    lde_coeffs, values = _lde_codeword(rng, degree_bits, 3)

    c1 = Challenger()
    trees1, fc1 = fri_committed_trees(lde_coeffs, values, c1, params)
    c2 = Challenger()
    trees2, fc2 = sharded_fri_committed_trees(values, c2, params, make_mesh(8))

    assert np.array_equal(gl64.to_canonical(trees1[0].cap.data),
                          gl64.to_canonical(trees2[0].cap.data))
    assert np.array_equal(gl64.to_canonical(np.asarray(fc1, np.uint64)),
                          gl64.to_canonical(np.asarray(fc2, np.uint64)))
    assert np.array_equal(c1.compact(), c2.compact())


def test_sharded_fri_proof_device_trees_bit_identical():
    """Full sharded FRI (device-resident trees + batched query extraction)
    produces the exact FriProof of the single-chip prover."""
    from plonky2_tpu.fri.prover import fri_proof
    from plonky2_tpu.hash.merkle import MerkleTree
    from plonky2_tpu.parallel.fri import sharded_fri_proof

    rng = np.random.default_rng(3)
    degree_bits = 6
    params = _params(degree_bits, [2, 1])
    lde_coeffs, values = _lde_codeword(rng, degree_bits, 3)

    # a small "oracle" initial tree over arbitrary leaves
    leaves = GF.from_u64(rng.integers(
        0, gl64.ORDER_INT, size=(values.shape[0], 3), dtype=np.uint64))
    init1 = MerkleTree(leaves, cap_height=2)
    init2 = MerkleTree(leaves, cap_height=2)

    c1 = Challenger()
    c1.observe_element(5)
    p1 = fri_proof([init1], lde_coeffs, values, c1, params)

    c2 = Challenger()
    c2.observe_element(5)
    p2 = sharded_fri_proof([init2], values, c2, params, make_mesh(8))

    assert np.array_equal(c1.compact(), c2.compact())
    assert p1.pow_witness == p2.pow_witness
    assert np.array_equal(gl64.to_canonical(np.asarray(p1.final_poly)),
                          gl64.to_canonical(np.asarray(p2.final_poly)))
    assert len(p1.commit_phase_merkle_caps) == len(p2.commit_phase_merkle_caps)
    for cap1, cap2 in zip(p1.commit_phase_merkle_caps,
                          p2.commit_phase_merkle_caps):
        assert np.array_equal(gl64.to_canonical(cap1.data),
                              gl64.to_canonical(cap2.data))
    for r1, r2 in zip(p1.query_round_proofs, p2.query_round_proofs):
        for (l1, pr1), (l2, pr2) in zip(r1.initial_trees_proof.evals_proofs,
                                        r2.initial_trees_proof.evals_proofs):
            assert np.array_equal(gl64.to_canonical(l1),
                                  gl64.to_canonical(l2))
            assert np.array_equal(gl64.to_canonical(pr1.siblings),
                                  gl64.to_canonical(pr2.siblings))
        for s1, s2 in zip(r1.steps, r2.steps):
            assert np.array_equal(gl64.to_canonical(s1.evals),
                                  gl64.to_canonical(s2.evals))
            assert np.array_equal(gl64.to_canonical(s1.merkle_proof.siblings),
                                  gl64.to_canonical(s2.merkle_proof.siblings))
