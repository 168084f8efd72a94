"""Merkle path compression + compressed proof round-trip
(reference hash/path_compression.rs, plonk/proof.rs:126)."""

import numpy as np

from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.hash.merkle import MerkleTree, verify_merkle_proof_to_cap
from plonky2_tpu.hash.path_compression import (compress_merkle_proofs,
                                               decompress_merkle_proofs)


def test_path_compression_roundtrip(rng):
    n, cap_height = 64, 2
    leaves = rng.integers(0, (1 << 64) - 1, size=(n, 7), dtype=np.uint64)
    tree = MerkleTree(GF.from_u64(leaves), cap_height)
    indices = [3, 9, 10, 11, 42, 43, 60]
    proofs = [tree.prove(i) for i in indices]

    compressed = compress_merkle_proofs(cap_height, indices, proofs)
    full_len = sum(len(p.siblings) for p in proofs)
    comp_len = sum(len(p.siblings) for p in compressed)
    assert comp_len < full_len  # shared paths actually pruned

    decompressed = decompress_merkle_proofs(
        [leaves[i] for i in indices], indices, compressed,
        height=6, cap_height=cap_height)
    for i, p in zip(indices, decompressed):
        assert verify_merkle_proof_to_cap(leaves[i], i, tree.cap, p)
        assert np.array_equal(p.siblings, tree.prove(i).siblings)


def test_compressed_proof_roundtrip():
    from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
    from plonky2_tpu.plonk.builder import CircuitBuilder
    from plonky2_tpu.plonk.compression import (compress_proof,
                                               decompress_proof)
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.verifier import verify
    from plonky2_tpu.plonk.witness import PartialWitness

    config = CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4))
    b = CircuitBuilder(config)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    out = b.add(b.mul(x, x), b.add_const(y, 42))
    b.register_public_inputs([x, y, out])
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 3)
    pw.set_target(y, 5)
    proof = data.prove(pw)

    compressed = compress_proof(proof, data.verifier_only, data.common)
    restored = decompress_proof(compressed, data.verifier_only, data.common)
    verify(restored, data.verifier_only, data.common)

    # round-trip is exact
    orig = proof.proof.opening_proof
    back = restored.proof.opening_proof
    assert np.array_equal(orig.final_poly, back.final_poly)
    for r0, r1 in zip(orig.query_round_proofs, back.query_round_proofs):
        for (l0, m0), (l1, m1) in zip(r0.initial_trees_proof.evals_proofs,
                                      r1.initial_trees_proof.evals_proofs):
            assert np.array_equal(l0, l1)
            assert np.array_equal(m0.siblings, m1.siblings)
        for s0, s1 in zip(r0.steps, r1.steps):
            assert np.array_equal(s0.evals, s1.evals)
            assert np.array_equal(s0.merkle_proof.siblings,
                                  s1.merkle_proof.siblings)
