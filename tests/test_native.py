"""Native C++ keccak backend (plonky2_tpu/native) vs the numpy twins and
published keccak-256 vectors."""

import numpy as np
import pytest

from plonky2_tpu import native
from plonky2_tpu.hash.keccak import keccak256, keccak_f

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no g++ / native build failed")


def test_keccak_f_batch_matches_numpy():
    rng = np.random.default_rng(3)
    states = rng.integers(0, 1 << 63, size=(17, 5, 5), dtype=np.uint64)
    assert np.array_equal(native.keccak_f_batch(states), keccak_f(states))


def test_keccak256_rows_vectors():
    # keccak-256("") — the canonical Ethereum empty-input digest
    empty = native.keccak256_rows(np.zeros((1, 0), dtype=np.uint8))
    assert empty[0].tobytes().hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    # keccak-256("abc")
    abc = native.keccak256_rows(
        np.frombuffer(b"abc", dtype=np.uint8)[None, :])
    assert abc[0].tobytes().hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")


@pytest.mark.parametrize("length", [7, 135, 136, 137, 300, 500])
def test_keccak256_rows_matches_scalar(length):
    rng = np.random.default_rng(length)
    rows = rng.integers(0, 256, size=(9, length), dtype=np.uint8)
    got = native.keccak256_rows(rows)
    for i in range(rows.shape[0]):
        assert got[i].tobytes() == keccak256(rows[i].tobytes())


def test_merkle_layer_matches_two_to_one():
    from plonky2_tpu.hash.keccak import HASH_SIZE, two_to_one
    rng = np.random.default_rng(9)
    level = rng.integers(0, 256, size=(8, HASH_SIZE), dtype=np.uint8)
    got = native.keccak_merkle_layer(level, HASH_SIZE)
    for i in range(4):
        want = two_to_one(level[2 * i].tobytes(), level[2 * i + 1].tobytes())
        assert got[i].tobytes() == want


def test_bytes_merkle_tree_uses_native_consistently():
    """BytesMerkleTree proofs built over the native absorb still verify
    (end-to-end sanity of the dispatched path)."""
    from plonky2_tpu.hash.keccak_tree import (BytesMerkleTree,
                                              verify_bytes_merkle_proof_to_cap)
    rng = np.random.default_rng(4)
    leaves = rng.integers(0, (1 << 63), size=(16, 6), dtype=np.uint64)
    tree = BytesMerkleTree(leaves, cap_height=1)
    for idx in (0, 5, 15):
        proof = tree.prove(idx)
        assert verify_bytes_merkle_proof_to_cap(leaves[idx], idx, tree.cap,
                                                proof)
