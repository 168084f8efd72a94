"""Keccak-256 against known vectors (reference hash/keccak.rs hasher)."""

import numpy as np

from plonky2_tpu.hash.keccak import hash_n_to_bytes, keccak256, two_to_one

# canonical Keccak-256 (Ethereum) vectors
VECTORS = {
    b"": "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470",
    b"abc": "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45",
    b"The quick brown fox jumps over the lazy dog":
        "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15",
}


def test_keccak256_vectors():
    for msg, want in VECTORS.items():
        assert keccak256(msg).hex() == want


def test_keccak256_multiblock():
    msg = b"x" * 300  # spans three rate-136 blocks
    out1 = keccak256(msg)
    out2 = keccak256(msg)
    assert out1 == out2 and len(out1) == 32
    assert keccak256(b"x" * 299) != out1


def test_keccak_field_hasher():
    felts = np.arange(12, dtype=np.uint64)
    d = hash_n_to_bytes(felts)
    assert len(d) == 25
    assert hash_n_to_bytes(np.arange(1, 13, dtype=np.uint64)) != d
    c = two_to_one(d, d)
    assert len(c) == 25
