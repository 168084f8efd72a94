"""Poseidon permutation vs the reference's published test vectors
(reference: plonky2/src/hash/poseidon_goldilocks.rs:450-484, computed with
the hadeshash reference implementation), plus sponge/Merkle consistency."""

import numpy as np

from plonky2_tpu.field import gl64
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.hash.hashing import (
    compress,
    compress_np,
    hash_no_pad,
    hash_no_pad_np,
    hash_or_noop_np,
)
from plonky2_tpu.hash.merkle import MerkleTree, verify_merkle_proof_to_cap
from plonky2_tpu.hash.poseidon import permute, permute_np

P = gl64.ORDER_INT
NEG_ONE = P - 1

TEST_VECTORS = [
    (
        [0] * 12,
        [0x3C18A9786CB0B359, 0xC4055E3364A246C3, 0x7953DB0AB48808F4, 0xC71603F33A1144CA,
         0xD7709673896996DC, 0x46A84E87642F44ED, 0xD032648251EE0B3C, 0x1C687363B207DF62,
         0xDF8565563E8045FE, 0x40F5B37FF4254DAE, 0xD070F637B431067C, 0x1792B1C4342109D7],
    ),
    (
        list(range(12)),
        [0xD64E1E3EFC5B8E9E, 0x53666633020AAA47, 0xD40285597C6A8825, 0x613A4F81E81231D2,
         0x414754BFEBD051F0, 0xCB1F8980294A023F, 0x6EB2A9E4D54A9D0F, 0x1902BC3AF467E056,
         0xF045D5EAFDC6021F, 0xE4150F77CAAA3BE5, 0xC9BFD01D39B50CCE, 0x5C0A27FCB0E1459B],
    ),
    (
        [NEG_ONE] * 12,
        [0xBE0085CFC57A8357, 0xD95AF71847D05C09, 0xCF55A13D33C1C953, 0x95803A74F4530E82,
         0xFCD99EB30A135DF1, 0xE095905E913A3029, 0xDE0392461B42919B, 0x7D3260E24E81D031,
         0x10D3D0465D9DEAA0, 0xA87571083DFC2A47, 0xE18263681E9958F8, 0xE28E96F1AE5E60D3],
    ),
    (
        [0x8CCBBBEA4FE5D2B7, 0xC2AF59EE9EC49970, 0x90F7E1A9E658446A, 0xDCC0630A3AB8B1B8,
         0x7FF8256BCA20588C, 0x5D99A7CA0C44ECFB, 0x48452B17A70FBEE3, 0xEB09D654690B6C88,
         0x4A55D3A39C676A88, 0xC0407A38D2285139, 0xA234BAC9356386D1, 0xE1633F2BAD98A52F],
        [0xA89280105650C4EC, 0xAB542D53860D12ED, 0x5704148E9CCAB94F, 0xD3A826D4B62DA9F5,
         0x8A7A6CA87892574F, 0xC7017E1CAD1A674E, 0x1F06668922318E34, 0xA3B203BC8102676F,
         0xFCC781B0CE382BF2, 0x934C69FF3ED14BA5, 0x504688A5996E8F13, 0x401F3F2ED524A2BA],
    ),
]


def test_permute_device_vectors():
    inputs = np.array([v[0] for v in TEST_VECTORS], dtype=np.uint64)
    expect = np.array([v[1] for v in TEST_VECTORS], dtype=np.uint64)
    got = permute(GF.from_u64(inputs)).to_u64()
    np.testing.assert_array_equal(got, expect)


def test_permute_host_vectors():
    inputs = np.array([v[0] for v in TEST_VECTORS], dtype=np.uint64)
    expect = np.array([v[1] for v in TEST_VECTORS], dtype=np.uint64)
    got = gl64.to_canonical(permute_np(inputs))
    np.testing.assert_array_equal(got, expect)


def test_permute_noncanonical_inputs():
    """Noncanonical residues must hash identically to canonical ones."""
    a = np.full((1, 12), P, dtype=np.uint64)  # == 0 mod p
    np.testing.assert_array_equal(
        gl64.to_canonical(permute_np(a))[0], np.array(TEST_VECTORS[0][1], dtype=np.uint64)
    )


def test_sponge_device_host_agree(rng):
    for length in [1, 4, 7, 8, 9, 16, 135]:
        x = rng.integers(0, P, size=(3, length), dtype=np.uint64)
        dev = hash_no_pad(GF.from_u64(x)).to_u64()
        host = hash_no_pad_np(x)
        np.testing.assert_array_equal(dev, host)


def test_compress_matches_sponge_structure(rng):
    x = rng.integers(0, P, size=(2, 4), dtype=np.uint64)
    y = rng.integers(0, P, size=(2, 4), dtype=np.uint64)
    dev = compress(GF.from_u64(x), GF.from_u64(y)).to_u64()
    host = compress_np(x, y)
    np.testing.assert_array_equal(dev, host)


def test_hash_or_noop_small():
    x = np.array([[5, 6]], dtype=np.uint64)
    np.testing.assert_array_equal(hash_or_noop_np(x), [[5, 6, 0, 0]])


def test_merkle_tree_and_proofs(rng):
    n, leaf_len, cap_height = 32, 7, 2
    leaves = rng.integers(0, P, size=(n, leaf_len), dtype=np.uint64)
    tree = MerkleTree(GF.from_u64(leaves), cap_height)
    assert tree.cap.data.shape == (4, 4)
    for idx in [0, 1, 13, 31]:
        proof = tree.prove(idx)
        assert verify_merkle_proof_to_cap(leaves[idx], idx, tree.cap, proof)
    bad = tree.prove(5)
    assert not verify_merkle_proof_to_cap(leaves[6], 5, tree.cap, bad)


def test_merkle_tree_raw_leaves(rng):
    """<=4-felt leaves are stored raw (hash_or_noop)."""
    n = 8
    leaves = rng.integers(0, P, size=(n, 4), dtype=np.uint64)
    tree = MerkleTree(GF.from_u64(leaves), 0)
    np.testing.assert_array_equal(tree.levels[0], leaves)
    assert verify_merkle_proof_to_cap(leaves[3], 3, tree.cap, tree.prove(3))
