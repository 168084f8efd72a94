"""KeccakGoldilocksConfig analogue: byte-digest commitments + keccak
challenger for cheap non-recursive proofs (reference plonk/config.rs:166,
hash/keccak.rs).  A circuit built with standard_keccak_config proves and
verifies end-to-end; tampering is rejected."""

import numpy as np
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.hash.keccak import hash_n_to_bytes, keccak256
from plonky2_tpu.hash.keccak_tree import (BytesMerkleTree,
                                          bytes_hash_to_felts,
                                          keccak_hash_or_noop,
                                          keccak_permutation_np,
                                          keccak_two_to_one,
                                          verify_bytes_merkle_proof_to_cap)
from plonky2_tpu.field import gl64
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.witness import PartialWitness


def _config(**kw):
    return CircuitConfig(hasher="keccak", fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4), **kw)


def test_keccak_leaf_hash_matches_scalar_reference():
    rng = np.random.default_rng(3)
    rows = rng.integers(0, gl64.ORDER_INT, size=(5, 23), dtype=np.uint64)
    batched = keccak_hash_or_noop(rows)
    for i in range(5):
        assert bytes(batched[i]) == hash_n_to_bytes(rows[i])
    # short rows are stored raw, zero-padded (hash_or_noop)
    short = rng.integers(0, gl64.ORDER_INT, size=(2, 3), dtype=np.uint64)
    raw = keccak_hash_or_noop(short)
    assert bytes(raw[0][:24]) == gl64.to_canonical(short[0]).astype("<u8").tobytes()
    assert raw[0][24] == 0


def test_keccak_two_to_one_matches_scalar_reference():
    a = np.frombuffer(keccak256(b"left")[:25], dtype=np.uint8)[None, :]
    b = np.frombuffer(keccak256(b"right")[:25], dtype=np.uint8)[None, :]
    got = keccak_two_to_one(a, b)[0]
    assert bytes(got) == keccak256(bytes(a[0]) + bytes(b[0]))[:25]


def test_bytes_merkle_tree_roundtrip():
    rng = np.random.default_rng(5)
    leaves = GF.from_u64(rng.integers(0, gl64.ORDER_INT, size=(16, 7),
                                      dtype=np.uint64))
    tree = BytesMerkleTree(leaves, cap_height=1)
    for idx in (0, 7, 15):
        proof = tree.prove(idx)
        assert verify_bytes_merkle_proof_to_cap(tree.leaves_np[idx], idx,
                                                tree.cap, proof)
    bad = tree.leaves_np[3].copy()
    bad[0] += 1
    assert not verify_bytes_merkle_proof_to_cap(bad, 3, tree.cap,
                                                tree.prove(3))


def test_keccak_permutation_rejection_sampling():
    state = np.arange(12, dtype=np.uint64)
    out = keccak_permutation_np(state)
    assert out.shape == (12,)
    assert (out < np.uint64(gl64.ORDER_INT)).all()
    # deterministic
    assert np.array_equal(out, keccak_permutation_np(state))


def test_bytes_hash_to_felts_seven_byte_chunks():
    d = np.arange(25, dtype=np.uint8)
    felts = bytes_hash_to_felts(d)[0]
    assert felts.shape == (4,)
    assert int(felts[0]) == int.from_bytes(bytes(range(7)), "little")
    assert int(felts[3]) == int.from_bytes(bytes([21, 22, 23, 24]), "little")


def test_keccak_config_prove_verify_e2e():
    b = CircuitBuilder(_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    out = b.add(b.mul(x, x), b.add_const(y, 42))
    b.register_public_inputs([x, y, out])
    data = b.build()
    assert data.verifier_only.circuit_digest.dtype == np.uint8

    pw = PartialWitness()
    pw.set_target(x, 3)
    pw.set_target(y, 5)
    proof = data.prove(pw)
    assert proof.proof.wires_cap.data.dtype == np.uint8
    data.verify(proof)

    # tampered public input must fail the transcript
    bad = proof
    bad_pis = bad.public_inputs.copy()
    bad_pis[2] += 1
    from plonky2_tpu.plonk.proof import ProofWithPublicInputs
    with pytest.raises(AssertionError):
        data.verify(ProofWithPublicInputs(bad.proof, bad_pis))

    # tampered cap must fail the merkle/fri checks
    import copy
    evil = copy.deepcopy(proof)
    evil.proof.wires_cap.data[0][0] ^= 1
    with pytest.raises(AssertionError):
        data.verify(evil)


def test_keccak_config_serialization_roundtrip():
    """Keccak-config proofs and circuit data serialize: byte digests in
    caps/merkle proofs/circuit digest take the raw-bytes wire encoding
    (reference BytesHash GenericHashOut, hash/keccak.rs:44)."""
    from plonky2_tpu.utils import serialization as ser

    b = CircuitBuilder(_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    out = b.add(b.mul(x, x), b.add_const(y, 42))
    b.register_public_inputs([x, y, out])
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 3)
    pw.set_target(y, 5)
    proof = data.prove(pw)

    # proof wire round-trip
    raw = ser.proof_with_pis_to_bytes(proof)
    rt = ser.proof_with_pis_from_bytes(raw, data.common)
    assert rt.proof.wires_cap.data.dtype == np.uint8
    assert np.array_equal(rt.proof.wires_cap.data, proof.proof.wires_cap.data)
    data.verify(rt)

    # verifier data round-trip
    vd = ser.verifier_data_from_bytes(
        ser.verifier_data_to_bytes(data.verifier_only), hasher="keccak")
    assert np.array_equal(vd.circuit_digest, data.verifier_only.circuit_digest)
    assert np.array_equal(vd.constants_sigmas_cap.data,
                          data.verifier_only.constants_sigmas_cap.data)

    # full circuit checkpoint: rebuildable and able to prove again
    blob = ser.circuit_data_to_bytes(data)
    data2 = ser.circuit_data_from_bytes(blob)
    pw2 = PartialWitness()
    pw2.set_target(x, 4)
    pw2.set_target(y, 6)
    proof2 = data2.prove(pw2)
    data2.verify(proof2)
    data.verify(proof2)
