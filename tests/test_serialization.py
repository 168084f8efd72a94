"""Proof / circuit-data byte serialization round-trips (twin of reference
util/serialization and examples/fibonacci_serialization.rs), plus a
golden-byte test that hand-encodes a tiny proof per the reference field
order (mod.rs:334-580 readers / 1939 write_proof) independently of the
Buffer implementation."""

import struct

import numpy as np

from plonky2_tpu.fri.config import FriConfig, FriParams, FriReductionStrategy
from plonky2_tpu.fri.proof import (FriInitialTreeProof, FriProof,
                                   FriQueryRound, FriQueryStep)
from plonky2_tpu.hash.merkle import MerkleCap, MerkleProof
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.circuit_data import CommonCircuitData, SelectorsInfo
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.proof import (OpeningSet, Proof,
                                     ProofWithPublicInputs)
from plonky2_tpu.plonk.verifier import verify
from plonky2_tpu.plonk.witness import PartialWitness
from plonky2_tpu.utils.serialization import (common_data_from_bytes,
                                             common_data_to_bytes,
                                             proof_with_pis_from_bytes,
                                             proof_with_pis_to_bytes,
                                             verifier_data_from_bytes,
                                             verifier_data_to_bytes)


def _config():
    return CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4))


def test_proof_and_circuit_data_roundtrip():
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

    blob = proof_with_pis_to_bytes(proof)
    proof2 = proof_with_pis_from_bytes(blob, data.common)
    assert np.array_equal(proof.public_inputs, proof2.public_inputs)
    assert proof_with_pis_to_bytes(proof2) == blob  # stable re-encoding

    common2 = common_data_from_bytes(common_data_to_bytes(data.common))
    vd2 = verifier_data_from_bytes(verifier_data_to_bytes(data.verifier_only))
    # the deserialized verifier accepts the deserialized proof
    verify(proof2, vd2, common2)

    # gate set survives the id round-trip
    assert [g.id() for g in common2.gates] == [g.id() for g in data.common.gates]


# -- golden-byte test ---------------------------------------------------------
#
# A synthetic tiny proof whose encoding is written out BY HAND below with
# nothing but struct.pack, following the reference writers field by field:
#   write_proof (mod.rs:1939): wires cap | zs+pp cap | quotient cap |
#     opening set | fri proof
#   write_merkle_cap (1367): hashes only, no length
#   write_opening_set (1409): constants, sigmas, wires, zs, zs_next,
#     lookup_zs, lookup_zs_next, partial_products, quotient — ext elements
#     back to back, no lengths
#   write_fri_proof (1568): commit caps | query rounds | final poly | pow
#   write_fri_query_rounds (1532): per round: 4x (leaf vec, merkle proof),
#     then per arity: (ext evals, merkle proof)
#   write_merkle_proof (1443): u8 sibling count + hashes
#   write_proof_with_public_inputs (1963): proof | usize count | felts

def _tiny_common() -> CommonCircuitData:
    cfg = CircuitConfig(
        num_wires=3, num_routed_wires=2, num_constants=2, security_bits=1,
        num_challenges=1, zero_knowledge=False, max_quotient_degree_factor=8,
        fri_config=FriConfig(
            rate_bits=1, cap_height=0, proof_of_work_bits=0,
            reduction_strategy=FriReductionStrategy.fixed([1]),
            num_query_rounds=1))
    fri_params = FriParams(cfg.fri_config, hiding=False, degree_bits=2,
                           reduction_arity_bits=(1,))
    return CommonCircuitData(
        config=cfg, fri_params=fri_params, gates=[],
        selectors_info=SelectorsInfo([], []), quotient_degree_factor=2,
        num_gate_constraints=1, num_constants=2, num_public_inputs=1,
        k_is=np.asarray([1, 7], np.uint64), num_partial_products=1,
        num_lookup_polys=0, num_lookup_selectors=0, luts=[])


def _h(seed: int) -> np.ndarray:
    return np.asarray([seed, seed + 1, seed + 2, seed + 3], np.uint64)


def _e(seed: int) -> np.ndarray:
    return np.asarray([seed, seed + 100], np.uint64)


def test_proof_bytes_match_hand_encoding():
    common = _tiny_common()

    openings = OpeningSet(
        constants=np.stack([_e(10), _e(11)]),        # num_constants = 2
        plonk_sigmas=np.stack([_e(20), _e(21)]),     # num_routed_wires = 2
        wires=np.stack([_e(30), _e(31), _e(32)]),    # num_wires = 3
        plonk_zs=np.stack([_e(40)]),                 # num_challenges = 1
        plonk_zs_next=np.stack([_e(50)]),
        partial_products=np.stack([_e(60)]),         # 1 * num_challenges
        quotient_polys=np.stack([_e(70), _e(71)]),   # qdf * num_challenges
        lookup_zs=np.zeros((0, 2), np.uint64),
        lookup_zs_next=np.zeros((0, 2), np.uint64))

    # lde_bits = 3, cap_height = 0 -> 3 siblings in initial merkle proofs;
    # after one arity-1 fold: 3 - 1 - 0 = 2 siblings.
    initial = FriInitialTreeProof([
        (np.asarray([1, 2, 3, 4], np.uint64),                 # 2+2 csigmas
         MerkleProof(np.stack([_h(200), _h(204), _h(208)]))),
        (np.asarray([5, 6, 7], np.uint64),                    # 3 wires
         MerkleProof(np.stack([_h(220), _h(224), _h(228)]))),
        (np.asarray([8, 9], np.uint64),                       # zs+pp
         MerkleProof(np.stack([_h(240), _h(244), _h(248)]))),
        (np.asarray([10, 11], np.uint64),                     # quotient
         MerkleProof(np.stack([_h(260), _h(264), _h(268)]))),
    ])
    step = FriQueryStep(np.stack([_e(80), _e(81)]),           # 2^1 evals
                        MerkleProof(np.stack([_h(300), _h(304)])))
    fri = FriProof(
        commit_phase_merkle_caps=[MerkleCap(_h(100).reshape(1, 4))],
        query_round_proofs=[FriQueryRound(initial, [step])],
        final_poly=np.stack([_e(90), _e(91)]),                # 2^(2-1)
        pow_witness=np.uint64(12345))

    pwp = ProofWithPublicInputs(
        Proof(wires_cap=MerkleCap(_h(1).reshape(1, 4)),
              plonk_zs_partial_products_cap=MerkleCap(_h(5).reshape(1, 4)),
              quotient_polys_cap=MerkleCap(_h(9).reshape(1, 4)),
              openings=openings, opening_proof=fri),
        public_inputs=np.asarray([777], np.uint64))

    def felts(*vals):
        return b"".join(struct.pack("<Q", int(v)) for v in vals)

    def hand_hash(seed):
        return felts(seed, seed + 1, seed + 2, seed + 3)

    def hand_ext(seed):
        return felts(seed, seed + 100)

    def hand_mp(*seeds):
        return struct.pack("<B", len(seeds)) + b"".join(
            hand_hash(s) for s in seeds)

    golden = (
        # three caps (cap_height 0 -> one hash each, no length prefix)
        hand_hash(1) + hand_hash(5) + hand_hash(9)
        # opening set, reference order, no lengths
        + hand_ext(10) + hand_ext(11)
        + hand_ext(20) + hand_ext(21)
        + hand_ext(30) + hand_ext(31) + hand_ext(32)
        + hand_ext(40) + hand_ext(50)
        # lookup_zs / lookup_zs_next are empty
        + hand_ext(60)
        + hand_ext(70) + hand_ext(71)
        # fri: one commit cap
        + hand_hash(100)
        # one query round: 4 oracles (leaves, then u8-length merkle proof)
        + felts(1, 2, 3, 4) + hand_mp(200, 204, 208)
        + felts(5, 6, 7) + hand_mp(220, 224, 228)
        + felts(8, 9) + hand_mp(240, 244, 248)
        + felts(10, 11) + hand_mp(260, 264, 268)
        # one query step: 2 ext evals + merkle proof
        + hand_ext(80) + hand_ext(81) + hand_mp(300, 304)
        # final poly (2 ext) + pow witness
        + hand_ext(90) + hand_ext(91) + felts(12345)
        # public inputs: usize count + felts
        + struct.pack("<Q", 1) + felts(777)
    )

    blob = proof_with_pis_to_bytes(pwp)
    assert blob == golden

    # and the common-data-driven reader inverts it
    pwp2 = proof_with_pis_from_bytes(blob, common)
    assert proof_with_pis_to_bytes(pwp2) == golden
