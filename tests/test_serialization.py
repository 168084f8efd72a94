"""Proof / circuit-data byte serialization round-trips (twin of reference
util/serialization and examples/fibonacci_serialization.rs)."""

import numpy as np

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
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
    proof2 = proof_with_pis_from_bytes(blob)
    assert np.array_equal(proof.public_inputs, proof2.public_inputs)
    assert proof_with_pis_to_bytes(proof2) == blob  # stable re-encoding

    common2 = common_data_from_bytes(common_data_to_bytes(data.common))
    vd2 = verifier_data_from_bytes(verifier_data_to_bytes(data.verifier_only))
    # the deserialized verifier accepts the deserialized proof
    verify(proof2, vd2, common2)

    # gate set survives the id round-trip
    assert [g.id() for g in common2.gates] == [g.id() for g in data.common.gates]
