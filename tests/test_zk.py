"""Zero-knowledge config: blinding rows + salted commitments
(reference circuit_builder.rs:763-820, fri/oracle.rs:109)."""

import numpy as np

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.witness import PartialWitness


def zk_config():
    return CircuitConfig(zero_knowledge=True, fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=2))


def _build():
    b = CircuitBuilder(zk_config())
    x = b.add_virtual_target()
    y = b.mul(x, x)
    b.register_public_input(x)
    b.register_public_input(y)
    return b.build(), x


def test_zk_prove_verify():
    data, x = _build()
    pw = PartialWitness()
    pw.set_target(x, 7)
    proof = data.prove(pw)
    assert list(map(int, proof.public_inputs)) == [7, 49]
    data.verify(proof)


def test_zk_proofs_are_randomized():
    """Two proofs of the same statement must not share wire commitments
    (blinding rows + salt make the transcript non-deterministic)."""
    data, x = _build()
    pw = PartialWitness()
    pw.set_target(x, 7)
    p1 = data.prove(pw)
    p2 = data.prove(pw)
    assert not np.array_equal(p1.proof.wires_cap.data, p2.proof.wires_cap.data)
    data.verify(p1)
    data.verify(p2)
