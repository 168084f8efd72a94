"""End-to-end recursive verification: a circuit that verifies another proof.

Twin of the reference's recursion tests (recursion/recursive_verifier.rs
test_recursive_verifier).  Uses a reduced FRI config (fewer query rounds,
cheaper PoW) to keep CPU-mesh runtime sane; the structure is identical to
standard_recursion_config.
"""

import numpy as np
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.witness import PartialWitness
from plonky2_tpu.recursion import (add_virtual_proof_with_pis,
                                   add_virtual_verifier_data,
                                   set_proof_with_pis_target,
                                   set_verifier_data_target,
                                   verify_proof_circuit)


def small_recursion_config(num_query_rounds=4):
    return CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=num_query_rounds))


def build_inner(config):
    """x^2 + y + 42 circuit with public inputs."""
    b = CircuitBuilder(config)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    out = b.add(b.mul(x, x), b.add_const(y, 42))
    b.register_public_input(x)
    b.register_public_input(y)
    b.register_public_input(out)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 3)
    pw.set_target(y, 5)
    return data, pw


@pytest.mark.slow
def test_recursive_verification():
    config = small_recursion_config()
    inner, pw = build_inner(config)
    inner_proof = inner.prove(pw)
    inner.verify(inner_proof)
    assert int(inner_proof.public_inputs[2]) == 3 * 3 + 5 + 42

    outer_b = CircuitBuilder(config)
    pt = add_virtual_proof_with_pis(outer_b, inner.common)
    vdt = add_virtual_verifier_data(outer_b, config.fri_config.cap_height)
    verify_proof_circuit(outer_b, pt, vdt, inner.common)
    # expose the inner public inputs as outer public inputs
    outer_b.register_public_inputs(pt.public_inputs)
    outer = outer_b.build()

    pw2 = PartialWitness()
    set_proof_with_pis_target(pw2, pt, inner_proof)
    set_verifier_data_target(pw2, vdt, inner.verifier_only)
    outer_proof = outer.prove(pw2)
    outer.verify(outer_proof)
    assert list(map(int, outer_proof.public_inputs)) == \
        list(map(int, inner_proof.public_inputs))


@pytest.mark.slow
def test_recursive_verification_rejects_tampered_proof():
    config = small_recursion_config()
    inner, pw = build_inner(config)
    inner_proof = inner.prove(pw)

    outer_b = CircuitBuilder(config)
    pt = add_virtual_proof_with_pis(outer_b, inner.common)
    vdt = add_virtual_verifier_data(outer_b, config.fri_config.cap_height)
    verify_proof_circuit(outer_b, pt, vdt, inner.common)
    outer = outer_b.build()

    # tamper with a claimed public input -> the outer witness must fail
    tampered = inner_proof
    tampered.public_inputs = np.array(tampered.public_inputs, dtype=np.uint64)
    tampered.public_inputs[2] += np.uint64(1)
    pw2 = PartialWitness()
    set_proof_with_pis_target(pw2, pt, tampered)
    set_verifier_data_target(pw2, vdt, inner.verifier_only)
    with pytest.raises(AssertionError):
        outer_proof = outer.prove(pw2)
        outer.verify(outer_proof)
