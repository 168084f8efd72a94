"""Recursive STARK verification: a PLONK circuit verifying a STARK proof
(twin of reference starky/src/fibonacci_stark.rs recursive test +
recursive_verifier.rs)."""

import numpy as np
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.witness import PartialWitness
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.fibonacci import FibonacciStark
from plonky2_tpu.stark.prover import prove
from plonky2_tpu.stark.recursive_verifier import (add_virtual_stark_proof,
                                                  set_stark_proof_target,
                                                  verify_stark_proof_circuit)
from plonky2_tpu.stark.verifier import verify_stark_proof


def _fast_stark_config():
    return StarkConfig(fri_config=FriConfig(
        rate_bits=1, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=8))


def _fast_circuit_config():
    return CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4))


@pytest.mark.slow
def test_recursive_stark_verification():
    degree_bits = 5
    num_rows = 1 << degree_bits
    sconfig = _fast_stark_config()
    stark = FibonacciStark(num_rows)
    x0, x1 = 0, 1
    trace = stark.generate_trace(x0, x1)
    pis = np.array([x0, x1, stark.expected_result(x0, x1)], dtype=np.uint64)
    stark_proof = prove(stark, sconfig, trace, pis)
    verify_stark_proof(stark, stark_proof, sconfig, degree_bits)

    b = CircuitBuilder(_fast_circuit_config())
    pt = add_virtual_stark_proof(b, stark, sconfig, degree_bits)
    verify_stark_proof_circuit(b, stark, pt, sconfig, degree_bits)
    b.register_public_inputs(pt.public_inputs)
    data = b.build()

    pw = PartialWitness()
    set_stark_proof_target(pw, pt, stark_proof)
    wrapper_proof = data.prove(pw)
    data.verify(wrapper_proof)
    assert list(map(int, wrapper_proof.public_inputs)) == list(map(int, pis))
