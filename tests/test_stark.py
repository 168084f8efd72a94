"""STARK layer: FibonacciStark prove + verify (reference
starky/src/fibonacci_stark.rs tests)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.fibonacci import FibonacciStark
from plonky2_tpu.stark.prover import prove
from plonky2_tpu.stark.verifier import verify_stark_proof


def test_fibonacci_stark_prove_verify():
    num_rows = 1 << 6
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)
    x0, x1 = 0, 1
    trace = stark.generate_trace(x0, x1)
    pis = np.array([x0, x1, stark.expected_result(x0, x1)], dtype=np.uint64)
    proof = prove(stark, config, trace, pis)
    verify_stark_proof(stark, proof, config, degree_bits=6)


def test_fibonacci_stark_rejects_wrong_result():
    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)
    trace = stark.generate_trace(2, 3)
    bad = (stark.expected_result(2, 3) + 1) % gl64.ORDER_INT
    pis = np.array([2, 3, bad], dtype=np.uint64)
    proof = prove(stark, config, trace, pis)
    with pytest.raises(AssertionError):
        verify_stark_proof(stark, proof, config, degree_bits=5)
