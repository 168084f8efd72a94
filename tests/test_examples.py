"""Example circuits (twins of plonky2/examples/) prove + verify."""

import numpy as np
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.witness import PartialWitness
from plonky2_tpu.models.examples import (_sqrt_mod_p, factorial_circuit,
                                         fibonacci_circuit,
                                         range_check_circuit,
                                         square_root_circuit)
from plonky2_tpu.field import gl64

P = gl64.ORDER_INT


def fast_config():
    return CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4))


def test_fibonacci_example():
    data, ta, tb = fibonacci_circuit(100, fast_config())
    pw = PartialWitness()
    pw.set_target(ta, 0)
    pw.set_target(tb, 1)
    proof = data.prove(pw)
    data.verify(proof)
    a, b = 0, 1
    for _ in range(99):
        a, b = b, (a + b) % P
    assert int(proof.public_inputs[2]) == b


def test_factorial_example():
    data, initial = factorial_circuit(20, fast_config())
    pw = PartialWitness()
    pw.set_target(initial, 1)
    proof = data.prove(pw)
    data.verify(proof)
    import math
    assert int(proof.public_inputs[1]) == math.factorial(20) % P


def test_range_check_example():
    data, value = range_check_circuit(32, fast_config())
    pw = PartialWitness()
    pw.set_target(value, (1 << 32) - 1)
    proof = data.prove(pw)
    data.verify(proof)


def test_range_check_rejects_out_of_range():
    data, value = range_check_circuit(8, fast_config())
    pw = PartialWitness()
    pw.set_target(value, 256)
    with pytest.raises(AssertionError):
        proof = data.prove(pw)
        data.verify(proof)


def test_square_root_example():
    data, x = square_root_circuit(fast_config())
    root = 12345678901234567
    square = (root * root) % P
    pw = PartialWitness()
    pw.set_target(x, square)
    proof = data.prove(pw)
    data.verify(proof)
    assert int(proof.public_inputs[0]) == square


def test_sqrt_mod_p():
    for v in (4, 9, 1 << 40, 987654321):
        r = _sqrt_mod_p(v % P)
        if r is not None:
            assert (r * r) % P == v % P
    assert _sqrt_mod_p(0) == 0
