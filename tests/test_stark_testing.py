"""STARK harness checks for FibonacciStark (stark_testing.rs twins)."""

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.stark.fibonacci import FibonacciStark
from plonky2_tpu.stark.testing import \
    test_stark_circuit_constraints as check_stark_circuit_constraints, \
    test_stark_low_degree as check_stark_low_degree


def test_fibonacci_low_degree():
    check_stark_low_degree(FibonacciStark(1 << 5))


def test_fibonacci_circuit_constraints():
    config = CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4))
    check_stark_circuit_constraints(FibonacciStark(1 << 5), config)
