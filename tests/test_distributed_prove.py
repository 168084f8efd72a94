"""End-to-end distributed STARK prover: `prove(..., mesh=)` must return a
proof BYTE-IDENTICAL to the single-chip prover through
utils/serialization.py (the VERDICT round-3 "compose the sharded stages"
capability; reference end-to-end pipeline plonky2/src/plonk/prover.rs:102,
starky/src/prover.rs:32)."""

import numpy as np

from plonky2_tpu.parallel.mesh import make_mesh
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.fibonacci import FibonacciStark
from plonky2_tpu.stark.prover import prove
from plonky2_tpu.stark.verifier import verify_stark_proof
from plonky2_tpu.utils.serialization import (stark_proof_from_bytes,
                                             stark_proof_to_bytes)


class _NoPermFibonacci(FibonacciStark):
    """Same AIR without the permutation argument — covers the
    perm_commitment=None branch of the distributed pipeline."""

    def permutation_pairs(self) -> list:
        return []


def _fib_setup(stark_cls, num_rows):
    stark = stark_cls(num_rows)
    trace = stark.generate_trace(0, 1)
    pis = np.array([0, 1, stark.expected_result(0, 1)], dtype=np.uint64)
    return stark, trace, pis


def test_distributed_prove_byte_identical_with_permutations():
    config = StarkConfig.standard_fast_config()
    stark, trace, pis = _fib_setup(FibonacciStark, 1 << 6)
    single = prove(stark, config, trace, pis)
    sharded = prove(stark, config, trace, pis, mesh=make_mesh(8))
    b1 = stark_proof_to_bytes(single)
    b2 = stark_proof_to_bytes(sharded)
    assert b1 == b2
    verify_stark_proof(stark, sharded, config, degree_bits=6)
    # serializer round-trip
    assert stark_proof_to_bytes(stark_proof_from_bytes(b2)) == b2


def test_distributed_prove_byte_identical_no_permutations():
    config = StarkConfig.standard_fast_config()
    stark, trace, pis = _fib_setup(_NoPermFibonacci, 1 << 6)
    single = prove(stark, config, trace, pis)
    sharded = prove(stark, config, trace, pis, mesh=make_mesh(8))
    assert stark_proof_to_bytes(single) == stark_proof_to_bytes(sharded)
    verify_stark_proof(stark, sharded, config, degree_bits=6)
