"""End-to-end distributed PLONK prover: `CircuitData.prove(mesh=)` must
return a proof BYTE-IDENTICAL to the single-chip prover through
utils/serialization.py — the plonk twin of test_distributed_prove.py
(reference demo path plonky2/src/plonk/prover.rs:102, exercised on the
matrix-mul example circuit)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.models.matrix_mul import (build_matrix_mul_circuit,
                                           matrix_mul_witness)
from plonky2_tpu.parallel.mesh import make_mesh
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.utils.serialization import proof_with_pis_to_bytes

P = gl64.ORDER_INT

# the fast FRI config (tests/conftest pattern): the sharded SPMD programs
# at standard_recursion_config cost >45 min of XLA:CPU compiles on the
# 1-core CI box; the mesh pipeline under test is config-independent
FAST = CircuitConfig(fri_config=FriConfig(
    rate_bits=3, cap_height=4, proof_of_work_bits=8,
    reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
    num_query_rounds=4))


@pytest.fixture(scope="module")
def matmul_circuit():
    return build_matrix_mul_circuit(2, FAST)


def test_distributed_plonk_prove_byte_identical(matmul_circuit, rng):
    data, a_t, b_t = matmul_circuit
    m = 2
    a = rng.integers(0, P, size=(m, m), dtype=np.uint64)
    b = rng.integers(0, P, size=(m, m), dtype=np.uint64)
    pw = matrix_mul_witness(a_t, b_t, a, b)
    single = data.prove(pw)
    sharded = data.prove(pw, mesh=make_mesh(8))
    assert proof_with_pis_to_bytes(single) == proof_with_pis_to_bytes(sharded)
    data.verify(sharded)


def test_distributed_plonk_prove_many_reuses_programs(matmul_circuit, rng):
    """Second proof on the same circuit+mesh must hit the memoized sharded
    programs (prove-many is the matmul demo's shape)."""
    data, a_t, b_t = matmul_circuit
    mesh = make_mesh(8)
    m = 2
    for _ in range(2):
        a = rng.integers(0, P, size=(m, m), dtype=np.uint64)
        b = rng.integers(0, P, size=(m, m), dtype=np.uint64)
        pw = matrix_mul_witness(a_t, b_t, a, b)
        proof = data.prove(pw, mesh=mesh)
        data.verify(proof)
