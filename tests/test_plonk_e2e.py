"""End-to-end PLONK test: build -> prove -> verify the matrix-mul demo
(reference plonky2/src/bin/matrix_mul.rs flow, m=2 to keep the circuit at
the minimum size on CPU)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.models.matrix_mul import (build_matrix_mul_circuit,
                                           expected_product,
                                           matrix_mul_witness)

P = gl64.ORDER_INT


@pytest.fixture(scope="module")
def matmul_circuit():
    return build_matrix_mul_circuit(2)


def test_matrix_mul_prove_verify(matmul_circuit, rng):
    data, a_t, b_t = matmul_circuit
    m = 2
    a = rng.integers(0, P, size=(m, m), dtype=np.uint64)
    b = rng.integers(0, P, size=(m, m), dtype=np.uint64)
    pw = matrix_mul_witness(a_t, b_t, a, b)
    proof = data.prove(pw)

    # public inputs are interleaved (a, b, c) per (i, j)
    pis = proof.public_inputs.reshape(m, m, 3)
    np.testing.assert_array_equal(pis[:, :, 0], gl64.to_canonical(a))
    np.testing.assert_array_equal(pis[:, :, 1], gl64.to_canonical(b))
    np.testing.assert_array_equal(pis[:, :, 2], expected_product(a, b))

    data.verify(proof)


def test_matrix_mul_rejects_tampered_pis(matmul_circuit, rng):
    data, a_t, b_t = matmul_circuit
    m = 2
    a = rng.integers(0, P, size=(m, m), dtype=np.uint64)
    b = rng.integers(0, P, size=(m, m), dtype=np.uint64)
    proof = data.prove(matrix_mul_witness(a_t, b_t, a, b))
    proof.public_inputs = proof.public_inputs.copy()
    proof.public_inputs[2] = (int(proof.public_inputs[2]) + 1) % P
    with pytest.raises(AssertionError):
        data.verify(proof)
