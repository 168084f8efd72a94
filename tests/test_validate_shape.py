"""Proof-shape validation: structurally malformed proofs must raise a
clean ShapeError (a ValueError), never a numpy broadcasting error or a
silently under-iterating zip (reference plonk/validate_shape.rs:9,
fri/validate_shape.rs:11)."""

import copy

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.fri.validate_shape import ShapeError
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.fibonacci import FibonacciStark
from plonky2_tpu.stark.prover import prove
from plonky2_tpu.stark.verifier import verify_stark_proof

P = gl64.ORDER_INT


@pytest.fixture(scope="module")
def stark_proof():
    from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
    num_rows = 1 << 6
    # standard_fast_config folds ZERO FRI rounds at 2^6 (total arities
    # would exceed degree+rate-cap), which would make the truncated-step
    # test vacuous — use a config with real reduction steps
    config = StarkConfig(fri_config=FriConfig(
        rate_bits=2, cap_height=2, proof_of_work_bits=4,
        reduction_strategy=FriReductionStrategy.constant_arity(2, 3),
        num_query_rounds=20))
    stark = FibonacciStark(num_rows)
    trace = stark.generate_trace(0, 1)
    pis = np.array([0, 1, stark.expected_result(0, 1)], dtype=np.uint64)
    proof = prove(stark, config, trace, pis)
    verify_stark_proof(stark, proof, config, degree_bits=6)  # sanity
    return stark, config, proof


def _reverify(stark_proof, mutated):
    stark, config, _ = stark_proof
    with pytest.raises(ShapeError):
        verify_stark_proof(stark, mutated, config, degree_bits=6)


def test_truncated_final_poly(stark_proof):
    p = copy.deepcopy(stark_proof[2])
    p.proof.opening_proof.final_poly = p.proof.opening_proof.final_poly[:-1]
    _reverify(stark_proof, p)


def test_missing_query_round(stark_proof):
    p = copy.deepcopy(stark_proof[2])
    p.proof.opening_proof.query_round_proofs.pop()
    _reverify(stark_proof, p)


def test_extra_query_round(stark_proof):
    p = copy.deepcopy(stark_proof[2])
    rounds = p.proof.opening_proof.query_round_proofs
    rounds.append(copy.deepcopy(rounds[0]))
    _reverify(stark_proof, p)


def test_truncated_query_steps(stark_proof):
    p = copy.deepcopy(stark_proof[2])
    for r in p.proof.opening_proof.query_round_proofs:
        r.steps = r.steps[:-1]
    _reverify(stark_proof, p)


def test_short_merkle_path(stark_proof):
    p = copy.deepcopy(stark_proof[2])
    r0 = p.proof.opening_proof.query_round_proofs[0]
    leaf, mp = r0.initial_trees_proof.evals_proofs[0]
    mp.siblings = mp.siblings[:-1]
    _reverify(stark_proof, p)


def test_truncated_initial_leaf(stark_proof):
    p = copy.deepcopy(stark_proof[2])
    r0 = p.proof.opening_proof.query_round_proofs[0]
    leaf, mp = r0.initial_trees_proof.evals_proofs[0]
    r0.initial_trees_proof.evals_proofs[0] = (leaf[:-1], mp)
    _reverify(stark_proof, p)


def test_truncated_openings(stark_proof):
    p = copy.deepcopy(stark_proof[2])
    p.proof.openings.local_values = p.proof.openings.local_values[:-1]
    _reverify(stark_proof, p)


def test_truncated_quotient_openings(stark_proof):
    p = copy.deepcopy(stark_proof[2])
    p.proof.openings.quotient_polys = p.proof.openings.quotient_polys[:-1]
    _reverify(stark_proof, p)


def test_wrong_cap_height(stark_proof):
    from plonky2_tpu.hash.merkle import MerkleCap
    p = copy.deepcopy(stark_proof[2])
    p.proof.trace_cap = MerkleCap(p.proof.trace_cap.data[:1])
    _reverify(stark_proof, p)


def test_plonk_truncated_wire_openings():
    """PLONK side: truncated wire openings -> ShapeError from verify()."""
    from plonky2_tpu.models.matrix_mul import (build_matrix_mul_circuit,
                                               matrix_mul_witness)
    rng = np.random.default_rng(7)
    data, a_t, b_t = build_matrix_mul_circuit(2)
    a = rng.integers(0, P, size=(2, 2), dtype=np.uint64)
    b = rng.integers(0, P, size=(2, 2), dtype=np.uint64)
    proof = data.prove(matrix_mul_witness(a_t, b_t, a, b))
    data.verify(proof)

    bad = copy.deepcopy(proof)
    bad.proof.openings.wires = bad.proof.openings.wires[:-1]
    with pytest.raises(ShapeError):
        data.verify(bad)

    bad = copy.deepcopy(proof)
    bad.public_inputs = bad.public_inputs[:-1]
    with pytest.raises(ShapeError):
        data.verify(bad)

    bad = copy.deepcopy(proof)
    bad.proof.opening_proof.final_poly = np.concatenate(
        [bad.proof.opening_proof.final_poly,
         bad.proof.opening_proof.final_poly[-1:]])
    with pytest.raises(ShapeError):
        data.verify(bad)
