"""Cyclic recursion (IVC): a circuit verifying proofs of itself, counting
iterated hashes (twin of reference recursion/cyclic_recursion.rs tests)."""

import numpy as np
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.hash.hashing import hash_no_pad_np
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.witness import PartialWitness
from plonky2_tpu.recursion import (add_virtual_proof_with_pis,
                                   set_proof_with_pis_target,
                                   set_verifier_data_target)
from plonky2_tpu.recursion.cyclic import (check_cyclic_proof_verifier_data,
                                          common_data_for_recursion,
                                          conditionally_verify_cyclic_proof_or_dummy,
                                          pad_to_common_degree)
from plonky2_tpu.recursion.dummy import common_data_equal, cyclic_base_proof


def fast_config():
    return CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4))


@pytest.mark.slow
def test_cyclic_recursion_ivc():
    config = fast_config()
    # PIs: initial_hash (4) ++ current_hash (4) ++ counter (1) ++ verifier key
    common = common_data_for_recursion(config, num_extra_pis=9,
                                       min_degree_bits=13)

    b = CircuitBuilder(config)
    initial_hash = b.add_virtual_targets(4)
    b.register_public_inputs(initial_hash)
    current_hash_in = b.add_virtual_targets(4)
    current_hash_out = b.hash_n_to_hash_no_pad(list(current_hash_in))
    b.register_public_inputs(current_hash_out)
    counter = b.add_virtual_target()
    b.register_public_input(counter)
    b.add_verifier_data_public_inputs()

    condition = b.add_virtual_target()
    inner_pt = add_virtual_proof_with_pis(b, common)
    inner_initial = inner_pt.public_inputs[0:4]
    inner_current = inner_pt.public_inputs[4:8]
    inner_counter = inner_pt.public_inputs[8]

    # chain wiring: initial passes through; hash input is the previous
    # current hash (or initial in the base case); counter increments
    for t0, t1 in zip(initial_hash, inner_initial):
        b.connect(t0, t1)
    for i in range(4):
        b.connect(current_hash_in[i],
                  b.select(condition, inner_current[i], initial_hash[i]))
    b.connect(counter, b.add(inner_counter, condition))

    conditionally_verify_cyclic_proof_or_dummy(b, condition, inner_pt, common)
    pad_to_common_degree(b, common)
    data = b.build()
    assert common_data_equal(data.common, common), (
        f"cyclic circuit shape diverged: degree {data.common.degree_bits()}"
        f" vs {common.degree_bits()}")

    h0 = [1, 2, 3, 4]
    base = cyclic_base_proof(
        common, data.verifier_only,
        {i: h0[i] for i in range(4)} | {4 + i: h0[i] for i in range(4)} | {8: 0})

    # step 1: base case (condition = 0)
    pw = PartialWitness()
    pw.set_target(condition, 0)
    set_proof_with_pis_target(pw, inner_pt, base)
    set_verifier_data_target(pw, b.verifier_data_public_input,
                             data.verifier_only)
    proof1 = data.prove(pw)
    check_cyclic_proof_verifier_data(proof1, data.verifier_only, common)
    data.verify(proof1)
    h1 = hash_no_pad_np(np.array(h0, dtype=np.uint64))
    assert list(map(int, proof1.public_inputs[4:8])) == [int(x) for x in h1]
    assert int(proof1.public_inputs[8]) == 0

    # step 2: recursive case (condition = 1, inner = proof1)
    pw = PartialWitness()
    pw.set_target(condition, 1)
    set_proof_with_pis_target(pw, inner_pt, proof1)
    set_verifier_data_target(pw, b.verifier_data_public_input,
                             data.verifier_only)
    proof2 = data.prove(pw)
    check_cyclic_proof_verifier_data(proof2, data.verifier_only, common)
    data.verify(proof2)
    h2 = hash_no_pad_np(h1)
    assert list(map(int, proof2.public_inputs[0:4])) == h0
    assert list(map(int, proof2.public_inputs[4:8])) == [int(x) for x in h2]
    assert int(proof2.public_inputs[8]) == 1
