"""Staged per-table recursive verification: independent wrapper circuits
seeded by challenger boundary states, combined by a root circuit
(reference evm/src/recursive_verifier.rs + fixed_recursive_verifier.rs
root chaining).  Heavy: builds per-table wrappers + a root circuit."""

import numpy as np

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.multi import prove_multi_table, verify_multi_table
from plonky2_tpu.stark.staged import prove_staged

from test_ctl import MulStark, ReqStark, Req2Stark, _ctls, _mul_trace, \
    _req_traces


def test_staged_wrapper_and_root():
    sconfig = StarkConfig(fri_config=FriConfig(
        rate_bits=1, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=8))
    cconfig = CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4))

    mul = _mul_trace()
    req1, req2 = _req_traces(mul)
    starks = [MulStark(), ReqStark(), Req2Stark()]
    ctls = _ctls()
    proof = prove_multi_table(starks, ctls, sconfig, [mul, req1, req2])
    # the boundary-compacted transcript still verifies monolithically
    verify_multi_table(starks, ctls, proof, sconfig)
    assert all(p.init_challenger_state is not None
               for p in proof.stark_proofs)

    root, root_proof = prove_staged(starks, ctls, proof, sconfig, cconfig)
    assert root_proof is not None
