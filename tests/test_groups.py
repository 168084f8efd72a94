"""Device groups (parallel/groups.py): expert-parallel per-table trace
commitments and the two-stage pipelined proof stream must be bit-identical
to the single-chip prover."""

import numpy as np

from plonky2_tpu.field import gl64
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.fri.oracle import PolynomialBatch
from plonky2_tpu.parallel.groups import (device_groups,
                                         grouped_trace_commitments,
                                         pipeline_prove_stream,
                                         sharded_polynomial_batch)
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.multi import prove_multi_table, verify_multi_table
from plonky2_tpu.zkevm.serialization import multi_proof_to_bytes

from test_ctl import (MulStark, Req2Stark, ReqStark, _ctls, _mul_trace,
                      _req_traces)

P = gl64.ORDER_INT


def test_sharded_batch_odd_polys_matches_from_values():
    # 13 polys on a 4-device group: pad-to-16 then drop before hashing
    rng = np.random.default_rng(11)
    k, n, rate_bits, cap_height = 13, 64, 3, 4
    values = GF.from_u64(rng.integers(0, P, size=(k, n), dtype=np.uint64))
    group = device_groups(2)[1]
    got = sharded_polynomial_batch(values, rate_bits, cap_height,
                                   group).finalize()
    want = PolynomialBatch.from_values(values, rate_bits, False, cap_height)
    assert got.merkle_tree.cap == want.merkle_tree.cap
    assert np.array_equal(gl64.to_canonical(np.asarray(got.merkle_tree.leaves_np)),
                          gl64.to_canonical(np.asarray(want.merkle_tree.leaves_np)))
    assert len(got.merkle_tree.levels) == len(want.merkle_tree.levels)
    for a, b in zip(got.merkle_tree.levels, want.merkle_tree.levels):
        assert np.array_equal(gl64.to_canonical(np.asarray(a)),
                              gl64.to_canonical(np.asarray(b)))
    assert np.array_equal(
        gl64.to_canonical(np.asarray(got.polynomials.to_u64())),
        gl64.to_canonical(np.asarray(want.polynomials.to_u64())))
    # Merkle opening paths work off the assembled levels
    pr = got.merkle_tree.prove(5)
    assert np.array_equal(pr.siblings, want.merkle_tree.prove(5).siblings)


def test_multi_table_expert_parallel_bit_identical():
    mul = _mul_trace()
    req1, req2 = _req_traces(mul)
    starks = [MulStark(), ReqStark(), Req2Stark()]
    config = StarkConfig.standard_fast_config()
    groups = device_groups(2)
    proof_ep = prove_multi_table(starks, _ctls(), config, [mul, req1, req2],
                                 mesh_groups=groups)
    verify_multi_table(starks, _ctls(), proof_ep, config)
    proof_seq = prove_multi_table(starks, _ctls(), config, [mul, req1, req2])
    assert multi_proof_to_bytes(proof_ep) == multi_proof_to_bytes(proof_seq)


def test_pipeline_prove_stream_matches_sequential():
    from plonky2_tpu.stark.fibonacci import FibonacciStark
    from plonky2_tpu.stark.prover import prove
    from plonky2_tpu.stark.verifier import verify_stark_proof

    stark = FibonacciStark(num_rows=64)
    config = StarkConfig.standard_fast_config()
    seeds = [(0, 1), (2, 5), (3, 7)]
    traces = [stark.generate_trace(a, b) for a, b in seeds]
    pis = [np.asarray([a, b, stark.expected_result(a, b)], np.uint64)
           for a, b in seeds]

    groups = device_groups(2)
    piped = pipeline_prove_stream(stark, config, traces, pis, groups)
    assert len(piped) == len(traces)
    for i, proof in enumerate(piped):
        verify_stark_proof(stark, proof, config, degree_bits=6)
        seq = prove(stark, config, traces[i], pis[i])
        assert proof.proof.trace_cap == seq.proof.trace_cap
        assert np.array_equal(
            np.asarray(proof.proof.openings.local_values),
            np.asarray(seq.proof.openings.local_values))
        assert np.array_equal(
            np.asarray(proof.proof.opening_proof.final_poly),
            np.asarray(seq.proof.opening_proof.final_poly))


def test_grouped_commitments_round_robin():
    rng = np.random.default_rng(13)
    tables = [rng.integers(0, P, size=(4, 32), dtype=np.uint64)
              for _ in range(3)]
    groups = device_groups(4)
    got = grouped_trace_commitments(tables, 1, 1, groups)
    for t, b in zip(tables, got):
        want = PolynomialBatch.from_values(GF.from_u64(t), 1, False, 1)
        assert b.merkle_tree.cap == want.merkle_tree.cap
