"""Multi-table proof binary round-trip (reference AllProof Read/Write,
util/serialization/mod.rs)."""

import numpy as np

from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.multi import prove_multi_table, verify_multi_table
from plonky2_tpu.zkevm.serialization import (multi_proof_from_bytes,
                                             multi_proof_to_bytes)

from test_ctl import MulStark, ReqStark, Req2Stark, _ctls, _mul_trace, \
    _req_traces


def test_multi_proof_round_trip():
    mul = _mul_trace()
    req1, req2 = _req_traces(mul)
    starks = [MulStark(), ReqStark(), Req2Stark()]
    ctls = _ctls()
    config = StarkConfig.standard_fast_config()
    proof = prove_multi_table(starks, ctls, config, [mul, req1, req2])

    blob = multi_proof_to_bytes(proof)
    rt = multi_proof_from_bytes(blob)
    assert rt.degree_bits() == proof.degree_bits()
    verify_multi_table(starks, ctls, rt, config)
    # tampered blob fails verification
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 1
    try:
        rt2 = multi_proof_from_bytes(bytes(bad))
        verify_multi_table(starks, ctls, rt2, config)
    except AssertionError:
        return
    raise AssertionError("tampered serialized proof accepted")


def test_round_trip_preserves_challenger_state():
    """Staged per-table recursion needs init_challenger_state; a
    deserialized proof must still carry it (12-felt sponge state)."""
    mul = _mul_trace()
    req1, req2 = _req_traces(mul)
    starks = [MulStark(), ReqStark(), Req2Stark()]
    ctls = _ctls()
    config = StarkConfig.standard_fast_config()
    proof = prove_multi_table(starks, ctls, config, [mul, req1, req2])
    rt = multi_proof_from_bytes(multi_proof_to_bytes(proof))
    for orig, back in zip(proof.stark_proofs, rt.stark_proofs):
        assert orig.init_challenger_state is not None
        assert back.init_challenger_state is not None
        assert np.array_equal(np.asarray(orig.init_challenger_state,
                                         np.uint64),
                              np.asarray(back.init_challenger_state,
                                         np.uint64))
