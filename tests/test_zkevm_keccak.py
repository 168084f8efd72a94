"""Keccak-f[1600] round STARK: trace correctness vs the verified keccak
kernel, AIR satisfaction, low degree (reference evm/src/keccak/ tests)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.stark.testing import check_constraints_on_trace
from plonky2_tpu.stark.testing import test_stark_low_degree as low_degree_check
from plonky2_tpu.zkevm.keccak import (NUM_ROUNDS, KeccakStark, keccak_f)

P = gl64.ORDER_INT


def _rand_inputs(rng, count):
    return [[int(v) for v in rng.integers(0, 1 << 63, size=25, dtype=np.int64)]
            for _ in range(count)]


def test_keccak_trace_output_matches_kernel():
    rng = np.random.default_rng(21)
    stark = KeccakStark()
    inputs = _rand_inputs(rng, 3)
    trace = stark.generate_trace(inputs)

    state = np.zeros((len(inputs), 5, 5), np.uint64)
    for p, inp in enumerate(inputs):
        for i, v in enumerate(inp):
            y, x = divmod(i, 5)
            state[p, x, y] = v
    expect = keccak_f(state)

    for p in range(len(inputs)):
        last = p * NUM_ROUNDS + NUM_ROUNDS - 1
        assert trace[stark.REG_FILTER, last] == 1
        for x in range(5):
            for y in range(5):
                lo = int(trace[stark.reg_a_ppp(x, y), last])
                hi = int(trace[stark.reg_a_ppp(x, y) + 1, last])
                assert lo | (hi << 32) == int(expect[p, x, y]), (x, y)


def test_keccak_ctl_data_exports_io():
    rng = np.random.default_rng(23)
    stark = KeccakStark()
    inputs = _rand_inputs(rng, 2)
    trace = stark.generate_trace(inputs)
    cols = stark.ctl_data()
    filt = gl64.to_canonical(stark.ctl_filter().eval_rows(trace))
    rows = np.nonzero(filt)[0]
    assert len(rows) == len(inputs)
    exported = np.stack([c.eval_rows(trace) for c in cols])
    state = np.zeros((len(inputs), 5, 5), np.uint64)
    for p, inp in enumerate(inputs):
        for i, v in enumerate(inp):
            y, x = divmod(i, 5)
            state[p, x, y] = v
    out = keccak_f(state)
    for p, r in enumerate(rows):
        for i in range(25):
            y, x = divmod(i, 5)
            got_in = int(exported[2 * i, r]) | (int(exported[2 * i + 1, r])
                                                << 32)
            got_out = int(exported[50 + 2 * i, r]) | (
                int(exported[50 + 2 * i + 1, r]) << 32)
            assert got_in == int(state[p, x, y])
            assert got_out == int(out[p, x, y])


def test_keccak_trace_air():
    rng = np.random.default_rng(25)
    stark = KeccakStark()
    trace = stark.generate_trace(_rand_inputs(rng, 2), min_rows=64)
    assert trace.shape == (stark.COLUMNS, 64)
    check_constraints_on_trace(stark, trace)


def test_keccak_bad_trace_rejected():
    rng = np.random.default_rng(27)
    stark = KeccakStark()
    trace = stark.generate_trace(_rand_inputs(rng, 1))
    col = stark.reg_a_ppp(1, 2)
    trace[col, 5] = (int(trace[col, 5]) + 1) % P
    with pytest.raises(AssertionError):
        check_constraints_on_trace(stark, trace)


def test_keccak_low_degree():
    low_degree_check(KeccakStark())
