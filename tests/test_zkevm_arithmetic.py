"""Arithmetic STARK table: op semantics, AIR satisfaction, low degree,
range checks (reference evm/src/arithmetic/ tests)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.stark.testing import check_constraints_on_trace
from plonky2_tpu.stark.testing import test_stark_low_degree as low_degree_check
from plonky2_tpu.zkevm.arithmetic import (ALL_OPS, BN_BASE, ArithmeticStark,
                                          Operation)

P = gl64.ORDER_INT


def small_stark():
    # 64-bit registers, 8-bit limbs -> 256-row range table
    return ArithmeticStark(val_bits=64, limb_bits=8)


def random_ops(rng, stark, kinds=None, count=2):
    vb = stark.val_bits
    ops = []
    for op in kinds or ALL_OPS:
        if op.endswith("fp254") and not stark.has_fp254:
            continue
        for _ in range(count):
            a = int(rng.integers(0, 1 << 62)) | (int(rng.integers(0, 4))
                                                 << (vb - 2))
            a &= (1 << vb) - 1
            b = int(rng.integers(0, 1 << 62)) & ((1 << vb) - 1)
            m = int(rng.integers(0, 1 << 62)) & ((1 << vb) - 1)
            if op == "byte":
                a = int(rng.integers(0, vb // 8 + 3))
            ops.append(Operation(op, a, b, m))
    return ops


def test_operation_semantics():
    # cross-check Operation.result against plain Python bigint math
    rng = np.random.default_rng(0)
    vb = 64
    mask = (1 << vb) - 1
    for _ in range(50):
        a, b = (int(rng.integers(0, 1 << 63)) for _ in range(2))
        m = int(rng.integers(1, 1 << 63))
        assert Operation("add", a, b).result(vb) == (a + b) & mask
        assert Operation("mul", a, b).result(vb) == (a * b) & mask
        assert Operation("sub", a, b).result(vb) == (a - b) & mask
        assert Operation("div", a, b).result(vb) == a // b
        assert Operation("mod", a, b).result(vb) == a % b
        assert Operation("addmod", a, b, m).result(vb) == (a + b) % m
        assert Operation("mulmod", a, b, m).result(vb) == (a * b) % m
        assert Operation("submod", a, b, m).result(vb) == (a - b) % m
        assert Operation("lt", a, b).result(vb) == int(a < b)
    # byte indexes from the most significant end (byte.rs:8)
    x = 0x0102030405060708
    for i in range(8):
        assert Operation("byte", i, x).result(64) == i + 1
    assert Operation("byte", 8, x).result(64) == 0
    assert Operation("byte", 1000, x).result(64) == 0


def test_arithmetic_low_degree():
    low_degree_check(small_stark())


def test_arithmetic_trace_air_all_ops():
    rng = np.random.default_rng(7)
    stark = small_stark()
    ops = random_ops(rng, stark)
    trace = stark.generate_trace(ops)
    assert trace.shape == (stark.COLUMNS, 256)
    check_constraints_on_trace(stark, trace)


def test_arithmetic_edge_cases():
    stark = small_stark()
    vb = stark.val_bits
    top = (1 << vb) - 1
    ops = [
        Operation("add", top, top),          # carry out
        Operation("sub", 0, 1),              # borrow
        Operation("mul", top, top),
        Operation("div", 5, 0),              # EVM: x/0 = 0
        Operation("mod", 5, 0),
        Operation("addmod", 3, 4, 0),        # m=0 -> 0
        Operation("mulmod", 3, 4, 0),
        Operation("submod", 3, 4, 0),
        Operation("submod", 1, 2, 7),        # negative quotient path
        Operation("lt", 5, 5),
        Operation("gt", 5, 5),
        Operation("byte", 0, top),
        Operation("byte", vb // 8 - 1, 0xAB),
        Operation("byte", vb // 8, top),     # out-of-range index
        Operation("div", top, 3),
        Operation("mod", top, top),
    ]
    for op in ops:
        # singleton traces: isolate each op's constraint set
        trace = stark.generate_trace([op])
        check_constraints_on_trace(stark, trace)
    trace = stark.generate_trace(ops)
    check_constraints_on_trace(stark, trace)


def test_arithmetic_trace_exports_results():
    rng = np.random.default_rng(9)
    stark = small_stark()
    ops = random_ops(rng, stark, count=1)
    trace = stark.generate_trace(ops)
    exported = np.stack([c.eval_rows(trace) for c in stark.ctl_data()])
    filt = gl64.to_canonical(stark.ctl_filter().eval_rows(trace))
    rows = np.nonzero(filt)[0]
    assert len(rows) == len(ops)
    # bus values are always 32-bit groups (limb-width-invariant CTL)
    group = 32 // stark.limb_bits
    n2 = stark.n_limbs // group
    w = 32
    for r, op in zip(rows, ops):
        flags = exported[:len(ALL_OPS), r]
        assert flags[list(ALL_OPS).index(op.op)] == 1 and flags.sum() == 1
        regs = []
        for g in range(4):
            base = len(ALL_OPS) + g * n2
            regs.append(sum(int(exported[base + i, r]) << (w * i)
                            for i in range(n2)))
        assert regs[3] == op.result(stark.val_bits), op
    check_constraints_on_trace(stark, trace)


def test_arithmetic_bad_trace_rejected():
    stark = small_stark()
    trace = stark.generate_trace([Operation("add", 100, 200)])
    out0 = stark.OUTPUT.start
    trace[out0, 0] = (int(trace[out0, 0]) + 1) % P
    with pytest.raises(AssertionError):
        check_constraints_on_trace(stark, trace)


def test_arithmetic_full_width_semantics():
    # the production (256-bit, 16-bit limb) layout: check generation paths
    # and constraint satisfaction on individual rows without the 2^16-row
    # range table (constraints checked on a truncated counter domain are
    # not meaningful, so only exercise generation + result extraction)
    rng = np.random.default_rng(11)
    stark = ArithmeticStark(val_bits=256, limb_bits=16)
    mask = (1 << 256) - 1
    ops = []
    for op in ALL_OPS:
        a = int.from_bytes(rng.bytes(32), "little") & mask
        b = int.from_bytes(rng.bytes(32), "little") & mask
        m = int.from_bytes(rng.bytes(32), "little") & mask
        if op == "byte":
            a = int(rng.integers(0, 40))
        ops.append(Operation(op, a, b, m))
    trace = stark.generate_trace(ops)
    assert trace.shape == (stark.COLUMNS, 1 << 16)
    exported = np.stack([c.eval_rows(trace[:, :64]) for c in
                         stark.ctl_data()])
    filt = gl64.to_canonical(stark.ctl_filter().eval_rows(trace[:, :64]))
    rows = np.nonzero(filt)[0]
    assert len(rows) == len(ops)
    for r, op in zip(rows, ops):
        out = sum(int(exported[len(ALL_OPS) + 3 * 8 + i, r]) << (32 * i)
                  for i in range(8))
        assert out == op.result(256), op.op
