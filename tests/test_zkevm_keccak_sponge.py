"""KeccakSponge STARK: digest correctness vs keccak256, AIR checks, and
the CTL links to the Keccak-f and Logic tables (reference
evm/src/keccak_sponge/ + all_stark.rs CTL wiring)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.hash.keccak import keccak256
from plonky2_tpu.stark.ctl import (CrossTableLookup, TableWithColumns,
                                   check_ctls)
from plonky2_tpu.stark.testing import check_constraints_on_trace
from plonky2_tpu.stark.testing import test_stark_low_degree as low_degree_check
from plonky2_tpu.zkevm.keccak import KeccakStark
from plonky2_tpu.zkevm.keccak_sponge import (KECCAK_RATE_BYTES,
                                             KECCAK_RATE_U32S,
                                             KeccakSpongeOp,
                                             KeccakSpongeStark)
from plonky2_tpu.zkevm.logic import LogicStark

P = gl64.ORDER_INT


def _op(data: bytes, ts=7) -> KeccakSpongeOp:
    return KeccakSpongeOp(context=1, segment=2, virt=100, timestamp=ts,
                          input=data)


def test_sponge_digest_matches_keccak256():
    stark = KeccakSpongeStark()
    rng = np.random.default_rng(31)
    for n in (0, 1, 135, 136, 137, 272, 300):
        data = rng.bytes(n)
        assert stark.hash_of(_op(data)) == keccak256(data), n


def test_sponge_trace_air():
    stark = KeccakSpongeStark()
    rng = np.random.default_rng(33)
    ops = [_op(rng.bytes(200), ts=1), _op(rng.bytes(10), ts=2),
           _op(b"", ts=3)]
    trace = stark.generate_trace(ops, min_rows=8)
    check_constraints_on_trace(stark, trace)


def test_sponge_bad_chain_rejected():
    stark = KeccakSpongeStark()
    trace = stark.generate_trace([_op(b"x" * 200)], min_rows=4)
    # corrupt the second row's carried-over rate chunk
    col = stark.ORIGINAL_RATE[0]
    trace[col, 1] = (int(trace[col, 1]) + 1) % P
    with pytest.raises(AssertionError):
        check_constraints_on_trace(stark, trace)


def test_sponge_low_degree():
    low_degree_check(KeccakSpongeStark())


def test_sponge_keccak_and_logic_ctls():
    """The sponge's permutation + XOR requests form exactly the Keccak-f
    and Logic tables' looked multisets (all_stark.rs:99 wiring)."""
    rng = np.random.default_rng(35)
    sponge = KeccakSpongeStark()
    keccak = KeccakStark()
    logic = LogicStark(val_bits=256)

    ops = [_op(rng.bytes(150), ts=1), _op(rng.bytes(5), ts=2)]
    sponge_trace = sponge.generate_trace(ops, min_rows=8)

    # build the permutation inputs the sponge implies
    perm_inputs = []
    logic_ops = []
    absorbing = np.nonzero(
        gl64.to_canonical(
            sponge.ctl_looking_keccak_filter().eval_rows(sponge_trace)))[0]
    for r in absorbing:
        xored = [int(sponge_trace[i, r]) for i in sponge.XORED_RATE]
        cap = [int(sponge_trace[i, r]) for i in sponge.ORIGINAL_CAPACITY]
        chunks = xored + cap
        lanes = [chunks[2 * i] | (chunks[2 * i + 1] << 32)
                 for i in range(25)]
        perm_inputs.append(lanes)
        # XOR requests: 8 u32s per logic row
        rate = [int(sponge_trace[i, r]) for i in sponge.ORIGINAL_RATE]
        block = [int(sponge_trace[i, r]) for i in sponge.BLOCK_BYTES]
        for i in range(sponge.num_logic_ctls()):
            a = sum(v << (32 * j)
                    for j, v in enumerate(rate[8 * i:8 * i + 8]))
            chunk = block[32 * i:32 * i + 32]
            b = sum(v << (8 * j) for j, v in enumerate(chunk))
            logic_ops.append(("xor", a, b))
    keccak_trace = keccak.generate_trace(perm_inputs)
    logic_trace = logic.generate_trace(logic_ops)

    tables = [sponge_trace, keccak_trace, logic_trace]
    ctls = [
        CrossTableLookup(
            looking_tables=(TableWithColumns(
                0, tuple(sponge.ctl_looking_keccak()),
                sponge.ctl_looking_keccak_filter()),),
            looked_table=TableWithColumns(
                1, tuple(keccak.ctl_data()), keccak.ctl_filter())),
        CrossTableLookup(
            looking_tables=tuple(
                TableWithColumns(0, tuple(sponge.ctl_looking_logic(i)),
                                 sponge.ctl_looking_logic_filter())
                for i in range(sponge.num_logic_ctls())),
            looked_table=TableWithColumns(
                2, tuple(logic.ctl_data()), logic.ctl_filter())),
    ]
    check_ctls(tables, ctls)
    check_constraints_on_trace(sponge, sponge_trace)
    check_constraints_on_trace(keccak, keccak_trace)
    check_constraints_on_trace(logic, logic_trace)


def test_sponge_bad_padding_rejected():
    """pad10*1 must be enforced (a forged pad would change the digest)."""
    stark = KeccakSpongeStark()
    trace = stark.generate_trace([_op(b"hello")], min_rows=4)
    # final row: input len 5 -> byte 5 is the 0x01 pad, byte 135 is 0x80
    for col, bad in ((stark.BLOCK_BYTES[5], 0),       # drop the 1
                     (stark.BLOCK_BYTES[6], 7),       # nonzero interior
                     (stark.BLOCK_BYTES[135], 0)):    # drop the 0x80
        t = trace.copy()
        t[col, 0] = bad
        with pytest.raises(AssertionError):
            check_constraints_on_trace(stark, t)
