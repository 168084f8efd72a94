"""zkEVM tables: Logic + Memory AIRs, their traces, and a joint
multi-table proof tied by CTLs (reference evm/src/logic.rs,
memory/memory_stark.rs, lookup.rs tests + a miniature of the evm prover
pipeline)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.ctl import (Column, CrossTableLookup, TableWithColumns,
                                   check_ctls)
from plonky2_tpu.stark.multi import prove_multi_table, verify_multi_table
from plonky2_tpu.stark.stark import Stark
from plonky2_tpu.stark.testing import check_constraints_on_trace
from plonky2_tpu.stark.testing import test_stark_low_degree as low_degree_check
from plonky2_tpu.zkevm import LogicStark, MemoryOp, MemoryStark
from plonky2_tpu.zkevm.lookup import permuted_cols
from plonky2_tpu.zkevm.logic import op_result

P = gl64.ORDER_INT


# ---------------------------------------------------------------- lookup

def test_permuted_cols():
    rng = np.random.default_rng(0)
    table = np.arange(32, dtype=np.uint64)
    inputs = rng.choice(table, size=32).astype(np.uint64)
    si, pt = permuted_cols(inputs, table)
    # sorted inputs is a permutation of inputs; permuted table of table
    assert sorted(si.tolist()) == sorted(inputs.tolist())
    assert sorted(pt.tolist()) == sorted(table.tolist())
    # halo2 condition: each sorted input repeats predecessor or matches table
    ok = (si[1:] == si[:-1]) | (si[1:] == pt[1:])
    assert bool(np.all(ok)) and si[0] == pt[0]


# ----------------------------------------------------------------- logic

def test_logic_stark_low_degree():
    low_degree_check(LogicStark(val_bits=64))


def test_logic_trace_and_air():
    rng = np.random.default_rng(3)
    stark = LogicStark(val_bits=64)
    ops = [(op, int(rng.integers(0, 1 << 63)), int(rng.integers(0, 1 << 63)))
           for op in ("and", "or", "xor") for _ in range(3)]
    trace = stark.generate_trace(ops)
    check_constraints_on_trace(stark, trace)
    # exported CTL columns carry (flags, repacked inputs, result limbs)
    cols = stark.ctl_data()
    exported = np.stack([c.eval_rows(trace) for c in cols], axis=0)
    for i, (op, a, b) in enumerate(ops):
        flags = exported[:3, i]
        assert flags.tolist() == [op == "and", op == "or", op == "xor"]
        pl = stark.packed_len
        got_a = sum(int(exported[3 + j, i]) << (32 * j) for j in range(pl))
        got_b = sum(int(exported[3 + pl + j, i]) << (32 * j)
                    for j in range(pl))
        got_r = sum(int(exported[3 + 2 * pl + j, i]) << (32 * j)
                    for j in range(pl))
        assert (got_a, got_b, got_r) == (a, b, op_result(op, a, b))


# ---------------------------------------------------------------- memory

def _memory_ops(rng, n_addrs=4, n_ops=18):
    ops = []
    vals = {}
    for t in range(n_ops):
        addr = (0, 1, int(rng.integers(0, n_addrs)))
        if addr in vals and rng.integers(0, 2) == 0:
            ops.append(MemoryOp(True, 2 * t + 1, True, *addr, vals[addr]))
        else:
            v = int(rng.integers(0, 1 << 62))
            vals[addr] = v
            ops.append(MemoryOp(True, 2 * t + 1, False, *addr, v))
    return ops


def test_memory_stark_low_degree():
    low_degree_check(MemoryStark())


def test_memory_trace_and_air():
    rng = np.random.default_rng(5)
    stark = MemoryStark()
    trace = stark.generate_trace(_memory_ops(rng))
    check_constraints_on_trace(stark, trace)


def test_memory_fill_gaps():
    # a large timestamp gap must be bridged by dummy reads
    from plonky2_tpu.zkevm.memory import RANGE_CHECK
    ops = [MemoryOp(True, 2 * t + 1, False, 0, 0, t % 3, 42 + t)
           for t in range(6)]
    # read back the LAST value written to virt 0 (t=3 wrote 45)
    ops.append(MemoryOp(True, 300, True, 0, 0, 0, 45))
    stark = MemoryStark()
    trace = stark.generate_trace(ops)
    check_constraints_on_trace(stark, trace)
    n = trace.shape[-1]
    assert np.all(gl64.to_canonical(trace[RANGE_CHECK]) < n)


def test_memory_single_table_prove_verify():
    from plonky2_tpu.stark.prover import prove
    from plonky2_tpu.stark.verifier import verify_stark_proof
    from plonky2_tpu.field.goldilocks import GF
    rng = np.random.default_rng(6)
    stark = MemoryStark()
    trace = stark.generate_trace(_memory_ops(rng, n_ops=25))
    config = StarkConfig.standard_fast_config()
    proof = prove(stark, config, GF.from_u64(trace),
                  np.zeros(0, np.uint64))
    verify_stark_proof(stark, proof, config,
                       degree_bits=trace.shape[-1].bit_length() - 1)


# ----------------------------------------------- joint multi-table proof

class BusStark(Stark):
    """Mini CPU stand-in: requests logic ops and memory reads over CTLs."""

    PUBLIC_INPUTS = 0

    def __init__(self, logic: LogicStark):
        # logic bus width (flags + 2 inputs + result) + memory bus width
        self.logic_width = 3 + 3 * logic.packed_len
        self.mem_width = 4 + 8 + 1
        # [logic_filter, logic row..., mem_filter, mem row...]
        self.LOGIC_FILTER = 0
        self.LOGIC = range(1, 1 + self.logic_width)
        self.MEM_FILTER = self.LOGIC.stop
        self.MEM = range(self.MEM_FILTER + 1,
                         self.MEM_FILTER + 1 + self.mem_width)
        self.COLUMNS = self.MEM.stop

    def eval_generic(self, ctx, vars, yield_constr):
        one = ctx.one()
        for f in (self.LOGIC_FILTER, self.MEM_FILTER):
            yield_constr.constraint(
                vars.local_values[f] * (vars.local_values[f] - one))

    def constraint_degree(self):
        return 3

    def ctl_looking_logic(self):
        return TableWithColumns(
            2, tuple(Column.singles(self.LOGIC)),
            Column.single(self.LOGIC_FILTER))

    def ctl_looking_memory(self):
        return TableWithColumns(
            2, tuple(Column.singles(self.MEM)),
            Column.single(self.MEM_FILTER))


def _joint_traces():
    rng = np.random.default_rng(11)
    logic = LogicStark(val_bits=64)
    memory = MemoryStark()
    bus = BusStark(logic)

    logic_ops = [(op, int(rng.integers(0, 1 << 63)),
                  int(rng.integers(0, 1 << 63)))
                 for op in ("and", "xor") for _ in range(2)]
    mem_ops = _memory_ops(rng, n_addrs=3, n_ops=10)

    # cap_height=4 Merkle caps need >= 2^4 LDE leaves per oracle
    logic_trace = logic.generate_trace(logic_ops, min_rows=16)
    mem_trace = memory.generate_trace(mem_ops)
    assert mem_trace.shape[-1] >= 16

    n = 16
    bus_trace = np.zeros((bus.COLUMNS, n), np.uint64)
    lrows = np.stack([c.eval_rows(logic_trace) for c in logic.ctl_data()])
    lfilt = logic.ctl_filter().eval_rows(logic_trace)
    idx = np.nonzero(gl64.to_canonical(lfilt))[0]
    bus_trace[bus.LOGIC.start:bus.LOGIC.stop, :len(idx)] = lrows[:, idx]
    bus_trace[bus.LOGIC_FILTER, :len(idx)] = 1

    from plonky2_tpu.zkevm import memory as memmod
    mrows = np.stack([c.eval_rows(mem_trace) for c in memmod.ctl_data()])
    mfilt = memmod.ctl_filter().eval_rows(mem_trace)
    midx = np.nonzero(gl64.to_canonical(mfilt))[0]
    assert len(midx) <= n
    bus_trace[bus.MEM.start:bus.MEM.stop, :len(midx)] = mrows[:, midx]
    bus_trace[bus.MEM_FILTER, :len(midx)] = 1

    starks = [logic, memory, bus]
    ctls = [
        CrossTableLookup(
            looking_tables=(bus.ctl_looking_logic(),),
            looked_table=TableWithColumns(0, tuple(logic.ctl_data()),
                                          logic.ctl_filter())),
        CrossTableLookup(
            looking_tables=(bus.ctl_looking_memory(),),
            looked_table=TableWithColumns(1, tuple(memmod.ctl_data()),
                                          memmod.ctl_filter())),
    ]
    return starks, ctls, [logic_trace, mem_trace, bus_trace]


def test_zkevm_multi_table_prove_verify():
    starks, ctls, traces = _joint_traces()
    check_ctls(traces, ctls)
    config = StarkConfig.standard_fast_config()
    proof = prove_multi_table(starks, ctls, config, traces)
    verify_multi_table(starks, ctls, proof, config)


def test_memory_fresh_read_must_be_zero():
    """A read at a never-written address is pinned to value 0 (the
    simulator's deterministic semantics); a prover-chosen value must be
    rejected by the AIR."""
    stark = MemoryStark()
    ops = [MemoryOp(True, 1, False, 0, 3, 0, 11),   # write MAIN[0] = 11
           MemoryOp(True, 2, True, 0, 3, 0, 11),    # read it back
           MemoryOp(True, 3, True, 0, 3, 5, 0)]     # fresh read -> 0
    trace = stark.generate_trace(ops)
    check_constraints_on_trace(stark, trace)
    from plonky2_tpu.zkevm.memory import ADDR_VIRTUAL, value_limb
    bad = trace.copy()
    cols = np.nonzero(gl64.to_canonical(bad[ADDR_VIRTUAL]) == 5)[0]
    bad[value_limb(0), cols] = 99   # forge the fresh read's value
    with pytest.raises(AssertionError):
        check_constraints_on_trace(stark, bad)
    # forging the very first row (if it were a read) is also rejected
    bad2 = trace.copy()
    bad2[value_limb(0), 0] = 99
    assert gl64.to_canonical(bad2[2, 0]) == 0  # first row is the write
    bad2[2, 0] = 1  # flip to read with nonzero value
    with pytest.raises(AssertionError):
        check_constraints_on_trace(stark, bad2)
