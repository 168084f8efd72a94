"""Witness generation + AllStark wiring for the mini-EVM pipeline
(twin of reference evm/src/generation/mod.rs, witness/traces.rs and
all_stark.rs).

`simulate` runs a program on the reduced-ISA CPU (cpu.py), logging every
memory access, arithmetic request and logic request into `Traces`
(checkpoint/rollback as witness/traces.rs:20,51,62).  `generate_traces`
turns the logs into the per-table trace arrays; `all_stark` assembles
the table list and cross-table lookups (all_stark.rs:99
all_cross_table_lookups); `prove_all` / `verify_all` run the shared
transcript multi-table prover (stark/multi.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..field import gl64
from ..stark.config import StarkConfig
from ..stark.ctl import CrossTableLookup, TableWithColumns
from ..stark.multi import prove_multi_table, verify_multi_table
from .arithmetic import ArithmeticStark, Operation
from .cpu import (ARITH_OPS, BINOPS, KECCAK_TS_CH, LOGIC_OPS, NUM_CHANNELS,
                  OPS, SEG_BYTES, SEG_CODE, SEG_MAIN, SEG_STACK, TS_STRIDE,
                  WORD_LIMBS, CpuStark, Instr)
from .logic import LogicStark
from .memory import MemoryOp, MemoryStark

P = gl64.ORDER_INT
WORD_MASK = (1 << 256) - 1

# table indices (all_stark.rs:75 Table enum); PROGRAM is always last
CPU, MEMORY, LOGIC, ARITHMETIC = 0, 1, 2, 3


def code_words(program: list) -> list:
    """The public code image: (opcode, immediate) word pair per
    instruction, as bootstrapped into the CODE segment."""
    words = []
    for ins in program:
        words.append(OPS.index(ins.op))
        words.append(ins.imm & WORD_MASK)
    return words


@dataclass
class Traces:
    """Operation logs with checkpoint/rollback (witness/traces.rs)."""

    memory_ops: list = field(default_factory=list)
    arithmetic_ops: list = field(default_factory=list)
    logic_ops: list = field(default_factory=list)
    sponge_ops: list = field(default_factory=list)
    cpu_rows: list = field(default_factory=list)

    def checkpoint(self) -> tuple:
        return (len(self.memory_ops), len(self.arithmetic_ops),
                len(self.logic_ops), len(self.sponge_ops),
                len(self.cpu_rows))

    def rollback(self, cp: tuple) -> None:
        m, a, l, s, c = cp
        del self.memory_ops[m:]
        del self.arithmetic_ops[a:]
        del self.logic_ops[l:]
        del self.sponge_ops[s:]
        del self.cpu_rows[c:]


def _limbs(v: int) -> list:
    return [(v >> (32 * j)) & 0xFFFFFFFF for j in range(WORD_LIMBS)]


class Simulator:
    """Executes a program, emitting CPU rows + table requests."""

    def __init__(self, program: list, max_cycles: int = 10_000):
        assert program and program[-1].op == "halt", \
            "program must end with HALT"
        self.program = program
        self.cpu = CpuStark()
        self.traces = Traces()
        self.max_cycles = max_cycles

    def run(self, main_init: dict | None = None) -> Traces:
        cpu, t = self.cpu, self.traces
        clock = 0
        memory = {}  # (segment, virt) -> value
        if main_init:
            raise NotImplementedError("preload MAIN via MSTOREs instead")

        def mem_access(row, ch, is_read, seg, virt, value):
            row[cpu.CH_USED[ch]] = 1
            row[cpu.CH_IS_READ[ch]] = int(is_read)
            row[cpu.CH_SEGMENT[ch]] = seg
            row[cpu.CH_VIRT[ch]] = virt
            for j, v in enumerate(_limbs(value)):
                row[cpu.CH_VALUE[ch][j]] = v
            t.memory_ops.append(MemoryOp(
                True, clock * TS_STRIDE + ch + 1, is_read, 0, seg,
                virt, value))
            if not is_read:
                memory[(seg, virt)] = value
            else:
                assert memory.get((seg, virt), 0) == value
            return value

        # bootstrap: write the code image (2 words per instruction)
        code = code_words(self.program)
        for i, word in enumerate(code):
            row = np.zeros(cpu.COLUMNS, np.uint64)
            row[cpu.IS_BOOTSTRAP] = 1
            row[cpu.CLOCK] = clock
            row[cpu.PC] = i
            mem_access(row, 0, False, SEG_CODE, i, word)
            t.cpu_rows.append(row)
            clock += 1

        # execution
        pc = 0
        stack = []
        for _ in range(self.max_cycles):
            ins = self.program[pc]
            row = np.zeros(cpu.COLUMNS, np.uint64)
            row[cpu.IS_CYCLE] = 1
            row[cpu.CLOCK] = clock
            row[cpu.PC] = pc
            row[cpu.SP] = len(stack)
            row[cpu.OP[ins.op]] = 1
            for j, v in enumerate(_limbs(ins.imm & WORD_MASK)):
                row[cpu.IMM.start + j] = v
            mem_access(row, 0, True, SEG_CODE, 2 * pc, OPS.index(ins.op))
            mem_access(row, 1, True, SEG_CODE, 2 * pc + 1,
                       ins.imm & WORD_MASK)

            next_pc = pc + 1
            if ins.op == "push":
                mem_access(row, 4, False, SEG_STACK, len(stack),
                           ins.imm & WORD_MASK)
                stack.append(ins.imm & WORD_MASK)
            elif ins.op in BINOPS:
                b = stack.pop()
                a = stack.pop()
                mem_access(row, 2, True, SEG_STACK, len(stack) + 1, b)
                mem_access(row, 3, True, SEG_STACK, len(stack), a)
                if ins.op in LOGIC_OPS:
                    res = {"and": a & b, "or": a | b, "xor": a ^ b}[ins.op]
                    t.logic_ops.append((ins.op, a, b))
                else:
                    op = Operation(ins.op, a, b)
                    res = op.result(256)
                    t.arithmetic_ops.append(op)
                mem_access(row, 4, False, SEG_STACK, len(stack), res)
                stack.append(res)
            elif ins.op == "mload":
                addr = stack.pop()
                assert addr < (1 << 32), "MLOAD address must be one limb"
                mem_access(row, 2, True, SEG_STACK, len(stack), addr)
                val = memory.get((SEG_MAIN, addr), 0)
                mem_access(row, 3, True, SEG_MAIN, addr, val)
                mem_access(row, 4, False, SEG_STACK, len(stack), val)
                stack.append(val)
            elif ins.op == "mstore":
                addr = stack.pop()
                val = stack.pop()
                assert addr < (1 << 32), "MSTORE address must be one limb"
                mem_access(row, 2, True, SEG_STACK, len(stack) + 1, addr)
                mem_access(row, 3, True, SEG_STACK, len(stack), val)
                mem_access(row, 4, False, SEG_MAIN, addr, val)
            elif ins.op == "mstore8":
                addr = stack.pop()
                val = stack.pop()
                assert addr < (1 << 32) and val < 256, "MSTORE8 operands"
                mem_access(row, 2, True, SEG_STACK, len(stack) + 1, addr)
                mem_access(row, 3, True, SEG_STACK, len(stack), val)
                for i, b in enumerate(f"{val:08b}"[::-1]):
                    row[cpu.BYTE_BITS.start + i] = int(b)
                mem_access(row, 4, False, SEG_BYTES, addr, val)
            elif ins.op == "keccak":
                addr = stack.pop()
                length = stack.pop()
                assert addr < (1 << 32) and length < (1 << 32)
                mem_access(row, 2, True, SEG_STACK, len(stack) + 1, addr)
                mem_access(row, 3, True, SEG_STACK, len(stack), length)
                data = bytes(memory.get((SEG_BYTES, addr + i), 0)
                             for i in range(length))
                from .keccak_sponge import KeccakSpongeOp, KeccakSpongeStark
                sponge_ts = clock * TS_STRIDE + KECCAK_TS_CH
                op_s = KeccakSpongeOp(0, SEG_BYTES, addr, sponge_ts, data)
                t.sponge_ops.append(op_s)
                # the sponge's per-byte reads appear in the memory table
                for i, b in enumerate(data):
                    t.memory_ops.append(MemoryOp(
                        True, sponge_ts, True, 0, SEG_BYTES, addr + i, b))
                digest = KeccakSpongeStark().hash_of(op_s)
                h = int.from_bytes(digest, "little")
                mem_access(row, 4, False, SEG_STACK, len(stack), h)
                stack.append(h)
            elif ins.op == "jumpz":
                cond = stack.pop()
                mem_access(row, 2, True, SEG_STACK, len(stack), cond)
                cond_sum = sum(_limbs(cond)) % P
                taken = int(cond_sum == 0)
                row[cpu.JUMP_TAKEN] = taken
                row[cpu.COND_SUM_INV] = (pow(cond_sum, P - 2, P)
                                         if cond_sum else 0)
                next_pc = (ins.imm if taken else pc + 1)
            elif ins.op == "halt":
                t.cpu_rows.append(row)
                clock += 1
                self.final_stack = stack
                self.final_memory = memory
                return self.traces
            else:
                raise ValueError(ins.op)
            t.cpu_rows.append(row)
            clock += 1
            pc = next_pc
        raise RuntimeError("program did not halt within max_cycles")


def sponge_derived_requests(sponge, sponge_trace: np.ndarray) -> tuple:
    """The keccak-f permutation calls and rate-XOR logic requests implied
    by a sponge trace (what the sponge delegates over CTLs)."""
    perm_inputs = []
    logic_ops = []
    filt = gl64.to_canonical(
        sponge.ctl_looking_keccak_filter().eval_rows(sponge_trace))
    for r in np.nonzero(filt)[0]:
        xored = [int(sponge_trace[i, r]) for i in sponge.XORED_RATE]
        cap = [int(sponge_trace[i, r]) for i in sponge.ORIGINAL_CAPACITY]
        chunks = xored + cap
        perm_inputs.append([chunks[2 * i] | (chunks[2 * i + 1] << 32)
                            for i in range(25)])
        rate = [int(sponge_trace[i, r]) for i in sponge.ORIGINAL_RATE]
        block = [int(sponge_trace[i, r]) for i in sponge.BLOCK_BYTES]
        for i in range(sponge.num_logic_ctls()):
            a = sum(v << (32 * j)
                    for j, v in enumerate(rate[8 * i:8 * i + 8]))
            b = sum(v << (8 * j)
                    for j, v in enumerate(block[32 * i:32 * i + 32]))
            logic_ops.append(("xor", a, b))
    return perm_inputs, logic_ops


def generate_traces(program: list, include_arithmetic: bool = True,
                    min_rows: int = 16) -> tuple:
    """Run the program and build every table's trace
    (generation/mod.rs:39 generate_traces).  Table order: cpu, memory,
    logic, [arithmetic], [keccak_sponge, keccak], program (always last;
    the keccak pair is present only when the program hashes)."""
    sim = Simulator(program)
    t = sim.run()
    cpu = sim.cpu
    n = 1 << max(max(len(t.cpu_rows), min_rows) - 1, 0).bit_length()
    cpu_trace = np.zeros((cpu.COLUMNS, n), np.uint64)
    for i, row in enumerate(t.cpu_rows):
        cpu_trace[:, i] = row

    memory = MemoryStark()
    mem_trace = memory.generate_trace(t.memory_ops)
    logic = LogicStark(val_bits=256)
    logic_ops = list(t.logic_ops)

    sponge_pair = None
    if t.sponge_ops:
        from .keccak import KeccakStark
        from .keccak_sponge import KeccakSpongeStark
        sponge = KeccakSpongeStark()
        sponge_trace = sponge.generate_trace(t.sponge_ops,
                                             min_rows=min_rows)
        perm_inputs, sponge_logic = sponge_derived_requests(sponge,
                                                            sponge_trace)
        logic_ops += sponge_logic
        keccak = KeccakStark()
        keccak_trace = keccak.generate_trace(perm_inputs,
                                             min_rows=min_rows)
        sponge_pair = (sponge, sponge_trace, keccak, keccak_trace)

    logic_trace = logic.generate_trace(logic_ops, min_rows=min_rows)
    traces = [cpu_trace, mem_trace, logic_trace]
    starks = [cpu, memory, logic]
    if include_arithmetic:
        arith = ArithmeticStark(val_bits=256, limb_bits=16)
        traces.append(arith.generate_trace(t.arithmetic_ops))
        starks.append(arith)
    if sponge_pair is not None:
        sponge, sponge_trace, keccak, keccak_trace = sponge_pair
        starks += [sponge, keccak]
        traces += [sponge_trace, keccak_trace]
    from .program import ProgramStark
    prog = ProgramStark()
    traces.append(prog.generate_trace(code_words(program),
                                      min_rows=min_rows))
    starks.append(prog)
    return starks, traces, sim


def all_cross_table_lookups(starks: list) -> list:
    """(all_stark.rs:99) the full CTL wiring for a table list produced by
    `generate_traces`: memory bus (CPU channels + sponge byte reads),
    logic bus (CPU bitwise ops + sponge rate XORs), arithmetic bus,
    sponge/keccak-f link, CPU->sponge hash requests, and the program ROM
    binding.  Table roles are identified by type."""
    from . import memory as memmod
    from .keccak import KeccakStark
    from .keccak_sponge import KeccakSpongeStark
    from .program import ProgramStark

    idx = {type(s).__name__: i for i, s in enumerate(starks)}
    cpu = starks[idx["CpuStark"]]
    logic = starks[idx["LogicStark"]]
    arith = (starks[idx["ArithmeticStark"]]
             if "ArithmeticStark" in idx else None)
    sponge = (starks[idx["KeccakSpongeStark"]]
              if "KeccakSpongeStark" in idx else None)

    mem_looking = [
        TableWithColumns(idx["CpuStark"],
                         tuple(cpu.ctl_looking_memory(ch)),
                         cpu.ctl_looking_memory_filter(ch))
        for ch in range(NUM_CHANNELS)]
    logic_looking = [
        TableWithColumns(idx["CpuStark"], tuple(cpu.ctl_looking_logic()),
                         cpu.ctl_looking_logic_filter())]
    if sponge is not None:
        si = idx["KeccakSpongeStark"]
        mem_looking += [
            TableWithColumns(si, tuple(sponge.ctl_looking_memory(i)),
                             sponge.ctl_looking_memory_filter(i))
            for i in range(136)]
        logic_looking += [
            TableWithColumns(si, tuple(sponge.ctl_looking_logic(i)),
                             sponge.ctl_looking_logic_filter())
            for i in range(sponge.num_logic_ctls())]

    ctls = [
        CrossTableLookup(
            looking_tables=tuple(mem_looking),
            looked_table=TableWithColumns(
                idx["MemoryStark"], tuple(memmod.ctl_data()),
                memmod.ctl_filter())),
        CrossTableLookup(
            looking_tables=tuple(logic_looking),
            looked_table=TableWithColumns(
                idx["LogicStark"], tuple(logic.ctl_data()),
                logic.ctl_filter())),
    ]
    if arith is not None:
        ctls.append(CrossTableLookup(
            looking_tables=(TableWithColumns(
                idx["CpuStark"], tuple(cpu.ctl_looking_arithmetic()),
                cpu.ctl_looking_arithmetic_filter()),),
            looked_table=TableWithColumns(
                idx["ArithmeticStark"], tuple(arith.ctl_data()),
                arith.ctl_filter())))
    if sponge is not None:
        keccak = starks[idx["KeccakStark"]]
        ctls.append(CrossTableLookup(
            looking_tables=(TableWithColumns(
                idx["KeccakSpongeStark"],
                tuple(sponge.ctl_looking_keccak()),
                sponge.ctl_looking_keccak_filter()),),
            looked_table=TableWithColumns(
                idx["KeccakStark"], tuple(keccak.ctl_data()),
                keccak.ctl_filter())))
        ctls.append(CrossTableLookup(
            looking_tables=(TableWithColumns(
                idx["CpuStark"], tuple(cpu.ctl_looking_keccak_sponge()),
                cpu.ctl_looking_keccak_sponge_filter()),),
            looked_table=TableWithColumns(
                idx["KeccakSpongeStark"],
                tuple(sponge.ctl_looked_data()),
                sponge.ctl_looked_filter())))
    prog = starks[idx["ProgramStark"]]
    ctls.append(CrossTableLookup(
        looking_tables=(TableWithColumns(
            idx["CpuStark"], tuple(cpu.ctl_looking_program()),
            cpu.ctl_looking_program_filter()),),
        looked_table=TableWithColumns(
            idx["ProgramStark"], tuple(prog.ctl_data()),
            prog.ctl_filter())))
    return ctls


def prove_program(program: list, config: StarkConfig = None,
                  include_arithmetic: bool = True):
    """End-to-end: simulate, build traces, joint multi-table proof
    (evm/src/prover.rs:45 prove)."""
    config = config or StarkConfig.standard_fast_config()
    starks, traces, sim = generate_traces(program, include_arithmetic)
    ctls = all_cross_table_lookups(starks)
    proof = prove_multi_table(starks, ctls, config, traces)
    return proof, starks, ctls, sim


def verify_program_proof(starks: list, ctls: list, proof,
                         config: StarkConfig = None,
                         program: list = None) -> None:
    """(evm/src/verifier.rs:29).  When the public `program` is given, the
    program ROM's trace commitment is recomputed from it and pinned
    against the proof — binding the executed code image to the public
    program (the TPU-native analogue of the reference's bootstrap code
    hash; see zkevm/program.py)."""
    config = config or StarkConfig.standard_fast_config()
    verify_multi_table(starks, ctls, proof, config)
    if program is not None:
        from ..field.goldilocks import GF
        from ..fri.oracle import PolynomialBatch
        from .program import ProgramStark
        prog = starks[-1]
        assert isinstance(prog, ProgramStark), "program table must be last"
        n = 1 << proof.stark_proofs[-1].degree_bits
        trace = prog.generate_trace(code_words(program), min_rows=n)
        assert trace.shape[-1] == n, "program trace size mismatch"
        expect = PolynomialBatch.from_values(
            GF.from_u64(trace), config.fri_config.rate_bits, False,
            config.fri_config.cap_height)
        assert expect.merkle_tree.cap == proof.stark_proofs[-1].trace_cap, \
            "program ROM commitment does not match the public program"
