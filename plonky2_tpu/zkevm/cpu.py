"""CPU STARK: a von-Neumann stack machine driving the zkEVM table set
(reduced-ISA twin of reference evm/src/cpu/cpu_stark.rs).

Architecture mirrors the reference: rows are either *bootstrap* rows,
which write the program into the CODE memory segment
(cpu/bootstrap_kernel.rs), or *cycle* rows, each executing one decoded
instruction.  All data movement goes through five memory channels
(cpu/columns/mod.rs:24 MemoryChannelView) CTL'd to the memory table;
ALU results are delegated over CTLs to the arithmetic and logic tables
(cpu/membus.rs, all_stark.rs:99).  Words are 256-bit = 8 x u32 limbs,
matching the memory bus.

ISA (each op = one row; stack top at STACK[sp-1], sp = stack_len):

  PUSH imm        push immediate           sp+1
  ADD/MUL/SUB/
  DIV/MOD/LT/GT   pop b, pop a, push op(a, b)   sp-1   (arithmetic CTL)
  AND/OR/XOR      pop b, pop a, push op(a, b)   sp-1   (logic CTL)
  MLOAD           pop addr, push MAIN[addr]     sp
  MSTORE          pop addr, pop val, MAIN[addr]=val   sp-2
  MSTORE8         pop addr, pop byte, BYTES[addr]=byte   sp-2
                  (byte-ness enforced by in-row bit decomposition)
  KECCAK          pop addr, pop len, push keccak256(BYTES[addr..+len])
                  sp-1  (CTL to the KeccakSponge table, which reads the
                  bytes from the memory table itself)
  JUMPZ imm       pop cond; pc = imm if cond == 0 else pc+1   sp-1
  HALT            last cycle row

Channels: 0 = fetch opcode word (CODE[2*pc]), 1 = fetch immediate word
(CODE[2*pc+1]), 2..4 = general purpose.  On bootstrap rows channel 0
writes code word pc instead.  Every used channel row appears exactly
once in the memory table at timestamp clock*(NUM_CHANNELS+1) + ch + 1
— slot 0 of each clock is reserved for the KECCAK sponge's byte reads,
so no two memory rows of different producers can share a timestamp (a
shared (addr, ts) pair would let the prover order a sponge read before
the same-cycle-neighbourhood MSTORE8 write and hash stale bytes).  Code
fetches in loops are distinct memory reads — the strict-multiset CTL
stays sound (memory_stark.rs ordering).

Program binding: bootstrap rows are CTL'd to the program ROM table
(program.py), whose trace commitment the verifier recomputes from the
public code — the TPU-native analogue of the reference's bootstrap
code-hash chain (bootstrap_kernel.rs:60).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import gl64
from ..stark.ctl import Column
from ..stark.stark import Stark

P = gl64.ORDER_INT

WORD_LIMBS = 8
NUM_CHANNELS = 5
SEG_CODE = 1
SEG_STACK = 2
SEG_MAIN = 3
SEG_BYTES = 4   # byte-granular data region (keccak preimages)
# per-clock timestamp slots: sponge reads at slot 0, channels at 1..5
TS_STRIDE = NUM_CHANNELS + 1
KECCAK_TS_CH = 0

# opcode numbering (decode constraint: sum(flag_i * i) == opcode)
OPS = ("push", "add", "mul", "sub", "div", "mod", "lt", "gt",
       "and", "or", "xor", "mload", "mstore", "jumpz", "halt",
       "mstore8", "keccak")
ARITH_OPS = ("add", "mul", "sub", "div", "mod", "lt", "gt")
LOGIC_OPS = ("and", "or", "xor")
BINOPS = ARITH_OPS + LOGIC_OPS

# zkEVM arithmetic-table flag order (arithmetic.py ALL_OPS)
from .arithmetic import ALL_OPS as ARITH_TABLE_OPS


@dataclass(frozen=True)
class Instr:
    op: str
    imm: int = 0


class CpuStark(Stark):
    PUBLIC_INPUTS = 0

    def __init__(self):
        c = iter(range(10**6))
        self.IS_BOOTSTRAP = next(c)
        self.IS_CYCLE = next(c)
        self.CLOCK = next(c)
        self.PC = next(c)
        self.SP = next(c)
        self.OP = {op: next(c) for op in OPS}
        last_flag = max(self.OP.values())
        self.IMM = range(last_flag + 1, last_flag + 1 + WORD_LIMBS)
        # JUMPZ: taken flag + condition-sum inverse witness
        self.JUMP_TAKEN = self.IMM.stop
        self.COND_SUM_INV = self.JUMP_TAKEN + 1
        # MSTORE8: bit decomposition of the stored byte
        self.BYTE_BITS = range(self.COND_SUM_INV + 1,
                               self.COND_SUM_INV + 9)
        ch = self.BYTE_BITS.stop
        self.CH_USED, self.CH_IS_READ, self.CH_SEGMENT, self.CH_VIRT, \
            self.CH_VALUE = [], [], [], [], []
        for _ in range(NUM_CHANNELS):
            self.CH_USED.append(ch)
            self.CH_IS_READ.append(ch + 1)
            self.CH_SEGMENT.append(ch + 2)
            self.CH_VIRT.append(ch + 3)
            self.CH_VALUE.append(range(ch + 4, ch + 4 + WORD_LIMBS))
            ch += 4 + WORD_LIMBS
        self.COLUMNS = ch

    # ------------------------------------------------------------------
    # CTL exports

    def ctl_looking_memory(self, ch: int) -> list:
        """Memory-bus row for channel ch: (is_read, ctx, seg, virt,
        value8, timestamp = clock*TS_STRIDE + ch + 1)."""
        ts = Column.linear([(self.CLOCK, TS_STRIDE)],
                           constant=ch + 1)
        return [Column.single(self.CH_IS_READ[ch]),
                Column.constant_col(0),  # context
                Column.single(self.CH_SEGMENT[ch]),
                Column.single(self.CH_VIRT[ch])] + \
            Column.singles(self.CH_VALUE[ch]) + [ts]

    def ctl_looking_memory_filter(self, ch: int) -> Column:
        return Column.single(self.CH_USED[ch])

    def _is_flag(self, table_op: str) -> Column:
        """Arithmetic-table flag value implied by this row's op flags."""
        if table_op in self.OP:
            return Column.single(self.OP[table_op])
        return Column.zero()

    def ctl_looking_arithmetic(self) -> list:
        """(arithmetic_stark.rs:52 ctl_arithmetic_rows) — flag per
        arithmetic-table op, then in0, in1, in2, out as 8 packed u32s."""
        res = [self._is_flag(op) for op in ARITH_TABLE_OPS]
        # in0 = a (channel 3 value), in1 = b (channel 2), in2 = 0,
        # out = result (channel 4)
        res += Column.singles(self.CH_VALUE[3])
        res += Column.singles(self.CH_VALUE[2])
        res += [Column.zero()] * WORD_LIMBS
        res += Column.singles(self.CH_VALUE[4])
        return res

    def ctl_looking_arithmetic_filter(self) -> Column:
        return Column.sum_cols(self.OP[op] for op in ARITH_OPS)

    def ctl_looking_logic(self) -> list:
        """(logic.py ctl_data order: and/or/xor flags, in0, in1, result)"""
        res = [Column.single(self.OP[op]) for op in LOGIC_OPS]
        res += Column.singles(self.CH_VALUE[3])
        res += Column.singles(self.CH_VALUE[2])
        res += Column.singles(self.CH_VALUE[4])
        return res

    def ctl_looking_logic_filter(self) -> Column:
        return Column.sum_cols(self.OP[op] for op in LOGIC_OPS)

    def ctl_looking_program(self) -> list:
        """Bootstrap rows against the program ROM: (pc, code word)."""
        return Column.singles([self.PC] + list(self.CH_VALUE[0]))

    def ctl_looking_program_filter(self) -> Column:
        return Column.single(self.IS_BOOTSTRAP)

    def ctl_looking_keccak_sponge(self) -> list:
        """KECCAK op against the sponge table's looked row:
        (ctx, segment, virt, len, timestamp, hash as 8 u32s)."""
        return [Column.constant_col(0), Column.constant_col(SEG_BYTES),
                Column.single(self.CH_VALUE[2][0]),   # addr
                Column.single(self.CH_VALUE[3][0]),   # len
                Column.linear([(self.CLOCK, TS_STRIDE)],
                              constant=KECCAK_TS_CH)] + \
            Column.singles(self.CH_VALUE[4])

    def ctl_looking_keccak_sponge_filter(self) -> Column:
        return Column.single(self.OP["keccak"])

    # ------------------------------------------------------------------
    # constraints

    def eval_generic(self, ctx, vars, yield_constr) -> None:
        lv, nv = vars.local_values, vars.next_values
        one = ctx.one()

        boot, cyc = lv[self.IS_BOOTSTRAP], lv[self.IS_CYCLE]
        nboot, ncyc = nv[self.IS_BOOTSTRAP], nv[self.IS_CYCLE]
        yield_constr.constraint(boot * (boot - one))
        yield_constr.constraint(cyc * (cyc - one))
        yield_constr.constraint(boot * cyc)
        flags = [lv[self.OP[op]] for op in OPS]
        for f in flags:
            yield_constr.constraint(f * (f - one))
        flag_sum = flags[0]
        for f in flags[1:]:
            flag_sum = flag_sum + f
        yield_constr.constraint(flag_sum - cyc)  # one-hot on cycle rows

        # row-type ordering: bootstrap* cycle* padding*
        live = boot + cyc
        nlive = nboot + ncyc
        # padding rows use no channels
        for chn in range(NUM_CHANNELS):
            used = lv[self.CH_USED[chn]]
            yield_constr.constraint(used * (used - one))
            yield_constr.constraint((one - live) * used)
        yield_constr.constraint_transition(nboot * (one - boot))
        yield_constr.constraint_transition((one - live) * nlive)
        # execution, once started, only stops after a HALT row
        halt = lv[self.OP["halt"]]
        yield_constr.constraint_transition(cyc * (one - ncyc) * (cyc - halt))
        yield_constr.constraint_transition(halt * ncyc)

        # clock: starts at 0, increments while live
        yield_constr.constraint_first_row(lv[self.CLOCK])
        yield_constr.constraint_transition(
            nlive * (nv[self.CLOCK] - lv[self.CLOCK] - one))

        # --- bootstrap rows: write code words at CODE[pc], pc counts up
        yield_constr.constraint_first_row(lv[self.PC])
        yield_constr.constraint_transition(
            boot * nboot * (nv[self.PC] - lv[self.PC] - one))
        yield_constr.constraint_transition(boot * ncyc * nv[self.PC])
        yield_constr.constraint_transition(boot * ncyc * nv[self.SP])
        self._channel(ctx, yield_constr, lv, 0, boot,
                      is_read=ctx.zero(), segment=SEG_CODE,
                      virt=lv[self.PC])
        for chn in range(1, NUM_CHANNELS):
            yield_constr.constraint(boot * lv[self.CH_USED[chn]])

        # --- cycle rows ------------------------------------------------
        two_pc = lv[self.PC] + lv[self.PC]
        # fetch: ch0 = CODE[2pc] (opcode), ch1 = CODE[2pc+1] (immediate)
        self._channel(ctx, yield_constr, lv, 0, cyc, is_read=one,
                      segment=SEG_CODE, virt=two_pc)
        self._channel(ctx, yield_constr, lv, 1, cyc, is_read=one,
                      segment=SEG_CODE, virt=two_pc + one)
        # decode: opcode word limb0 = sum(flag_i * i), higher limbs 0;
        # immediate word = IMM columns
        opcode = ctx.zero()
        for i, op in enumerate(OPS):
            opcode = opcode + lv[self.OP[op]] * ctx.constant(i)
        yield_constr.constraint(cyc * (lv[self.CH_VALUE[0][0]] - opcode))
        for j in range(1, WORD_LIMBS):
            yield_constr.constraint(cyc * lv[self.CH_VALUE[0][j]])
        for j in range(WORD_LIMBS):
            yield_constr.constraint(
                cyc * (lv[self.CH_VALUE[1][j]] - lv[self.IMM.start + j]))

        sp = lv[self.SP]
        imm0 = lv[self.IMM.start]

        is_push = lv[self.OP["push"]]
        is_binop = ctx.zero()
        for op in BINOPS:
            is_binop = is_binop + lv[self.OP[op]]
        is_mload = lv[self.OP["mload"]]
        is_mstore = lv[self.OP["mstore"]]
        is_mstore8 = lv[self.OP["mstore8"]]
        is_keccak = lv[self.OP["keccak"]]
        is_jumpz = lv[self.OP["jumpz"]]

        # --- channel shapes per op class
        # ch2: first pop (binop: b @ sp-1; mload/mstore/mstore8: addr;
        #      keccak: addr; jumpz: cond)
        pop1 = (is_binop + is_mload + is_mstore + is_mstore8 + is_keccak
                + is_jumpz)
        self._channel(ctx, yield_constr, lv, 2, pop1, is_read=one,
                      segment=SEG_STACK, virt=sp - one)
        # ch3: second pop (binop: a; mstore/mstore8: value; keccak: len)
        #      or MAIN read for mload (virt = addr limb0)
        pop2 = is_binop + is_mstore + is_mstore8 + is_keccak
        self._channel(ctx, yield_constr, lv, 3, pop2, is_read=one,
                      segment=SEG_STACK, virt=sp - one - one)
        self._channel(ctx, yield_constr, lv, 3, is_mload, is_read=one,
                      segment=SEG_MAIN, virt=lv[self.CH_VALUE[2][0]])
        # ch4: result push (binop/keccak @ sp-2), mload push (@ sp-1),
        #      mstore/mstore8 writes, push imm (@ sp)
        self._channel(ctx, yield_constr, lv, 4, is_binop + is_keccak,
                      is_read=ctx.zero(), segment=SEG_STACK,
                      virt=sp - one - one)
        self._channel(ctx, yield_constr, lv, 4, is_mload,
                      is_read=ctx.zero(), segment=SEG_STACK,
                      virt=sp - one)
        self._channel(ctx, yield_constr, lv, 4, is_mstore,
                      is_read=ctx.zero(), segment=SEG_MAIN,
                      virt=lv[self.CH_VALUE[2][0]])
        self._channel(ctx, yield_constr, lv, 4, is_mstore8,
                      is_read=ctx.zero(), segment=SEG_BYTES,
                      virt=lv[self.CH_VALUE[2][0]])
        self._channel(ctx, yield_constr, lv, 4, is_push,
                      is_read=ctx.zero(), segment=SEG_STACK, virt=sp)
        # pushed value is the immediate
        for j in range(WORD_LIMBS):
            yield_constr.constraint(
                is_push * (lv[self.CH_VALUE[4][j]]
                           - lv[self.IMM.start + j]))
        # mload pushes what was read; stores write what was popped
        for j in range(WORD_LIMBS):
            yield_constr.constraint(
                is_mload * (lv[self.CH_VALUE[4][j]]
                            - lv[self.CH_VALUE[3][j]]))
            yield_constr.constraint(
                (is_mstore + is_mstore8) * (lv[self.CH_VALUE[4][j]]
                                            - lv[self.CH_VALUE[3][j]]))
        # addresses / lengths are single-limb
        for j in range(1, WORD_LIMBS):
            yield_constr.constraint(
                (is_mload + is_mstore + is_mstore8 + is_keccak)
                * lv[self.CH_VALUE[2][j]])
            yield_constr.constraint(
                (is_mstore8 + is_keccak) * lv[self.CH_VALUE[3][j]])
        # mstore8: the stored value is one byte (bit decomposition)
        byte_sum = ctx.zero()
        for i, col in enumerate(self.BYTE_BITS):
            bit = lv[col]
            yield_constr.constraint(is_mstore8 * bit * (bit - one))
            byte_sum = byte_sum + bit * ctx.constant(1 << i)
        yield_constr.constraint(
            is_mstore8 * (lv[self.CH_VALUE[3][0]] - byte_sum))
        # channel used flags: exactly the ops above
        used2, used3, used4 = pop1, pop2 + is_mload, \
            (is_binop + is_keccak + is_mload + is_mstore + is_mstore8
             + is_push)
        yield_constr.constraint(cyc * (lv[self.CH_USED[2]] - used2))
        yield_constr.constraint(cyc * (lv[self.CH_USED[3]] - used3))
        yield_constr.constraint(cyc * (lv[self.CH_USED[4]] - used4))

        # --- stack-pointer transition
        delta = (is_push - is_binop - is_keccak - is_jumpz
                 - (is_mstore + is_mstore) - (is_mstore8 + is_mstore8))
        yield_constr.constraint_transition(
            ncyc * cyc * (nv[self.SP] - sp - delta))

        # --- pc transition: +1, or JUMPZ to imm0 when cond == 0.
        # `taken` is a committed flag; the inverse witness forces
        # taken <=> cond_sum == 0 (sum of u32 limbs never wraps p)
        cond_limbs = [lv[self.CH_VALUE[2][j]] for j in range(WORD_LIMBS)]
        cond_sum = cond_limbs[0]
        for c in cond_limbs[1:]:
            cond_sum = cond_sum + c
        taken = lv[self.JUMP_TAKEN]
        cond_inv = lv[self.COND_SUM_INV]
        yield_constr.constraint(is_jumpz * taken * (taken - one))
        yield_constr.constraint(is_jumpz * taken * cond_sum)
        yield_constr.constraint(
            is_jumpz * (cond_sum * cond_inv - (one - taken)))
        # a JUMPZ row is never the last cycle (halt is), so ncyc = 1 here
        yield_constr.constraint_transition(
            is_jumpz * (nv[self.PC] - taken * imm0
                        - (one - taken) * (lv[self.PC] + one)))
        not_jump = cyc - is_jumpz
        yield_constr.constraint_transition(
            ncyc * not_jump * (nv[self.PC] - lv[self.PC] - one))

    def _channel(self, ctx, yield_constr, lv, ch: int, filt,
                 is_read, segment: int, virt) -> None:
        """Bind channel ch's metadata when filt is set."""
        yield_constr.constraint(filt * (lv[self.CH_IS_READ[ch]] - is_read))
        yield_constr.constraint(
            filt * (lv[self.CH_SEGMENT[ch]] - ctx.constant(segment)))
        yield_constr.constraint(filt * (lv[self.CH_VIRT[ch]] - virt))
        if ch < 2:
            yield_constr.constraint(filt * (lv[self.CH_USED[ch]] - filt))

    def constraint_degree(self) -> int:
        return 3
