"""Mini-EVM CPU pipeline: simulation, AIR satisfaction, cross-table
consistency, and the joint multi-table proof (reference evm/src/cpu/ +
generation/ + all_stark.rs integration tests)."""

import numpy as np
import pytest

from plonky2_tpu.stark.ctl import check_ctls
from plonky2_tpu.stark.testing import check_constraints_on_trace
from plonky2_tpu.stark.testing import test_stark_low_degree as low_degree_check
from plonky2_tpu.zkevm.cpu import CpuStark, Instr
from plonky2_tpu.zkevm.generation import (Simulator, Traces,
                                          all_cross_table_lookups,
                                          generate_traces)

# and/xor/jumpz (both directions) without arithmetic-table ops
LOGIC_PROGRAM = [
    Instr("push", 5), Instr("push", 3), Instr("and"),   # 5 & 3 = 1
    Instr("jumpz", 99),                                 # not taken
    Instr("push", 2), Instr("push", 2), Instr("xor"),   # 0
    Instr("jumpz", 9),                                  # taken
    Instr("halt"),                                      # skipped
    Instr("push", 7), Instr("halt"),
]

# countdown loop through MAIN memory, with sub (arithmetic table)
LOOP_PROGRAM = [
    Instr("push", 3), Instr("push", 0), Instr("mstore"),   # MAIN[0] = 3
    # loop (pc=3):
    Instr("push", 0), Instr("mload"),
    Instr("push", 1), Instr("sub"),                        # c - 1
    Instr("push", 0), Instr("mstore"),                     # MAIN[0] = c-1
    Instr("push", 0), Instr("mload"),
    Instr("jumpz", 14),                                    # exit when 0
    Instr("push", 0), Instr("jumpz", 3),                   # loop back
    Instr("push", 42), Instr("halt"),                      # pc=14
]


def test_simulator_logic_program():
    sim = Simulator(LOGIC_PROGRAM)
    sim.run()
    assert sim.final_stack == [7]


def test_simulator_loop_program():
    sim = Simulator(LOOP_PROGRAM)
    sim.run()
    assert sim.final_stack == [42]
    assert sim.final_memory[(3, 0)] == 0  # SEG_MAIN counter ran to 0


def test_traces_checkpoint_rollback():
    t = Traces()
    t.memory_ops.append("a")
    cp = t.checkpoint()
    t.memory_ops.append("b")
    t.logic_ops.append("c")
    t.rollback(cp)
    assert t.memory_ops == ["a"] and t.logic_ops == []


def test_cpu_low_degree():
    low_degree_check(CpuStark())


def test_cpu_trace_air():
    starks, traces, _ = generate_traces(LOGIC_PROGRAM,
                                        include_arithmetic=False)
    for stark, trace in zip(starks, traces):
        check_constraints_on_trace(stark, trace)


def test_mini_evm_ctl_consistency():
    """All tables (incl. the program ROM) tie together over the CTLs for
    a looping program with arithmetic, logic and memory traffic."""
    starks, traces, _ = generate_traces(LOOP_PROGRAM,
                                        include_arithmetic=True)
    ctls = all_cross_table_lookups(starks)
    check_ctls(traces, ctls)
    # every AIR is satisfied (arithmetic checked on a truncated slice of
    # its 2^16-row range table would be meaningless; check in full)
    for stark, trace in zip(starks, traces):
        check_constraints_on_trace(stark, trace)


def test_cpu_bad_jump_rejected():
    starks, traces, _ = generate_traces(LOGIC_PROGRAM,
                                        include_arithmetic=False)
    cpu = starks[0]
    trace = traces[0]
    # flip a jump_taken flag on the jumpz row
    rows = np.nonzero(trace[cpu.OP["jumpz"]])[0]
    trace[cpu.JUMP_TAKEN, rows[0]] ^= 1
    with pytest.raises(AssertionError):
        check_constraints_on_trace(cpu, trace)


def test_keccak_opcode_pipeline():
    """KECCAK/MSTORE8 ops: the CPU requests a hash from the sponge table,
    which delegates to the keccak-f, logic and memory tables — the whole
    six-table CTL web must be consistent and every AIR satisfied."""
    from plonky2_tpu.hash.keccak import keccak256

    prog = []
    data = b"abc"
    for i, b in enumerate(data):
        prog += [Instr("push", b), Instr("push", 10 + i), Instr("mstore8")]
    prog += [Instr("push", len(data)), Instr("push", 10),
             Instr("keccak"), Instr("halt")]

    sim = Simulator(prog)
    sim.run()
    assert sim.final_stack == [int.from_bytes(keccak256(data), "little")]

    starks, traces, _ = generate_traces(prog, include_arithmetic=False)
    assert len(starks) == 6  # cpu, memory, logic, sponge, keccak, program
    ctls = all_cross_table_lookups(starks)
    check_ctls(traces, ctls)
    for stark, trace in zip(starks, traces):
        check_constraints_on_trace(stark, trace)


def test_mini_evm_prove_verify():
    """Joint CPU+memory+logic+program proof with one shared transcript
    (evm/src/prover.rs:45 / verifier.rs:29 shape), with the program ROM
    commitment pinned to the public program."""
    from plonky2_tpu.zkevm.generation import (prove_program,
                                              verify_program_proof)
    proof, starks, ctls, sim = prove_program(LOGIC_PROGRAM,
                                             include_arithmetic=False)
    assert sim.final_stack == [7]
    verify_program_proof(starks, ctls, proof, program=LOGIC_PROGRAM)
    # a different public program must be rejected
    other = list(LOGIC_PROGRAM)
    other[0] = Instr("push", 6)
    with pytest.raises(AssertionError):
        verify_program_proof(starks, ctls, proof, program=other)


def test_keccak_pipeline_prove_verify():
    """Six-table proof: CPU hashing memory bytes through the sponge,
    keccak-f, logic and memory tables plus the program ROM."""
    from plonky2_tpu.zkevm.generation import (prove_program,
                                              verify_program_proof)
    prog = [Instr("push", 0x61), Instr("push", 10), Instr("mstore8"),
            Instr("push", 0x62), Instr("push", 11), Instr("mstore8"),
            Instr("push", 2), Instr("push", 10), Instr("keccak"),
            Instr("halt")]
    proof, starks, ctls, sim = prove_program(prog,
                                             include_arithmetic=False)
    from plonky2_tpu.hash.keccak import keccak256
    assert sim.final_stack == [int.from_bytes(keccak256(b"ab"), "little")]
    verify_program_proof(starks, ctls, proof, program=prog)
