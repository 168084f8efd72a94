"""zkEVM application layer (twin of reference evm/ crate).

STARK tables proved jointly via cross-table lookups (stark/ctl.py +
stark/multi.py):

- `CpuStark` — reduced-ISA stack machine with memory channels and ALU
  buses (cpu.py; reference evm/src/cpu/)
- `MemoryStark` — access-log consistency (memory.py)
- `ArithmeticStark` — 256-bit add/mul/sub/div/mod/modular/byte over
  16-bit limbs (arithmetic.py)
- `LogicStark` — bitwise AND/OR/XOR (logic.py)
- `KeccakStark` — keccak-f[1600] rounds (keccak.py)
- `KeccakSpongeStark` — keccak-256 absorption (keccak_sponge.py)

`generation.py` simulates programs and assembles the joint proof
(reference evm/src/generation/ + all_stark.rs + prover.rs).
"""

from .arithmetic import ArithmeticStark, Operation
from .cpu import CpuStark, Instr
from .generation import (Simulator, Traces, all_cross_table_lookups,
                         code_words, generate_traces, prove_program,
                         verify_program_proof)
from .program import ProgramStark
from .keccak import KeccakStark
from .keccak_sponge import KeccakSpongeOp, KeccakSpongeStark
from .logic import LogicStark
from .lookup import eval_lookups, permuted_cols
from .memory import MemoryOp, MemoryStark
