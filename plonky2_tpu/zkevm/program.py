"""Program ROM table: binds the executed code image to the public program.

The reference binds code by keccak-hashing the bootstrapped bytes and
exposing the hash in PublicValues (cpu/bootstrap_kernel.rs:60).  The
TPU-native design instead treats the program as a *preprocessed* table,
like plonk's constants/sigmas commitment: its trace is a deterministic
function of the public code, so the verifier recomputes the table's
trace commitment itself and pins the proof's cap against it
(verify_program_proof).  A CTL ties the CPU's bootstrap rows — which
write the code image into the CODE memory segment — to this table, so
the executed image IS the public program:

    bootstrap row (pc, code word)  <-- CTL -->  program row (pc, word)

Each side occurs exactly once per code word (fetches go through the
memory table), so the strict-multiset CTL applies directly.
"""

from __future__ import annotations

import numpy as np

from ..field import gl64
from ..stark.ctl import Column
from ..stark.stark import Stark
from .cpu import WORD_LIMBS

P = gl64.ORDER_INT


class ProgramStark(Stark):
    """Columns: FILTER | PC | WORD (8 u32 limbs)."""

    PUBLIC_INPUTS = 0
    FILTER = 0
    PC = 1
    WORD = range(2, 2 + WORD_LIMBS)
    COLUMNS = 2 + WORD_LIMBS

    def generate_trace(self, code_words: list, min_rows: int = 4) -> np.ndarray:
        """Deterministic from the public code image: row i = (1, i,
        limbs(code_words[i])); zero padding."""
        n = 1 << max(max(len(code_words), min_rows) - 1, 0).bit_length()
        t = np.zeros((self.COLUMNS, n), np.uint64)
        for i, w in enumerate(code_words):
            t[self.FILTER, i] = 1
            t[self.PC, i] = i
            for j in range(WORD_LIMBS):
                t[self.WORD.start + j, i] = (w >> (32 * j)) & 0xFFFFFFFF
        return t

    def eval_generic(self, ctx, vars, yield_constr) -> None:
        # shape constraints only — the verifier pins the whole trace by
        # recomputing its commitment (the CTL needs the filter binary)
        f = vars.local_values[self.FILTER]
        one = ctx.one()
        yield_constr.constraint(f * (f - one))
        # code rows form a prefix with pc = row index
        nf = vars.next_values[self.FILTER]
        yield_constr.constraint_transition(nf * (one - f))
        yield_constr.constraint_first_row(vars.local_values[self.PC])
        yield_constr.constraint_transition(
            nf * (vars.next_values[self.PC] - vars.local_values[self.PC]
                  - one))

    def constraint_degree(self) -> int:
        return 3

    def ctl_data(self) -> list:
        return Column.singles([self.PC] + list(self.WORD))

    def ctl_filter(self) -> Column:
        return Column.single(self.FILTER)
