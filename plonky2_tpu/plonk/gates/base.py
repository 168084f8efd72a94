"""Gate framework: field-polymorphic constraint evaluation + generator specs.

Twin of reference gates/gate.rs:28.  A gate implements `eval_unfiltered`
once, written against operator-overloaded field elements plus a small `ctx`
factory; the same code then runs in three modes:
  * prover quotient pass — elements are device GF arrays over all coset
    points at once (replaces the reference's packed-SIMD batch eval,
    gates/packed_util.rs);
  * verifier — elements are host E2 extension scalars (gate.rs:96);
  * recursive verifier (later) — elements are circuit extension targets.

Witness generation is declared as `GeneratorSpec`s: static (deps, outs)
target lists plus a vectorisable kind, so the witness engine can topologically
level the dataflow at build time and execute whole levels as batched numpy —
replacing the reference's dynamic watch-list scheduler (iop/generator.rs:54).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from ...field import gl64ext
from ...field.goldilocks import GF


class BaseBatchCtx:
    """Prover context: elements are GF arrays broadcast over coset points."""

    ext = False

    def constant(self, v: int):
        return GF.full((), v)

    def zero(self):
        return GF.full((), 0)

    def one(self):
        return GF.full((), 1)


class ExtCtx:
    """Verifier context: elements are host E2 extension scalars."""

    ext = True

    def constant(self, v: int):
        return gl64ext.E2.from_base_int(v)

    def zero(self):
        return gl64ext.E2.of(0)

    def one(self):
        return gl64ext.E2.of(1)


@dataclass
class EvalVars:
    """Per-point view for gate evaluation (reference plonk/vars.rs:12).
    `local_constants` has the selector prefix already removed."""

    local_constants: list
    local_wires: list
    public_inputs_hash: list  # 4 elements


@dataclass
class GeneratorSpec:
    """A witness generator with a static dependency signature.

    kinds: 'arithmetic' (params=(c0, c1), deps=[m0, m1, addend], outs=[out]),
    'poseidon' (deps=[12 inputs, swap], outs=gate trace wires), 'constant'
    (params=(value,)), 'random', 'copy' (deps=[src], outs=[dst]), 'custom'
    (fn: np dep values -> np out values).
    """

    kind: str
    deps: list
    outs: list
    params: tuple = ()
    fn: Callable | None = None
    # registry name for kind="custom" (plonk/generators.py) — lets the
    # schedule serializer rebuild `fn`; None means not checkpointable
    name: str | None = None


class Gate:
    """Base class; mirrors the reference Gate trait surface we need."""

    def id(self) -> str:
        raise NotImplementedError

    def num_wires(self) -> int:
        raise NotImplementedError

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        raise NotImplementedError

    def num_constraints(self) -> int:
        raise NotImplementedError

    def eval_unfiltered(self, ctx, vars: EvalVars) -> list:
        raise NotImplementedError

    def generators(self, row: int, local_constants) -> list:
        return []

    def extra_constant_wires(self) -> list:
        """(constant_index, wire_index) pairs, for ConstantGate routing."""
        return []

    # identity/ordering helpers
    def __eq__(self, other):
        return type(self) is type(other) and self.id() == other.id()

    def __hash__(self):
        return hash(self.id())
