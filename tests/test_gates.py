"""Per-gate low-degree + base/ext evaluation-consistency checks (the
reference runs test_low_degree + test_eval_fns at the bottom of every gate
file, gates/gate_testing.rs)."""

import pytest

from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.gates.arithmetic import ArithmeticGate
from plonky2_tpu.plonk.gates.ext_gates import (ArithmeticExtensionGate,
                                               MulExtensionGate,
                                               PoseidonMdsGate, ReducingGate,
                                               ReducingExtensionGate)
from plonky2_tpu.plonk.gates.misc import (BaseSumGate, ExponentiationGate,
                                          RandomAccessGate)
from plonky2_tpu.plonk.gates.interpolation import CosetInterpolationGate
from plonky2_tpu.plonk.gates.lookup import LookupGate, LookupTableGate
from plonky2_tpu.plonk.gates.poseidon_gate import PoseidonGate
from plonky2_tpu.plonk.gates.simple import (ConstantGate, NoopGate,
                                            PublicInputGate)
from plonky2_tpu.plonk.gates.testing import (check_eval_consistency,
                                             check_low_degree)

CONFIG = CircuitConfig.standard_recursion_config()

ALL_GATES = [
    ArithmeticGate.new_from_config(CONFIG),
    ArithmeticExtensionGate.new_from_config(CONFIG),
    MulExtensionGate.new_from_config(CONFIG),
    BaseSumGate(11, base=2),
    BaseSumGate(4, base=4),
    ConstantGate(2),
    ExponentiationGate(7),
    NoopGate(),
    PublicInputGate(),
    PoseidonGate(),
    PoseidonMdsGate(),
    RandomAccessGate.new_from_config(CONFIG, 4),
    ReducingGate(21),
    ReducingExtensionGate(12),
    CosetInterpolationGate(4, 8),
    CosetInterpolationGate(2, 8),
    LookupGate(40, 0),
    LookupTableGate(26, 0, 0),
]


@pytest.mark.parametrize("gate", ALL_GATES, ids=lambda g: g.id()[:40])
def test_gate_low_degree(gate):
    check_low_degree(gate)


@pytest.mark.parametrize("gate", ALL_GATES, ids=lambda g: g.id()[:40])
def test_gate_eval_consistency(gate):
    check_eval_consistency(gate)
