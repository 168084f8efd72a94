"""End-to-end lookup (logUp) tests — twin of reference
plonky2/src/lookup_test.rs:18-107 basics (one LUT / two LUTs, prove+verify)."""

import numpy as np
import pytest

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.witness import PartialWitness

TIP5_IN = list(range(8))
TIP5_OUT = [y & 0xFFFF for y in (0xDEAD, 0xBEEF, 17, 255, 0, 3, 7, 8)]


def fast_config(num_query_rounds=4):
    return CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=num_query_rounds))


def test_one_lookup():
    config = fast_config()
    b = CircuitBuilder(config)
    lut = b.add_lookup_table_from_table(TIP5_IN, TIP5_OUT)
    inp = b.add_virtual_target()
    out = b.add_lookup_from_index(inp, lut)
    inp2 = b.add_virtual_target()
    out2 = b.add_lookup_from_index(inp2, lut)
    b.register_public_inputs([inp, out, inp2, out2])
    data = b.build()

    pw = PartialWitness()
    pw.set_target(inp, 3)
    pw.set_target(inp2, 5)
    proof = data.prove(pw)
    assert list(map(int, proof.public_inputs)) == \
        [3, TIP5_OUT[3], 5, TIP5_OUT[5]]
    data.verify(proof)


def test_two_luts_and_fn_table():
    config = fast_config()
    b = CircuitBuilder(config)
    lut_a = b.add_lookup_table_from_table(TIP5_IN, TIP5_OUT)
    lut_b = b.add_lookup_table_from_fn(lambda x: (x * x + 1) & 0xFFFF,
                                       list(range(16)))
    x = b.add_virtual_target()
    y = b.add_lookup_from_index(x, lut_a)   # y = TIP5_OUT[x]
    s = b.add_lookup_from_index(b.constant(7), lut_b)  # s = 50
    total = b.add(y, s)
    b.register_public_inputs([x, y, s, total])
    data = b.build()

    pw = PartialWitness()
    pw.set_target(x, 6)
    proof = data.prove(pw)
    assert list(map(int, proof.public_inputs)) == [6, 7, 50, 57]
    data.verify(proof)


def test_lookup_rejects_wrong_claim():
    """A circuit pinning a lookup output to a non-LUT value must not verify:
    whichever of the two conflicting witness values wins, either the lookup
    argument or the constant copy-constraint is violated."""
    config = fast_config()
    b = CircuitBuilder(config)
    lut = b.add_lookup_table_from_table(TIP5_IN, TIP5_OUT)
    inp = b.add_virtual_target()
    out = b.add_lookup_from_index(inp, lut)
    b.connect(out, b.constant(12345))  # contradicts LUT[3] = 255
    b.register_public_inputs([inp, out])
    data = b.build()

    pw = PartialWitness()
    pw.set_target(inp, 3)
    with pytest.raises(AssertionError):
        proof = data.prove(pw)
        data.verify(proof)
