"""Auxiliary subsystems: context-tree profiling, secp256k1 fields, timing."""

from plonky2_tpu.field.secp256k1 import (SECP256K1_BASE, SECP256K1_SCALAR,
                                         base, primitive_root_of_unity, scalar)
from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def test_context_tree_counts_gates():
    config = CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=2))
    b = CircuitBuilder(config)
    x = b.add_virtual_target()
    with b.context("hashing"):
        h = b.hash_n_to_hash_no_pad([x] * 9)  # 2 Poseidon rows
    with b.context("arithmetic"):
        y = b.mul(h[0], h[1])
    report = b.context_tracker.report(b.num_gates())
    assert "hashing" in report and "arithmetic" in report
    hash_node = b.context_tracker.root.children[0]
    assert hash_node.gate_count() == 2  # two permutation rows


def test_generate_constants_pins_baked_tables():
    """tools/generate_constants.py must reproduce the baked Poseidon round
    constants bit-exactly (reference plonky2/src/bin/generate_constants.rs:
    ChaCha8 seeded via PCG32 from 0 + Lemire rejection sampling)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import generate_constants as gc
    from plonky2_tpu.hash.poseidon_constants import ALL_ROUND_CONSTANTS
    got = gc.generate()
    assert got == [int(c) for c in ALL_ROUND_CONSTANTS]


def test_secp256k1_fields():
    for params, mk in ((SECP256K1_BASE, base), (SECP256K1_SCALAR, scalar)):
        a = mk(123456789)
        b_ = mk(987654321)
        assert (a * b_) == (b_ * a)
        assert (a * a.inv()).v == 1
        assert (a + (-a)).v == 0
        # two-adic generator has the right order
        g = primitive_root_of_unity(params, params.two_adicity)
        assert pow(g, 1 << params.two_adicity, params.order) == 1
        assert pow(g, 1 << (params.two_adicity - 1), params.order) != 1
        # Fermat exponent sanity
        assert a.pow(params.order - 1).v == 1
