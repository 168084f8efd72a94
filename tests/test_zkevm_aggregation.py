"""Staged recursive aggregation: root -> aggregation tree -> block chain
(reference evm/src/fixed_recursive_verifier.rs tests).  Heavy: builds
five recursion circuits and produces six plonk proofs; relies on the
persistent XLA compile cache."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.ctl import Column, CrossTableLookup, TableWithColumns
from plonky2_tpu.stark.multi import prove_multi_table, verify_multi_table
from plonky2_tpu.stark.stark import Stark
from plonky2_tpu.zkevm.aggregation import AllRecursiveCircuits

P = gl64.ORDER_INT
N = 32


class MulStark(Stark):
    COLUMNS = 4  # x, y, z, f
    PUBLIC_INPUTS = 0

    def eval_generic(self, ctx, vars, yield_constr):
        x, y, z, f = vars.local_values
        yield_constr.constraint(z - x * y)
        yield_constr.constraint(f * (f - ctx.one()))

    def constraint_degree(self):
        return 3


class ReqStark(Stark):
    COLUMNS = 4  # x, y, z, f
    PUBLIC_INPUTS = 0

    def eval_generic(self, ctx, vars, yield_constr):
        f = vars.local_values[3]
        yield_constr.constraint(f * (f - ctx.one()))

    def constraint_degree(self):
        return 3


def _instance():
    x = np.arange(N, dtype=np.uint64)
    y = x + np.uint64(3)
    z = gl64.mul(x, y)
    f = np.zeros(N, np.uint64)
    f[:16] = 1
    mul = np.stack([x, y, z, f])

    req = np.zeros((4, N), np.uint64)
    rng = np.random.default_rng(5)
    order = rng.permutation(16)
    req[:3, :16] = mul[:3, :16][:, order]
    req[3, :16] = 1

    cols = Column.singles([0, 1, 2])
    ctls = [CrossTableLookup(
        looking_tables=(TableWithColumns(1, tuple(cols), Column.single(3)),),
        looked_table=TableWithColumns(0, tuple(cols), Column.single(3)))]
    return [MulStark(), ReqStark()], ctls, [mul, req]


def test_aggregation_tree_and_block_chain():
    sconfig = StarkConfig(fri_config=FriConfig(
        rate_bits=1, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=8))
    cconfig = CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4))

    starks, ctls, traces = _instance()
    multi = prove_multi_table(starks, ctls, sconfig, traces)
    verify_multi_table(starks, ctls, multi, sconfig)

    built = AllRecursiveCircuits(starks, ctls, sconfig,
                                 multi.degree_bits(), cconfig)

    # checkpoint/resume (fixed_recursive_verifier.rs:95,111): the whole
    # tree below proves through the RESTORED circuits, and the blob is a
    # fixed point of serialization
    blob = built.to_bytes()
    circuits = AllRecursiveCircuits.from_bytes(blob, starks, ctls, sconfig)
    assert circuits.to_bytes() == blob

    root = circuits.prove_root(multi)
    # leaf + leaf
    agg1 = circuits.prove_aggregation(root, False, root, False)
    # aggregation + leaf (exercises the cyclic branch)
    agg2 = circuits.prove_aggregation(agg1, True, root, False)
    # first block (no parent), then a chained block
    blk0 = circuits.prove_block(None, agg2)
    blk1 = circuits.prove_block(blk0, agg2)
    assert blk1 is not None
