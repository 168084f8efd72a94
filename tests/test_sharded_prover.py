"""Sharded proving pipeline on the virtual 8-device CPU mesh: the
distributed commitment must agree bit-for-bit with the single-chip
PolynomialBatch, and the row-sharded quotient with the host prover's
values (parallel/prover.py)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.fri.oracle import COSET_SHIFT, PolynomialBatch
from plonky2_tpu.parallel.mesh import make_mesh, shard_polys
from plonky2_tpu.parallel.prover import (sharded_commitment,
                                         sharded_stark_quotient_values)


def test_sharded_commitment_matches_single_chip():
    rng = np.random.default_rng(41)
    k, n, rate_bits, cap_height = 16, 64, 3, 4
    values = GF.from_u64(rng.integers(0, gl64.ORDER_INT, size=(k, n),
                                      dtype=np.uint64))
    mesh = make_mesh(8)
    cap, leaves = sharded_commitment(shard_polys(values, mesh), rate_bits,
                                     COSET_SHIFT, cap_height, mesh)
    single = PolynomialBatch.from_values(values, rate_bits, False,
                                         cap_height)
    assert cap == single.merkle_tree.cap
    # leaves gather back to the same bit-reversed evaluation matrix
    got = np.asarray(leaves.to_u64())
    assert np.array_equal(got, single.merkle_tree.leaves_np)


def test_sharded_commitment_small_cap():
    # mesh out-numbers the cap: top levels finish replicated
    rng = np.random.default_rng(43)
    values = GF.from_u64(rng.integers(0, gl64.ORDER_INT, size=(8, 32),
                                      dtype=np.uint64))
    mesh = make_mesh(8)
    cap, _ = sharded_commitment(shard_polys(values, mesh), 1, COSET_SHIFT,
                                1, mesh)
    single = PolynomialBatch.from_values(values, 1, False, 1)
    assert cap == single.merkle_tree.cap


def test_sharded_quotient_matches_host():
    from plonky2_tpu.stark.fibonacci import FibonacciStark
    from plonky2_tpu.stark.stark import (ConstraintConsumer,
                                         StarkEvaluationVars)
    from plonky2_tpu.plonk.gates.base import BaseBatchCtx
    from plonky2_tpu.field.goldilocks import batch_inv
    from plonky2_tpu.field import ntt

    P = gl64.ORDER_INT
    stark = FibonacciStark(num_rows=64)
    trace = stark.generate_trace(0, 1)      # (COLS, n) GF
    pis = [0, 1, stark.expected_result(0, 1)]
    degree_bits = 6
    qdb = 1
    n = 64
    coeffs = ntt.intt(trace)
    trace_lde = ntt.lde(coeffs, qdb, shift=COSET_SHIFT)
    xs = gl64.mul(gl64.two_adic_subgroup(degree_bits + qdb),
                  np.uint64(COSET_SHIFT))
    alphas = [3, 5]

    mesh = make_mesh(8)
    got = sharded_stark_quotient_values(stark, trace_lde, xs, alphas,
                                        degree_bits, qdb, mesh,
                                        public_inputs=pis)

    # host reference: same eval, unsharded
    import jax.numpy as jnp
    g = gl64.primitive_root_of_unity(degree_bits)
    last = pow(int(g), P - 2, P)
    xs_gf = GF.from_u64(xs)
    xsq = xs.copy()
    for _ in range(degree_bits):
        xsq = gl64.mul(xsq, xsq)
    zh = GF.from_u64(gl64.sub(xsq, np.uint64(1)))
    z_last = xs_gf - GF.full((), last)
    n_c = GF.full((), n)
    lag_first = zh * batch_inv((xs_gf - GF.ones(())) * n_c)
    lag_last = zh * batch_inv(z_last * n_c)
    nxt = GF(jnp.roll(trace_lde.lo, -2, axis=-1),
             jnp.roll(trace_lde.hi, -2, axis=-1))
    ctx = BaseBatchCtx()
    vars = StarkEvaluationVars(
        local_values=[trace_lde[i] for i in range(stark.COLUMNS)],
        next_values=[nxt[i] for i in range(stark.COLUMNS)],
        public_inputs=[GF.full((), int(pi)) for pi in pis])
    consumer = ConstraintConsumer(ctx, alphas, z_last, lag_first, lag_last)
    stark.eval_generic(ctx, vars, consumer)
    zh_inv = batch_inv(zh)
    expect = GF.stack([acc * zh_inv for acc in consumer.accumulators()],
                      axis=0)

    assert np.array_equal(gl64.to_canonical(np.asarray(got.to_u64())),
                          gl64.to_canonical(np.asarray(expect.to_u64())))
