"""Fused MXU LDE kernel: jnp twin vs the production radix LDE.

The Pallas kernel itself is exercised on TPU (tools/mxu_lde_bench.py);
CPU tests drive the numerics through the pure-jnp twin, which shares the
digit/recombination code paths with the kernel (CLAUDE.md: interpret
mode costs ~30 s per call).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.ops import mxu_lde_pallas as M
from plonky2_tpu.utils.bits import reverse_index_bits_perm


@pytest.mark.parametrize("log_n,rate,n2,k", [
    (10, 3, 128, 3),
    (12, 2, 256, 2),
    (9, 1, 128, 1),
])
def test_twin_matches_radix_lde(log_n, rate, n2, k):
    rng = np.random.default_rng(log_n * 100 + rate)
    n = 1 << log_n
    c = GF.from_u64(rng.integers(0, gl64.ORDER_INT, size=(k, n),
                                 dtype=np.uint64))
    ref = np.asarray(ntt.lde(c, rate, shift=7).to_u64())
    mem = M.mxu_lde_jnp(c, rate, shift=7, n2=n2).to_u64().reshape(
        k, n << rate)
    nat = mem[:, M.natural_perm_from_mem(log_n, rate, n2)]
    assert np.array_equal(gl64.to_canonical(nat), gl64.to_canonical(ref))


def test_leaf_perm_composes_bit_reversal():
    log_n, rate, n2 = 10, 3, 128
    big_n = 1 << (log_n + rate)
    nat = M.natural_perm_from_mem(log_n, rate, n2)
    rev = reverse_index_bits_perm(big_n)
    assert np.array_equal(M.leaf_perm_from_mem(log_n, rate, n2), nat[rev])


def test_pick_n2_bounds():
    for log_n in range(7, 23):
        for rate in (1, 2, 3):
            n2 = M.pick_n2(log_n, rate)
            assert (1 << log_n) % n2 == 0
            if log_n <= 17:
                # bf16-fallback exactness: f32 digit dots need n2 <= 512
                assert n2 <= 512
            else:
                # int8 planes: balanced split, both contractions <= 2^17
                assert n2 % 128 == 0
                assert n2 <= (1 << 17) and (1 << log_n) // n2 <= (1 << 17)


@pytest.mark.parametrize("log_n,rate,k", [
    (14, 1, 2),
    (15, 2, 1),
])
def test_lde3_twin_matches_host_lde(log_n, rate, k):
    """Three-step kernel twin (ops/mxu_lde3_pallas.py) vs the host numpy
    LDE at small shapes (n2 = n3 = 128, so n >= 2^14)."""
    from plonky2_tpu.ops import mxu_lde3_pallas as M3
    rng = np.random.default_rng(log_n * 10 + rate)
    n = 1 << log_n
    cu = rng.integers(0, gl64.ORDER_INT, size=(k, n), dtype=np.uint64)
    ref = gl64.lde_np(cu, rate, shift=7)
    mem = M3.mxu_lde3_jnp(GF.from_u64(cu), rate, shift=7) \
        .to_u64().reshape(k, n << rate)
    nat = mem[:, M3.natural_perm3_from_mem(log_n, rate, 128, 128)]
    assert np.array_equal(gl64.to_canonical(nat), gl64.to_canonical(ref))


def test_lde3_leaf_perm_composes_bit_reversal():
    from plonky2_tpu.ops import mxu_lde3_pallas as M3
    log_n, rate = 14, 1
    nat = M3.natural_perm3_from_mem(log_n, rate, 128, 128)
    rev = reverse_index_bits_perm(1 << (log_n + rate))
    assert np.array_equal(M3.leaf_perm3_from_mem(log_n, rate, 128, 128),
                          nat[rev])


def test_lde3_eligibility():
    from plonky2_tpu.ops import mxu_lde3_pallas as M3
    assert M3.use_mxu_lde3(20, 3)       # flagship: n1 = 512
    assert M3.use_mxu_lde3(18, 3)       # n1 = 128 exactly
    assert not M3.use_mxu_lde3(18, 1)   # n1 = 32 < tt1 — two-step regime


@pytest.mark.slow
def test_twin_long_contraction_int8():
    """n1z > 512 exercises the int8-only long-contraction regime that the
    round-5 pick_n2 unlocks for n > 2^17 (the 2^20 flagship LDE runs at
    n1z = 1024); verified against the host numpy LDE at the smallest
    shape with n1z = 1024 (n = 2^17, n2 = 128)."""
    if M.PLANE_DTYPE != jnp.int8:
        pytest.skip("int8 planes disabled via PLONKY2_TPU_LDE_PLANES")
    rng = np.random.default_rng(17)
    log_n, rate, n2, k = 17, 1, 128, 1
    n = 1 << log_n
    cu = rng.integers(0, gl64.ORDER_INT, size=(k, n), dtype=np.uint64)
    ref = gl64.lde_np(cu, rate, shift=7)
    mem = M.mxu_lde_jnp(GF.from_u64(cu), rate, shift=7, n2=n2) \
        .to_u64().reshape(k, n << rate)
    nat = mem[:, M.natural_perm_from_mem(log_n, rate, n2)]
    assert np.array_equal(gl64.to_canonical(nat), gl64.to_canonical(ref))
