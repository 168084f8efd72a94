"""Fused MXU LDE kernel: jnp twin vs the production radix LDE.

The Pallas kernel itself is exercised on TPU (tools/mxu_lde_bench.py);
CPU tests drive the numerics through the pure-jnp twin, which shares the
digit/recombination code paths with the kernel (CLAUDE.md: interpret
mode costs ~30 s per call).
"""

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
    # exactness bound: f32 digit dots need n2 <= 512
    for log_n in range(7, 21):
        for rate in (1, 2, 3):
            n2 = M.pick_n2(log_n, rate)
            assert n2 <= 512
            assert (1 << log_n) % n2 == 0
