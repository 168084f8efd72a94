"""Sharded primitives on the 8-device virtual CPU mesh: four-step NTT with
all_to_all mesh transpose, and data-parallel LDE + leaf hashing."""

import numpy as np

from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.hash.hashing import hash_or_noop
from plonky2_tpu.parallel.mesh import (dp_lde_and_leaf_hash, four_step_ntt,
                                       make_mesh, shard_polys)

P = gl64.ORDER_INT


def test_four_step_ntt_matches_single_device(rng):
    mesh = make_mesh(8)
    n = 1 << 10
    x = rng.integers(0, P, size=n, dtype=np.uint64)
    gf = GF.from_u64(x)
    expect = ntt.ntt(gf).to_u64()
    got = four_step_ntt(gf, mesh).to_u64()
    np.testing.assert_array_equal(got, expect)


def test_dp_lde_and_leaf_hash_matches(rng):
    mesh = make_mesh(8)
    k, n, rate_bits, shift = 16, 64, 3, 7
    polys = rng.integers(0, P, size=(k, n), dtype=np.uint64)
    gf = GF.from_u64(polys)
    expect = hash_or_noop(
        ntt.lde(gf, rate_bits, shift=shift).transpose(1, 0)).to_u64()
    got = dp_lde_and_leaf_hash(shard_polys(gf, mesh), rate_bits, shift, mesh).to_u64()
    np.testing.assert_array_equal(got, expect)
