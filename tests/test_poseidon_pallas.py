"""Pallas Poseidon kernel round pipeline vs the host numpy oracle.

The exact kernel body (`_rounds`) runs here as plain XLA on the CPU backend
(`permute_cols_jnp`); the `pl.pallas_call` wiring of the same body is
exercised on real TPU hardware by bench.py (interpret mode is prohibitively
slow for a 30-round unrolled kernel).
"""

import numpy as np

from plonky2_tpu.field import gl64
from plonky2_tpu.hash.poseidon import permute_np
from plonky2_tpu.ops.poseidon_pallas import permute_cols_jnp


def _run(states: np.ndarray, mds_mode: str = "roll") -> np.ndarray:
    cols = states.T
    lo = (cols & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (cols >> np.uint64(32)).astype(np.uint32)
    out_lo, out_hi = permute_cols_jnp(lo, hi, mds_mode)
    got = (np.asarray(out_hi, dtype=np.uint64) << np.uint64(32)) | \
        np.asarray(out_lo, dtype=np.uint64)
    return gl64.to_canonical(got).T


def test_pallas_round_pipeline_matches_host(rng):
    states = rng.integers(0, (1 << 64) - 1, size=(256, 12), dtype=np.uint64)
    assert np.array_equal(_run(states), gl64.to_canonical(permute_np(states)))


def test_pallas_mxu_mds_pipeline_matches_host(rng):
    states = rng.integers(0, (1 << 64) - 1, size=(256, 12), dtype=np.uint64)
    assert np.array_equal(_run(states, "mxu"),
                          gl64.to_canonical(permute_np(states)))


def test_pallas_round_pipeline_zero_vector():
    states = np.zeros((128, 12), dtype=np.uint64)
    assert np.array_equal(_run(states), gl64.to_canonical(permute_np(states)))
