"""MXU digit-matmul NTT: the jnp twin of the fused Pallas kernel must
match the production NTT (ops/mxu_ntt_pallas.py; the kernel itself is
validated on real TPU hardware — see tools/README.md)."""

import numpy as np

from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.ops.mxu_ntt_pallas import (balanced_digits,
                                            dft_matrix_digits, mxu_dft_jnp,
                                            mxu_ntt, recombine_buckets)

P = gl64.ORDER_INT


def test_balanced_digits_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.integers(0, P, size=64, dtype=np.uint64)
    d = np.asarray(balanced_digits(GF.from_u64(v))).astype(np.float64)
    rec = np.zeros(64, dtype=object)
    for k in range(8):
        rec += d[k].astype(np.int64).astype(object) << (8 * k)
    assert all(int(r) % P == int(x) for r, x in
               zip(rec, gl64.to_canonical(v)))


def test_mxu_dft_matches_direct():
    rng = np.random.default_rng(1)
    n1 = 16
    import jax.numpy as jnp
    wd = jnp.asarray(dft_matrix_digits(n1))
    x = GF.from_u64(rng.integers(0, P, size=(n1, 8), dtype=np.uint64))
    got = gl64.to_canonical(np.asarray(mxu_dft_jnp(wd, x).to_u64()))
    g = gl64.primitive_root_of_unity(4)
    idx = np.arange(n1, dtype=np.uint64)
    pw = gl64.powers(int(g), n1)
    w = pw[((idx[:, None] * idx[None, :]) % np.uint64(n1)).astype(np.int64)]
    xs = np.asarray(x.to_u64())
    expect = np.zeros((n1, 8), dtype=np.uint64)
    for i in range(n1):
        acc = np.zeros(8, dtype=object)
        for j in range(n1):
            acc += int(w[i, j]) * xs[j].astype(object)
        expect[i] = [int(a) % P for a in acc]
    assert np.array_equal(got, gl64.to_canonical(expect))


def test_mxu_ntt_four_step():
    rng = np.random.default_rng(2)
    for log1, log2, batch in [(3, 3, 2), (4, 4, 3), (4, 5, 2)]:
        n = 1 << (log1 + log2)
        x = GF.from_u64(rng.integers(0, P, size=(batch, n), dtype=np.uint64))
        got = gl64.to_canonical(
            np.asarray(mxu_ntt(x, log1, log2, use_pallas=False).to_u64()))
        expect = gl64.to_canonical(np.asarray(ntt.ntt(x).to_u64()))
        assert np.array_equal(got, expect), (log1, log2, batch)
