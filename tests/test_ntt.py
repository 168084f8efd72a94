"""NTT tests against a naive O(n^2) DFT oracle (host, exact ints)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.extension import GF2
from plonky2_tpu.field.goldilocks import GF

P = gl64.ORDER_INT


def naive_dft(coeffs: np.ndarray, shift: int = 1, big_n: int = None) -> np.ndarray:
    """values[i] = sum_j c_j (shift * g^i)^j, exact python ints."""
    n = big_n or len(coeffs)
    g = gl64.primitive_root_of_unity((n - 1).bit_length())
    assert pow(g, n, P) == 1
    out = np.empty(n, dtype=np.uint64)
    cs = [int(c) for c in coeffs]
    for i in range(n):
        x = (shift * pow(g, i, P)) % P
        acc = 0
        xp = 1
        for c in cs:
            acc = (acc + c * xp) % P
            xp = (xp * x) % P
        out[i] = acc
    return out


@pytest.mark.parametrize("n", [1, 2, 8, 64])
def test_ntt_vs_naive(rng, n):
    c = rng.integers(0, P, size=n, dtype=np.uint64)
    got = ntt.ntt(GF.from_u64(c)).to_u64()
    np.testing.assert_array_equal(got, naive_dft(c))


def test_ntt_batched(rng):
    c = rng.integers(0, P, size=(3, 32), dtype=np.uint64)
    got = ntt.ntt(GF.from_u64(c)).to_u64()
    for i in range(3):
        np.testing.assert_array_equal(got[i], naive_dft(c[i]))


def test_intt_roundtrip(rng):
    c = rng.integers(0, P, size=(2, 128), dtype=np.uint64)
    gf = GF.from_u64(c)
    np.testing.assert_array_equal(ntt.intt(ntt.ntt(gf)).to_u64(), c)


def test_coset_ntt(rng):
    n = 32
    c = rng.integers(0, P, size=n, dtype=np.uint64)
    shift = gl64.MULTIPLICATIVE_GROUP_GENERATOR
    got = ntt.coset_ntt(GF.from_u64(c), shift).to_u64()
    np.testing.assert_array_equal(got, naive_dft(c, shift=shift))
    # roundtrip
    back = ntt.coset_intt(GF.from_u64(got), shift).to_u64()
    np.testing.assert_array_equal(back, c)


def test_lde_stage_skip_matches_padded_ntt(rng):
    n, rate_bits = 16, 3
    c = rng.integers(0, P, size=(2, n), dtype=np.uint64)
    shift = 7
    got = ntt.lde(GF.from_u64(c), rate_bits, shift=shift).to_u64()
    padded = np.zeros((2, n << rate_bits), dtype=np.uint64)
    padded[:, :n] = c
    expect = ntt.coset_ntt(GF.from_u64(padded), shift).to_u64()
    np.testing.assert_array_equal(got, expect)


def test_ext_ntt_componentwise(rng):
    n = 16
    a = rng.integers(0, P, size=n, dtype=np.uint64)
    b = rng.integers(0, P, size=n, dtype=np.uint64)
    v = ntt.ntt_ext(GF2.from_u64_pair(a, b))
    np.testing.assert_array_equal(v.a.to_u64(), naive_dft(a))
    np.testing.assert_array_equal(v.b.to_u64(), naive_dft(b))


def test_extension_field_ops(rng):
    # (a*b)*inv(b) == a ; frobenius^2 == identity; phi^2 == 7
    a = GF2.from_u64_pair(rng.integers(0, P, 8, dtype=np.uint64),
                          rng.integers(0, P, 8, dtype=np.uint64))
    b = GF2.from_u64_pair(rng.integers(1, P, 8, dtype=np.uint64),
                          rng.integers(0, P, 8, dtype=np.uint64))
    prod = (a * b) * b.inv()
    np.testing.assert_array_equal(prod.to_u64(), a.to_u64())
    np.testing.assert_array_equal(a.frobenius().frobenius().to_u64(), a.to_u64())
    phi = GF2.full((), 0, 1)
    np.testing.assert_array_equal(phi.square().to_u64(), [7, 0])
    # frobenius is the p-power map
    x = GF2.from_u64_pair(np.uint64(123456789), np.uint64(987654321))
    np.testing.assert_array_equal(x.frobenius().to_u64(), x.pow_const(P).to_u64())
