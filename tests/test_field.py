"""Field arithmetic tests: host (gl64) and device (GF) vs python-int oracle.

Mirrors the reference property harness `test_field_arithmetic!`
(reference: field/src/field_testing.rs:6) plus limb-edge-case vectors.
"""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.field.goldilocks import GF, batch_inv

P = gl64.ORDER_INT

EDGE = np.array(
    [
        0,
        1,
        2,
        0xFFFFFFFF,  # EPSILON
        0x100000000,  # 2^32
        0xFFFFFFFF00000000,  # p - 1
        0xFFFFFFFF00000001,  # p (noncanonical zero)
        0xFFFFFFFFFFFFFFFF,  # 2^64 - 1
        0xFFFFFFFE00000003,
        7,
        1753635133440165772,  # 2-adic generator
    ],
    dtype=np.uint64,
)


def rand_u64(rng, n):
    return rng.integers(0, 1 << 64, size=n, dtype=np.uint64)


def pairs(rng, n=500):
    a = np.concatenate([EDGE, rand_u64(rng, n)])
    b = np.concatenate([EDGE[::-1], rand_u64(rng, n)])
    k = min(len(a), len(b))
    return a[:k], b[:k]


def all_pairs_edge():
    a, b = np.meshgrid(EDGE, EDGE)
    return a.ravel(), b.ravel()


def oracle_op(a, b, op):
    out = np.empty_like(a)
    for i, (x, y) in enumerate(zip(a.tolist(), b.tolist())):
        if op == "add":
            out[i] = (x + y) % P
        elif op == "sub":
            out[i] = (x - y) % P
        elif op == "mul":
            out[i] = (x * y) % P
    return out


@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_gl64_ops_vs_int_oracle(rng, op):
    for a, b in (pairs(rng), all_pairs_edge()):
        expect = oracle_op(a, b, op)
        got = getattr(gl64, op)(a, b)
        np.testing.assert_array_equal(gl64.to_canonical(got), expect)


@pytest.mark.parametrize("op", ["add", "sub", "mul"])
def test_gf_device_ops_vs_int_oracle(rng, op):
    for a, b in (pairs(rng), all_pairs_edge()):
        expect = oracle_op(a, b, op)
        ga, gb = GF.from_u64(a), GF.from_u64(b)
        if op == "add":
            got = ga + gb
        elif op == "sub":
            got = ga - gb
        else:
            got = ga * gb
        np.testing.assert_array_equal(got.to_u64(), expect)


def test_gf_neg_square(rng):
    a = np.concatenate([EDGE, rand_u64(rng, 200)])
    ga = GF.from_u64(a)
    np.testing.assert_array_equal(
        (-ga).to_u64(), np.array([(P - (int(x) % P)) % P for x in a], dtype=np.uint64)
    )
    np.testing.assert_array_equal(
        ga.square().to_u64(), np.array([(int(x) * int(x)) % P for x in a], dtype=np.uint64)
    )


def test_gl64_inverse(rng):
    a = rand_u64(rng, 50)
    a = np.where(gl64.to_canonical(a) == 0, np.uint64(1), a)
    ainv = gl64.inv(a)
    np.testing.assert_array_equal(gl64.to_canonical(gl64.mul(a, ainv)), np.ones_like(a))


def test_gl64_batch_inverse(rng):
    a = np.concatenate([rand_u64(rng, 40), np.zeros(3, dtype=np.uint64)])
    rng.shuffle(a)
    ainv = gl64.batch_inv(a)
    prod = gl64.to_canonical(gl64.mul(a, ainv))
    expect = (gl64.to_canonical(a) != 0).astype(np.uint64)
    np.testing.assert_array_equal(prod, expect)


def test_gf_inverse_and_batch_inv(rng):
    a = rand_u64(rng, 33)
    a[5] = 0
    ga = GF.from_u64(a)
    inv = batch_inv(ga)
    prod = (ga * inv).to_u64()
    expect = (gl64.to_canonical(a) != 0).astype(np.uint64)
    np.testing.assert_array_equal(prod, expect)
    # single Fermat inverse
    one = GF.from_u64(np.array([12345], dtype=np.uint64))
    np.testing.assert_array_equal((one * one.inv()).to_u64(), [1])


def test_mul_small_and_pow(rng):
    a = np.concatenate([EDGE, rand_u64(rng, 100)])
    ga = GF.from_u64(a)
    for c in [0, 1, 7, 41, 0xFFFFFFFF]:
        np.testing.assert_array_equal(
            ga.mul_small(c).to_u64(),
            np.array([(int(x) * c) % P for x in a], dtype=np.uint64),
        )
    np.testing.assert_array_equal(
        ga.pow_const(7).to_u64(),
        np.array([pow(int(x), 7, P) for x in a], dtype=np.uint64),
    )


def test_two_adic_generators():
    # g_32^(2^32) == 1 and g_32^(2^31) != 1
    g = gl64.POWER_OF_TWO_GENERATOR
    assert pow(g, 1 << 32, P) == 1
    assert pow(g, 1 << 31, P) == P - 1
    # primitive_root_of_unity(k) has exact order 2^k
    for k in [0, 1, 5, 20]:
        r = gl64.primitive_root_of_unity(k)
        assert pow(r, 1 << k, P) == 1
        if k > 0:
            assert pow(r, 1 << (k - 1), P) != 1


def test_gf_sum(rng):
    for n in [1, 2, 7, 64, 129]:
        a = rand_u64(rng, n)
        ga = GF.from_u64(a)
        expect = sum(int(x) for x in a) % P
        assert int(ga.sum().to_u64()) == expect


def test_powers_and_subgroup():
    sub = gl64.two_adic_subgroup(3)
    g = gl64.primitive_root_of_unity(3)
    assert sub[1] == g
    assert (int(sub[7]) * g) % P == 1
    pw = gl64.powers(5, 6)
    assert [int(x) for x in pw] == [1, 5, 25, 125, 625, 3125]
