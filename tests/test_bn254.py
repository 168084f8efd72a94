"""BN254 tower + Tate pairing: field laws, frobenius, curve ops,
pairing bilinearity (reference evm/src/extension_tower.rs +
curve_pairings.rs tests)."""

import random

import pytest

from plonky2_tpu.zkevm.bn254 import (BN_N, BN_P, FP2_ONE, FP12_ONE, FROB_T1,
                                     FROB_Z, Fp2, Fp6, Fp12, G1_GEN, G2_GEN,
                                     CurvePoint, XI, curve_add, curve_mul,
                                     g1_is_on_curve, g2_is_on_curve, tate)

rng = random.Random(0xBEEF)


def rand_fp2():
    return Fp2(rng.randrange(BN_P), rng.randrange(BN_P))


def rand_fp6():
    return Fp6(rand_fp2(), rand_fp2(), rand_fp2())


def rand_fp12():
    return Fp12(rand_fp6(), rand_fp6())


def test_fp2_field_laws():
    for _ in range(20):
        a, b, c = rand_fp2(), rand_fp2(), rand_fp2()
        assert (a * b) * c == a * (b * c)
        assert a * (b + c) == a * b + a * c
        assert a * a.inv() == FP2_ONE
        # frobenius is the p-power map
        assert a.frob(1) == a.pow(BN_P)


def test_fp6_fp12_inverses_and_frobenius():
    for _ in range(5):
        a = rand_fp6()
        inv = a.inv()
        prod = a * inv
        assert prod == Fp6(FP2_ONE, Fp2(0, 0), Fp2(0, 0))
        f = rand_fp12()
        assert f * f.inv() == FP12_ONE
        # frob(n) composes: frob(1) six times = frob(6) = conjugate on Fp12
        g = f
        for _ in range(6):
            g = g.frob(1)
        assert g == f.frob(6) == f.conj()


def test_frobenius_constants():
    # t^(p^n) = t * FROB_T1[n] requires FROB_T1[n]^3 = xi^(p^n - 1)
    for n in range(6):
        lhs = FROB_T1[n].pow(3)
        rhs = XI.pow(pow(BN_P, n) - 1)
        assert lhs == rhs
    for n in range(12):
        assert FROB_Z[n].pow(6) == XI.pow(pow(BN_P, n) - 1)


def test_curve_ops():
    assert g1_is_on_curve(G1_GEN) and g2_is_on_curve(G2_GEN)
    p2 = curve_add(G1_GEN, G1_GEN)
    assert g1_is_on_curve(p2)
    assert curve_mul(G1_GEN, 2) == p2
    # group order annihilates
    assert curve_mul(G1_GEN, BN_N).is_identity()
    assert curve_mul(G1_GEN, 5) == curve_add(p2, curve_add(p2, G1_GEN))


def test_pairing_bilinearity():
    e = tate(G1_GEN, G2_GEN)
    assert e != FP12_ONE  # non-degenerate
    # e(aP, Q) = e(P, Q)^a (bilinearity in the first argument)
    assert tate(curve_mul(G1_GEN, 3), G2_GEN) == e.pow(3)
    # e(P, bQ) = e(P, Q)^b requires G2 arithmetic over Fp2
    q2 = curve_add(G2_GEN, G2_GEN)
    assert g2_is_on_curve(q2)
    assert tate(G1_GEN, q2) == e.pow(2)
    # full bilinearity
    assert tate(curve_mul(G1_GEN, 2), q2) == e.pow(4)
