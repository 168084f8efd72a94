"""Quartic/quintic extension property tests (mirrors the reference's
test_field_extension! macro coverage, field/src/field_testing.rs)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.field.towers import QUARTIC, QUINTIC

P = gl64.ORDER_INT


@pytest.mark.parametrize("F", [QUARTIC, QUINTIC], ids=["D4", "D5"])
def test_tower_properties(F, rng):
    def rand():
        return rng.integers(0, P, size=F.D, dtype=np.uint64)

    a, b, c = rand(), rand(), rand()
    # ring laws
    assert F.equal(F.mul(a, b), F.mul(b, a))
    assert F.equal(F.mul(F.mul(a, b), c), F.mul(a, F.mul(b, c)))
    assert F.equal(F.mul(a, F.add(b, c)), F.add(F.mul(a, b), F.mul(a, c)))
    assert F.equal(F.mul(a, F.one()), a)
    # inverse
    ainv = F.inv(a)
    assert F.equal(F.mul(a, ainv), F.one())
    # Frobenius is the p-power map and has order D
    assert F.equal(F.frobenius(a), F.pow_int(a, P))
    x = a
    for _ in range(F.D):
        x = F.frobenius(x)
    assert F.equal(x, a)
    # base field embeds compatibly
    s = int(rng.integers(1, P, dtype=np.uint64))
    assert F.equal(F.mul(F.from_base(np.uint64(s)), a), F.scalar_mul(a, s))


@pytest.mark.parametrize("F,order", [(QUARTIC, 4), (QUINTIC, 5)],
                         ids=["D4", "D5"])
def test_dth_root_order(F, order):
    assert pow(F.dth_root, order, P) == 1
    assert pow(F.dth_root, 1, P) != 1
