"""Quadratic extension field GF(p^2) = GF(p)[X]/(X^2 - 7), D=2.

Device twin of the reference's quadratic Goldilocks extension
(reference: field/src/extension/quadratic.rs, field/src/goldilocks_extensions.rs:14
with W = 7).  Elements are pairs (a, b) = a + b*phi with phi^2 = W.

Because the NTT twiddles live in the base field, extension-codeword NTTs
decompose into two independent base-field NTTs on the components; only the
challenge folds (alpha/beta reductions) need true extension multiplies.
"""

from __future__ import annotations

import jax
import numpy as np

from . import gl64
from .goldilocks import GF

# X^2 - W irreducible over GF(p); reference goldilocks_extensions.rs:14.
W = 7
# phi^p = DTH_ROOT * phi with DTH_ROOT = W^((p-1)/2) = p - 1 (i.e. -1):
# 7 is a quadratic non-residue mod p.
DTH_ROOT = gl64.ORDER_INT - 1

# Extension multiplicative group generator (reference
# field/src/goldilocks_extensions.rs: `Extendable<2> for GoldilocksField`).
# Used only for sampling/shifts in ZK paths; not needed for FRI over cosets.


@jax.tree_util.register_pytree_node_class
class GF2:
    """Array of GF(p^2) elements: a + b*phi, phi^2 = 7."""

    __slots__ = ("a", "b")
    D = 2

    def __init__(self, a: GF, b: GF):
        self.a = a
        self.b = b

    def tree_flatten(self):
        return (self.a, self.b), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- construction --------------------------------------------------
    @classmethod
    def from_base(cls, x: GF) -> "GF2":
        return cls(x, GF.zeros(x.shape))

    @classmethod
    def from_u64_pair(cls, a, b) -> "GF2":
        return cls(GF.from_u64(a), GF.from_u64(b))

    @classmethod
    def zeros(cls, shape) -> "GF2":
        return cls(GF.zeros(shape), GF.zeros(shape))

    @classmethod
    def ones(cls, shape) -> "GF2":
        return cls(GF.ones(shape), GF.zeros(shape))

    @classmethod
    def full(cls, shape, a: int, b: int = 0) -> "GF2":
        return cls(GF.full(shape, a), GF.full(shape, b))

    def to_u64(self) -> np.ndarray:
        """(..., 2) numpy array of canonical u64 components [a, b]."""
        return np.stack([self.a.to_u64(), self.b.to_u64()], axis=-1)

    # -- shape ----------------------------------------------------------
    @property
    def shape(self):
        return self.a.shape

    def reshape(self, *shape) -> "GF2":
        return GF2(self.a.reshape(*shape), self.b.reshape(*shape))

    def __getitem__(self, idx) -> "GF2":
        return GF2(self.a[idx], self.b[idx])

    def take(self, indices, axis=0) -> "GF2":
        return GF2(self.a.take(indices, axis), self.b.take(indices, axis))

    def broadcast_to(self, shape) -> "GF2":
        return GF2(self.a.broadcast_to(shape), self.b.broadcast_to(shape))

    @classmethod
    def concatenate(cls, parts, axis=0) -> "GF2":
        return cls(GF.concatenate([p.a for p in parts], axis),
                   GF.concatenate([p.b for p in parts], axis))

    @classmethod
    def stack(cls, parts, axis=0) -> "GF2":
        return cls(GF.stack([p.a for p in parts], axis),
                   GF.stack([p.b for p in parts], axis))

    @classmethod
    def where(cls, mask, x: "GF2", y: "GF2") -> "GF2":
        return cls(GF.where(mask, x.a, y.a), GF.where(mask, x.b, y.b))

    # -- arithmetic -------------------------------------------------------
    def _coerce(self, other) -> "GF2":
        if isinstance(other, GF2):
            return other
        if isinstance(other, GF):
            return GF2.from_base(other)
        if isinstance(other, (int, np.integer)):
            return GF2.full((), int(other))
        raise TypeError(f"cannot coerce {type(other)} to GF2")

    def __add__(self, other) -> "GF2":
        o = self._coerce(other)
        return GF2(self.a + o.a, self.b + o.b)

    __radd__ = __add__

    def __sub__(self, other) -> "GF2":
        o = self._coerce(other)
        return GF2(self.a - o.a, self.b - o.b)

    def __rsub__(self, other) -> "GF2":
        return self._coerce(other).__sub__(self)

    def __mul__(self, other) -> "GF2":
        if isinstance(other, GF) or isinstance(other, (int, np.integer)):
            o = other if isinstance(other, GF) else GF.full((), int(other))
            return GF2(self.a * o, self.b * o)
        o = self._coerce(other)
        # (a0 + b0 phi)(a1 + b1 phi) = a0a1 + W b0b1 + (a0b1 + b0a1) phi
        a0a1 = self.a * o.a
        b0b1 = self.b * o.b
        a0b1 = self.a * o.b
        b0a1 = self.b * o.a
        return GF2(a0a1 + b0b1.mul_small(W), a0b1 + b0a1)

    __rmul__ = __mul__

    def __neg__(self) -> "GF2":
        return GF2(-self.a, -self.b)

    def square(self) -> "GF2":
        # (a + b phi)^2 = a^2 + W b^2 + 2ab phi
        a2 = self.a.square()
        b2 = self.b.square()
        ab = self.a * self.b
        return GF2(a2 + b2.mul_small(W), ab + ab)

    def scalar_mul(self, s: GF) -> "GF2":
        return GF2(self.a * s, self.b * s)

    def frobenius(self) -> "GF2":
        """x -> x^p: (a, b) -> (a, -b) since W^((p-1)/2) = -1."""
        return GF2(self.a, -self.b)

    def inv(self) -> "GF2":
        """1/x via the norm: x^{-1} = conj(x) / (a^2 - W b^2)."""
        norm = self.a.square() - self.b.square().mul_small(W)
        ninv = norm.inv()
        return GF2(self.a * ninv, -(self.b * ninv))

    def pow_const(self, exp: int) -> "GF2":
        assert exp >= 0
        if exp == 0:
            return GF2.ones(self.shape)
        result = None
        acc = self
        e = exp
        while e:
            if e & 1:
                result = acc if result is None else result * acc
            e >>= 1
            if e:
                acc = acc.square()
        return result

    def equals(self, other: "GF2"):
        return self.a.equals(other.a) & self.b.equals(other.b)

    def is_zero(self):
        return self.a.is_zero() & self.b.is_zero()

    def sum(self, axis=None) -> "GF2":
        return GF2(self.a.sum(axis), self.b.sum(axis))
