"""Device-side Goldilocks field (p = 2^64 - 2^32 + 1) for TPU, in JAX.

TPUs have no 64-bit integer ALU, so field elements are represented as two
planar uint32 arrays (lo, hi) — "structure of limbs" — which keeps Pallas /
XLA tiles (8, 128)-aligned and lets every op vectorise on the VPU.  64x64 ->
128-bit multiplication is built from 16-bit digit products (each 16x16 -> 32
fits a uint32 lane), followed by the EPSILON = 2^32 - 1 reduction identity
(2^64 === EPSILON, 2^96 === -1 mod p), exactly the algebra the reference uses
on u64/u128 (reference: field/src/goldilocks_field.rs:346-390).

Values are kept noncanonical (arbitrary u64 residues); canonicalise only at
hash/transcript boundaries via `to_canonical`.

This module is the jnp fallback path; `plonky2_tpu.ops` provides fused Pallas
kernels for the hot compositions (NTT butterflies, Poseidon rounds).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import gl64

ORDER = gl64.ORDER_INT
# numpy scalars (not jnp): these embed as literals in traced graphs, so
# Pallas kernels using these helpers don't capture device constants.
EPSILON32 = np.uint32(0xFFFFFFFF)
ZERO32 = np.uint32(0)
ONE32 = np.uint32(1)

_M16 = np.uint32(0xFFFF)


def _u32(x):
    return x.astype(jnp.uint32)


# ------------------------------------------------------------------
# 32/64-bit primitive helpers on uint32 lanes
# ------------------------------------------------------------------

def mul32_wide(a, b):
    """Full 32x32 -> 64-bit product as (hi, lo) uint32 pair."""
    al = a & _M16
    ah = a >> 16
    bl = b & _M16
    bh = b >> 16
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    mid = lh + hl
    midc = _u32(mid < lh)                 # carry into bit 32 of mid
    mid_sh = mid << 16
    lo = ll + mid_sh
    c1 = _u32(lo < mid_sh)
    hi = hh + (mid >> 16) + (midc << 16) + c1
    return hi, lo


def add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 with carry-out, on 32-bit limbs."""
    lo = alo + blo
    c0 = _u32(lo < alo)
    hi = ahi + bhi
    c1 = _u32(hi < ahi)
    hi2 = hi + c0
    c2 = _u32(hi2 < hi)
    return lo, hi2, c1 | c2


def sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 with borrow-out, on 32-bit limbs."""
    lo = alo - blo
    b0 = _u32(alo < blo)
    hi = ahi - bhi
    b1 = _u32(ahi < bhi)
    hi2 = hi - b0
    b2 = _u32(hi < b0)
    return lo, hi2, b1 | b2


def mul64_wide(alo, ahi, blo, bhi):
    """Full 64x64 -> 128-bit product as four uint32 limbs (x3,x2,x1,x0)."""
    h00, l00 = mul32_wide(alo, blo)
    h01, l01 = mul32_wide(alo, bhi)
    h10, l10 = mul32_wide(ahi, blo)
    h11, l11 = mul32_wide(ahi, bhi)
    x0 = l00
    # column 1: h00 + l01 + l10
    t = h00 + l01
    c = _u32(t < h00)
    x1 = t + l10
    c = c + _u32(x1 < t)
    # column 2: h01 + h10 + l11 + c
    t = h01 + h10
    c2 = _u32(t < h01)
    t2 = t + l11
    c2 = c2 + _u32(t2 < t)
    x2 = t2 + c
    c2 = c2 + _u32(x2 < t2)
    # column 3
    x3 = h11 + c2
    return x3, x2, x1, x0


def reduce128(x3, x2, x1, x0):
    """Reduce 128-bit (x3·2^96 + x2·2^64 + x1·2^32 + x0) mod p -> (lo, hi).

    Identity (reference goldilocks_field.rs:357-381):
      x === x_lo - x3 + x2·EPSILON (mod p)
    with branchless EPSILON fixups for borrow/carry.
    """
    # t0 = x_lo - x3 (64-bit), on borrow subtract EPSILON (i.e. 2^64 deficit)
    t0lo, t0hi, borrow = sub64(x0, x1, x3, ZERO32)
    # subtract EPSILON when borrow: EPSILON = (lo=0xffffffff, hi=0)
    elo = jnp.where(borrow != 0, EPSILON32, ZERO32)
    t0lo, t0hi, _ = sub64(t0lo, t0hi, elo, ZERO32)
    # t1 = x2 * EPSILON = (x2 << 32) - x2
    nz = _u32(x2 != 0)
    t1lo = ZERO32 - x2
    t1hi = x2 - nz
    # t2 = t0 + t1, on carry add EPSILON
    t2lo, t2hi, carry = add64(t0lo, t0hi, t1lo, t1hi)
    elo = jnp.where(carry != 0, EPSILON32, ZERO32)
    rlo = t2lo + elo
    c2 = _u32(rlo < t2lo)
    rhi = t2hi + c2
    return rlo, rhi


# ------------------------------------------------------------------
# Field ops on (lo, hi) limb pairs
# ------------------------------------------------------------------

def fadd(alo, ahi, blo, bhi):
    slo, shi, carry = add64(alo, ahi, blo, bhi)
    # += EPSILON on carry (2^64 === EPSILON); a second wrap leaves a value
    # < 2^32 so the final EPSILON add cannot carry again.
    elo = jnp.where(carry != 0, EPSILON32, ZERO32)
    s2lo, s2hi, carry2 = add64(slo, shi, elo, ZERO32)
    elo2 = jnp.where(carry2 != 0, EPSILON32, ZERO32)
    s3lo, s3hi, _ = add64(s2lo, s2hi, elo2, ZERO32)
    return s3lo, s3hi


def fsub(alo, ahi, blo, bhi):
    # canonicalise b so a - b borrows at most once past the fixup
    blo, bhi = to_canonical(blo, bhi)
    dlo, dhi, borrow = sub64(alo, ahi, blo, bhi)
    elo = jnp.where(borrow != 0, EPSILON32, ZERO32)
    d2lo = dlo - elo
    b1 = _u32(dlo < elo)
    d2hi = dhi - b1
    return d2lo, d2hi


def fmul(alo, ahi, blo, bhi):
    x3, x2, x1, x0 = mul64_wide(alo, ahi, blo, bhi)
    return reduce128(x3, x2, x1, x0)


def fsquare(alo, ahi):
    return fmul(alo, ahi, alo, ahi)


def to_canonical(lo, hi):
    """Map arbitrary u64 residue into [0, p). p = (hi=0xffffffff, lo=1)."""
    ge = (hi == EPSILON32) & (lo >= ONE32)
    # subtract p: lo - 1, hi - 0xffffffff (with borrow)
    clo = lo - ONE32
    chi = hi - EPSILON32 - _u32(lo < ONE32)
    return jnp.where(ge, clo, lo), jnp.where(ge, chi, hi)


def fneg(alo, ahi):
    alo, ahi = to_canonical(alo, ahi)
    zero = (alo == 0) & (ahi == 0)
    # p - a
    nlo = ONE32 - alo
    nhi = EPSILON32 - ahi - _u32(ONE32 < alo)
    return jnp.where(zero, ZERO32, nlo), jnp.where(zero, ZERO32, nhi)


def fmul_small(alo, ahi, c: int):
    """Multiply by a small constant c < 2^32 (hi limb of c is zero)."""
    cc = jnp.uint32(c)
    h0, l0 = mul32_wide(alo, cc)
    h1, l1 = mul32_wide(ahi, cc)
    # product = h1·2^96? no: (ahi·2^32 + alo)·c = h1·2^64 + l1·2^32 + h0·2^32 + l0
    x0 = l0
    x1 = l1 + h0
    c1 = _u32(x1 < l1)
    x2 = h1 + c1
    return reduce128(ZERO32, x2, x1, x0)


# ------------------------------------------------------------------
# GF: pytree array-of-field-elements
# ------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class GF:
    """An array of Goldilocks field elements as planar (lo, hi) uint32 arrays."""

    __slots__ = ("lo", "hi")

    def __init__(self, lo, hi):
        self.lo = lo
        self.hi = hi

    def tree_flatten(self):
        return (self.lo, self.hi), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    # -- construction --------------------------------------------------
    @classmethod
    def from_u64(cls, x) -> "GF":
        """From numpy uint64 (or python int / int list) values."""
        x = np.asarray(x, dtype=np.uint64)
        lo = jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32))
        hi = jnp.asarray((x >> np.uint64(32)).astype(np.uint32))
        return cls(lo, hi)

    @classmethod
    def zeros(cls, shape) -> "GF":
        z = jnp.zeros(shape, dtype=jnp.uint32)
        return cls(z, z)

    @classmethod
    def ones(cls, shape) -> "GF":
        return cls(jnp.ones(shape, dtype=jnp.uint32), jnp.zeros(shape, dtype=jnp.uint32))

    @classmethod
    def full(cls, shape, value: int) -> "GF":
        value = int(value) % ORDER
        return cls(jnp.full(shape, value & 0xFFFFFFFF, dtype=jnp.uint32),
                   jnp.full(shape, value >> 32, dtype=jnp.uint32))

    def to_u64(self) -> np.ndarray:
        """Back to host numpy uint64 (canonical)."""
        lo, hi = to_canonical(self.lo, self.hi)
        lo = np.asarray(jax.device_get(lo), dtype=np.uint64)
        hi = np.asarray(jax.device_get(hi), dtype=np.uint64)
        return (hi << np.uint64(32)) | lo

    # -- shape plumbing -------------------------------------------------
    @property
    def shape(self):
        return self.lo.shape

    @property
    def ndim(self):
        return self.lo.ndim

    def reshape(self, *shape) -> "GF":
        return GF(self.lo.reshape(*shape), self.hi.reshape(*shape))

    def __getitem__(self, idx) -> "GF":
        return GF(self.lo[idx], self.hi[idx])

    def take(self, indices, axis=0) -> "GF":
        return GF(jnp.take(self.lo, indices, axis=axis),
                  jnp.take(self.hi, indices, axis=axis))

    def broadcast_to(self, shape) -> "GF":
        return GF(jnp.broadcast_to(self.lo, shape), jnp.broadcast_to(self.hi, shape))

    def transpose(self, *axes) -> "GF":
        return GF(jnp.transpose(self.lo, axes or None), jnp.transpose(self.hi, axes or None))

    @classmethod
    def concatenate(cls, parts, axis=0) -> "GF":
        return cls(jnp.concatenate([p.lo for p in parts], axis=axis),
                   jnp.concatenate([p.hi for p in parts], axis=axis))

    @classmethod
    def stack(cls, parts, axis=0) -> "GF":
        return cls(jnp.stack([p.lo for p in parts], axis=axis),
                   jnp.stack([p.hi for p in parts], axis=axis))

    @classmethod
    def where(cls, mask, a: "GF", b: "GF") -> "GF":
        return cls(jnp.where(mask, a.lo, b.lo), jnp.where(mask, a.hi, b.hi))

    # -- arithmetic ------------------------------------------------------
    def _coerce(self, other) -> "GF":
        if isinstance(other, GF):
            return other
        if isinstance(other, (int, np.integer)):
            return GF.full((), int(other))
        raise TypeError(f"cannot coerce {type(other)} to GF")

    def __add__(self, other) -> "GF":
        o = self._coerce(other)
        return GF(*fadd(self.lo, self.hi, o.lo, o.hi))

    __radd__ = __add__

    def __sub__(self, other) -> "GF":
        o = self._coerce(other)
        return GF(*fsub(self.lo, self.hi, o.lo, o.hi))

    def __rsub__(self, other) -> "GF":
        return self._coerce(other).__sub__(self)

    def __mul__(self, other) -> "GF":
        o = self._coerce(other)
        return GF(*fmul(self.lo, self.hi, o.lo, o.hi))

    __rmul__ = __mul__

    def __neg__(self) -> "GF":
        return GF(*fneg(self.lo, self.hi))

    def square(self) -> "GF":
        return GF(*fsquare(self.lo, self.hi))

    def mul_small(self, c: int) -> "GF":
        return GF(*fmul_small(self.lo, self.hi, c))

    def double(self) -> "GF":
        return self + self

    def canonical(self) -> "GF":
        return GF(*to_canonical(self.lo, self.hi))

    def equals(self, other: "GF"):
        a = self.canonical()
        b = other.canonical()
        return (a.lo == b.lo) & (a.hi == b.hi)

    def is_zero(self):
        c = self.canonical()
        return (c.lo == 0) & (c.hi == 0)

    def pow_const(self, exp: int) -> "GF":
        """self^exp for a fixed python-int exponent.

        Small exponents unroll at trace time; large ones run a fori_loop over
        the exponent bits (compact graph — compile time matters)."""
        assert exp >= 0
        if exp == 0:
            return GF.ones(self.shape)
        if exp.bit_count() + exp.bit_length() <= 16:
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
        nbits = exp.bit_length()
        bits = jnp.asarray(
            np.array([(exp >> i) & 1 for i in range(nbits)], dtype=np.uint32))

        def body(i, carry):
            result, acc = carry
            hit = GF.where(bits[i] != 0, result * acc, result)
            return (hit, acc.square())

        result, _ = jax.lax.fori_loop(0, nbits, body, (GF.ones(self.shape), self))
        return result

    def inv(self) -> "GF":
        """Fermat inverse a^(p-2), fully vectorised (0 maps to 0)."""
        return self.pow_const(ORDER - 2)

    def sum(self, axis=None) -> "GF":
        """Modular reduction-sum via pairwise (log-depth) strided slicing."""
        x = self
        if axis is None:
            x = x.reshape(-1)
            axis = 0
        axis = axis % max(x.ndim, 1)
        if axis != x.ndim - 1:
            perm = [i for i in range(x.ndim) if i != axis] + [axis]
            x = x.transpose(*perm)
        n = x.shape[-1]
        rem = None
        while n > 1:
            if n % 2:
                tail = x[..., n - 1 : n]
                rem = tail if rem is None else rem + tail
                x = x[..., : n - 1]
                n -= 1
            x = x[..., 0::2] + x[..., 1::2]
            n //= 2
        if rem is not None:
            x = x + rem
        return x[..., 0]


def batch_inv(x: GF) -> GF:
    """Batch inversion via log-depth prefix products + one Fermat inverse.

    Device twin of gl64.batch_inv (Montgomery's trick); zeros map to zeros.
    """
    flat = x.reshape(-1)
    n = flat.shape[0]
    zero_mask = flat.is_zero()
    vals = GF.where(zero_mask, GF.ones((n,)), flat)
    # inclusive prefix products, log-depth (Hillis-Steele over modmul)
    prefix = vals
    shift = 1
    while shift < n:
        shifted = GF.concatenate([GF.ones((shift,)), prefix[: n - shift]], axis=0)
        prefix = prefix * shifted
        shift *= 2
    total = prefix[n - 1 : n]
    total_inv = total.inv()
    # suffix_inv[i] = inv(prod over [0..i]) ; out[i] = prefix[i-1] * suffix_inv[i]
    # compute via reverse prefix of inverses: out[i] = total_inv * prod_{j>i} vals[j] * prefix[i-1]
    # simpler: inv_prefix[i] = inv(prefix[i]) built backwards: inv_prefix[i] = inv_prefix[i+1] * vals[i+1]
    # log-depth: inv_prefix = total_inv * suffix_products(vals[i+1:])
    rev = vals[::-1]
    suffix = rev
    shift = 1
    while shift < n:
        shifted = GF.concatenate([GF.ones((shift,)), suffix[: n - shift]], axis=0)
        suffix = suffix * shifted
        shift *= 2
    suffix = suffix[::-1]  # suffix[i] = prod vals[i:]
    suffix_tail = GF.concatenate([suffix[1:], GF.ones((1,))], axis=0)  # prod vals[i+1:]
    prefix_head = GF.concatenate([GF.ones((1,)), prefix[: n - 1]], axis=0)  # prod vals[:i]
    out = total_inv.broadcast_to((n,)) * suffix_tail * prefix_head
    out = GF.where(zero_mask, GF.zeros((n,)), out)
    return out.reshape(x.shape)
