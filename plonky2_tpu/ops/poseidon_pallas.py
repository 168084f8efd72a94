"""Fused Pallas kernel for the width-12 Poseidon permutation over Goldilocks.

One kernel runs all 30 rounds in VMEM — the jnp path (hash/poseidon.py)
round-trips HBM at every lax.fori_loop iteration boundary unless XLA fuses
perfectly; here the whole permutation is a single VMEM-resident unroll, the
TPU analogue of the reference's AVX2/NEON Poseidon kernels
(plonky2/src/hash/arch/x86_64/poseidon_goldilocks_avx2_bmi2.rs:164,
aarch64/poseidon_goldilocks_neon.rs).

Layout: states are (12, B) planar u32 limb arrays — batch rides the 128-lane
axis, the 12 state rows ride sublanes, so every field op is an (8+, 128)
VPU tile op.  Round constants are baked into the kernel as (12, 1) column
immediates that broadcast across lanes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field.goldilocks import (ZERO32, _u32, add64, mul32_wide, reduce128)
from ..hash import poseidon_constants as C

WIDTH = 12
_RC = np.array(C.ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, WIDTH)
# transposed (12, 30): column r broadcasts over the lane axis in-kernel
_RC_LO_T = np.ascontiguousarray((_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32).T)
_RC_HI_T = np.ascontiguousarray((_RC >> np.uint64(32)).astype(np.uint32).T)

# default batch tile (lanes); 12 x 1024 x 4B x 2 limbs ~= 96 KiB of VMEM
TILE_B = 1024


def _fadd(alo, ahi, blo, bhi):
    slo, shi, carry = add64(alo, ahi, blo, bhi)
    elo = jnp.where(carry != 0, jnp.uint32(0xFFFFFFFF), ZERO32)
    s2lo, s2hi, carry2 = add64(slo, shi, elo, ZERO32)
    elo2 = jnp.where(carry2 != 0, jnp.uint32(0xFFFFFFFF), ZERO32)
    s3lo, s3hi, _ = add64(s2lo, s2hi, elo2, ZERO32)
    return s3lo, s3hi


def _fmul(alo, ahi, blo, bhi):
    h00, l00 = mul32_wide(alo, blo)
    h01, l01 = mul32_wide(alo, bhi)
    h10, l10 = mul32_wide(ahi, blo)
    h11, l11 = mul32_wide(ahi, bhi)
    x0 = l00
    t = h00 + l01
    c = _u32(t < h00)
    x1 = t + l10
    c = c + _u32(x1 < t)
    t = h01 + h10
    c2 = _u32(t < h01)
    t2 = t + l11
    c2 = c2 + _u32(t2 < t)
    x2 = t2 + c
    c2 = c2 + _u32(x2 < t2)
    x3 = h11 + c2
    return reduce128(x3, x2, x1, x0)


def _sbox(lo, hi):
    l2, h2 = _fmul(lo, hi, lo, hi)
    l4, h4 = _fmul(l2, h2, l2, h2)
    l3, h3 = _fmul(lo, hi, l2, h2)
    return _fmul(l3, h3, l4, h4)


def _mds(lo, hi):
    """96-bit exact accumulate over the circulant rows, one reduce at the end.
    lo/hi: (12, B)."""
    acc0 = jnp.zeros_like(lo)
    acc1 = jnp.zeros_like(lo)
    acc2 = jnp.zeros_like(lo)

    def acc_add(acc0, acc1, acc2, tlo, thi, c: int):
        cc = jnp.uint32(c)
        h0, l0 = mul32_wide(tlo, cc)
        h1, l1 = mul32_wide(thi, cc)
        a0 = acc0 + l0
        c0 = _u32(a0 < l0)
        m = h0 + l1
        cm = _u32(m < h0)
        a1 = acc1 + m
        c1 = _u32(a1 < m)
        a1b = a1 + c0
        c1b = _u32(a1b < a1)
        a2 = acc2 + h1 + cm + c1 + c1b
        return a0, a1b, a2

    for i, c in enumerate(C.MDS_MATRIX_CIRC):
        # jnp.roll lowers to a sublane rotate in Mosaic and works off-TPU too
        rl = jnp.roll(lo, -i, axis=0) if i else lo
        rh = jnp.roll(hi, -i, axis=0) if i else hi
        acc0, acc1, acc2 = acc_add(acc0, acc1, acc2, rl, rh, c)
    # diagonal: DIAG[0] = 8 on row 0 only
    row0 = (jax.lax.broadcasted_iota(jnp.uint32, lo.shape, 0) == 0)
    mask = row0.astype(jnp.uint32)
    acc0, acc1, acc2 = acc_add(acc0, acc1, acc2, lo * mask, hi * mask,
                               C.MDS_MATRIX_DIAG[0])
    return reduce128(ZERO32, acc2, acc1, acc0)


def _rounds(lo, hi, rc_lo, rc_hi):
    """All 30 rounds on (12, B) limb arrays; rc_*: (12, 30).  Plain jnp —
    runs inside the Pallas kernel on TPU and standalone for CPU testing.
    Rounds run under lax.fori_loop (round constants dynamically sliced) to
    keep the traced graph ~30x smaller; rounds are serial anyway."""
    def add_rc(lo, hi, r):
        rl = jax.lax.dynamic_slice(rc_lo, (0, r), (WIDTH, 1))
        rh = jax.lax.dynamic_slice(rc_hi, (0, r), (WIDTH, 1))
        return _fadd(lo, hi, jnp.broadcast_to(rl, lo.shape),
                     jnp.broadcast_to(rh, hi.shape))

    def full_round(r, carry):
        lo, hi = carry
        lo, hi = add_rc(lo, hi, r)
        lo, hi = _sbox(lo, hi)
        return _mds(lo, hi)

    def partial_round(r, carry):
        lo, hi = carry
        lo, hi = add_rc(lo, hi, r)
        s0lo, s0hi = _sbox(lo[0:1, :], hi[0:1, :])
        lo = jnp.concatenate([s0lo, lo[1:, :]], axis=0)
        hi = jnp.concatenate([s0hi, hi[1:, :]], axis=0)
        return _mds(lo, hi)

    hf, npart = C.HALF_N_FULL_ROUNDS, C.N_PARTIAL_ROUNDS
    lo, hi = jax.lax.fori_loop(0, hf, full_round, (lo, hi))
    lo, hi = jax.lax.fori_loop(hf, hf + npart, partial_round, (lo, hi))
    lo, hi = jax.lax.fori_loop(hf + npart, C.N_ROUNDS, full_round, (lo, hi))
    return lo, hi


def _poseidon_kernel(lo_ref, hi_ref, rc_lo_ref, rc_hi_ref,
                     out_lo_ref, out_hi_ref):
    lo, hi = _rounds(lo_ref[:], hi_ref[:], rc_lo_ref[:], rc_hi_ref[:])
    out_lo_ref[:] = lo
    out_hi_ref[:] = hi


@jax.jit
def permute_cols_jnp(lo: jnp.ndarray, hi: jnp.ndarray):
    """The kernel's exact round pipeline as plain XLA ops — the CPU-testable
    twin of permute_cols (pltpu.roll falls back to jnp.roll off-TPU)."""
    return _rounds(lo, hi, jnp.asarray(_RC_LO_T), jnp.asarray(_RC_HI_T))


@partial(jax.jit, static_argnums=(2, 3))
def permute_cols(lo: jnp.ndarray, hi: jnp.ndarray, tile_b: int = TILE_B,
                 interpret: bool = False):
    """Poseidon on (12, B) planar limb arrays; B must be a multiple of tile_b."""
    assert lo.shape[0] == WIDTH and lo.shape == hi.shape
    b = lo.shape[1]
    assert b % tile_b == 0, (b, tile_b)
    grid = (b // tile_b,)
    spec = pl.BlockSpec((WIDTH, tile_b), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((WIDTH, 30), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    out_lo, out_hi = pl.pallas_call(
        _poseidon_kernel,
        grid=grid,
        in_specs=[spec, spec, rc_spec, rc_spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(lo.shape, jnp.uint32),
                   jax.ShapeDtypeStruct(hi.shape, jnp.uint32)],
        interpret=interpret,
    )(lo, hi, jnp.asarray(_RC_LO_T), jnp.asarray(_RC_HI_T))
    return out_lo, out_hi
