"""Fused Pallas kernel for the width-12 Poseidon permutation over Goldilocks.

One kernel runs all 30 rounds in VMEM — the TPU analogue of the
reference's AVX2/NEON Poseidon kernels
(plonky2/src/hash/arch/x86_64/poseidon_goldilocks_avx2_bmi2.rs:164,
aarch64/poseidon_goldilocks_neon.rs).

Layout: states are (12, B) planar u32 limb arrays — batch rides the
128-lane axis, the 12 state rows ride sublanes, so every field op is an
(8+, 128) VPU tile op.  Three kernel-level optimizations over the naive
round loop:

- rounds fully unrolled with round-constant columns baked as immediates
  (no fori_loop carry, no dynamic slices — Mosaic can pipeline across
  round boundaries);
- the partial-round S-box touches only state row 0: computing x^7 on a
  (1, B) slice wastes 7/8 sublanes of every VPU op, so the row is
  reshaped to (8, B/8) for the four field muls and reshaped back;
- the MDS layer is selectable: "roll" (12 sublane rotations, 96-bit
  accumulate) or "mxu" (8 byte-plane bf16 dots against the constant
  12x12 MDS matrix — entries <= 49, single digit — with shift-add
  recombination; |plane dot| <= 12*49*255 < 2^18 is exact in f32).
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
_RC_LO = (_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32)   # (30, 12)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)

# MDS[r][c] = CIRC[(c - r) mod 12] + (r == c) * DIAG[r]  (poseidon.rs:178)
_MDS = np.zeros((WIDTH, WIDTH), dtype=np.int64)
for _r in range(WIDTH):
    for _c in range(WIDTH):
        _MDS[_r, _c] = C.MDS_MATRIX_CIRC[(_c - _r) % WIDTH]
    _MDS[_r, _r] += C.MDS_MATRIX_DIAG[_r]
_MDS_BF16 = _MDS.astype(np.float32)

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


def _mds_roll(lo, hi):
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


def _mds_mxu(lo, hi, m):
    """MDS as 8 byte-plane MXU dots: x = sum_e d_e*2^(8e) (unsigned bytes,
    exact for any u64 input), so M @ x = sum_e 2^(8e) * (M @ d_e).  Plane
    dots are exact in f32 (<= 12*49*255 < 2^18); shift-add into a 96-bit
    accumulator, one reduce at the end.  m: (12, 12) bf16 MDS matrix —
    passed in (not closed over) so the Pallas kernel can take it as an
    input rather than a captured constant."""
    acc0 = jnp.zeros_like(lo)
    acc1 = jnp.zeros_like(lo)
    acc2 = jnp.zeros_like(lo)
    for e in range(8):
        src = lo if e < 4 else hi
        plane = ((src >> jnp.uint32(8 * (e % 4))) & jnp.uint32(255)) \
            .astype(jnp.int32).astype(jnp.bfloat16)
        pe = jax.lax.dot_general(m, plane, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        pe = pe.astype(jnp.int32).astype(jnp.uint32)          # < 2^18
        bit = 8 * (e % 4)
        word_lo = pe << jnp.uint32(bit) if bit else pe
        word_hi = pe >> jnp.uint32(32 - bit) if bit else jnp.zeros_like(pe)
        if e < 4:
            a0 = acc0 + word_lo
            c0 = _u32(a0 < word_lo)
            a1 = acc1 + word_hi + c0
            c1 = _u32(a1 < acc1)            # word_hi + c0 < 2^32: no double carry
            acc0, acc1, acc2 = a0, a1, acc2 + c1
        else:
            a1 = acc1 + word_lo
            c1 = _u32(a1 < word_lo)
            acc1, acc2 = a1, acc2 + word_hi + c1
    return reduce128(ZERO32, acc2, acc1, acc0)


def _packed_sbox_row0(lo, hi):
    """x^7 on state row 0 packed to (8, B/8) so all sublanes work.
    Packing needs B/8 to stay lane-aligned (Mosaic cannot shape-cast a
    (1, B) tile to a sub-128-lane (8, B/8)); narrower tiles fall back to
    the plain one-row S-box."""
    b = lo.shape[1]
    if b % 8 or (b // 8) % 128:
        s0lo, s0hi = _sbox(lo[0:1, :], hi[0:1, :])
        return s0lo, s0hi
    plo = lo[0:1, :].reshape(8, b // 8)
    phi = hi[0:1, :].reshape(8, b // 8)
    slo, shi = _sbox(plo, phi)
    return slo.reshape(1, b), shi.reshape(1, b)


def _rounds(lo, hi, mds_mode: str = "roll", rc_lo=None, rc_hi=None,
            mds_m=None):
    """All 30 rounds on (12, B) limb arrays, fully unrolled.  Round
    constants come from rc_lo/rc_hi (30, 12) arrays — the Pallas kernel
    passes its loaded input refs (array constants may not be captured by
    a TPU kernel), the jnp twin the module tables.  Plain jnp — runs
    inside the Pallas kernel on TPU and standalone for CPU testing."""
    if rc_lo is None:
        rc_lo, rc_hi = jnp.asarray(_RC_LO), jnp.asarray(_RC_HI)
    if mds_mode == "mxu":
        if mds_m is None:
            mds_m = jnp.asarray(_MDS_BF16, jnp.bfloat16)
        mds = partial(_mds_mxu, m=mds_m)
    else:
        mds = _mds_roll
    hf, npart = C.HALF_N_FULL_ROUNDS, C.N_PARTIAL_ROUNDS

    def add_rc(lo, hi, r):
        rl = rc_lo[r][:, None]
        rh = rc_hi[r][:, None]
        return _fadd(lo, hi, jnp.broadcast_to(rl, lo.shape),
                     jnp.broadcast_to(rh, hi.shape))

    for r in range(hf):
        lo, hi = add_rc(lo, hi, r)
        lo, hi = _sbox(lo, hi)
        lo, hi = mds(lo, hi)
    for r in range(hf, hf + npart):
        lo, hi = add_rc(lo, hi, r)
        s0lo, s0hi = _packed_sbox_row0(lo, hi)
        lo = jnp.concatenate([s0lo, lo[1:, :]], axis=0)
        hi = jnp.concatenate([s0hi, hi[1:, :]], axis=0)
        lo, hi = mds(lo, hi)
    for r in range(hf + npart, C.N_ROUNDS):
        lo, hi = add_rc(lo, hi, r)
        lo, hi = _sbox(lo, hi)
        lo, hi = mds(lo, hi)
    return lo, hi


def _poseidon_kernel(rc_lo_ref, rc_hi_ref, lo_ref, hi_ref,
                     out_lo_ref, out_hi_ref, *, mds_mode: str):
    lo, hi = _rounds(lo_ref[:], hi_ref[:], mds_mode,
                     rc_lo=rc_lo_ref[:], rc_hi=rc_hi_ref[:])
    out_lo_ref[:] = lo
    out_hi_ref[:] = hi


def _poseidon_kernel_mxu(rc_lo_ref, rc_hi_ref, mds_ref, lo_ref, hi_ref,
                         out_lo_ref, out_hi_ref):
    lo, hi = _rounds(lo_ref[:], hi_ref[:], "mxu",
                     rc_lo=rc_lo_ref[:], rc_hi=rc_hi_ref[:],
                     mds_m=mds_ref[:])
    out_lo_ref[:] = lo
    out_hi_ref[:] = hi


@partial(jax.jit, static_argnums=(2,))
def permute_cols_jnp(lo: jnp.ndarray, hi: jnp.ndarray,
                     mds_mode: str = "roll"):
    """The kernel's exact round pipeline as plain XLA ops — the CPU-testable
    twin of permute_cols."""
    return _rounds(lo, hi, mds_mode)


@partial(jax.jit, static_argnums=(2, 3, 4))
def permute_cols(lo: jnp.ndarray, hi: jnp.ndarray, tile_b: int = TILE_B,
                 interpret: bool = False, mds_mode: str = "roll"):
    """Poseidon on (12, B) planar limb arrays; B must be a multiple of tile_b."""
    assert lo.shape[0] == WIDTH and lo.shape == hi.shape
    b = lo.shape[1]
    assert b % tile_b == 0, (b, tile_b)
    grid = (b // tile_b,)
    spec = pl.BlockSpec((WIDTH, tile_b), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    rc_spec = pl.BlockSpec((C.N_ROUNDS, WIDTH), lambda i: (0, 0),
                           memory_space=pltpu.VMEM)
    rc_args = [jnp.asarray(_RC_LO), jnp.asarray(_RC_HI)]
    if mds_mode == "mxu":
        kernel = _poseidon_kernel_mxu
        in_specs = [rc_spec, rc_spec,
                    pl.BlockSpec((WIDTH, WIDTH), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    spec, spec]
        rc_args.append(jnp.asarray(_MDS_BF16, jnp.bfloat16))
    else:
        kernel = partial(_poseidon_kernel, mds_mode=mds_mode)
        in_specs = [rc_spec, rc_spec, spec, spec]
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct(lo.shape, jnp.uint32),
                   jax.ShapeDtypeStruct(hi.shape, jnp.uint32)],
        interpret=interpret,
    )(*rc_args, lo, hi)
    return out_lo, out_hi
