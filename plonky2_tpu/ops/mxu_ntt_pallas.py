"""Fused MXU DFT kernel: balanced-digit matmul + mod-p recombination in
one Pallas pass.

The four-step NTT's small DFTs are Y = W @ X over Goldilocks.  Both
operands decompose into 8 balanced base-256 digits (int8 range; exact in
bf16), making the product 64 digit-pair matmuls that the MXU executes as
8 bf16 dots per tile with exact f32 accumulation (|acc| <= 128*128*256
< 2^24).  The recombination — offset buckets, byte-position split, carry
normalisation, five u32 words, Goldilocks 2^64/2^96/2^128 folds — runs
in VMEM right after the dots, so the (8*N1, 8*M) digit-product tensor
never touches HBM (the pure-XLA formulation in tools/mxu_ntt.py loses to
the radix path exactly because that ~1 GB/step tensor round-trips).

Digit trick: for a centered representative x' (|x'| bounded), the bytes
of y = x' + 0x8080..80 minus 128 are exactly x's balanced digits — no
carry chain.  Centering threshold T = 2^64 - 1 - K keeps y unwrapped.

Per tile: read (8, N1, TM) bf16 digits + the resident (8*N1, N1) bf16
digit matrix, write (N1, TM) u32 limb pairs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import gl64
from ..field.goldilocks import (EPSILON32, GF, ZERO32, _u32, add64, sub64,
                                to_canonical)

P = gl64.ORDER_INT
K_OFFSET = 0x8080808080808080
T_CENTER = (1 << 64) - 1 - K_OFFSET
NUM_DIGITS = 8
NUM_BUCKETS = 15
NUM_POS = 18
BUCKET_OFF = 1 << 26
OFF_CONST = sum(BUCKET_OFF << (8 * k) for k in range(NUM_BUCKETS)) % P

U32 = jnp.uint32
TILE_M = 512


# ------------------------------------------------------------------ digits

def dft_matrix_digits(n1: int, inverse: bool = False,
                      scale: int = 1, dtype=jnp.bfloat16) -> np.ndarray:
    """(8*n1, n1) balanced digit planes of the DFT matrix
    w[i,j] = scale_row(i) * g^(i*j mod n1) (scale folds the 1/n of an
    inverse transform in).  dtype int8 runs the MXU at 2x the bf16 rate
    with exact s32 accumulation (see ops/mxu_lde_pallas.py)."""
    g = gl64.primitive_root_of_unity(int(np.log2(n1)))
    if inverse:
        g = np.uint64(pow(int(g), P - 2, P))
    idx = np.arange(n1, dtype=np.uint64)
    e = (idx[:, None] * idx[None, :]) % np.uint64(n1)
    pw = gl64.powers(int(g), n1)
    w = pw[e.astype(np.int64)]
    if scale != 1:
        w = gl64.mul(w, np.uint64(scale % P))
    v = gl64.to_canonical(np.asarray(w, np.uint64))
    with np.errstate(over="ignore"):
        y = np.where(v > T_CENTER, v - np.uint64(P), v) + np.uint64(K_OFFSET)
    shifts = (np.uint64(8) * np.arange(8, dtype=np.uint64)).reshape(8, 1, 1)
    digs = ((y[None] >> shifts) & np.uint64(255)).astype(np.int16) - 128
    if dtype == jnp.int8:
        return np.ascontiguousarray(digs.reshape(8 * n1, n1).astype(np.int8))
    return np.ascontiguousarray(
        digs.reshape(8 * n1, n1).astype(np.float32)).astype(jnp.bfloat16)


def balanced_digits(x: GF) -> jnp.ndarray:
    """GF (..., ) -> (8, ...) bf16 balanced digits (device pass)."""
    lo, hi = to_canonical(x.lo, x.hi)
    t_hi = U32(T_CENTER >> 32)
    t_lo = U32(T_CENTER & 0xFFFFFFFF)
    gt = (hi > t_hi) | ((hi == t_hi) & (lo > t_lo))
    p_lo, p_hi = U32(1), U32(0xFFFFFFFF)
    slo = jnp.where(gt, lo - p_lo, lo)
    shi = jnp.where(gt, hi - p_hi - (lo < p_lo).astype(U32), hi)
    ylo, yhi, _ = add64(slo, shi, U32(0x80808080), U32(0x80808080))
    digs = [((ylo >> U32(8 * k)) & U32(255)).astype(jnp.int32) - 128
            for k in range(4)]
    digs += [((yhi >> U32(8 * k)) & U32(255)).astype(jnp.int32) - 128
             for k in range(4)]
    return jnp.stack(digs).astype(jnp.bfloat16)


# ------------------------------------------------------------ recombination

def _fadd(alo, ahi, blo, bhi):
    slo, shi, carry = add64(alo, ahi, blo, bhi)
    elo = jnp.where(carry != 0, EPSILON32, ZERO32)
    s2lo, s2hi, carry2 = add64(slo, shi, elo, ZERO32)
    elo2 = jnp.where(carry2 != 0, EPSILON32, ZERO32)
    s3lo, s3hi, _ = add64(s2lo, s2hi, elo2, ZERO32)
    return s3lo, s3hi


def _fsub(alo, ahi, blo, bhi):
    blo, bhi = to_canonical(blo, bhi)
    lo, hi, borrow = sub64(alo, ahi, blo, bhi)
    elo = jnp.where(borrow != 0, EPSILON32, ZERO32)
    lo, hi, _ = sub64(lo, hi, elo, ZERO32)
    return lo, hi


def recombine_buckets(buckets: list):
    """15 int32 (..., ) bucket arrays -> (lo, hi) u32 Goldilocks limbs.
    Multiply-free: byte-position accumulation, carry normalisation, five
    u32 words, 2^64 = 2^32-1 / 2^96 = -1 / 2^128 = -2^32 folds."""
    acc = [None] * (NUM_POS + 2)
    for k, b in enumerate(buckets):
        ub = (b + jnp.int32(BUCKET_OFF)).astype(U32)  # [0, 2^27)
        for i in range(4):
            byte = (ub >> U32(8 * i)) & U32(255)
            pos = k + i
            acc[pos] = byte if acc[pos] is None else acc[pos] + byte
    carry = jnp.zeros_like(acc[0])
    bytes_ = []
    for pos in range(NUM_POS):
        t = acc[pos] + carry
        bytes_.append(t & U32(255))
        carry = t >> U32(8)
    bytes_.append(carry & U32(255))
    bytes_.append(carry >> U32(8))
    w = [bytes_[4 * j] | (bytes_[4 * j + 1] << U32(8))
         | (bytes_[4 * j + 2] << U32(16)) | (bytes_[4 * j + 3] << U32(24))
         for j in range(5)]
    # value = (w0, w1) + w2*(2^32-1) - w3 - w4*2^32 - OFF_CONST  (mod p)
    nz = _u32(w[2] != 0)
    t1lo = ZERO32 - w[2]
    t1hi = w[2] - nz
    lo, hi = _fadd(w[0], w[1], t1lo, t1hi)
    lo, hi = _fsub(lo, hi, w[3], jnp.zeros_like(w[3]))
    lo, hi = _fsub(lo, hi, jnp.zeros_like(w[4]), w[4])
    lo, hi = _fsub(lo, hi, U32(OFF_CONST & 0xFFFFFFFF), U32(OFF_CONST >> 32))
    return lo, hi


# ---------------------------------------------------------------- kernel

def _digits_tile(lo, hi):
    """In-kernel balanced digits of a u32-limb tile -> 8 bf16 arrays."""
    lo, hi = to_canonical(lo, hi)
    t_hi = U32(T_CENTER >> 32)
    t_lo = U32(T_CENTER & 0xFFFFFFFF)
    gt = (hi > t_hi) | ((hi == t_hi) & (lo > t_lo))
    p_lo, p_hi = U32(1), U32(0xFFFFFFFF)
    slo = jnp.where(gt, lo - p_lo, lo)
    shi = jnp.where(gt, hi - p_hi - (lo < p_lo).astype(U32), hi)
    ylo, yhi, _ = add64(slo, shi, U32(0x80808080), U32(0x80808080))
    digs = [((ylo >> U32(8 * k)) & U32(255)).astype(jnp.int32) - 128
            for k in range(4)]
    digs += [((yhi >> U32(8 * k)) & U32(255)).astype(jnp.int32) - 128
             for k in range(4)]
    return [d.astype(jnp.bfloat16) for d in digs]


def _dft_body(w, xlo, xhi, n1: int):
    int8 = w.dtype == jnp.int8
    xd = _digits_tile(xlo, xhi)                      # 8 x (n1, TM)
    if int8:
        xd = [d.astype(jnp.int8) for d in xd]
    buckets = [None] * NUM_BUCKETS
    for e in range(NUM_DIGITS):
        pe = jax.lax.dot_general(
            w, xd[e], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if int8
            else jnp.float32)                        # (8*n1, TM)
        if not int8:
            pe = pe.astype(jnp.int32)
        for d in range(NUM_DIGITS):
            k = d + e
            blk = pe[d * n1:(d + 1) * n1, :]
            buckets[k] = blk if buckets[k] is None else buckets[k] + blk
    return recombine_buckets(buckets)


def _dft_kernel(w_ref, xlo_ref, xhi_ref, out_lo_ref, out_hi_ref, *,
                n1: int):
    lo, hi = _dft_body(w_ref[...], xlo_ref[...], xhi_ref[...], n1)
    out_lo_ref[...] = lo
    out_hi_ref[...] = hi


def _dft_twiddle_kernel(w_ref, xlo_ref, xhi_ref, twlo_ref, twhi_ref,
                        out_lo_ref, out_hi_ref, *, n1: int):
    """DFT + post-multiply by per-element twiddles, all in one pass."""
    from .poseidon_pallas import _fmul
    lo, hi = _dft_body(w_ref[...], xlo_ref[...], xhi_ref[...], n1)
    lo, hi = _fmul(lo, hi, twlo_ref[...], twhi_ref[...])
    out_lo_ref[...] = lo
    out_hi_ref[...] = hi


@partial(jax.jit, static_argnums=(2,))
def mxu_dft(wd: jnp.ndarray, x: GF, tile_m: int = TILE_M,
            twiddles: GF = None) -> GF:
    """DFT along axis 0 of x (N1, M): digit extraction, the 8 digit-pair
    MXU dots, the mod-p recombination — and optionally a fused
    post-multiply by (N1, M) twiddles — in one VMEM pass."""
    n1, m = x.shape
    tile = min(tile_m, m)
    assert m % tile == 0
    grid = (m // tile,)
    blk = pl.BlockSpec((n1, tile), lambda i: (0, i))
    in_specs = [pl.BlockSpec((8 * n1, n1), lambda i: (0, 0)), blk, blk]
    args = [wd, x.lo, x.hi]
    if twiddles is None:
        kernel = partial(_dft_kernel, n1=n1)
    else:
        kernel = partial(_dft_twiddle_kernel, n1=n1)
        in_specs += [blk, blk]
        args += [twiddles.lo, twiddles.hi]
    out_lo, out_hi = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((n1, m), jnp.uint32),
            jax.ShapeDtypeStruct((n1, m), jnp.uint32),
        ],
    )(*args)
    return GF(out_lo, out_hi)


def mxu_dft_jnp(wd: jnp.ndarray, x: GF) -> GF:
    """Pure-jnp twin of the kernel (CPU-testable)."""
    n1, m = x.shape
    int8 = wd.dtype == jnp.int8
    xd = balanced_digits(x)
    buckets = [None] * NUM_BUCKETS
    for e in range(NUM_DIGITS):
        if int8:
            pe = jax.lax.dot_general(
                wd, xd[e].astype(jnp.int8), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        else:
            pe = jax.lax.dot_general(
                wd.astype(jnp.bfloat16), xd[e].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
        for d in range(NUM_DIGITS):
            k = d + e
            blk = pe[d * n1:(d + 1) * n1, :]
            buckets[k] = blk if buckets[k] is None else buckets[k] + blk
    lo, hi = recombine_buckets(buckets)
    return GF(lo, hi)


# ------------------------------------------------------------- four-step

@partial(jax.jit, static_argnums=(1, 2, 3))
def mxu_ntt(x: GF, log_n1: int, log_n2: int, use_pallas: bool = True) -> GF:
    """Forward NTT of (..., N) coefficients, N = N1*N2, natural order in
    and out — four-step with fused MXU DFT kernels."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    batch = x.shape[:-1]
    bsz = int(np.prod(batch)) if batch else 1
    wd1 = jnp.asarray(dft_matrix_digits(n1))
    wd2 = jnp.asarray(dft_matrix_digits(n2))
    dft = mxu_dft if use_pallas else mxu_dft_jnp

    xr = x.reshape(bsz, n1, n2)
    xt = GF(jnp.transpose(xr.lo, (1, 0, 2)).reshape(n1, bsz * n2),
            jnp.transpose(xr.hi, (1, 0, 2)).reshape(n1, bsz * n2))

    g = gl64.primitive_root_of_unity(log_n1 + log_n2)
    k1 = np.arange(n1, dtype=np.uint64)
    n2i = np.arange(n2, dtype=np.uint64)
    pw = gl64.powers(int(g), n1 * n2)
    tw = pw[((k1[:, None] * n2i[None, :]) % np.uint64(n1 * n2))
            .astype(np.int64)]
    if use_pallas:
        # twiddle multiply fused into the DFT kernel's epilogue (smaller
        # tile: the extra twiddle blocks + fmul temps hit the 16M scoped
        # VMEM limit at the default tile)
        tw_full = GF.from_u64(np.tile(tw, (1, bsz)))
        a = mxu_dft(wd1, xt, TILE_M // 2, tw_full)   # (k1, (b, n2))
        a = a.reshape(n1, bsz, n2)
    else:
        a = dft(wd1, xt)
        a = a.reshape(n1, bsz, n2) * GF.from_u64(tw).reshape(n1, 1, n2)

    t = GF(jnp.transpose(a.lo, (2, 0, 1)).reshape(n2, n1 * bsz),
           jnp.transpose(a.hi, (2, 0, 1)).reshape(n2, n1 * bsz))
    c = dft(wd2, t)                                  # (k2, (k1, b))
    c3l = c.lo.reshape(n2, n1, bsz)
    c3h = c.hi.reshape(n2, n1, bsz)
    return GF(jnp.transpose(c3l, (2, 0, 1)).reshape(*batch, n2 * n1),
              jnp.transpose(c3h, (2, 0, 1)).reshape(*batch, n2 * n1))
