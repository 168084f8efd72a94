"""Fully-fused MXU coset-LDE kernel: both four-step DFT passes, the
twiddle multiply and the coset scaling in ONE Pallas kernel, no HBM
intermediate and no transposes.

The production LDE (reference field/src/fft.rs:169 zero-pad stage-skip;
our radix-8 twin field/ntt.py lde) is the framework's hot loop: every
commitment LDEs its polynomial batch 2^rate_bits x.  The radix
formulation is HBM-bound (~5 butterfly passes over the 8n-point
codeword, ~80n words of traffic per polynomial).  This kernel reshapes
the transform so the MXU does the arithmetic and HBM sees only ~12n
words:

  y[t1 + n1*t2] = sum_{i2} ( sum_{i1} c[i1,i2] * W1[t1,i1] )
                  * T[t1,i2] * W2s[t2,i2]

with N = n * 2^rate_bits = n1*n2, input index i = i1*n2 + i2 (nonzero
only for i1 < n1z = n/n2 -- the zero-padding makes step 1 a tall, thin
matmul), and

  W1[t1,i1]  = w_{n1}^{t1*i1} * (s^{n2})^{i1}     (coset fold, step 1)
  T[t1,i2]   = w_N^{t1*i2}                        (four-step twiddle)
  W2s[t2,i2] = w_{n2}^{t2*i2} * s^{i2}            (coset fold, step 2)

Both matmuls run as balanced-digit MXU dots exactly like
ops/mxu_ntt_pallas.py (8 digit planes, 15 bucket recombination).
Planes default to int8 — balanced base-256 digits are int8-exact, the
v5e MXU runs s8xs8->s32 at 2x the bf16 rate, and the s32 accumulation
is exact for any contraction length here (|acc| <= 128*128*K < 2^31
for K <= 2^17); bf16 planes (exact f32 accumulation for n2 <= 512)
remain as a fallback knob (PLONKY2_TPU_LDE_PLANES).  Per
(polynomial, t1-tile) grid step the kernel streams i2 chunks: step-1
dot + twiddle into a VMEM-resident A' scratch held in *digit-offset
form* (value + 0x8080..80, so step 2's plane extraction is shift/mask
only), then on the last chunk runs the step-2 dots t2-chunk by t2-chunk
against the resident W2 digit planes and writes the output tile.

The twiddle T is never materialised: T[t1, a*128+b] =
w_N^{t1*128*a} * w_N^{t1*b} = TH[t1,a]*TL[t1,b], so the kernel reads a
(n1, n2/128) + (n1, 128) table pair instead of the full (n1, n2) grid.

Output layout is (t1, t2) -- the natural codeword permuted by the
four-step index split.  Consumers absorb it: the Merkle leaf order is a
bit-reversal gather anyway (fri/oracle.py from_coeffs), so
`leaf_perm_from_mem` composes both permutations into the one gather the
pipeline already performs; `natural_perm_from_mem` recovers natural
coset order for the quotient pass.

HBM traffic per polynomial (vs ~80n radix-8 words): read c once per
t1-tile (n1/tt1 * n words), TL tables ~ (n1*128), write 8n.  For the
flagship shape (n=2^16, rate 3, n1=1024, n2=512, tt1=512) that is
~12n words -- a ~6x traffic reduction over the radix path.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import gl64
from ..field.goldilocks import GF, add64, to_canonical
from ..utils.bits import reverse_index_bits_perm
from .mxu_ntt_pallas import (K_OFFSET, NUM_BUCKETS, NUM_DIGITS, P, T_CENTER,
                             recombine_buckets)
from .poseidon_pallas import _fmul

U32 = jnp.uint32
LANES = 128          # TL table width / i2 chunk width
DEF_TT1 = 512        # t1 rows per grid step
DEF_TT2 = 128        # t2 columns per step-2 dot chunk

# Digit-plane dtype for the MXU dots.  Balanced base-256 digits live in
# [-128, 127], so they are exact in BOTH int8 and bf16.  int8 runs the
# v5e MXU at 2x the bf16 rate with exact int32 accumulation (no f32
# 2^24 mantissa bound, so no n2 <= 512 exactness restriction either);
# bf16 is kept as a fallback knob.
import os as _os
PLANE_DTYPE = (jnp.bfloat16 if _os.environ.get(
    "PLONKY2_TPU_LDE_PLANES", "int8") == "bf16" else jnp.int8)


# ------------------------------------------------------------- host tables

def matrix_digits(w: np.ndarray, dtype=None) -> np.ndarray:
    """(M, K) u64 field matrix -> (8, M, K) balanced digit planes."""
    dtype = PLANE_DTYPE if dtype is None else dtype
    v = gl64.to_canonical(np.asarray(w, np.uint64))
    with np.errstate(over="ignore"):
        y = np.where(v > T_CENTER, v - np.uint64(P), v) + np.uint64(K_OFFSET)
    shifts = (np.uint64(8) * np.arange(8, dtype=np.uint64)).reshape(
        8, *([1] * v.ndim))
    digs = ((y[None] >> shifts) & np.uint64(255)).astype(np.int16) - 128
    if dtype == jnp.int8:
        return np.ascontiguousarray(digs.astype(np.int8))
    return np.ascontiguousarray(digs.astype(np.float32)).astype(jnp.bfloat16)


def _pow_matrix(base: int, rows: np.ndarray, cols: np.ndarray,
                order: int) -> np.ndarray:
    """u64 matrix base^(rows[:,None]*cols[None,:] mod order)."""
    e = (rows[:, None].astype(np.uint64) * cols[None, :].astype(np.uint64)) \
        % np.uint64(order)
    pw = gl64.powers(base, order)
    return pw[e.astype(np.int64)]


def pick_n2(log_n: int, rate_bits: int) -> int:
    """Step-2 size: 256 measured fastest on v5e for n <= 2^17 (n2=256 does
    ~20% fewer MACs than 512 at the flagship shape: N*(n/n2 + n2) is
    minimised near sqrt(n) and 2.31 vs 2.13 G elems/s measured,
    BASELINE.md), subject to n2 | n, VMEM residency of the W2 planes, and
    (bf16 fallback planes) f32 exactness n2 <= 512.

    For n > 2^17 (int8 planes only — the int8 s32 accumulation is exact
    for contractions up to 2^17, per-dot, not total-n) pick the balanced
    split n2 ~= sqrt(n), which minimises the two-step MAC count
    N*(n/n2 + n2); the 2^20 flagship gets n2=1024 / n1z=1024."""
    if log_n <= 17:
        return min(256, 1 << log_n, 1 << ((log_n + rate_bits) // 2))
    return 1 << ((log_n + 1) // 2)


@lru_cache(maxsize=16)
def _lde_tables(log_n: int, rate_bits: int, shift: int, n2: int,
                dtype=None):
    """Host-precomputed constants for one (n, rate, shift, n2) shape."""
    dtype = PLANE_DTYPE if dtype is None else dtype
    n = 1 << log_n
    big_n = n << rate_bits
    n1 = big_n // n2
    n1z = n // n2
    assert n2 <= n and n2 % LANES == 0, (n, n2)
    if dtype == jnp.int8:
        # int32 accumulation: |acc| <= 128*128*K < 2^31 for K <= 2^17
        assert n2 <= (1 << 17) and n1z <= (1 << 17), (n2, n1z)
    else:
        # f32 exactness: both dots accumulate |plane products| <= 128*128
        # per term, so contraction lengths must stay <= 512 (2^23 < 2^24)
        assert n2 <= 512 and n1z <= 512, \
            f"contraction too long for exact f32 accumulation: n2={n2} n1z={n1z}"
    log_big = log_n + rate_bits
    w_n1 = gl64.primitive_root_of_unity(int(np.log2(n1)))
    w_n2 = gl64.primitive_root_of_unity(int(np.log2(n2)))
    w_big = gl64.primitive_root_of_unity(log_big)

    t1 = np.arange(n1)
    i1 = np.arange(n1z)
    i2 = np.arange(n2)
    t2 = np.arange(n2)

    # W1[t1, i1] = w_n1^(t1*i1) * (shift^n2)^(i1)
    w1 = _pow_matrix(w_n1, t1, i1, n1)
    s_n2 = pow(shift, n2, P)
    w1 = gl64.mul(w1, gl64.powers(s_n2, n1z)[None, :])
    w1d = matrix_digits(w1, dtype)                            # (8, n1, n1z)

    # W2s[t2, i2] = w_n2^(t2*i2) * shift^(i2), digitized TRANSPOSED so the
    # step-2 dot contracts (tt1, n2) x (n2, t2-chunk)
    w2 = _pow_matrix(w_n2, t2, i2, n2)
    w2 = gl64.mul(w2, gl64.powers(shift, n2)[None, :])
    w2dt = matrix_digits(w2.T, dtype)                         # (8, n2, n2)

    # T[t1, i2] = w_big^(t1*i2) = TH[t1, i2//128] * TL[t1, i2%128]
    th = _pow_matrix(pow(w_big, LANES, P), t1, np.arange(n2 // LANES),
                     big_n)
    tl = _pow_matrix(w_big, t1, np.arange(LANES), big_n)
    # TH stored (n2/128, n1, 1): the i2-chunk index leads so the Pallas
    # block can tile (1, tt1, 1) — Mosaic requires the last two block dims
    # to divide (8, 128) or equal the array dims, which a (tt1, 1) block on
    # an (n1, n2/128) table violates
    # host numpy throughout: this function is lru_cached, and jnp
    # conversion inside a jit trace would cache TRACERS (constants staged
    # into whichever trace primed the cache) that escape into later traces
    def np_limbs(x):
        x = np.asarray(x, np.uint64)
        return ((x & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (x >> np.uint64(32)).astype(np.uint32))
    th_lo, th_hi = np_limbs(np.ascontiguousarray(th.T)[:, :, None])
    tl_lo, tl_hi = np_limbs(tl)
    return w1d, w2dt, GF(th_lo, th_hi), GF(tl_lo, tl_hi), n1, n2, n1z


# ------------------------------------------------------------ output perms

@lru_cache(maxsize=16)
def natural_perm_from_mem(log_n: int, rate_bits: int, n2: int) -> np.ndarray:
    """perm with natural[m] = mem.flat[perm[m]] for the (t1, t2) layout."""
    big_n = 1 << (log_n + rate_bits)
    n1 = big_n // n2
    m = np.arange(big_n)
    return (m % n1) * n2 + m // n1


@lru_cache(maxsize=16)
def leaf_perm_from_mem(log_n: int, rate_bits: int, n2: int) -> np.ndarray:
    """Bit-reversed leaf order composed with the (t1, t2) layout: one
    gather replaces the oracle's reverse_index_bits pass."""
    nat = natural_perm_from_mem(log_n, rate_bits, n2)
    rev = reverse_index_bits_perm(1 << (log_n + rate_bits))
    return nat[rev]


# ------------------------------------------------------------------ kernel

def _offset_form(lo, hi):
    """Canonical value -> centered + 0x8080..80 (digit-extractable form)."""
    lo, hi = to_canonical(lo, hi)
    t_hi = U32(T_CENTER >> 32)
    t_lo = U32(T_CENTER & 0xFFFFFFFF)
    gt = (hi > t_hi) | ((hi == t_hi) & (lo > t_lo))
    p_lo, p_hi = U32(1), U32(0xFFFFFFFF)
    slo = jnp.where(gt, lo - p_lo, lo)
    shi = jnp.where(gt, hi - p_hi - (lo < p_lo).astype(U32), hi)
    return add64(slo, shi, U32(0x80808080), U32(0x80808080))[:2]


def _plane(ylo, yhi, e: int, dtype=None):
    """Digit plane e of offset-form limbs -> int8 or bf16."""
    dtype = PLANE_DTYPE if dtype is None else dtype
    src = ylo if e < 4 else yhi
    k = 8 * (e % 4)
    return (((src >> U32(k)) & U32(255)).astype(jnp.int32) - 128) \
        .astype(dtype)


def _digit_dot(wplanes, xlo, xhi, contract_right: bool):
    """64 digit-pair MXU dots + bucket recombination.  Plane dtype (and
    hence the MXU mode: int8 x2-rate / int32 acc, or bf16 / f32 acc)
    follows wplanes.

    contract_right=False: wplanes[d] (M, K) @ x (K, TM)   (step 1)
    contract_right=True:  x (TM, K) @ wplanes[d] (K, M)   (step 2)
    """
    dtype = wplanes[0].dtype
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32
    ylo, yhi = _offset_form(xlo, xhi)
    buckets = [None] * NUM_BUCKETS
    for e in range(NUM_DIGITS):
        pe = _plane(ylo, yhi, e, dtype)
        for d in range(NUM_DIGITS):
            if contract_right:
                prod = jax.lax.dot_general(
                    pe, wplanes[d], (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_t)
            else:
                prod = jax.lax.dot_general(
                    wplanes[d], pe, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_t)
            if acc_t is not jnp.int32:
                prod = prod.astype(jnp.int32)
            k = d + e
            buckets[k] = prod if buckets[k] is None else buckets[k] + prod
    return recombine_buckets(buckets)


def _lde_kernel(w1_ref, w2t_ref, thlo_ref, thhi_ref, tllo_ref, tlhi_ref,
                clo_ref, chi_ref, out_lo_ref, out_hi_ref,
                aylo_ref, ayhi_ref, *, n2: int, ti2: int, tt2: int):
    ii2 = pl.program_id(2)
    n_i2 = pl.num_programs(2)

    # ---- step 1 on this i2 chunk: tall digit matmul + twiddle
    w1 = w1_ref[...]                                  # (8, tt1, n1z)
    lo, hi = _digit_dot([w1[d] for d in range(NUM_DIGITS)],
                        clo_ref[0], chi_ref[0], contract_right=False)
    # twiddle: T = TH[chunk] (broadcast over lanes) * TL
    lo, hi = _fmul(lo, hi, tllo_ref[...], tlhi_ref[...])
    lo, hi = _fmul(lo, hi, thlo_ref[0], thhi_ref[0])
    ylo, yhi = _offset_form(lo, hi)
    aylo_ref[:, pl.ds(ii2 * ti2, ti2)] = ylo
    ayhi_ref[:, pl.ds(ii2 * ti2, ti2)] = yhi

    # ---- step 2 on the last chunk: contract the resident A' over i2
    @pl.when(ii2 == n_i2 - 1)
    def _():
        w2t = w2t_ref[...]                            # (8, n2, n2)
        dtype = w2t.dtype
        acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32
        aylo = aylo_ref[...]
        ayhi = ayhi_ref[...]
        for c0 in range(0, n2, tt2):
            buckets = [None] * NUM_BUCKETS
            for e in range(NUM_DIGITS):
                pe = _plane(aylo, ayhi, e, dtype)     # (tt1, n2)
                for d in range(NUM_DIGITS):
                    prod = jax.lax.dot_general(
                        pe, w2t[d][:, c0:c0 + tt2], (((1,), (0,)), ((), ())),
                        preferred_element_type=acc_t)
                    if acc_t is not jnp.int32:
                        prod = prod.astype(jnp.int32)
                    k = d + e
                    buckets[k] = prod if buckets[k] is None \
                        else buckets[k] + prod
            olo, ohi = recombine_buckets(buckets)
            out_lo_ref[0, :, c0:c0 + tt2] = olo
            out_hi_ref[0, :, c0:c0 + tt2] = ohi


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5))
def mxu_lde(coeffs: GF, rate_bits: int, shift: int = 7, n2: int = 0,
            tt1: int = DEF_TT1, plane_dtype=None) -> GF:
    """Coset LDE of (k, n) coefficients -> (k, n1, n2) evaluations in
    (t1, t2) four-step layout (natural index m = t1 + n1*t2; see
    natural_perm_from_mem / leaf_perm_from_mem)."""
    k, n = coeffs.shape
    log_n = int(np.log2(n))
    assert 1 << log_n == n
    if n2 == 0:
        n2 = pick_n2(log_n, rate_bits)
    w1d, w2dt, th, tl, n1, n2, n1z = _lde_tables(log_n, rate_bits, shift, n2,
                                                 plane_dtype)
    tt1 = min(tt1, n1)
    ti2 = LANES
    tt2 = min(DEF_TT2, n2)
    c3 = coeffs.reshape(k, n1z, n2)
    grid = (k, n1 // tt1, n2 // ti2)

    w1_spec = pl.BlockSpec((NUM_DIGITS, tt1, n1z), lambda ik, it, ii: (0, it, 0))
    w2_spec = pl.BlockSpec((NUM_DIGITS, n2, n2), lambda ik, it, ii: (0, 0, 0))
    th_spec = pl.BlockSpec((1, tt1, 1), lambda ik, it, ii: (ii, it, 0))
    tl_spec = pl.BlockSpec((tt1, LANES), lambda ik, it, ii: (it, 0))
    c_spec = pl.BlockSpec((1, n1z, ti2), lambda ik, it, ii: (ik, 0, ii))
    out_spec = pl.BlockSpec((1, tt1, n2), lambda ik, it, ii: (ik, it, 0))

    out_lo, out_hi = pl.pallas_call(
        partial(_lde_kernel, n2=n2, ti2=ti2, tt2=tt2),
        grid=grid,
        in_specs=[w1_spec, w2_spec, th_spec, th_spec, tl_spec, tl_spec,
                  c_spec, c_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((k, n1, n2), jnp.uint32),
                   jax.ShapeDtypeStruct((k, n1, n2), jnp.uint32)],
        scratch_shapes=[pltpu.VMEM((tt1, n2), jnp.uint32),
                        pltpu.VMEM((tt1, n2), jnp.uint32)],
        # the resident W2 planes + double-buffered out tiles exceed the
        # 16 MB default scoped-vmem budget at the flagship shape (~20 MB);
        # v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20),
    )(w1d, w2dt, th.lo, th.hi, tl.lo, tl.hi, c3.lo, c3.hi)
    return GF(out_lo, out_hi)


# ------------------------------------------------------------------- twin

def mxu_lde_jnp(coeffs: GF, rate_bits: int, shift: int = 7,
                n2: int = 0, plane_dtype=None) -> GF:
    """Pure-jnp twin of the kernel (CPU-testable, same numerics: digit
    bf16 dots + bucket recombination for both steps)."""
    k, n = coeffs.shape
    log_n = int(np.log2(n))
    if n2 == 0:
        n2 = pick_n2(log_n, rate_bits)
    w1d, w2dt, th, tl, n1, n2, n1z = _lde_tables(log_n, rate_bits, shift, n2,
                                                 plane_dtype)

    c3 = coeffs.reshape(k, n1z, n2)
    # step 1: contract i1 -> A[t1, (k, i2)]
    x = GF(jnp.transpose(c3.lo, (1, 0, 2)).reshape(n1z, k * n2),
           jnp.transpose(c3.hi, (1, 0, 2)).reshape(n1z, k * n2))
    lo, hi = _digit_dot(list(w1d), x.lo, x.hi, contract_right=False)
    a = GF(lo.reshape(n1, k, n2), hi.reshape(n1, k, n2))
    # twiddle TH (x) TL
    tl_rep = GF(jnp.tile(tl.lo, (1, n2 // LANES)),
                jnp.tile(tl.hi, (1, n2 // LANES)))
    # th is stored (n2/128, n1, 1); recover the (n1, n2) broadcast
    th_rep = GF(jnp.repeat(th.lo[:, :, 0].T, LANES, axis=1),
                jnp.repeat(th.hi[:, :, 0].T, LANES, axis=1))
    a = a * (tl_rep * th_rep).reshape(n1, 1, n2)
    # step 2: contract i2
    a2 = GF(jnp.transpose(a.lo, (1, 0, 2)).reshape(k * n1, n2),
            jnp.transpose(a.hi, (1, 0, 2)).reshape(k * n1, n2))
    lo, hi = _digit_dot(list(w2dt), a2.lo, a2.hi, contract_right=True)
    return GF(lo.reshape(k, n1, n2), hi.reshape(k, n1, n2))
