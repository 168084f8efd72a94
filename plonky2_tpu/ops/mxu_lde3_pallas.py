"""Three-step fused MXU coset-LDE kernel for n > 2^17.

The two-step kernel (ops/mxu_lde_pallas.py) pays N*(n/n2 + n2) MACs per
polynomial; at the 2^20-coeff flagship shape the balanced split is
n2 = 1024, i.e. 2048 effective MACs per output element — 4x the 2^16
shape's 512 and a ~1.5 G elems/s MXU ceiling.  Splitting the DFT into
THREE digit-plane matmul stages restores the flagship MAC count:

  N = n1*n2*n3,  t = t1 + n1*t2 + n1*n2*t3,  i = i1*n2*n3 + i2*n3 + i3

  y[t] = sum_i3 W3[t3,i3] * TB1[t1,i3]*TB2[t2,i3]
         * sum_i2 W2[t2,i2] * TA[t1,i2]
           * sum_i1 W1[t1,i1] * c[i1,i2,i3]

  W1[t1,i1] = w_n1^(t1*i1) * (s^(n2*n3))^i1      (coset fold, step 1)
  TA[t1,i2] = w_(n1*n2)^(t1*i2)                  (twiddle 1->2)
  W2[t2,i2] = w_n2^(t2*i2) * (s^n3)^i2           (coset fold, step 2)
  TB1[t1,i3] = w_N^(t1*i3); TB2[t2,i3] = w_(n2*n3)^(t2*i3)  (twiddle 2->3)
  W3[t3,i3] = w_n3^(t3*i3) * s^i3                (coset fold, step 3)

With (n2, n3) = (128, 128) every contraction is one 128-deep MXU pass:
effective MACs per output = ceil(n1z/128)*128 + n2 + n3 = 384 at the
2^20 flagship (vs 2048 two-step, 512 at the 2^16 flagship), all int8
s8xs8->s32 exact (per-contraction lengths far below the 2^17 bound).

Kernel layout per (poly, t1-tile) macro step (grid (k, n1/tt1, tt1/rb),
phases ip of the 3rd axis share the VMEM scratch):
  phase 0: step-1 digit dot (tt1, n1z)x(n1z, n3*n2) over the column
    order j = i3*n2 + i2 (the wrapper pre-permutes the coefficients so
    i2 is lane-minor), TA twiddle (lane-tiled over i3), offset-form into
    the A' scratch (tt1*n3, n2); step-2 digit dot (tt1*n3, n2)x(n2, n2)
    contracting the minor i2 axis in ONE flat matmul, TB twiddles,
    offset-form into the B scratch (tt1*n3, n2);
  every phase: step-3 digit dots W3 (n3, n3) x B_r (n3, n2) for the rb
    rows of this phase (i3 is sublane-major per row, so no transpose),
    writing the (t3, t2) output tile of each row.

Output memory layout is (k, n1*n3, n2) = (t1, t3, t2); the natural
codeword index m = t1 + n1*t2 + n1*n2*t3 maps to mem (t1*n3 + t3)*n2
+ t2 — absorbed by natural_perm3_from_mem / leaf_perm3_from_mem exactly
like the two-step kernel's (t1, t2) layout (fri/oracle.py from_coeffs).

HBM traffic per poly: read c once per t1-tile (n1/tt1 * n words), tiny
factored twiddle/weight tables, write 8n — the same ~12n-word profile as
the two-step kernel (BASELINE.md roofline).

Reference semantics: field/src/fft.rs:169 zero-pad stage-skip coset LDE
(the stage-skip is the zero-padded i1 contraction of step 1).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import gl64
from ..field.goldilocks import GF
from ..utils.bits import reverse_index_bits_perm
from .mxu_ntt_pallas import NUM_BUCKETS, NUM_DIGITS, P, recombine_buckets
from .mxu_lde_pallas import (PLANE_DTYPE, _offset_form, _plane, _pow_matrix,
                             matrix_digits)
from .poseidon_pallas import _fmul

U32 = jnp.uint32
# t1 rows per macro step: 128 would be one full MXU M pass, but the
# Mosaic TPU backend crashes compiling the (tt1, n3*n2) -> (tt1*n3, n2)
# relayout at tt1 = 128 (tools round-5 sweep); 64 compiles and runs
DEF_TT1 = 64
DEF_RB = 8           # step-3 rows per grid phase


def pick_n2_n3(log_n: int, rate_bits: int) -> tuple:
    """(n2, n3) for the three-step split: 128/128 keeps every contraction
    a single 128-deep MXU pass.  Preconditions for using this kernel at
    all: N >= 2^21 (so n1 >= tt1 = 128) and n2*n3 | n."""
    return (128, 128)


def use_mxu_lde3(log_n: int, rate_bits: int) -> bool:
    n2, n3 = pick_n2_n3(log_n, rate_bits)
    n = 1 << log_n
    big_n = n << rate_bits
    return (n % (n2 * n3) == 0 and big_n // (n2 * n3) >= DEF_TT1
            and n // (n2 * n3) >= 1)


@lru_cache(maxsize=16)
def _lde3_tables(log_n: int, rate_bits: int, shift: int, n2: int, n3: int,
                 dtype=None):
    """Host-precomputed digit planes + twiddle limbs for one shape."""
    dtype = PLANE_DTYPE if dtype is None else dtype
    n = 1 << log_n
    big_n = n << rate_bits
    n23 = n2 * n3
    n1 = big_n // n23
    n1z = n // n23
    assert n % n23 == 0 and n2 % 128 == 0 and n3 % 128 == 0, (n, n2, n3)
    if dtype == jnp.int8:
        assert max(n1z, n2, n3) <= (1 << 17)
    else:
        assert max(n1z, n2, n3) <= 512
    w_n1 = gl64.primitive_root_of_unity(int(np.log2(n1)))
    w_n2 = gl64.primitive_root_of_unity(int(np.log2(n2)))
    w_n3 = gl64.primitive_root_of_unity(int(np.log2(n3)))
    w_n1n2 = gl64.primitive_root_of_unity(int(np.log2(n1 * n2)))
    w_n2n3 = gl64.primitive_root_of_unity(int(np.log2(n23)))
    w_big = gl64.primitive_root_of_unity(log_n + rate_bits)

    t1 = np.arange(n1)
    t2 = np.arange(n2)
    t3 = np.arange(n3)

    # W1[t1, i1] = w_n1^(t1 i1) * (s^(n2 n3))^i1
    w1 = _pow_matrix(w_n1, t1, np.arange(n1z), n1)
    w1 = gl64.mul(w1, gl64.powers(pow(shift, n23, P), n1z)[None, :])
    w1d = matrix_digits(w1, dtype)                            # (8, n1, n1z)

    # W2[t2, i2] = w_n2^(t2 i2) * (s^n3)^i2, transposed to (i2, t2)
    w2 = _pow_matrix(w_n2, t2, np.arange(n2), n2)
    w2 = gl64.mul(w2, gl64.powers(pow(shift, n3, P), n2)[None, :])
    w2dt = matrix_digits(w2.T, dtype)                         # (8, n2, n2)

    # W3[t3, i3] = w_n3^(t3 i3) * s^i3, kept (t3, i3) for lhs dots
    w3 = _pow_matrix(w_n3, t3, np.arange(n3), n3)
    w3 = gl64.mul(w3, gl64.powers(shift, n3)[None, :])
    w3d = matrix_digits(w3, dtype)                            # (8, n3, n3)

    def np_limbs(x):
        x = np.asarray(x, np.uint64)
        return ((x & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                (x >> np.uint64(32)).astype(np.uint32))

    # TA[t1, i2] = w_(n1 n2)^(t1 i2)
    ta = GF(*np_limbs(_pow_matrix(w_n1n2, t1, t2, n1 * n2)))  # (n1, n2)
    # TB1[t1, i3] = w_N^(t1 i3), stored (n1, n3, 1) for minor broadcast
    tb1 = _pow_matrix(w_big, t1, t3, big_n)[:, :, None]
    tb1 = GF(*np_limbs(tb1))                                  # (n1, n3, 1)
    # TB2[t2, i3] = w_(n2 n3)^(t2 i3), stored transposed (i3, t2)
    tb2 = GF(*np_limbs(_pow_matrix(w_n2n3, t2, t3, n23).T))   # (n3, n2)
    return w1d, w2dt, w3d, ta, tb1, tb2, n1, n1z


# ------------------------------------------------------------ output perms

@lru_cache(maxsize=16)
def natural_perm3_from_mem(log_n: int, rate_bits: int, n2: int,
                           n3: int) -> np.ndarray:
    """perm with natural[m] = mem.flat[perm[m]] for the (t1, t3, t2)
    memory layout (m = t1 + n1*t2 + n1*n2*t3)."""
    big_n = 1 << (log_n + rate_bits)
    n1 = big_n // (n2 * n3)
    m = np.arange(big_n)
    t1 = m % n1
    t2 = (m // n1) % n2
    t3 = m // (n1 * n2)
    return (t1 * n3 + t3) * n2 + t2


@lru_cache(maxsize=16)
def leaf_perm3_from_mem(log_n: int, rate_bits: int, n2: int,
                        n3: int) -> np.ndarray:
    nat = natural_perm3_from_mem(log_n, rate_bits, n2, n3)
    rev = reverse_index_bits_perm(1 << (log_n + rate_bits))
    return nat[rev]


# ------------------------------------------------------------------ kernel

def _planes_dot(wplanes, ylo, yhi, contract_right: bool):
    """64 digit-pair MXU dots + bucket recombination over OFFSET-FORM
    limbs (the caller already ran _offset_form — A'/B scratches are kept
    in digit-extractable form exactly like the two-step kernel)."""
    dtype = wplanes[0].dtype
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32
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


def _lde3_kernel(w1_ref, w2t_ref, w3_ref, talo_ref, tahi_ref,
                 tb1lo_ref, tb1hi_ref, tb2lo_ref, tb2hi_ref,
                 clo_ref, chi_ref, out_lo_ref, out_hi_ref,
                 alo_ref, ahi_ref, blo_ref, bhi_ref,
                 *, tt1: int, rb: int, n2: int, n3: int):
    ip = pl.program_id(2)

    @pl.when(ip == 0)
    def _():
        # ---- step 1: tall digit matmul over i1 (columns j = i3*n2 + i2)
        w1 = w1_ref[...]                                  # (8, tt1, n1z)
        ylo, yhi = _offset_form(clo_ref[0], chi_ref[0])
        lo, hi = _planes_dot([w1[d] for d in range(NUM_DIGITS)],
                             ylo, yhi, contract_right=False)
        # TA twiddle: TA[t1, i2] broadcast over the i3 sublane blocks
        lo = lo.reshape(tt1, n3, n2)
        hi = hi.reshape(tt1, n3, n2)
        lo, hi = _fmul(lo, hi, talo_ref[...][:, None, :],
                       tahi_ref[...][:, None, :])
        ylo, yhi = _offset_form(lo, hi)
        alo_ref[...] = ylo.reshape(tt1 * n3, n2)
        ahi_ref[...] = yhi.reshape(tt1 * n3, n2)

        # ---- step 2: one flat digit matmul contracting the minor i2 axis
        w2t = w2t_ref[...]                                # (8, n2, n2)
        lo, hi = _planes_dot([w2t[d] for d in range(NUM_DIGITS)],
                             alo_ref[...], ahi_ref[...], contract_right=True)
        # TB twiddles: TB2[i3, t2] (broadcast over t1), TB1[t1, i3, 1]
        lo = lo.reshape(tt1, n3, n2)
        hi = hi.reshape(tt1, n3, n2)
        lo, hi = _fmul(lo, hi, tb2lo_ref[...][None, :, :],
                       tb2hi_ref[...][None, :, :])
        lo, hi = _fmul(lo, hi, tb1lo_ref[...], tb1hi_ref[...])
        ylo, yhi = _offset_form(lo, hi)
        blo_ref[...] = ylo.reshape(tt1 * n3, n2)
        bhi_ref[...] = yhi.reshape(tt1 * n3, n2)

    # ---- step 3: per-row (i3, t2) digit matmuls for this phase's rows
    w3 = w3_ref[...]                                      # (8, n3, n3)
    w3l = [w3[d] for d in range(NUM_DIGITS)]
    for j in range(rb):
        row0 = (ip * rb + j) * n3
        olo, ohi = _planes_dot(w3l, blo_ref[pl.ds(row0, n3), :],
                               bhi_ref[pl.ds(row0, n3), :],
                               contract_right=False)
        out_lo_ref[0, j * n3:(j + 1) * n3, :] = olo
        out_hi_ref[0, j * n3:(j + 1) * n3, :] = ohi


@partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def mxu_lde3(coeffs: GF, rate_bits: int, shift: int = 7, n2: int = 0,
             n3: int = 0, tt1: int = DEF_TT1, rb: int = DEF_RB) -> GF:
    """Coset LDE of (k, n) coefficients -> (k, n1*n3, n2) evaluations in
    (t1, t3, t2) three-step layout (see natural_perm3_from_mem)."""
    k, n = coeffs.shape
    log_n = int(np.log2(n))
    assert 1 << log_n == n
    if n2 == 0 or n3 == 0:
        n2, n3 = pick_n2_n3(log_n, rate_bits)
    w1d, w2dt, w3d, ta, tb1, tb2, n1, n1z = _lde3_tables(
        log_n, rate_bits, shift, n2, n3)
    tt1 = min(tt1, n1)
    assert n1 % tt1 == 0 and tt1 % rb == 0
    n23 = n2 * n3

    # column order j = i3*n2 + i2 (i2 lane-minor for the step-2 contraction)
    c4 = coeffs.reshape(k, n1z, n2, n3)
    c3 = GF(jnp.swapaxes(c4.lo, 2, 3).reshape(k, n1z, n23),
            jnp.swapaxes(c4.hi, 2, 3).reshape(k, n1z, n23))

    grid = (k, n1 // tt1, tt1 // rb)
    nd = NUM_DIGITS

    w1_spec = pl.BlockSpec((nd, tt1, n1z), lambda ik, it, ip: (0, it, 0))
    w2_spec = pl.BlockSpec((nd, n2, n2), lambda ik, it, ip: (0, 0, 0))
    w3_spec = pl.BlockSpec((nd, n3, n3), lambda ik, it, ip: (0, 0, 0))
    ta_spec = pl.BlockSpec((tt1, n2), lambda ik, it, ip: (it, 0))
    tb1_spec = pl.BlockSpec((tt1, n3, 1), lambda ik, it, ip: (it, 0, 0))
    tb2_spec = pl.BlockSpec((n3, n2), lambda ik, it, ip: (0, 0))
    c_spec = pl.BlockSpec((1, n1z, n23), lambda ik, it, ip: (ik, 0, 0))
    out_spec = pl.BlockSpec(
        (1, rb * n3, n2),
        lambda ik, it, ip, _p=tt1 // rb: (ik, it * _p + ip, 0))

    out_lo, out_hi = pl.pallas_call(
        partial(_lde3_kernel, tt1=tt1, rb=rb, n2=n2, n3=n3),
        grid=grid,
        in_specs=[w1_spec, w2_spec, w3_spec, ta_spec, ta_spec,
                  tb1_spec, tb1_spec, tb2_spec, tb2_spec, c_spec, c_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((k, n1 * n3, n2), jnp.uint32),
                   jax.ShapeDtypeStruct((k, n1 * n3, n2), jnp.uint32)],
        scratch_shapes=[pltpu.VMEM((tt1 * n3, n2), jnp.uint32),
                        pltpu.VMEM((tt1 * n3, n2), jnp.uint32),
                        pltpu.VMEM((tt1 * n3, n2), jnp.uint32),
                        pltpu.VMEM((tt1 * n3, n2), jnp.uint32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 2**20),
    )(w1d, w2dt, w3d, ta.lo, ta.hi, tb1.lo, tb1.hi, tb2.lo, tb2.hi,
      c3.lo, c3.hi)
    return GF(out_lo, out_hi)


# ------------------------------------------------------------------- twin

def mxu_lde3_jnp(coeffs: GF, rate_bits: int, shift: int = 7, n2: int = 0,
                 n3: int = 0) -> GF:
    """Pure-jnp twin (CPU-testable, same digit/recombination numerics)."""
    k, n = coeffs.shape
    log_n = int(np.log2(n))
    if n2 == 0 or n3 == 0:
        n2, n3 = pick_n2_n3(log_n, rate_bits)
    w1d, w2dt, w3d, ta, tb1, tb2, n1, n1z = _lde3_tables(
        log_n, rate_bits, shift, n2, n3)
    n23 = n2 * n3

    c4 = coeffs.reshape(k, n1z, n2, n3)
    c3 = GF(jnp.swapaxes(c4.lo, 2, 3).reshape(k, n1z, n23),
            jnp.swapaxes(c4.hi, 2, 3).reshape(k, n1z, n23))
    # step 1: contract i1 -> A[t1, (k, i3, i2)]
    x = GF(jnp.transpose(c3.lo, (1, 0, 2)).reshape(n1z, k * n23),
           jnp.transpose(c3.hi, (1, 0, 2)).reshape(n1z, k * n23))
    ylo, yhi = _offset_form(x.lo, x.hi)
    lo, hi = _planes_dot(list(w1d), ylo, yhi, contract_right=False)
    a = GF(lo.reshape(n1, k, n3, n2), hi.reshape(n1, k, n3, n2))
    a = a * GF(ta.lo, ta.hi).reshape(n1, 1, 1, n2)
    # step 2: contract minor i2
    a2 = GF(a.lo.reshape(-1, n2), a.hi.reshape(-1, n2))
    ylo, yhi = _offset_form(a2.lo, a2.hi)
    lo, hi = _planes_dot(list(w2dt), ylo, yhi, contract_right=True)
    b = GF(lo.reshape(n1, k, n3, n2), hi.reshape(n1, k, n3, n2))
    b = b * GF(tb2.lo, tb2.hi).reshape(1, 1, n3, n2)
    b = b * GF(tb1.lo, tb1.hi).reshape(n1, 1, n3, 1)
    # step 3: contract i3 (sublane-major per (t1, poly) row block)
    b2 = GF(jnp.transpose(b.lo, (2, 0, 1, 3)).reshape(n3, -1),
            jnp.transpose(b.hi, (2, 0, 1, 3)).reshape(n3, -1))
    ylo, yhi = _offset_form(b2.lo, b2.hi)
    lo, hi = _planes_dot(list(w3d), ylo, yhi, contract_right=False)
    y = GF(lo.reshape(n3, n1, k, n2), hi.reshape(n3, n1, k, n2))
    return GF(jnp.transpose(y.lo, (2, 1, 0, 3)).reshape(k, n1 * n3, n2),
              jnp.transpose(y.hi, (2, 1, 0, 3)).reshape(k, n1 * n3, n2))
