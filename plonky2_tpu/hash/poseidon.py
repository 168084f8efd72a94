"""Poseidon permutation over Goldilocks, width 12, batched for TPU.

Structure mirrors the reference's *naive* (mathematically canonical) round
schedule (reference: plonky2/src/hash/poseidon.rs:574-636): 4 full rounds,
22 partial rounds (S-box on lane 0 only), 4 full rounds; every round is
constant-layer -> S-box -> circulant MDS.  The reference's "fast partial
round" reformulation (poseidon.rs:584) is a scalar-CPU optimisation that is
bit-identical in output; on TPU the circulant MDS vectorises cleanly across
the batch so the canonical schedule is the fast one.

MDS products use small-constant multiplies accumulated in a 96-bit (3x u32)
lane accumulator, reduced once per output element — the same
accumulate-then-reduce trick as the reference's u128 path (poseidon.rs:178).

The device path operates on GF arrays of shape (..., 12) and is fully
unrolled (30 rounds) for XLA to fuse; `plonky2_tpu.ops` can swap in a fused
Pallas kernel later without changing callers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import gl64
from ..field.goldilocks import (
    GF,
    ZERO32,
    mul32_wide,
    reduce128,
    _u32,
)
from . import poseidon_constants as C

_MASK32 = np.uint64(0xFFFFFFFF)
_RC_ARR = np.array(C.ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, 12)


def _round_consts() -> GF:
    # fresh GF per call: caching a device constant built inside a jit trace
    # would leak a tracer.
    return GF.from_u64(_RC_ARR)


def _sbox(x: GF) -> GF:
    """x^7 = x^3 * x^4 (2 squares + 2 muls)."""
    x2 = x.square()
    x4 = x2.square()
    x3 = x * x2
    return x3 * x4


def _mds(state: GF) -> GF:
    """Circulant-plus-diagonal MDS: out[r] = sum_i CIRC[i]*s[(r+i)%12] + DIAG[r]*s[r].

    Accumulates exact 96-bit sums in three u32 limbs, one reduction per lane.
    """
    lo, hi = state.lo, state.hi  # (..., 12)
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
        # contribution of CIRC[i]: state rotated left by i
        rl = jnp.roll(lo, -i, axis=-1)
        rh = jnp.roll(hi, -i, axis=-1)
        acc0, acc1, acc2 = acc_add(acc0, acc1, acc2, rl, rh, c)
    # diagonal: only DIAG[0] = 8 is nonzero — add 8*s[0] into lane 0
    d = C.MDS_MATRIX_DIAG[0]
    mask = jnp.zeros((12,), dtype=jnp.uint32).at[0].set(1)
    acc0, acc1, acc2 = acc_add(acc0, acc1, acc2, lo * mask, hi * mask, d)

    rlo, rhi = reduce128(ZERO32, acc2, acc1, acc0)
    return GF(rlo, rhi)


import jax


def _full_round(r, state: GF, rc: GF) -> GF:
    return _mds(_sbox(state + rc[r]))


def _partial_round(r, state: GF, rc: GF) -> GF:
    state = state + rc[r]
    s0 = _sbox(state[..., 0:1])
    state = GF.concatenate([s0, state[..., 1:]], axis=-1)
    return _mds(state)


def _pallas_batch_threshold() -> int:
    """Batch size from which permute dispatches to the fused column kernel.

    PLONKY2_TPU_POSEIDON_IMPL: "auto" (default: Pallas kernel on TPU for
    large batches), "jnp" (always the (..., 12) XLA path), "pallas"
    (kernel for any multiple-of-128 batch).  The (..., 12) layout uses 12
    of 128 VPU lanes; the kernel's (12, B) planar layout fills them.
    """
    import os
    impl = os.environ.get("PLONKY2_TPU_POSEIDON_IMPL", "auto")
    if impl == "jnp":
        return 1 << 62
    import jax as _jax
    if _jax.default_backend() == "cpu":
        return 1 << 62
    return 128 if impl == "pallas" else 1024


def _permute_via_cols(state: GF) -> GF:
    """(..., 12) -> column kernel roundtrip: transpose to (12, B) planar
    limbs, run the fused Pallas kernel, transpose back.

    The MDS layer defaults to the MXU byte-plane-dot variant — measured
    22.1 M perms/s vs 9.2 M for the sublane-roll variant on v5e
    (BASELINE.md round 4); PLONKY2_TPU_POSEIDON_MDS=roll restores the
    VPU path."""
    import os
    from ..ops.poseidon_pallas import permute_cols
    batch = state.shape[:-1]
    b = int(np.prod(batch)) if batch else 1
    tile = 1024 if b % 1024 == 0 else 128
    mds = os.environ.get("PLONKY2_TPU_POSEIDON_MDS", "mxu")
    lo = state.lo.reshape(b, 12).T
    hi = state.hi.reshape(b, 12).T
    olo, ohi = permute_cols(lo, hi, tile, False, mds)
    return GF(olo.T.reshape(*batch, 12), ohi.T.reshape(*batch, 12))


def permute(state: GF) -> GF:
    """Full 30-round Poseidon permutation on a (..., 12) GF state.

    Large batches on TPU dispatch to the fused Pallas column kernel
    (ops/poseidon_pallas.py); otherwise the fori-loop path runs.  The
    dispatch is resolved OUTSIDE any jit cache (this wrapper is not
    jitted), so flipping PLONKY2_TPU_POSEIDON_IMPL takes effect on the
    next direct call even for already-seen batch shapes; inside an outer
    jit trace the choice is frozen into that trace, as any Python-level
    branch is.
    """
    assert state.shape[-1] == 12
    batch = state.shape[:-1]
    b = int(np.prod(batch)) if batch else 1
    if b % 128 == 0 and b >= _pallas_batch_threshold():
        return _permute_via_cols(state)
    return _permute_fori(state)


@jax.jit
def _permute_fori(state: GF) -> GF:
    """fori_loop round pipeline (round constants dynamically indexed) —
    keeps the traced graph ~30x smaller than full unrolling; compile time
    matters because every distinct batch shape compiles once."""
    rc = _round_consts()
    state = jax.lax.fori_loop(
        0, C.HALF_N_FULL_ROUNDS, lambda r, s: _full_round(r, s, rc), state)
    state = jax.lax.fori_loop(
        C.HALF_N_FULL_ROUNDS, C.HALF_N_FULL_ROUNDS + C.N_PARTIAL_ROUNDS,
        lambda r, s: _partial_round(r, s, rc), state)
    state = jax.lax.fori_loop(
        C.HALF_N_FULL_ROUNDS + C.N_PARTIAL_ROUNDS, C.N_ROUNDS,
        lambda r, s: _full_round(r, s, rc), state)
    return state


# ---------------------------------------------------------------------------
# Host (numpy u64) twin — used by the challenger and witness generation.
# ---------------------------------------------------------------------------

_RC_NP = np.array(C.ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, 12)


def _sbox_np(x):
    x2 = gl64.mul(x, x)
    x4 = gl64.mul(x2, x2)
    return gl64.mul(gl64.mul(x, x2), x4)


def _mds_np(state):
    """state: (..., 12) u64.  96-bit exact accumulation on u32 half-limbs."""
    with np.errstate(over="ignore"):
        slo = state & _MASK32
        shi = state >> np.uint64(32)
        col_lo = np.zeros_like(state)
        col_hi = np.zeros_like(state)
        for i, c in enumerate(C.MDS_MATRIX_CIRC):
            cc = np.uint64(c)
            rl = np.roll(slo, -i, axis=-1)
            rh = np.roll(shi, -i, axis=-1)
            col_lo += rl * cc   # each term < 2^38; 13 terms < 2^42: exact
            col_hi += rh * cc
        d = np.uint64(C.MDS_MATRIX_DIAG[0])
        col_lo[..., 0] += slo[..., 0] * d
        col_hi[..., 0] += shi[..., 0] * d
        # value = col_lo + col_hi * 2^32  (< 2^75)
        lo = col_lo + (col_hi << np.uint64(32))
        carry = lo < col_lo
        hi = (col_hi >> np.uint64(32)) + carry
        return gl64.reduce128(hi, lo)


def permute_np(state: np.ndarray) -> np.ndarray:
    """Host Poseidon on (..., 12) u64 arrays (noncanonical in/out)."""
    state = np.asarray(state, dtype=np.uint64)
    assert state.shape[-1] == 12
    r = 0
    for _ in range(C.HALF_N_FULL_ROUNDS):
        state = _mds_np(_sbox_np(gl64.add(state, _RC_NP[r])))
        r += 1
    for _ in range(C.N_PARTIAL_ROUNDS):
        state = gl64.add(state, _RC_NP[r])
        state = state.copy()
        state[..., 0] = _sbox_np(state[..., 0])
        state = _mds_np(state)
        r += 1
    for _ in range(C.HALF_N_FULL_ROUNDS):
        state = _mds_np(_sbox_np(gl64.add(state, _RC_NP[r])))
        r += 1
    return state
