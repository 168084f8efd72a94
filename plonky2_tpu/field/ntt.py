"""Number-theoretic transform over Goldilocks, batched for TPU.

TPU twin of the reference FFT (reference: field/src/fft.rs:52,99,169).  The
reference runs a radix-2 DIT with SIMD-packed butterflies; here each stage is
one fully-vectorised jnp pass over a (batch..., n) GF array, so XLA tiles the
butterflies onto the VPU and fuses the modular-arithmetic chains.  The input
is bit-reversed with a precomputed gather; stages use per-stage twiddle tables
uploaded once per size (host-exact, cached).

The zero-pad stage-skip trick for LDE (reference fft.rs:169 `r` parameter) is
`lde_coeffs` + `ntt_br_from_stage`: a power-of-two zero-padded input means the
first `rate_bits` stages only replicate values, so we expand with jnp.repeat
and start the butterfly loop at stage `rate_bits`.

Extension (GF2) codewords transform componentwise (twiddles are base-field).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax

import jax.numpy as jnp
import numpy as np

from ..utils.bits import log2_strict, reverse_index_bits_perm
from . import gl64
from .extension import GF2
from .goldilocks import GF


@lru_cache(maxsize=32)
def _stage_twiddles(log_n: int, inverse: bool) -> tuple:
    """Twiddles per stage: stage s (s=1..log_n) uses w_{2^s}^j for j < 2^(s-1).
    Cached as numpy (GF constants built inside a jit trace would leak tracers
    through the cache)."""
    out = []
    for s in range(1, log_n + 1):
        root = gl64.primitive_root_of_unity(s)
        if inverse:
            root = pow(root, (1 << s) - 1, gl64.ORDER_INT)
        out.append(gl64.powers(root, 1 << (s - 1)))
    return tuple(out)


def _brp_indices(n: int):
    # numpy (not jnp): a device array created inside a jit trace would leak
    # a tracer through the lru_cache in utils.bits.
    return reverse_index_bits_perm(n)


def _coset_powers(shift: int, n: int) -> GF:
    return GF.from_u64(gl64.powers(shift, n))


def _n_inv(n: int) -> GF:
    return GF.full((), pow(n, gl64.ORDER_INT - 2, gl64.ORDER_INT))


def _default_fused_stages() -> int:
    """Radix-8 passes on accelerators; plain radix-2 on the CPU backend,
    where LLVM's compile time explodes on the fused butterfly graphs
    (tests run on CPU; the TPU compiles radix-8 fine and runs ~1.6x faster).
    Override with PLONKY2_TPU_FUSED_STAGES for experiments."""
    import os
    env = os.environ.get("PLONKY2_TPU_FUSED_STAGES")
    if env:
        return int(env)
    try:
        import jax
        return 1 if jax.default_backend() == "cpu" else 3
    except Exception:
        return 1


MAX_FUSED_STAGES = _default_fused_stages()


def _butterflies(x: GF, log_n: int, start_stage: int, inverse: bool) -> GF:
    """Iterative Cooley-Tukey DIT on bit-reversed input.

    Up to MAX_FUSED_STAGES radix-2 stages are fused per elementwise pass
    (radix-8 by default): intermediate butterflies stay in registers, cutting
    HBM round-trips — the dominant cost of the radix-2 formulation on TPU."""
    n = 1 << log_n
    tw = _stage_twiddles(log_n, inverse)
    batch = x.shape[:-1]
    s = start_stage + 1
    while s <= log_n:
        half = 1 << (s - 1)
        k = min(MAX_FUSED_STAGES, log_n - s + 1)
        nparts = 1 << k
        blocks = n >> (s + k - 1)
        xr = x.reshape(*batch, blocks, nparts, half)
        parts = [xr[..., p, :] for p in range(nparts)]
        for j in range(k):  # stage s + j over the register-resident parts
            step = 1 << j
            w = tw[s + j - 1]  # (half << j,) twiddles of stage s+j
            new = list(parts)
            for p0 in range(0, nparts, 2 * step):
                for q in range(step):
                    pa, pb = p0 + q, p0 + q + step
                    wq = GF.from_u64(w[q * half:(q + 1) * half])
                    t = parts[pb] * wq
                    new[pa] = parts[pa] + t
                    new[pb] = parts[pa] - t
            parts = new
        x = GF.stack(parts, axis=-2).reshape(*batch, n)
        s += k
    return x


@partial(jax.jit, static_argnums=(1, 2))
def ntt_br(x: GF, start_stage: int = 0, inverse: bool = False) -> GF:
    """NTT of a bit-reversed-order input along the last axis."""
    return _butterflies(x, log2_strict(x.shape[-1]), start_stage, inverse)


@jax.jit
def ntt(coeffs: GF) -> GF:
    """values[i] = poly(g^i) over the order-n subgroup, natural order."""
    n = coeffs.shape[-1]
    x = coeffs.take(_brp_indices(n), axis=-1)
    return ntt_br(x)


@jax.jit
def intt(values: GF) -> GF:
    """Inverse NTT: values over subgroup -> coefficients."""
    n = values.shape[-1]
    x = values.take(_brp_indices(n), axis=-1)
    out = ntt_br(x, inverse=True)
    return out * _n_inv(n)


@partial(jax.jit, static_argnums=(1,))
def coset_ntt(coeffs: GF, shift: int) -> GF:
    """Evaluate on the coset shift*H: scale coeff j by shift^j, then NTT.
    (reference: field/src/polynomial/mod.rs `coset_fft`)"""
    n = coeffs.shape[-1]
    return ntt(coeffs * _coset_powers(shift, n))


@partial(jax.jit, static_argnums=(1,))
def coset_intt(values: GF, shift: int) -> GF:
    """Inverse of coset_ntt."""
    n = values.shape[-1]
    shift_inv = pow(shift, gl64.ORDER_INT - 2, gl64.ORDER_INT)
    return intt(values) * _coset_powers(shift_inv, n)


@partial(jax.jit, static_argnums=(1, 2))
def lde(coeffs: GF, rate_bits: int, shift: int = 1) -> GF:
    """Low-degree extension: evaluate degree<n coeffs on a 2^rate_bits larger
    (shifted) domain, skipping the first rate_bits butterfly stages
    (reference fft.rs:169 stage-skip for zero-padded input)."""
    n = coeffs.shape[-1]
    big_n = n << rate_bits
    scaled = coeffs * _coset_powers(shift, n) if shift != 1 else coeffs
    x = scaled.take(_brp_indices(n), axis=-1)
    # zero-padded input: first rate_bits stages replicate each element
    x = GF(jnp.repeat(x.lo, 1 << rate_bits, axis=-1),
           jnp.repeat(x.hi, 1 << rate_bits, axis=-1))
    return ntt_br(x, start_stage=rate_bits)


# -- extension-field wrappers (componentwise: twiddles are base field) -----

def ntt_ext(coeffs: GF2) -> GF2:
    return GF2(ntt(coeffs.a), ntt(coeffs.b))


def intt_ext(values: GF2) -> GF2:
    return GF2(intt(values.a), intt(values.b))


def coset_ntt_ext(coeffs: GF2, shift: int) -> GF2:
    return GF2(coset_ntt(coeffs.a, shift), coset_ntt(coeffs.b, shift))


def coset_intt_ext(values: GF2, shift: int) -> GF2:
    return GF2(coset_intt(values.a, shift), coset_intt(values.b, shift))


def lde_ext(coeffs: GF2, rate_bits: int, shift: int = 1) -> GF2:
    return GF2(lde(coeffs.a, rate_bits, shift), lde(coeffs.b, rate_bits, shift))
