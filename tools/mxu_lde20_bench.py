"""Benchmark the LDE kernels at the 2^20-coeff flagship shape (the shape
the round-4 cap excluded from the MXU path): radix-8 vs the relaxed
two-step kernel (n2 = 1024) vs the three-step kernel (n2 = n3 = 128).

Run from the repo root on the tunneled TPU:
    python tools/mxu_lde20_bench.py [--batch 16] [--reps 4]
Chained-jit methodology (see bench.py).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.ops import mxu_lde3_pallas as M3
from plonky2_tpu.ops import mxu_lde_pallas as M

LOG_N, RATE_BITS = 20, 3
N = 1 << LOG_N
BIG_N = N << RATE_BITS


def _seed_coeffs(seed, batch):
    base = jax.lax.broadcasted_iota(jnp.uint32, (batch, N), 1)
    return GF(base * jnp.uint32(2654435761) + seed.astype(jnp.uint32),
              base ^ jnp.uint32(0x9E3779B9))


@functools.partial(jax.jit, static_argnums=(1, 2))
def radix_chain(seed, batch: int, reps: int):
    coeffs = _seed_coeffs(seed, batch)

    def body(i, c):
        out = ntt.lde(c, RATE_BITS, shift=7)
        return GF(out.lo[..., :N], out.hi[..., :N] + jnp.uint32(1))

    out = jax.lax.fori_loop(0, reps, body, coeffs)
    return out.lo.sum() + out.hi.sum()


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def mxu2_chain(seed, batch: int, reps: int, n2: int, tt1: int):
    coeffs = _seed_coeffs(seed, batch)

    def body(i, c):
        out = M.mxu_lde(c, RATE_BITS, 7, n2, tt1)
        lo = out.lo.reshape(batch, BIG_N)
        hi = out.hi.reshape(batch, BIG_N)
        return GF(lo[..., :N], hi[..., :N] + jnp.uint32(1))

    out = jax.lax.fori_loop(0, reps, body, coeffs)
    return out.lo.sum() + out.hi.sum()


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4, 5, 6))
def mxu3_chain(seed, batch: int, reps: int, n2: int, n3: int, tt1: int,
               rb: int):
    coeffs = _seed_coeffs(seed, batch)

    def body(i, c):
        out = M3.mxu_lde3(c, RATE_BITS, 7, n2, n3, tt1, rb)
        lo = out.lo.reshape(batch, BIG_N)
        hi = out.hi.reshape(batch, BIG_N)
        return GF(lo[..., :N], hi[..., :N] + jnp.uint32(1))

    out = jax.lax.fori_loop(0, reps, body, coeffs)
    return out.lo.sum() + out.hi.sum()


def timed(fn, *args):
    _ = jax.device_get(fn(jnp.uint32(1), *args))  # compile + warm
    t0 = time.perf_counter()
    _ = jax.device_get(fn(jnp.uint32(2), *args))
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    batch, reps = args.batch, args.reps
    print(f"backend: {jax.default_backend()}  shape: {batch}x2^{LOG_N} "
          f"rate {RATE_BITS}", flush=True)

    # correctness spot-check on device (2 polys vs the radix path)
    rng = np.random.default_rng(0)
    c = GF.from_u64(rng.integers(0, gl64.ORDER_INT, size=(2, N),
                                 dtype=np.uint64))
    ref = np.asarray(ntt.lde(c, RATE_BITS, shift=7).to_u64())
    refc = gl64.to_canonical(ref)

    dt = timed(radix_chain, batch, reps)
    print(f"radix-8            : {dt / reps * 1e3:8.2f} ms/LDE  "
          f"{batch * BIG_N * reps / dt / 1e9:5.2f} G elems/s", flush=True)

    for n2, tt1 in ((1024, 512), (1024, 256), (512, 512)):
        try:
            got = M.mxu_lde(c, RATE_BITS, 7, n2, tt1)
            mem = got.to_u64().reshape(2, BIG_N)
            nat = mem[:, M.natural_perm_from_mem(LOG_N, RATE_BITS, n2)]
            ok = np.array_equal(gl64.to_canonical(nat), refc)
            dt = timed(mxu2_chain, batch, reps, n2, tt1)
            print(f"mxu2 n2={n2:4d} t={tt1:3d}: {dt / reps * 1e3:8.2f} "
                  f"ms/LDE  {batch * BIG_N * reps / dt / 1e9:5.2f} G "
                  f"elems/s  {'OK' if ok else 'MISMATCH!'}", flush=True)
        except Exception as e:
            print(f"mxu2 n2={n2} tt1={tt1}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    for n2, n3, tt1, rb in ((128, 128, 128, 8), (128, 128, 128, 16),
                            (256, 128, 128, 8), (128, 256, 128, 8)):
        try:
            got = M3.mxu_lde3(c, RATE_BITS, 7, n2, n3, tt1, rb)
            mem = got.to_u64().reshape(2, BIG_N)
            nat = mem[:, M3.natural_perm3_from_mem(LOG_N, RATE_BITS, n2, n3)]
            ok = np.array_equal(gl64.to_canonical(nat), refc)
            dt = timed(mxu3_chain, batch, reps, n2, n3, tt1, rb)
            print(f"mxu3 {n2}/{n3} t={tt1} rb={rb:2d}: "
                  f"{dt / reps * 1e3:8.2f} ms/LDE  "
                  f"{batch * BIG_N * reps / dt / 1e9:5.2f} G elems/s  "
                  f"{'OK' if ok else 'MISMATCH!'}", flush=True)
        except Exception as e:
            print(f"mxu3 {n2}/{n3}/{tt1}/{rb}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
