"""Benchmark the fused MXU LDE kernel vs the radix-8 production path.

Run from the repo root on the tunneled TPU:  python tools/mxu_lde_bench.py

Chained-jit methodology (see bench.py): REPS iterations inside one jit
with data dependencies, inputs generated on device, completion forced by
a scalar fetch.  Sweeps kernel variants (tt1 tile) and prints per-path
ms/LDE + G elems/s for the flagship shape (64 x 2^16 coeffs, rate 3).
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

from plonky2_tpu.field import ntt
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.ops import mxu_lde_pallas as M

BATCH, LOG_N, RATE_BITS = 64, 16, 3
N = 1 << LOG_N
BIG_N = N << RATE_BITS


def _seed_coeffs(seed):
    base = jax.lax.broadcasted_iota(jnp.uint32, (BATCH, N), 1)
    return GF(base * jnp.uint32(2654435761) + seed.astype(jnp.uint32),
              base ^ jnp.uint32(0x9E3779B9))


@functools.partial(jax.jit, static_argnums=(1,))
def radix_chain(seed, reps: int):
    coeffs = _seed_coeffs(seed)

    def body(i, c):
        out = ntt.lde(c, RATE_BITS, shift=7)
        return GF(out.lo[..., :N], out.hi[..., :N] + jnp.uint32(1))

    out = jax.lax.fori_loop(0, reps, body, coeffs)
    return out.lo.sum() + out.hi.sum()


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def mxu_chain(seed, reps: int, n2: int, tt1: int, dt=None):
    coeffs = _seed_coeffs(seed)

    def body(i, c):
        out = M.mxu_lde(c, RATE_BITS, 7, n2, tt1, dt)  # (k, n1, n2)
        lo = out.lo.reshape(BATCH, BIG_N)
        hi = out.hi.reshape(BATCH, BIG_N)
        return GF(lo[..., :N], hi[..., :N] + jnp.uint32(1))

    out = jax.lax.fori_loop(0, reps, body, coeffs)
    return out.lo.sum() + out.hi.sum()


def timed(fn, *args):
    _ = jax.device_get(fn(jnp.uint32(1), *args))  # compile + warm
    t0 = time.perf_counter()
    _ = jax.device_get(fn(jnp.uint32(2), *args))
    return time.perf_counter() - t0


def main():
    reps = 8
    print(f"backend: {jax.default_backend()}  shape: {BATCH}x2^{LOG_N} "
          f"rate {RATE_BITS}", flush=True)

    # correctness spot-check on device (tiny slice vs radix path)
    rng = np.random.default_rng(0)
    from plonky2_tpu.field import gl64
    c = GF.from_u64(rng.integers(0, gl64.ORDER_INT, size=(2, N),
                                 dtype=np.uint64))
    ref = np.asarray(ntt.lde(c, RATE_BITS, shift=7).to_u64())

    dt = timed(radix_chain, reps)
    ms = dt / reps * 1e3
    print(f"radix-8   : {ms:7.2f} ms/LDE  "
          f"{BATCH * BIG_N * reps / dt / 1e9:5.2f} G elems/s", flush=True)

    for pd in (jnp.int8, jnp.bfloat16):
        for n2 in (512, 256):
            for tt1 in (512, 256):
                n1 = BIG_N // n2
                if tt1 > n1:
                    continue
                try:
                    got = M.mxu_lde(c, RATE_BITS, 7, n2, tt1, pd)
                    mem = got.to_u64().reshape(2, BIG_N)
                    nat = mem[:, M.natural_perm_from_mem(LOG_N, RATE_BITS, n2)]
                    ok = np.array_equal(gl64.to_canonical(nat),
                                        gl64.to_canonical(ref))
                    dt = timed(mxu_chain, reps, n2, tt1, pd)
                    ms = dt / reps * 1e3
                    print(f"mxu {pd.__name__:8s} n2={n2:4d} tt1={tt1:4d}: "
                          f"{ms:7.2f} ms/LDE  "
                          f"{BATCH * BIG_N * reps / dt / 1e9:5.2f} G elems/s  "
                          f"{'OK' if ok else 'MISMATCH!'}", flush=True)
                except Exception as e:
                    print(f"mxu {pd.__name__} n2={n2} tt1={tt1}: FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
