"""Poseidon permutation throughput: jnp (..., 12) path vs the fused
column kernel (roll and MXU MDS variants), plus a Merkle-leaf-hash
composite.

Run from the repo root on the tunneled TPU: python tools/poseidon_bench2.py
Chained-jit methodology (see bench.py).
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

from plonky2_tpu.field import gl64
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.hash import poseidon as P
from plonky2_tpu.ops.poseidon_pallas import permute_cols

B = 1 << 17
REPS = 16


@functools.partial(jax.jit, static_argnums=(1, 2))
def cols_chain(seed, reps: int, mds_mode: str):
    lo = jax.lax.broadcasted_iota(jnp.uint32, (12, B), 1) + seed
    hi = jax.lax.broadcasted_iota(jnp.uint32, (12, B), 0) * jnp.uint32(7919)

    def body(i, c):
        lo, hi = permute_cols(c[0], c[1], 1024, False, mds_mode)
        return (lo, hi + jnp.uint32(1))

    lo, hi = jax.lax.fori_loop(0, reps, body, (lo, hi))
    return lo.sum() + hi.sum()


@functools.partial(jax.jit, static_argnums=(1,))
def jnp_chain(seed, reps: int):
    lo = jax.lax.broadcasted_iota(jnp.uint32, (B, 12), 1) + seed
    hi = jax.lax.broadcasted_iota(jnp.uint32, (B, 12), 0) * jnp.uint32(7919)
    st = GF(lo, hi)

    def body(i, s):
        out = P.permute(s)
        return GF(out.lo, out.hi + jnp.uint32(1))

    out = jax.lax.fori_loop(0, reps, body, st)
    return out.lo.sum() + out.hi.sum()


def timed(fn, *args):
    _ = jax.device_get(fn(jnp.uint32(1), *args))
    t0 = time.perf_counter()
    _ = jax.device_get(fn(jnp.uint32(2), *args))
    return time.perf_counter() - t0


def main():
    print(f"backend: {jax.default_backend()}  batch {B}  reps {REPS}",
          flush=True)
    # correctness spot-check of the pallas kernel on device
    rng = np.random.default_rng(0)
    st = rng.integers(0, (1 << 64) - 1, size=(256, 12), dtype=np.uint64)
    ref = gl64.to_canonical(P.permute_np(st.copy()))
    for mode in ("roll", "mxu"):
        lo = (st & np.uint64(0xFFFFFFFF)).astype(np.uint32).T.copy()
        hi = (st >> np.uint64(32)).astype(np.uint32).T.copy()
        olo, ohi = permute_cols(lo, hi, 128, False, mode)
        got = gl64.to_canonical(
            np.asarray(olo, np.uint64).T | (np.asarray(ohi, np.uint64).T
                                            << np.uint64(32)))
        print(f"kernel[{mode}] correctness: "
              f"{'OK' if np.array_equal(got, ref) else 'MISMATCH!'}",
              flush=True)

    import os
    os.environ["PLONKY2_TPU_POSEIDON_IMPL"] = "jnp"
    dt = timed(jnp_chain, REPS)
    print(f"jnp (...,12) : {B * REPS / dt / 1e6:7.2f} M perms/s", flush=True)

    for mode in ("roll", "mxu"):
        dt = timed(cols_chain, REPS, mode)
        print(f"pallas {mode:4s}  : {B * REPS / dt / 1e6:7.2f} M perms/s",
              flush=True)


if __name__ == "__main__":
    main()
