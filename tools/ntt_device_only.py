import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.goldilocks import GF, fmul

BATCH, LOG_N, RATE = 64, 16, 3
N = 1 << LOG_N

@functools.partial(jax.jit, static_argnums=(0, 1))
def bench(kind, reps, seed):
    # generate data ON DEVICE: no host transfer beyond one scalar in/out
    base = jax.lax.broadcasted_iota(jnp.uint32, (BATCH, N), 1)
    lo = base * jnp.uint32(2654435761) + seed.astype(jnp.uint32)
    hi = base ^ jnp.uint32(0x9E3779B9)
    c = GF(lo, hi)
    def body(i, c):
        if kind == "lde":
            out = ntt.lde(c, RATE, shift=7)
        elif kind == "ntt":
            out = ntt.ntt(c)
        elif kind == "mul":
            out = GF(*fmul(c.lo, c.hi, c.lo, c.hi))
        elif kind == "stages":
            out = ntt.ntt_br(c)
        return GF(out.lo[..., :N], out.hi[..., :N] + jnp.uint32(1))
    c = jax.lax.fori_loop(0, reps, body, c)
    return (c.lo.astype(jnp.uint64).sum() + c.hi.astype(jnp.uint64).sum())

for kind in ("mul", "stages", "ntt", "lde"):
    for reps in (4, 32):
        s = jnp.uint32(1)
        _ = jax.device_get(bench(kind, reps, s))
        t = time.perf_counter()
        _ = jax.device_get(bench(kind, reps, jnp.uint32(2)))
        dt = time.perf_counter() - t
        out_elems = BATCH * (N << RATE if kind == "lde" else N)
        print(f"{kind:7s} reps {reps:3d}: {dt*1e3:9.2f} ms total, {dt/reps*1e3:8.3f} ms/step, {out_elems*reps/dt/1e9:7.2f} G elems/s")
