import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from plonky2_tpu.field import gl64
from plonky2_tpu.field.goldilocks import GF, fmul

def chain_mul(reps):
    @jax.jit
    def f(c):
        def body(i, c):
            return GF(*fmul(c.lo, c.hi, c.lo, c.hi))
        return jax.lax.fori_loop(0, reps, body, c)
    return f

rng = np.random.default_rng(0)
for batch in (8, 64, 512):
    x = jax.device_put(GF.from_u64(rng.integers(0, gl64.ORDER_INT, size=(batch, 1<<16), dtype=np.uint64)))
    for reps in (4, 16):
        f = chain_mul(reps)
        o = f(x); _ = jax.device_get(o.lo)[0,0]
        t = time.perf_counter()
        o = f(x); _ = jax.device_get(o.lo)[0,0]
        dt = time.perf_counter()-t
        print(f"batch {batch:4d} reps {reps:3d}: total {dt*1e3:8.2f} ms  per-step {dt/reps*1e3:8.2f} ms")
