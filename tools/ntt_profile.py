import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.goldilocks import GF, fmul, fadd, fsub
from plonky2_tpu.utils.bits import reverse_index_bits_perm

BATCH, LOG_N, RATE = 64, 16, 3
N = 1 << LOG_N

def timeit(fn, x, reps=8, label=""):
    @functools.partial(jax.jit, static_argnums=())
    def chain(c):
        def body(i, c):
            out = fn(c)
            return GF(out.lo[..., :N], out.hi[..., :N])
        return jax.lax.fori_loop(0, reps, body, c)
    o = chain(x); _ = jax.device_get(o.lo)[0,0]
    t = time.perf_counter()
    o = chain(x); _ = jax.device_get(o.lo)[0,0]
    dt = (time.perf_counter()-t)/reps
    print(f"{label:28s} {dt*1e3:8.2f} ms/step")
    return dt

rng = np.random.default_rng(0)
x = jax.device_put(GF.from_u64(rng.integers(0, gl64.ORDER_INT, size=(BATCH,N), dtype=np.uint64)))

# full LDE
timeit(lambda c: ntt.lde(c, RATE, shift=7), x, label="lde (full, 8x)")
# plain same-size ntt (16 stages, no expand)
timeit(lambda c: ntt.ntt(c), x, label="ntt 2^16 (gather+stages)")
# gather only
perm = np.asarray(reverse_index_bits_perm(N))
timeit(lambda c: c.take(perm, axis=-1), x, label="bit-reversal gather")
# one fmul pass over the full array
timeit(lambda c: GF(*fmul(c.lo, c.hi, c.lo, c.hi)), x, label="one fmul pass")
# stages only (input already bit-reversed)
timeit(lambda c: ntt.ntt_br(c), x, label="butterfly stages only")
