import sys; sys.path.insert(0, "/root/repo")
"""Canonical vs fast-partial-round Poseidon schedule on TPU."""
import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from plonky2_tpu.field import gl64
from plonky2_tpu.field.goldilocks import GF
from plonky2_tpu.hash.poseidon import permute, permute_np
from plonky2_tpu.plonk.gates.base import BaseBatchCtx
from plonky2_tpu.plonk.gates.poseidon_gate import poseidon_fast_g

B, REPS = 1 << 17, 10

@jax.jit
def chain_canonical(seed):
    base = jax.lax.broadcasted_iota(jnp.uint32, (B, 12), 0)
    st = GF(base * jnp.uint32(2654435761) + seed, base ^ jnp.uint32(0x9E3779B9))
    def body(i, s):
        out = permute(s)
        return GF(out.lo, out.hi + jnp.uint32(1))
    s = jax.lax.fori_loop(0, REPS, body, st)
    return s.lo.sum() + s.hi.sum()

ctx = BaseBatchCtx()

@jax.jit
def chain_fast(seed):
    base = jax.lax.broadcasted_iota(jnp.uint32, (B, 12), 0)
    st = GF(base * jnp.uint32(2654435761) + seed, base ^ jnp.uint32(0x9E3779B9))
    def body(i, s):
        lanes = [s[:, k] for k in range(12)]
        out = poseidon_fast_g(ctx, lanes)
        out = GF.stack(out, axis=1)
        return GF(out.lo, out.hi + jnp.uint32(1))
    s = jax.lax.fori_loop(0, REPS, body, st)
    return s.lo.sum() + s.hi.sum()

# correctness of fast schedule on device
rng = np.random.default_rng(0)
x = rng.integers(0, (1 << 64) - 1, size=(256, 12), dtype=np.uint64)
g = GF.from_u64(x)
lanes = [g[:, k] for k in range(12)]
fast = GF.stack(poseidon_fast_g(ctx, lanes), axis=1).to_u64()
print("fast == canonical:", np.array_equal(gl64.to_canonical(fast),
                                           gl64.to_canonical(permute_np(x))))

for name, f in (("canonical", chain_canonical), ("fast", chain_fast)):
    _ = jax.device_get(f(jnp.uint32(1)))
    t = time.perf_counter()
    _ = jax.device_get(f(jnp.uint32(2)))
    dt = (time.perf_counter() - t) / REPS
    print(f"{name:10s}: {dt*1e3:8.3f} ms/step, {B/dt/1e6:7.2f} M perms/s")
