"""Where does the LDE's time go on the chip?  Breaks the 64 x 2^16 -> 2^19
coset-LDE into its memory passes and arithmetic, plus candidate primitives
for a four-step (axis-transposed) formulation.  All data is generated ON
DEVICE (the tunnel uploads host arrays at ~40 MB/s — a 268 MB device_put
would stall for minutes).  Run from repo root:
    python tools/ntt_profile2.py
"""
import sys; sys.path.insert(0, "/root/repo")
import time, functools
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.goldilocks import GF, fmul
from plonky2_tpu.utils.bits import reverse_index_bits_perm

BATCH, LOG_N, RATE = 64, 16, 3
N = 1 << LOG_N
BIG = N << RATE   # 2^19
BYTES = BATCH * BIG * 8  # (lo,hi) u32 pairs


def devgen(shape):
    """Pseudo-random GF array generated on device inside jit."""
    @jax.jit
    def gen():
        base = jax.lax.broadcasted_iota(jnp.uint32, shape, len(shape) - 1)
        mix = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
        lo = base * jnp.uint32(2654435761) + mix * jnp.uint32(40503)
        hi = (base ^ jnp.uint32(0x9E3779B9)) * jnp.uint32(2246822519)
        # keep hi < 2^31 so values are < ORDER (valid noncanonical GF)
        return GF(lo, hi >> jnp.uint32(1))
    return gen()


def timeit(fn, x, reps=8, label="", bytes_per_step=None):
    @jax.jit
    def chain(c):
        def body(i, c):
            out = fn(c)
            return GF(out.lo.reshape(c.shape) + c.lo,
                      out.hi.reshape(c.shape) ^ jnp.uint32(1))
        return jax.lax.fori_loop(0, reps, body, c)
    o = chain(x); _ = jax.device_get(o.lo.ravel()[0])
    t = time.perf_counter()
    o = chain(x); _ = jax.device_get(o.lo.ravel()[0])
    dt = (time.perf_counter() - t) / reps
    bw = ""
    if bytes_per_step:
        bw = f"  ({bytes_per_step / dt / 1e9:7.1f} GB/s r+w-counted)"
    print(f"{label:34s} {dt*1e3:8.2f} ms{bw}", flush=True)
    return dt


big = devgen((BATCH, BIG))
print(f"array: {BATCH} x 2^{LOG_N + RATE} = {BYTES/1e6:.0f} MB (lo+hi)", flush=True)

# -- pure memory / arithmetic floors on the BIG array ----------------------
timeit(lambda c: GF(c.lo + jnp.uint32(3), c.hi ^ jnp.uint32(5)), big,
       label="elementwise u32 addxor", bytes_per_step=2 * BYTES)
timeit(lambda c: c + c, big, label="one GF add pass", bytes_per_step=2 * BYTES)
timeit(lambda c: GF(*fmul(c.lo, c.hi, c.lo, c.hi)), big,
       label="one GF mul pass", bytes_per_step=2 * BYTES)

# -- the production LDE and its pieces -------------------------------------
small = devgen((BATCH, N))

def lde_fn(c):
    out = ntt.lde(c, RATE, shift=7)
    return GF(out.lo[..., :N], out.hi[..., :N])
timeit(lde_fn, small, label=f"lde 2^{LOG_N}->2^{LOG_N+RATE} (prod)",
       bytes_per_step=2 * BYTES * 6)   # ~6 radix-8 passes

timeit(lambda c: c.take(np.asarray(reverse_index_bits_perm(BIG)), axis=-1),
       big, label="bit-rev gather 2^19", bytes_per_step=2 * BYTES)
timeit(lambda c: ntt.ntt_br(c), big, label="butterflies 2^19 (19 stages)")
timeit(lambda c: ntt.ntt_br(c, start_stage=RATE), big,
       label="butterflies 2^19 (stages 4..19)")

# -- stage-range breakdown on the big array --------------------------------
from plonky2_tpu.field.ntt import _butterflies
for (a, b) in [(3, 9), (9, 15), (15, 19)]:
    def stage_range(c, a=a, b=b):
        # run stages a+1..b only (cheat: call _butterflies with log_n=b)
        return _butterflies(c, b, a, False)
    timeit(stage_range, big, label=f"stages {a+1}..{b}",
           bytes_per_step=2 * BYTES * max(1, (b - a + 2) // 3))

# -- four-step primitives ---------------------------------------------------
N1, N2 = 1 << 10, 1 << 9   # 2^19 = 2^10 * 2^9
resh = lambda c: GF(c.lo.reshape(BATCH, N1, N2), c.hi.reshape(BATCH, N1, N2))
mat = resh(big)

timeit(lambda c: GF(jnp.swapaxes(c.lo, -1, -2), jnp.swapaxes(c.hi, -1, -2)),
       mat, label="transpose (b,1024,512)", bytes_per_step=2 * BYTES)

def col_butterflies(c):
    """Radix-2 DIT along axis -2 (size N1), vectorised over the contiguous
    N2 axis — no small-stride lane shuffles anywhere."""
    tw = ntt._stage_twiddles(10, False)
    x = c
    for s in range(1, 11):
        half = 1 << (s - 1)
        blocks = N1 >> s
        xr = x.reshape(BATCH, blocks, 2, half, N2)
        a = xr[..., 0, :, :]
        bb = xr[..., 1, :, :]
        w = GF.from_u64(tw[s - 1]).reshape(half, 1)
        t = bb * w
        x = GF.stack([a + t, a - t], axis=-3).reshape(BATCH, N1, N2)
    return x
timeit(col_butterflies, mat, label="col butterflies r2 (10 stages)",
       bytes_per_step=2 * BYTES * 10)

def col_butterflies_r8(c):
    """Same but radix-8 fused (3 stages per pass)."""
    tw = ntt._stage_twiddles(10, False)
    x = c
    s = 1
    while s <= 10:
        half = 1 << (s - 1)
        k = min(3, 10 - s + 1)
        nparts = 1 << k
        blocks = N1 >> (s + k - 1)
        xr = x.reshape(BATCH, blocks, nparts, half, N2)
        parts = [xr[..., p, :, :] for p in range(nparts)]
        for j in range(k):
            step = 1 << j
            w = tw[s + j - 1]
            new = list(parts)
            for p0 in range(0, nparts, 2 * step):
                for q in range(step):
                    pa, pb = p0 + q, p0 + q + step
                    wq = GF.from_u64(w[q * half:(q + 1) * half]).reshape(half, 1)
                    t = parts[pb] * wq
                    new[pa] = parts[pa] + t
                    new[pb] = parts[pa] - t
            parts = new
        x = GF.stack(parts, axis=-3).reshape(BATCH, N1, N2)
        s += k
    return x
timeit(col_butterflies_r8, mat, label="col butterflies r8 (10 stages)",
       bytes_per_step=2 * BYTES * 4)
