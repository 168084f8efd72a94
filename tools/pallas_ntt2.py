import sys; sys.path.insert(0, "/root/repo")
"""Pallas four-step NTT, v2: butterflies as sublane rolls + selects (no
reshape/stack relayouts), multiple tiles per kernel call."""
import time
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.goldilocks import GF, fadd, fsub, fmul
from plonky2_tpu.utils.bits import reverse_index_bits_perm

LOG_N = 16
N = 1 << LOG_N
LOG_N1 = 8
LOG_N2 = LOG_N - LOG_N1
N1, N2 = 1 << LOG_N1, 1 << LOG_N2
TILES = 4  # tiles per kernel invocation


def host_tables():
    br1 = reverse_index_bits_perm(N1)
    br2 = reverse_index_bits_perm(N2)
    flat_perm = (br2[:, None] * N1 + br1[None, :]).reshape(-1)

    def row_twiddles(log_n):
        """tw_row[s-1, r] = w_s^(r mod 2^(s-1)) — per-row twiddle columns."""
        rows = 1 << log_n
        tabs = np.zeros((log_n, rows), dtype=np.uint64)
        for s in range(1, log_n + 1):
            half = 1 << (s - 1)
            root = gl64.primitive_root_of_unity(s)
            pw = gl64.powers(root, half)
            tabs[s - 1] = np.tile(pw, rows // half)
        return tabs

    tw2 = row_twiddles(LOG_N2)
    tw1 = row_twiddles(LOG_N1)

    w = gl64.primitive_root_of_unity(LOG_N)
    tw_mid = np.empty((N2, N1), dtype=np.uint64)
    for c in range(N1):
        tw_mid[:, c] = gl64.powers(pow(w, int(br1[c]), gl64.ORDER_INT), N2)
    return flat_perm, tw2, tw1, tw_mid


def split(x64):
    return ((x64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (x64 >> np.uint64(32)).astype(np.uint32))


def _stages_roll(lo, hi, twlo, twhi, log_n):
    """DIT butterflies along axis -2 via rolls+selects. lo/hi: (..., rows, cols).
    For row r with block-bit b = (r >> (s-1)) & 1:
      b=0: out = x[r] + w[r] * x[r+half]
      b=1: out = x[r-half] - w[r] * x[r]        (w[r] = w[r mod half])
    """
    rows = lo.shape[-2]
    rbit = jax.lax.broadcasted_iota(jnp.uint32, lo.shape, lo.ndim - 2)
    for s in range(1, log_n + 1):
        half = 1 << (s - 1)
        bit = (rbit >> jnp.uint32(s - 1)) & jnp.uint32(1)
        wlo = jnp.broadcast_to(twlo[s - 1].reshape(rows, 1), lo.shape)
        whi = jnp.broadcast_to(twhi[s - 1].reshape(rows, 1), hi.shape)
        rows_n = lo.shape[-2]
        down_lo = pltpu.roll(lo, rows_n - half, lo.ndim - 2)
        down_hi = pltpu.roll(hi, rows_n - half, hi.ndim - 2)
        up_lo = pltpu.roll(lo, half, lo.ndim - 2)
        up_hi = pltpu.roll(hi, half, hi.ndim - 2)
        # b=0: x + w*down ; b=1: up - w*x
        blo = jnp.where(bit == 0, down_lo, lo)
        bhi = jnp.where(bit == 0, down_hi, hi)
        tlo, thi = fmul(blo, bhi, wlo, whi)
        alo = jnp.where(bit == 0, lo, up_lo)
        ahi = jnp.where(bit == 0, hi, up_hi)
        plo, phi = fadd(alo, ahi, tlo, thi)
        qlo, qhi = fsub(alo, ahi, tlo, thi)
        lo = jnp.where(bit == 0, plo, qlo)
        hi = jnp.where(bit == 0, phi, qhi)
    return lo, hi


def _kernel(xl, xh, t2l, t2h, t1l, t1h, tml, tmh, ol, oh):
    lo = xl[:]   # (TILES, N2, N1)
    hi = xh[:]
    lo, hi = _stages_roll(lo, hi, t2l, t2h, LOG_N2)
    lo, hi = fmul(lo, hi, jnp.broadcast_to(tml[:], lo.shape),
                  jnp.broadcast_to(tmh[:], hi.shape))
    lo = jnp.swapaxes(lo, -1, -2)
    hi = jnp.swapaxes(hi, -1, -2)
    lo, hi = _stages_roll(lo, hi, t1l, t1h, LOG_N1)
    ol[:] = lo
    oh[:] = hi


@jax.jit
def pallas_ntt(xlo, xhi, flat_perm, t2l, t2h, t1l, t1h, tml, tmh):
    b = xlo.shape[0]
    assert b % TILES == 0
    plo = jnp.take(xlo, flat_perm, axis=-1).reshape(b, N2, N1)
    phi = jnp.take(xhi, flat_perm, axis=-1).reshape(b, N2, N1)
    in_spec = pl.BlockSpec((TILES, N2, N1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((TILES, N1, N2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    olo, ohi = pl.pallas_call(
        _kernel,
        grid=(b // TILES,),
        in_specs=[in_spec, in_spec, full(t2l), full(t2h), full(t1l),
                  full(t1h), full(tml), full(tmh)],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, N1, N2), jnp.uint32)] * 2,
    )(plo, phi, t2l, t2h, t1l, t1h, tml, tmh)
    return olo.reshape(b, N), ohi.reshape(b, N)


flat_perm, tw2, tw1, tw_mid = host_tables()
CONSTS = [jnp.asarray(v) for v in
          (flat_perm.astype(np.int32), *split(tw2), *split(tw1), *split(tw_mid))]

rng = np.random.default_rng(0)
B = 8
x = rng.integers(0, gl64.ORDER_INT, size=(B, N), dtype=np.uint64)
expect = gl64.to_canonical(ntt.ntt(GF.from_u64(x)).to_u64())
olo, ohi = pallas_ntt(*[jnp.asarray(v) for v in split(x)], *CONSTS)
got = gl64.to_canonical((np.asarray(ohi).astype(np.uint64) << np.uint64(32))
                        | np.asarray(olo).astype(np.uint64))
print("match:", np.array_equal(got, expect))

B, REPS = 64, 16

@jax.jit
def chain_pallas(seed):
    base = jax.lax.broadcasted_iota(jnp.uint32, (B, N), 1)
    lo = base * jnp.uint32(2654435761) + seed
    hi = base ^ jnp.uint32(0x9E3779B9)
    def body(i, c):
        lo, hi = pallas_ntt(c[0], c[1], *CONSTS)
        return (lo, hi + jnp.uint32(1))
    lo, hi = jax.lax.fori_loop(0, REPS, body, (lo, hi))
    return lo.sum() + hi.sum()

_ = jax.device_get(chain_pallas(jnp.uint32(1)))
t = time.perf_counter()
_ = jax.device_get(chain_pallas(jnp.uint32(2)))
dt = (time.perf_counter() - t) / REPS
print(f"pallas v2: {dt*1e3:8.3f} ms/step, {B*N/dt/1e9:6.2f} G elems/s")
