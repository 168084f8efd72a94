import sys; sys.path.insert(0, "/root/repo")
"""Prototype: four-step NTT as a single Pallas kernel per (n2, n1) tile.

Input is flat-gather pre-permuted so BOTH axes arrive bit-reversed; the
kernel runs DIT stages along the sublane axis twice with one in-VMEM
transpose, so each element touches HBM once in and once out.
"""
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


def host_tables():
    br1 = reverse_index_bits_perm(N1)
    br2 = reverse_index_bits_perm(N2)
    # tile[r, c] = x[br1[c] + N1 * br2[r]]
    flat_perm = (br2[:, None] * N1 + br1[None, :]).reshape(-1)

    def stage_tables(log_n):
        pad = max(1 << (log_n - 1), 128)
        tabs = np.zeros((log_n, pad), dtype=np.uint64)
        for s in range(1, log_n + 1):
            root = gl64.primitive_root_of_unity(s)
            tabs[s - 1, :1 << (s - 1)] = gl64.powers(root, 1 << (s - 1))
        return tabs

    tw2 = stage_tables(LOG_N2)
    tw1 = stage_tables(LOG_N1)

    # inter-step twiddles laid out as [k2, br-order j1]
    w = gl64.primitive_root_of_unity(LOG_N)
    tw_mid = np.empty((N2, N1), dtype=np.uint64)
    for c in range(N1):
        tw_mid[:, c] = gl64.powers(pow(w, int(br1[c]), gl64.ORDER_INT), N2)
    return flat_perm, tw2, tw1, tw_mid


def split(x64):
    return ((x64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (x64 >> np.uint64(32)).astype(np.uint32))


def _stages_axis0(lo, hi, twlo, twhi, log_n, rows):
    """DIT butterflies along axis 0; input rows bit-reversed."""
    for s in range(1, log_n + 1):
        half = 1 << (s - 1)
        nblocks = rows >> s
        lo2 = lo.reshape(nblocks, 2, half, lo.shape[-1])
        hi2 = hi.reshape(nblocks, 2, half, hi.shape[-1])
        alo, ahi = lo2[:, 0], hi2[:, 0]
        blo, bhi = lo2[:, 1], hi2[:, 1]
        wlo = jnp.broadcast_to(twlo[s - 1, :half].reshape(1, half, 1), blo.shape)
        whi = jnp.broadcast_to(twhi[s - 1, :half].reshape(1, half, 1), bhi.shape)
        tlo, thi = fmul(blo, bhi, wlo, whi)
        plo, phi = fadd(alo, ahi, tlo, thi)
        qlo, qhi = fsub(alo, ahi, tlo, thi)
        lo = jnp.stack([plo, qlo], axis=1).reshape(rows, -1)
        hi = jnp.stack([phi, qhi], axis=1).reshape(rows, -1)
    return lo, hi


def _kernel(xl, xh, t2l, t2h, t1l, t1h, tml, tmh, ol, oh):
    lo = xl[0]   # (N2, N1): rows br(j2), cols br(j1)
    hi = xh[0]
    lo, hi = _stages_axis0(lo, hi, t2l, t2h, LOG_N2, N2)   # -> [k2, br(j1)]
    lo, hi = fmul(lo, hi, tml[:], tmh[:])
    lo = lo.T
    hi = hi.T                                               # [br(j1), k2]
    lo, hi = _stages_axis0(lo, hi, t1l, t1h, LOG_N1, N1)    # -> [k1, k2]
    ol[0] = lo
    oh[0] = hi


@jax.jit
def pallas_ntt(xlo, xhi, flat_perm, t2l, t2h, t1l, t1h, tml, tmh):
    b = xlo.shape[0]
    plo = jnp.take(xlo, flat_perm, axis=-1).reshape(b, N2, N1)
    phi = jnp.take(xhi, flat_perm, axis=-1).reshape(b, N2, N1)
    in_spec = pl.BlockSpec((1, N2, N1), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, N1, N2), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    olo, ohi = pl.pallas_call(
        _kernel,
        grid=(b,),
        in_specs=[in_spec, in_spec, full(t2l), full(t2h), full(t1l),
                  full(t1h), full(tml), full(tmh)],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, N1, N2), jnp.uint32)] * 2,
    )(plo, phi, t2l, t2h, t1l, t1h, tml, tmh)
    # X[k2 + N2*k1] = C[k1, k2]: row-major flatten
    return olo.reshape(b, N), ohi.reshape(b, N)


def main():
    flat_perm, tw2, tw1, tw_mid = host_tables()
    rng = np.random.default_rng(0)
    B = 8
    x = rng.integers(0, gl64.ORDER_INT, size=(B, N), dtype=np.uint64)
    expect = gl64.to_canonical(ntt.ntt(GF.from_u64(x)).to_u64())

    args = [jnp.asarray(v) for v in
            (*split(x), flat_perm.astype(np.int32), *split(tw2), *split(tw1),
             *split(tw_mid))]
    t = time.time()
    olo, ohi = pallas_ntt(*args)
    olo, ohi = np.asarray(olo), np.asarray(ohi)
    print("compile+run", time.time() - t)
    got = gl64.to_canonical((ohi.astype(np.uint64) << np.uint64(32))
                            | olo.astype(np.uint64))
    print("match:", np.array_equal(got, expect))
    if not np.array_equal(got, expect):
        bad = np.argwhere(got != expect)
        print("mismatches:", len(bad), "first:", bad[:4])


if False and __name__ == "__main__":
    main()


def bench():
    import functools
    flat_perm, tw2, tw1, tw_mid = host_tables()
    consts = [jnp.asarray(v) for v in
              (flat_perm.astype(np.int32), *split(tw2), *split(tw1),
               *split(tw_mid))]
    B, REPS = 64, 16

    @jax.jit
    def chain_pallas(seed):
        base = jax.lax.broadcasted_iota(jnp.uint32, (B, N), 1)
        lo = base * jnp.uint32(2654435761) + seed
        hi = base ^ jnp.uint32(0x9E3779B9)
        def body(i, c):
            lo, hi = pallas_ntt(c[0], c[1], *consts)
            return (lo, hi + jnp.uint32(1))
        lo, hi = jax.lax.fori_loop(0, REPS, body, (lo, hi))
        return lo.sum() + hi.sum()

    @jax.jit
    def chain_xla(seed):
        base = jax.lax.broadcasted_iota(jnp.uint32, (B, N), 1)
        c = GF(base * jnp.uint32(2654435761) + seed, base ^ jnp.uint32(0x9E3779B9))
        def body(i, c):
            out = ntt.ntt(c)
            return GF(out.lo, out.hi + jnp.uint32(1))
        c = jax.lax.fori_loop(0, REPS, body, c)
        return c.lo.sum() + c.hi.sum()

    for name, f in (("pallas", chain_pallas), ("xla", chain_xla)):
        _ = jax.device_get(f(jnp.uint32(1)))
        t = time.perf_counter()
        _ = jax.device_get(f(jnp.uint32(2)))
        dt = (time.perf_counter() - t) / REPS
        print(f"{name:7s}: {dt*1e3:8.3f} ms/step, {B*N/dt/1e9:6.2f} G elems/s")
bench()
