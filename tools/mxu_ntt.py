"""MXU-based NTT prototype: four-step NTT with the small DFTs computed
as int8 digit matmuls on the systolic array.

Idea (tools/README next-attempt note): a length-N1 DFT is Y = W @ X with
W the (N1, N1) Goldilocks twiddle matrix.  Decompose both operands into
8 *balanced* base-256 digits (int8), so the Goldilocks product becomes
64 int8 x int8 -> int32 matmuls — all issued as ONE (8*N1, N1)x(N1, 8*M)
dot that the MXU eats natively — followed by a multiply-free
recombination of the 15 digit-product buckets mod p.

Balanced digits without a carry chain: for a centered representative
x' in (-p/2, p/2), y = x' + 0x8080..80 fits in u64 unwrapped, and
byte_k(y) - 128 are exactly the balanced digits of x'.

Bucket recombination: b_k (|b_k| < 2^25) are offset positive, split into
bytes, accumulated per byte-position, carry-normalised, packed into five
u32 words, and folded with the Goldilocks 2^64/2^96/2^128 identities —
shifts, adds and one constant subtraction; no multiplies.

Usage:  python tools/mxu_ntt.py          # correctness (any backend)
        python tools/mxu_ntt.py bench    # device-only timing on the TPU
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import functools

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.goldilocks import GF, add64, to_canonical

P = gl64.ORDER_INT
K_OFFSET = 0x8080808080808080
U32 = jnp.uint32


# ---------------------------------------------------------------- digits

# centering threshold: v <= T uses representative v, else v - p.  T is the
# largest v with v + K < 2^64; the band [p - K, T] where both work is
# nonempty, so every canonical v has a representative whose offset
# y = x' + K fits in u64 without wrapping.
T_CENTER = (1 << 64) - 1 - K_OFFSET
assert P - K_OFFSET <= T_CENTER


def _balanced_digits_host(vals: np.ndarray) -> np.ndarray:
    """(..., ) u64 -> (8, ...) int8 balanced digits of the centered
    representative."""
    v = gl64.to_canonical(np.asarray(vals, np.uint64))
    # y = centered + K computed in wrapping u64: exact since 0 <= y < 2^64
    with np.errstate(over="ignore"):
        y = np.where(v > T_CENTER, v - np.uint64(P), v) + np.uint64(K_OFFSET)
    shifts = (np.uint64(8) * np.arange(8, dtype=np.uint64)).reshape(
        8, *([1] * v.ndim))
    out = ((y[None] >> shifts) & np.uint64(255)).astype(np.int16) - 128
    assert out.min() >= -128 and out.max() <= 127
    return out.astype(np.int8)


def _balanced_digits_device(x: GF) -> jnp.ndarray:
    """GF (..., ) -> (8, ...) int8 balanced digits, vectorised on device."""
    lo, hi = to_canonical(x.lo, x.hi)
    # centered: subtract p when v > T_CENTER (two's-complement u32 limbs)
    p_lo, p_hi = U32(1), U32(0xFFFFFFFF)
    t_hi = U32(T_CENTER >> 32)
    t_lo = U32(T_CENTER & 0xFFFFFFFF)
    gt = (hi > t_hi) | ((hi == t_hi) & (lo > t_lo))
    slo = jnp.where(gt, lo - p_lo, lo)
    shi = jnp.where(gt, hi - p_hi - (lo < p_lo).astype(U32), hi)
    # y = centered + 0x8080..80 (cannot wrap for |x'| < p/2)
    ylo, yhi, _ = add64(slo, shi, U32(0x80808080), U32(0x80808080))
    digs = []
    for k in range(4):
        digs.append(((ylo >> U32(8 * k)) & U32(255)).astype(jnp.int16) - 128)
    for k in range(4):
        digs.append(((yhi >> U32(8 * k)) & U32(255)).astype(jnp.int16) - 128)
    return jnp.stack(digs).astype(jnp.int8)


# ------------------------------------------------------------ recombine

# byte positions 0..18 cover buckets 0..14 x bytes 0..3
_NUM_BUCKETS = 15
_NUM_POS = 18
_BUCKET_OFF = 1 << 26
# the offset added to every bucket, as a field constant to subtract
_OFF_CONST = sum(_BUCKET_OFF << (8 * k) for k in range(_NUM_BUCKETS)) % P


def _recombine(prod: jnp.ndarray) -> GF:
    """(8, N1, 8, M) int32 digit products -> GF (N1, M)."""
    buckets = []
    for k in range(_NUM_BUCKETS):
        b = None
        for d in range(8):
            e = k - d
            if 0 <= e < 8:
                t = prod[d, :, e, :]
                b = t if b is None else b + t
        buckets.append(b + jnp.int32(_BUCKET_OFF))  # now in [0, 2^27)
    # byte-position accumulation (u32, max ~4*255 per position)
    acc = [None] * _NUM_POS
    for k, b in enumerate(buckets):
        ub = b.astype(U32)
        for i in range(4):
            byte = (ub >> U32(8 * i)) & U32(255)
            pos = k + i
            acc[pos] = byte if acc[pos] is None else acc[pos] + byte
    # carry-normalise so each position is one byte
    carry = jnp.zeros_like(acc[0])
    bytes_ = []
    for pos in range(_NUM_POS):
        t = acc[pos] + carry
        bytes_.append(t & U32(255))
        carry = t >> U32(8)
    bytes_.append(carry & U32(255))      # position 18
    bytes_.append(carry >> U32(8))       # position 19 (tiny)
    while len(bytes_) < 20:
        bytes_.append(jnp.zeros_like(carry))
    # five u32 words
    w = []
    for j in range(5):
        w.append(bytes_[4 * j] | (bytes_[4 * j + 1] << U32(8))
                 | (bytes_[4 * j + 2] << U32(16))
                 | (bytes_[4 * j + 3] << U32(24)))
    # value = w0 + w1 2^32 + w2 2^64 + w3 2^96 + w4 2^128  (mod p)
    #       = (w0, w1) + w2 (2^32 - 1) - w3 - w4 2^32
    a = GF(w[0], w[1])
    b2 = GF(jnp.zeros_like(w[2]), w[2]) - GF(w[2], jnp.zeros_like(w[2]))
    c = GF(w[3], jnp.zeros_like(w[3]))
    d = GF(jnp.zeros_like(w[4]), w[4])
    off = GF.full((), _OFF_CONST).broadcast_to(w[0].shape)
    return a + b2 - c - d - off


# ---------------------------------------------------------------- dft

def _dft_matrix_digits(n1: int, inverse: bool = False) -> np.ndarray:
    """(8*n1, n1) int8: balanced digit planes of the DFT matrix."""
    g = gl64.primitive_root_of_unity(int(np.log2(n1)))
    if inverse:
        g = np.uint64(pow(int(g), P - 2, P))
    idx = np.arange(n1, dtype=np.uint64)
    # w[i,j] = g^(i*j mod n1)
    e = (idx[:, None] * idx[None, :]) % np.uint64(n1)
    pw = gl64.powers(int(g), n1)  # g^0..g^(n1-1)
    w = pw[e.astype(np.int64)]
    digs = _balanced_digits_host(w)          # (8, n1, n1)
    return np.ascontiguousarray(digs.reshape(8 * n1, n1))


def _mxu_dft(wd: jnp.ndarray, x: GF) -> GF:
    """DFT along axis 0 of x (N1, M) via one MXU matmul in bf16.

    Balanced digits (|d| <= 128) are exact in bf16 and the f32
    accumulator stays exact: |sum| <= 128*128*N1 < 2^24 for N1 <= 256.
    The bf16 path runs ~300x faster than int8 dots on v5e (XLA lowers
    s8xs8->s32 to VPU emulation, but bf16 is MXU-native)."""
    n1 = x.shape[0]
    m = x.shape[1]
    assert n1 <= 256, "f32 accumulation exactness bound"
    xd = _balanced_digits_device(x)                  # (8, N1, M)
    xd = xd.transpose(1, 0, 2).reshape(n1, 8 * m)    # (N1, 8M)
    prod = jax.lax.dot_general(
        wd.astype(jnp.bfloat16), xd.astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (8N1, 8M)
    prod = prod.astype(jnp.int32).reshape(8, n1, 8, m)
    return _recombine(prod)


@functools.partial(jax.jit, static_argnums=(1, 2))
def mxu_ntt(x: GF, log_n1: int, log_n2: int) -> GF:
    """Forward NTT of (..., N) coefficients, N = N1*N2, natural order in
    and out — four-step with MXU matmul DFTs."""
    n1, n2 = 1 << log_n1, 1 << log_n2
    batch = x.shape[:-1]
    bsz = int(np.prod(batch)) if batch else 1
    wd1 = jnp.asarray(_dft_matrix_digits(n1))
    wd2 = jnp.asarray(_dft_matrix_digits(n2))

    # x[.., N2 n1 + n2] -> (N1, B*N2) columns ordered (b, n2)
    xr = x.reshape(bsz, n1, n2)
    xt = GF(jnp.transpose(xr.lo, (1, 0, 2)).reshape(n1, bsz * n2),
            jnp.transpose(xr.hi, (1, 0, 2)).reshape(n1, bsz * n2))
    a = _mxu_dft(wd1, xt)                            # (k1, (b, n2))

    # twiddle: * omega_N^(n2*k1)
    g = gl64.primitive_root_of_unity(log_n1 + log_n2)
    k1 = np.arange(n1, dtype=np.uint64)
    n2i = np.arange(n2, dtype=np.uint64)
    pw = gl64.powers(int(g), n1 * n2)
    tw = pw[((k1[:, None] * n2i[None, :]) % np.uint64(n1 * n2))
            .astype(np.int64)]                       # (N1, N2)
    a = a.reshape(n1, bsz, n2) * GF.from_u64(tw).reshape(n1, 1, n2)

    # second step: contraction over n2: (N2, (k1, b))
    t = GF(jnp.transpose(a.lo, (2, 0, 1)).reshape(n2, n1 * bsz),
           jnp.transpose(a.hi, (2, 0, 1)).reshape(n2, n1 * bsz))
    c = _mxu_dft(wd2, t)                             # (k2, (k1, b))
    # X[b, N1 k2 + k1] = C[k2, k1, b]
    c3l = c.lo.reshape(n2, n1, bsz)
    c3h = c.hi.reshape(n2, n1, bsz)
    out = GF(jnp.transpose(c3l, (2, 0, 1)).reshape(*batch, n2 * n1),
             jnp.transpose(c3h, (2, 0, 1)).reshape(*batch, n2 * n1))
    return out


def check(log_n1=4, log_n2=4, batch=3, seed=0):
    rng = np.random.default_rng(seed)
    n = 1 << (log_n1 + log_n2)
    x = GF.from_u64(rng.integers(0, P, size=(batch, n), dtype=np.uint64))
    got = mxu_ntt(x, log_n1, log_n2).to_u64()
    expect = ntt.ntt(x).to_u64()
    ok = np.array_equal(gl64.to_canonical(np.asarray(got)),
                        gl64.to_canonical(np.asarray(expect)))
    print(f"N1=2^{log_n1} N2=2^{log_n2} batch={batch}:",
          "OK" if ok else "MISMATCH")
    if not ok:
        bad = np.nonzero(gl64.to_canonical(np.asarray(got))
                         != gl64.to_canonical(np.asarray(expect)))
        print("first bad:", [b[:4] for b in bad])
    return ok


def bench():
    import time
    BATCH, LOG_N = 64, 16
    N = 1 << LOG_N

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(seed, reps):
        base = jax.lax.broadcasted_iota(jnp.uint32, (BATCH, N), 1)
        x = GF(base * jnp.uint32(2654435761) + seed.astype(jnp.uint32),
               base ^ jnp.uint32(0x9E3779B9))

        def body(i, c):
            out = mxu_ntt(c, 8, 8)
            return GF(out.lo, out.hi + jnp.uint32(1))

        out = jax.lax.fori_loop(0, reps, body, x)
        return out.lo.sum() + out.hi.sum()

    reps = 8
    _ = jax.device_get(chain(jnp.uint32(1), reps))
    t0 = time.perf_counter()
    _ = jax.device_get(chain(jnp.uint32(2), reps))
    dt = time.perf_counter() - t0
    per = dt / reps
    print(f"mxu_ntt 64 x 2^16: {per * 1e3:.2f} ms/ntt, "
          f"{BATCH * N * reps / dt / 1e9:.2f} G elems/s")

    # reference: current radix-8 path
    @functools.partial(jax.jit, static_argnums=(1,))
    def chain_ref(seed, reps):
        base = jax.lax.broadcasted_iota(jnp.uint32, (BATCH, N), 1)
        x = GF(base * jnp.uint32(2654435761) + seed.astype(jnp.uint32),
               base ^ jnp.uint32(0x9E3779B9))

        def body(i, c):
            out = ntt.ntt(c)
            return GF(out.lo, out.hi + jnp.uint32(1))

        out = jax.lax.fori_loop(0, reps, body, x)
        return out.lo.sum() + out.hi.sum()

    _ = jax.device_get(chain_ref(jnp.uint32(1), reps))
    t0 = time.perf_counter()
    _ = jax.device_get(chain_ref(jnp.uint32(2), reps))
    dt = time.perf_counter() - t0
    print(f"radix-8 64 x 2^16: {dt / reps * 1e3:.2f} ms/ntt, "
          f"{BATCH * N * reps / dt / 1e9:.2f} G elems/s")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "bench":
        bench()
    else:
        ok = check(3, 3, 2)
        ok &= check(4, 4, 3)
        ok &= check(4, 5, 2)
        sys.exit(0 if ok else 1)
