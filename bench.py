"""Benchmark entry point: batched NTT + coset-LDE throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is the BASELINE.md north-star "NTT throughput (Goldilocks
elems/s/chip)": a batch of 64 polynomials of 2^16 coefficients is
low-degree-extended (rate 8, coset-shifted) — i.e. 64 stage-skipped NTTs of
size 2^19 per call.  Throughput counts output elements per second.
`vs_baseline` is measured against ROUND 1's recorded number (0.81 G
elems/s/chip, BASELINE.md) so regressions are visible; the reference
publishes no machine numbers of its own.

Timing methodology: the device is reached through a network tunnel, where
per-dispatch round-trips and result caching make naive loops meaningless.
All REPS iterations are chained *inside one jit* with a data dependency
(each round feeds on the previous output), and completion is forced by
fetching a scalar, so the measured time is pure device execution.
"""

from __future__ import annotations

import functools
import json
import time

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

from plonky2_tpu.field import gl64, ntt
from plonky2_tpu.field.goldilocks import GF

BATCH, LOG_N, RATE_BITS = 64, 16, 3
N = 1 << LOG_N


@functools.partial(jax.jit, static_argnums=(1, 2))
def _lde_chain(seed, reps: int, impl: str):
    import jax.numpy as jnp
    # generate the coefficient batch ON DEVICE: the tunnel re-uploads host
    # inputs per call at ~40 MB/s, which would swamp the measurement
    base = jax.lax.broadcasted_iota(jnp.uint32, (BATCH, N), 1)
    coeffs = GF(base * jnp.uint32(2654435761) + seed.astype(jnp.uint32),
                base ^ jnp.uint32(0x9E3779B9))

    def body(i, c):
        if impl == "mxu":
            from plonky2_tpu.ops.mxu_lde_pallas import mxu_lde
            out = mxu_lde(c, RATE_BITS, shift=7)
            out = GF(out.lo.reshape(BATCH, -1), out.hi.reshape(BATCH, -1))
        else:
            out = ntt.lde(c, RATE_BITS, shift=7)
        # fold back to input size with a data dependency between iterations
        # so nothing can be deduplicated or overlapped away
        return GF(out.lo[..., :N], out.hi[..., :N] + jnp.uint32(1))

    out = jax.lax.fori_loop(0, reps, body, coeffs)
    return out.lo.sum() + out.hi.sum()


def _measure(impl: str, reps: int) -> float:
    """elems/s for one implementation (compile excluded via warm-up call)."""
    import jax.numpy as jnp
    out_elems = BATCH * (N << RATE_BITS)
    _ = jax.device_get(_lde_chain(jnp.uint32(1), reps, impl))
    t0 = time.perf_counter()
    _ = jax.device_get(_lde_chain(jnp.uint32(2), reps, impl))
    return out_elems * reps / (time.perf_counter() - t0)


def _poseidon_perms_per_sec(reps: int = 16) -> float:
    """Fused-column Pallas Poseidon (MXU MDS), chained-jit like the LDE.
    Second north-star metric: the Merkle/hash phase dominates e2e proving
    (BASELINE.md round 4), so perms/s is tracked alongside LDE elems/s."""
    import jax.numpy as jnp
    from plonky2_tpu.ops.poseidon_pallas import permute_cols
    b = 1 << 17

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(seed, n: int):
        lo = jax.lax.broadcasted_iota(jnp.uint32, (12, b), 1) + seed
        hi = jax.lax.broadcasted_iota(jnp.uint32, (12, b), 0) * jnp.uint32(7919)

        def body(i, c):
            olo, ohi = permute_cols(c[0], c[1], 1024, False, "mxu")
            return (olo, ohi + jnp.uint32(1))

        lo, hi = jax.lax.fori_loop(0, n, body, (lo, hi))
        return lo.sum() + hi.sum()

    _ = jax.device_get(chain(jnp.uint32(1), reps))
    t0 = time.perf_counter()
    _ = jax.device_get(chain(jnp.uint32(2), reps))
    return b * reps / (time.perf_counter() - t0)


def _stark_2e20_prove_seconds(runs: int = 2) -> float:
    """BASELINE.md "Targets" north star: end-to-end STARK prove at 2^20
    rows (Fibonacci AIR, standard fast config), best of `runs` — the
    first run absorbs any residual compile cost (the persistent cache
    usually covers it; tools/e2e_bench.py is the full-detail version)."""
    from plonky2_tpu.stark.config import StarkConfig
    from plonky2_tpu.stark.fibonacci import FibonacciStark
    from plonky2_tpu.stark.prover import prove
    stark = FibonacciStark(num_rows=1 << 20)
    config = StarkConfig.standard_fast_config()
    trace = stark.generate_trace(0, 1)
    pis = np.array([0, 1, stark.expected_result(0, 1)], dtype=np.uint64)
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        prove(stark, config, trace, pis)
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    return best


def main():
    reps = 8
    results = {"radix8": _measure("radix8", reps)}
    # the fused MXU four-step kernel (ops/mxu_lde_pallas.py) is TPU-only;
    # fall back to the radix-8 number if it fails to compile or run
    poseidon = None
    if jax.default_backend() != "cpu":
        try:
            results["mxu"] = _measure("mxu", reps)
        except Exception:
            pass
        try:
            poseidon = _poseidon_perms_per_sec()
        except Exception:
            pass

    impl = max(results, key=results.get)
    throughput = results[impl]
    ROUND1_THROUGHPUT = 0.81e9  # BASELINE.md, BENCH_r01.json
    out = {
        "metric": "ntt_lde_throughput",
        "value": throughput,
        "unit": "goldilocks_elems_per_sec_per_chip",
        "vs_baseline": throughput / ROUND1_THROUGHPUT,
        "impl": impl,
        "all": {k: round(v) for k, v in results.items()},
    }
    if poseidon is not None:
        # round-1 measured 5.7 M perms/s (BASELINE.md)
        out["poseidon_perms_per_sec"] = round(poseidon)
        out["poseidon_vs_round1"] = round(poseidon / 5.7e6, 2)
    e2e = None
    if jax.default_backend() != "cpu":
        try:
            e2e = _stark_2e20_prove_seconds()
        except Exception:
            pass
    if e2e is not None:
        # round-5 pre-optimization measurement: 68.5 s (BASELINE.md)
        out["stark_2e20_prove_seconds"] = round(e2e, 2)
        out["stark_2e20_rows_per_sec"] = round((1 << 20) / e2e)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
