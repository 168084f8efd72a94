"""Benchmark entry point: batched NTT + coset-LDE throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is the BASELINE.md north-star "NTT throughput (Goldilocks
elems/s/chip)": a batch of 64 polynomials of 2^16 coefficients is
low-degree-extended (rate 8, coset-shifted) — i.e. 64 stage-skipped NTTs of
size 2^19 per call.  Throughput counts output elements per second.
`vs_baseline` is 1.0: the reference publishes no machine numbers
(BASELINE.md; its criterion benches measure locally and record nothing).
"""

from __future__ import annotations

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


def main():
    batch, log_n, rate_bits = 64, 16, 3
    n = 1 << log_n
    out_elems = batch * (n << rate_bits)

    rng = np.random.default_rng(0)
    coeffs = GF.from_u64(rng.integers(0, gl64.ORDER_INT, size=(batch, n),
                                      dtype=np.uint64))
    coeffs = jax.device_put(coeffs)

    # warm-up / compile
    out = ntt.lde(coeffs, rate_bits, shift=7)
    jax.block_until_ready((out.lo, out.hi))

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ntt.lde(coeffs, rate_bits, shift=7)
    jax.block_until_ready((out.lo, out.hi))
    dt = time.perf_counter() - t0

    throughput = out_elems * iters / dt
    print(json.dumps({
        "metric": "ntt_lde_throughput",
        "value": throughput,
        "unit": "goldilocks_elems_per_sec_per_chip",
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
