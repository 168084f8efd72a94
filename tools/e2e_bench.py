"""End-to-end proving benchmarks on the real chip (BASELINE.md "Targets").

Two flagship numbers:
  1. build-once / prove-many matrix_mul (m=64) — plonk pipeline
     (reference plonky2/examples/matrix_multiplication.rs);
  2. FibonacciStark prove at 2^20 rows — stark pipeline row-scaling
     (reference starky/src/fibonacci_stark.rs test, scaled up).

Methodology: the prover is host-orchestrated (host challenger between
device phases), so a full prove cannot be chained inside one jit; the
wall-clock therefore INCLUDES tunnel round-trips (~100 ms per host<->device
sync on the axon tunnel).  The per-phase TimingTree breakdown separates
device work from orchestration; both are recorded.  Run each prove 3x and
keep the best (first run pays XLA compiles).

Run from the repo root: python tools/e2e_bench.py [--rows LOG2] [--m M]
"""
import sys; sys.path.insert(0, "/root/repo")

import argparse
import json
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from plonky2_tpu.field import gl64
from plonky2_tpu.utils.timing import TimingTree


def bench_matmul(m: int, reps: int = 3):
    from plonky2_tpu.models.matrix_mul import (build_matrix_mul_circuit,
                                               matrix_mul_witness)
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    data, a_t, b_t = build_matrix_mul_circuit(m)
    build_s = time.perf_counter() - t0
    print(f"matmul m={m}: degree 2^{data.common.degree_bits()}, "
          f"build {build_s:.1f}s", flush=True)

    best = None
    for i in range(reps):
        a = rng.integers(0, gl64.ORDER_INT, size=(m, m), dtype=np.uint64)
        b = rng.integers(0, gl64.ORDER_INT, size=(m, m), dtype=np.uint64)
        pw = matrix_mul_witness(a_t, b_t, a, b)
        timing = TimingTree()
        t0 = time.perf_counter()
        proof = data.prove(pw, timing)
        dt = time.perf_counter() - t0
        print(f"  prove[{i}]: {dt:.2f}s", flush=True)
        if best is None or dt < best[0]:
            best = (dt, timing)
    data.verify(proof)
    print("  verified OK; phase breakdown of best run:", flush=True)
    best[1].print()
    return {"metric": "matmul_m64_prove_seconds", "value": best[0]}


def bench_fibonacci(log_rows: int, reps: int = 3):
    from plonky2_tpu.stark.config import StarkConfig
    from plonky2_tpu.stark.fibonacci import FibonacciStark
    from plonky2_tpu.stark.prover import prove
    from plonky2_tpu.stark.verifier import verify_stark_proof

    n = 1 << log_rows
    stark = FibonacciStark(num_rows=n)
    config = StarkConfig.standard_fast_config()
    t0 = time.perf_counter()
    trace = stark.generate_trace(0, 1)
    trace_s = time.perf_counter() - t0
    pis = np.array([0, 1, stark.expected_result(0, 1)], dtype=np.uint64)
    print(f"fibonacci 2^{log_rows} rows: trace gen {trace_s:.1f}s", flush=True)

    best = None
    for i in range(reps):
        timing = TimingTree()
        t0 = time.perf_counter()
        proof = prove(stark, config, trace, pis, timing)
        dt = time.perf_counter() - t0
        print(f"  prove[{i}]: {dt:.2f}s "
              f"({n / dt / 1e3:.1f} K rows/s)", flush=True)
        timing.print()
        if best is None or dt < best[0]:
            best = (dt, timing)
    verify_stark_proof(stark, proof, config, degree_bits=log_rows)
    print("  verified OK; phase breakdown of best run:", flush=True)
    best[1].print()
    return {"metric": f"fibonacci_2e{log_rows}_prove_seconds",
            "value": best[0], "rows_per_sec": n / best[0]}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20, help="log2 stark rows")
    ap.add_argument("--m", type=int, default=64, help="matmul size")
    ap.add_argument("--skip-matmul", action="store_true")
    ap.add_argument("--skip-fib", action="store_true")
    args = ap.parse_args()
    results = []
    if not args.skip_fib:
        results.append(bench_fibonacci(args.rows))
    if not args.skip_matmul:
        results.append(bench_matmul(args.m))
    for r in results:
        print(json.dumps(r))
