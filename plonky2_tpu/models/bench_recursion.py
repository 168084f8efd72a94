"""Recursion benchmark CLI (twin of reference plonky2/examples/bench_recursion.rs).

Builds a dummy proof with ~2^size gates, then a chain of recursive wrapper
proofs, reporting per-phase timings and proof sizes:

    python -m plonky2_tpu.models.bench_recursion --size 12 --levels 1 \
        --query-rounds 4 --pow-bits 8
"""

from __future__ import annotations

import argparse
import time

from ..fri.config import FriConfig, FriReductionStrategy
from ..plonk.builder import CircuitBuilder
from ..plonk.config import CircuitConfig
from ..plonk.gates.simple import NoopGate
from ..plonk.witness import PartialWitness
from ..recursion import (add_virtual_proof_with_pis, add_virtual_verifier_data,
                         set_proof_with_pis_target, set_verifier_data_target,
                         verify_proof_circuit)
from ..utils.serialization import proof_with_pis_to_bytes
from ..utils.timing import TimingTree


def dummy_inner(config: CircuitConfig, size_bits: int):
    """A proof of a circuit with ~2^size_bits NoopGates
    (bench_recursion.rs:199 dummy_proof)."""
    b = CircuitBuilder(config)
    x = b.add_virtual_target()
    b.register_public_input(x)
    while b.num_gates() < (1 << size_bits) - 16:
        b.add_gate(NoopGate(), [])
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 42)
    return data, pw


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, default=12,
                    help="log2 gates of the inner dummy circuit")
    ap.add_argument("--levels", type=int, default=1,
                    help="number of recursive wrapping levels")
    ap.add_argument("--query-rounds", type=int, default=28)
    ap.add_argument("--pow-bits", type=int, default=16)
    args = ap.parse_args(argv)

    config = CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=args.pow_bits,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=args.query_rounds))

    t0 = time.perf_counter()
    data, pw = dummy_inner(config, args.size)
    print(f"inner circuit build ({data.common.degree()} gates): "
          f"{time.perf_counter() - t0:.2f}s")

    timing = TimingTree("prove inner")
    proof = data.prove(pw, timing)
    timing.print()
    data.verify(proof)
    print(f"inner proof: {len(proof_with_pis_to_bytes(proof))} bytes")

    for level in range(args.levels):
        t0 = time.perf_counter()
        b = CircuitBuilder(config)
        pt = add_virtual_proof_with_pis(b, data.common)
        vdt = add_virtual_verifier_data(b, config.fri_config.cap_height)
        verify_proof_circuit(b, pt, vdt, data.common)
        b.register_public_inputs(pt.public_inputs)
        outer = b.build()
        print(f"level {level}: wrapper build ({outer.common.degree()} gates): "
              f"{time.perf_counter() - t0:.2f}s")

        pw = PartialWitness()
        set_proof_with_pis_target(pw, pt, proof)
        set_verifier_data_target(pw, vdt, data.verifier_only)
        timing = TimingTree(f"prove wrapper {level}")
        proof = outer.prove(pw, timing)
        timing.print()
        outer.verify(proof)
        print(f"level {level} proof: "
              f"{len(proof_with_pis_to_bytes(proof))} bytes")
        data = outer

    print("done")


if __name__ == "__main__":
    main()
