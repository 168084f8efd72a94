"""Full CircuitData checkpoint/resume: serialize common + verifier + prover
data (leveled witness schedule incl. named custom generators, sigmas, the
constants+sigmas commitment with its Merkle tree), reload, and prove from
the RELOADED data (twin of reference write/read_circuit_data,
util/serialization/mod.rs:790,1786 + generator_serialization.rs:10)."""

import numpy as np

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.witness import PartialWitness
from plonky2_tpu.utils.serialization import (circuit_data_from_bytes,
                                             circuit_data_to_bytes)


def _config():
    return CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4))


def test_circuit_data_checkpoint_prove_resume():
    b = CircuitBuilder(_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    # exercise several generator kinds, incl. named custom generators:
    out = b.add(b.mul(x, x), b.add_const(y, 42))     # arithmetic
    bits = b.split_le(out, 32)                       # base_sum + le_sum
    picked = b.random_access(b.constant(3), bits[:4])  # random_access_value
    ext = b.inverse_extension((x, y))                # inv_ext
    lut = tuple((i, (i * i + 1) % 97) for i in range(16))
    lut_index = b.add_lookup_table_from_pairs(lut)
    lo = b.add_lookup_from_index(x, lut_index)       # lookup_output + mult
    b.register_public_inputs([x, y, out, picked, ext[0], lo])
    data = b.build()

    blob = circuit_data_to_bytes(data)
    data2 = circuit_data_from_bytes(blob)

    # prove from the RELOADED prover data
    pw = PartialWitness()
    pw.set_target(x, 3)
    pw.set_target(y, 5)
    proof = data2.prove(pw)
    assert int(proof.public_inputs[2]) == 3 * 3 + 5 + 42
    assert int(proof.public_inputs[5]) == (3 * 3 + 1) % 97

    # both the original and the reloaded verifier accept it
    data.verify(proof)
    data2.verify(proof)

    # stable re-encoding of the reloaded data
    assert circuit_data_to_bytes(data2) == blob
