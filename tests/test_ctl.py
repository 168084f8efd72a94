"""Cross-table lookups: multi-table prove + verify with a shared transcript
(machinery of reference evm/src/cross_table_lookup.rs + evm/src/prover.rs,
exercised through small demo tables like lookup_test.rs does for lookups)."""

import numpy as np
import pytest

from plonky2_tpu.field import gl64
from plonky2_tpu.stark.config import StarkConfig
from plonky2_tpu.stark.ctl import (Column, CrossTableLookup, TableWithColumns,
                                   check_ctls)
from plonky2_tpu.stark.multi import prove_multi_table, verify_multi_table
from plonky2_tpu.stark.permutation import PermutationPair
from plonky2_tpu.stark.stark import Stark

P = gl64.ORDER_INT
N = 32


class MulStark(Stark):
    """Products table: every row satisfies z = x*y; f flags exported rows."""

    COLUMNS = 4  # x, y, z, f
    PUBLIC_INPUTS = 0

    def eval_generic(self, ctx, vars, yield_constr):
        x, y, z, f = vars.local_values
        yield_constr.constraint(z - x * y)
        yield_constr.constraint(f * (f - ctx.one()))

    def constraint_degree(self):
        return 3


class ReqStark(Stark):
    """Requests table: rows flagged by f must appear in the products table.
    Columns 4/5 are a permutation pair to exercise the shared perm+CTL Z
    commitment layout."""

    COLUMNS = 6  # x, y, z, f, c, c_rot
    PUBLIC_INPUTS = 0

    def eval_generic(self, ctx, vars, yield_constr):
        f = vars.local_values[3]
        yield_constr.constraint(f * (f - ctx.one()))

    def constraint_degree(self):
        return 3

    def permutation_pairs(self):
        return [PermutationPair.singletons(4, 5)]


class Req2Stark(Stark):
    COLUMNS = 4  # x, y, z, f
    PUBLIC_INPUTS = 0

    def eval_generic(self, ctx, vars, yield_constr):
        f = vars.local_values[3]
        yield_constr.constraint(f * (f - ctx.one()))

    def constraint_degree(self):
        return 3


def _mul_trace():
    x = np.arange(N, dtype=np.uint64)
    y = x + np.uint64(3)
    z = gl64.mul(x, y)
    f = np.zeros(N, np.uint64)
    f[:20] = 1
    return np.stack([x, y, z, f])


def _req_traces(mul):
    """Split the 20 exported product rows between two request tables."""
    rows = mul[:3, :20]  # (3, 20)
    rng = np.random.default_rng(7)
    order = rng.permutation(20)
    r1, r2 = order[:12], order[12:]

    req1 = np.zeros((6, N), np.uint64)
    req1[:3, :12] = rows[:, r1]
    req1[3, :12] = 1
    req1[:3, 12:] = rng.integers(0, 100, size=(3, N - 12))  # f=0 rows: junk
    req1[4] = np.arange(N, dtype=np.uint64)
    req1[5] = np.roll(req1[4], 1)

    req2 = np.zeros((4, N), np.uint64)
    # scatter the filtered rows around to prove filters need not be a prefix
    pos = np.asarray(sorted(rng.choice(N, size=8, replace=False)))
    req2[:3, pos] = rows[:, r2]
    req2[3, pos] = 1
    return req1, req2


def _ctls():
    cols = Column.singles([0, 1, 2])
    return [CrossTableLookup(
        looking_tables=(
            TableWithColumns(1, tuple(cols), Column.single(3)),
            TableWithColumns(2, tuple(cols), Column.single(3)),
        ),
        looked_table=TableWithColumns(0, tuple(cols), Column.single(3)),
    )]


def test_check_ctls_multiset():
    mul = _mul_trace()
    req1, req2 = _req_traces(mul)
    check_ctls([mul, req1, req2], _ctls())


def test_check_ctls_detects_mismatch():
    mul = _mul_trace()
    req1, req2 = _req_traces(mul)
    req2[0, np.nonzero(req2[3])[0][0]] += np.uint64(1)
    with pytest.raises(AssertionError):
        check_ctls([mul, req1, req2], _ctls())


def test_multi_table_prove_verify():
    mul = _mul_trace()
    req1, req2 = _req_traces(mul)
    starks = [MulStark(), ReqStark(), Req2Stark()]
    config = StarkConfig.standard_fast_config()
    proof = prove_multi_table(starks, _ctls(), config, [mul, req1, req2])
    verify_multi_table(starks, _ctls(), proof, config)


def test_multi_table_prover_rejects_inconsistent_traces():
    mul = _mul_trace()
    req1, req2 = _req_traces(mul)
    req1[2, 0] = gl64.add(req1[2, 0], np.uint64(1))  # break one request row
    starks = [MulStark(), ReqStark(), Req2Stark()]
    config = StarkConfig.standard_fast_config()
    with pytest.raises(AssertionError):
        prove_multi_table(starks, _ctls(), config, [mul, req1, req2])


@pytest.mark.slow
def test_multi_table_recursive_verification():
    """A PLONK circuit verifying a whole multi-table CTL proof
    (evm/src/recursive_verifier.rs machinery, composed monolithically)."""
    from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
    from plonky2_tpu.plonk.builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.witness import PartialWitness
    from plonky2_tpu.stark.ctl import num_ctl_zs
    from plonky2_tpu.stark.multi_recursive import (
        add_virtual_multi_stark_proof, set_multi_proof_targets,
        verify_multi_proof_circuit)

    sconfig = StarkConfig(fri_config=FriConfig(
        rate_bits=1, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=8))
    cconfig = CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4))

    mul = _mul_trace()
    req1, req2 = _req_traces(mul)
    starks = [MulStark(), ReqStark(), Req2Stark()]
    ctls = _ctls()
    proof = prove_multi_table(starks, ctls, sconfig, [mul, req1, req2])
    verify_multi_table(starks, ctls, proof, sconfig)

    b = CircuitBuilder(cconfig)
    pts = [add_virtual_multi_stark_proof(
        b, stark, sconfig, p.degree_bits,
        num_ctl_zs(ctls, i, sconfig.num_challenges))
        for i, (stark, p) in enumerate(zip(starks, proof.stark_proofs))]
    verify_multi_proof_circuit(b, starks, ctls, pts, sconfig,
                               proof.degree_bits())
    data = b.build()

    pw = PartialWitness()
    set_multi_proof_targets(pw, pts, proof)
    wrapper = data.prove(pw)
    data.verify(wrapper)


def test_multi_table_verifier_rejects_tampered_ctl_z():
    mul = _mul_trace()
    req1, req2 = _req_traces(mul)
    starks = [MulStark(), ReqStark(), Req2Stark()]
    config = StarkConfig.standard_fast_config()
    proof = prove_multi_table(starks, _ctls(), config, [mul, req1, req2])
    # tamper the claimed final CTL product of the looked table
    proof.stark_proofs[0].openings.ctl_zs_last[0] = gl64.add(
        proof.stark_proofs[0].openings.ctl_zs_last[0], np.uint64(1))
    with pytest.raises(AssertionError):
        verify_multi_table(starks, _ctls(), proof, config)


def test_multi_table_keccak_config_prove_verify_roundtrip():
    """Keccak-committed multi-table pipeline (KeccakGoldilocksConfig at the
    starky/evm level, plonk/config.rs:72): prove, verify, and byte
    round-trip with byte-digest caps."""
    from plonky2_tpu.zkevm.serialization import (multi_proof_from_bytes,
                                                 multi_proof_to_bytes)

    mul = _mul_trace()
    req1, req2 = _req_traces(mul)
    starks = [MulStark(), ReqStark(), Req2Stark()]
    config = StarkConfig.standard_keccak_config()
    proof = prove_multi_table(starks, _ctls(), config, [mul, req1, req2])
    verify_multi_table(starks, _ctls(), proof, config)

    data = multi_proof_to_bytes(proof, hasher="keccak")
    proof2 = multi_proof_from_bytes(data, hasher="keccak")
    verify_multi_table(starks, _ctls(), proof2, config)
    assert multi_proof_to_bytes(proof2, hasher="keccak") == data
