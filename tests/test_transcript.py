"""Fiat-Shamir transcript order: every observe/squeeze of the proof
verification transcript, checked against the reference order table
(plonk/get_challenges.rs:26-92 + fri/challenges.rs fri_challenges):

    observe circuit_digest (4)         | observe PI hash (4)
    observe wires cap                  | squeeze betas (nc), gammas (nc)
    [lookups: squeeze 2*nc deltas]     |
    observe zs+partial_products cap    | squeeze alphas (nc)
    observe quotient cap               | squeeze zeta (2)
    observe all openings (zeta batch then g*zeta batch, D=2 felts each)
    squeeze fri alpha (2)
    per FRI commit round: observe cap  | squeeze beta (2)
    observe final poly (2 per coeff)   | observe pow witness (1)
    squeeze pow response (1)           | squeeze query indices (rounds)

The prover builds the same transcript by construction (shared challenger
code); this pins the VERIFIER side against the table so a reordering in
either place breaks loudly.
"""

import numpy as np

import plonky2_tpu.plonk.verifier as verifier_mod
from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.iop.challenger import Challenger
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.witness import PartialWitness


def _config():
    return CircuitConfig(fri_config=FriConfig(
        rate_bits=3, cap_height=4, proof_of_work_bits=8,
        reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
        num_query_rounds=4))


def _merge(events):
    out = []
    for op, n in events:
        if n == 0:
            continue
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + n)
        else:
            out.append((op, n))
    return out


def test_verifier_transcript_matches_reference_order(monkeypatch):
    b = CircuitBuilder(_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    out = b.add(b.mul(x, x), b.add_const(y, 42))
    b.register_public_inputs([x, y, out])
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 3)
    pw.set_target(y, 5)
    proof = data.prove(pw)

    traces = []

    class TracedChallenger(Challenger):
        def __init__(self, *args, **kw):
            super().__init__(*args, **kw)
            self.trace = []
            traces.append(self.trace)

    monkeypatch.setattr(verifier_mod, "Challenger", TracedChallenger)
    data.verify(proof)
    assert len(traces) == 1
    got = traces[0]

    common = data.common
    cfg = common.config
    nc = cfg.num_challenges
    cap = 1 << cfg.fri_config.cap_height
    params = common.fri_params
    # zeta batch: constants ++ sigmas ++ wires ++ zs ++ partial_products ++
    # quotient ++ lookup_zs (proof.rs:345 to_fri_openings)
    zeta_batch = (common.num_constants + cfg.num_routed_wires + cfg.num_wires
                  + nc + nc * common.num_partial_products
                  + nc * common.quotient_degree_factor
                  + common.num_all_lookup_polys())
    zeta_next_batch = nc + common.num_all_lookup_polys()

    expected = [
        ("observe", 4),            # circuit digest
        ("observe", 4),            # public-inputs hash
        ("observe", 4 * cap),      # wires cap
        ("squeeze", nc),           # betas
        ("squeeze", nc),           # gammas
        # no lookups in this circuit -> no delta squeezes
        ("observe", 4 * cap),      # zs + partial products cap
        ("squeeze", nc),           # alphas
        ("observe", 4 * cap),      # quotient cap
        ("squeeze", 2),            # zeta
        ("observe", 2 * (zeta_batch + zeta_next_batch)),  # openings
        ("squeeze", 2),            # fri alpha
    ]
    for _ in params.reduction_arity_bits:
        expected.append(("observe", 4 * cap))  # commit-phase cap
        expected.append(("squeeze", 2))        # fri beta
    expected += [
        ("observe", 2 * params.final_poly_len()),  # final poly coeffs
        ("observe", 1),                            # pow witness
        ("squeeze", 1),                            # pow response
        ("squeeze", cfg.fri_config.num_query_rounds),  # query indices
    ]

    assert got == _merge(expected), (
        f"transcript order diverged:\n got {got}\n exp {_merge(expected)}")
