"""FRI prover: commit-phase folding, proof-of-work grind, query extraction.

TPU twin of reference fri/prover.rs:20-216.  Folding happens in coefficient
space (a strided beta-reduction, one vectorised pass) followed by a shrinking
coset NTT per round, exactly the reference recurrence.  The PoW grind runs as
batched Poseidon permutations over candidate vectors on device (the
reference greps candidates with rayon find_any); query rounds are host-side
Merkle path extraction.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import numpy as np

from ..field import gl64, ntt
from ..field.extension import GF2
from ..field.goldilocks import GF
from ..field.polynomial import powers_ext
from ..hash.merkle import MerkleProof, MerkleTree
from ..hash.poseidon import permute
from ..iop.challenger import Challenger
from ..utils.bits import reverse_index_bits_perm
from .config import FriConfig, FriParams
from .proof import FriInitialTreeProof, FriProof, FriQueryRound, FriQueryStep

import jax.numpy as jnp


def _flatten_ext_leaves(values: GF2, arity: int) -> GF:
    """(m*arity,) ext values -> (m, 2*arity) base leaves, components interleaved
    per element ([a0, b0, a1, b1, ...]), matching reference `flatten`."""
    m = values.shape[0] // arity
    a = values.a.reshape(m, arity)
    b = values.b.reshape(m, arity)
    lo = jnp.stack([a.lo, b.lo], axis=-1).reshape(m, 2 * arity)
    hi = jnp.stack([a.hi, b.hi], axis=-1).reshape(m, 2 * arity)
    return GF(lo, hi)


@lru_cache(maxsize=None)
def _leaves_fn(n: int, arity: int):
    """Bit-reversed leaf matrix of one commit round as ONE jitted
    program (take + flatten would otherwise dispatch eagerly — costly
    over a tunneled device)."""
    perm = reverse_index_bits_perm(n)

    def leaves(values: GF2) -> GF:
        return _flatten_ext_leaves(values.take(perm, axis=0), arity)

    return leaves if jax.default_backend() == "cpu" else jax.jit(leaves)


@lru_cache(maxsize=None)
def _fold_fn(n: int, arity: int, shift: int):
    """One beta-fold + coset re-evaluation (fri/prover.rs:100-113) as
    ONE jitted program; beta is a traced input so fresh challenges
    never retrace."""

    def fold(coeffs: GF2, beta: GF2):
        # P(x) = sum_{i<r} x^i P_i(x^r)  =>  folded = sum_i beta^i P_i
        bpow = powers_ext(beta, arity)
        ca = coeffs.a.reshape(-1, arity)
        cb = coeffs.b.reshape(-1, arity)
        folded = (GF2(ca, cb) * bpow).sum(axis=-1)
        return folded, ntt.coset_ntt_ext(folded, shift)

    return fold if jax.default_backend() == "cpu" else jax.jit(fold)


def fri_committed_trees(coeffs: GF2, values: GF2, challenger: Challenger,
                        fri_params: FriParams, hasher: str = "poseidon"):
    """Commit phase (reference fri/prover.rs:69-113)."""
    if hasher == "keccak":
        from ..hash.keccak_tree import BytesMerkleTree as _Tree
    else:
        _Tree = MerkleTree
    trees = []
    shift = gl64.MULTIPLICATIVE_GROUP_GENERATOR
    n = values.shape[0]
    for arity_bits in fri_params.reduction_arity_bits:
        arity = 1 << arity_bits
        leaves = _leaves_fn(n, arity)(values)
        tree = _Tree(leaves, fri_params.config.cap_height)
        challenger.observe_cap(tree.cap)
        trees.append(tree)

        beta_np = challenger.get_extension_challenge()
        beta = GF2.from_u64_pair(beta_np[0], beta_np[1])
        shift = pow(shift, arity, gl64.ORDER_INT)
        coeffs, values = _fold_fn(n, arity, shift)(coeffs, beta)
        n = values.shape[0]

    keep = n >> fri_params.config.rate_bits
    final_coeffs = coeffs[:keep].to_u64()  # (keep, 2); high coeffs are zero
    for c in final_coeffs:
        challenger.observe_extension_element(c)
    return trees, final_coeffs


def fri_proof_of_work(challenger: Challenger, config: FriConfig) -> np.uint64:
    """Batched device grind (reference fri/prover.rs:115-159): find witness w
    such that the challenge after observing w has >= proof_of_work_bits
    leading zeros."""
    min_lz = config.proof_of_work_bits  # + (64 - 64) for Goldilocks
    threshold = 1 << (64 - min_lz)
    # min_lz == 0 makes the threshold 2^64 (every response passes); clamp
    # the u32/u64 comparison constants and accept-all below
    unbounded = min_lz == 0
    thr_hi = np.uint32(min(threshold >> 32, 0xFFFFFFFF))
    thr_lo = np.uint32(threshold & 0xFFFFFFFF)

    # Precompute the duplex-intermediate state: inputs written, witness slot next.
    inter = challenger.state.copy()
    k = len(challenger.input_buffer)
    if k:
        inter[:k] = np.array(challenger.input_buffer, dtype=np.uint64)
    pos = k

    from ..hash.poseidon import permute_np
    keccak_duplex = challenger._permute is not permute_np
    B = 1 << 12 if keccak_duplex else 1 << 16
    offset = 0
    witness = None
    while witness is None:
        cands = np.arange(offset, offset + B, dtype=np.uint64)
        states = np.broadcast_to(inter, (B, 12)).copy()
        states[:, pos] = cands
        if keccak_duplex:
            # keccak hash-onion duplex (keccak_tree.keccak_permutation_np):
            # response = output slot 7 = word 3 of the SECOND onion hash,
            # assuming no rejection among the first 8 words (probability
            # ~2^-32 per word; rejecting rows are just skipped — the exact
            # replay below re-checks the winner).
            from ..hash.keccak_tree import _absorb_blocks
            buf = gl64.to_canonical(states).astype("<u8").view(
                np.uint8).reshape(B, 96)
            h1 = _absorb_blocks(buf)
            h2 = _absorb_blocks(h1)
            words = np.concatenate([
                h1.reshape(B, 4, 8).copy().view("<u8").reshape(B, 4),
                h2.reshape(B, 4, 8).copy().view("<u8").reshape(B, 4),
            ], axis=1).astype(np.uint64)
            valid = (words < np.uint64(gl64.ORDER_INT)).all(axis=1)
            ok = valid if unbounded else \
                valid & (words[:, 7] < np.uint64(min(threshold, (1 << 64) - 1)))
        else:
            out = permute(GF.from_u64(states))
            resp = out[:, 7].canonical()
            lo, hi = np.asarray(resp.lo), np.asarray(resp.hi)
            if unbounded:
                ok = np.ones(B, dtype=bool)
            else:
                ok = (hi < thr_hi) | ((hi == thr_hi) & (lo < thr_lo))
        hits = np.nonzero(ok)[0]
        if hits.size:
            witness = np.uint64(offset + int(hits[0]))
        offset += B
        assert offset < (1 << 40), "PoW grind failed"

    # Replay through the challenger so the transcript advances identically.
    challenger.observe_element(witness)
    response = challenger.get_challenge()
    assert int(response) < threshold, "PoW replay mismatch"
    return witness


def _batch_open(tree, idx: np.ndarray):
    """(leaves (q, leaf_len), sibs (q, depth, 4)) for a device-resident
    MerkleTree (batched gathers) or any host tree with leaves_np/levels
    (BytesMerkleTree, deserialized trees)."""
    if hasattr(tree, "open"):
        return tree.open(idx)
    leaves = np.stack([np.asarray(tree.leaves_np[i]) for i in idx])
    sibs = np.stack([tree.prove(int(i)).siblings for i in idx])
    return leaves, sibs


def fri_prover_query_rounds(initial_trees: list, trees: list,
                            challenger: Challenger, n: int,
                            fri_params: FriParams) -> list:
    """Batched: ONE gather per Merkle level for all query rounds — over
    a tunneled device, per-index extraction would cost thousands of
    round trips (reference fri/prover.rs:160 does per-query host reads;
    the transcript order — all indices drawn first — is unchanged
    because index draws never interleave with observations)."""
    nq = fri_params.config.num_query_rounds
    x_indices = np.array([int(challenger.get_challenge()) % n
                          for _ in range(nq)], dtype=np.int64)
    initial_opens = [_batch_open(t, x_indices) for t in initial_trees]
    step_opens = []
    idx = x_indices
    for i, tree in enumerate(trees):
        idx = idx >> fri_params.reduction_arity_bits[i]
        step_opens.append(_batch_open(tree, idx))

    rounds = []
    for q in range(nq):
        initial_proof = [(leaves[q].copy(), MerkleProof(sibs[q]))
                         for leaves, sibs in initial_opens]
        steps = [FriQueryStep(leaves[q].reshape(-1, 2), MerkleProof(sibs[q]))
                 for leaves, sibs in step_opens]
        rounds.append(FriQueryRound(FriInitialTreeProof(initial_proof),
                                    steps))
    return rounds


def fri_prover_query_round(initial_trees: list, trees: list, x_index: int,
                           fri_params: FriParams) -> FriQueryRound:
    initial_proof = [
        (t.leaves_np[x_index].copy(), t.prove(x_index)) for t in initial_trees
    ]
    steps = []
    for i, tree in enumerate(trees):
        arity_bits = fri_params.reduction_arity_bits[i]
        leaf = tree.leaves_np[x_index >> arity_bits]
        evals = leaf.reshape(-1, 2)  # unflatten to extension elements
        steps.append(FriQueryStep(evals, tree.prove(x_index >> arity_bits)))
        x_index >>= arity_bits
    return FriQueryRound(FriInitialTreeProof(initial_proof), steps)


def fri_proof(initial_merkle_trees: list, lde_polynomial_coeffs: GF2,
              lde_polynomial_values: GF2, challenger: Challenger,
              fri_params: FriParams, hasher: str = "poseidon",
              timing=None) -> FriProof:
    """Top-level FRI proof (reference fri/prover.rs:20)."""
    from ..utils.timing import TimingTree
    timing = timing if timing is not None else TimingTree("fri")
    n = lde_polynomial_values.shape[0]
    assert lde_polynomial_coeffs.shape[0] == n

    with timing.scope("commit-phase folds"):
        trees, final_coeffs = fri_committed_trees(
            lde_polynomial_coeffs, lde_polynomial_values, challenger,
            fri_params, hasher)
    with timing.scope("proof-of-work grind"):
        pow_witness = fri_proof_of_work(challenger, fri_params.config)
    with timing.scope("query rounds"):
        query_rounds = fri_prover_query_rounds(
            initial_merkle_trees, trees, challenger, n, fri_params)

    return FriProof(
        commit_phase_merkle_caps=[t.cap for t in trees],
        query_round_proofs=query_rounds,
        final_poly=final_coeffs,
        pow_witness=pow_witness,
    )
