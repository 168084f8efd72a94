"""STARK permutation argument (twin of reference starky/src/permutation.rs).

Column pairs claimed to be permutations of one another are checked with
randomized grand products: per batch of (pair, challenge) instances one Z
column carries the running product of
    prod_i (gamma + sum_j beta^j lhs_j) / (gamma + sum_j beta^j rhs_j).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import gl64

P = gl64.ORDER_INT


@dataclass(frozen=True)
class PermutationPair:
    """Pairs of columns claimed to be permutations (permutation.rs:30)."""

    column_pairs: tuple

    @staticmethod
    def singletons(lhs: int, rhs: int) -> "PermutationPair":
        return PermutationPair(((lhs, rhs),))


def get_n_permutation_challenge_sets(challenger, num_challenges: int,
                                     num_sets: int) -> list:
    """num_sets sets of num_challenges (beta, gamma) pairs
    (permutation.rs:170). Works for both host and recursive challengers."""
    return [[(challenger.get_challenge(), challenger.get_challenge())
             for _ in range(num_challenges)] for _ in range(num_sets)]


def get_permutation_batches(pairs: list, challenge_sets: list,
                            num_challenges: int, batch_size: int) -> list:
    """Chunk the (pair x challenge) product; instance i in a batch uses
    challenge_sets[i] (permutation.rs:228)."""
    items = [(pair, chal) for pair in pairs for chal in range(num_challenges)]
    batches = []
    for start in range(0, len(items), batch_size):
        chunk = items[start:start + batch_size]
        batches.append([(pair, challenge_sets[i][chal])
                        for i, (pair, chal) in enumerate(chunk)])
    return batches


def num_permutation_batches(stark, config) -> int:
    n = len(stark.permutation_pairs()) * config.num_challenges
    return -(-n // stark.permutation_batch_size())


def compute_permutation_z_polys(stark, config, trace_np: np.ndarray,
                                challenge_sets: list) -> np.ndarray:
    """(num_batches, n) Z columns from the host trace (permutation.rs:66)."""
    n = trace_np.shape[1]
    batches = get_permutation_batches(
        stark.permutation_pairs(), challenge_sets, config.num_challenges,
        stark.permutation_batch_size())
    out = np.empty((len(batches), n), dtype=np.uint64)
    for bi, batch in enumerate(batches):
        numer = np.ones(n, dtype=np.uint64)
        denom = np.ones(n, dtype=np.uint64)
        for pair, (beta, gamma) in batch:
            beta, gamma = np.uint64(int(beta)), np.uint64(int(gamma))
            rl = np.full(n, gamma, dtype=np.uint64)
            rr = np.full(n, gamma, dtype=np.uint64)
            w = np.uint64(1)
            for (l, r) in pair.column_pairs:
                rl = gl64.add(rl, gl64.mul(trace_np[l], w))
                rr = gl64.add(rr, gl64.mul(trace_np[r], w))
                w = gl64.mul(w, beta)
            numer = gl64.mul(numer, rl)
            denom = gl64.mul(denom, rr)
        quotients = gl64.mul(numer, gl64.batch_inv(denom))
        # exclusive prefix product via a log-depth Hillis-Steele scan:
        # vectorised gl64.mul passes instead of a 2^20-iteration Python
        # loop (which cost ~47 s per batch at the flagship shape)
        z = np.empty(n, dtype=np.uint64)
        z[0] = 1
        z[1:] = quotients[:-1]
        shift = 1
        while shift < n:
            z[shift:] = gl64.mul(z[shift:], z[:-shift].copy())
            shift *= 2
        out[bi] = z
    return out


_Z_JIT_CACHE: dict = {}


def compute_permutation_z_polys_gf(stark, config, trace: "GF",
                                   challenge_sets: list) -> "GF":
    """Device twin of compute_permutation_z_polys: trace stays a device GF
    (COLUMNS, n) — no tunnel fetch, no host numpy scans (the host path cost
    ~42 s at 2^20 rows; the device reduction + log-depth prefix product is
    milliseconds).  Values (and hence the committed bytes) are identical:
    every operation is exact field arithmetic, and the Hillis-Steele
    re-bracketing of the grand product cannot change a product mod p.

    The whole scan compiles to ONE jitted program per (stark, shape),
    with the Fiat-Shamir challenges as TRACED scalar inputs — over a
    tunneled device an eager version pays a compile + round-trip per op
    AND retraces per proof (fresh challenge constants)."""
    import jax

    from ..field.goldilocks import GF

    ch_np = np.array([[(int(b), int(g)) for (b, g) in cs]
                      for cs in challenge_sets], np.uint64)
    num_sets, num_ch = ch_np.shape[0], ch_np.shape[1]
    key = (id(stark), num_sets, num_ch, config.num_challenges,
           stark.permutation_batch_size(), trace.shape)
    fn = _Z_JIT_CACHE.get(key)
    if fn is None:
        idx_sets = [[(si, ci) for ci in range(num_ch)]
                    for si in range(num_sets)]
        batches = get_permutation_batches(
            stark.permutation_pairs(), idx_sets, config.num_challenges,
            stark.permutation_batch_size())

        def run(tr: "GF", ch: "GF") -> "GF":
            from ..field.goldilocks import GF, batch_inv
            from ..plonk.prover import _exclusive_prefix_product
            zs = []
            for batch in batches:
                numer = None
                denom = None
                for pair, (si, ci) in batch:
                    beta = ch[si, ci, 0]
                    gamma = ch[si, ci, 1]
                    rl = gamma
                    rr = gamma
                    w = GF.ones(())
                    for (l, r) in pair.column_pairs:
                        rl = rl + tr[l] * w
                        rr = rr + tr[r] * w
                        w = w * beta
                    numer = rl if numer is None else numer * rl
                    denom = rr if denom is None else denom * rr
                quotients = numer * batch_inv(denom)
                zs.append(_exclusive_prefix_product(quotients))
            return GF.stack(zs, axis=0)

        # XLA:CPU chokes on the fused whole-scan program (CLAUDE.md
        # pathological-compile note); eager is fine there — the jit
        # exists for tunneled devices where per-op dispatch dominates
        if jax.default_backend() != "cpu":
            run = jax.jit(run)
        _Z_JIT_CACHE[key] = fn = run
    return fn(trace, GF.from_u64(ch_np))


def eval_permutation_checks(ctx, stark, config, vars, local_zs, next_zs,
                            challenge_sets, consumer) -> None:
    """Z(1)=1 plus the per-batch transition Z(gx)*prod(rhs) = Z(x)*prod(lhs)
    (permutation.rs:262).  Challenges may be host ints or circuit elements."""
    def elem(v):
        return ctx.constant(int(v)) if isinstance(v, (int, np.integer)) else v

    for z in local_zs:
        consumer.constraint_first_row(z - ctx.one())

    batches = get_permutation_batches(
        stark.permutation_pairs(), challenge_sets, config.num_challenges,
        stark.permutation_batch_size())
    for i, batch in enumerate(batches):
        lhs_prod = None
        rhs_prod = None
        for pair, (beta, gamma) in batch:
            beta_e, gamma_e = elem(beta), elem(gamma)
            rl = gamma_e
            rr = gamma_e
            wpow = None  # beta^0 handled by plain add
            for (l, r) in pair.column_pairs:
                lv = vars.local_values[l]
                rv = vars.local_values[r]
                if wpow is None:
                    rl = rl + lv
                    rr = rr + rv
                    wpow = beta_e
                else:
                    rl = rl + lv * wpow
                    rr = rr + rv * wpow
                    wpow = wpow * beta_e
            lhs_prod = rl if lhs_prod is None else lhs_prod * rl
            rhs_prod = rr if rhs_prod is None else rhs_prod * rr
        consumer.constraint(next_zs[i] * rhs_prod - local_zs[i] * lhs_prod)
