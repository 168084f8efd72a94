"""PolynomialBatch: the batch FRI polynomial commitment (oracle).

TPU twin of reference fri/oracle.rs:43-220.  The full commit pipeline runs
as batched device work: batched IFFT over the polynomial columns, stage-skip
coset LDE, transpose to row-leaves, bit-reversal gather, and a level-batched
Poseidon Merkle tree.  `prove_openings` computes the FRI composition
polynomial with alpha-powers on device and performs the linear division
(F(X) - F(z))/(X - z) in the *value domain* over the small subgroup (a batch
inversion + IFFT) instead of the reference's sequential synthetic division —
same quotient, but parallel instead of a length-n dependency chain.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import lru_cache

import numpy as np

from ..field import gl64, ntt
from ..field.extension import GF2
from ..field.goldilocks import GF, batch_inv
from ..field.polynomial import eval_ext_polys_at_ext, powers_ext
from ..hash.merkle import MerkleTree
from ..iop.challenger import Challenger
from ..utils.bits import log2_strict, reverse_bits, reverse_index_bits_perm
from .config import FriParams
from .proof import FriProof
from .prover import fri_proof
from .structure import FriInstanceInfo

SALT_SIZE = 4
COSET_SHIFT = gl64.MULTIPLICATIVE_GROUP_GENERATOR  # F::coset_shift() = 7


def _use_mxu_lde(n: int, rate_bits: int) -> bool:
    """Select the commitment LDE implementation.

    PLONKY2_TPU_LDE_IMPL: "auto" (default) | "mxu" | "radix".  The fused
    MXU kernel (ops/mxu_lde_pallas.py) needs a TPU backend and shapes
    where a lane-aligned step-2 size divides n; "auto" turns it on
    whenever those hold (measured 2.3 G vs 0.8 G elems/s radix on v5e,
    BASELINE.md).
    """
    impl = os.environ.get("PLONKY2_TPU_LDE_IMPL", "auto")
    if impl == "radix":
        return False
    import jax
    if jax.default_backend() == "cpu":
        return False
    if n < 4096 or n % 128:
        return False
    # kernel preconditions: lane-aligned step-2 size, and both contraction
    # lengths (n1z = n/n2 for step 1, n2 for step 2) within the exactness
    # bound of the selected digit-plane dtype: 2^17 for int8 (s32
    # accumulation, per-contraction), 512 for the bf16 fallback (f32
    # 2^24-mantissa accumulation)
    from ..ops.mxu_lde_pallas import PLANE_DTYPE, pick_n2
    import jax.numpy as jnp
    import numpy as np
    n2 = pick_n2(int(np.log2(n)), rate_bits)
    bound = (1 << 17) if PLANE_DTYPE == jnp.int8 else 512
    if n2 % 128 or n // n2 > bound or n2 > bound:
        return False
    return impl in ("mxu", "auto")


@lru_cache(maxsize=None)
def _comp_quotient_fn(k: int, n: int):
    """One opening batch's alpha-composition + quotient as ONE jitted
    program (alpha and the opening point are traced, so fresh
    Fiat-Shamir values never retrace)."""
    import jax

    def run(polys: GF, alpha: GF2, z: GF2, subgroup: GF) -> GF2:
        apow = powers_ext(alpha, k)
        comp = GF2((polys * apow.a.reshape(-1, 1)).sum(axis=0),
                   (polys * apow.b.reshape(-1, 1)).sum(axis=0))
        return batch_opening_quotient(comp, z, n, subgroup)

    return run if jax.default_backend() == "cpu" else jax.jit(run)


def batch_opening_quotient(comp: GF2, point: np.ndarray, n: int,
                           subgroup: GF) -> GF2:
    """Coefficients of (F(X) - F(z)) / (X - z) for one opening batch.

    Value-domain division over the coset gH — NOT H itself, since opening
    points may lie in H (the CTL batches open Z columns at g^{n-1};
    evm/src/stark.rs:83).  Shared by the single-chip prove_openings and
    the distributed prover (parallel/stark_prover.py)."""
    z = point if isinstance(point, GF2) else \
        GF2.from_u64_pair(point[0], point[1])
    comp_vals = ntt.coset_ntt_ext(comp, COSET_SHIFT)
    fz = eval_ext_polys_at_ext(comp, powers_ext(z, n))
    num = comp_vals - fz.broadcast_to((n,))
    # 1/(x - z) for base x: conj/norm with one base batch inversion
    xa = subgroup * GF.full((), COSET_SHIFT) - z.a.broadcast_to((n,))
    zb = z.b.broadcast_to((n,))
    norm = xa.square() - zb.square().mul_small(7)
    ninv = batch_inv(norm)
    den_inv = GF2(xa * ninv, zb * ninv)  # (x-za, -(-zb)) -> conj has +zb
    quotient_vals = num * den_inv
    return ntt.coset_intt_ext(quotient_vals, COSET_SHIFT)


class PolynomialBatch:
    """A batch of committed polynomials (coefficients on device + Merkle tree)."""

    def __init__(self, polynomials: GF, merkle_tree: MerkleTree, degree_log: int,
                 rate_bits: int, blinding: bool, hasher: str = "poseidon"):
        self.polynomials = polynomials  # (num_polys, n) coefficient rows
        self.merkle_tree = merkle_tree
        self.degree_log = degree_log
        self.rate_bits = rate_bits
        self.blinding = blinding
        self.hasher = hasher
        self._lde_values = None

    @classmethod
    def from_values(cls, values: GF, rate_bits: int, blinding: bool,
                    cap_height: int, timing=None,
                    hasher: str = "poseidon") -> "PolynomialBatch":
        """values: (num_polys, n) evaluations over the subgroup."""
        coeffs = ntt.intt(values)
        return cls.from_coeffs(coeffs, rate_bits, blinding, cap_height, timing,
                               hasher)

    @classmethod
    def from_coeffs(cls, polynomials: GF, rate_bits: int, blinding: bool,
                    cap_height: int, timing=None,
                    hasher: str = "poseidon") -> "PolynomialBatch":
        n = polynomials.shape[-1]
        leaves_pre = None
        if _use_mxu_lde(n, rate_bits):
            # fused MXU kernel: the two-step four-step kernel
            # (ops/mxu_lde_pallas.py) up to n = 2^17, the three-step kernel
            # (ops/mxu_lde3_pallas.py — flagship-MAC-count at any n) above.
            # Output arrives in a permuted (t1, [t3,] t2) layout; one
            # gather recovers natural order and — when no salt columns
            # intervene — a composed gather produces the bit-reversed
            # Merkle leaf order directly.
            log_n = log2_strict(n)
            from ..ops import mxu_lde3_pallas as _mxu3
            # three-step kernel: opt-in while its Mosaic compile issue on
            # the chip is open (tools/mxu_lde20_bench.py round 5); the
            # balanced two-step split covers n > 2^17 at 1.08 G elems/s
            use3 = (log_n > 17 and _mxu3.use_mxu_lde3(log_n, rate_bits)
                    and os.environ.get("PLONKY2_TPU_LDE3", "0") == "1")
            if use3:
                n2, n3 = _mxu3.pick_n2_n3(log_n, rate_bits)
                mem = _mxu3.mxu_lde3(polynomials, rate_bits, COSET_SHIFT)
                nat_perm = _mxu3.natural_perm3_from_mem(log_n, rate_bits,
                                                        n2, n3)
                leaf_perm = _mxu3.leaf_perm3_from_mem(log_n, rate_bits,
                                                      n2, n3)
            else:
                from ..ops import mxu_lde_pallas as _mxu
                n2 = _mxu.pick_n2(log_n, rate_bits)
                mem = _mxu.mxu_lde(polynomials, rate_bits, COSET_SHIFT, n2)
                nat_perm = _mxu.natural_perm_from_mem(log_n, rate_bits, n2)
                leaf_perm = _mxu.leaf_perm_from_mem(log_n, rate_bits, n2)
            mem = mem.reshape(polynomials.shape[0], n << rate_bits)
            lde_values = mem.take(nat_perm, axis=-1)
            if not blinding:
                leaves_pre = mem.take(leaf_perm, axis=-1).transpose(1, 0)
        else:
            lde_values = ntt.lde(polynomials, rate_bits, shift=COSET_SHIFT)
        leaf_cols = lde_values
        if blinding:
            # SALT_SIZE random columns so leaf openings reveal nothing about
            # the committed values (fri/oracle.rs:109-126).  Salts must be
            # unpredictable for the zero-knowledge property to hold, so they
            # come from the OS CSPRNG (reference uses OsRng), rejection-free
            # reduced mod p (p is within 2^-32 of 2^64; the bias is
            # cryptographically negligible, matching Field::sample).
            count = SALT_SIZE * (n << rate_bits)
            raw = np.frombuffer(os.urandom(8 * count), dtype=np.uint64)
            salt = GF.from_u64(gl64.to_canonical(raw).reshape(
                SALT_SIZE, n << rate_bits))
            leaf_cols = GF.concatenate([lde_values, salt], axis=0)
        # rows of the evaluation matrix become Merkle leaves, in bit-reversed
        # order (reference fri/oracle.rs:81-100)
        if leaves_pre is not None:
            leaves = leaves_pre
        else:
            leaves = leaf_cols.transpose(1, 0)
            perm = reverse_index_bits_perm(leaves.shape[0])
            leaves = leaves.take(perm, axis=0)
        if hasher == "keccak":
            from ..hash.keccak_tree import BytesMerkleTree
            tree = BytesMerkleTree(leaves, cap_height)
        else:
            tree = MerkleTree(leaves, cap_height)
        batch = cls(polynomials, tree, log2_strict(n), rate_bits, blinding,
                    hasher)
        # natural-order LDE rows kept on device for the quotient pass
        batch._lde_values = lde_values
        return batch

    def lde_values_natural(self) -> GF:
        """(num_polys, n << rate_bits) evaluations in natural coset order."""
        if getattr(self, "_lde_values", None) is None:
            self._lde_values = ntt.lde(self.polynomials, self.rate_bits,
                                       shift=COSET_SHIFT)
        return self._lde_values

    @property
    def num_polys(self) -> int:
        return self.polynomials.shape[0]

    def get_lde_values(self, index: int, step: int = 1) -> np.ndarray:
        """Host fetch of one evaluation row (reference fri/oracle.rs:128)."""
        idx = reverse_bits(index * step, self.degree_log + self.rate_bits)
        return self.merkle_tree.leaves_np[idx]

    # -- batch opening proof (reference fri/oracle.rs:162) -------------------
    @staticmethod
    def prove_openings(instance: FriInstanceInfo, oracles: list,
                       challenger: Challenger, fri_params: FriParams,
                       timing=None) -> FriProof:
        from ..utils.timing import TimingTree
        timing = timing if timing is not None else TimingTree("openings")
        alpha_np = challenger.get_extension_challenge()
        alpha = GF2.from_u64_pair(alpha_np[0], alpha_np[1])

        n = 1 << fri_params.degree_bits
        # final_poly = sum_i alpha^(k_i) (F_i(X) - F_i(z_i)) / (X - z_i),
        # F_i = sum_j alpha^j f_ij; k_i chosen so each alpha power is unique
        # (the running `count`/`shift` bookkeeping of ReducingFactor).
        final_poly = None
        subgroup = GF.from_u64(gl64.two_adic_subgroup(fri_params.degree_bits))
        with timing.scope("alpha composition + opening quotients"):
            for batch in instance.batches:
                k = len(batch.polynomials)
                # composition poly coeffs: (n,) extension
                polys = GF.stack(
                    [oracles[p.oracle_index].polynomials[p.polynomial_index]
                     for p in batch.polynomials], axis=0)  # (k, n)
                quotient = _comp_quotient_fn(k, n)(
                    polys, alpha,
                    GF2.from_u64_pair(batch.point[0], batch.point[1]),
                    subgroup)
                if final_poly is None:
                    final_poly = quotient
                else:
                    shift_pow = alpha.pow_const(k)
                    final_poly = final_poly * shift_pow + quotient

        with timing.scope("final poly LDE"):
            lde_coeffs = GF2(
                GF.concatenate([final_poly.a, GF.zeros(((1 << fri_params.config.rate_bits) - 1) * n)]),
                GF.concatenate([final_poly.b, GF.zeros(((1 << fri_params.config.rate_bits) - 1) * n)]),
            )
            lde_values = ntt.lde_ext(final_poly, fri_params.config.rate_bits,
                                     shift=COSET_SHIFT)

        return fri_proof(
            [o.merkle_tree for o in oracles],
            lde_coeffs,
            lde_values,
            challenger,
            fri_params,
            hasher=oracles[0].hasher,
            timing=timing,
        )
