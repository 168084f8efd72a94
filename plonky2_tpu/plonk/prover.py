"""PLONK prover (twin of reference plonk/prover.rs:102-744).

Pipeline stays the reference's; each stage is re-shaped for TPU:
  * witness generation: leveled batched numpy (WitnessSchedule);
  * wire/partial-product/quotient commitments: batched device NTT + Merkle;
  * Z and partial products: log-depth prefix products over rows instead of
    the reference's sequential row walk (prover.rs:359);
  * quotient: gate constraints evaluated over the WHOLE 8n coset at once
    (replacing the 32-point packed-SIMD batches of prover.rs:574).
"""

from __future__ import annotations

import numpy as np

from ..field import gl64, ntt
from ..field.extension import GF2
from ..field.goldilocks import GF, batch_inv
from ..field.polynomial import eval_polys_at_ext, powers_ext
from ..fri.oracle import COSET_SHIFT, PolynomialBatch
from ..iop.challenger import Challenger, permutation_for
from ..hash.hashing import hash_no_pad_np
from ..utils.bits import reverse_index_bits_perm
from .circuit_data import CommonCircuitData, ProverOnlyCircuitData
from .gates.base import BaseBatchCtx, EvalVars
from .proof import OpeningSet, Proof, ProofWithPublicInputs
from .vanishing import eval_vanishing_poly
from .witness import PartialWitness

P = gl64.ORDER_INT


def prove(prover_data: ProverOnlyCircuitData, common: CommonCircuitData,
          inputs: PartialWitness, timing=None,
          mesh=None) -> ProofWithPublicInputs:
    """mesh: a jax.sharding.Mesh runs the whole pipeline distributed
    (parallel/plonk_prover.py) and returns a byte-identical proof."""
    if mesh is not None:
        from ..parallel.plonk_prover import prove_sharded
        return prove_sharded(prover_data, common, inputs, mesh,
                             timing=timing)
    from ..utils.timing import TimingTree
    timing = timing if timing is not None else TimingTree("prove")
    config = common.config
    num_challenges = config.num_challenges
    degree = common.degree()
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height

    # 1. witness generation (host, leveled batches)
    with timing.scope("generate witness"):
        wires_matrix, all_values = prover_data.schedule.generate(inputs)
    public_inputs = prover_data.schedule.values_of(all_values,
                                                   prover_data.public_inputs)
    public_inputs = gl64.to_canonical(public_inputs)
    public_inputs_hash = hash_no_pad_np(public_inputs)

    # 2. wires commitment
    wires_values = GF.from_u64(wires_matrix)
    zk = config.zero_knowledge
    hasher = config.hasher
    with timing.scope("compute wires commitment"):
        wires_commitment = PolynomialBatch.from_values(
            wires_values, rate_bits, zk, cap_height, hasher=hasher)

    challenger = Challenger(permutation_for(hasher))
    challenger.observe_hash(prover_data.circuit_digest)
    challenger.observe_hash(public_inputs_hash)
    challenger.observe_cap(wires_commitment.merkle_tree.cap)

    betas = challenger.get_n_challenges(num_challenges)
    gammas = challenger.get_n_challenges(num_challenges)

    # lookup deltas: 4 coins per challenge, reusing betas/gammas as the
    # first 2*nc (reference plonk/get_challenges.rs:54-65)
    has_lookup = common.has_lookup()
    if has_lookup:
        extra = challenger.get_n_challenges(2 * num_challenges)
        deltas = np.concatenate([betas, gammas, extra])
    else:
        deltas = np.zeros(0, dtype=np.uint64)

    # 3. partial products + Z polys (device, prefix products over rows)
    with timing.scope("compute partial products"):
        zs_partial_products = _all_partial_products_and_zs(
            wires_matrix, betas, gammas, prover_data, common)
    if has_lookup:
        lookup_polys = _compute_all_lookup_polys(wires_matrix, deltas,
                                                 prover_data, common)
        zs_partial_products = GF.concatenate(
            [zs_partial_products, GF.from_u64(lookup_polys)], axis=0)
    with timing.scope("commit to partial products and Z's"):
        pp_commitment = PolynomialBatch.from_values(
            zs_partial_products, rate_bits, zk, cap_height, hasher=hasher)
    challenger.observe_cap(pp_commitment.merkle_tree.cap)

    alphas = challenger.get_n_challenges(num_challenges)

    # 4. quotient polynomials
    with timing.scope("compute quotient polys"):
        quotient_chunks = _compute_quotient_polys(
            common, prover_data, public_inputs_hash, wires_commitment,
            pp_commitment, betas, gammas, alphas, deltas)
    with timing.scope("commit to quotient polys"):
        quotient_commitment = PolynomialBatch.from_coeffs(
            quotient_chunks, rate_bits, zk, cap_height, hasher=hasher)
    challenger.observe_cap(quotient_commitment.merkle_tree.cap)

    # 5. openings at zeta, g*zeta
    zeta_np = challenger.get_extension_challenge()
    assert not _in_subgroup(zeta_np, common.degree_bits()), \
        "opening point is in the subgroup"
    with timing.scope("construct the opening set"):
        openings = _opening_set(zeta_np, prover_data.constants_sigmas_commitment,
                                wires_commitment, pp_commitment,
                                quotient_commitment, common)
    for batch in openings.to_fri_openings().batches:
        for v in batch.values:
            challenger.observe_extension_element(v)

    instance = common.get_fri_instance(zeta_np)
    with timing.scope("compute opening proofs (FRI)"):
        opening_proof = PolynomialBatch.prove_openings(
            instance,
            [prover_data.constants_sigmas_commitment, wires_commitment,
             pp_commitment, quotient_commitment],
            challenger, common.fri_params, timing=timing)

    proof = Proof(
        wires_cap=wires_commitment.merkle_tree.cap,
        plonk_zs_partial_products_cap=pp_commitment.merkle_tree.cap,
        quotient_polys_cap=quotient_commitment.merkle_tree.cap,
        openings=openings,
        opening_proof=opening_proof,
    )
    return ProofWithPublicInputs(proof, public_inputs)


def _in_subgroup(zeta: np.ndarray, degree_bits: int) -> bool:
    from ..field import gl64ext
    z = gl64ext.pow_int(np.asarray(zeta, np.uint64), 1 << degree_bits)
    return bool(gl64ext.equal(z, gl64ext.ONE))


_PP_JIT_CACHE: dict = {}


def _all_partial_products_and_zs(wires_matrix: np.ndarray, betas, gammas,
                                 prover_data, common) -> GF:
    """Returns GF (num_challenges*(1+num_prods), n): [Z_c ...] ++ [partials_c ...]
    (prover.rs:330-415).

    The whole phase runs as ONE jitted program per circuit shape
    (off-CPU), with the beta/gamma challenges as TRACED scalars — the
    eager version paid a tunnel round-trip per column op AND retraced
    per proof (fresh challenge constants)."""
    import jax

    n = common.degree()
    num_routed = common.config.num_routed_wires
    deg = common.quotient_degree_factor
    num_prods = common.num_partial_products
    nc = len(betas)

    bg_np = np.stack([np.asarray([int(b) for b in betas], np.uint64),
                      np.asarray([int(g) for g in gammas], np.uint64)],
                     axis=1)  # (nc, 2)

    key = (n, num_routed, deg, num_prods, nc)
    fn = _PP_JIT_CACHE.get(key)
    if fn is None:
        def run(routed: GF, sigmas: GF, s_id: GF, bg: GF) -> GF:
            zs = []
            partials = []
            for c in range(nc):
                b = bg[c, 0]
                g = bg[c, 1]
                numer = routed + s_id * b + g
                denom = routed + sigmas * b + g
                quotients = numer * batch_inv(denom)  # (n, routed)
                chunks = quotients.reshape(n, (num_prods + 1), deg)
                cp = chunks[:, :, 0]
                for j in range(1, deg):
                    cp = cp * chunks[:, :, j]
                row_total = cp[:, 0]
                for j in range(1, num_prods + 1):
                    row_total = row_total * cp[:, j]
                z = _exclusive_prefix_product(row_total)  # (n,) Z(x_i)
                run_p = z
                pps = []
                for kk in range(num_prods):
                    run_p = run_p * cp[:, kk]
                    pps.append(run_p)
                zs.append(z)
                partials.extend(pps)
            return GF.stack(zs + partials, axis=0)

        if jax.default_backend() != "cpu":
            run = jax.jit(run)
        _PP_JIT_CACHE[key] = fn = run

    routed = GF.from_u64(wires_matrix[:num_routed].T)  # (n, routed)
    sigmas = GF.from_u64(prover_data.sigmas)  # (n, routed)
    x = GF.from_u64(prover_data.subgroup).reshape(-1, 1)  # (n, 1)
    k = GF.from_u64(common.k_is).reshape(1, -1)  # (1, routed)
    return fn(routed, sigmas, x * k, GF.from_u64(bg_np))


def _compute_all_lookup_polys(wires_matrix: np.ndarray, deltas: np.ndarray,
                              prover_data, common) -> np.ndarray:
    """(num_challenges * num_lookup_polys, n) u64: per challenge, RE then the
    partial SLDC columns (reference plonk/prover.rs:425-545)."""
    nc = common.config.num_challenges
    out = [
        _compute_lookup_polys(wires_matrix,
                              deltas[4 * i:4 * (i + 1)], prover_data, common)
        for i in range(nc)
    ]
    return np.concatenate(out, axis=0)


def _compute_lookup_polys(wires_matrix: np.ndarray, deltas4: np.ndarray,
                          prover_data, common) -> np.ndarray:
    from .gates.lookup import LookupGate, LookupTableGate

    n = common.degree()
    num_lu_slots = LookupGate.slots_from_config(common.config)
    lu_degree = common.quotient_degree_factor - 1
    num_partial = -(-num_lu_slots // lu_degree)
    num_lut_slots = LookupTableGate.slots_from_config(common.config)
    lut_degree = -(-num_lut_slots // num_partial)

    d_a, d_b, d_alpha, d_delta = (np.uint64(deltas4[i]) for i in range(4))
    polys = np.zeros((num_partial + 1, n), dtype=np.uint64)

    for (last_lu, last_lut, first_lut) in prover_data.lookup_rows:
        # --- LUT region: RE + partial Sums, rows descending ---
        rows = np.arange(last_lut, first_lut + 1)
        inp = wires_matrix[
            [LookupTableGate.wire_ith_looked_inp(s) for s in range(num_lut_slots)]
        ][:, rows]  # (S, R)
        outp = wires_matrix[
            [LookupTableGate.wire_ith_looked_out(s) for s in range(num_lut_slots)]
        ][:, rows]
        mult = wires_matrix[
            [LookupTableGate.wire_ith_multiplicity(s) for s in range(num_lut_slots)]
        ][:, rows]
        looked_combos = gl64.add(inp, gl64.mul(d_a, outp))      # (S, R)
        lookup_combos = gl64.add(inp, gl64.mul(d_b, outp))
        inv_alpha_minus = gl64.batch_inv(gl64.sub(d_alpha, looked_combos))
        weighted = gl64.mul(mult, inv_alpha_minus)              # (S, R)

        # per-row partial sums for each SLDC slot group
        slot_sums = np.zeros((num_partial, len(rows)), dtype=np.uint64)
        for p in range(num_partial):
            for s in range(p * lut_degree,
                           min((p + 1) * lut_degree, num_lut_slots)):
                slot_sums[p] = gl64.add(slot_sums[p], weighted[s])

        for row in range(first_lut, last_lut - 1, -1):
            ri = row - last_lut
            new_re = polys[0][row + 1] if row + 1 < n else np.uint64(0)
            for s in range(num_lut_slots):
                new_re = gl64.add(gl64.mul(new_re, d_delta), lookup_combos[s, ri])
            polys[0][row] = new_re
            for p in range(num_partial):
                prev = polys[num_partial][row + 1] if p == 0 else polys[p][row]
                polys[p + 1][row] = gl64.add(prev, slot_sums[p, ri])

        # --- LU region: partial LDCs, rows descending ---
        rows = np.arange(last_lu, last_lut)
        if len(rows):
            inp = wires_matrix[
                [LookupGate.wire_ith_looking_inp(s) for s in range(num_lu_slots)]
            ][:, rows]
            outp = wires_matrix[
                [LookupGate.wire_ith_looking_out(s) for s in range(num_lu_slots)]
            ][:, rows]
            looking_combos = gl64.add(inp, gl64.mul(d_a, outp))
            inv_looking = gl64.batch_inv(gl64.sub(d_alpha, looking_combos))
            slot_sums = np.zeros((num_partial, len(rows)), dtype=np.uint64)
            for p in range(num_partial):
                for s in range(p * lu_degree,
                               min((p + 1) * lu_degree, num_lu_slots)):
                    slot_sums[p] = gl64.add(slot_sums[p], inv_looking[s])
            for row in range(last_lut - 1, last_lu - 1, -1):
                ri = row - last_lu
                for p in range(num_partial):
                    prev = polys[num_partial][row + 1] if p == 0 else polys[p][row]
                    polys[p + 1][row] = gl64.sub(prev, slot_sums[p, ri])

    return polys


def _exclusive_prefix_product(v: GF) -> GF:
    """[1, v0, v0 v1, ...] — Hillis-Steele inclusive scan, shifted."""
    n = v.shape[0]
    x = v
    shift = 1
    while shift < n:
        shifted = GF.concatenate([GF.ones((shift,)), x[: n - shift]], axis=0)
        x = x * shifted
        shift *= 2
    return GF.concatenate([GF.ones((1,)), x[: n - 1]], axis=0)


def _jitted_quotient(common):
    """One jitted program per circuit for the whole quotient phase
    (coset vanishing eval -> /Z_H -> coset IFFT -> chunks).

    The eager formulation dispatched tens of thousands of device ops per
    prove (~70 s of pure dispatch/tracing overhead at the m=64 matmul
    shape, BASELINE.md round 5); tracing once per CommonCircuitData and
    passing the per-proof challenges as ARRAYS (indexed into traced
    scalars — eval_vanishing_poly's _elem passes elements through)
    collapses that to one executable call."""
    fn = getattr(common, "_quotient_jit", None)
    if fn is not None:
        return fn

    import jax

    n = common.degree()
    qdb = (common.quotient_degree_factor - 1).bit_length()
    next_step = 1 << qdb
    lde_n = n << qdb
    nc = common.config.num_challenges
    num_constants = common.num_constants
    sig = common.sigmas_range()
    ppr = common.partial_products_range()
    lk_start = common.num_zs_partial_products_polys()
    lk_stop = lk_start + common.num_all_lookup_polys()
    nd = 4 * nc if common.has_lookup() else 0

    big_subgroup = gl64.two_adic_subgroup(common.degree_bits() + qdb)
    xs_np = gl64.mul(big_subgroup, np.uint64(COSET_SHIFT))
    zh = _z_h_on_coset(common.degree_bits(), qdb)
    zh_tiled_np = np.tile(zh, n)
    zh_inv_tiled_np = np.tile(gl64.batch_inv(zh), n)
    next_perm = (np.arange(lde_n) + next_step) % lde_n

    @jax.jit
    def qfn(cs: GF, wires: GF, pps: GF, betas_gf: GF, gammas_gf: GF,
            alphas_gf: GF, deltas_gf: GF, pis_hash_gf: GF) -> GF:
        pps_next = pps.take(next_perm, axis=-1)
        ctx = BaseBatchCtx()
        xs = GF.from_u64(xs_np)
        zh_tiled = GF.from_u64(zh_tiled_np)
        l_0 = zh_tiled * batch_inv((xs - GF.ones(())) * GF.full((), n))
        vars = EvalVars(
            local_constants=[cs[i] for i in range(num_constants)],
            local_wires=[wires[i] for i in range(common.config.num_wires)],
            public_inputs_hash=[pis_hash_gf[i] for i in range(4)])
        vanishing = eval_vanishing_poly(
            ctx, common, xs, vars,
            local_zs=[pps[i] for i in range(nc)],
            next_zs=[pps_next[i] for i in range(nc)],
            partial_products=[pps[i] for i in range(ppr.start, ppr.stop)],
            s_sigmas=[cs[i] for i in range(sig.start, sig.stop)],
            betas=[betas_gf[i] for i in range(nc)],
            gammas=[gammas_gf[i] for i in range(nc)],
            alphas=[alphas_gf[i] for i in range(nc)], l_0_x=l_0,
            local_lookup_zs=[pps[i] for i in range(lk_start, lk_stop)],
            next_lookup_zs=[pps_next[i] for i in range(lk_start, lk_stop)],
            deltas=[deltas_gf[i] for i in range(nd)] if nd else None)
        zh_inv_tiled = GF.from_u64(zh_inv_tiled_np)
        quotient_values = GF.stack([v * zh_inv_tiled for v in vanishing],
                                   axis=0)
        quotient_coeffs = ntt.coset_intt(quotient_values, COSET_SHIFT)
        return quotient_coeffs.reshape(
            nc * common.quotient_degree_factor, n)

    common._quotient_jit = qfn
    return qfn


def _compute_quotient_polys(common, prover_data, public_inputs_hash,
                            wires_commitment, pp_commitment, betas, gammas,
                            alphas, deltas=None) -> GF:
    """Evaluate the vanishing polynomial over the whole quotient coset,
    divide by Z_H, and return quotient chunks (num_ch*deg_factor, n) coeffs.

    Off-CPU the phase runs as ONE jitted program per circuit
    (_jitted_quotient) — the eager formulation's per-op dispatch cost
    ~70 s at the m=64 matmul shape over the TPU tunnel.  XLA:CPU keeps
    the eager path: compiling the whole gate-constraint graph as one
    program is the known-pathological CPU case (CLAUDE.md), and the
    per-op dispatch is local there anyway.  Flag override:
    PLONKY2_TPU_JIT_QUOTIENT=1 forces the jit path, =0 forces eager."""
    import os

    import jax

    flag = os.environ.get("PLONKY2_TPU_JIT_QUOTIENT", "auto")
    use_jit = (flag == "1"
               or (flag == "auto" and jax.default_backend() != "cpu"))
    qdb = (common.quotient_degree_factor - 1).bit_length()  # log2_ceil(8) = 3
    rate_bits = common.config.fri_config.rate_bits
    assert qdb <= rate_bits
    step = 1 << (rate_bits - qdb)

    # LDE values at natural-order coset points, every `step`th point
    def lde_rows(commitment):
        return commitment.lde_values_natural()[:, ::step]  # (k, lde_n)

    cs = lde_rows(prover_data.constants_sigmas_commitment)
    wires = lde_rows(wires_commitment)
    pps = lde_rows(pp_commitment)

    if use_jit:
        def chal(arr):
            a = np.asarray(arr if arr is not None and len(arr) else [0],
                           np.uint64)
            return GF.from_u64(a)

        return _jitted_quotient(common)(
            cs, wires, pps, chal(betas), chal(gammas), chal(alphas),
            chal(deltas), chal(np.asarray(public_inputs_hash, np.uint64)))
    return _compute_quotient_polys_eager(
        common, cs, wires, pps, public_inputs_hash, betas, gammas, alphas,
        deltas)


def _compute_quotient_polys_eager(common, cs, wires, pps,
                                  public_inputs_hash, betas, gammas,
                                  alphas, deltas=None) -> GF:
    n = common.degree()
    qdb = (common.quotient_degree_factor - 1).bit_length()
    next_step = 1 << qdb
    lde_n = n << qdb

    pps_next = pps.take((np.arange(lde_n) + next_step) % lde_n, axis=-1)

    nc = common.config.num_challenges
    local_constants = [cs[i] for i in range(common.num_constants)]
    s_sigmas = [cs[i] for i in common.sigmas_range()]
    local_wires = [wires[i] for i in range(common.config.num_wires)]
    local_zs = [pps[i] for i in range(nc)]
    next_zs = [pps_next[i] for i in range(nc)]
    partial_products = [pps[i] for i in common.partial_products_range()]
    lk_start = common.num_zs_partial_products_polys()
    lk_stop = lk_start + common.num_all_lookup_polys()
    local_lookup_zs = [pps[i] for i in range(lk_start, lk_stop)]
    next_lookup_zs = [pps_next[i] for i in range(lk_start, lk_stop)]

    ctx = BaseBatchCtx()
    pis_hash = [GF.full((), int(h)) for h in public_inputs_hash]
    # points: shifted big subgroup, natural order
    big_subgroup = gl64.two_adic_subgroup(common.degree_bits() + qdb)
    xs = GF.from_u64(gl64.mul(big_subgroup, np.uint64(COSET_SHIFT)))

    # Z_H(x) on the coset has period 2^qdb; L_0(x) = Z_H(x) / (n (x-1))
    zh = _z_h_on_coset(common.degree_bits(), qdb)  # (2^qdb,) values
    zh_tiled = GF.from_u64(np.tile(zh, n))
    denom = (xs - GF.ones(())) * GF.full((), n)
    l_0 = zh_tiled * batch_inv(denom)

    vars = EvalVars(local_constants=local_constants, local_wires=local_wires,
                    public_inputs_hash=pis_hash)
    vanishing = eval_vanishing_poly(
        ctx, common, xs, vars, local_zs, next_zs, partial_products, s_sigmas,
        betas, gammas, alphas, l_0, local_lookup_zs=local_lookup_zs,
        next_lookup_zs=next_lookup_zs, deltas=deltas)

    zh_inv_tiled = GF.from_u64(np.tile(gl64.batch_inv(zh), n))
    quotient_values = GF.stack([v * zh_inv_tiled for v in vanishing], axis=0)
    quotient_coeffs = ntt.coset_intt(quotient_values, COSET_SHIFT)
    # split into deg_factor chunks of length n each: coeffs (nc, 8n)
    chunks = quotient_coeffs.reshape(nc * common.quotient_degree_factor, n)
    return chunks


def _z_h_on_coset(degree_bits: int, qdb: int) -> np.ndarray:
    """Z_H(shift * h^i) = shift^n * (h^n)^i - 1, period 2^qdb
    (reference field/src/zero_poly_coset.rs:7)."""
    n = 1 << degree_bits
    shift_pow_n = gl64.pow_scalar(COSET_SHIFT, n)
    h = gl64.primitive_root_of_unity(degree_bits + qdb)
    h_pow_n = gl64.pow_scalar(h, n)  # primitive 2^qdb-th root
    out = np.empty(1 << qdb, dtype=np.uint64)
    acc = shift_pow_n
    for i in range(1 << qdb):
        out[i] = (acc - 1) % P
        acc = (acc * h_pow_n) % P
    return out


def _opening_set(zeta_np, constants_sigmas_commitment, wires_commitment,
                 pp_commitment, quotient_commitment, common) -> OpeningSet:
    """Evaluate every committed polynomial at zeta (Zs also at g*zeta)."""
    n = common.degree()
    zeta = GF2.from_u64_pair(zeta_np[0], zeta_np[1])
    g = gl64.primitive_root_of_unity(common.degree_bits())
    zeta_g = zeta * GF.full((), g)

    zpow = powers_ext(zeta, n)
    zgpow = powers_ext(zeta_g, n)

    nc = common.config.num_challenges
    num_zs_pp = common.num_zs_partial_products_polys()
    cs_eval = eval_polys_at_ext(constants_sigmas_commitment.polynomials, zpow).to_u64()
    wires_eval = eval_polys_at_ext(wires_commitment.polynomials, zpow).to_u64()
    pp_eval = eval_polys_at_ext(pp_commitment.polynomials, zpow).to_u64()
    # at g*zeta: Zs and (if any) lookup polys (proof.rs:327)
    pp_next_eval = eval_polys_at_ext(
        pp_commitment.polynomials[:nc], zgpow).to_u64()
    lookup_next_eval = eval_polys_at_ext(
        pp_commitment.polynomials[num_zs_pp:], zgpow).to_u64() \
        if common.has_lookup() else np.zeros((0, 2), dtype=np.uint64)
    quot_eval = eval_polys_at_ext(quotient_commitment.polynomials, zpow).to_u64()

    cr = common.constants_range()
    sr = common.sigmas_range()
    return OpeningSet(
        constants=cs_eval[cr.start:cr.stop],
        plonk_sigmas=cs_eval[sr.start:sr.stop],
        wires=wires_eval,
        plonk_zs=pp_eval[:nc],
        plonk_zs_next=pp_next_eval,
        partial_products=pp_eval[nc:num_zs_pp],
        quotient_polys=quot_eval,
        lookup_zs=pp_eval[num_zs_pp:],
        lookup_zs_next=lookup_next_eval,
    )
