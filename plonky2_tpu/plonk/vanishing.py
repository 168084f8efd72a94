"""Vanishing-polynomial evaluation, generic over the field context.

Twin of reference plonk/vanishing_poly.rs:54-230 (`eval_vanishing_poly` /
`eval_vanishing_poly_base_batch`).  One field-polymorphic implementation:
the prover calls it with device GF arrays spanning the whole quotient coset
(replacing the reference's 32-point packed-SIMD batches), the verifier with
host E2 extension scalars at zeta.

Constraint ordering (must match for alpha-combination parity):
  [L_0(x)(Z(x)-1) per challenge] ++ [partial-product checks per challenge]
  ++ [filtered gate constraints].
"""

from __future__ import annotations

import numpy as np

from .gates.base import EvalVars

UNUSED_SELECTOR = (1 << 32) - 1  # u32::MAX (gates/selectors.rs:14)


def _elem(ctx, v):
    """Lift a host integer challenge to a ctx element; pass elements through.

    Lets one implementation serve the prover/verifier (integer challenges)
    and the recursive verifier (challenges are circuit targets)."""
    if isinstance(v, (int, np.integer)):
        return ctx.constant(int(v))
    return v


def compute_filter(ctx, row: int, group: range, s, many_selectors: bool):
    """prod over {i in group, i != row} (+UNUSED if many) of (i - s)
    (reference gates/gate.rs:277)."""
    acc = None
    idxs = [i for i in group if i != row]
    if many_selectors:
        idxs.append(UNUSED_SELECTOR)
    for i in idxs:
        term = ctx.constant(i) - s
        acc = term if acc is None else acc * term
    return acc if acc is not None else ctx.one()


def evaluate_gate_constraints(ctx, common, vars: EvalVars) -> list:
    """Filtered sum of all gate constraints (vanishing_poly.rs:675)."""
    num_selectors = common.selectors_info.num_selectors()
    constraints = [None] * common.num_gate_constraints
    for i, gate in enumerate(common.gates):
        sel_idx = common.selectors_info.selector_indices[i]
        group = common.selectors_info.groups[sel_idx]
        filt = compute_filter(ctx, i, group, vars.local_constants[sel_idx],
                              num_selectors > 1)
        inner_vars = EvalVars(
            local_constants=vars.local_constants[num_selectors:],
            local_wires=vars.local_wires,
            public_inputs_hash=vars.public_inputs_hash,
        )
        for j, c in enumerate(gate.eval_unfiltered(ctx, inner_vars)):
            fc = filt * c
            constraints[j] = fc if constraints[j] is None else constraints[j] + fc
    return [c if c is not None else ctx.zero() for c in constraints]


def check_partial_products(numerators, denominators, partials, z_x, z_gx,
                           max_degree: int) -> list:
    """acc_{i} * prod(num_chunk) - acc_{i+1} * prod(den_chunk) per chunk
    (reference util/partial_products.rs:52)."""
    accs = [z_x] + list(partials) + [z_gx]
    out = []
    for ci, start in enumerate(range(0, len(numerators), max_degree)):
        nume = numerators[start:start + max_degree]
        deno = denominators[start:start + max_degree]
        nprod = nume[0]
        for t in nume[1:]:
            nprod = nprod * t
        dprod = deno[0]
        for t in deno[1:]:
            dprod = dprod * t
        out.append(accs[ci] * nprod - accs[ci + 1] * dprod)
    return out


def eval_vanishing_poly(ctx, common, x, vars: EvalVars, local_zs, next_zs,
                        partial_products, s_sigmas, betas, gammas, alphas,
                        l_0_x) -> list:
    """Returns one combined value per alpha challenge.

    x: the evaluation point (element); l_0_x: L_0(x) precomputed (element);
    betas/gammas/alphas: python ints (base-field challenges);
    local_zs/next_zs: list per challenge; partial_products: flat list
    (num_challenges * num_partial_products); s_sigmas: list per routed wire.
    """
    max_degree = common.quotient_degree_factor
    num_prods = common.num_partial_products
    num_routed = common.config.num_routed_wires

    constraint_terms = evaluate_gate_constraints(ctx, common, vars)

    vanishing_z_1_terms = []
    vanishing_partial_products_terms = []

    for i in range(common.config.num_challenges):
        z_x = local_zs[i]
        z_gx = next_zs[i]
        vanishing_z_1_terms.append(l_0_x * (z_x - ctx.one()))

        beta = _elem(ctx, betas[i])
        gamma = _elem(ctx, gammas[i])
        numerators = []
        denominators = []
        for j in range(num_routed):
            wire = vars.local_wires[j]
            # wire + beta * k_j * x + gamma
            numerators.append(
                wire + x * (beta * ctx.constant(int(common.k_is[j]))) + gamma)
            denominators.append(
                wire + s_sigmas[j] * beta + gamma)

        cur_partials = partial_products[i * num_prods:(i + 1) * num_prods]
        vanishing_partial_products_terms.extend(
            check_partial_products(numerators, denominators, cur_partials,
                                   z_x, z_gx, max_degree))

    terms = vanishing_z_1_terms + vanishing_partial_products_terms + constraint_terms

    # reduce_with_powers_multi (plonk_common.rs:97): Horner from the last term
    out = []
    for a in alphas:
        alpha_c = _elem(ctx, a)
        acc = ctx.zero()
        for t in reversed(terms):
            acc = acc * alpha_c + t
        out.append(acc)
    return out


_P = 0xFFFFFFFF00000001
