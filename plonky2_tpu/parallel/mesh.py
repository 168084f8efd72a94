"""Device-mesh utilities and sharded proving primitives.

The reference's only parallel substrate is rayon (maybe_rayon/src/lib.rs);
the TPU-native equivalents are:
  * data parallelism over polynomial columns: shard the (num_polys, n)
    batch over the mesh — NTT butterflies act along the unsharded row axis,
    so XLA compiles them with zero communication;
  * "sequence" parallelism over trace rows: a four-step NTT factorisation
    N = N1 * N2 with local NTTs + a twiddle scale + an all_to_all mesh
    transpose over ICI (the transpose the reference prototypes in
    projects/cache-friendly-fft/transpose.py).
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f=None, **kw):
    """jax.shard_map with replication checking off (our GF pytrees defeat
    the static replication inference after collectives)."""
    try:
        return _shard_map(f, check_vma=False, **kw) if f else partial(
            _shard_map, check_vma=False, **kw)
    except TypeError:
        return _shard_map(f, check_rep=False, **kw) if f else partial(
            _shard_map, check_rep=False, **kw)

from ..field import gl64, ntt
from ..field.goldilocks import GF
from ..hash.hashing import hash_or_noop
from ..utils.bits import log2_strict


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_polys(polys: GF, mesh: Mesh, axis: str = "d") -> GF:
    """Shard a (num_polys, n) batch over its column axis."""
    sh = NamedSharding(mesh, PSpec(axis, None))
    return GF(jax.device_put(polys.lo, sh), jax.device_put(polys.hi, sh))


def dp_lde_and_leaf_hash(polys: GF, rate_bits: int, shift: int, mesh: Mesh,
                         axis: str = "d"):
    """Data-parallel LDE + per-shard Merkle leaf hashing.

    polys: (num_polys, n) sharded over num_polys.  Each device LDEs its
    columns locally; leaf hashing needs whole rows, so one all_to_all
    transpose re-shards by rows (per-device memory stays full/nd — an
    all_gather of the LDE matrix would replicate it everywhere).
    Returns leaf digests (8n, 4), row-sharded over the mesh.
    """
    nd = mesh.devices.size

    @partial(shard_map, mesh=mesh, in_specs=(PSpec(axis, None),),
             out_specs=PSpec(axis, None))
    def step(blk: GF) -> GF:
        values = ntt.lde(blk, rate_bits, shift=shift)  # (k/nd, 8n) local
        rows = GF(
            jax.lax.all_to_all(values.lo, axis, split_axis=1, concat_axis=0,
                               tiled=True),
            jax.lax.all_to_all(values.hi, axis, split_axis=1, concat_axis=0,
                               tiled=True))              # (k, 8n/nd)
        return hash_or_noop(rows.transpose(1, 0))

    return step(polys)


def four_step_ntt(x: GF, mesh: Mesh, axis: str = "d") -> GF:
    """Distributed NTT over a length-N vector sharded across the mesh.

    Bailey four-step with N = N1 * N2, input viewed as A[j1, j2] = x[j1 + N1*j2]:
      1. length-N2 NTTs along j2 (local rows),
      2. twiddle scale by w^(j1*k2),
      3. all_to_all transpose so j1 becomes local,
      4. length-N1 NTTs along j1.
    Output is the natural-order NTT, returned sharded over k1 blocks.
    """
    n = x.shape[-1]
    log_n = log2_strict(n)
    nd = mesh.devices.size
    log_n1 = log_n // 2
    n1, n2 = 1 << log_n1, 1 << (log_n - log_n1)
    assert n1 % nd == 0 and n2 % nd == 0

    # A[j1, j2] = x[j1 + N1 j2]
    a = x.reshape(n2, n1).transpose(1, 0)  # (n1, n2)

    # twiddles tw[j1, k2] = w^(j1*k2), built with log2(n1) vectorised
    # doubling passes (tw[m:2m] = tw[:m] * tw[m]) — no per-row Python loop
    w = gl64.primitive_root_of_unity(log_n)
    tw = np.ones((n1, n2), dtype=np.uint64)
    row_m = gl64.powers(w, n2)  # tw[1]
    m = 1
    while m < n1:
        cnt = min(m, n1 - m)
        tw[m:m + cnt] = gl64.mul(tw[:cnt], row_m[None, :])
        row_m = gl64.mul(row_m, row_m)
        m *= 2
    tw_gf = GF.from_u64(tw)

    @partial(shard_map, mesh=mesh, in_specs=(PSpec(axis, None), PSpec(axis, None)),
             out_specs=PSpec(None, axis))
    def step(a_blk: GF, tw_blk: GF) -> GF:
        b = ntt.ntt(a_blk)            # length-n2 NTTs along local rows
        b = b * tw_blk                # twiddles
        # mesh transpose: split k2 axis, gather j1 axis
        lo = jax.lax.all_to_all(b.lo, axis, split_axis=1, concat_axis=0, tiled=True)
        hi = jax.lax.all_to_all(b.hi, axis, split_axis=1, concat_axis=0, tiled=True)
        c = GF(lo, hi)                # (n1, n2/nd) with j1 local
        c = ntt.ntt(c.transpose(1, 0))  # length-n1 NTTs along j1
        return c.transpose(1, 0)      # (n1, n2/nd): C[k1, k2_local]

    c = step(shard_polys(a, mesh, axis), shard_polys(tw_gf, mesh, axis))
    # X[k2 + N2 k1] = C[k1, k2] -> flatten C row-major
    return c.reshape(n)
