"""Multi-host mesh bring-up: the DCN-level distributed backend.

The in-process collectives (psum / all_gather / all_to_all / ppermute in
parallel/{mesh,prover,fri,groups}.py) are topology-agnostic: under
`shard_map` they compile against whatever Mesh they are given.  What a
multi-host pod needs on top is process bring-up — the reference's MPI/NCCL
bootstrap role — which in JAX is `jax.distributed.initialize` plus a mesh
spanning every process's devices.  This module wraps exactly that:

* `initialize(...)` — idempotent process-group bring-up, parameters from
  args or the standard env (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
  JAX_PROCESS_ID); a 1-process world is a no-op so the same prover script
  runs unchanged on a single chip, a host, or a pod.
* `global_mesh(...)` — a Mesh over the GLOBAL device list (all hosts).
  Every process must build it identically (jax.devices() is globally
  consistent after initialize).
* `host_local_to_global(...)` — assemble a global sharded array from
  per-process host shards (each host feeds only its local slice of the
  trace; no host ever materialises the full matrix).
* `replicated_from_host(...)` — broadcast process 0's host value to a
  fully-replicated global array (e.g. twiddle/constant tables).

Transcript discipline on a pod: the host-side Challenger runs on EVERY
process, and only ever consumes Merkle caps / opening values that are
fully replicated outputs of the sharded programs — so all processes
derive identical challenges with zero extra communication, exactly like
the replicated transcript of the single-process mesh paths.

Multi-process operation is exercised for real by
tests/test_distributed.py, which spawns a 2-process CPU world over a
localhost coordinator and cross-checks a sharded psum and a distributed
commitment against the single-process result.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Bring up the process group (idempotent).

    With num_processes == 1 (or nothing configured) this is a no-op:
    single-process runs — one chip, or one host driving a local mesh —
    need no coordinator.
    """
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if num_processes <= 1 or not coordinator_address:
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True


def global_mesh(axis: str = "d", n_devices: int | None = None) -> Mesh:
    """A 1-D mesh over the global device list (identical on all hosts)."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def process_count() -> int:
    return jax.process_count()


def host_local_to_global(local_np, mesh: Mesh, pspec: PSpec):
    """Assemble a global sharded array from per-process host shards.

    local_np: this process's contiguous slice along the sharded axis (the
    same slice layout as `jax.make_array_from_process_local_data`).  Works
    unchanged in a single-process world (where local IS global).
    """
    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(sharding, local_np)


def replicated_from_host(value_np, mesh: Mesh):
    """Replicate a host array (process-0-consistent) across the mesh."""
    ndim = np.asarray(value_np).ndim
    sharding = NamedSharding(mesh, PSpec(*([None] * ndim)))
    return jax.device_put(np.asarray(value_np), sharding)


def all_processes_equal(value_np) -> bool:
    """Cheap transcript-divergence tripwire: psum the value's hash across
    processes and compare (debug aid; the transcript is replicated by
    construction, this verifies a deployment hasn't broken that)."""
    import jax.numpy as jnp

    h = np.uint32(np.frombuffer(
        np.ascontiguousarray(value_np).tobytes(), np.uint8).sum())
    mesh = global_mesh()
    dev_count = mesh.devices.size

    @jax.jit
    def total(x):
        return x.sum()

    g = host_local_to_global(
        np.full((jax.local_device_count(),), h, np.uint64),
        mesh, PSpec("d"))
    return int(total(g)) == int(h) * dev_count
