"""One process of the 2-process CPU world spawned by test_distributed.py.

Usage: python distributed_worker.py <process_id> <coordinator_addr>

Each process owns 4 virtual CPU devices; the global mesh has 8.  The
worker brings up the process group through parallel.distributed, feeds
only its host-local trace slice, runs sharded programs whose collectives
cross the process boundary (psum, all_to_all in the four-step NTT), and
cross-checks against a locally-computed single-device reference.
"""

import os
import sys

pid = int(sys.argv[1])
coord = sys.argv[2]
# This environment pre-imports jax via sitecustomize with JAX_PLATFORMS=axon
# (the tunneled TPU), so env vars alone come too late: force the CPU backend
# through jax.config (like tests/conftest.py).  PLONKY2_TPU_FUSED_STAGES
# keeps field/ntt.py's import from touching jax.default_backend(), which
# would initialise backends BEFORE jax.distributed.initialize (and dial the
# tunnel).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PLONKY2_TPU_FUSED_STAGES"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler  # noqa: E402

if os.environ.get("WORKER_STACK_DUMPS"):
    faulthandler.dump_traceback_later(90, repeat=True)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from functools import partial  # noqa: E402

import numpy as np  # noqa: E402
from jax.sharding import PartitionSpec as PSpec  # noqa: E402

from plonky2_tpu.parallel import distributed as dist  # noqa: E402
from plonky2_tpu.parallel.mesh import shard_map  # noqa: E402

dist.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

mesh = dist.global_mesh()

# --- 1. host-local feeding + a cross-process psum -------------------------
full = (np.arange(8 * 16, dtype=np.uint64) * 7 % 1001).reshape(8, 16)
local = full[pid * 4:(pid + 1) * 4]
g = dist.host_local_to_global(local, mesh, PSpec("d", None))


@partial(shard_map, mesh=mesh, in_specs=(PSpec("d", None),),
         out_specs=PSpec())
def total(blk):
    return jax.lax.psum(blk.sum(), "d")


got = int(jax.jit(total)(g))
assert got == int(full.sum()), (got, int(full.sum()))
print(f"worker {pid}: psum OK", flush=True)

# --- 2. four-step NTT: all_to_all across the process boundary -------------
from plonky2_tpu.field import gl64, ntt  # noqa: E402
from plonky2_tpu.field.goldilocks import GF  # noqa: E402
from plonky2_tpu.parallel.mesh import four_step_ntt  # noqa: E402

n = 1 << 10
rng = np.random.default_rng(5)
x = rng.integers(0, gl64.ORDER_INT, size=n, dtype=np.uint64)
got_gf = four_step_ntt(GF.from_u64(x), mesh)
# the result is sharded across both processes: gather every process's
# shards to host numpy before comparing
from jax.experimental import multihost_utils as mhu  # noqa: E402

lo = np.asarray(mhu.process_allgather(got_gf.lo, tiled=True), np.uint64)
hi = np.asarray(mhu.process_allgather(got_gf.hi, tiled=True), np.uint64)
got_ntt = lo | (hi << np.uint64(32))
want_ntt = ntt.ntt(GF.from_u64(x)).to_u64()  # local single-device reference
assert np.array_equal(gl64.to_canonical(got_ntt),
                      gl64.to_canonical(np.asarray(want_ntt)))
print(f"worker {pid}: four-step NTT OK", flush=True)

print(f"WORKER {pid} OK", flush=True)
