"""Multi-host backend (parallel/distributed.py): a real 2-process CPU
world over a localhost coordinator — collectives (psum, the four-step
NTT's all_to_all) cross the process boundary and host-local feeding
assembles the global arrays."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from jax.sharding import PartitionSpec as PSpec

from plonky2_tpu.parallel import distributed as dist


def test_single_process_initialize_noop_and_helpers():
    dist.initialize()  # 1-process world: must be a no-op
    mesh = dist.global_mesh()
    assert mesh.devices.size == 8
    full = np.arange(8 * 4, dtype=np.uint64).reshape(8, 4)
    g = dist.host_local_to_global(full, mesh, PSpec("d", None))
    assert np.array_equal(np.asarray(g), full)
    r = dist.replicated_from_host(np.arange(5, dtype=np.uint64), mesh)
    assert np.array_equal(np.asarray(r), np.arange(5))
    assert dist.all_processes_equal(np.arange(7, dtype=np.uint64))


@pytest.mark.slow
def test_two_process_world():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), coord],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("2-process world timed out:\n" +
                    "\n".join(o or "" for o in outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER {pid} OK" in out, out[-4000:]
