"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This environment pre-imports jax (sitecustomize) with JAX_PLATFORMS=axon (a
tunneled TPU; every eager op pays a network round-trip).  Tests force the CPU
backend with 8 virtual devices instead — fast, deterministic, and exercises
the sharding code paths.  Real-TPU runs happen via bench.py and the driver's
__graft_entry__ checks.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # backends already initialised (fine if cpu)
    pass

# Persistent compilation cache: the proving pipeline compiles one graph per
# (op, shape); caching across pytest runs removes the dominant fixed cost.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_memory():
    """Drop in-memory compiled executables between test modules.

    A full-suite run accumulates every compiled graph + its buffers in one
    process (>60 GB by the tail, ending in allocator segfaults).  The
    persistent on-disk cache makes re-tracing cheap, so trade a little
    re-trace time for bounded memory."""
    yield
    try:
        jax.clear_caches()
    except Exception:
        pass
