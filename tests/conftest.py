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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
