import sys; sys.path.insert(0, "/root/repo")
import os, signal, faulthandler
faulthandler.register(signal.SIGUSR1)
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/plonky2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import time
from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy
from plonky2_tpu.plonk.builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.recursion.recursive_verifier import (
    add_virtual_proof_with_pis, add_virtual_verifier_data, verify_proof_circuit)

config = CircuitConfig(fri_config=FriConfig(
    rate_bits=3, cap_height=4, proof_of_work_bits=8,
    reduction_strategy=FriReductionStrategy.constant_arity(4, 5),
    num_query_rounds=4))

t0 = time.time()
b = CircuitBuilder(config)
data = b.build()
print(f"[{time.time()-t0:8.1f}s] level0 built: degree {data.common.degree()}", flush=True)

for lvl in range(1, 3):
    b = CircuitBuilder(config)
    pt = add_virtual_proof_with_pis(b, data.common)
    vdt = add_virtual_verifier_data(b, config.fri_config.cap_height)
    verify_proof_circuit(b, pt, vdt, data.common)
    print(f"[{time.time()-t0:8.1f}s] level{lvl} constructed: {b.num_gates()} gates", flush=True)
    data = b.build()
    print(f"[{time.time()-t0:8.1f}s] level{lvl} built: degree {data.common.degree()}", flush=True)
