"""plonky2_tpu: a TPU-native plonky2-class proving stack (JAX/XLA/Pallas).

Public surface re-exports; see README.md for the tour and PARITY.md for the
component map against the reference.
"""

from .plonk.builder import CircuitBuilder
from .plonk.config import CircuitConfig
from .plonk.witness import PartialWitness

__all__ = ["CircuitBuilder", "CircuitConfig", "PartialWitness"]
__version__ = "0.1.0"
