"""Recursion layer: in-circuit proof verification (reference recursion/)."""

from .recursive_verifier import (ProofWithPublicInputsTarget, ProofTarget,
                                 VerifierCircuitTarget, add_virtual_proof_with_pis,
                                 add_virtual_verifier_data, set_proof_with_pis_target,
                                 set_verifier_data_target, verify_proof_circuit)

__all__ = [
    "ProofWithPublicInputsTarget", "ProofTarget", "VerifierCircuitTarget",
    "add_virtual_proof_with_pis", "add_virtual_verifier_data",
    "set_proof_with_pis_target", "set_verifier_data_target",
    "verify_proof_circuit",
]
