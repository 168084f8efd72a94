"""Recursion layer: in-circuit proof verification, conditional and cyclic
recursion, dummy circuits (reference recursion/)."""

from .conditional import (conditionally_verify_proof,
                          conditionally_verify_proof_or_dummy)
from .cyclic import (check_cyclic_proof_verifier_data,
                     common_data_for_recursion,
                     conditionally_verify_cyclic_proof,
                     conditionally_verify_cyclic_proof_or_dummy)
from .dummy import cyclic_base_proof, dummy_circuit, dummy_proof
from .recursive_verifier import (ProofWithPublicInputsTarget, ProofTarget,
                                 VerifierCircuitTarget, add_virtual_proof_with_pis,
                                 add_virtual_verifier_data, set_proof_with_pis_target,
                                 set_verifier_data_target, verify_proof_circuit)

__all__ = [
    "ProofWithPublicInputsTarget", "ProofTarget", "VerifierCircuitTarget",
    "add_virtual_proof_with_pis", "add_virtual_verifier_data",
    "set_proof_with_pis_target", "set_verifier_data_target",
    "verify_proof_circuit", "conditionally_verify_proof",
    "conditionally_verify_proof_or_dummy", "conditionally_verify_cyclic_proof",
    "conditionally_verify_cyclic_proof_or_dummy",
    "check_cyclic_proof_verifier_data", "common_data_for_recursion",
    "cyclic_base_proof", "dummy_circuit", "dummy_proof",
]
