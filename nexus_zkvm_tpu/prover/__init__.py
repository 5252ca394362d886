"""STARK prover/verifier: commitment scheme, composition, prove/verify.

Counterpart of the reference's `Machine::prove_with_extensions` /
`verify_with_extensions` driver plus stwo's `CommitmentSchemeProver`
(`/root/reference/prover/src/machine.rs:130-297,318-485`).
"""

from .config import PcsConfig
from .stark import prove, verify, Proof
