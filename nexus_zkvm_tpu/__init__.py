"""nexus_zkvm_tpu — a TPU-native Circle-STARK zkVM proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
nexus-zkvm reference (RISC-V RV32IM zkVM proven with a Circle STARK over
the Mersenne-31 field, Blake2s Merkle commitments, LogUp lookups, FRI):

- ``ops``      — compute kernels: M31/QM31 field arithmetic, circle FFT,
                 Blake2s hashing, Merkle forests, LogUp, FRI folds.
- ``air``      — the constraint-expression framework (components, LogUp).
- ``machine``  — the RV32IM machine AIR (v1): CPU/mext/keccak/memory
                 components, lookup tables, prove/verify driver.
- ``machine2`` — the per-instruction-family machine (prover2 analogue).
- ``prover``   — the STARK driver: commitments, composition, FRI, PoW.
- ``vm``       — host-side RV32IM emulator, decoder/encoder, trace generation.
- ``parallel`` — device mesh / sharding layer (pjit + shard_map over ICI).
- ``sdk``      — the user-facing host API (compile/prove/verify).

The package is layed out to mirror the reference's layer map
(SURVEY.md §1) while being idiomatic JAX: everything on the device side is
traced, statically shaped, and vectorized over trace rows.
"""

__version__ = "0.1.0"

# The field kernels compute 31x31-bit modular products through native
# uint64 arithmetic (one widening multiply + a Mersenne fold) instead of
# 16-bit limb decompositions: the traced graphs are ~4x smaller (XLA
# compile and trace time scale with op count) and the fused kernels move
# ~4x less HBM traffic. XLA emulates u64 on TPU with u32 pairs — still
# far cheaper than explicit limb arithmetic at the HLO level.
import jax as _jax

_jax.config.update("jax_enable_x64", True)
