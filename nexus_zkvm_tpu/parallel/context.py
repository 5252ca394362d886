"""Active-mesh context: whole-prover SPMD sharding.

The reference scales its prover with explicit NCCL/MPI-style work
splitting; the TPU-native equivalent is data placement + XLA's SPMD
partitioner (the scaling-book recipe: pick a mesh, annotate the
shardings of the inputs, and let the compiler insert the collectives).

Activating a mesh here makes the PCS (`prover/pcs.py`) place every
committed column matrix with its **row axis sharded** over the mesh.
Every downstream computation of the prover — circle FFT / LDE,
Merkle layer hashing, interaction generation, constraint evaluation
over the 4x domain, quotient accumulation, and the FRI folds — is a
jnp program over those arrays, so XLA partitions it across the mesh
automatically (gathers/permutes for the FFT butterflies and `roll`
masks, reductions for claimed sums). Sharding changes placement, not
math: proofs are **bit-identical** to the single-device path
(asserted by `tests/test_parallel.py` and `__graft_entry__`).

Usage::

    from nexus_zkvm_tpu.parallel import make_mesh, use_mesh
    with use_mesh(make_mesh(8)):
        proof = prove_machine(view, trace)
"""

from __future__ import annotations

from contextlib import contextmanager

import jax
from jax.sharding import NamedSharding, PartitionSpec as PS

from .mesh import AXIS

__all__ = ["set_mesh", "active_mesh", "use_mesh", "shard_rows"]

_ACTIVE = None


def set_mesh(mesh) -> None:
    """Set (or clear, with ``None``) the process-wide active mesh."""
    global _ACTIVE
    _ACTIVE = mesh


def active_mesh():
    return _ACTIVE


@contextmanager
def use_mesh(mesh):
    """Scoped activation: the PCS shards rows over ``mesh`` inside."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = mesh
    try:
        yield mesh
    finally:
        _ACTIVE = prev


def shard_rows(arr):
    """Place ``arr`` with its last (row) axis sharded over the active
    mesh. No-op when no mesh is active or the axis does not divide
    evenly (tiny tables stay replicated — they are cheap either way).
    """
    mesh = _ACTIVE
    if mesh is None:
        return arr
    n_dev = mesh.devices.size
    if n_dev <= 1 or arr.ndim == 0 or arr.shape[-1] % n_dev:
        return arr
    spec = PS(*([None] * (arr.ndim - 1)), AXIS)
    return jax.device_put(arr, NamedSharding(mesh, spec))
