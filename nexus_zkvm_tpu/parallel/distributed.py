"""Multi-host initialization: DCN process group + global mesh.

The reference is single-process (SURVEY §2.6 — stwo uses rayon+SIMD
in-process, no NCCL/MPI).  The TPU-native scale-out equivalent is
JAX's multi-controller runtime: one process per host, ICI collectives
inside a slice, DCN between hosts, all inserted by XLA from sharding
annotations.  This module is the thin, idempotent entry point:

    from nexus_zkvm_tpu.parallel import init_distributed, make_mesh
    init_distributed()                  # no-op single-host
    with use_mesh(make_mesh()):         # all global devices
        proof = prove_machine(view, trace)

Environment contract (standard JAX multi-host):
  JAX_COORDINATOR / NZT_COORDINATOR  address of process 0
  JAX_NUM_PROCESSES / NZT_NUM_PROCESSES
  JAX_PROCESS_ID / NZT_PROCESS_ID

On TPU pods these are auto-detected by `jax.distributed.initialize()`
with no arguments; on CPU/GPU fleets they must be set.  Single-host
(no env, 1 process) is a silent no-op so the same program runs
unchanged from a laptop to a pod.
"""

from __future__ import annotations

import os

__all__ = ["init_distributed", "is_distributed", "process_info"]

_INITIALIZED = False


def _env(*names, default=None):
    for n in names:
        v = os.environ.get(n)
        if v is not None:
            return v
    return default


def is_distributed() -> bool:
    """True once a multi-process runtime is active."""
    import jax
    return _INITIALIZED or jax.process_count() > 1


def process_info() -> dict:
    import jax
    return {"process_id": jax.process_index(),
            "n_processes": jax.process_count(),
            "local_devices": len(jax.local_devices()),
            "global_devices": len(jax.devices())}


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> dict:
    """Idempotently initialize the multi-host runtime; returns
    `process_info()`.  Single-host calls are a no-op.

    Explicit args win over the environment; with neither, TPU pods
    self-detect via `jax.distributed.initialize()` and everything
    else stays single-process.
    """
    global _INITIALIZED
    import jax
    if _INITIALIZED:
        return process_info()
    coordinator = coordinator or _env("NZT_COORDINATOR",
                                      "JAX_COORDINATOR")
    n = num_processes if num_processes is not None else _env(
        "NZT_NUM_PROCESSES", "JAX_NUM_PROCESSES")
    pid = process_id if process_id is not None else _env(
        "NZT_PROCESS_ID", "JAX_PROCESS_ID")
    try:
        if coordinator is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=int(n), process_id=int(pid))
            _INITIALIZED = True
        elif jax.default_backend() == "tpu" and _env("TPU_WORKER_HOSTNAMES"):
            jax.distributed.initialize()       # pod auto-detection
            _INITIALIZED = True
    except RuntimeError:
        # already initialized by the embedding program
        _INITIALIZED = True
    return process_info()
