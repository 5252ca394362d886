"""Device-resident constant cache.

The prover's per-size constants — committed-order domain points, FRI
fold twiddles, natural<->layout index permutations — are host numpy
arrays that used to be re-shipped to the device on every prove (MBs per
proof over a ~25 MB/s tunneled link). This cache pins one device copy
per (key, backend) for the life of the process.

Sharded runs bypass the cache: an active mesh wants constants placed
by the SPMD partitioner, and cached single-device copies would pin the
wrong placement (mirrors the progstore/fused-path fallbacks).
"""

from __future__ import annotations

import threading

__all__ = ["dev_const", "clear_dev_cache"]

_CACHE: dict = {}
_LOCK = threading.Lock()


def dev_const(key, build):
    """Device copy of ``build()`` cached under ``key``.

    ``build`` must be pure; it is only called on a miss. Index arrays
    should be built as int32 and values as uint32 — the dtype is
    whatever ``build`` returns."""
    import jax.numpy as jnp
    from ..parallel.context import active_mesh
    if active_mesh() is not None:
        return jnp.asarray(build())
    with _LOCK:
        v = _CACHE.get(key)
    if v is None:
        v = jnp.asarray(build())
        with _LOCK:
            _CACHE[key] = v
    return v


def clear_dev_cache() -> None:
    with _LOCK:
        _CACHE.clear()
