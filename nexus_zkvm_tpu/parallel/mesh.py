"""Mesh construction helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "local_mesh", "AXIS"]

AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis: str = AXIS) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    assert n <= len(devs), f"need {n} devices, have {len(devs)}"
    return Mesh(np.array(devs[:n]), (axis,))


def local_mesh() -> Mesh:
    """Single-device mesh (the degenerate case)."""
    return make_mesh(1)
