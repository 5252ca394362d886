"""Sharded LDE + Merkle commitment over a device mesh.

The commit phase (circle FFT per column, low-degree extension, then a
Blake2s Merkle tree whose leaves are rows of the extended column
matrix) is the prover's dominant cost (SURVEY.md §3.2 hot loop 2).
Parallel decomposition:

1. **Column-parallel transforms** — the (C, N) column matrix is sharded
   on C; every device runs the circle FFT/LDE on its slice with zero
   ICI traffic (the FFT is independent per column).
2. **Row-resharded hashing** — leaf hashing needs all C values of a
   row; the shards all_gather the extended matrix (one ICI collective,
   volume C*M/D per link hop), then each device hashes its M/D rows
   and climbs its local subtree to one digest.
3. **Frontier fold** — the D subtree roots are all_gathered and the
   top log2(D) layers hashed redundantly on every device (tiny).

The result is bit-identical to the single-device `merkle.commit` /
`pcs.commit_columns` path, so sharding never changes the transcript.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as PS
from jax import shard_map

from ..ops import cfft
from ..ops.blake2s import batch_blake2s_words
from ..ops.circle import bit_reverse_indices, layout_to_natural
from .mesh import AXIS

__all__ = ["sharded_commit_columns", "sharded_lde"]


def _tree_digests(rows):
    """(R, W) leaf rows -> list of digest layers up to a single root
    (static unrolled loop; all on device)."""
    layers = []
    h = batch_blake2s_words(rows)
    layers.append(h)
    while h.shape[0] > 1:
        h = batch_blake2s_words(h.reshape(h.shape[0] // 2, 16))
        layers.append(h)
    return layers


def sharded_lde(mesh, columns, trace_log: int, eval_log: int):
    """columns: (C, 2^trace_log) natural order, C divisible by mesh
    size.  Returns (C, 2^eval_log) committed-order evals, sharded on C.
    """
    n_dev = mesh.devices.size
    C = columns.shape[0]
    assert C % n_dev == 0

    l2n = jnp.asarray(layout_to_natural(trace_log))
    brev = jnp.asarray(bit_reverse_indices(eval_log))

    def local(cols):
        cols = cols[:, l2n]
        cf = cfft.interpolate(cols)
        ev = cfft.evaluate(cf, eval_log)
        return ev[:, brev]

    spec = PS(AXIS, None)
    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=spec,
                           out_specs=spec))
    arr = jax.device_put(jnp.asarray(columns, jnp.uint32),
                         NamedSharding(mesh, spec))
    return fn(arr)


def sharded_commit_columns(mesh, columns, trace_log: int,
                           log_blowup: int):
    """Shard-parallel commit of equal-size columns.

    columns: (C, 2^trace_log) uint32, natural order (C padded to a
    multiple of the mesh size by the caller).  Returns
    (evals_committed (C, M) np, root (8,) np, layers) — identical
    values to the single-chip path.
    """
    n_dev = mesh.devices.size
    eval_log = trace_log + log_blowup
    M = 1 << eval_log
    assert M % n_dev == 0
    C = columns.shape[0]

    l2n = jnp.asarray(layout_to_natural(trace_log))
    brev = jnp.asarray(bit_reverse_indices(eval_log))

    def step(cols):                         # local: (C/D, N)
        cols = cols[:, l2n]
        cf = cfft.interpolate(cols)
        ev = cfft.evaluate(cf, eval_log)
        ev = ev[:, brev]
        # reshard rows for hashing
        allc = jax.lax.all_gather(ev, AXIS, tiled=True)      # (C, M)
        rows_per = M // n_dev
        i = jax.lax.axis_index(AXIS)
        mine = jax.lax.dynamic_slice_in_dim(allc.T, i * rows_per,
                                            rows_per, axis=0)
        layers = _tree_digests(mine)
        frontier = jax.lax.all_gather(layers[-1][0], AXIS)   # (D, 8)
        top = _tree_digests(frontier.reshape(n_dev // 2, 16)) \
            if n_dev > 1 else [frontier]
        root = top[-1][0]
        return ev, root

    spec = PS(AXIS, None)
    # the root is computed identically on every device from the
    # gathered frontier; vma inference can't see that, hence check off
    fn = jax.jit(shard_map(step, mesh=mesh, in_specs=spec,
                           out_specs=(spec, PS()), check_vma=False))
    arr = jax.device_put(jnp.asarray(columns, jnp.uint32),
                         NamedSharding(mesh, spec))
    ev, root = fn(arr)
    return ev, np.asarray(root)
