"""Device-mesh sharding for the prover (ICI collectives, pjit/shard_map).

The reference scales with 16-lane SIMD + rayon threads inside one
process (`/root/reference/Cargo.toml:43-52`, SURVEY.md §2.6); the
TPU-native equivalents here are:

* column-parallel circle-FFT/LDE — each device transforms its slice of
  the (columns, rows) matrix locally (no ICI traffic),
* row-sharded Merkle hashing — leaves resharded across devices via
  ``all_to_all``-style gathers, shard-local subtrees, frontier gathered
  and folded (`psum`-free: hashing is not associative),
* LogUp / constraint reductions via ``psum`` over the mesh axis,
* whole-prover SPMD via the active-mesh context (`context.py`): the
  PCS shards every committed row axis over the mesh, and XLA's
  partitioner propagates the sharding through interaction generation,
  constraint evaluation, quotients and FRI — bit-identical proofs.
"""

from .mesh import make_mesh, local_mesh
from .commit import sharded_commit_columns
from .context import set_mesh, active_mesh, use_mesh, shard_rows
from .distributed import init_distributed, is_distributed, process_info

__all__ = ["make_mesh", "local_mesh", "sharded_commit_columns",
           "set_mesh", "active_mesh", "use_mesh", "shard_rows",
           "init_distributed", "is_distributed", "process_info"]
