"""Sharding tests on the virtual 8-device CPU mesh.

The TPU analogue of the reference's missing distributed tests
(SURVEY.md §4): N-shard runs must produce bit-identical commitments to
the 1-chip path.
"""

import numpy as np
import jax

from nexus_zkvm_tpu.parallel import make_mesh, sharded_commit_columns
from nexus_zkvm_tpu.ops import merkle
from nexus_zkvm_tpu.prover import pcs

LOG = 8
C = 16


def _columns(seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, (1 << 31) - 1, (C, 1 << LOG)).astype(np.uint32)


def test_sharded_commit_matches_single_chip():
    cols = _columns()
    mesh = make_mesh(8)
    ev8, root8 = sharded_commit_columns(mesh, cols, LOG, log_blowup=1)

    rc = pcs.commit_columns("t", [cols[i] for i in range(C)],
                            [LOG] * C, 1)
    ev1 = rc.evals[LOG + 1]
    root1 = np.asarray(rc.trees[LOG + 1].root())
    assert np.array_equal(np.asarray(ev8), ev1)
    assert np.array_equal(root8, root1)


def test_sharded_commit_single_device_degenerate():
    cols = _columns(1)
    mesh = make_mesh(1)
    ev1, root1 = sharded_commit_columns(mesh, cols, LOG, log_blowup=1)
    tree = merkle.commit([np.asarray(ev1)[i] for i in range(C)])
    assert np.array_equal(root1, np.asarray(tree.root()))


def test_mesh_devices():
    assert len(jax.devices()) >= 8
    assert make_mesh(8).devices.size == 8
