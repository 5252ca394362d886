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


# ---------------------------------------------------------------------------
# Whole-prover SPMD: active-mesh sharding must not change the transcript
# ---------------------------------------------------------------------------

import pytest

from nexus_zkvm_tpu.parallel import use_mesh, active_mesh
from nexus_zkvm_tpu.channel import Blake2sChannel
from nexus_zkvm_tpu.prover import prove, verify


def _tree_equal(a, b, path=""):
    """Recursive structural equality over Proof dataclasses/arrays."""
    if isinstance(a, dict):
        assert set(a) == set(b), path
        return all(_tree_equal(a[k], b[k], f"{path}.{k}") for k in a)
    if isinstance(a, (list, tuple)):
        if len(a) != len(b):
            return False
        return all(_tree_equal(x, y, f"{path}[{i}]")
                   for i, (x, y) in enumerate(zip(a, b)))
    if hasattr(a, "__dict__"):
        return _tree_equal(vars(a), vars(b), path)
    if hasattr(a, "shape"):
        return np.array_equal(np.asarray(a), np.asarray(b))
    return a == b


def test_use_mesh_scoping():
    assert active_mesh() is None
    mesh = make_mesh(4)
    with use_mesh(mesh):
        assert active_mesh() is mesh
    assert active_mesh() is None


@pytest.mark.slow
def test_sharded_prove_bit_identical():
    """Full prove() pipeline (commit, interaction, constraints,
    composition, OODS, quotients, FRI, PoW, openings) under an 8-device
    mesh produces the byte-identical proof of the 1-device run."""
    import test_stark_e2e as T

    p1 = prove(T.COMPONENTS, T.LOG_SIZES, T.make_traces(),
               Blake2sChannel(), T.CFG)
    with use_mesh(make_mesh(8)):
        p8 = prove(T.COMPONENTS, T.LOG_SIZES, T.make_traces(),
                   Blake2sChannel(), T.CFG)
    assert _tree_equal(p1, p8)
    assert verify(T.COMPONENTS, p8, Blake2sChannel(), T.CFG)


@pytest.mark.slow
def test_sharded_machine_prove_bit_identical():
    """The full RV32IM machine prover under an 8-device mesh emits the
    same proof bytes as single-device (serialized comparison)."""
    from nexus_zkvm_tpu.vm import asm, k_trace
    from nexus_zkvm_tpu.machine import prove_machine, verify_machine
    from nexus_zkvm_tpu.sdk.serialize import proof_to_bytes

    src = """
        li   t0, 20
        addi a0, zero, 0
        addi a1, zero, 1
    loop:
        add  a2, a0, a1
        mv   a0, a1
        mv   a1, a2
        addi t0, t0, -1
        bne  t0, zero, loop
        lw   t1, 0x84(zero)
        sw   a0, 0(t1)
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """
    view, trace = k_trace(asm.assemble(src))
    p1 = prove_machine(view, trace)
    with use_mesh(make_mesh(8)):
        p8 = prove_machine(view, trace)
    assert proof_to_bytes(p1) == proof_to_bytes(p8)
    assert verify_machine(view, p8)
