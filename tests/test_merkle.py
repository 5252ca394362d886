"""Merkle forest: commit/decommit/verify round-trips and tamper rejection."""
import numpy as np

from nexus_zkvm_tpu.ops import merkle
from nexus_zkvm_tpu.ops.field import P

RNG = np.random.default_rng(11)


def cols_mixed():
    return [
        RNG.integers(0, P, size=(64,), dtype=np.uint32),
        RNG.integers(0, P, size=(64,), dtype=np.uint32),
        RNG.integers(0, P, size=(16,), dtype=np.uint32),
        RNG.integers(0, P, size=(8,), dtype=np.uint32),
        RNG.integers(0, P, size=(64,), dtype=np.uint32),
    ]


def test_commit_shapes_and_determinism():
    cols = cols_mixed()
    t1 = merkle.commit(cols)
    t2 = merkle.commit(cols)
    assert t1.max_depth == 6
    assert t1.layers[0].shape == (1, 8)
    assert t1.layers[6].shape == (64, 8)
    assert np.array_equal(t1.root(), t2.root())
    # different data -> different root
    cols2 = [c.copy() for c in cols]
    cols2[2][3] ^= 1
    assert not np.array_equal(merkle.commit(cols2).root(), t1.root())


def test_decommit_verify_roundtrip():
    cols = cols_mixed()
    tree = merkle.commit(cols)
    lengths = [len(c) for c in cols]
    for queries in [[0], [63], [5, 5, 6], [0, 1, 31, 32, 62, 63],
                    list(range(10))]:
        dec = merkle.decommit(tree, queries)
        assert merkle.verify_decommitment(tree.root(), lengths, queries, dec), queries
        # values surfaced match the actual columns
        q = sorted(set(queries))
        assert np.array_equal(
            dec.column_values[0],
            cols[0][np.asarray(sorted({x for x in q}))])


def test_verify_rejects_tampered_value():
    cols = cols_mixed()
    tree = merkle.commit(cols)
    lengths = [len(c) for c in cols]
    queries = [3, 40]
    dec = merkle.decommit(tree, queries)
    dec.column_values[1] = dec.column_values[1].copy()
    dec.column_values[1][0] ^= 1
    assert not merkle.verify_decommitment(tree.root(), lengths, queries, dec)


def test_verify_rejects_tampered_sibling():
    cols = cols_mixed()
    tree = merkle.commit(cols)
    lengths = [len(c) for c in cols]
    queries = [7]
    dec = merkle.decommit(tree, queries)
    dec.sibling_hashes[2] = dec.sibling_hashes[2].copy()
    dec.sibling_hashes[2][0] ^= 1
    assert not merkle.verify_decommitment(tree.root(), lengths, queries, dec)


def test_verify_rejects_wrong_root():
    cols = cols_mixed()
    tree = merkle.commit(cols)
    lengths = [len(c) for c in cols]
    queries = [9]
    dec = merkle.decommit(tree, queries)
    bad = np.asarray(tree.root()).copy()
    bad[0] ^= 1
    assert not merkle.verify_decommitment(bad, lengths, queries, dec)


def test_single_column_single_leaf():
    col = np.asarray([5], dtype=np.uint32)
    tree = merkle.commit([col])
    dec = merkle.decommit(tree, [0])
    assert merkle.verify_decommitment(tree.root(), [1], [0], dec)


def test_fused_lde_commit_matches_split_path(monkeypatch):
    """pcs._fused_lde_commit (one program: LDE + bit-rev + every Merkle
    layer; the TPU default) must produce the identical tree to the
    split CPU path."""
    from nexus_zkvm_tpu.prover import pcs

    rng = np.random.default_rng(7)
    cols = rng.integers(0, P, size=(5, 1 << 6), dtype=np.uint32)
    monkeypatch.setenv("NZT_FUSE_COMMIT", "0")
    rc_split = pcs.commit_columns("t", list(cols), [6] * 5, 2)
    monkeypatch.setenv("NZT_FUSE_COMMIT", "1")
    rc_fused = pcs.commit_columns("t", list(cols), [6] * 5, 2)
    for (s1, a), (s2, b) in zip(rc_split.roots(), rc_fused.roots()):
        assert s1 == s2 and (np.asarray(a) == np.asarray(b)).all()
    for s in rc_split.evals:
        assert (np.asarray(rc_split.evals[s])
                == np.asarray(rc_fused.evals[s])).all()
        for d in range(len(rc_split.trees[s].layers)):
            assert (np.asarray(rc_split.trees[s].layers[d])
                    == np.asarray(rc_fused.trees[s].layers[d])).all()


def test_ship_packed_roundtrip():
    """Bit-packed host->device shipping is value-exact (pcs._ship_packed)."""
    import numpy as np
    from nexus_zkvm_tpu.prover.pcs import _ship_packed
    rng = np.random.default_rng(11)
    C, M = 23, 1 << 10
    widths = rng.choice([1, 2, 3, 7, 8, 15, 16, 30], C)
    batch = np.stack([rng.integers(0, 1 << int(w), M, dtype=np.uint32)
                      for w in widths])
    got = np.asarray(_ship_packed(batch))
    assert got.shape == batch.shape
    assert np.array_equal(got, batch)
    # degenerate cases: all-zero, below-pack-threshold width
    assert np.array_equal(
        np.asarray(_ship_packed(np.zeros((3, 64), np.uint32))),
        np.zeros((3, 64)))
    assert np.array_equal(
        np.asarray(_ship_packed(np.zeros((2, 16), np.uint32))),
        np.zeros((2, 16)))


def test_stream_commit_matches_commit_matrix():
    """Column-streamed commit (Blake2s leaf state carried across
    column chunks, incl. a ragged final block) produces the identical
    tree to `commit_matrix` — multi-chunk path (C > chunk_cols)."""
    import jax.numpy as jnp
    from nexus_zkvm_tpu.ops import cfft
    from nexus_zkvm_tpu.ops.circle import bit_reverse_indices
    from nexus_zkvm_tpu.prover.pcs import _stream_commit
    rng = np.random.default_rng(5)
    n, s = 7, 8
    for C in (100, 64, 17):          # ragged, exact, sub-chunk
        coeffs = rng.integers(0, P, size=(C, 1 << n), dtype=np.uint32)
        batch = jnp.asarray(coeffs)
        ev = np.asarray(cfft.evaluate(batch, s))[
            :, bit_reverse_indices(s)]
        want = merkle.commit_matrix(jnp.asarray(ev))
        got = _stream_commit(batch, n, s, chunk_cols=64)
        assert np.array_equal(np.asarray(got.root()),
                              np.asarray(want.root())), C
        for d in range(s + 1):
            assert np.array_equal(np.asarray(got.layers[d]),
                                  np.asarray(want.layers[d])), (C, d)


def test_opened_values_streamed_matches_evals():
    """Recompute-from-coefficients opening values equal the resident
    eval matrix at the opened positions (multi-chunk)."""
    import jax.numpy as jnp
    from nexus_zkvm_tpu.ops import cfft
    from nexus_zkvm_tpu.ops.circle import bit_reverse_indices
    from nexus_zkvm_tpu.prover import pcs
    rng = np.random.default_rng(6)
    n, blowup = 7, 1
    s = n + blowup
    C = 70
    cols = [rng.integers(0, P, size=1 << n, dtype=np.uint32)
            for _ in range(C)]
    rc = pcs.commit_columns("t", cols, [n] * C, blowup)
    positions = sorted({int(p) for p in rng.integers(0, 1 << s, 9)})
    got = np.asarray(pcs.opened_values_streamed(rc, s, positions,
                                                chunk_cols=32))
    want = np.asarray(rc.evals[s])[:, positions]
    assert np.array_equal(got, want)
