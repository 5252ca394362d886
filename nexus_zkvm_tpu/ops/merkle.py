"""Blake2s Merkle forest commitments over mixed-size column sets.

TPU-native counterpart of stwo's ``MerkleProver``/``MerkleVerifier``
(used by the commitment scheme at
`/root/reference/prover/src/machine.rs:208-263`): a single tree commits
to many M31 columns whose sizes are powers of two. A column of size 2^d
is injected at tree depth d: the node hash at depth d is

    blake2s( left_child(32B) || right_child(32B) || col values at d )

and at the deepest layer (no children) just the column values. QM31
columns are committed as 4 M31 columns by the caller.

TPU-first: each layer is ONE ``batch_blake2s_words`` call over 2^d
equal-length messages — children digests come from a (2^(d+1), 8) ->
(2^d, 16) reshape, column values are stacked alongside; the whole
commit is ~D batched hash kernels with no host round-trips.
Decommitment (query answering) is host-side numpy — O(queries · depth).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from .blake2s import batch_blake2s_words

__all__ = ["MerkleTree", "commit", "MerkleDecommitment", "decommit",
           "verify_decommitment"]


def _log2(n: int) -> int:
    k = int(n).bit_length() - 1
    assert 1 << k == n, "column sizes must be powers of two"
    return k


def _group_by_depth(columns):
    by_depth: dict[int, list] = {}
    for i, col in enumerate(columns):
        by_depth.setdefault(_log2(col.shape[0]), []).append(i)
    return by_depth


@dataclass
class MerkleTree:
    """Committed tree: layers[d] is the (2^d, 8) digest array at depth d."""
    layers: list          # device or numpy arrays; see layer()
    columns: list         # the committed columns (numpy uint32), caller order
    by_depth: dict        # depth -> list of column indices

    @property
    def max_depth(self) -> int:
        return len(self.layers) - 1

    def layer(self, d: int) -> np.ndarray:
        if not isinstance(self.layers[d], np.ndarray):
            self.layers[d] = np.asarray(self.layers[d])
        return self.layers[d]

    def root(self) -> np.ndarray:
        return self.layer(0)[0]


def commit(columns) -> MerkleTree:
    """Commit to a list of power-of-two-sized uint32 columns.

    Layers stay on device (async); `MerkleTree` materializes them to
    host numpy lazily on first access (root/decommit), so the commit
    itself never blocks."""
    assert columns, "cannot commit to zero columns"
    cols = [np.asarray(c, dtype=np.uint32) for c in columns]
    by_depth = _group_by_depth(cols)
    max_depth = max(by_depth)

    layers: list = [None] * (max_depth + 1)
    below = None
    for d in range(max_depth, -1, -1):
        parts = []
        if below is not None:
            parts.append(below.reshape(1 << d, 16))
        for ci in by_depth.get(d, ()):
            parts.append(jnp.asarray(cols[ci])[:, None])
        msg = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        below = batch_blake2s_words(msg)
        layers[d] = below            # device array; converted lazily
    return MerkleTree(layers=layers, columns=cols, by_depth=by_depth)


@dataclass
class MerkleDecommitment:
    """Witness for a multi-query opening.

    column_values: per committed column (caller order), the values at the
    queried positions of its own depth (position = q >> (max_depth - d)).
    sibling_hashes: the off-path digests, bottom-up, left-to-right.
    """
    column_values: list = field(default_factory=list)   # list[np.ndarray]
    sibling_hashes: list = field(default_factory=list)  # list[np.ndarray (8,)]


def _positions_at(queries, max_depth, d):
    return sorted({q >> (max_depth - d) for q in queries})


def decommit(tree: MerkleTree, queries) -> MerkleDecommitment:
    """Open the tree at the given bottom-layer query positions."""
    queries = sorted(set(int(q) for q in queries))
    out = MerkleDecommitment()
    for ci, col in enumerate(tree.columns):
        d = _log2(col.shape[0])
        pos = _positions_at(queries, tree.max_depth, d)
        out.column_values.append(col[np.asarray(pos, dtype=np.int64)])

    pos = queries
    for d in range(tree.max_depth, 0, -1):
        layer = tree.layer(d)
        pos_set = set(pos)
        for p in pos:
            sib = p ^ 1
            if sib not in pos_set:
                out.sibling_hashes.append(layer[sib])
        pos = sorted({p >> 1 for p in pos})
    return out


def verify_decommitment(root, column_lengths, queries,
                        decommitment: MerkleDecommitment) -> bool:
    """Recompute the root from a decommitment. Host-side.

    column_lengths: sizes of the committed columns in caller order.
    """
    import hashlib

    queries = sorted(set(int(q) for q in queries))
    max_depth = max(_log2(n) for n in column_lengths)
    by_depth: dict[int, list] = {}
    for i, n in enumerate(column_lengths):
        by_depth.setdefault(_log2(n), []).append(i)

    # column values keyed by (col index, position)
    vals: dict[tuple, int] = {}
    for i, n in enumerate(column_lengths):
        d = _log2(n)
        pos = _positions_at(queries, max_depth, d)
        got = decommitment.column_values[i]
        if len(got) != len(pos):
            return False
        for p, v in zip(pos, got):
            vals[(i, p)] = int(v)

    sib_iter = iter(decommitment.sibling_hashes)
    # current digests at depth d for tracked positions
    cur: dict[int, bytes] = {}
    pos = queries
    for d in range(max_depth, -1, -1):
        nxt: dict[int, bytes] = {}
        new_pos = sorted({p >> 1 for p in pos}) if d > 0 else []
        for p in pos:
            msg = b""
            if d < max_depth:
                msg += cur[2 * p] + cur[2 * p + 1]
            for ci in by_depth.get(d, ()):
                msg += int(vals[(ci, p)]).to_bytes(4, "little")
            nxt[p] = hashlib.blake2s(msg).digest()
        if d == 0:
            got_root = nxt[0]
            return got_root == np.asarray(root, dtype="<u4").tobytes()
        # pull in siblings for the climb
        pos_set = set(pos)
        full: dict[int, bytes] = dict(nxt)
        for p in pos:
            sib = p ^ 1
            if sib not in pos_set:
                try:
                    full[sib] = np.asarray(next(sib_iter),
                                           dtype="<u4").tobytes()
                except StopIteration:
                    return False
        cur = full
        pos = new_pos
    return False
