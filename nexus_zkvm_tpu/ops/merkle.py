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
    """Committed tree: layers[d] is the (2^d, 8) digest array at depth d.

    Layers and columns stay on device; queries gather only the needed
    rows (a few KB) instead of materializing whole layers on the host —
    essential when the device link is a narrow tunnel.  Uniform-depth
    trees keep their columns as ONE (C, 2^d) matrix so openings are a
    single gather.
    """
    layers: list          # device (or numpy) digest arrays
    columns: list         # committed columns (ignored if matrix set)
    by_depth: dict        # depth -> list of column indices
    matrix: object = None  # (C, 2^max_depth) device matrix, optional

    @property
    def max_depth(self) -> int:
        return len(self.layers) - 1

    def layer_rows(self, d: int, positions) -> np.ndarray:
        """(len(positions), 8) digests from depth d (device gather)."""
        idx = jnp.asarray(np.asarray(positions, np.int64))
        return np.asarray(jnp.asarray(self.layers[d])[idx])

    def column_rows(self, ci: int, positions) -> np.ndarray:
        idx = jnp.asarray(np.asarray(positions, np.int64))
        if self.matrix is not None:
            return np.asarray(self.matrix[ci][idx])
        return np.asarray(jnp.asarray(self.columns[ci])[idx])

    def all_column_rows(self, positions) -> np.ndarray:
        """(C, len(positions)) — one gather for matrix trees."""
        idx = jnp.asarray(np.asarray(positions, np.int64))
        assert self.matrix is not None
        return np.asarray(self.matrix[:, idx])

    def root(self) -> np.ndarray:
        return np.asarray(self.layers[0])[0]


def commit(columns) -> MerkleTree:
    """Commit to a list of power-of-two-sized uint32 columns.

    Columns may be jnp or numpy; everything stays on device (async) —
    only root/decommit pull (tiny) data to the host."""
    assert columns, "cannot commit to zero columns"
    if all(c.shape[0] == columns[0].shape[0] for c in columns):
        if len(columns) == 1:
            m = jnp.asarray(columns[0])[None, :]
        elif all(isinstance(c, np.ndarray) for c in columns):
            m = jnp.asarray(np.stack(columns))
        else:
            m = jnp.stack([jnp.asarray(c) for c in columns])
        return commit_matrix(m)
    cols = [jnp.asarray(c) for c in columns]
    by_depth = _group_by_depth(cols)
    max_depth = max(by_depth)

    layers: list = [None] * (max_depth + 1)
    below = None
    for d in range(max_depth, -1, -1):
        parts = []
        if below is not None:
            parts.append(below.reshape(1 << d, 16))
        for ci in by_depth.get(d, ()):
            parts.append(cols[ci][:, None])
        msg = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        below = batch_blake2s_words(msg)
        layers[d] = below
    return MerkleTree(layers=layers, columns=cols, by_depth=by_depth)


_CLIMB_BLOCK = None  # resolved lazily per backend (see _climb_block_size)


def _climb_block_size() -> int:
    """Layers fused per dispatch.  On a tunneled TPU backend every
    dispatch is a ~10ms round trip, so fusing 8 layers per program is
    a big win; XLA:CPU however can crash (stack blowup) compiling the
    large chained-hash graphs mid-process, and its dispatch overhead
    is microseconds — keep it per-layer there."""
    global _CLIMB_BLOCK
    if _CLIMB_BLOCK is None:
        import jax
        _CLIMB_BLOCK = 1 if jax.default_backend() == "cpu" else 8
    return _CLIMB_BLOCK


def _climb_block(leaf: bool, d_top: int, n_blk: int):
    """AOT-stored hash of `n_blk` consecutive layers ending at depth
    d_top (leaf=True: the input is the (R, W) leaf matrix)."""
    from ..utils.progstore import aot_call

    def blk(x):
        out = []
        below = batch_blake2s_words(x if leaf else
                                    x.reshape(1 << d_top, 16))
        out.append(below)
        for dd in range(d_top - 1, d_top - n_blk, -1):
            below = batch_blake2s_words(below.reshape(1 << dd, 16))
            out.append(below)
        return out

    def call(x):
        return aot_call(("merkle.climb", leaf, d_top, n_blk), blk, x)
    return call


def commit_matrix(matrix) -> MerkleTree:
    """Uniform-depth commit: matrix (C, 2^d) device array, columns are
    the rows.  Leaves hash the transposed matrix; values identical to
    `commit([matrix[0], ..., matrix[C-1]])`.

    The climb (leaf hash + every layer) runs as a few fused jitted
    blocks — ~d/8 device dispatches per tree instead of one per layer
    (each a full round-trip over a tunneled device link)."""
    matrix = jnp.asarray(matrix)
    C, n = matrix.shape
    d = _log2(n)

    layers: list = [None] * (d + 1)
    x = matrix.T
    top, leaf = d, True
    blk = _climb_block_size()
    while top >= 0:
        n_blk = min(blk, top + 1)
        out = _climb_block(leaf, top, n_blk)(x)
        for i, arr in enumerate(out):
            layers[top - i] = arr
        x = out[-1]
        top -= n_blk
        leaf = False
    by_depth = {d: list(range(C))}
    return MerkleTree(layers=layers, columns=[], by_depth=by_depth,
                      matrix=matrix)


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


class PendingDecommitment:
    """Dispatched-but-unmaterialized opening: all row gathers live on
    device until finalize().  Batch many trees' openings with
    `finalize_decommitments` — ONE host<->device round trip for the
    whole set instead of one per tree per layer (the dominant cost on
    a tunneled device link)."""

    def __init__(self, vals_dev, col_vals_list, sib_rows):
        self._vals_dev = vals_dev          # (C, Q) device or None
        self._col_vals = col_vals_list     # list of device arrays
        self._sib_rows = sib_rows          # list of (K_d, 8) device

    def device_arrays(self):
        arrs = [] if self._vals_dev is None else [self._vals_dev]
        return arrs + self._col_vals + self._sib_rows

    def finalize(self, fetched=None) -> "MerkleDecommitment":
        if fetched is None:
            import jax
            fetched = jax.device_get(self.device_arrays())
        fetched = list(fetched)
        out = MerkleDecommitment()
        if self._vals_dev is not None:
            vals = np.asarray(fetched.pop(0))
            out.column_values.extend(vals[c] for c in range(vals.shape[0]))
        for _ in self._col_vals:
            out.column_values.append(np.asarray(fetched.pop(0)))
        for _ in self._sib_rows:
            for r in np.asarray(fetched.pop(0)):
                out.sibling_hashes.append(r)
        return out


def decommit_async(tree: MerkleTree, queries) -> PendingDecommitment:
    """Dispatch all gathers of an opening; no host sync."""
    queries = sorted(set(int(q) for q in queries))
    vals_dev, col_vals = None, []
    if tree.matrix is not None:
        idx = jnp.asarray(np.asarray(queries, np.int64))
        vals_dev = tree.matrix[:, idx]             # one gather
    else:
        for ci, col in enumerate(tree.columns):
            d = _log2(col.shape[0])
            pos = _positions_at(queries, tree.max_depth, d)
            idx = jnp.asarray(np.asarray(pos, np.int64))
            col_vals.append(jnp.asarray(col)[idx])

    sib_rows = []                                  # device gathers
    pos = queries
    for d in range(tree.max_depth, 0, -1):
        pos_set = set(pos)
        sibs = [p ^ 1 for p in pos if (p ^ 1) not in pos_set]
        if sibs:
            idx = jnp.asarray(np.asarray(sibs, np.int64))
            sib_rows.append(jnp.asarray(tree.layers[d])[idx])
        pos = sorted({p >> 1 for p in pos})
    return PendingDecommitment(vals_dev, col_vals, sib_rows)


def decommit_async_with_values(tree: MerkleTree, queries,
                               vals_dev) -> PendingDecommitment:
    """Opening for a STREAMED tree (no resident eval matrix): the
    caller supplies the (C, Q) opened-value matrix (recomputed from
    coefficients); sibling digests come from the kept layers."""
    queries = sorted(set(int(q) for q in queries))
    sib_rows = []
    pos = queries
    for d in range(tree.max_depth, 0, -1):
        pos_set = set(pos)
        sibs = [p ^ 1 for p in pos if (p ^ 1) not in pos_set]
        if sibs:
            idx = jnp.asarray(np.asarray(sibs, np.int64))
            sib_rows.append(jnp.asarray(tree.layers[d])[idx])
        pos = sorted({p >> 1 for p in pos})
    return PendingDecommitment(vals_dev, [], sib_rows)


def finalize_decommitments(pendings) -> list:
    """Materialize many PendingDecommitments with one device_get."""
    import jax
    flat = [a for p in pendings for a in p.device_arrays()]
    fetched = jax.device_get(flat)
    out, k = [], 0
    for p in pendings:
        n = len(p.device_arrays())
        out.append(p.finalize(fetched[k:k + n]))
        k += n
    return out


def decommit(tree: MerkleTree, queries) -> MerkleDecommitment:
    """Open the tree at the given bottom-layer query positions."""
    return decommit_async(tree, queries).finalize()


def _verify_decommitment_uniform(root, depth: int, n_cols: int, queries,
                                 dec: MerkleDecommitment) -> bool:
    """Uniform-depth fast path: every column committed at the leaf
    layer (the only shape this framework's trees use).  Leaf messages
    are assembled as ONE numpy matrix (the generic path's per-column
    int/to_bytes loop was the hot spot at ~700 columns); the ~100-node
    layers hash via hashlib (lower fixed cost than vectorized numpy at
    this batch size)."""
    import hashlib
    pos = sorted(set(int(q) for q in queries))
    if len(dec.column_values) != n_cols or n_cols == 0:
        return False
    for cv in dec.column_values:
        if len(cv) != len(pos):
            return False
    vals = np.ascontiguousarray(
        np.stack([np.asarray(cv, dtype="<u4")
                  for cv in dec.column_values], axis=1))    # (P, C)
    cur = {p: hashlib.blake2s(vals[i].tobytes()).digest()
           for i, p in enumerate(pos)}
    sib_iter = iter(dec.sibling_hashes)
    for _d in range(depth, 0, -1):
        for p in list(cur):
            s = p ^ 1
            if s not in cur:
                try:
                    cur[s] = np.asarray(next(sib_iter),
                                        dtype="<u4").tobytes()
                except StopIteration:
                    return False
        parents = sorted({p >> 1 for p in pos})
        cur = {pp: hashlib.blake2s(cur[2 * pp] + cur[2 * pp + 1])
               .digest() for pp in parents}
        pos = parents
    return cur[0] == np.asarray(root, dtype="<u4").tobytes()


def verify_decommitment(root, column_lengths, queries,
                        decommitment: MerkleDecommitment) -> bool:
    """Recompute the root from a decommitment. Host-side.

    column_lengths: sizes of the committed columns in caller order.
    """
    import hashlib

    if column_lengths and all(n == column_lengths[0]
                              for n in column_lengths):
        return _verify_decommitment_uniform(
            root, _log2(column_lengths[0]), len(column_lengths),
            queries, decommitment)

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


class PendingPaddedDecommitment(PendingDecommitment):
    """Fused-opening variant: gathers arrive padded to fixed shapes
    (stable stored-program keys across proofs); finalize slices the
    padding off with the host-known true counts."""

    def __init__(self, vals_dev, sib_rows, n_pos: int, sib_counts):
        super().__init__(vals_dev, [], sib_rows)
        self._n_pos = n_pos
        self._sib_counts = list(sib_counts)

    def finalize(self, fetched=None) -> "MerkleDecommitment":
        if fetched is None:
            import jax
            fetched = jax.device_get(self.device_arrays())
        fetched = list(fetched)
        out = MerkleDecommitment()
        vals = np.asarray(fetched.pop(0))[:, : self._n_pos]
        out.column_values.extend(vals[c] for c in range(vals.shape[0]))
        for cnt in self._sib_counts:
            rows = np.asarray(fetched.pop(0))
            for r in rows[:cnt]:
                out.sibling_hashes.append(r)
        return out


def _pad_idx(lst, n: int) -> np.ndarray:
    assert len(lst) <= n, (len(lst), n)
    out = np.zeros(n, np.int32)
    out[: len(lst)] = lst
    return out


def open_plan(max_depth: int, positions):
    """Host-side opening plan: per depth (bottom-up) the sibling
    positions in the exact order `verify_decommitment` consumes them."""
    sib_positions = []
    pos = positions
    for _d in range(max_depth, 0, -1):
        ps = set(pos)
        sib_positions.append([p ^ 1 for p in pos if (p ^ 1) not in ps])
        pos = sorted({p >> 1 for p in pos})
    return sib_positions


def decommit_many_fused(items, pad_q: int):
    """Open MANY matrix trees with ONE stored device program.

    items: [(MerkleTree, positions[, max_pos])] — every gather (column
    values + sibling digests of every layer of every tree) runs in a
    single dispatch with host-precomputed, padding-stabilized index
    arrays (shapes keyed only by (C, depth, max_pos) per tree, so
    repeat proofs reuse the artifact).  ``max_pos`` defaults to
    ``2*pad_q`` ({p, p^1} pair openings); coset openings (FRI arity
    blocks) pass ``pad_q << k``.  Returns PendingPaddedDecommitments;
    finalize with `finalize_decommitments` (one transfer total).
    """
    from ..utils.progstore import aot_call

    specs, flat_args, metas = [], [], []
    for item in items:
        tree, positions = item[0], item[1]
        max_pos = item[2] if len(item) > 2 else 2 * pad_q
        assert tree.matrix is not None, "fused openings need matrix trees"
        positions = sorted(set(int(p) for p in positions))
        d0 = tree.max_depth
        npos_pad = min(max_pos, 1 << d0)
        sib_positions = open_plan(d0, positions)
        sib_pads = [min(max_pos, 1 << d) for d in range(d0, 0, -1)]
        metas.append((len(positions), [len(s) for s in sib_positions]))
        specs.append((int(tree.matrix.shape[0]), d0, npos_pad,
                      tuple(sib_pads)))
        flat_args.append((
            tree.matrix,
            [tree.layers[d] for d in range(d0, 0, -1)],
            jnp.asarray(_pad_idx(positions, npos_pad)),
            [jnp.asarray(_pad_idx(s, sp))
             for s, sp in zip(sib_positions, sib_pads)],
        ))

    def body(flat):
        outs = []
        for matrix, layers, pos_idx, sib_idxs in flat:
            outs.append((matrix[:, pos_idx],
                         [lay[si] for lay, si in zip(layers, sib_idxs)]))
        return outs

    outs = aot_call(("merkle.open_many", tuple(specs)), body, flat_args)
    return [PendingPaddedDecommitment(vals, sibs, metas[i][0],
                                      metas[i][1])
            for i, (vals, sibs) in enumerate(outs)]
