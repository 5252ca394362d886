"""Polynomial commitment scheme: LDE + Merkle forests per role.

Counterpart of stwo's ``CommitmentSchemeProver`` / ``tree_builder``
(`/root/reference/prover/src/machine.rs:202-263`). Differences by
design (TPU-first):

* one Merkle tree per (role, eval-domain size) instead of one
  mixed-size tree per role — query openings then live at uniform
  positions ``{p, p^1}`` whose paths shrink ``q >> 1`` per FRI fold,
  and each tree commit is a stack of equal-length rows (one batched
  Blake2s kernel per layer, no mixed-depth injection);
* committed order is bit-reversed layout (see `ops/circle.py`).

Columns enter in **natural row order** and leave as (coeffs, committed
evals, trees).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..ops import cfft, merkle
from ..ops.circle import (
    bit_reverse_indices, natural_to_layout, layout_to_natural,
)

__all__ = ["RoleCommitment", "commit_columns", "commit_from_coeffs",
           "open_positions"]


@dataclass
class RoleCommitment:
    role: str
    trace_logs: list          # per column (plan order within role)
    log_blowup: int
    coeffs: list              # per column: np (2^n,) uint32, bitrev layout
    evals: dict               # eval_log -> (C, 2^s) np uint32, committed order
    cols_by_size: dict        # eval_log -> [column indices], plan order
    trees: dict               # eval_log -> merkle.MerkleTree

    def sizes_desc(self):
        return sorted(self.trees, reverse=True)

    def roots(self):
        return [(s, np.asarray(self.trees[s].root()))
                for s in self.sizes_desc()]

    def mix_roots(self, channel):
        for s, root in self.roots():
            channel.mix_u32s(root)

    def evals_natural(self, col_idx: int, eval_log: int):
        """Column evals on a (possibly larger) domain, natural order (jnp)."""
        n = self.trace_logs[col_idx]
        assert eval_log >= n
        ev = cfft.evaluate(jnp.asarray(self.coeffs[col_idx]), eval_log)
        return ev[jnp.asarray(natural_to_layout(eval_log))]

    def evals_natural_many(self, col_idxs, eval_log: int):
        """Batched `evals_natural`: one stacked FFT for many columns of
        the same trace size."""
        if not col_idxs:
            return []
        sizes = {self.trace_logs[i] for i in col_idxs}
        assert len(sizes) == 1 and eval_log >= sizes.pop()
        batch = jnp.stack([jnp.asarray(self.coeffs[i])
                           for i in col_idxs])
        ev = cfft.evaluate(batch, eval_log)
        ev = ev[:, jnp.asarray(natural_to_layout(eval_log))]
        return [ev[j] for j in range(ev.shape[0])]

    def open(self, positions_by_size: dict):
        """[(eval_log, MerkleDecommitment)] descending by size."""
        return [(s, merkle.decommit(self.trees[s], positions_by_size[s]))
                for s in self.sizes_desc()]


def _commit_groups(role, trace_logs, coeffs_by_col, log_blowup):
    cols_by_size, evals, trees = {}, {}, {}
    for i in range(len(trace_logs)):
        s = trace_logs[i] + log_blowup
        cols_by_size.setdefault(s, []).append(i)
    for s, idxs in sorted(cols_by_size.items(), reverse=True):
        batch = jnp.stack([jnp.asarray(coeffs_by_col[i]) for i in idxs])
        ev = cfft.evaluate(batch, s)                      # layout order
        ev = ev[:, jnp.asarray(bit_reverse_indices(s))]   # committed order
        evals[s] = np.asarray(ev)
        trees[s] = merkle.commit([ev[j] for j in range(ev.shape[0])])
    return RoleCommitment(role=role, trace_logs=list(trace_logs),
                          log_blowup=log_blowup,
                          coeffs=[np.asarray(c) for c in coeffs_by_col],
                          evals=evals, cols_by_size=cols_by_size,
                          trees=trees)


def commit_columns(role: str, columns, trace_logs, log_blowup: int
                   ) -> RoleCommitment:
    """columns: natural-order uint32 arrays, sizes 2^trace_logs[i]."""
    coeffs = [None] * len(columns)
    by_n = {}
    for i, n in enumerate(trace_logs):
        by_n.setdefault(n, []).append(i)
    for n, idxs in by_n.items():
        batch = jnp.stack([jnp.asarray(columns[i], jnp.uint32)
                           for i in idxs])
        # layout_val[l] = natural_val[layout_to_natural[l]]
        batch = batch[:, jnp.asarray(layout_to_natural(n))]
        cf = cfft.interpolate(batch)
        cf = np.asarray(cf)
        for j, i in enumerate(idxs):
            coeffs[i] = cf[j]
    return _commit_groups(role, trace_logs, coeffs, log_blowup)


def commit_from_coeffs(role: str, coeffs, trace_logs, log_blowup: int
                       ) -> RoleCommitment:
    return _commit_groups(role, list(trace_logs),
                          [np.asarray(c, np.uint32) for c in coeffs],
                          log_blowup)


def open_positions(queries, s0: int, s: int):
    """Sorted opened positions {p, p^1}, p = q >> (s0 - s)."""
    out = set()
    for q in queries:
        p = int(q) >> (s0 - s)
        out.add(p)
        out.add(p ^ 1)
    return sorted(out)
