"""Constraint-satisfaction assertion harness (no FRI, no commitments).

Counterpart of the reference's `assert_chip` / stwo
`assert_constraints_on_polys`
(`/root/reference/prover/src/test_utils.rs:18-70`): evaluates every
constraint of a component set directly on the trace domain (offsets are
row rolls) with dummy lookup randomness, and checks that

* each constraint is identically zero on the trace rows, and
* the LogUp claimed sums cancel across components.

This runs in milliseconds on numpy/jnp arrays and is the first line of
defense for chip development; the full STARK pipeline is exercised
separately by the e2e tests.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import field as F
from .component import (GenContext, _finalize_logup, generate_interaction,
                        preprocessed_is_first)
from .expr import Felt, JNP, NP
from .lookups import LookupElements

__all__ = ["assert_constraints", "ConstraintViolation"]


class ConstraintViolation(AssertionError):
    pass


class _AssertCtx(GenContext):
    """GenContext + interaction columns + recorded constraint arrays."""
    accumulates = False

    def __init__(self, main_cols, pre_cols, inter_cols, relations,
                 claimed, log_size, params=None):
        from .component import _as_matrix
        super().__init__(_as_matrix(main_cols), _as_matrix(pre_cols),
                         relations, log_size, params=params)
        self._inter = [jnp.asarray(c, jnp.uint32) for c in inter_cols]
        self._claimed = np.asarray(claimed, np.uint64)
        self.violations = []
        self._k = 0

    def inter(self, b: int, off: int = 0) -> Felt:
        c = self._inter[b]
        if off:
            c = jnp.roll(c, -off, axis=0)
        return Felt(c, "qm31", JNP)

    def constraint(self, f: Felt):
        self._k += 1
        self.n_constraints += 1
        v = np.asarray(f.as_qm31().v, np.uint64) % np.uint64(F.P)
        bad = np.nonzero(v.reshape(v.shape[0], -1).any(axis=1))[0]
        if len(bad):
            self.violations.append((self._k - 1, bad[:8].tolist()))

    def constraint_vec(self, arr, count: int):
        v = np.asarray(arr, np.uint64) % np.uint64(F.P)   # (B, M, 4)
        for b in range(count):
            self._k += 1
            self.n_constraints += 1
            bad = np.nonzero(v[b].reshape(v.shape[1], -1)
                             .any(axis=1))[0]
            if len(bad):
                self.violations.append((self._k - 1, bad[:8].tolist()))


def _dummy_relations(infos):
    widths = {}
    for info in infos:
        for name, w in info.relation_widths.items():
            widths[name] = max(widths.get(name, 0), w)
    rng = np.random.default_rng(12345)

    def felt():
        return rng.integers(1, F.P, 4).astype(np.uint64)

    out = {}
    for name in sorted(widths):
        pows = [F.np_qm31(np.uint64(1))]
        alpha = felt()
        for _ in range(widths[name] - 1):
            pows.append(F.np_qm31_mul(pows[-1], alpha))
        out[name] = LookupElements(name=name, width=widths[name],
                                   z=felt(),
                                   alpha_pows=np.stack(pows, axis=0))
    return out


def assert_constraints(components, log_sizes, traces) -> None:
    """Raises ConstraintViolation with per-constraint detail on failure."""
    from .component import component_info
    infos = [component_info(c) for c in components]
    relations = _dummy_relations(infos)

    total = np.zeros(4, np.uint64)
    failures = []
    for ci, comp in enumerate(components):
        n = log_sizes[ci]
        pre = [np.asarray(arr, np.uint32)
               for _, arr in comp.preprocessed(n)]
        inter, claimed = generate_interaction(comp, traces[ci], pre,
                                              relations, n)
        claimed = np.asarray(claimed, np.uint64)
        total = F.np_qm31_add(total, claimed)
        ctx = _AssertCtx(traces[ci], pre, inter, relations, claimed, n,
                         params=comp.params())
        comp.evaluate(ctx)
        _finalize_logup(ctx)
        if ctx.violations:
            failures.append((comp.name, ctx.violations))
    if failures:
        msg = "\n".join(
            f"component {name}: constraints {[k for k, _ in viols]} "
            f"violated (first rows: {viols[0][1]})"
            for name, viols in failures)
        raise ConstraintViolation(msg)
    if total.any():
        raise ConstraintViolation(
            f"LogUp claimed sums do not cancel: {total}")


class _TupleCtx:
    """Records every add_fraction as (relation, mult rows, value rows)
    for the host-side multiset balance report (no field randomness)."""
    be = NP

    def __init__(self, main_cols, pre_cols, log_size, params, claimed):
        self._main = [np.asarray(c, np.int64) for c in main_cols]
        self._pre = [np.asarray(c, np.int64) for c in pre_cols]
        self.log_size = log_size
        self._params = params or {}
        self._claimed = claimed
        self.records = []          # (rel, mult (M,), [vals (M,)])
        self.n_constraints = 0
        self.entries = []

    def _col(self, arr, off):
        return np.roll(arr, -off) if off else arr

    def _felt(self, arr):
        return Felt(np.asarray(arr, np.uint64), "m31", NP)

    def main(self, i, off=0):
        return self._felt(self._col(self._main[i], off))

    def pre(self, j, off=0):
        return self._felt(self._col(self._pre[j], off))

    def main_block(self, lo, hi, off=0):
        block = np.stack([self._col(c, off)
                          for c in self._main[lo:hi]])
        return Felt(np.asarray(block, np.uint64), "m31", NP)

    def inter(self, b, off=0):
        raise RuntimeError("no interaction columns in tuple context")

    @property
    def is_first(self):
        return self._felt(preprocessed_is_first(self.log_size))

    @property
    def claimed(self):
        return Felt.qconst(self._claimed, NP)

    def param(self, name):
        return Felt.const(int(self._params[name]), NP)

    def constraint(self, f):
        self.n_constraints += 1

    def constraint_vec(self, arr, count):
        self.n_constraints += count

    def add_fraction(self, mult, rel, values):
        M = 1 << self.log_size

        def rows(v):
            if isinstance(v, Felt):
                a = np.asarray(v.v, np.int64)
            else:
                a = np.asarray(int(v) % F.P, np.int64)
            return np.broadcast_to(a, (M,)) if a.ndim == 0 else a

        self.records.append((rel, rows(mult), [rows(v) for v in values]))


def relation_balance_report(components, log_sizes, traces, max_show=8):
    """Host multiset check of every LogUp relation: emitted minus
    consumed tuple counts must be zero.  Returns {relation: [(tuple,
    residual), ...]} for the unbalanced tuples — the exact witness of a
    claimed-sums imbalance, component-independent of randomness."""
    from collections import defaultdict
    totals = defaultdict(lambda: defaultdict(int))
    half = F.P // 2
    for ci, comp in enumerate(components):
        n = log_sizes[ci]
        pre = [np.asarray(arr, np.int64)
               for _, arr in comp.preprocessed(n)]
        ctx = _TupleCtx(traces[ci], pre, n, comp.params(),
                        np.zeros(4, np.uint64))
        comp.evaluate(ctx)
        for rel, mult, vals in ctx.records:
            signed = np.where(mult > half, mult - F.P, mult)
            nz = np.nonzero(signed)[0]
            if not len(nz):
                continue
            stacked = np.stack([v[nz] for v in vals], axis=1)
            for row, m in zip(stacked, signed[nz]):
                totals[rel][tuple(int(x) for x in row)] += int(m)
    report = {}
    for rel, counts in totals.items():
        bad = [(k, v) for k, v in counts.items() if v != 0]
        if bad:
            report[rel] = sorted(bad)[:max_show]
    return report
