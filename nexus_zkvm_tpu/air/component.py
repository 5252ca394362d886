"""Components and evaluation contexts — the single-source AIR runner.

A ``Component`` (reference analogue: a chip/`FrameworkEval`,
`/root/reference/prover/src/traits.rs:32-121`) declares its main-trace
width, optional preprocessed columns, and one ``evaluate(ctx)`` method.
That method runs under four interchangeable contexts:

* ``InfoContext``       — shape collection: mask offsets, constraint
  count, LogUp batch count, relation widths (analogue of stwo's
  ``InfoEvaluator``). Runs on 4-row dummy data, host numpy.
* ``GenContext``        — LogUp interaction-trace generation, vectorized
  jnp over the trace domain (natural row order; offsets are rolls).
* ``DomainEvalContext`` — composition-polynomial evaluation over the
  4x-extended domain (offset ``o`` = roll by ``4*o``).
* ``PointEvalContext``  — the verifier's out-of-domain constraint check
  on sampled QM31 mask values (host numpy scalars).

LogUp column layout (this framework's scheme; fractions are batched in
pairs like stwo's ``LogupTraceGenerator``):

  With batches F_0..F_{B-1} per row, the interaction trace holds
  S_b = F_0+..+F_b (within-row partial sums) for b < B-1 and the
  running column  S[i] = sum_{i'<=i} T[i']  of the row totals T.
  claimed_sum = S[last].  Constraints (row-wise, deg <= 3):
     b=0:        S_0 * D_0 = N_0
     0<b<B-1:   (S_b - S_{b-1}) * D_b = N_b
     last:      (S - S[-1 row] - S_{B-2} + is_first*claimed) * D = N
  where for a pair-batch (n1/d1 + n2/d2): N = n1*d2 + n2*d1, D = d1*d2.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import field as F
from .expr import Felt, JNP, NP
from .lookups import LookupElements

__all__ = [
    "Component", "ComponentInfo", "component_info", "GenContext",
    "DomainEvalContext", "PointEvalContext", "InfoContext",
    "generate_interaction", "run_constraints", "MAX_CONSTRAINT_DEG",
]

# constraints / v_n must fit the 4x eval domain (LOG_CONSTRAINT_DEGREE=2)
MAX_CONSTRAINT_DEG = 4


class Component:
    """Base class. Subclasses set ``name``, ``n_main``, ``evaluate``."""

    name = "component"
    n_main = 0

    def preprocessed(self, log_size: int):
        """Deterministic preprocessed columns: list[(name, np uint32)]."""
        return []

    def evaluate(self, ctx):
        raise NotImplementedError


def preprocessed_is_first(log_size: int) -> np.ndarray:
    col = np.zeros(1 << log_size, np.uint32)
    col[0] = 1
    return col


# ---------------------------------------------------------------------------
# Contexts
# ---------------------------------------------------------------------------

class _BaseCtx:
    be = JNP
    accumulates = False

    def __init__(self, relations=None, claimed=None):
        self.relations = relations or {}
        self.entries = []          # [(numerator Felt, denominator Felt)]
        self.n_constraints = 0
        self.acc = None            # Horner accumulator (Felt)
        self.alpha = None          # Felt qconst
        self._claimed = claimed

    # -- to be provided by subclasses: main/pre/inter/is_first ---------

    def add_fraction(self, mult, rel: str, values):
        den = self.relations[rel].combine(values, self.be)
        num = mult if isinstance(mult, Felt) else Felt.const(int(mult),
                                                             self.be)
        self.entries.append((num, den))

    @property
    def claimed(self) -> Felt:
        return Felt.qconst(self._claimed, self.be)

    def constraint(self, f: Felt):
        assert f.deg <= MAX_CONSTRAINT_DEG, \
            f"constraint degree {f.deg} > {MAX_CONSTRAINT_DEG}"
        self.n_constraints += 1
        if self.accumulates:
            f = f.as_qm31()
            if self.acc is None:
                self.acc = f
            else:
                self.acc = self.acc * self.alpha + f


def _finalize_logup(ctx):
    """Emit the LogUp column constraints for the collected entries."""
    entries = ctx.entries
    if not entries:
        return
    batches = [entries[i:i + 2] for i in range(0, len(entries), 2)]
    nb = len(batches)
    claimed = ctx.claimed
    for b, batch in enumerate(batches):
        if len(batch) == 2:
            (n1, d1), (n2, d2) = batch
            numer = n1 * d2 + n2 * d1
            dd = d1 * d2
        else:
            (n1, d1), = batch
            numer, dd = n1, d1
        s_b = ctx.inter(b, 0)
        if b == nb - 1:
            lhs = s_b - ctx.inter(b, -1) + ctx.is_first * claimed
            if nb > 1:
                lhs = lhs - ctx.inter(b - 1, 0)
        elif b == 0:
            lhs = s_b
        else:
            lhs = s_b - ctx.inter(b - 1, 0)
        ctx.constraint(lhs * dd - numer)


class InfoContext(_BaseCtx):
    """Shape collection on 4-row dummy data (host numpy)."""
    be = NP
    ROWS = 4

    def __init__(self):
        super().__init__(claimed=np.zeros(4, np.uint64))
        self.masks_main = {}
        self.masks_pre = {}
        self.masks_inter = {}
        self.relation_widths = {}
        self.uses_is_first = False

    def add_fraction(self, mult, rel, values):
        w = self.relation_widths.get(rel, 0)
        self.relation_widths[rel] = max(w, len(values))
        if rel not in self.relations:
            self.relations[rel] = LookupElements.dummy(rel, 32)
        super().add_fraction(mult, rel, values)

    def main(self, i: int, off: int = 0) -> Felt:
        self.masks_main.setdefault(i, set()).add(off)
        return Felt(np.zeros(self.ROWS, np.uint64), "m31", NP)

    def pre(self, j: int, off: int = 0) -> Felt:
        self.masks_pre.setdefault(j, set()).add(off)
        return Felt(np.zeros(self.ROWS, np.uint64), "m31", NP)

    def inter(self, b: int, off: int = 0) -> Felt:
        self.masks_inter.setdefault(b, set()).add(off)
        return Felt(np.zeros((self.ROWS, 4), np.uint64), "qm31", NP)

    @property
    def is_first(self) -> Felt:
        self.uses_is_first = True
        col = np.zeros(self.ROWS, np.uint64)
        col[0] = 1
        return Felt(col, "m31", NP)


@dataclass
class ComponentInfo:
    n_main: int
    n_pre: int
    n_logup_cols: int                  # B (QM31 columns)
    n_constraints: int
    masks_main: dict                   # i -> sorted tuple of offsets
    masks_pre: dict
    masks_inter: dict                  # b -> sorted tuple of offsets
    relation_widths: dict
    uses_is_first: bool


def component_info(component: Component) -> ComponentInfo:
    ctx = InfoContext()
    component.evaluate(ctx)
    nb = (len(ctx.entries) + 1) // 2
    _finalize_logup(ctx)
    n_pre = len(component.preprocessed(4))
    masks_main = {i: tuple(sorted(ctx.masks_main.get(i, set()) | {0}))
                  for i in range(component.n_main)}
    masks_pre = {j: tuple(sorted(ctx.masks_pre.get(j, set()) | {0}))
                 for j in range(n_pre)}
    masks_inter = {b: tuple(sorted(ctx.masks_inter.get(b, set()) | {0}))
                   for b in range(nb)}
    return ComponentInfo(
        n_main=component.n_main, n_pre=n_pre, n_logup_cols=nb,
        n_constraints=ctx.n_constraints, masks_main=masks_main,
        masks_pre=masks_pre, masks_inter=masks_inter,
        relation_widths=dict(ctx.relation_widths),
        uses_is_first=ctx.uses_is_first or nb > 0)


class GenContext(_BaseCtx):
    """Interaction generation over the trace domain (jnp, natural order)."""

    def __init__(self, main_cols, pre_cols, relations, log_size: int):
        super().__init__(relations=relations)
        self.log_size = log_size
        self._main = [jnp.asarray(c, jnp.uint32) for c in main_cols]
        self._pre = [jnp.asarray(c, jnp.uint32) for c in pre_cols]

    def main(self, i: int, off: int = 0) -> Felt:
        c = self._main[i]
        if off:
            c = jnp.roll(c, -off, axis=0)
        return Felt(c, "m31", JNP)

    def pre(self, j: int, off: int = 0) -> Felt:
        c = self._pre[j]
        if off:
            c = jnp.roll(c, -off, axis=0)
        return Felt(c, "m31", JNP)

    @property
    def is_first(self) -> Felt:
        return Felt(jnp.asarray(preprocessed_is_first(self.log_size)),
                    "m31", JNP)

    def inter(self, b, off=0):
        raise RuntimeError("interaction columns not available during gen")


def generate_interaction(component, main_cols, pre_cols, relations,
                         log_size: int):
    """Run evaluate() to collect fractions; build the LogUp columns.

    Returns (inter_cols, claimed_sum): inter_cols is a list of B
    (2^log_size, 4) uint32 jnp arrays (natural order), claimed_sum a
    (4,) uint64 numpy array.
    """
    ctx = GenContext(main_cols, pre_cols, relations, log_size)
    component.evaluate(ctx)
    if not ctx.entries:
        return [], np.zeros(4, np.uint64)
    batches = [ctx.entries[i:i + 2] for i in range(0, len(ctx.entries), 2)]
    fracs = []
    for batch in batches:
        if len(batch) == 2:
            (n1, d1), (n2, d2) = batch
            numer = n1 * d2 + n2 * d1
            dd = d1 * d2
        else:
            (n1, d1), = batch
            numer, dd = n1, d1
        inv = Felt(F.qm31_inv(dd.as_qm31().v), "qm31", JNP)
        fracs.append((numer * inv).as_qm31().v)
    cols = []
    running = fracs[0]
    for f in fracs[1:]:
        cols.append(running)
        running = F.qm31_add(running, f)
    # running == per-row total T; its prefix sum is the last column
    last = jax.lax.associative_scan(F.m31_add, running, axis=0)
    cols.append(last)
    claimed = np.asarray(last[-1], np.uint64)
    return cols, claimed


class DomainEvalContext(_BaseCtx):
    """Composition evaluation on the 4x domain (jnp, natural order)."""
    accumulates = True
    EXTRA = 4  # rows of the eval domain per trace row

    def __init__(self, main_evals, pre_evals, inter_evals, is_first_evals,
                 relations, claimed, alpha):
        super().__init__(relations=relations, claimed=claimed)
        self._main = main_evals      # list[(M,) jnp]
        self._pre = pre_evals
        self._inter = inter_evals    # list[(M, 4) jnp]
        self._is_first = is_first_evals
        self.alpha = Felt.qconst(alpha, JNP)

    def _roll(self, c, off):
        return jnp.roll(c, -off * self.EXTRA, axis=0) if off else c

    def main(self, i, off=0):
        return Felt(self._roll(self._main[i], off), "m31", JNP)

    def pre(self, j, off=0):
        return Felt(self._roll(self._pre[j], off), "m31", JNP)

    def inter(self, b, off=0):
        return Felt(self._roll(self._inter[b], off), "qm31", JNP)

    @property
    def is_first(self):
        return Felt(self._is_first, "m31", JNP)


class PointEvalContext(_BaseCtx):
    """Verifier-side constraint evaluation at the OODS point (numpy)."""
    be = NP
    accumulates = True

    def __init__(self, mask_values, relations, claimed, alpha):
        """mask_values: {('main'|'pre'|'inter'|'is_first', idx, off) -> (4,)}."""
        super().__init__(relations=relations, claimed=claimed)
        self._vals = mask_values
        self.alpha = Felt.qconst(alpha, NP)

    def _get(self, role, i, off):
        return Felt(np.asarray(self._vals[(role, i, off)], np.uint64),
                    "qm31", NP)

    def main(self, i, off=0):
        return self._get("main", i, off)

    def pre(self, j, off=0):
        return self._get("pre", j, off)

    def inter(self, b, off=0):
        return self._get("inter", b, off)

    @property
    def is_first(self):
        return self._get("is_first", 0, 0)


def run_constraints(component, ctx):
    """Run evaluate + LogUp finalize; returns (acc Felt|None, count)."""
    component.evaluate(ctx)
    _finalize_logup(ctx)
    return ctx.acc, ctx.n_constraints
