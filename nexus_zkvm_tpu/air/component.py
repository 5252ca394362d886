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

    def params(self) -> dict:
        """Scalar parameters read via ``ctx.param(name)`` — passed as
        *traced inputs* to the jitted evaluation paths so the compiled
        graphs are shared across programs/layouts."""
        return {}

    def jit_key(self):
        """Cache key for the jitted evaluation graphs.  Must capture
        everything `evaluate` bakes in besides shapes and params."""
        return (type(self).__module__, type(self).__qualname__,
                self.name, self.n_main)

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

    def __init__(self, relations=None, claimed=None, params=None):
        self.relations = relations or {}
        self.entries = []          # [(numerator Felt, denominator Felt)]
        self.n_constraints = 0
        self.acc = None            # Horner accumulator (Felt)
        self.alpha = None          # Felt qconst
        self._claimed = claimed
        self._params = params or {}

    # -- to be provided by subclasses: main/pre/inter/is_first ---------

    def param(self, name: str) -> Felt:
        """A component scalar parameter (layout constant etc.)."""
        v = self._params[name]
        if isinstance(v, (int, np.integer)):
            return Felt.const(int(v), self.be)
        return Felt(v, "m31", self.be, deg=0)

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
            self._accumulate(f)

    def constraint_vec(self, arr, count: int):
        """`count` consecutive QM31 constraints as one stacked
        (count, ..., 4) array — keeps the traced graph small for
        uniform constraint blocks (the LogUp column constraints)."""
        self.n_constraints += count
        if self.accumulates:
            self._accumulate_vec(arr, count)

    def _accumulate(self, f: Felt):
        f = f.as_qm31()
        if self.acc is None:
            self.acc = f
        else:
            self.acc = self.acc * self.alpha + f

    def _accumulate_vec(self, arr, count: int):
        for b in range(count):
            self._accumulate(Felt(arr[b], "qm31", self.be))


def _finalize_logup(ctx):
    """Emit the LogUp column constraints for the collected entries."""
    entries = ctx.entries
    if not entries:
        return
    if ctx.be is JNP:
        return _finalize_logup_batched(ctx)
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


def _finalize_logup_batched(ctx):
    """Device-path LogUp finalize: identical constraints to the loop
    above, built from stacked arrays (3 big QM31 multiplies total)."""
    entries = list(ctx.entries)
    if len(entries) % 2:
        one = Felt.qconst(np.array([1, 0, 0, 0], np.uint32), JNP)
        entries.append((Felt.const(0, JNP), one))
    nb = len(entries) // 2
    shape = None
    for n, d in entries:
        v = d.as_qm31().v
        if v.ndim >= 2:
            shape = v.shape
            break
    assert shape is not None

    def stacked(idx, which):
        return jnp.stack([
            jnp.broadcast_to(entries[2 * b + idx][which].as_qm31().v,
                             shape) for b in range(nb)])

    n1, n2 = stacked(0, 0), stacked(1, 0)
    d1, d2 = stacked(0, 1), stacked(1, 1)
    numer = F.qm31_add(F.qm31_mul(n1, d2), F.qm31_mul(n2, d1))
    dd = F.qm31_mul(d1, d2)

    inter = jnp.stack([ctx.inter(b, 0).v for b in range(nb)])
    prev = jnp.concatenate([jnp.zeros((1,) + shape, jnp.uint32),
                            inter[:-1]])
    lhs = F.qm31_sub(inter, prev)
    # last batch: S - S[-1 row] - S_{B-2} + is_first * claimed
    last_fix = F.qm31_sub(
        (ctx.is_first * ctx.claimed).as_qm31().v,
        ctx.inter(nb - 1, -1).v)
    lhs = lhs.at[-1].set(F.qm31_add(lhs[-1], last_fix))
    cons = F.qm31_sub(F.qm31_mul(lhs, dd), numer)
    ctx.constraint_vec(cons, nb)


class InfoContext(_BaseCtx):
    """Shape collection on 4-row dummy data (host numpy)."""
    be = NP
    ROWS = 4

    def __init__(self, params=None):
        super().__init__(claimed=np.zeros(4, np.uint64), params=params)
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


_INFO_CACHE: dict = {}


def component_info(component: Component) -> ComponentInfo:
    """Shape introspection (column counts, masks, relation widths).
    Cached on ``jit_key()`` — the same key the jitted evaluation graphs
    share, so any two components with equal keys have identical
    constraint structure by construction."""
    key = component.jit_key()
    info = _INFO_CACHE.get(key)
    if info is None:
        info = _component_info_uncached(component)
        _INFO_CACHE[key] = info
    return info


def _component_info_uncached(component: Component) -> ComponentInfo:
    ctx = InfoContext(params=component.params())
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
    """Interaction generation over the trace domain (jnp, natural
    order).  Columns live in ONE (C, M) matrix — a per-column argument
    list would give the jitted graph thousands of parameters."""

    def __init__(self, main_matrix, pre_matrix, relations, log_size: int,
                 params=None):
        super().__init__(relations=relations, params=params)
        self.log_size = log_size
        self._main = main_matrix         # (C, M) or None
        self._pre = pre_matrix           # (P, M) or None

    def _row(self, mat, i, off):
        c = mat[i]
        if off:
            c = jnp.roll(c, -off, axis=0)
        return Felt(c, "m31", JNP)

    def main(self, i: int, off: int = 0) -> Felt:
        return self._row(self._main, i, off)

    def pre(self, j: int, off: int = 0) -> Felt:
        return self._row(self._pre, j, off)

    def main_block(self, lo: int, hi: int, off: int = 0) -> Felt:
        """Contiguous rows [lo, hi) as one stacked Felt."""
        c = self._main[lo:hi]
        if off:
            c = jnp.roll(c, -off, axis=-1)
        return Felt(c, "m31", JNP)

    @property
    def is_first(self) -> Felt:
        return Felt(jnp.asarray(preprocessed_is_first(self.log_size)),
                    "m31", JNP)

    def inter(self, b, off=0):
        raise RuntimeError("interaction columns not available during gen")


def _gen_interaction_body(component, main_cols, pre_cols, relations,
                          log_size, params):
    ctx = GenContext(main_cols, pre_cols, relations, log_size,
                     params=params)
    component.evaluate(ctx)
    if not ctx.entries:
        return []
    entries = list(ctx.entries)
    if len(entries) % 2:
        one = Felt.qconst(np.array([1, 0, 0, 0], np.uint32), JNP)
        entries.append((Felt.const(0, JNP), one))
    nb = len(entries) // 2
    full = (1 << log_size, 4)

    def stacked(idx, which):
        return jnp.stack([
            jnp.broadcast_to(entries[2 * b + idx][which].as_qm31().v,
                             full) for b in range(nb)])

    # batched pair combination + ONE field inversion for all batches —
    # the ~500-op inversion chain appears once in the traced graph
    n1, n2 = stacked(0, 0), stacked(1, 0)
    d1, d2 = stacked(0, 1), stacked(1, 1)
    numer = F.qm31_add(F.qm31_mul(n1, d2), F.qm31_mul(n2, d1))
    dd = F.qm31_mul(d1, d2)
    fracs = F.qm31_mul(numer, F.qm31_inv(dd))            # (B, M, 4)
    cols = []
    running = fracs[0]
    for b in range(1, fracs.shape[0]):
        cols.append(running)
        running = F.qm31_add(running, fracs[b])
    # running == per-row total T; its prefix sum is the last column
    last = jax.lax.associative_scan(F.m31_add, running, axis=0)
    cols.append(last)
    # one stacked (B, M, 4) output: a single device buffer instead of
    # B small ones (each downstream slice would be its own dispatch)
    return jnp.stack(cols)


def _relations_key(relations):
    return tuple(sorted((r.name, r.width) for r in relations.values()))


def _relations_flat(relations):
    return {name: (jnp.asarray(r.z, jnp.uint32),
                   jnp.asarray(r.alpha_pows, jnp.uint32))
            for name, r in relations.items()}


def _relations_unflat(flat):
    from .lookups import LookupElements
    return {name: LookupElements(name=name, width=int(pows.shape[0]),
                                 z=z, alpha_pows=pows)
            for name, (z, pows) in flat.items()}


def _params_flat(component):
    return {k: jnp.uint32(int(v) & 0x7FFFFFFF)
            for k, v in component.params().items()}


def generate_interaction(component, main_cols, pre_cols, relations,
                         log_size: int):
    """Run evaluate() to collect fractions; build the LogUp columns.

    Returns (inter_cols, claimed_sum): inter_cols is a list of B
    (2^log_size, 4) uint32 jnp arrays (natural order), claimed_sum a
    (4,) DEVICE array (callers np.asarray it after dispatching every
    component, so the per-component executions pipeline instead of
    host-syncing one by one).  The whole generation is one stored AOT
    XLA program per (component, shapes) — layout constants and
    Fiat-Shamir randomness enter as arguments so the stored artifact
    is program-independent.
    """
    from ..utils.profile import scope
    from ..utils.progstore import aot_call
    key = ("gen", component.jit_key(), log_size,
           _relations_key(relations))

    def raw(main, pre, rel_flat, params):
        rels = _relations_unflat(rel_flat)
        return _gen_interaction_body(component, main, pre, rels,
                                     log_size, params)
    with scope(f"gen:{component.name}"):
        cols = aot_call(key, raw, _as_matrix(main_cols),
                        _as_matrix(pre_cols), _relations_flat(relations),
                        _params_flat(component))
        if isinstance(cols, (list, tuple)) and not cols:
            return [], np.zeros(4, np.uint64)
    return cols, cols[-1][-1]


def _as_matrix(cols):
    """List of (M,) columns -> one (C, M) device matrix (or None)."""
    if cols is None or (hasattr(cols, "ndim") and cols.ndim == 2):
        return None if cols is None else jnp.asarray(cols)
    if len(cols) == 0:
        return None
    if all(isinstance(c, np.ndarray) for c in cols):
        return jnp.asarray(np.stack(cols).astype(np.uint32))
    return jnp.stack([jnp.asarray(c, jnp.uint32) for c in cols])


class DomainEvalContext(_BaseCtx):
    """Composition evaluation on the 4x domain (jnp, natural order).

    Constraints are collected and combined at the end with a chunked
    weighted sum over precomputed alpha powers (Horner order preserved:
    constraint j gets alpha^(K-1-j)) — the XLA graph stays ~100 ops for
    the accumulation instead of ~30 per constraint.
    """
    accumulates = True
    EXTRA = 4  # rows of the eval domain per trace row
    CHUNK = 64

    def __init__(self, main_evals, pre_evals, inter_evals, is_first_evals,
                 relations, claimed, alpha, params=None):
        super().__init__(relations=relations, claimed=claimed,
                         params=params)
        self._main = main_evals      # (C, M) jnp matrix
        self._pre = pre_evals        # (P, M) jnp matrix
        self._inter = inter_evals    # (B, M, 4) jnp array
        self._is_first = is_first_evals
        self.alpha = Felt.qconst(alpha, JNP)
        self._collected = []         # [(Felt, idx)]

    def main_block(self, lo: int, hi: int, off: int = 0) -> Felt:
        c = self._main[lo:hi]
        if off:
            c = jnp.roll(c, -off * self.EXTRA, axis=-1)
        return Felt(c, "m31", JNP)

    def _accumulate(self, f: Felt):
        self._collected.append(("one", f))

    def _accumulate_vec(self, arr, count: int):
        self._collected.append(("vec", arr, count))

    def finalize_acc(self):
        """Combine collected constraints: acc = sum_j alpha^(K-1-j) c_j
        (identical to the verifier's Horner order)."""
        if not self._collected:
            self.acc = None
            return None
        # constraint index layout
        items, K = [], 0
        for it in self._collected:
            if it[0] == "one":
                items.append((K, it[1]))
                K += 1
            else:
                items.append((K, it))
                K += it[2]
        pows = F.qm31_pow_list(self.alpha.v, K)      # (K, 4), pows[e]=a^e
        m31_items = [(j, f) for j, f in items
                     if not isinstance(f, tuple) and f.kind == "m31"]
        qm31_items = [(j, f) for j, f in items
                      if not isinstance(f, tuple) and f.kind == "qm31"]
        vec_items = [(j, it) for j, it in items if isinstance(it, tuple)]
        total = None
        # m31 constraints: chunked modular weighted sums per coordinate
        for lo in range(0, len(m31_items), self.CHUNK):
            part_items = m31_items[lo:lo + self.CHUNK]
            stack = jnp.stack([f.v for _, f in part_items])     # (G, M)
            w = pows[jnp.asarray([K - 1 - j for j, _ in part_items])]
            coords = []
            for t in range(4):
                prod = F.m31_mul(stack, w[:, t, None])          # (G, M)
                coords.append(F.m31_fold_sum(prod, axis=0))
            s = jnp.stack(coords, axis=-1)                      # (M, 4)
            total = s if total is None else F.qm31_add(total, s)
        # individual qm31 constraints
        for j, f in qm31_items:
            term = F.qm31_mul(jnp.broadcast_to(pows[K - 1 - j],
                                               f.v.shape), f.v)
            total = term if total is None else F.qm31_add(total, term)
        # vector blocks: one batched multiply + modular sum per block
        for j0, (_, arr, count) in vec_items:
            w = pows[jnp.asarray([K - 1 - (j0 + b)
                                  for b in range(count)])]      # (B, 4)
            prod = F.qm31_mul(arr, w[:, None, :])               # (B, M, 4)
            s = F.m31_fold_sum(prod, axis=0)   # qm31 add is coordwise
            total = s if total is None else F.qm31_add(total, s)
        self.acc = Felt(total, "qm31", JNP)
        return total

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

    def __init__(self, mask_values, relations, claimed, alpha,
                 params=None):
        """mask_values: {('main'|'pre'|'inter'|'is_first', idx, off) -> (4,)}."""
        super().__init__(relations=relations, claimed=claimed,
                         params=params)
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
    if hasattr(ctx, "finalize_acc"):
        ctx.finalize_acc()
    return ctx.acc, ctx.n_constraints


_NCONS_CACHE = {}


def _n_constraints_of(component) -> int:
    """Constraint count via a host-side InfoContext run (cached —
    the count is shape- and randomness-independent)."""
    key = component.jit_key()
    if key not in _NCONS_CACHE:
        _NCONS_CACHE[key] = component_info(component).n_constraints
    return _NCONS_CACHE[key]


def run_constraints_domain(component, main_evals, pre_evals, inter_evals,
                           isf_evals, relations, claimed, alpha):
    """Composition evaluation over the 4x domain as a stored AOT
    program.

    Returns (acc (M, 4) jnp array | None, n_constraints).  One XLA
    program per (component, shapes); layout constants and Fiat-Shamir
    randomness enter as arguments, so repeat proofs reuse the stored
    artifact and the persistent compilation cache.
    """
    from ..utils.progstore import aot_call
    key = ("dom", component.jit_key(), _relations_key(relations))

    def raw(main, pre, inter, isf, rel_flat, claimed_, alpha_,
            params):
        ctx = DomainEvalContext(
            main, pre, inter, isf,
            _relations_unflat(rel_flat), claimed_, alpha_,
            params=params)
        component.evaluate(ctx)
        _finalize_logup(ctx)
        ctx.finalize_acc()
        if ctx.acc is None:
            return None
        return ctx.acc.as_qm31().v

    if getattr(inter_evals, "ndim", None) == 3:
        inter_m = jnp.asarray(inter_evals)
    else:
        inter_m = (jnp.stack([jnp.asarray(c) for c in inter_evals])
                   if len(inter_evals) else None)
    acc = aot_call(key, raw, _as_matrix(main_evals),
                   _as_matrix(pre_evals), inter_m,
                   isf_evals, _relations_flat(relations),
                   jnp.asarray(np.asarray(claimed, np.uint32)),
                   jnp.asarray(np.asarray(alpha, np.uint32)),
                   _params_flat(component))
    return acc, _n_constraints_of(component)


class ChunkedDomainEvalContext(DomainEvalContext):
    """Row-chunked composition evaluation for trace sizes whose 4x
    domain does not fit HBM next to the committed evals.

    Columns arrive halo-extended: ext position p holds natural row
    (p - halo_neg) mod M, so every mask offset in [-halo_neg/EXTRA,
    +halo_pos/EXTRA] is a static-length ``lax.dynamic_slice`` — no
    wraparound logic inside the scanned chunk body, and peak live
    memory is one chunk (plus the shared inputs), not the 4x domain.

    ``main_chunks`` / ``inter_chunks`` are lists of row-blocks (the
    LDE step emits blocks to bound ITS memory too); row lookup across
    blocks is static Python at trace time.
    """

    def __init__(self, main_chunks, pre_ext, inter_chunks, isf_ext,
                 start, L, halo_neg, relations, claimed, alpha,
                 params=None):
        _BaseCtx.__init__(self, relations=relations, claimed=claimed,
                          params=params)
        self._mchunks = []           # [(row0, (Cj, M+H))]
        r0 = 0
        for a in (main_chunks or []):
            self._mchunks.append((r0, a))
            r0 += a.shape[0]
        self._ichunks = []           # [(b0, (Bj, M+H, 4))]
        b0 = 0
        for a in (inter_chunks or []):
            self._ichunks.append((b0, a))
            b0 += a.shape[0]
        self._pre_ext = pre_ext      # (P, M+H) or None
        self._isf_ext = isf_ext      # (M+H,)
        self._start = start          # traced scalar: chunk row offset
        self._L = int(L)
        self._hneg = int(halo_neg)
        self.alpha = Felt.qconst(alpha, JNP)
        self._collected = []

    # -- slicing ------------------------------------------------------
    def _begin(self, off: int):
        return self._start + jnp.int32(self._hneg + off * self.EXTRA)

    def _slice1(self, v, off):
        return jax.lax.dynamic_slice(v, (self._begin(off),), (self._L,))

    def _slice_rows(self, m, off):
        return jax.lax.dynamic_slice(
            m, (jnp.int32(0), self._begin(off)), (m.shape[0], self._L))

    def _slice_q(self, v, off):
        return jax.lax.dynamic_slice(
            v, (self._begin(off), jnp.int32(0)), (self._L, 4))

    @staticmethod
    def _find(chunks, i):
        for r0, a in chunks:
            if r0 <= i < r0 + a.shape[0]:
                return a, i - r0
        raise IndexError(i)

    # -- accessors ----------------------------------------------------
    def main(self, i, off=0):
        a, j = self._find(self._mchunks, i)
        return Felt(self._slice1(a[j], off), "m31", JNP)

    def main_block(self, lo: int, hi: int, off: int = 0) -> Felt:
        parts, i = [], lo
        while i < hi:
            a, j = self._find(self._mchunks, i)
            take = min(hi - i, a.shape[0] - j)
            parts.append(self._slice_rows(a[j:j + take], off))
            i += take
        c = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
        return Felt(c, "m31", JNP)

    def pre(self, j, off=0):
        return Felt(self._slice1(self._pre_ext[j], off), "m31", JNP)

    def inter(self, b, off=0):
        a, j = self._find(self._ichunks, b)
        return Felt(self._slice_q(a[j], off), "qm31", JNP)

    @property
    def is_first(self):
        return Felt(self._slice1(self._isf_ext, 0), "m31", JNP)


def domain_halo(info) -> tuple:
    """(halo_neg, halo_pos) ext columns needed by a component's masks
    (+ the LogUp finalize's inter(b, -1) read)."""
    offs = {0, -1 if info.n_logup_cols else 0}
    for m in (info.masks_main, info.masks_pre, info.masks_inter):
        for offsets in m.values():
            offs.update(offsets)
    extra = DomainEvalContext.EXTRA
    return (extra * max(0, -min(offs)), extra * max(0, max(offs)))


def run_constraints_domain_chunked(component, main_chunks, pre_ext,
                                   inter_chunks, isf_ext, relations,
                                   claimed, alpha, invv_nat, shift_pow,
                                   n_chunks: int, halo):
    """Composition contribution of one component, scan-chunked.

    Inputs are halo-extended natural-order eval arrays (device); the
    whole evaluation runs as ONE stored AOT program whose scanned body
    touches one 2^ev/n_chunks-row chunk at a time.  Returns the (M, 4)
    natural-order contribution  shift * acc / v_n.
    """
    from ..utils.progstore import aot_call
    halo_neg, halo_pos = halo
    key = ("domscan", component.jit_key(), _relations_key(relations),
           n_chunks, halo_neg, halo_pos)

    def raw(main_chunks, pre_ext, inter_chunks, isf_ext, rel_flat,
            claimed_, alpha_, invv_nat, shift_pow, params):
        rels = _relations_unflat(rel_flat)
        M = isf_ext.shape[-1] - halo_neg - halo_pos
        L = M // n_chunks
        assert L * n_chunks == M

        def body(_, start):
            ctx = ChunkedDomainEvalContext(
                main_chunks, pre_ext, inter_chunks, isf_ext, start, L,
                halo_neg, rels, claimed_, alpha_, params=params)
            component.evaluate(ctx)
            _finalize_logup(ctx)
            ctx.finalize_acc()
            acc = (jnp.zeros((L, 4), jnp.uint32) if ctx.acc is None
                   else ctx.acc.as_qm31().v)
            iv = jax.lax.dynamic_slice(invv_nat, (start,), (L,))
            contrib = F.qm31_mul_m31(acc, iv)
            return 0, F.qm31_mul(jnp.broadcast_to(shift_pow,
                                                  contrib.shape), contrib)

        starts = jnp.arange(n_chunks, dtype=jnp.int32) * L
        _, ys = jax.lax.scan(body, 0, starts)
        return ys.reshape(M, 4)

    return aot_call(key, raw, main_chunks, pre_ext, inter_chunks,
                    isf_ext, _relations_flat(relations),
                    jnp.asarray(np.asarray(claimed, np.uint32)),
                    jnp.asarray(np.asarray(alpha, np.uint32)),
                    invv_nat,
                    jnp.asarray(np.asarray(shift_pow, np.uint32)),
                    _params_flat(component))
