"""FRI low-degree test over circle/line domains, in committed order.

TPU-native counterpart of stwo's FRI prover/verifier (the engine behind
``stwo::prover::prove`` consumed at
`/root/reference/prover/src/machine.rs:286-290`; config surface =
``FriConfig.log_blowup_factor`` etc. at
`/root/reference/prover/src/machine.rs:184-194`).

Protocol (self-consistent for this framework; see channel.py for the
transcript rules):

* Inputs: for each circle-domain log size ``s`` a QM31 evaluation vector
  ``Q_s`` (the combined OODS quotients of all columns committed at that
  size), in **committed (bit-reversed layout) order** — see
  `circle.py`. There is NO committed first layer: the verifier
  recomputes input values at query pairs from the trace openings, which
  saves a full-domain Merkle build.
* Fold rule (factor-2 scaling deliberately dropped; both sides use the
  same rule so consistency checks match):
      circle: out[i] = (a + b) + alpha * (a - b) * inv_y[i]
      line:   out[i] = (a + b) + alpha * (a - b) * inv_x[i]
  with (a, b) = (in[2i], in[2i+1]) — committed order makes every fold
  pair adjacent elements, so device folds are pure reshapes (no gathers)
  and a query's Merkle path position shrinks as ``q >> 1`` per fold.
* **Arity blocks** (TPU-first): a tunneled device pays a full round
  trip per Fiat-Shamir commitment (root fetch -> channel -> next
  alpha), so instead of committing after every pair-fold the prover
  commits once per *block* of up to ``2^log_arity`` folds. One alpha is
  drawn per committed layer; fold ``i`` inside a block uses
  ``alpha^(2^i)`` (standard higher-arity FRI batching). Each block runs
  as ONE fused device program: Merkle climb of the committed layer +
  all block folds + input injection — a single dispatch and a single
  (8-word) root fetch per block.
* Smaller inputs join the running line layer on the fold that lands at
  their folded size (block boundaries are forced at every input size,
  so an injection is always the *last* fold of its block and the next
  committed layer includes it):
      cur = w^2 * cur + circle_fold(Q_s, w)
  where ``w`` is the alpha power of the landing fold. (w is fresh
  w.r.t. Q_s: all inputs are fixed before FRI starts.)
* Last layer: the running line layer at size 2^(log_blowup +
  log_last_layer) is interpolated on the line domain and sent as its
  ``2^log_last_layer`` **coefficients** (the degree bound is enforced
  structurally by the number of coefficients; the verifier evaluates
  the coefficient polynomial at each query's landing point).

The canonical-generator chain makes the running line domain after
``s - s'`` folds *identical* (same points, same indexing) to the folded
domain of the size-``s'`` input — see `circle.subgroup_gen`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from .field import (
    P, np_m31_mul, np_qm31_add, np_qm31_sub, np_qm31_mul,
)
from .field import qm31_add, qm31_sub, qm31_mul, qm31_mul_m31
from .circle import domain, bit_reverse_indices
from . import merkle

__all__ = [
    "FriConfig", "FriProof", "fri_commit", "fri_decommit", "fri_replay",
    "fri_check_queries", "circle_fold_twiddles", "line_fold_twiddles",
    "fold_schedule", "FoldBlock",
]


@dataclass(frozen=True)
class FriConfig:
    log_blowup: int = 1
    log_last_layer: int = 2   # last-layer degree bound 2^2
    n_queries: int = 54
    log_arity: int = 3        # max pair-folds per committed block

    @property
    def last_line_log(self) -> int:
        return self.log_blowup + self.log_last_layer


# ---------------------------------------------------------------------------
# Fold schedule (host, static per input-size set)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class FoldBlock:
    m: int           # committed line-layer log size
    k: int           # pair folds after this commit (1 <= k <= 2^arity)
    inj: int | None  # input circle size joining at the landing (= m-k+1)


def fold_schedule(input_sizes, config: FriConfig):
    """Committed-layer schedule for a given set of circle input sizes.

    Block boundaries fall at every smaller input's folded size and at
    every ``log_arity``-th fold, whichever comes first — injections are
    therefore always the last fold of their block, so the verifier only
    ever needs a {p, p^1} pair from any *input* tree (committed inner
    layers are opened as whole 2^k cosets instead)."""
    sizes = sorted(set(int(s) for s in input_sizes), reverse=True)
    s0 = sizes[0]
    ll = config.last_line_log
    blocks = []
    m = s0 - 1
    while m > ll:
        k = min(config.log_arity, m - ll)
        for s in sizes[1:]:
            b = s - 1
            if m > b >= m - k:
                k = m - b
        inj = m - k + 1
        blocks.append(FoldBlock(
            m=m, k=k, inj=inj if inj in sizes[1:] else None))
        m -= k
    return blocks


# ---------------------------------------------------------------------------
# Fold twiddles (host precompute, committed order)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def circle_fold_twiddles(log_size: int) -> np.ndarray:
    """inv(y) twiddles for the circle->line fold of a size-2^log_size eval."""
    d = domain(log_size)
    return d.inv_y_twiddles[bit_reverse_indices(log_size - 1)]


@lru_cache(maxsize=None)
def line_fold_twiddles(log_line_size: int) -> np.ndarray:
    """inv(x) twiddles folding a line layer 2^m -> 2^(m-1).

    The size-2^m line domain is {x(H_k)} of the size-2^(m+1) circle
    domain; its fold twiddles are that domain's first x-twiddle stage.
    """
    d = domain(log_line_size + 1)
    t = d.inv_x_twiddle_stages[0]
    return t[bit_reverse_indices(log_line_size - 1)]


@lru_cache(maxsize=None)
def line_point_x(log_line_size: int) -> np.ndarray:
    """x-coordinates of the size-2^m line domain in committed order."""
    d = domain(log_line_size + 1)
    return d.half_x[bit_reverse_indices(log_line_size)]


# ---------------------------------------------------------------------------
# Line interpolation (host, for the coefficient last layer)
# ---------------------------------------------------------------------------

def line_interpolate(values_committed: np.ndarray) -> np.ndarray:
    """QM31 values on the size-2^m line domain (committed order) ->
    coefficients in **natural** j order, basis
    b_j(x) = prod_k pi^k(x)^(j_k).  Host numpy; last layers are tiny."""
    v = np.asarray(values_committed, np.uint64)
    m = int(v.shape[0]).bit_length() - 1
    assert v.shape == (1 << m, 4)
    if m == 0:
        return v.copy()
    d = domain(m + 1)
    v = v[bit_reverse_indices(m)]                  # -> layout order
    shape = v.shape
    for j in range(1, m + 1):
        half = 1 << (m - j)
        s = v.reshape(1 << (j - 1), 2, half, 4)
        a, b = s[:, 0], s[:, 1]
        t = d.inv_x_twiddle_stages[j - 1][:half, None]
        f0 = np_qm31_add(a, b)
        f1 = np_m31_mul(np_qm31_sub(a, b), t)
        v = np.stack([f0, f1], axis=1).reshape(shape)
    inv_n = np.uint64(pow(1 << m, P - 2, P))
    v = np_m31_mul(v, inv_n)
    # stage output is in bit-reversed j order -> natural
    return v[bit_reverse_indices(m)]


def line_eval_at(coeffs: np.ndarray, x: int) -> np.ndarray:
    """Evaluate natural-order line coefficients at an M31 point x."""
    c = np.asarray(coeffs, np.uint64)
    L = c.shape[0]
    acc = np.zeros(4, np.uint64)
    # b_j = prod pi^k(x)^{j_k}; direct recomputation (L is tiny)
    for j in range(L):
        bj = np.uint64(1)
        xx = np.uint64(x)
        jj = j
        while jj:
            if jj & 1:
                bj = np_m31_mul(bj, xx)
            xx = (2 * np_m31_mul(xx, xx) + np.uint64(P - 1)) % np.uint64(P)
            jj >>= 1
        acc = np_qm31_add(acc, np_m31_mul(c[j], bj))
    return acc


# ---------------------------------------------------------------------------
# Device folds
# ---------------------------------------------------------------------------

import jax as _jax


def _fold_body(v, alpha, inv_twiddles):
    v = v.reshape(-1, 2, 4)
    a, b = v[:, 0, :], v[:, 1, :]
    t = jnp.asarray(inv_twiddles)
    f0 = qm31_add(a, b)
    f1 = qm31_mul_m31(qm31_sub(a, b), t)
    return qm31_add(f0, qm31_mul(jnp.asarray(alpha, jnp.uint32), f1))


def _fold(v, alpha, inv_twiddles):
    """One fold step. v: (2L, 4) uint32 QM31; returns (L, 4).
    A stored AOT program: one device dispatch per fold."""
    from ..utils.progstore import aot_call
    return aot_call("fri.fold", _fold_body, v, alpha, inv_twiddles)


def dev_circle_fold_twiddles(log_size: int):
    from ..utils.devcache import dev_const
    return dev_const(("fri.ctw", log_size),
                     lambda: circle_fold_twiddles(log_size))


def dev_line_fold_twiddles(log_line_size: int):
    from ..utils.devcache import dev_const
    return dev_const(("fri.ltw", log_line_size),
                     lambda: line_fold_twiddles(log_line_size))


def fold_circle(v, alpha, log_size: int):
    return _fold(v, jnp.asarray(np.asarray(alpha, np.uint32)),
                 dev_circle_fold_twiddles(log_size))


def fold_line(v, alpha, log_line_size: int):
    return _fold(v, jnp.asarray(np.asarray(alpha, np.uint32)),
                 dev_line_fold_twiddles(log_line_size))


def _alpha_powers(alpha, k: int) -> np.ndarray:
    """(k, 4) uint32: alpha^(2^i) for i < k (host)."""
    out = np.empty((k, 4), np.uint32)
    a = np.asarray(alpha, np.uint64)
    for i in range(k):
        out[i] = a.astype(np.uint32)
        a = np_qm31_mul(a, a)
    return out


def _use_fused() -> bool:
    """Fused block programs chain ~m hash layers in one graph; XLA:CPU
    can blow its stack compiling those, and a live mesh wants the SPMD
    partitioner to see un-exported programs — both fall back."""
    import os
    from ..parallel.context import active_mesh
    force = os.environ.get("NZT_FUSE_FRI")
    if force == "0" or active_mesh() is not None:
        return False
    return force == "1" or _jax.default_backend() != "cpu"


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

@dataclass
class FriProverState:
    config: FriConfig
    input_sizes: list        # circle log sizes, descending
    schedule: list           # [FoldBlock]
    inner: list              # [(MerkleTree, root np, FoldBlock)]
    last_layer: np.ndarray   # (2^log_last_layer, 4) coefficients


def fri_commit(inputs: dict, channel, config: FriConfig) -> FriProverState:
    """Commit phase. inputs: {circle log size -> (2^s, 4) QM31 evals}."""
    sizes = sorted(inputs, reverse=True)
    s0 = sizes[0]
    assert all(s - 1 > 0 for s in sizes)
    assert sizes[-1] - 1 >= config.last_line_log, \
        "input smaller than the FRI last layer"
    sched = fold_schedule(sizes, config)
    fused = _use_fused()

    alpha = channel.draw_felt()
    cur = fold_circle(jnp.asarray(inputs[s0], jnp.uint32), alpha, s0)
    inner = []
    for blk in sched:
        inj_arr = (jnp.asarray(inputs[blk.inj], jnp.uint32)
                   if blk.inj is not None else None)
        # -- commit cur (the size-2^m committed layer) ------------------
        if fused:
            from ..utils.progstore import aot_call
            from .blake2s import batch_blake2s_words

            def climb(cur, _m=blk.m):
                layers = []
                below = batch_blake2s_words(cur)
                layers.append(below)
                for dd in range(_m - 1, -1, -1):
                    below = batch_blake2s_words(below.reshape(1 << dd, 16))
                    layers.append(below)
                return layers
            layers = aot_call(("fri.climb", blk.m), climb,
                              jnp.asarray(cur, jnp.uint32))
            tree = merkle.MerkleTree(layers=list(reversed(layers)),
                                     columns=[],
                                     by_depth={blk.m: [0, 1, 2, 3]},
                                     matrix=jnp.transpose(cur))
        else:
            tree = merkle.commit([cur[:, 0], cur[:, 1], cur[:, 2],
                                  cur[:, 3]])
        root = np.asarray(tree.root())      # the block's one host sync
        channel.mix_u32s(root)
        alpha = channel.draw_felt()
        pows = _alpha_powers(alpha, blk.k)
        # -- the block's folds (+ injection on the landing fold) --------
        if fused:
            tws = [dev_line_fold_twiddles(blk.m - i)
                   for i in range(blk.k)]
            inj_tw = (dev_circle_fold_twiddles(blk.inj)
                      if blk.inj is not None
                      else jnp.zeros((1,), jnp.uint32))

            def folds(cur, pows, tws, inj_arr, inj_tw, _blk=blk):
                v = cur
                for i in range(_blk.k):
                    v = _fold_body(v, pows[i], tws[i])
                if _blk.inj is not None:
                    w = pows[_blk.k - 1]
                    f = _fold_body(inj_arr, w, inj_tw)
                    w2 = qm31_mul(w[None, :], w[None, :])[0]
                    v = qm31_add(qm31_mul(w2, v), f)
                return v
            cur = aot_call(("fri.blockfold", blk.m, blk.k, blk.inj),
                           folds, jnp.asarray(cur, jnp.uint32),
                           jnp.asarray(pows), tws,
                           (inj_arr if inj_arr is not None
                            else jnp.zeros((2, 4), jnp.uint32)), inj_tw)
        else:
            v = cur
            for i in range(blk.k):
                v = _fold(v, jnp.asarray(pows[i]),
                          dev_line_fold_twiddles(blk.m - i))
            if blk.inj is not None:
                w = pows[blk.k - 1]
                f = fold_circle(inj_arr, w, blk.inj)
                w2 = np_qm31_mul(np.asarray(w, np.uint64),
                                 np.asarray(w, np.uint64)).astype(np.uint32)
                v = qm31_add(qm31_mul(jnp.asarray(w2), v), f)
            cur = v
        inner.append((tree, root, blk))

    last_vals = np.asarray(cur)                  # (2^ll, 4) committed
    coeffs_full = line_interpolate(last_vals)
    coeffs = coeffs_full[: 1 << config.log_last_layer]
    # degree accounting check: if an upstream bug ever leaves the
    # running layer above the last-layer degree bound, fail HERE (the
    # proof would otherwise only fail much later at verification).
    # NZT_FRI_UNSAFE_TRUNCATE=1 disables it (soundness tests use it to
    # emulate a malicious prover and check the VERIFIER rejects).
    import os as _os
    if not _os.environ.get("NZT_FRI_UNSAFE_TRUNCATE"):
        assert not coeffs_full[1 << config.log_last_layer:].any(), \
            "FRI last layer exceeds its degree bound (upstream fold bug?)"
    coeffs = coeffs.astype(np.uint32)
    channel.mix_felts(coeffs)
    return FriProverState(config=config, input_sizes=sizes,
                          schedule=sched, inner=inner, last_layer=coeffs)


@dataclass
class FriProof:
    inner_roots: list             # [(8,) uint32]
    inner_decommitments: list     # [merkle.MerkleDecommitment]
    last_layer: np.ndarray        # (2^log_last_layer, 4) uint32 coeffs


def _coset_positions(queries, shift: int, k: int):
    """Opened positions: the full 2^k-coset of p = q >> shift."""
    M = 1 << k
    out = set()
    for q in queries:
        base = (int(q) >> shift) & ~(M - 1)
        out.update(range(base, base + M))
    return sorted(out)


def fri_decommit(state: FriProverState, queries) -> FriProof:
    """All layer openings are dispatched async and materialized with a
    single host<->device transfer (`merkle.finalize_decommitments`)."""
    s0 = state.input_sizes[0]
    roots, pendings = [], []
    for tree, root, blk in state.inner:
        pos = _coset_positions(queries, s0 - blk.m, blk.k)
        roots.append(root)
        pendings.append(merkle.decommit_async(tree, pos))
    decs = merkle.finalize_decommitments(pendings)
    return FriProof(inner_roots=roots, inner_decommitments=decs,
                    last_layer=state.last_layer)


# ---------------------------------------------------------------------------
# Verifier
# ---------------------------------------------------------------------------

def fri_replay(proof: FriProof, channel, config: FriConfig,
               input_sizes) -> list:
    """Replay the commit-phase transcript; returns the alpha schedule.

    Must be called with the channel in the same state as the prover's
    was at fri_commit time.
    """
    sizes = sorted(set(int(s) for s in input_sizes), reverse=True)
    sched = fold_schedule(sizes, config)
    if len(proof.inner_roots) != len(sched) or \
            len(proof.inner_decommitments) != len(sched):
        raise ValueError("FRI proof has wrong number of inner layers")
    if proof.last_layer.shape != (1 << config.log_last_layer, 4):
        raise ValueError("FRI last layer has wrong shape")

    alphas = [channel.draw_felt()]
    for root in proof.inner_roots:
        channel.mix_u32s(root)
        alphas.append(channel.draw_felt())
    channel.mix_felts(np.asarray(proof.last_layer, np.uint32))
    return alphas


def _np_fold_pair(a, b, alpha, inv_t: int):
    f0 = np_qm31_add(a, b)
    f1 = np_m31_mul(np_qm31_sub(a, b), np.uint64(inv_t))
    return np_qm31_add(f0, np_qm31_mul(alpha, f1))


def fri_check_queries(proof: FriProof, alphas, queries, inputs_at,
                      input_sizes, config: FriConfig) -> bool:
    """Check fold consistency at every query.

    inputs_at: {circle log size -> {position -> (4,) QM31 value}} —
    quotient values recomputed by the caller from trace openings, at
    positions {q >> (s0 - s), (q >> (s0 - s)) ^ 1} for every query q.
    """
    sizes = sorted(set(int(s) for s in input_sizes), reverse=True)
    s0 = sizes[0]
    sched = fold_schedule(sizes, config)
    if len(proof.inner_decommitments) != len(sched) or \
            len(proof.inner_roots) != len(sched):
        return False
    if np.asarray(proof.last_layer).shape != \
            (1 << config.log_last_layer, 4):
        return False
    if config.last_line_log == 0:
        # degenerate config (blowup 0 + last layer 0): no line domain
        # to evaluate the last layer on — reject explicitly instead of
        # dereferencing a None lx below
        return False

    # Verify inner-layer Merkle openings once, and index their values.
    inner_vals = []
    for dec, blk in zip(proof.inner_decommitments, sched):
        pos = _coset_positions(queries, s0 - blk.m, blk.k)
        ok = merkle.verify_decommitment(
            proof.inner_roots[len(inner_vals)], [1 << blk.m] * 4, pos,
            dec)
        if not ok:
            return False
        vals = {p: np.asarray([dec.column_values[c][i] for c in range(4)],
                              np.uint64)
                for i, p in enumerate(pos)}
        inner_vals.append(vals)

    ctw = {s: circle_fold_twiddles(s) for s in sizes}
    ll = config.last_line_log
    last_coeffs = np.asarray(proof.last_layer, np.uint64)
    lx = line_point_x(ll) if ll > 0 else None

    for q in queries:
        q = int(q)
        alpha = np.asarray(alphas[0], np.uint64)
        try:
            v0 = np.asarray(inputs_at[s0][q & ~1], np.uint64)
            v1 = np.asarray(inputs_at[s0][q | 1], np.uint64)
        except KeyError:
            return False
        val = _np_fold_pair(v0, v1, alpha, int(ctw[s0][q >> 1]))
        p = q >> 1
        for j, blk in enumerate(sched):
            vals = inner_vals[j]
            M = 1 << blk.k
            base = p & ~(M - 1)
            try:
                work = [vals[base + t] for t in range(M)]
            except KeyError:
                return False
            if not np.array_equal(work[p - base], val):
                return False
            w = np.asarray(alphas[j + 1], np.uint64)
            gbase = base
            for i in range(blk.k):
                ltw = line_fold_twiddles(blk.m - i)
                nxt = []
                for r in range(len(work) // 2):
                    gp = (gbase >> 1) + r
                    nxt.append(_np_fold_pair(work[2 * r], work[2 * r + 1],
                                             w, int(ltw[gp])))
                work = nxt
                gbase >>= 1
                if i < blk.k - 1:
                    w = np_qm31_mul(w, w)
            val = work[0]
            p = gbase
            if blk.inj is not None:
                s = blk.inj
                try:
                    w0 = np.asarray(inputs_at[s][2 * p], np.uint64)
                    w1 = np.asarray(inputs_at[s][2 * p + 1], np.uint64)
                except KeyError:
                    return False
                inj = _np_fold_pair(w0, w1, w, int(ctw[s][p]))
                val = np_qm31_add(np_qm31_mul(np_qm31_mul(w, w), val), inj)
        # last layer: evaluate the coefficient polynomial at p's point
        expect = line_eval_at(last_coeffs, int(lx[p]))
        if not np.array_equal(expect, val):
            return False
    return True


def fri_decommit_items(state: FriProverState, queries):
    """(tree, positions, max_pos) triples for the fused multi-tree
    opening path (`merkle.decommit_many_fused`)."""
    s0 = state.input_sizes[0]
    return [(tree, _coset_positions(queries, s0 - blk.m, blk.k),
             state.config.n_queries << blk.k)
            for tree, _root, blk in state.inner]


def fri_proof_from_decs(state: FriProverState, decs) -> FriProof:
    return FriProof(inner_roots=[r for _t, r, _b in state.inner],
                    inner_decommitments=list(decs),
                    last_layer=state.last_layer)
