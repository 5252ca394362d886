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
* Smaller inputs join the running line layer right before the commit of
  the layer whose size they fold into:
      cur = alpha^2 * cur + circle_fold(Q_s, alpha)
  (alpha is fresh w.r.t. Q_s: all inputs are fixed before FRI starts.)
* One QM31 alpha is drawn at the start and after each inner-layer
  commit. The last layer (size 2^(log_blowup + log_last_layer)) is sent
  raw and must be a constant (log_last_layer == 0).

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
    m31_mul, np_m31_add, np_m31_sub, np_m31_mul, np_qm31_add, np_qm31_sub,
    np_qm31_mul,
)
from .field import qm31_add, qm31_sub, qm31_mul, qm31_mul_m31
from .circle import domain, bit_reverse_indices
from . import merkle

__all__ = [
    "FriConfig", "FriProof", "fri_commit", "fri_decommit", "fri_replay",
    "fri_check_queries", "circle_fold_twiddles", "line_fold_twiddles",
]


@dataclass(frozen=True)
class FriConfig:
    log_blowup: int = 1
    log_last_layer: int = 0   # last-layer degree bound 2^0 = constant
    n_queries: int = 54

    @property
    def last_line_log(self) -> int:
        return self.log_blowup + self.log_last_layer


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


def fold_circle(v, alpha, log_size: int):
    return _fold(v, jnp.asarray(np.asarray(alpha, np.uint32)),
                 jnp.asarray(circle_fold_twiddles(log_size)))


def fold_line(v, alpha, log_line_size: int):
    return _fold(v, jnp.asarray(np.asarray(alpha, np.uint32)),
                 jnp.asarray(line_fold_twiddles(log_line_size)))


# ---------------------------------------------------------------------------
# Prover
# ---------------------------------------------------------------------------

@dataclass
class FriProverState:
    config: FriConfig
    input_sizes: list        # circle log sizes, descending
    inner: list              # [(evals device (L,4), MerkleTree)]
    last_layer: np.ndarray   # (2^last_line_log, 4)


def fri_commit(inputs: dict, channel, config: FriConfig) -> FriProverState:
    """Commit phase. inputs: {circle log size -> (2^s, 4) QM31 evals}."""
    sizes = sorted(inputs, reverse=True)
    s0 = sizes[0]
    assert all(s - 1 > 0 for s in sizes)
    assert sizes[-1] - 1 >= config.last_line_log, \
        "input smaller than the FRI last layer"

    alpha = channel.draw_felt()
    cur = fold_circle(jnp.asarray(inputs[s0], jnp.uint32), alpha, s0)
    cur_log = s0 - 1
    inner = []
    while True:
        s_in = cur_log + 1
        if s_in in inputs and s_in != s0:
            inj = fold_circle(jnp.asarray(inputs[s_in], jnp.uint32),
                              alpha, s_in)
            a2 = np.asarray(np_qm31_mul(alpha, alpha), np.uint32)
            cur = qm31_add(qm31_mul(jnp.asarray(a2), cur), inj)
        if cur_log == config.last_line_log:
            break
        tree = merkle.commit([cur[:, 0], cur[:, 1], cur[:, 2], cur[:, 3]])
        root = tree.root()           # fetched once here for the channel
        channel.mix_u32s(root)
        # keep the layer evals on device: decommitment gathers rows
        # from the tree; nothing needs the full layer on the host
        inner.append((cur, tree, root))
        alpha = channel.draw_felt()
        cur = fold_line(cur, alpha, cur_log)
        cur_log -= 1

    last_layer = np.asarray(cur)
    channel.mix_felts(last_layer)
    return FriProverState(config=config, input_sizes=sizes, inner=inner,
                          last_layer=last_layer)


@dataclass
class FriProof:
    inner_roots: list             # [(8,) uint32]
    inner_decommitments: list     # [merkle.MerkleDecommitment]
    last_layer: np.ndarray        # (2^last, 4) uint32


def _layer_positions(queries, shift: int):
    """Opened positions {p, p^1} with p = q >> shift, sorted."""
    out = set()
    for q in queries:
        p = q >> shift
        out.add(p)
        out.add(p ^ 1)
    return sorted(out)


def fri_decommit(state: FriProverState, queries) -> FriProof:
    """All layer openings are dispatched async and materialized with a
    single host<->device transfer (`merkle.finalize_decommitments`)."""
    roots, pendings = [], []
    for j, (_evals, tree, root) in enumerate(state.inner):
        pos = _layer_positions(queries, j + 1)
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
    sizes = sorted(input_sizes, reverse=True)
    s0 = sizes[0]
    n_inner = (s0 - 1) - config.last_line_log
    if len(proof.inner_roots) != n_inner or \
            len(proof.inner_decommitments) != n_inner:
        raise ValueError("FRI proof has wrong number of inner layers")
    if proof.last_layer.shape != (1 << config.last_line_log, 4):
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
    sizes = sorted(input_sizes, reverse=True)
    s0 = sizes[0]
    if config.log_last_layer == 0:
        if not np.all(proof.last_layer == proof.last_layer[0]):
            return False
    else:  # pragma: no cover - only constant last layers are configured
        raise NotImplementedError

    # Verify inner-layer Merkle openings once, and index their values.
    inner_vals = []
    for j, dec in enumerate(proof.inner_decommitments):
        log_l = s0 - 1 - j
        pos = _layer_positions(queries, j + 1)
        ok = merkle.verify_decommitment(
            proof.inner_roots[j], [1 << log_l] * 4, pos, dec)
        if not ok:
            return False
        vals = {p: np.asarray([dec.column_values[c][i] for c in range(4)],
                              np.uint64)
                for i, p in enumerate(pos)}
        inner_vals.append(vals)

    ctw = {s: circle_fold_twiddles(s) for s in sizes}
    for q in queries:
        q = int(q)
        alpha = np.asarray(alphas[0], np.uint64)
        try:
            v0 = np.asarray(inputs_at[s0][q & ~1], np.uint64)
            v1 = np.asarray(inputs_at[s0][q | 1], np.uint64)
        except KeyError:
            return False
        val = _np_fold_pair(v0, v1, alpha, int(ctw[s0][q >> 1]))
        p, cur_log, layer = q >> 1, s0 - 1, 0
        while True:
            s_in = cur_log + 1
            if s_in in inputs_at and s_in != s0:
                try:
                    w0 = np.asarray(inputs_at[s_in][(p << 1)], np.uint64)
                    w1 = np.asarray(inputs_at[s_in][(p << 1) | 1], np.uint64)
                except KeyError:
                    return False
                inj = _np_fold_pair(w0, w1, alpha, int(ctw[s_in][p]))
                val = np_qm31_add(np_qm31_mul(np_qm31_mul(alpha, alpha), val),
                                  inj)
            if cur_log == config.last_line_log:
                break
            committed = inner_vals[layer].get(p)
            partner = inner_vals[layer].get(p ^ 1)
            if committed is None or partner is None:
                return False
            if not np.array_equal(committed, val):
                return False
            alpha = np.asarray(alphas[layer + 1], np.uint64)
            a, b = (val, partner) if p % 2 == 0 else (partner, val)
            t = int(line_fold_twiddles(cur_log)[p >> 1])
            val = _np_fold_pair(a, b, alpha, t)
            p >>= 1
            cur_log -= 1
            layer += 1
        if not np.array_equal(np.asarray(proof.last_layer[p], np.uint64),
                              val):
            return False
    return True
