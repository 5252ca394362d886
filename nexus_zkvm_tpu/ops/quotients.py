"""DEEP/OODS quotient accumulation — the bridge from commitments to FRI.

Counterpart of stwo's quotient machinery inside ``stwo::prover::prove``
(`/root/reference/prover/src/machine.rs:286-290`): after the verifier
samples every committed polynomial at the out-of-domain point(s), the
prover must show each claimed value is consistent with the commitment.
For a sample (f, z, v) the witness is the quotient

    q(p) = (c * f(p) - a * y_p - b) / V_z(p)

where conj() is the QM31/CM31 Galois conjugation (u -> -u, fixes M31, so
conj(f(z)) = f(conj(z))), the numerator line coefficients are

    c = conj(y_z) - y_z,   a = conj(v) - v,   b = v*c - a*y_z

(numerator vanishes at both z and conj(z)), and V_z is the line through
z and conj(z):

    V_z(p) = dy * (x_p - x_z) - dx * (y_p - y_z),
    dx = x_z - conj(x_z), dy = y_z - conj(y_z).

q is then a polynomial iff f(z) = v, and all quotients of one committed
eval-domain size are combined with powers of a channel-drawn gamma into
a single QM31 evaluation vector per size — exactly the FRI inputs.

TPU-first: the prover path is fully vectorized over the eval domain in
committed order — per OODS point one batched QM31 inverse of V plus one
fused multiply-accumulate sweep over that point's columns. The verifier
path recomputes single positions host-side in numpy.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from .field import (
    P,
    qm31_add, qm31_sub, qm31_mul, qm31_mul_m31, qm31_inv, qm31_from_m31,
    np_qm31_add, np_qm31_sub, np_qm31_mul, np_qm31_inv, np_qm31_conj,
    np_qm31_pow, np_m31_mul, np_qm31,
)
from .circle import committed_points

__all__ = ["PointSample", "line_coeffs", "accumulate_quotients",
           "quotients_at", "QuotientsAt", "n_terms"]


@dataclass
class PointSample:
    """One OODS point and the columns of a size group sampled at it.

    point: (x, y) — each a (4,) uint QM31 coordinate.
    columns: indices into the size group's canonical column list.
    values: claimed f_k(z), one (4,) QM31 per column, same order.
    """
    point: tuple
    columns: list
    values: list


def line_coeffs(z_y, v):
    """(a, b, c) with numerator N(p) = c*f(p) - a*y_p - b."""
    v = np.asarray(v, np.uint64)
    z_y = np.asarray(z_y, np.uint64)
    c = np_qm31_sub(np_qm31_conj(z_y), z_y)
    a = np_qm31_sub(np_qm31_conj(v), v)
    b = np_qm31_sub(np_qm31_mul(v, c), np_qm31_mul(a, z_y))
    return a, b, c


def _denominator_coeffs(z_x, z_y):
    """dx, dy of the vanishing line through z and conj(z)."""
    z_x = np.asarray(z_x, np.uint64)
    z_y = np.asarray(z_y, np.uint64)
    dx = np_qm31_sub(z_x, np_qm31_conj(z_x))
    dy = np_qm31_sub(z_y, np_qm31_conj(z_y))
    return dx, dy


def n_terms(samples) -> int:
    return sum(len(s.columns) for s in samples)


def _gamma_powers(gamma, k0: int, k: int) -> np.ndarray:
    """(k, 4) uint64: gamma^(k0), gamma^(k0+1), ..., gamma^(k0+k-1) —
    log-doubling construction (vectorized; the per-term scalar loop
    dominated the verifier's host profile)."""
    gamma = np.asarray(gamma, np.uint64)
    p = np.zeros((max(1, k), 4), np.uint64)
    p[0] = np_qm31(np.uint64(1))
    step = 1
    while step < k:
        m = min(step, k - step)
        gs = np_qm31_pow(gamma, step)
        p[step:step + m] = np_qm31_mul(p[:m], gs[None, :])
        step *= 2
    if k0:
        p = np_qm31_mul(p, np_qm31_pow(gamma, k0)[None, :])
    return p[:k]


def _sample_coeffs(sample: "PointSample", g: np.ndarray):
    """Vectorized per-sample constants: gcs (K, 4), A (4,), B (4,)
    with g = the (K, 4) gamma powers of this sample's terms.  Value-
    identical to the scalar per-term loop."""
    z_y = np.asarray(sample.point[1], np.uint64)
    V = (np.stack([np.asarray(v, np.uint64) for v in sample.values])
         if sample.values else np.zeros((0, 4), np.uint64))
    c = np_qm31_sub(np_qm31_conj(z_y), z_y)            # same every term
    a = np_qm31_sub(np_qm31_conj(V), V)                # (K, 4)
    b = np_qm31_sub(np_qm31_mul(V, c[None, :]),
                    np_qm31_mul(a, z_y[None, :]))
    gcs = np_qm31_mul(g, c[None, :])
    ga = np_qm31_mul(g, a)
    gb = np_qm31_mul(g, b)
    # coordinate-wise exact u64 sums of < 2^31 values, then fold
    A = ga.sum(axis=0) % np.uint64(P)
    B = gb.sum(axis=0) % np.uint64(P)
    return gcs, A, B


def _accumulate_raw(n_samples: int):
    """Build the fused per-size accumulation kernel: the whole sample
    loop (denominator line, batched QM31 inverse, weighted column fold)
    is ONE stored XLA program — a single device dispatch per size
    group instead of ~50 eager round-trips per sample (the eager
    `qm31_inv` pow-ladder alone was ~40 dispatches over a tunneled
    device link). The domain points enter as arguments so the stored
    artifact is point-set-independent."""
    from .field import m31_mul, m31_fold_sum

    def raw(columns, x_p, y_p, zx, zy, dx, dy, A, B, gcs, idx):
        total = None
        for s in range(n_samples):
            # V(p) = dy*(x_p - x_z) - dx*(y_p - y_z)
            vx = qm31_sub(qm31_from_m31(x_p), zx[s])
            vy = qm31_sub(qm31_from_m31(y_p), zy[s])
            V = qm31_sub(qm31_mul(dy[s], vx), qm31_mul(dx[s], vy))
            inv_V = qm31_inv(V)
            sel = columns[idx[s]]                        # (K, M)
            coords = [m31_fold_sum(m31_mul(sel, gcs[s, :, t, None]),
                                   axis=0) for t in range(4)]
            num = jnp.stack(coords, axis=-1)             # (M, 4)
            num = qm31_sub(num, qm31_mul_m31(A[s], y_p))
            num = qm31_sub(num, B[s])
            contrib = qm31_mul(num, inv_V)
            total = contrib if total is None else qm31_add(total,
                                                           contrib)
        return total

    return raw


def _accumulate_blocks(n_samples: int, role_sizes):
    """Gather-free variant of `_accumulate_raw`: the size group's
    committed columns arrive as whole per-role matrices (contiguous
    role blocks in canonical order) and every sample uses a FULL-length
    gamma-coefficient vector with zeros on non-participating columns —
    numerically identical (zero coefficients are no-op terms) but with
    no (K, M) gather/concat materialization, which dominated peak HBM
    at 2^20+."""
    from .field import m31_mul, m31_add, m31_fold_sum

    def raw(blocks, x_p, y_p, zx, zy, dx, dy, A, B, gcs_full):
        total = None
        for s in range(n_samples):
            vx = qm31_sub(qm31_from_m31(x_p), zx[s])
            vy = qm31_sub(qm31_from_m31(y_p), zy[s])
            V = qm31_sub(qm31_mul(dy[s], vx), qm31_mul(dx[s], vy))
            inv_V = qm31_inv(V)
            coords = []
            for t in range(4):
                acc = None
                off = 0
                for role, n in role_sizes:
                    g = gcs_full[s, off:off + n, t, None]
                    part = m31_fold_sum(m31_mul(blocks[role], g),
                                        axis=0)
                    acc = part if acc is None else m31_add(acc, part)
                    off += n
                coords.append(acc)
            num = jnp.stack(coords, axis=-1)                 # (M, 4)
            num = qm31_sub(num, qm31_mul_m31(A[s], y_p))
            num = qm31_sub(num, B[s])
            contrib = qm31_mul(num, inv_V)
            total = contrib if total is None else qm31_add(total,
                                                           contrib)
        return total

    return raw


def colsum_fold(n_samples: int):
    """Chunk step of the streamed quotient path: fold a (c, M)
    committed-order eval block into the per-sample numerator column
    sums.  acc: (S, M, 4); gcs_chunk: (S, c, 4) gamma coefficients of
    exactly these columns."""
    from .field import m31_mul, m31_fold_sum

    def raw(acc, block, gcs_chunk):
        outs = []
        for i in range(n_samples):
            coords = [m31_fold_sum(m31_mul(block,
                                           gcs_chunk[i, :, t, None]),
                                   axis=0) for t in range(4)]
            outs.append(jnp.stack(coords, axis=-1))
        return qm31_add(acc, jnp.stack(outs))

    return raw


def colsum_finalize(n_samples: int):
    """Final step of the streamed quotient path: identical math to
    `_accumulate_blocks` with the column sums precomputed."""
    def raw(acc, x_p, y_p, zx, zy, dx, dy, A, B):
        total = None
        for i in range(n_samples):
            vx = qm31_sub(qm31_from_m31(x_p), zx[i])
            vy = qm31_sub(qm31_from_m31(y_p), zy[i])
            V = qm31_sub(qm31_mul(dy[i], vx), qm31_mul(dx[i], vy))
            num = qm31_sub(acc[i], qm31_mul_m31(A[i], y_p))
            num = qm31_sub(num, B[i])
            contrib = qm31_mul(num, qm31_inv(V))
            total = contrib if total is None else qm31_add(total,
                                                           contrib)
        return total

    return raw


def prep_args_full(samples, gamma, gamma_offset: int,
                   k_total: int) -> dict:
    """`prep_args` plus the scattered full-length coefficient matrix
    ``gcs_full`` (S, k_total, 4) consumed by `_accumulate_blocks`."""
    a = prep_args(samples, gamma, gamma_offset)
    S = len(samples)
    gcs_full = np.zeros((S, k_total, 4), np.uint32)
    for si, s in enumerate(samples):
        if s.columns:
            gcs_full[si, np.asarray(s.columns, np.int64)] = \
                a["gcs"][si][: len(s.columns)]
    a["gcs_full"] = gcs_full
    return a


def prep_args(samples, gamma, gamma_offset: int = 0) -> dict:
    """Host precompute of one size group's sample constants (tiny
    numpy): denominator lines, gamma-weighted numerator coefficients,
    and the padded column-index matrix."""
    gamma = np.asarray(gamma, np.uint64)
    S = len(samples)
    k_max = max(len(s.columns) for s in samples)

    zx = np.zeros((S, 4), np.uint32)
    zy = np.zeros((S, 4), np.uint32)
    dxs = np.zeros((S, 4), np.uint32)
    dys = np.zeros((S, 4), np.uint32)
    As = np.zeros((S, 4), np.uint32)
    Bs = np.zeros((S, 4), np.uint32)
    gcs = np.zeros((S, k_max, 4), np.uint32)   # zero pad: no-op terms
    idx = np.zeros((S, k_max), np.int32)

    k0 = gamma_offset
    for si, s in enumerate(samples):
        z_x, z_y = s.point
        dx, dy = _denominator_coeffs(z_x, z_y)
        zx[si] = np.asarray(z_x, np.uint64).astype(np.uint32)
        zy[si] = np.asarray(z_y, np.uint64).astype(np.uint32)
        dxs[si] = dx.astype(np.uint32)
        dys[si] = dy.astype(np.uint32)
        K = len(s.columns)
        g = _gamma_powers(gamma, k0, K)
        k0 += K
        gc, A, B = _sample_coeffs(s, g)
        gcs[si, :K] = gc.astype(np.uint32)
        idx[si, :K] = np.asarray(s.columns, np.int32)
        As[si] = A.astype(np.uint32)
        Bs[si] = B.astype(np.uint32)
    return {"zx": zx, "zy": zy, "dx": dxs, "dy": dys, "A": As,
            "B": Bs, "gcs": gcs, "idx": idx}


def accumulate_quotients(log_size: int, columns, samples, gamma,
                         gamma_offset: int = 0):
    """Combined quotient evals for one size group, committed order.

    columns: list of (2^log_size,) uint32 M31 eval arrays (committed
    order); samples: list[PointSample]; gamma: (4,) QM31; the k-th
    (sample, column) term gets coefficient gamma^(gamma_offset + k).
    Returns a (2^log_size, 4) uint32 device array.

    Host precomputes the per-sample line coefficients (tiny numpy);
    the device runs one fused kernel for the entire size group.
    """
    S = len(samples)
    a = prep_args(samples, gamma, gamma_offset)
    from ..utils.progstore import aot_call
    xs, ys = committed_points(log_size)
    return aot_call(("quot.accumulate", S), _accumulate_raw(S),
                    jnp.asarray(columns), jnp.asarray(xs),
                    jnp.asarray(ys), a["zx"], a["zy"], a["dx"],
                    a["dy"], a["A"], a["B"], a["gcs"], a["idx"])


class QuotientsAt:
    """Position-independent precompute for the verifier's quotient
    recompute: per sample the denominator line and the gamma-weighted
    line coefficients (A = sum g*a, B = sum g*b, gc_k = g_k*c_k) are
    built ONCE; `.at(position, column_values)` is then a handful of
    small vectorized numpy ops per sample instead of ~25 QM31
    operations per (position, column)."""

    def __init__(self, log_size: int, samples, gamma,
                 gamma_offset: int = 0):
        xs, ys = committed_points(log_size)
        self.xs = np.asarray(xs, np.uint64)
        self.ys = np.asarray(ys, np.uint64)
        gamma = np.asarray(gamma, np.uint64)
        self.pre = []
        k0 = gamma_offset
        for s in samples:
            z_x = np.asarray(s.point[0], np.uint64)
            z_y = np.asarray(s.point[1], np.uint64)
            dx, dy = _denominator_coeffs(z_x, z_y)
            K = len(s.columns)
            g = _gamma_powers(gamma, k0, K)
            k0 += K
            gcs, A, B = _sample_coeffs(s, g)
            self.pre.append((z_x, z_y, dx, dy,
                             list(s.columns), gcs, A, B))

    def at_many(self, positions, values: np.ndarray) -> np.ndarray:
        """Vectorized verifier recompute over all opened positions.

        positions: sequence of Q positions; values: (G, Q) uint64
        matrix of opened column values in the size group's canonical
        column order. Returns (Q, 4) uint64 — row q equals
        ``self.at(positions[q], ...)``."""
        pos = np.asarray(positions, np.int64)
        x_p = self.xs[pos]                       # (Q,)
        y_p = self.ys[pos]
        total = np.zeros((len(pos), 4), np.uint64)
        for z_x, z_y, dx, dy, cols, gcs, A, B in self.pre:
            vx = np_qm31_sub(np_qm31(x_p), z_x)              # (Q, 4)
            vy = np_qm31_sub(np_qm31(y_p), z_y)
            V = np_qm31_sub(np_qm31_mul(dy[None, :], vx),
                            np_qm31_mul(dx[None, :], vy))
            f = values[np.asarray(cols, np.int64)]           # (K, Q)
            # per coord t: sum_k gc_k[t] * f_k  (products < 2^62; the
            # per-term mod keeps the K-sum exact in uint64)
            num = np.empty((len(pos), 4), np.uint64)
            for t in range(4):
                num[:, t] = ((gcs[:, t, None] * f) % np.uint64(P)) \
                    .sum(axis=0) % np.uint64(P)
            num = np_qm31_sub(num, np_qm31_add(
                np_m31_mul(A[None, :], y_p[:, None]), B[None, :]))
            total = np_qm31_add(total,
                                np_qm31_mul(num, np_qm31_inv(V)))
        return total

    def at(self, position: int, column_values) -> np.ndarray:
        """column_values: {column index -> M31 int value}."""
        from .field import P as _P
        x_p = self.xs[position]
        y_p = self.ys[position]
        total = np.zeros(4, np.uint64)
        for z_x, z_y, dx, dy, cols, gcs, A, B in self.pre:
            vx = np_qm31_sub(np_qm31(x_p), z_x)
            vy = np_qm31_sub(np_qm31(y_p), z_y)
            V = np_qm31_sub(np_qm31_mul(dy, vx), np_qm31_mul(dx, vy))
            f = np.asarray([column_values[ci] for ci in cols],
                           np.uint64)
            # sum_k gc_k * f_k  (values < P, K < 2^20: no u64 overflow)
            num = (gcs * f[:, None] % _P).sum(axis=0) % _P
            num = np_qm31_sub(num, np_qm31_add(np_m31_mul(A, y_p), B))
            total = np_qm31_add(total,
                                np_qm31_mul(num, np_qm31_inv(V)))
        return total


def quotients_at(log_size: int, samples, column_values, position: int,
                 gamma, gamma_offset: int = 0):
    """Host-side recompute of the combined quotient at one position.

    column_values: {column index -> M31 int value at this position}.
    Returns a (4,) uint64 QM31 value.  (One-shot wrapper around
    `QuotientsAt` — verifiers looping positions should build
    `QuotientsAt` once per size group.)
    """
    return QuotientsAt(log_size, samples, gamma, gamma_offset).at(
        position, column_values)
