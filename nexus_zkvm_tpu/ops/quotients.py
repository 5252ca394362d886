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
    qm31_add, qm31_sub, qm31_mul, qm31_mul_m31, qm31_inv, qm31_from_m31,
    np_qm31_add, np_qm31_sub, np_qm31_mul, np_qm31_inv, np_qm31_conj,
    np_qm31_pow, np_m31_mul, np_qm31,
)
from .circle import committed_points

__all__ = ["PointSample", "line_coeffs", "accumulate_quotients",
           "quotients_at", "n_terms"]


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


def accumulate_quotients(log_size: int, columns, samples, gamma,
                         gamma_offset: int = 0):
    """Combined quotient evals for one size group, committed order.

    columns: list of (2^log_size,) uint32 M31 eval arrays (committed
    order); samples: list[PointSample]; gamma: (4,) QM31; the k-th
    (sample, column) term gets coefficient gamma^(gamma_offset + k).
    Returns a (2^log_size, 4) uint32 device array.
    """
    from .field import m31_mul, m31_fold_sum

    xs, ys = committed_points(log_size)
    x_p = jnp.asarray(xs)
    y_p = jnp.asarray(ys)
    gamma = np.asarray(gamma, np.uint64)
    columns = jnp.asarray(columns)            # (C, M) matrix

    total = None
    k = gamma_offset
    for s in samples:
        z_x, z_y = s.point
        dx, dy = _denominator_coeffs(z_x, z_y)
        # V(p) = dy*(x_p - x_z) - dx*(y_p - y_z)
        xz = jnp.asarray(np.asarray(z_x, np.uint32))
        yz = jnp.asarray(np.asarray(z_y, np.uint32))
        vx = qm31_sub(qm31_from_m31(x_p), xz)
        vy = qm31_sub(qm31_from_m31(y_p), yz)
        V = qm31_sub(qm31_mul(jnp.asarray(np.asarray(dy, np.uint32)), vx),
                     qm31_mul(jnp.asarray(np.asarray(dx, np.uint32)), vy))
        inv_V = qm31_inv(V)

        # N(p) = sum_k g^k * (c_k f_k(p) - a_k y_p - b_k); the column
        # terms batch into one modular weighted fold per coordinate
        A = np.zeros(4, np.uint64)
        B = np.zeros(4, np.uint64)
        gcs = np.zeros((len(s.columns), 4), np.uint64)
        for j, (ci, v) in enumerate(zip(s.columns, s.values)):
            a, b, c = line_coeffs(z_y, v)
            g = np_qm31_pow(gamma, k)
            k += 1
            gcs[j] = np_qm31_mul(g, c)
            A = np_qm31_add(A, np_qm31_mul(g, a))
            B = np_qm31_add(B, np_qm31_mul(g, b))
        sel = columns[jnp.asarray(np.asarray(s.columns, np.int64))]
        gcs_d = jnp.asarray(gcs.astype(np.uint32))       # (K, 4)
        coords = [m31_fold_sum(m31_mul(sel, gcs_d[:, t, None]), axis=0)
                  for t in range(4)]
        num = jnp.stack(coords, axis=-1)                 # (M, 4)
        num = qm31_sub(num, qm31_mul_m31(jnp.asarray(A.astype(np.uint32)),
                                         y_p))
        num = qm31_sub(num, jnp.asarray(B.astype(np.uint32)))
        contrib = qm31_mul(num, inv_V)
        total = contrib if total is None else qm31_add(total, contrib)
    return total


def quotients_at(log_size: int, samples, column_values, position: int,
                 gamma, gamma_offset: int = 0):
    """Host-side recompute of the combined quotient at one position.

    column_values: {column index -> M31 int value at this position}.
    Returns a (4,) uint64 QM31 value.
    """
    xs, ys = committed_points(log_size)
    x_p = np.uint64(xs[position])
    y_p = np.uint64(ys[position])
    gamma = np.asarray(gamma, np.uint64)

    total = np.zeros(4, np.uint64)
    k = gamma_offset
    for s in samples:
        z_x, z_y = s.point
        dx, dy = _denominator_coeffs(z_x, z_y)
        vx = np_qm31_sub(np_qm31(x_p), np.asarray(z_x, np.uint64))
        vy = np_qm31_sub(np_qm31(y_p), np.asarray(z_y, np.uint64))
        V = np_qm31_sub(np_qm31_mul(dy, vx), np_qm31_mul(dx, vy))
        num = np.zeros(4, np.uint64)
        for ci, v in zip(s.columns, s.values):
            a, b, c = line_coeffs(z_y, v)
            g = np_qm31_pow(gamma, k)
            k += 1
            t = np_qm31_mul(g, np_qm31_sub(
                np_m31_mul(c, np.uint64(column_values[ci])),
                np_qm31_add(np_m31_mul(a, y_p), b)))
            num = np_qm31_add(num, t)
        total = np_qm31_add(total, np_qm31_mul(num, np_qm31_inv(V)))
    return total
