"""The M31 circle group, canonic cosets, and evaluation domains.

Circle-STARK geometry (reference counterpart: stwo's ``CanonicCoset`` /
``CircleDomain`` / twiddle precompute, consumed at
`/root/reference/prover/src/machine.rs:186-194`):

* C(M31) = {(x, y) : x^2 + y^2 = 1} is a cyclic group of order 2^31
  with generator ``G = (2, 1268011823)``; group law is complex
  multiplication of x + iy.
* The **canonic coset** of size N = 2^n is the set of odd multiples of
  g = (2^31 / 2^(n+1)) · G (all points of order exactly 2^(n+1)).
* Our **evaluation domain layout** is `D = [H | J(H)]` where
  H[k] = (4k+1)·g for k < N/2 and J(x,y) = (x,-y).

Why this layout (TPU-first): with H enumerated in coset order, *every*
circle-FFT stage pairs element k with element k + len/2 of its chunk —
a pure fold-in-half butterfly. Each stage is one reshape + vectorized
M31 multiply-add, with twiddle arrays that halve per stage (the stage-j
x-twiddles are pointwise pi(x) = 2x^2-1 of the previous stage's first
half). No strided gathers, no bit-reversal permutations on device, and
the chunk axis is the natural multi-chip sharding axis.

Twiddles are precomputed host-side in numpy (uint64 modmul) and cached
per log-size.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

from .field import P, np_m31_mul, np_m31_add, np_m31_sub, np_m31_inv

# Generator of the full 2^31-order circle group.
CIRCLE_GEN = (2, 1268011823)
LOG_CIRCLE_ORDER = 31


def point_double(p):
    x, y = p
    return ((2 * x * x - 1) % P, (2 * x * y) % P)


def point_add(p, q):
    x1, y1 = p
    x2, y2 = q
    return ((x1 * x2 - y1 * y2) % P, (x1 * y2 + y1 * x2) % P)


def point_neg(p):
    return (p[0], (P - p[1]) % P)


def point_mul(p, k: int):
    """k·p with python-int scalars (host-side, O(log k))."""
    r = (1, 0)
    while k:
        if k & 1:
            r = point_add(r, p)
        p = point_double(p)
        k >>= 1
    return r


def subgroup_gen(log_order: int):
    """Generator of the subgroup of order 2^log_order."""
    return point_mul(CIRCLE_GEN, 1 << (LOG_CIRCLE_ORDER - log_order))


def _enumerate_coset(initial, step, log_len: int):
    """Points initial + k·step for k in [0, 2^log_len), vectorized.

    Doubling construction: log_len batched complex multiplies in numpy.
    Returns (x, y) uint64 arrays.
    """
    n = 1 << log_len
    xs = np.empty(n, dtype=np.uint64)
    ys = np.empty(n, dtype=np.uint64)
    xs[0], ys[0] = initial
    size = 1
    offset = step
    while size < n:
        ox, oy = offset
        # points[size : 2*size] = points[0 : size] + offset
        px, py = xs[:size], ys[:size]
        xs[size:2 * size] = np_m31_sub(np_m31_mul(px, np.uint64(ox)),
                                       np_m31_mul(py, np.uint64(oy)))
        ys[size:2 * size] = np_m31_add(np_m31_mul(px, np.uint64(oy)),
                                       np_m31_mul(py, np.uint64(ox)))
        offset = point_double(offset)
        size *= 2
    return xs, ys


class CircleDomain:
    """Canonic-coset evaluation domain of size N = 2^log_size.

    Layout: index i < N/2 -> H[i] = (4i+1)·g_(log_size+1);
            index N/2 + i -> conjugate of H[i].
    """

    def __init__(self, log_size: int):
        assert 1 <= log_size <= 30
        self.log_size = log_size
        n = 1 << log_size
        g = subgroup_gen(log_size + 1)
        step = point_mul(g, 4)
        hx, hy = _enumerate_coset(g, step, log_size - 1)
        self.half_x = hx.astype(np.uint32)   # (N/2,)
        self.half_y = hy.astype(np.uint32)   # (N/2,)

        # Stage twiddles.
        # Stage 1 (y-fold): y(H[k]), k in [0, N/2).
        self.y_twiddles = self.half_y
        # Stage j >= 2 (x-folds): T_j[k] = pi^(j-2)(x(H[k])), k in [0, N/2^j);
        # each next stage is pi() of the first half of the previous.
        self.x_twiddle_stages = []
        if log_size >= 2:
            t = self.half_x[: n // 4].astype(np.uint64)
            self.x_twiddle_stages.append(t.astype(np.uint32))
            for _ in range(log_size - 2):
                t = t[: len(t) // 2]
                t = (2 * np_m31_mul(t, t) + (P - 1)) % P    # pi(x) = 2x^2 - 1
                self.x_twiddle_stages.append(t.astype(np.uint32))

        self.inv_y_twiddles = np_m31_inv(self.y_twiddles).astype(np.uint32)
        self.inv_x_twiddle_stages = [
            np_m31_inv(t).astype(np.uint32) for t in self.x_twiddle_stages
        ]

    @property
    def size(self) -> int:
        return 1 << self.log_size

    def points(self):
        """All N domain points as (x, y) uint32 arrays in layout order."""
        x = np.concatenate([self.half_x, self.half_x])
        y = np.concatenate([self.half_y, (P - self.half_y.astype(np.uint64))
                            % P]).astype(np.uint32)
        return x, y

    def point_at(self, index: int):
        """Scalar domain point (python ints) at a layout index."""
        n = 1 << self.log_size
        half = n // 2
        g = subgroup_gen(self.log_size + 1)
        if index < half:
            return point_mul(g, 4 * index + 1)
        return point_neg(point_mul(g, 4 * (index - half) + 1))


@lru_cache(maxsize=None)
def domain(log_size: int) -> CircleDomain:
    return CircleDomain(log_size)


# ---------------------------------------------------------------------------
# Row orders.
#
# Three index orders coexist in the framework (all precomputed host-side):
#
# * natural : row r <-> point (2r+1)·g — the trace/AIR order. Mask offset
#   +1 (next row) is a cyclic shift, so constraint evaluation uses
#   `jnp.roll` and nothing else.
# * layout  : `[H | J(H)]` — what the circle FFT consumes (see CircleDomain).
#   natural r=2k -> k;  r=2k+1 -> N-1-k.
# * committed (bit-reversed layout) : the Merkle/FRI order. Every FRI fold
#   pairs adjacent elements (2i, 2i+1) and emits index i, so query paths
#   shrink as q >> 1 per fold and a pair shares all but the last Merkle
#   path node.
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def bit_reverse_indices(log_n: int) -> np.ndarray:
    """perm[i] = bit-reversal of i over log_n bits (an involution)."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@lru_cache(maxsize=None)
def layout_to_natural(log_size: int) -> np.ndarray:
    """perm[l] = natural row index of layout position l."""
    n = 1 << log_size
    half = n // 2
    out = np.empty(n, dtype=np.int64)
    k = np.arange(half, dtype=np.int64)
    out[:half] = 2 * k                 # H[k] = (4k+1)g  <-> natural 2k
    out[half:] = 2 * (half - 1 - k) + 1  # J(H[k]) <-> natural 2(half-1-k)+1
    return out


@lru_cache(maxsize=None)
def natural_to_layout(log_size: int) -> np.ndarray:
    """inverse of layout_to_natural: perm[r] = layout position of row r."""
    inv = np.empty(1 << log_size, dtype=np.int64)
    inv[layout_to_natural(log_size)] = np.arange(1 << log_size)
    return inv


@lru_cache(maxsize=None)
def committed_to_natural(log_size: int) -> np.ndarray:
    """perm[j] = natural row of committed (bit-reversed layout) position j."""
    return layout_to_natural(log_size)[bit_reverse_indices(log_size)]


@lru_cache(maxsize=None)
def natural_to_committed(log_size: int) -> np.ndarray:
    inv = np.empty(1 << log_size, dtype=np.int64)
    inv[committed_to_natural(log_size)] = np.arange(1 << log_size)
    return inv


# ---------------------------------------------------------------------------
# QM31 (out-of-domain) circle points — host-side numpy
# ---------------------------------------------------------------------------

def oods_point_from_felt(t):
    """Map a channel-drawn QM31 ``t`` to a QM31 point on the circle.

    x = (1 - t^2)/(1 + t^2), y = 2t/(1 + t^2) — the standard rational
    parameterization (x^2 + y^2 = 1 identically).
    """
    from .field import (np_qm31, np_qm31_add, np_qm31_sub, np_qm31_mul,
                        np_qm31_inv)
    t = np.asarray(t, np.uint64)
    t2 = np_qm31_mul(t, t)
    one = np_qm31(np.uint64(1))
    inv = np_qm31_inv(np_qm31_add(one, t2))
    x = np_qm31_mul(np_qm31_sub(one, t2), inv)
    y = np_qm31_mul(np_qm31_add(t, t), inv)
    return x, y


def qm31_point_add(p, q):
    """Group law for QM31 circle points ((4,) coordinate arrays)."""
    from .field import np_qm31_add, np_qm31_sub, np_qm31_mul
    x1, y1 = (np.asarray(c, np.uint64) for c in p)
    x2, y2 = (np.asarray(c, np.uint64) for c in q)
    return (np_qm31_sub(np_qm31_mul(x1, x2), np_qm31_mul(y1, y2)),
            np_qm31_add(np_qm31_mul(x1, y2), np_qm31_mul(y1, x2)))


def m31_point_as_qm31(p):
    from .field import np_qm31
    return np_qm31(np.uint64(p[0])), np_qm31(np.uint64(p[1]))


@lru_cache(maxsize=None)
def committed_points(log_size: int):
    """Domain (x, y) uint32 arrays in committed order."""
    x, y = domain(log_size).points()
    perm = bit_reverse_indices(log_size)  # layout -> committed is rev itself
    return x[perm], y[perm]


# -- device-resident copies (cached once per process; see devcache) ---------

def dev_bit_reverse(log_n: int):
    from ..utils.devcache import dev_const
    return dev_const(("circle.brev", log_n),
                     lambda: bit_reverse_indices(log_n).astype(np.int32))


def dev_layout_to_natural(log_size: int):
    from ..utils.devcache import dev_const
    return dev_const(("circle.l2n", log_size),
                     lambda: layout_to_natural(log_size).astype(np.int32))


def dev_natural_to_layout(log_size: int):
    from ..utils.devcache import dev_const
    return dev_const(("circle.n2l", log_size),
                     lambda: natural_to_layout(log_size).astype(np.int32))


def dev_committed_points(log_size: int):
    """(x, y) device pair in committed order (cached)."""
    from ..utils.devcache import dev_const
    return (dev_const(("circle.cpts.x", log_size),
                      lambda: committed_points(log_size)[0]),
            dev_const(("circle.cpts.y", log_size),
                      lambda: committed_points(log_size)[1]))
