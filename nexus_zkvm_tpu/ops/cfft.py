"""Circle FFT / inverse FFT / low-degree extension as JAX kernels.

The TPU replacement for stwo's ``PolyOps`` (circle FFT, iFFT, LDE with
blowup; reference usage `/root/reference/prover/src/machine.rs:186-194`
and every tree-builder `extend_evals` call).

Basis and layout
----------------
The FFT space of a size-N = 2^n domain (see `circle.py` for the domain
layout) has basis b_j = y^(j0) · x^(j1) · pi(x)^(j2) ... pi^(n-2)(x)^(j_(n-1))
with j = sum j_k 2^k and pi(x) = 2x^2 - 1. ``interpolate`` returns
coefficients in **bit-reversed j order** (position = rev_n(j)); this is
the natural output of the fold-in-half butterflies and is what
``evaluate`` consumes. Extending to a larger basis is then a pure
zero-interleave (`extend_coeffs`), because rev_m(j) = rev_n(j) << (m-n)
for coefficients whose high bits are zero.

Stage structure: interpolation stage j (j = 1..n) views the array as
(chunks=2^(j-1), 2, half=N/2^j) and computes
    f0 = a + b ;  f1 = (a - b) * inv_twiddle_j
(y-twiddles at stage 1, pi-iterated x-twiddles after), deferring the
global 1/N. Evaluation runs the stages in reverse with un-inverted
twiddles. Every stage is one reshape + O(N) VPU multiply-adds; there are
no gathers and no device-side bit-reversals.

Batching: all transforms broadcast over leading dims — the whole
column set (hundreds of trace columns) is transformed as one (C, N)
array. QM31 columns are handled as 4 M31 columns (the FFT is
M31-linear), so only base-field transforms exist.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .field import P, m31_add, m31_sub, m31_mul
from .circle import domain

__all__ = ["interpolate", "evaluate", "extend_coeffs", "lde",
           "coeff_index_to_pos", "eval_basis_naive"]


def _stage_split(v, j: int, n: int):
    half = 1 << (n - j)
    return v.reshape(v.shape[:-1] + (1 << (j - 1), 2, half))


def interpolate(evals, include_scale: bool = True):
    """Evaluations on domain(log N) -> bit-reversed FFT coefficients.

    evals: (..., N) uint32 M31. Returns same shape. Runs as a stored
    AOT program (see `utils/progstore`) unless called under a trace.
    """
    from ..utils.progstore import aot_call
    return aot_call(("cfft.interpolate", include_scale),
                    functools.partial(_interpolate, include_scale=include_scale),
                    evals)


# Stages whose fold half-length drops below this run in a transposed
# layout: a (..., chunks, 2, half) view with tiny trailing dims gets
# (2,128)-tiled on TPU with up to 32x physical padding (a 2GB HLO temp
# per stage at 2^22); keeping the large axis minor avoids it.  Small
# transforms skip the transposes (padding there is KBs).
_SMALL_HALF = 128
_TRANSPOSE_MIN_LOG = 15


def _interpolate(evals, include_scale: bool = True):
    evals = jnp.asarray(evals, jnp.uint32)
    n_size = evals.shape[-1]
    n = int(n_size).bit_length() - 1
    assert 1 << n == n_size
    dom = domain(n)

    v = evals
    # Stage 1: y-fold.
    s = _stage_split(v, 1, n)
    a, b = s[..., 0, :], s[..., 1, :]
    t = jnp.asarray(dom.inv_y_twiddles)
    f0 = m31_add(a, b)
    f1 = m31_mul(m31_sub(a, b), t)
    v = jnp.concatenate([f0, f1], axis=-1).reshape(evals.shape)
    # Stages 2..n: x-folds.
    j0 = None
    for j in range(2, n + 1):
        half = 1 << (n - j)
        if n >= _TRANSPOSE_MIN_LOG and half < _SMALL_HALF:
            j0 = j
            break
        s = _stage_split(v, j, n)
        a, b = s[..., 0, :], s[..., 1, :]
        t = jnp.asarray(dom.inv_x_twiddle_stages[j - 2])
        f0 = m31_add(a, b)
        f1 = m31_mul(m31_sub(a, b), t)
        v = jnp.stack([f0, f1], axis=-2).reshape(evals.shape)
    if j0 is not None:
        # remaining stages act within contiguous blocks of size S:
        # transpose once so the big axis stays minor
        S = 1 << (n - j0 + 1)
        Q = n_size // S
        lead = v.shape[:-1]
        vt = v.reshape(lead + (Q, S)).swapaxes(-1, -2)   # (..., S, Q)
        for j in range(j0, n + 1):
            half = 1 << (n - j)
            chunks_rel = S >> (n - j + 1)
            s = vt.reshape(lead + (chunks_rel, 2, half, Q))
            a, b = s[..., 0, :, :], s[..., 1, :, :]
            t = jnp.asarray(dom.inv_x_twiddle_stages[j - 2])[:, None]
            f0 = m31_add(a, b)
            f1 = m31_mul(m31_sub(a, b), t)
            vt = jnp.stack([f0, f1], axis=-3).reshape(vt.shape)
        v = vt.swapaxes(-1, -2).reshape(evals.shape)
    if include_scale:
        inv_n = pow(1 << n, P - 2, P)
        v = m31_mul(v, jnp.uint32(inv_n))
    return v


def evaluate(coeffs, log_size: int | None = None):
    """Bit-reversed FFT coefficients -> evaluations on domain(log_size).

    coeffs: (..., K) with K = 2^k. If log_size > k the coefficients are
    zero-extended into the larger basis first (low-degree extension).
    Runs as a stored AOT program unless called under a trace.
    """
    from ..utils.progstore import aot_call
    return aot_call(("cfft.evaluate", log_size),
                    functools.partial(_evaluate, log_size=log_size),
                    coeffs)


def _evaluate(coeffs, log_size: int | None = None):
    coeffs = jnp.asarray(coeffs, jnp.uint32)
    k_size = coeffs.shape[-1]
    k = int(k_size).bit_length() - 1
    assert 1 << k == k_size
    n = k if log_size is None else log_size
    assert n >= k
    if n > k:
        coeffs = extend_coeffs(coeffs, n)
    dom = domain(n)

    v = coeffs
    if n >= _TRANSPOSE_MIN_LOG:
        # the first evaluate stages have tiny fold halves (see the
        # interpolate comment): run every stage with half < _SMALL_HALF
        # inside transposed S-blocks
        j0 = None
        for j in range(n, 1, -1):
            if (1 << (n - j)) >= _SMALL_HALF:
                break
            j0 = j
        if j0 is not None:
            S = 1 << (n - j0 + 1)
            Q = (1 << n) // S
            lead = v.shape[:-1]
            vt = v.reshape(lead + (Q, S)).swapaxes(-1, -2)
            for j in range(n, j0 - 1, -1):
                half = 1 << (n - j)
                chunks_rel = S >> (n - j + 1)
                s = vt.reshape(lead + (chunks_rel, 2, half, Q))
                f0, f1 = s[..., 0, :, :], s[..., 1, :, :]
                t = jnp.asarray(dom.x_twiddle_stages[j - 2])[:, None]
                tf1 = m31_mul(t, f1)
                a = m31_add(f0, tf1)
                b = m31_sub(f0, tf1)
                vt = jnp.stack([a, b], axis=-3).reshape(vt.shape)
            v = vt.swapaxes(-1, -2).reshape(coeffs.shape)
            n_start = j0 - 1
        else:
            n_start = n
    else:
        n_start = n
    for j in range(n_start, 1, -1):
        s = _stage_split(v, j, n)
        f0, f1 = s[..., 0, :], s[..., 1, :]
        t = jnp.asarray(dom.x_twiddle_stages[j - 2])
        tf1 = m31_mul(t, f1)
        a = m31_add(f0, tf1)
        b = m31_sub(f0, tf1)
        v = jnp.stack([a, b], axis=-2).reshape(coeffs.shape)
    # Stage 1 (y).
    s = _stage_split(v, 1, n)
    f0, f1 = s[..., 0, :], s[..., 1, :]
    t = jnp.asarray(dom.y_twiddles)
    tf1 = m31_mul(t, f1)
    return jnp.concatenate(
        [m31_add(f0, tf1), m31_sub(f0, tf1)], axis=-1).reshape(coeffs.shape)


def extend_coeffs(coeffs, log_size: int):
    """Embed bit-reversed coeffs of a 2^k basis into a 2^log_size basis.

    Written as a strided 2-D scatter: a 3-D (..., K, stride) zero-fill
    gets a padded (2,128) physical tiling on TPU when stride is small
    (32x memory blow-up at scale)."""
    k_size = coeffs.shape[-1]
    stride = (1 << log_size) // k_size
    if stride == 1:
        return coeffs
    out = jnp.zeros(coeffs.shape[:-1] + (1 << log_size,), jnp.uint32)
    return out.at[..., ::stride].set(coeffs)


def lde(evals, log_blowup: int):
    """Low-degree extension: evals on domain(n) -> evals on domain(n + blowup)."""
    n = int(evals.shape[-1]).bit_length() - 1
    return evaluate(interpolate(evals), n + log_blowup)


# ---------------------------------------------------------------------------
# Reference helpers (host, for tests and the verifier's point evaluations)
# ---------------------------------------------------------------------------

def coeff_index_to_pos(j: int, n: int) -> int:
    """Position of natural coefficient index j in the bit-reversed layout."""
    return int(bin(j + (1 << n))[3:][::-1], 2)


def eval_basis_naive(j: int, n: int, x: int, y: int) -> int:
    """b_j(x, y) with python ints — the ground-truth basis definition."""
    acc = 1
    if j & 1:
        acc = y
    cur = x
    for k in range(1, n):
        if (j >> k) & 1:
            acc = acc * cur % P
        cur = (2 * cur * cur - 1) % P
    return acc


def point_basis(n: int, point) -> np.ndarray:
    """(2^n, 4) basis vector at a QM31 circle point, bit-reversed
    layout: the iterated outer product kron([1, y], [1, x], [1, pi(x)],
    ..., [1, pi^(n-2)(x)]) with the first factor slowest."""
    from .field import np_qm31, np_qm31_sub, np_qm31_mul

    x, y = (np.asarray(v, np.uint64) for v in point)
    if n == 0:
        return np_qm31(np.uint64(1))[None, :]
    two = np_qm31(np.uint64(2))
    one = np_qm31(np.uint64(1))
    xs = [x]
    for _ in range(n - 2):
        t = xs[-1]
        xs.append(np_qm31_sub(np_qm31_mul(two, np_qm31_mul(t, t)), one))
    basis = np_qm31(np.uint64(1))[None, :]
    for v in list(reversed(xs)) + [y]:
        basis = np.concatenate([basis, np_qm31_mul(basis, v[None, :])],
                               axis=0)
    return basis


def evaluate_at_qm31_point(coeffs_bitrev, point, basis=None):
    """Evaluate an M31 coefficient vector at a QM31 circle point (host).

    coeffs_bitrev: (N,) uint32 in the bit-reversed layout `interpolate`
    emits; point: (x, y), each a (4,) uint64 QM31 coordinate.  Pass a
    precomputed `point_basis` to amortize it over many columns.
    Returns a (4,) uint64 QM31 value.
    """
    from .field import np_m31_mul

    c = np.asarray(coeffs_bitrev, np.uint64)
    n = int(len(c)).bit_length() - 1
    assert 1 << n == len(c)
    if basis is None:
        basis = point_basis(n, point)
    # each term < P < 2^31, so a sum of up to 2^30 terms fits in uint64
    terms = np_m31_mul(basis, c[:, None])
    return terms.sum(axis=0) % np.uint64(P)


def eval_at_point_naive(coeffs_bitrev, x: int, y: int) -> int:
    """Evaluate a bit-reversed coefficient vector at one point (host)."""
    c = np.asarray(coeffs_bitrev, dtype=np.uint64)
    n = int(len(c)).bit_length() - 1
    acc = 0
    for j in range(len(c)):
        cj = int(c[coeff_index_to_pos(j, n)])
        if cj:
            acc = (acc + cj * eval_basis_naive(j, n, x, y)) % P
    return acc
