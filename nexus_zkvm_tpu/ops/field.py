"""Mersenne-31 field arithmetic as JAX kernels.

The proving field stack (reference: stwo's `m31::BaseField` /
`cm31::CM31` / `qm31::SecureField`, consumed at
`/root/reference/prover/src/machine.rs:8` and throughout the chips):

- ``M31``  : integers mod p = 2^31 - 1, stored as canonical ``uint32`` in
  [0, p).
- ``CM31`` : M31[i] / (i^2 + 1), stored as a pair of trailing-dim-2 M31s.
- ``QM31`` : CM31[u] / (u^2 - (2 + i)) — the degree-4 "secure field",
  stored as trailing-dim-4 M31s ``[a, b, c, d]`` meaning ``(a + b·i) +
  (c + d·i)·u``.

TPU-first design notes
----------------------
* Storage is ``uint32``; 31x31-bit products go through ONE widening
  uint64 multiply plus a Mersenne fold (2^31 ≡ 1 mod p). The package
  enables ``jax_enable_x64``; XLA emulates u64 on TPU with u32 pairs,
  which measures ~40% faster than explicit 16-bit limb decomposition
  (and keeps traced graphs ~3x smaller).
* Inversion is an exponentiation chain (x^(p-2)) — ~37 fully-parallel
  elementwise multiplies. On TPU this beats Montgomery batch inversion,
  which is a sequential prefix product (bad for the VPU); a scan-based
  batched inverse is still provided for the LogUp column packing where
  the reference semantics need it.
* All functions broadcast over arbitrary leading dims and are safe to
  call under ``jit`` / ``shard_map`` / Pallas.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

P = (1 << 31) - 1  # Mersenne prime 2^31 - 1
_U32_P = np.uint32(P)

# u^2 = R in QM31 = CM31[u]/(u^2 - R); R = 2 + i  (matches the reference
# prover's secure-field tower).
QM31_R = (2, 1)


def _u32(x):
    return jnp.asarray(x, dtype=jnp.uint32)


# ---------------------------------------------------------------------------
# M31 (jnp, uint32)
# ---------------------------------------------------------------------------

def m31_reduce(x):
    """Reduce a uint32 in [0, 2^32) to canonical [0, p)."""
    x = _u32(x)
    x = (x & _U32_P) + (x >> 31)          # <= p + 1
    return jnp.where(x >= _U32_P, x - _U32_P, x)


def m31_add(a, b):
    s = _u32(a) + _u32(b)                 # both < p so no uint32 overflow
    return jnp.where(s >= _U32_P, s - _U32_P, s)


def m31_sub(a, b):
    a, b = _u32(a), _u32(b)
    d = a + (_U32_P - b)
    return jnp.where(d >= _U32_P, d - _U32_P, d)


def m31_neg(a):
    a = _u32(a)
    return jnp.where(a == 0, a, _U32_P - a)


_U64_P = np.uint64(P)


def m31_fold_sum(x, axis: int = 0):
    """Modular sum along `axis`: one exact uint64 sum + a Mersenne fold.

    Values are canonical (< 2^31), so a u64 accumulator is exact for up
    to 2^33 terms — far beyond any axis we fold (constraint chunks,
    LogUp batches, domain rows ≤ 2^26). One HLO reduction instead of a
    log-depth add/where tree (the package enables jax_enable_x64).
    """
    x = jnp.asarray(x, jnp.uint32)
    assert x.shape[axis] <= (1 << 33)
    s = jnp.sum(x.astype(jnp.uint64), axis=axis)       # < 2^64, exact
    r = (s & _U64_P) + (s >> jnp.uint64(31))           # < 2^33
    r = (r & _U64_P) + (r >> jnp.uint64(31))           # <= p + 3
    return jnp.where(r >= _U64_P, r - _U64_P, r).astype(jnp.uint32)


def m31_mul(a, b):
    """31-bit modular product via one widening uint64 multiply.

    t = a·b < 2^62; with 2^31 ≡ 1 (mod p) two shift-and-mask folds bring
    t into [0, p]. ~8 HLO ops vs ~22 for 16-bit limb decomposition —
    graph size drives XLA trace/compile time, and the fused kernel moves
    less HBM traffic. XLA emulates u64 on TPU with u32 pairs.
    """
    t = _u32(a).astype(jnp.uint64) * _u32(b).astype(jnp.uint64)
    r = (t & _U64_P) + (t >> jnp.uint64(31))           # < 2^32
    r = (r & _U64_P) + (r >> jnp.uint64(31))           # <= p + 1
    return jnp.where(r >= _U64_P, r - _U64_P, r).astype(jnp.uint32)


def m31_pow(x, e: int):
    """x^e for a static Python-int exponent (square-and-multiply, traced)."""
    x = _u32(x)
    acc = None
    base = x
    while e:
        if e & 1:
            acc = base if acc is None else m31_mul(acc, base)
        e >>= 1
        if e:
            base = m31_mul(base, base)
    if acc is None:
        return jnp.ones_like(x)
    return acc


def m31_inv(x):
    """x^(p-2): an x^(2^k - 1) ladder, 37 elementwise multiplies.

    p - 2 = 2^31 - 3; x^(2^31-3) = (x^(2^29-1))^4 · x.
    Fully parallel over elements — on TPU this is the batch inverse.
    """
    t1 = m31_mul(m31_pow(x, 1 << 1), x)        # x^(2^2 - 1)
    t2 = m31_mul(m31_pow(t1, 1 << 1), x)       # x^(2^3 - 1)
    t3 = m31_mul(m31_pow(t2, 1 << 3), t2)      # x^(2^6 - 1)
    t4 = m31_mul(m31_pow(t3, 1 << 6), t3)      # x^(2^12 - 1)
    t5 = m31_mul(m31_pow(t4, 1 << 12), t4)     # x^(2^24 - 1)
    t6 = m31_mul(m31_pow(t5, 1 << 3), t2)      # x^(2^27 - 1)
    t7 = m31_mul(m31_pow(t6, 1 << 2), t1)      # x^(2^29 - 1)
    return m31_mul(m31_pow(t7, 1 << 2), x)     # x^(2^31 - 3)


def m31_batch_inv_scan(x):
    """Montgomery batch inversion along the leading axis via cumprod.

    Provided for parity with the reference's LogUp generator
    (`stwo` SimdBackend batch inverse). Sequential along axis 0 —
    prefer `m31_inv` (parallel pow) unless the multiply count matters.
    """
    import jax
    prefix = jax.lax.associative_scan(m31_mul, x, axis=0)
    total_inv = m31_inv(prefix[-1])
    # suffix pass
    def body(carry, xs):
        pref_prev, xi = xs
        inv_i = m31_mul(carry, pref_prev)
        carry = m31_mul(carry, xi)
        return carry, inv_i
    import jax.lax as lax
    shifted = jnp.concatenate([jnp.ones_like(x[:1]), prefix[:-1]], axis=0)
    # reversed scan
    idx = jnp.arange(x.shape[0] - 1, -1, -1)
    carry = total_inv
    _, out_rev = lax.scan(body, carry, (shifted[idx], x[idx]))
    return out_rev[::-1]


# ---------------------------------------------------------------------------
# CM31: pairs (..., 2)
# ---------------------------------------------------------------------------

def cm31(re, im):
    return jnp.stack([_u32(re), _u32(im)], axis=-1)


def cm31_add(a, b):
    return m31_add(a, b)


def cm31_sub(a, b):
    return m31_sub(a, b)


def cm31_neg(a):
    return m31_neg(a)


def cm31_mul(a, b):
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    rr = m31_sub(m31_mul(ar, br), m31_mul(ai, bi))
    ri = m31_add(m31_mul(ar, bi), m31_mul(ai, br))
    return jnp.stack([rr, ri], axis=-1)


def cm31_mul_m31(a, s):
    return jnp.stack([m31_mul(a[..., 0], s), m31_mul(a[..., 1], s)], axis=-1)


def cm31_conj(a):
    return jnp.stack([a[..., 0], m31_neg(a[..., 1])], axis=-1)


def cm31_inv(a):
    ar, ai = a[..., 0], a[..., 1]
    norm = m31_add(m31_mul(ar, ar), m31_mul(ai, ai))
    ninv = m31_inv(norm)
    return jnp.stack([m31_mul(ar, ninv), m31_mul(m31_neg(ai), ninv)], axis=-1)


# ---------------------------------------------------------------------------
# QM31: quadruples (..., 4) = (a + b·i) + (c + d·i)·u, u^2 = 2 + i
# ---------------------------------------------------------------------------

def qm31(a, b=0, c=0, d=0):
    a, b, c, d = (_u32(v) for v in (a, b, c, d))
    a, b, c, d = jnp.broadcast_arrays(a, b, c, d)
    return jnp.stack([a, b, c, d], axis=-1)


def qm31_from_m31(x):
    x = _u32(x)
    z = jnp.zeros_like(x)
    return jnp.stack([x, z, z, z], axis=-1)


def qm31_first(x):
    return x[..., 0]


def qm31_add(a, b):
    return m31_add(a, b)


def qm31_sub(a, b):
    return m31_sub(a, b)


def qm31_neg(a):
    return m31_neg(a)


def _qm31_split(x):
    return x[..., 0:2], x[..., 2:4]


def _mul_by_r(x):
    """CM31 multiply by R = 2 + i."""
    xr, xi = x[..., 0], x[..., 1]
    rr = m31_sub(m31_add(xr, xr), xi)            # 2*xr - xi
    ri = m31_add(m31_add(xi, xi), xr)            # 2*xi + xr
    return jnp.stack([rr, ri], axis=-1)


def qm31_mul(x, y):
    """(A + B·u)(C + D·u) = AC + R·BD + (AD + BC)·u."""
    xa, xb = _qm31_split(x)
    ya, yb = _qm31_split(y)
    ac = cm31_mul(xa, ya)
    bd = cm31_mul(xb, yb)
    ad_bc = cm31_add(cm31_mul(xa, yb), cm31_mul(xb, ya))
    lo = cm31_add(ac, _mul_by_r(bd))
    return jnp.concatenate([lo, ad_bc], axis=-1)


def qm31_mul_m31(x, s):
    return m31_mul(x, s[..., None])


def qm31_mul_cm31(x, c):
    xa, xb = _qm31_split(x)
    return jnp.concatenate([cm31_mul(xa, c), cm31_mul(xb, c)], axis=-1)


def qm31_inv(x):
    """1/(A + B·u) = (A - B·u) / (A^2 - R·B^2), denominator in CM31."""
    xa, xb = _qm31_split(x)
    denom = cm31_sub(cm31_mul(xa, xa), _mul_by_r(cm31_mul(xb, xb)))
    dinv = cm31_inv(denom)
    return jnp.concatenate([cm31_mul(xa, dinv),
                            cm31_mul(cm31_neg(xb), dinv)], axis=-1)


def qm31_pow(x, e: int):
    acc = None
    base = x
    while e:
        if e & 1:
            acc = base if acc is None else qm31_mul(acc, base)
        e >>= 1
        if e:
            base = qm31_mul(base, base)
    if acc is None:
        return qm31(jnp.ones(x.shape[:-1], jnp.uint32))
    return acc


def qm31_pow_list(x, k: int):
    """(k, 4) array of x^0 .. x^(k-1) via lax.scan (compact graph)."""
    import jax
    one = jnp.zeros(4, jnp.uint32).at[0].set(1)
    if k == 1:
        return one[None, :]

    def body(carry, _):
        nxt = qm31_mul(carry, jnp.asarray(x, jnp.uint32))
        return nxt, carry

    _, pows = jax.lax.scan(body, one, None, length=k)
    return pows


# ---------------------------------------------------------------------------
# Host-side mirrors (numpy uint64) — used for twiddle/point precompute and
# golden tests. 31-bit products fit comfortably in uint64.
# ---------------------------------------------------------------------------

def np_m31_add(a, b):
    return (a.astype(np.uint64) + b.astype(np.uint64)) % np.uint64(P)


def np_m31_sub(a, b):
    return (a.astype(np.uint64) + np.uint64(P) - b.astype(np.uint64)) % np.uint64(P)


def np_m31_mul(a, b):
    return (a.astype(np.uint64) * b.astype(np.uint64)) % np.uint64(P)


def np_m31_neg(a):
    return (np.uint64(P) - a.astype(np.uint64)) % np.uint64(P)


def np_m31_pow(x, e: int):
    x = np.asarray(x, dtype=np.uint64)
    acc = np.ones_like(x)
    while e:
        if e & 1:
            acc = np_m31_mul(acc, x)
        x = np_m31_mul(x, x)
        e >>= 1
    return acc


def np_m31_inv(x):
    return np_m31_pow(x, P - 2)


# -- host-side CM31/QM31 (trailing-dim 2/4 uint64 arrays, same layout as the
#    device versions). Used by the verifier's per-query scalar math and by
#    twiddle/OODS precompute; golden-tested against the jnp kernels.

def np_cm31_mul(a, b):
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    ar, ai = a[..., 0], a[..., 1]
    br, bi = b[..., 0], b[..., 1]
    rr = np_m31_sub(np_m31_mul(ar, br), np_m31_mul(ai, bi))
    ri = np_m31_add(np_m31_mul(ar, bi), np_m31_mul(ai, br))
    return np.stack([rr, ri], axis=-1)


def np_cm31_inv(a):
    a = np.asarray(a, np.uint64)
    ar, ai = a[..., 0], a[..., 1]
    norm = np_m31_add(np_m31_mul(ar, ar), np_m31_mul(ai, ai))
    ninv = np_m31_inv(norm)
    return np.stack([np_m31_mul(ar, ninv),
                     np_m31_mul(np_m31_neg(ai), ninv)], axis=-1)


def _np_mul_by_r(x):
    xr, xi = x[..., 0], x[..., 1]
    rr = np_m31_sub(np_m31_add(xr, xr), xi)
    ri = np_m31_add(np_m31_add(xi, xi), xr)
    return np.stack([rr, ri], axis=-1)


def np_qm31(a, b=0, c=0, d=0):
    parts = np.broadcast_arrays(*(np.asarray(v, np.uint64) % np.uint64(P)
                                  for v in (a, b, c, d)))
    return np.stack(parts, axis=-1)


def np_qm31_add(a, b):
    return np_m31_add(np.asarray(a, np.uint64), np.asarray(b, np.uint64))


def np_qm31_sub(a, b):
    return np_m31_sub(np.asarray(a, np.uint64), np.asarray(b, np.uint64))


def np_qm31_neg(a):
    return np_m31_neg(np.asarray(a, np.uint64))


def _np_qm31_mul_scalar(x, y):
    """(4,) x (4,) fast path in native Python ints — numpy's per-op
    overhead on 4-element arrays makes the array path ~50x slower,
    and the verifier is built out of exactly these scalar muls."""
    a0, a1, a2, a3 = (int(t) for t in x)
    b0, b1, b2, b3 = (int(t) for t in y)
    ac0 = (a0 * b0 - a1 * b1) % P
    ac1 = (a0 * b1 + a1 * b0) % P
    bd0 = (a2 * b2 - a3 * b3) % P
    bd1 = (a2 * b3 + a3 * b2) % P
    hi0 = (a0 * b2 - a1 * b3 + a2 * b0 - a3 * b1) % P
    hi1 = (a0 * b3 + a1 * b2 + a2 * b1 + a3 * b0) % P
    lo0 = (ac0 + 2 * bd0 - bd1) % P          # + r*bd, r = 2+i
    lo1 = (ac1 + 2 * bd1 + bd0) % P
    return np.array([lo0, lo1, hi0, hi1], np.uint64)


def np_qm31_mul(x, y):
    x = np.asarray(x, np.uint64)
    y = np.asarray(y, np.uint64)
    if x.shape == (4,) and y.shape == (4,):
        return _np_qm31_mul_scalar(x, y)
    xa, xb = x[..., 0:2], x[..., 2:4]
    ya, yb = y[..., 0:2], y[..., 2:4]
    ac = np_cm31_mul(xa, ya)
    bd = np_cm31_mul(xb, yb)
    ad_bc = np_m31_add(np_cm31_mul(xa, yb), np_cm31_mul(xb, ya))
    lo = np_m31_add(ac, _np_mul_by_r(bd))
    return np.concatenate([lo, ad_bc], axis=-1)


def np_qm31_inv(x):
    x = np.asarray(x, np.uint64)
    if x.shape == (4,):
        a0, a1, a2, a3 = (int(t) for t in x)
        # denom = xa^2 - r * xb^2 (a CM31); invert via conj / norm
        s0 = (a0 * a0 - a1 * a1) % P
        s1 = (2 * a0 * a1) % P
        t0 = (a2 * a2 - a3 * a3) % P
        t1 = (2 * a2 * a3) % P
        d0 = (s0 - (2 * t0 - t1)) % P
        d1 = (s1 - (2 * t1 + t0)) % P
        ninv = pow((d0 * d0 + d1 * d1) % P, P - 2, P)
        i0 = (d0 * ninv) % P
        i1 = (-d1 * ninv) % P
        return np.array([(a0 * i0 - a1 * i1) % P,
                         (a0 * i1 + a1 * i0) % P,
                         ((-a2) * i0 - (-a3) * i1) % P,
                         ((-a2) * i1 + (-a3) * i0) % P], np.uint64)
    xa, xb = x[..., 0:2], x[..., 2:4]
    denom = np_m31_sub(np_cm31_mul(xa, xa), _np_mul_by_r(np_cm31_mul(xb, xb)))
    dinv = np_cm31_inv(denom)
    return np.concatenate([np_cm31_mul(xa, dinv),
                           np_cm31_mul(np_m31_neg(xb), dinv)], axis=-1)


def np_qm31_conj(x):
    """Galois conjugation of QM31 over CM31: u -> -u (negates coords 2, 3).

    Fixes CM31 (hence M31), so for any polynomial f with M31
    coefficients, conj(f(z)) = f(conj(z)) — the identity the OODS
    quotients rely on.
    """
    x = np.asarray(x, np.uint64)
    return np.concatenate([x[..., 0:2], np_m31_neg(x[..., 2:4])], axis=-1)


def np_qm31_pow(x, e: int):
    x = np.asarray(x, np.uint64)
    acc = np_qm31(np.ones(x.shape[:-1], np.uint64))
    base = x
    while e:
        if e & 1:
            acc = np_qm31_mul(acc, base)
        base = np_qm31_mul(base, base)
        e >>= 1
    return acc
