"""Golden tests for M31/CM31/QM31 arithmetic against Python-int math."""
import numpy as np
import jax.numpy as jnp
import pytest

from nexus_zkvm_tpu.ops import field as f

P = f.P
RNG = np.random.default_rng(0)


def rand_m31(shape):
    return RNG.integers(0, P, size=shape, dtype=np.uint32)


def test_m31_add_sub_neg():
    a = rand_m31((1000,))
    b = rand_m31((1000,))
    assert np.array_equal(np.asarray(f.m31_add(a, b)), (a.astype(np.uint64) + b) % P)
    assert np.array_equal(np.asarray(f.m31_sub(a, b)),
                          (a.astype(np.int64) - b.astype(np.int64)) % P)
    assert np.array_equal(np.asarray(f.m31_neg(a)), (P - a.astype(np.uint64)) % P)


def test_m31_mul_exhaustive_edges():
    edges = np.array([0, 1, 2, 3, 0xFFFF, 0x10000, 0x10001,
                      P - 1, P - 2, P // 2, P // 2 + 1, (1 << 30),
                      (1 << 30) - 1, (1 << 16) + 12345], dtype=np.uint32)
    a = np.repeat(edges, len(edges))
    b = np.tile(edges, len(edges))
    got = np.asarray(f.m31_mul(a, b), dtype=np.uint64)
    want = (a.astype(np.uint64) * b.astype(np.uint64)) % P
    assert np.array_equal(got, want)


def test_m31_mul_random():
    a = rand_m31((4096,))
    b = rand_m31((4096,))
    got = np.asarray(f.m31_mul(a, b), dtype=np.uint64)
    want = (a.astype(np.uint64) * b.astype(np.uint64)) % P
    assert np.array_equal(got, want)


def test_m31_inv():
    a = rand_m31((512,))
    a[a == 0] = 1
    inv = np.asarray(f.m31_inv(a), dtype=np.uint64)
    assert np.array_equal((inv * a.astype(np.uint64)) % P, np.ones(512, np.uint64))


def test_m31_pow_matches_python():
    a = rand_m31((16,))
    for e in [0, 1, 2, 3, 7, 100, P - 2]:
        got = np.asarray(f.m31_pow(a, e), dtype=np.uint64)
        want = np.array([pow(int(x), e, P) for x in a], dtype=np.uint64)
        assert np.array_equal(got, want), e


def test_m31_batch_inv_scan():
    a = rand_m31((257,))
    a[a == 0] = 1
    inv = np.asarray(f.m31_batch_inv_scan(jnp.asarray(a)), dtype=np.uint64)
    assert np.array_equal((inv * a.astype(np.uint64)) % P, np.ones(257, np.uint64))


# --- CM31 -------------------------------------------------------------

def cm_to_int(x):
    """Represent CM31 as python complex-like tuple for checking."""
    return (int(x[..., 0]), int(x[..., 1]))


def test_cm31_mul_inv():
    a = f.cm31(rand_m31((100,)), rand_m31((100,)))
    b = f.cm31(rand_m31((100,)), rand_m31((100,)))
    got = np.asarray(f.cm31_mul(a, b), dtype=np.uint64)
    ar, ai = np.asarray(a[..., 0], np.uint64), np.asarray(a[..., 1], np.uint64)
    br, bi = np.asarray(b[..., 0], np.uint64), np.asarray(b[..., 1], np.uint64)
    want_r = (ar * br + P * P - ai * bi) % P
    want_i = (ar * bi + ai * br) % P
    assert np.array_equal(got[..., 0], want_r)
    assert np.array_equal(got[..., 1], want_i)

    inv = f.cm31_inv(a)
    prod = np.asarray(f.cm31_mul(a, inv))
    assert np.array_equal(prod[..., 0], np.ones(100, np.uint32))
    assert np.array_equal(prod[..., 1], np.zeros(100, np.uint32))


# --- QM31 -------------------------------------------------------------

def qm31_mul_python(x, y):
    """Reference QM31 mul with python ints. x,y are 4-tuples."""
    (a, b, c, d), (e, g, h, k) = x, y
    # (a+bi) + (c+di)u times (e+gi) + (h+ki)u ; u^2 = 2 + i
    # CM31 products:
    def cmul(p, q):
        return ((p[0] * q[0] - p[1] * q[1]) % P, (p[0] * q[1] + p[1] * q[0]) % P)
    def cadd(p, q):
        return ((p[0] + q[0]) % P, (p[1] + q[1]) % P)
    A, B, C, D = (a, b), (c, d), (e, g), (h, k)
    ac = cmul(A, C)
    bd = cmul(B, D)
    r_bd = cmul((2, 1), bd)
    lo = cadd(ac, r_bd)
    hi = cadd(cmul(A, D), cmul(B, C))
    return (lo[0], lo[1], hi[0], hi[1])


def test_qm31_mul():
    xs = rand_m31((50, 4))
    ys = rand_m31((50, 4))
    got = np.asarray(f.qm31_mul(xs, ys))
    for i in range(50):
        want = qm31_mul_python(tuple(int(v) for v in xs[i]),
                               tuple(int(v) for v in ys[i]))
        assert tuple(got[i]) == want, i


def test_qm31_inv():
    xs = rand_m31((64, 4))
    inv = f.qm31_inv(xs)
    prod = np.asarray(f.qm31_mul(xs, inv))
    one = np.zeros((64, 4), np.uint32)
    one[:, 0] = 1
    assert np.array_equal(prod, one)


def test_qm31_pow():
    x = rand_m31((4, 4))
    x5 = np.asarray(f.qm31_pow(x, 5))
    want = x
    for _ in range(4):
        want = f.qm31_mul(want, x)
    assert np.array_equal(x5, np.asarray(want))


def test_np_host_mirrors():
    a = rand_m31((100,))
    b = rand_m31((100,))
    assert np.array_equal(f.np_m31_mul(a, b), np.asarray(f.m31_mul(a, b), np.uint64))
    assert np.array_equal(f.np_m31_add(a, b), np.asarray(f.m31_add(a, b), np.uint64))
    a[a == 0] = 1
    assert np.array_equal(f.np_m31_inv(a), np.asarray(f.m31_inv(a), np.uint64))
