"""Circle FFT: roundtrip, naive-basis cross-check, LDE consistency."""
import numpy as np

from nexus_zkvm_tpu.ops import cfft, circle
from nexus_zkvm_tpu.ops.field import P

RNG = np.random.default_rng(3)


def rand_col(n, batch=()):
    return RNG.integers(0, P, size=batch + (n,), dtype=np.uint32)


def test_domain_points_on_circle():
    d = circle.domain(5)
    x, y = d.points()
    assert len(x) == 32
    lhs = (x.astype(np.uint64) ** 2 + y.astype(np.uint64) ** 2) % P
    assert np.array_equal(lhs, np.ones(32, np.uint64))
    # all points distinct
    assert len({(int(a), int(b)) for a, b in zip(x, y)}) == 32
    # point_at agrees with vectorized enumeration
    for i in [0, 1, 15, 16, 17, 31]:
        assert d.point_at(i) == (int(x[i]), int(y[i]))


def test_roundtrip_identity():
    for n in [1, 2, 3, 6, 10]:
        e = rand_col(1 << n)
        c = cfft.interpolate(e)
        back = np.asarray(cfft.evaluate(c))
        assert np.array_equal(back, e), n


def test_roundtrip_batched():
    e = rand_col(64, batch=(7,))
    back = np.asarray(cfft.evaluate(cfft.interpolate(e)))
    assert np.array_equal(back, e)


def test_evaluate_matches_naive_basis():
    n = 4
    coeffs = rand_col(1 << n)
    evals = np.asarray(cfft.evaluate(coeffs))
    x, y = circle.domain(n).points()
    for i in range(1 << n):
        want = cfft.eval_at_point_naive(coeffs, int(x[i]), int(y[i]))
        assert int(evals[i]) == want, i


def test_constant_poly():
    n = 5
    coeffs = np.zeros(1 << n, np.uint32)
    coeffs[cfft.coeff_index_to_pos(0, n)] = 123
    evals = np.asarray(cfft.evaluate(coeffs))
    assert (evals == 123).all()
    # and interpolating a constant gives only the constant coefficient
    c = np.asarray(cfft.interpolate(np.full(1 << n, 9, np.uint32)))
    want = np.zeros(1 << n, np.uint32)
    want[cfft.coeff_index_to_pos(0, n)] = 9
    assert np.array_equal(c, want)


def test_lde_extends_same_polynomial():
    n, blow = 4, 2
    e = rand_col(1 << n)
    coeffs = cfft.interpolate(e)
    big = np.asarray(cfft.evaluate(coeffs, n + blow))
    # naive check at a few points of the big domain
    xb, yb = circle.domain(n + blow).points()
    for i in [0, 3, 17, 40, 63]:
        want = cfft.eval_at_point_naive(coeffs, int(xb[i]), int(yb[i]))
        assert int(big[i]) == want, i
    # interpolating the big evals returns zero-embedded coefficients
    cb = np.asarray(cfft.interpolate(big))
    emb = np.asarray(cfft.extend_coeffs(coeffs, n + blow))
    assert np.array_equal(cb, emb)


def test_lde_wrapper():
    e = rand_col(32, batch=(3,))
    big = np.asarray(cfft.lde(e, 1))
    assert big.shape == (3, 64)
    # restriction: the original domain is NOT a subset of the blown-up
    # canonic domain (twin-coset structure), so check via coefficients.
    cb = np.asarray(cfft.interpolate(big))
    assert np.array_equal(
        cb, np.asarray(cfft.extend_coeffs(cfft.interpolate(e), 6)))


def test_large_transform_transposed_path():
    """n >= 15 engages the transposed small-half stage path; values
    must match the plain-path math exactly (roundtrip + spot point)."""
    import nexus_zkvm_tpu.ops.cfft as C
    rng = np.random.default_rng(3)
    n = 15
    evals = rng.integers(0, P, size=(2, 1 << n), dtype=np.uint32)
    cf = np.asarray(C.interpolate(evals))
    back = np.asarray(C.evaluate(cf))
    assert np.array_equal(back, evals)
    # against the plain path: force the threshold off
    old = C._TRANSPOSE_MIN_LOG
    try:
        C._TRANSPOSE_MIN_LOG = 99
        from nexus_zkvm_tpu.utils.progstore import clear_memory_cache
        clear_memory_cache()
        cf_plain = np.asarray(C.interpolate(evals))
        assert np.array_equal(cf, cf_plain)
        # LDE comparison (extension exercises extend_coeffs too)
        lde_plain = np.asarray(C.evaluate(cf[:, : 1 << (n - 1)], n))
    finally:
        C._TRANSPOSE_MIN_LOG = old
        clear_memory_cache()
    lde_t = np.asarray(C.evaluate(cf[:, : 1 << (n - 1)], n))
    assert np.array_equal(lde_t, lde_plain)
