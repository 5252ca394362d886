"""OODS point evaluation + DEEP quotient tests (prover/verifier parity,
low-degreeness via FRI, wrong-value rejection)."""

import numpy as np

from nexus_zkvm_tpu.channel import Blake2sChannel
from nexus_zkvm_tpu.ops import cfft, fri, quotients
from nexus_zkvm_tpu.ops.circle import (
    bit_reverse_indices, domain, oods_point_from_felt, qm31_point_add,
    m31_point_as_qm31, subgroup_gen,
)
from nexus_zkvm_tpu.ops.field import (
    P, np_qm31, np_qm31_add, np_qm31_mul,
)

RNG = np.random.default_rng(11)


def rand_qm31():
    return RNG.integers(0, P, size=4).astype(np.uint64)


def test_oods_point_on_circle():
    x, y = oods_point_from_felt(rand_qm31())
    lhs = np_qm31_add(np_qm31_mul(x, x), np_qm31_mul(y, y))
    assert np.array_equal(lhs, np_qm31(np.uint64(1)))


def test_evaluate_at_qm31_point_matches_naive():
    log_n = 5
    coeffs = RNG.integers(0, P, size=1 << log_n, dtype=np.uint32)
    # at an in-domain (M31) point the QM31 evaluator must agree with the
    # naive basis evaluation
    d = domain(log_n)
    for idx in [0, 3, (1 << log_n) - 1]:
        px, py = d.point_at(idx)
        got = cfft.evaluate_at_qm31_point(
            coeffs, m31_point_as_qm31((px, py)))
        want = cfft.eval_at_point_naive(coeffs, px, py)
        assert int(got[0]) == want and not got[1:].any()


def test_evaluate_at_qm31_point_matches_fft_evals():
    log_n = 6
    evals = RNG.integers(0, P, size=1 << log_n, dtype=np.uint32)
    coeffs = np.asarray(cfft.interpolate(evals))
    d = domain(log_n)
    for idx in [1, 17, 40]:
        got = cfft.evaluate_at_qm31_point(
            coeffs, m31_point_as_qm31(d.point_at(idx)))
        assert int(got[0]) == int(evals[idx]) and not got[1:].any()


def _committed_evals(coeffs, log_eval):
    evals = np.asarray(cfft.evaluate(coeffs, log_eval))
    return evals[bit_reverse_indices(log_eval)]


def test_quotients_low_degree_and_parity():
    log_n, log_blowup = 6, 1
    s = log_n + log_blowup
    cols, coeffs = [], []
    for _ in range(3):
        c = RNG.integers(0, P, size=1 << log_n, dtype=np.uint32)
        coeffs.append(c)
        cols.append(_committed_evals(c, s))

    z = oods_point_from_felt(rand_qm31())
    step = m31_point_as_qm31(subgroup_gen(log_n))
    z1 = qm31_point_add(z, step)
    samples = [
        quotients.PointSample(
            point=z, columns=[0, 1, 2],
            values=[cfft.evaluate_at_qm31_point(c, z) for c in coeffs]),
        quotients.PointSample(
            point=z1, columns=[1],
            values=[cfft.evaluate_at_qm31_point(coeffs[1], z1)]),
    ]
    gamma = rand_qm31()
    q = np.asarray(quotients.accumulate_quotients(s, cols, samples, gamma))

    # prover/verifier parity at a few positions
    for pos in [0, 5, 77, (1 << s) - 1]:
        colvals = {i: int(cols[i][pos]) for i in range(3)}
        got = quotients.quotients_at(s, samples, colvals, pos, gamma)
        assert np.array_equal(got, q[pos].astype(np.uint64)), pos

    # low-degreeness: FRI over the combined quotients must accept
    ch = Blake2sChannel()
    cfg = fri.FriConfig(log_blowup=log_blowup)
    state = fri.fri_commit({s: q}, ch, cfg)
    queries = ch.draw_queries(8, s)
    proof = fri.fri_decommit(state, queries)
    vch = Blake2sChannel()
    alphas = fri.fri_replay(proof, vch, cfg, [s])
    inputs_at = {s: {i: q[i] for i in range(1 << s)}}
    assert fri.fri_check_queries(proof, alphas, vch.draw_queries(8, s),
                                 inputs_at, [s], cfg)


def test_wrong_claimed_value_is_high_degree(monkeypatch):
    # a wrong OODS claim makes the quotient non-polynomial: the honest
    # prover's degree check trips; a malicious prover that truncates
    # anyway (NZT_FRI_UNSAFE_TRUNCATE) is rejected by the verifier
    monkeypatch.setenv("NZT_FRI_UNSAFE_TRUNCATE", "1")
    log_n, log_blowup = 6, 1
    s = log_n + log_blowup
    c = RNG.integers(0, P, size=1 << log_n, dtype=np.uint32)
    col = _committed_evals(c, s)
    z = oods_point_from_felt(rand_qm31())
    v = cfft.evaluate_at_qm31_point(c, z)
    v_bad = np.array(v)
    v_bad[0] = (v_bad[0] + 1) % P
    samples = [quotients.PointSample(point=z, columns=[0], values=[v_bad])]
    q = np.asarray(quotients.accumulate_quotients(s, [col], samples,
                                                  rand_qm31()))
    ch = Blake2sChannel()
    cfg = fri.FriConfig(log_blowup=log_blowup)
    state = fri.fri_commit({s: q}, ch, cfg)
    queries = ch.draw_queries(8, s)
    proof = fri.fri_decommit(state, queries)
    vch = Blake2sChannel()
    alphas = fri.fri_replay(proof, vch, cfg, [s])
    inputs_at = {s: {i: q[i] for i in range(1 << s)}}
    assert not fri.fri_check_queries(proof, alphas, vch.draw_queries(8, s),
                                     inputs_at, [s], cfg)
