"""FRI commit/verify round-trips on low-degree inputs, plus soundness smokes."""

import numpy as np
import pytest

from nexus_zkvm_tpu.channel import Blake2sChannel
from nexus_zkvm_tpu.ops import cfft, fri
from nexus_zkvm_tpu.ops.circle import bit_reverse_indices
from nexus_zkvm_tpu.ops.field import P

RNG = np.random.default_rng(7)


def low_degree_committed_evals(log_n: int, log_blowup: int) -> np.ndarray:
    """Random QM31 poly of dim 2^log_n evaluated on 2^(log_n+blowup), committed order."""
    s = log_n + log_blowup
    comps = []
    for _ in range(4):
        coeffs = RNG.integers(0, P, size=1 << log_n, dtype=np.uint32)
        evals = np.asarray(cfft.evaluate(coeffs, s))       # layout order
        comps.append(evals[bit_reverse_indices(s)])        # committed order
    return np.stack(comps, axis=-1)


def full_inputs_at(inputs):
    return {s: {i: v[i] for i in range(v.shape[0])} for s, v in inputs.items()}


def run_fri(inputs, config, n_queries=8, tamper=None):
    ch = Blake2sChannel()
    state = fri.fri_commit({s: v for s, v in inputs.items()}, ch, config)
    s0 = max(inputs)
    queries = ch.draw_queries(n_queries, s0)
    proof = fri.fri_decommit(state, queries)

    vch = Blake2sChannel()
    alphas = fri.fri_replay(proof, vch, config, list(inputs))
    assert vch.digest == ch.digest, "prover/verifier transcripts diverged"
    vqueries = vch.draw_queries(n_queries, s0)
    assert vqueries == queries

    inputs_at = full_inputs_at(inputs)
    if tamper is not None:
        s, pos = tamper
        v = np.array(inputs_at[s][pos])
        v[0] = (v[0] + 1) % P
        inputs_at[s][pos] = v
    return fri.fri_check_queries(proof, alphas, vqueries, inputs_at,
                                 list(inputs), config)


def test_single_input_accepts():
    cfg = fri.FriConfig(log_blowup=1, log_last_layer=0)
    inputs = {8: low_degree_committed_evals(7, 1)}
    assert run_fri(inputs, cfg)


def test_multi_size_inputs_accept():
    cfg = fri.FriConfig(log_blowup=1, log_last_layer=0)
    inputs = {
        9: low_degree_committed_evals(8, 1),
        8: low_degree_committed_evals(7, 1),
        6: low_degree_committed_evals(5, 1),
    }
    assert run_fri(inputs, cfg)


def test_smallest_input_joining_at_last_layer():
    cfg = fri.FriConfig(log_blowup=1, log_last_layer=0)
    # size 2 folds directly into the last line layer (size 2^1)
    inputs = {
        6: low_degree_committed_evals(5, 1),
        2: low_degree_committed_evals(1, 1),
    }
    assert run_fri(inputs, cfg)


def test_high_degree_input_rejected():
    cfg = fri.FriConfig(log_blowup=1, log_last_layer=0)
    junk = RNG.integers(0, P, size=(1 << 8, 4), dtype=np.uint32)
    assert not run_fri({8: junk}, cfg)


def test_tampered_query_value_rejected():
    cfg = fri.FriConfig(log_blowup=1, log_last_layer=0)
    inputs = {8: low_degree_committed_evals(7, 1)}
    ch = Blake2sChannel()
    fri.fri_commit(inputs, ch, cfg)
    q0 = ch.draw_queries(4, 8)[0]
    assert not run_fri(inputs, cfg, n_queries=4, tamper=(8, q0))


def test_tampered_last_layer_rejected():
    cfg = fri.FriConfig(log_blowup=1, log_last_layer=0)
    inputs = {8: low_degree_committed_evals(7, 1)}
    ch = Blake2sChannel()
    state = fri.fri_commit(inputs, ch, cfg)
    queries = ch.draw_queries(4, 8)
    proof = fri.fri_decommit(state, queries)
    proof.last_layer = np.array(proof.last_layer)
    proof.last_layer[0, 0] = (proof.last_layer[0, 0] + 1) % P

    vch = Blake2sChannel()
    alphas = fri.fri_replay(proof, vch, cfg, list(inputs))
    vq = vch.draw_queries(4, 8)
    assert not fri.fri_check_queries(proof, alphas, vq,
                                     full_inputs_at(inputs), list(inputs),
                                     cfg)
