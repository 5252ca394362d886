"""End-to-end STARK prove/verify on a toy two-component AIR.

Exercises: multi-size components, next-row masks, LogUp emit/consume
across components (claimed-sum balance), composition buckets, OODS,
quotients, FRI, PoW, openings — the full pipeline of prover/stark.py.
"""

import numpy as np
import pytest

from nexus_zkvm_tpu.air import Component
from nexus_zkvm_tpu.channel import Blake2sChannel
from nexus_zkvm_tpu.prover import PcsConfig, prove, verify
from nexus_zkvm_tpu.ops.fri import FriConfig
from nexus_zkvm_tpu.ops.field import P

CFG = PcsConfig(pow_bits=4, fri=FriConfig(log_blowup=1, log_last_layer=0,
                                          n_queries=8))

LOG_SQ = 6
LOG_TB = 4


class SquareComp(Component):
    """y = x^2; z = next-row x; emits each y into the 'vals' relation."""
    name = "square"
    n_main = 3

    def evaluate(self, ctx):
        x, y, z = ctx.main(0), ctx.main(1), ctx.main(2)
        ctx.constraint(y - x * x)
        ctx.constraint(z - ctx.main(0, 1))
        ctx.add_fraction(1, "vals", [y])


class TableComp(Component):
    """(val, mult) table consuming the 'vals' relation."""
    name = "table"
    n_main = 2

    def evaluate(self, ctx):
        val, mult = ctx.main(0), ctx.main(1)
        ctx.add_fraction(-mult, "vals", [val])


def make_traces():
    n = 1 << LOG_SQ
    x = (np.arange(n) % 7).astype(np.uint32)
    y = (x.astype(np.uint64) ** 2 % P).astype(np.uint32)
    z = np.roll(x, -1)

    m = 1 << LOG_TB
    vals = np.zeros(m, np.uint32)
    mult = np.zeros(m, np.uint32)
    uniq, counts = np.unique(y, return_counts=True)
    vals[:len(uniq)] = uniq
    mult[:len(uniq)] = counts
    return [[x, y, z], [vals, mult]]


COMPONENTS = [SquareComp(), TableComp()]
LOG_SIZES = [LOG_SQ, LOG_TB]


@pytest.fixture(scope="module")
def proof():
    return prove(COMPONENTS, LOG_SIZES, make_traces(), Blake2sChannel(),
                 CFG)


def test_prove_verify_roundtrip(proof):
    assert verify(COMPONENTS, proof, Blake2sChannel(), CFG)
    assert proof.size_estimate() > 0


def test_tampered_claimed_sum_rejected(proof):
    import copy
    bad = copy.deepcopy(proof)
    bad.claimed_sums[0] = np.asarray((bad.claimed_sums[0] + 1) % P,
                                     np.uint64)
    assert not verify(COMPONENTS, bad, Blake2sChannel(), CFG)


def test_tampered_sampled_value_rejected(proof):
    import copy
    bad = copy.deepcopy(proof)
    bad.sampled[5] = np.asarray((bad.sampled[5] + 1) % P, np.uint64)
    assert not verify(COMPONENTS, bad, Blake2sChannel(), CFG)


def test_tampered_opening_rejected(proof):
    import copy
    bad = copy.deepcopy(proof)
    dec = bad.openings["main"][0][1]
    dec.column_values[0] = np.asarray(dec.column_values[0]).copy()
    dec.column_values[0][0] = (int(dec.column_values[0][0]) + 1) % P
    assert not verify(COMPONENTS, bad, Blake2sChannel(), CFG)


def test_wrong_pow_rejected(proof):
    import copy
    bad = copy.deepcopy(proof)
    bad.pow_nonce += 1
    assert not verify(COMPONENTS, bad, Blake2sChannel(), CFG)


def test_invalid_trace_rejected():
    traces = make_traces()
    traces[0][1] = np.asarray((traces[0][1].astype(np.uint64) + 1) % P,
                              np.uint32)  # y != x^2
    bad_proof = prove(COMPONENTS, LOG_SIZES, traces, Blake2sChannel(), CFG)
    assert not verify(COMPONENTS, bad_proof, Blake2sChannel(), CFG)


def test_unbalanced_lookup_rejected():
    traces = make_traces()
    traces[1][1] = traces[1][1].copy()
    traces[1][1][0] += 1  # multiset mismatch -> claimed sums don't cancel
    bad_proof = prove(COMPONENTS, LOG_SIZES, traces, Blake2sChannel(), CFG)
    assert not verify(COMPONENTS, bad_proof, Blake2sChannel(), CFG)


def test_streamed_commit_proof_identical(monkeypatch):
    """The 2^22+ memory mode — column-streamed commits with
    recompute-from-coefficients quotients and openings — produces the
    EXACT proof of the resident-evals path (same roots, same
    transcript, same openings) and verifies."""
    def tree_eq(a, b):
        if isinstance(a, dict):
            return set(a) == set(b) and all(tree_eq(a[k], b[k])
                                            for k in a)
        if isinstance(a, (list, tuple)):
            return len(a) == len(b) and all(tree_eq(u, v)
                                            for u, v in zip(a, b))
        if hasattr(a, "__dict__"):
            return tree_eq(vars(a), vars(b))
        if hasattr(a, "shape"):
            return np.array_equal(np.asarray(a), np.asarray(b))
        return a == b

    p1 = prove(COMPONENTS, LOG_SIZES, make_traces(), Blake2sChannel(),
               CFG)
    monkeypatch.setenv("NZT_STREAM_COMMIT_BYTES", "256")
    p2 = prove(COMPONENTS, LOG_SIZES, make_traces(), Blake2sChannel(),
               CFG)
    assert tree_eq(p1, p2)
    assert verify(COMPONENTS, p2, Blake2sChannel(), CFG)
