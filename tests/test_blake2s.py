"""Blake2s batch kernel vs hashlib golden vectors; channel determinism."""
import hashlib

import numpy as np

from nexus_zkvm_tpu.ops import blake2s as b2
from nexus_zkvm_tpu.channel import Blake2sChannel
from nexus_zkvm_tpu.ops.field import P

RNG = np.random.default_rng(7)


def golden(words_row):
    return hashlib.blake2s(np.asarray(words_row, dtype="<u4").tobytes()).digest()


def test_batch_blake2s_various_lengths():
    # word counts crossing block boundaries: 1, 8, 15, 16, 17, 24, 32, 33
    for w in [1, 8, 15, 16, 17, 24, 32, 33, 48]:
        msgs = RNG.integers(0, 1 << 32, size=(5, w), dtype=np.uint64).astype(np.uint32)
        got = np.asarray(b2.batch_blake2s_words(msgs))
        for i in range(5):
            want = np.frombuffer(golden(msgs[i]), dtype="<u4")
            assert np.array_equal(got[i], want), (w, i)


def test_batch_blake2s_merkle_node_shape():
    # 64-byte messages (two child digests) — the hot Merkle case
    msgs = RNG.integers(0, 1 << 32, size=(64, 16), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(b2.batch_blake2s_words(msgs))
    want = np.frombuffer(golden(msgs[13]), dtype="<u4")
    assert np.array_equal(got[13], want)


def test_batch_blake2s_multidim_batch():
    msgs = RNG.integers(0, 1 << 32, size=(3, 4, 16), dtype=np.uint64).astype(np.uint32)
    got = np.asarray(b2.batch_blake2s_words(msgs))
    assert got.shape == (3, 4, 8)
    want = np.frombuffer(golden(msgs[2, 1]), dtype="<u4")
    assert np.array_equal(got[2, 1], want)


def test_channel_determinism_and_sensitivity():
    c1, c2 = Blake2sChannel(), Blake2sChannel()
    for c in (c1, c2):
        c.mix_u64(42)
        c.mix_felts(np.arange(8, dtype=np.uint32).reshape(2, 4))
    assert c1.digest == c2.digest
    a = c1.draw_felts(3)
    b = c2.draw_felts(3)
    assert np.array_equal(a, b)
    assert a.shape == (3, 4)
    assert (a < P).all()
    # diverge
    c2.mix_u64(43)
    assert c1.digest != c2.digest


def test_channel_draw_uniform_range():
    c = Blake2sChannel()
    c.mix_u64(1)
    felts = c.draw_base_felts(1000)
    assert (felts < P).all()
    # counter advances -> fresh values
    more = c.draw_base_felts(10)
    assert not np.array_equal(felts[:10], more)


def test_channel_queries_distinct_sorted():
    c = Blake2sChannel()
    c.mix_u64(5)
    qs = c.draw_queries(10, 12)
    assert len(set(qs)) == 10
    assert qs == sorted(qs)
    assert all(0 <= q < (1 << 12) for q in qs)


def test_pow_grind_and_check():
    c = Blake2sChannel()
    c.mix_u64(9)
    v = Blake2sChannel()
    v.mix_u64(9)
    nonce = c.grind_pow(6)
    assert v.mix_pow_nonce(6, nonce)
    assert v.digest == c.digest
    # wrong nonce fails the check (but still mixes — verifier rejects)
    v2 = Blake2sChannel()
    v2.mix_u64(9)
    assert not v2.mix_pow_nonce(6, nonce + 1 if not v2.check_pow_nonce(6, nonce + 1) else nonce + 3)
