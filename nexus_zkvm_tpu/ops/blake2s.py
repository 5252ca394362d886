"""Blake2s-256 as a batch-vectorized JAX kernel.

Role in the protocol (reference: stwo's `Blake2sMerkleHasher` /
`Blake2sChannel`, consumed at `/root/reference/prover/src/machine.rs:7,12`):
every Merkle tree layer hashes millions of short messages (two child
digests + the column values at that layer), and the Fiat-Shamir channel
hashes a handful of small messages per round.

TPU-first design
----------------
* The Merkle workhorse is :func:`batch_compress` /
  :func:`batch_blake2s_words`: B independent equal-length messages
  hashed in lockstep. Blake2s is pure uint32 add/xor/rotate — ideal VPU
  work; the batch axis vectorizes across lanes, the 10 rounds x 8 G
  mixes are unrolled at trace time.
* Message lengths in our use are always whole uint32 words
  (digests are 8 words, column values 1 word each), so the API is
  word-oriented and little-endian, matching Blake2s's native layout —
  no byte shuffling on device.
* Host-side scalar hashing (the channel) just uses ``hashlib.blake2s``.

Golden-tested against ``hashlib.blake2s``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_IV = np.array([
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
], dtype=np.uint32)

# Parameter block word 0 for an unkeyed 32-byte digest:
# digest_length=0x20 | key_len<<8 | fanout=1<<16 | depth=1<<24
_PARAM0 = np.uint32(0x01010020)

_SIGMA = np.array([
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15],
    [14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3],
    [11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4],
    [7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8],
    [9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13],
    [2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9],
    [12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11],
    [13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10],
    [6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5],
    [10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0],
], dtype=np.int32)


def _ror(x, n: int):
    return (x >> jnp.uint32(n)) | (x << jnp.uint32(32 - n))


def initial_state():
    """h0 for an unkeyed 32-byte-digest Blake2s instance, shape (8,)."""
    h = _IV.copy()
    h[0] ^= _PARAM0
    return h


def batch_compress(h, m, t: int, last: bool):
    """One Blake2s compression over a batch.

    h: (..., 8) uint32 state; m: (..., 16) uint32 message block;
    t: byte counter AFTER this block (static int); last: final-block flag.
    Returns the new (..., 8) state.

    The 10 rounds run under ``lax.fori_loop`` with the message words
    pre-permuted per round — the traced graph stays ~100 ops (one round
    body), keeping XLA compile time flat no matter how many distinct
    batch shapes the Merkle tree produces.
    """
    h = jnp.asarray(h, jnp.uint32)
    m = jnp.asarray(m, jnp.uint32)
    shape = h.shape[:-1]
    v = [h[..., i] for i in range(8)] + \
        [jnp.broadcast_to(jnp.uint32(_IV[i]), shape) for i in range(8)]
    if isinstance(t, (int, np.integer)):
        t_lo = jnp.uint32(t & 0xFFFFFFFF)
        t_hi = jnp.uint32((t >> 32) & 0xFFFFFFFF)
    else:
        # traced byte counter: lets chunk-streamed commit programs be
        # shared across chunk offsets (one compile instead of one per
        # `done` value — see pcs._stream_commit)
        t64 = jnp.asarray(t, jnp.uint64)
        t_lo = (t64 & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        t_hi = (t64 >> jnp.uint64(32)).astype(jnp.uint32)
    v[12] = v[12] ^ t_lo
    v[13] = v[13] ^ t_hi
    if last:
        v[14] = v[14] ^ jnp.uint32(0xFFFFFFFF)

    # (10, ..., 16): message words in per-round sigma order
    mperm = m[..., jnp.asarray(_SIGMA)]          # (..., 10, 16)
    mperm = jnp.moveaxis(mperm, -2, 0)

    def g(a, b, c, d, x, y):
        a = a + b + x
        d = _ror(d ^ a, 16)
        c = c + d
        b = _ror(b ^ c, 12)
        a = a + b + y
        d = _ror(d ^ a, 8)
        c = c + d
        b = _ror(b ^ c, 7)
        return a, b, c, d

    def round_fn(r, vt):
        # pure tuple carry — no scatter ops (cheap to trace/compile)
        v = list(vt)
        ms = mperm[r]
        mw = [ms[..., i] for i in range(16)]
        v[0], v[4], v[8], v[12] = g(v[0], v[4], v[8], v[12], mw[0], mw[1])
        v[1], v[5], v[9], v[13] = g(v[1], v[5], v[9], v[13], mw[2], mw[3])
        v[2], v[6], v[10], v[14] = g(v[2], v[6], v[10], v[14], mw[4],
                                     mw[5])
        v[3], v[7], v[11], v[15] = g(v[3], v[7], v[11], v[15], mw[6],
                                     mw[7])
        v[0], v[5], v[10], v[15] = g(v[0], v[5], v[10], v[15], mw[8],
                                     mw[9])
        v[1], v[6], v[11], v[12] = g(v[1], v[6], v[11], v[12], mw[10],
                                     mw[11])
        v[2], v[7], v[8], v[13] = g(v[2], v[7], v[8], v[13], mw[12],
                                    mw[13])
        v[3], v[4], v[9], v[14] = g(v[3], v[4], v[9], v[14], mw[14],
                                    mw[15])
        return tuple(v)

    import jax
    # round 0 unrolled: under shard_map the carry must already be
    # "varying" over the mesh axis (it mixes the sharded message)
    vt = round_fn(0, tuple(v))
    vt = jax.lax.fori_loop(1, 10, round_fn, vt)
    out = [h[..., i] ^ vt[i] ^ vt[i + 8] for i in range(8)]
    return jnp.stack(out, axis=-1)


def batch_blake2s_words(msgs):
    """Blake2s-256 of B equal-length word-aligned messages.

    msgs: (..., W) uint32 — each row is a message of exactly 4*W bytes,
    little-endian words (Blake2s native order). Returns (..., 8) uint32
    digests. W is static; all messages in a batch share it.

    Runs as a stored AOT program (one per input shape) unless called
    under an outer trace (the Merkle climbs inline it).
    """
    from ..utils.progstore import aot_call
    return aot_call("blake2s.batch_words", _batch_blake2s_words, msgs)


def _batch_blake2s_words(msgs):
    msgs = jnp.asarray(msgs, jnp.uint32)
    w = msgs.shape[-1]
    nbytes = 4 * w
    nblocks = max(1, -(-w // 16))
    pad = nblocks * 16 - w
    if pad:
        msgs = jnp.concatenate(
            [msgs, jnp.zeros(msgs.shape[:-1] + (pad,), jnp.uint32)], axis=-1)

    h = jnp.broadcast_to(jnp.asarray(initial_state()),
                         msgs.shape[:-1] + (8,))
    for i in range(nblocks):
        block = msgs[..., 16 * i:16 * (i + 1)]
        is_last = i == nblocks - 1
        t = nbytes if is_last else 64 * (i + 1)
        h = batch_compress(h, block, t, is_last)
    return h


# ---------------------------------------------------------------------------
# Host-side batch kernel (numpy) — the verifier's hashing workhorse
# ---------------------------------------------------------------------------

def np_batch_compress(h, m, t: int, last: bool) -> np.ndarray:
    """Numpy mirror of :func:`batch_compress`: h (B, 8) uint32 states,
    m (B, 16) uint32 blocks, t = byte counter after this block.
    Vectorizes over the batch axis — the host verifier hashes whole
    Merkle layers / PoW nonce ranges in one call instead of one
    ``hashlib`` call per message."""
    h = np.asarray(h, np.uint32)
    m = np.ascontiguousarray(m, np.uint32)
    B = h.shape[0]
    v = np.empty((B, 16), np.uint32)
    v[:, :8] = h
    v[:, 8:] = _IV
    v[:, 12] ^= np.uint32(t & 0xFFFFFFFF)
    v[:, 13] ^= np.uint32((t >> 32) & 0xFFFFFFFF)
    if last:
        v[:, 14] ^= np.uint32(0xFFFFFFFF)

    def ror(x, n):
        return (x >> np.uint32(n)) | (x << np.uint32(32 - n))

    def g(a, b, c, d, x, y):
        a = a + b + x
        d = ror(d ^ a, 16)
        c = c + d
        b = ror(b ^ c, 12)
        a = a + b + y
        d = ror(d ^ a, 8)
        c = c + d
        b = ror(b ^ c, 7)
        return a, b, c, d

    cols = [v[:, i] for i in range(16)]
    for r in range(10):
        s = _SIGMA[r]
        mw = [m[:, s[i]] for i in range(16)]
        cols[0], cols[4], cols[8], cols[12] = g(
            cols[0], cols[4], cols[8], cols[12], mw[0], mw[1])
        cols[1], cols[5], cols[9], cols[13] = g(
            cols[1], cols[5], cols[9], cols[13], mw[2], mw[3])
        cols[2], cols[6], cols[10], cols[14] = g(
            cols[2], cols[6], cols[10], cols[14], mw[4], mw[5])
        cols[3], cols[7], cols[11], cols[15] = g(
            cols[3], cols[7], cols[11], cols[15], mw[6], mw[7])
        cols[0], cols[5], cols[10], cols[15] = g(
            cols[0], cols[5], cols[10], cols[15], mw[8], mw[9])
        cols[1], cols[6], cols[11], cols[12] = g(
            cols[1], cols[6], cols[11], cols[12], mw[10], mw[11])
        cols[2], cols[7], cols[8], cols[13] = g(
            cols[2], cols[7], cols[8], cols[13], mw[12], mw[13])
        cols[3], cols[4], cols[9], cols[14] = g(
            cols[3], cols[4], cols[9], cols[14], mw[14], mw[15])
    out = np.empty((B, 8), np.uint32)
    for i in range(8):
        out[:, i] = h[:, i] ^ cols[i] ^ cols[i + 8]
    return out


def np_batch_blake2s_words(msgs: np.ndarray) -> np.ndarray:
    """Blake2s-256 of B equal-length word-aligned messages, host numpy.
    msgs: (B, W) uint32; returns (B, 8) uint32 digests. Value-identical
    to :func:`batch_blake2s_words` / ``hashlib.blake2s``."""
    msgs = np.ascontiguousarray(msgs, np.uint32)
    B, w = msgs.shape
    nbytes = 4 * w
    nblocks = max(1, -(-w // 16))
    pad = nblocks * 16 - w
    if pad:
        msgs = np.concatenate(
            [msgs, np.zeros((B, pad), np.uint32)], axis=1)
    h = np.broadcast_to(initial_state(), (B, 8)).copy()
    for i in range(nblocks):
        is_last = i == nblocks - 1
        t = nbytes if is_last else 64 * (i + 1)
        h = np_batch_compress(h, msgs[:, 16 * i:16 * (i + 1)], t, is_last)
    return h


# ---------------------------------------------------------------------------
# Host-side helpers (numpy / hashlib)
# ---------------------------------------------------------------------------

def hash_bytes(data: bytes) -> bytes:
    """Scalar Blake2s-256 (host). Golden source for the batch kernel."""
    import hashlib
    return hashlib.blake2s(data).digest()


def words_to_bytes(words) -> bytes:
    return np.asarray(words, dtype="<u4").tobytes()


def bytes_to_words(b: bytes) -> np.ndarray:
    return np.frombuffer(b, dtype="<u4").astype(np.uint32)
