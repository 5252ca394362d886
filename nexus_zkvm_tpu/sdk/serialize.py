"""Proof (de)serialization: a compact explicit binary codec.

Counterpart of the reference's serde/postcard proof round-trip
(`/root/reference/prover/src/machine.rs:93-98`, exercised by
`test_serialize_proofs`, `tests/testing-framework/src/lib.rs:721`).
Explicit field walking (no pickle) so the format is stable and safe to
deserialize from untrusted sources.
"""

from __future__ import annotations

import io
import struct

import numpy as np

from ..machine import MachineProof
from ..ops import fri, merkle
from ..prover.stark import Proof, ROLE_ORDER

__all__ = ["proof_to_bytes", "proof_from_bytes"]

_MAGIC = b"NZTP"
_VERSION = 1


def _w_u32(b, v):
    b.write(struct.pack("<I", int(v)))


def _w_u64(b, v):
    b.write(struct.pack("<Q", int(v)))


def _w_arr(b, a, dtype):
    a = np.ascontiguousarray(np.asarray(a, dtype))
    _w_u32(b, a.ndim)
    for d in a.shape:
        _w_u32(b, d)
    b.write(a.tobytes())


def _r_u32(b):
    return struct.unpack("<I", b.read(4))[0]


def _r_u64(b):
    return struct.unpack("<Q", b.read(8))[0]


def _r_arr(b, dtype):
    nd = _r_u32(b)
    shape = tuple(_r_u32(b) for _ in range(nd))
    n = int(np.prod(shape)) if shape else 1
    itemsize = np.dtype(dtype).itemsize
    data = b.read(n * itemsize)
    return np.frombuffer(data, dtype).reshape(shape).copy()


def _w_dec(b, d: merkle.MerkleDecommitment):
    _w_u32(b, len(d.column_values))
    for v in d.column_values:
        _w_arr(b, v, "<u4")
    _w_u32(b, len(d.sibling_hashes))
    for h in d.sibling_hashes:
        _w_arr(b, h, "<u4")


def _r_dec(b) -> merkle.MerkleDecommitment:
    cols = [_r_arr(b, "<u4") for _ in range(_r_u32(b))]
    sibs = [_r_arr(b, "<u4") for _ in range(_r_u32(b))]
    return merkle.MerkleDecommitment(column_values=cols,
                                     sibling_hashes=sibs)


def proof_to_bytes(proof: MachineProof) -> bytes:
    p = proof.stark
    b = io.BytesIO()
    b.write(_MAGIC)
    _w_u32(b, _VERSION)
    _w_u32(b, len(p.log_sizes))
    for s in p.log_sizes:
        _w_u32(b, s)
    for role in ROLE_ORDER:
        entries = p.roots.get(role, [])
        _w_u32(b, len(entries))
        for s, root in entries:
            _w_u32(b, s)
            _w_arr(b, root, "<u4")
    _w_u32(b, len(p.claimed_sums))
    for cs in p.claimed_sums:
        _w_arr(b, cs, "<u8")
    _w_u32(b, len(p.sampled))
    for s in p.sampled:
        _w_arr(b, s, "<u8")
    fp = p.fri_proof
    _w_u32(b, len(fp.inner_roots))
    for r in fp.inner_roots:
        _w_arr(b, r, "<u4")
    _w_u32(b, len(fp.inner_decommitments))
    for d in fp.inner_decommitments:
        _w_dec(b, d)
    _w_arr(b, fp.last_layer, "<u4")
    _w_u64(b, p.pow_nonce)
    for role in ROLE_ORDER:
        entries = p.openings.get(role, [])
        _w_u32(b, len(entries))
        for s, d in entries:
            _w_u32(b, s)
            _w_dec(b, d)
    return b.getvalue()


def proof_from_bytes(data: bytes) -> MachineProof:
    b = io.BytesIO(data)
    if b.read(4) != _MAGIC:
        raise ValueError("not a proof blob")
    if _r_u32(b) != _VERSION:
        raise ValueError("unsupported proof version")
    log_sizes = [_r_u32(b) for _ in range(_r_u32(b))]
    roots = {}
    for role in ROLE_ORDER:
        roots[role] = [(_r_u32(b), _r_arr(b, "<u4"))
                       for _ in range(_r_u32(b))]
    claimed = [_r_arr(b, "<u8") for _ in range(_r_u32(b))]
    sampled = [_r_arr(b, "<u8") for _ in range(_r_u32(b))]
    inner_roots = [_r_arr(b, "<u4") for _ in range(_r_u32(b))]
    inner_decs = [_r_dec(b) for _ in range(_r_u32(b))]
    last_layer = _r_arr(b, "<u4")
    fp = fri.FriProof(inner_roots=inner_roots,
                      inner_decommitments=inner_decs,
                      last_layer=last_layer)
    pow_nonce = _r_u64(b)
    openings = {}
    for role in ROLE_ORDER:
        openings[role] = [(_r_u32(b), _r_dec(b))
                          for _ in range(_r_u32(b))]
    return MachineProof(stark=Proof(
        log_sizes=log_sizes, roots=roots, claimed_sums=claimed,
        sampled=sampled, fri_proof=fp, pow_nonce=pow_nonce,
        openings=openings))
