"""Typed guest IO helpers.

Counterpart of the reference's postcard/COBS input encoding
(`/root/reference/sdk/src/stwo/seq.rs:127-130`, guest-side typed reads
at `runtime/src/io.rs:14-70`): values are framed as little-endian u32
words; the VM exposes the tape to the guest length-prefixed at the
public-input sentinel (`vm/memory.py`).
"""

from __future__ import annotations

import struct

__all__ = ["encode_u32s", "decode_u32s", "encode_bytes", "decode_output"]


def encode_u32s(*values) -> bytes:
    return b"".join(struct.pack("<I", int(v) & 0xFFFFFFFF)
                    for v in values)


def decode_u32s(data: bytes, n: int | None = None):
    count = len(data) // 4 if n is None else n
    return list(struct.unpack(f"<{count}I", data[:4 * count]))


def encode_bytes(data: bytes) -> bytes:
    return bytes(data)


def decode_output(view, n_words: int | None = None):
    """Decode the guest's public output as u32 words."""
    return decode_u32s(view.public_output, n_words)
