"""Typed guest IO matrix: u32/u64/u128/struct round trips through real
guests (reference analogue: `tests/integration-tests/io_u*.rs` over
`runtime/src/io.rs:14-70`)."""

import os

import numpy as np
import pytest

from nexus_zkvm_tpu.sdk import (Guest, encode_u32s, decode_u32s)
from nexus_zkvm_tpu.sdk.io import (encode_u64s, decode_u64s,
                                   encode_u128s, decode_u128s,
                                   encode_struct, decode_struct)
from nexus_zkvm_tpu.vm import k_trace

GUESTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "guests")


def run(name, public_input=b""):
    g = Guest.from_asm(open(os.path.join(GUESTS, name)).read())
    return k_trace(g.program_words, entry=g.entry,
                   public_input=public_input, backend="auto")


def test_u64_codec():
    vals = [0, 1, 2**32, 2**64 - 1, 0x1234_5678_9ABC_DEF0]
    assert decode_u64s(encode_u64s(*vals)) == vals
    # lo word first on the tape
    assert decode_u32s(encode_u64s(2**32 + 5), 2) == [5, 1]


def test_u128_codec():
    vals = [0, 1, 2**64, 2**128 - 1, 0xDEAD_BEEF << 96 | 7]
    assert decode_u128s(encode_u128s(*vals)) == vals


def test_struct_codec():
    fmt = "IQB3s"
    vals = [7, 2**40 + 1, 250, b"abc"]
    data = encode_struct(fmt, *vals)
    assert len(data) % 4 == 0
    assert decode_struct(fmt, data) == vals


def test_guest_u64_add():
    x, y = 0xFFFF_FFFF_0000_0001, 0x0000_0001_FFFF_FFFF
    view, _ = run("io_u64_add.s", encode_u64s(x, y))
    assert view.exit_code == 0
    got = decode_u64s(view.public_output, 1)[0]
    assert got == (x + y) & (2**64 - 1)


def test_guest_u128_echo():
    v = 0x0123_4567_89AB_CDEF_FEDC_BA98_7654_3210
    view, _ = run("io_echo.s", encode_u128s(v))
    assert view.exit_code == 0
    assert decode_u128s(view.public_output, 1)[0] == v


def test_guest_struct_echo():
    fmt = "IQI"
    vals = [3, 2**50 + 9, 0xAABBCCDD]
    view, _ = run("io_echo.s", encode_struct(fmt, *vals))
    assert view.exit_code == 0
    assert decode_struct(fmt, view.public_output) == vals


@pytest.mark.slow
def test_prove_u64_roundtrip():
    from nexus_zkvm_tpu.machine import prove_machine, verify_machine
    x, y = 2**63 + 12345, 2**63 + 67890       # exercises the carry
    view, trace = run("io_u64_add.s", encode_u64s(x, y))
    got = decode_u64s(view.public_output, 1)[0]
    assert got == (x + y) & (2**64 - 1)
    proof = prove_machine(view, trace)
    assert verify_machine(view, proof)
