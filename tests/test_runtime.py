"""Guest runtime library tests (vm/runtime.py).

Reference behavior being matched: start code + allocator + IO of the
guest runtime crate (`/root/reference/runtime/src/runtime.rs:57-105`,
`alloc.rs:20-76`, `io.rs:14-70`) — here driven through the assembly
runtime prelude/library and the two-pass emulator.
"""

import numpy as np
import pytest

from nexus_zkvm_tpu.vm import asm, k_trace, runtime
from nexus_zkvm_tpu.sdk.io import encode_u32s, decode_output


def run(src, **kw):
    words = runtime.assemble_guest(src)
    return k_trace(words, **kw)


def test_runtime_start_and_exit_code():
    view, _ = run("""
    main:
        addi a0, zero, 7
        ret
    """)
    assert view.exit_code == 7


def test_runtime_io_and_alloc():
    view, _ = run("""
    main:
        mv   s0, ra
        addi a0, zero, 0
        call rt_input_word       # a0 = n
        mv   s1, a0
        addi a0, zero, 12
        call rt_alloc            # heap ptr
        mv   s2, a0
        sw   s1, 0(s2)           # round-trip through the heap
        lw   t0, 0(s2)
        add  a1, t0, s1          # 2n
        addi a0, zero, 0
        call rt_output_word
        mv   ra, s0
        addi a0, zero, 0
        ret
    """, public_input=encode_u32s(21))
    assert view.exit_code == 0
    assert decode_output(view, 1) == [42]


def test_runtime_alloc_is_bump_and_aligned():
    view, _ = run("""
    main:
        mv   s0, ra
        addi a0, zero, 5         # odd size: next alloc must re-align
        call rt_alloc
        mv   s1, a0
        addi a0, zero, 8
        call rt_alloc
        sub  a1, a0, s1          # distance between allocations
        addi a0, zero, 0
        call rt_output_word
        mv   ra, s0
        addi a0, zero, 0
        ret
    """)
    # 5 bytes rounds up to the next word boundary -> distance 8
    assert decode_output(view, 1) == [8]


def test_runtime_private_input():
    view, _ = run("""
    main:
        mv   s0, ra
        call rt_read_private
        mv   s1, a0
        call rt_read_private     # exhausted -> 0xFFFFFFFF
        addi t0, a0, 1           # +1 wraps to 0
        add  a1, s1, t0
        addi a0, zero, 0
        call rt_output_word
        mv   ra, s0
        addi a0, zero, 0
        ret
    """, private_input=b"\x2a")
    assert decode_output(view, 1) == [42]


def test_runtime_log():
    view, _ = run("""
    main:
        mv   s0, ra
        la   a0, msg
        addi a1, zero, 4
        call rt_log
        mv   ra, s0
        addi a0, zero, 0
        ret
    msg:
        .word 0x69682169         # bytes 69 21 68 69 -> "i!hi"
    """)
    assert view.exit_code == 0
    assert view.logs_text() == "i!hi"


def test_asm_label_after_wide_li():
    """Labels after a 2-word li must account for the expansion."""
    words = asm.assemble("""
        li   t0, 0x12345        # expands to lui+addi
        j    skip
        addi t0, t0, 1          # must be skipped
    skip:
        addi a7, zero, 0x201
        ecall
    """)
    view, _ = k_trace(words)
    assert view.exit_code == 0


def test_asm_la_and_word_directive():
    words = asm.assemble("""
        la   t0, data
        lw   t1, 0(t0)
        lw   t2, 4(t0)
        add  a0, t1, t2
        addi a7, zero, 0x201
        ecall
    data:
        .word 40, 2
    """, base=0x1000)
    from nexus_zkvm_tpu.vm.isa import ELF_TEXT_START
    view, _ = k_trace(asm.assemble("""
        la   t0, data
        lw   t1, 0(t0)
        lw   t2, 4(t0)
        add  a0, t1, t2
        addi a7, zero, 0x201
        ecall
    data:
        .word 40, 2
    """, base=ELF_TEXT_START))
    assert view.exit_code == 42


def test_runtime_prove_verify_smoke():
    """A runtime-based guest goes through the full prover."""
    from nexus_zkvm_tpu.machine import prove_machine, verify_machine
    view, trace = run("""
    main:
        mv   s0, ra
        addi a0, zero, 0
        call rt_input_word
        add  a1, a0, a0
        addi a0, zero, 0
        call rt_output_word
        mv   ra, s0
        addi a0, zero, 0
        ret
    """, public_input=encode_u32s(33))
    assert decode_output(view, 1) == [66]
    proof = prove_machine(view, trace)
    assert verify_machine(view, proof)


test_runtime_prove_verify_smoke = pytest.mark.slow(
    test_runtime_prove_verify_smoke)
