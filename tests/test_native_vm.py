"""Native (C) emulator parity: bit-identical traces vs the Python
reference implementation under the same memory layout."""

import numpy as np
import pytest

from nexus_zkvm_tpu.vm import asm, k_trace
from nexus_zkvm_tpu.vm.emulator import LinearEmulator, VMExited
from nexus_zkvm_tpu.vm.memory import LinearMemoryLayout
from nexus_zkvm_tpu.vm.native_trace import (k_trace_native,
                                            native_available)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="no C toolchain")

PROGRAMS = {
    "fib": """
        addi t0, zero, 15
        addi a0, zero, 0
        addi a1, zero, 1
    loop:
        add  a2, a0, a1
        mv   a0, a1
        mv   a1, a2
        addi t0, t0, -1
        bne  t0, zero, loop
        lw   t1, 0x84(zero)
        sw   a0, 0(t1)
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """,
    "alu_mix": """
        li t0, 0x81c3f5a7
        li t1, 13
        sll t2, t0, t1
        srl t3, t0, t1
        sra t4, t0, t1
        and t5, t0, t1
        or  t6, t0, t1
        xor s2, t0, t1
        mul s3, t0, t1
        mulh s4, t0, t1
        div s5, t0, t1
        rem s6, t0, t1
        slt s7, t0, t1
        sltu s8, t0, t1
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """,
    "memory": """
        addi a7, zero, 0x403
        ecall
        mv   t1, a0
        li   t2, 0x818283f4
        sw   t2, 0(t1)
        lb   t3, 3(t1)
        lbu  t4, 1(t1)
        lh   t5, 2(t1)
        sh   t2, 6(t1)
        sb   t2, 9(t1)
        lw   s2, 4(t1)
        lw   s3, 8(t1)
        lw   s4, 0x80(zero)
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """,
    "syscalls_io": """
        lw   t0, 0x80(zero)
        lw   t1, 4(t0)
        addi a7, zero, 0x400
        ecall
        add  t1, t1, a0
        addi a7, zero, 0x402
        ecall
        addi a7, zero, 0x405
        ecall
        lw   t2, 0x84(zero)
        sw   t1, 0(t2)
        lw   a1, 0x84(zero)
        addi a0, zero, 1
        addi a2, zero, 4
        addi a7, zero, 0x200
        ecall
        addi a0, zero, 5
        addi a7, zero, 0x201
        ecall
    """,
}


def _python_trace_with_layout(words, layout, **kw):
    lin = LinearEmulator(layout, words, 0x88,
                         public_input=kw.get("public_input", b""),
                         private_input=kw.get("private_input", b""))
    try:
        lin.execute(None)
    except VMExited:
        pass
    from nexus_zkvm_tpu.vm.trace import Trace
    return lin.finalize(), Trace(steps=lin.recorder.arrays(),
                                 machine_state=lin.machine_state())


@pytest.mark.parametrize("name", sorted(PROGRAMS))
def test_trace_parity(name):
    kw = {}
    if name == "syscalls_io":
        kw = {"public_input": (7).to_bytes(4, "little"),
              "private_input": bytes([3])}
    words = asm.assemble(PROGRAMS[name])
    prog_size = ((4 * len(words) + 0x1000) + 3) & ~3
    layout = LinearMemoryLayout.new(
        max_heap_size=0x1_0000, max_stack_size=0x10_0000,
        public_input_size=len(kw.get("public_input", b"")),
        public_output_size=0x200, program_size=prog_size)

    view_p, trace_p = _python_trace_with_layout(words, layout, **kw)
    view_n, trace_n = k_trace_native(words, layout=layout, **kw)

    assert view_n.exit_code == view_p.exit_code
    assert view_n.public_output == view_p.public_output
    assert view_n.debug_logs == view_p.debug_logs
    assert trace_n.n_steps == trace_p.n_steps
    for field in trace_p.steps:
        assert np.array_equal(trace_n.steps[field],
                              trace_p.steps[field]), field
    ms_p, ms_n = trace_p.machine_state, trace_n.machine_state
    assert np.array_equal(ms_p["final_regs"], ms_n["final_regs"])
    assert np.array_equal(ms_p["final_reg_ts"], ms_n["final_reg_ts"])
    assert ms_p["ram_final"] == ms_n["ram_final"]


def test_native_full_pipeline():
    """Native k_trace with its own discovery pass yields a consistent
    View and a provable-shape trace."""
    words = asm.assemble(PROGRAMS["fib"])
    view, trace = k_trace_native(words)
    assert view.exit_code == 0
    assert int.from_bytes(view.public_output[:4], "little") == 610
    assert trace.n_steps > 70


def test_native_throughput_sanity():
    """The C loop should run at millions of steps/sec."""
    import time
    words = asm.assemble("""
        li t0, 2000000
    loop:
        addi t0, t0, -1
        bne  t0, zero, loop
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """)
    t0 = time.time()
    view, trace = k_trace_native(words)
    dt = time.time() - t0
    assert trace.n_steps > 4_000_000
    assert trace.n_steps / dt > 2_000_000, f"only {trace.n_steps/dt:.0f}/s"


def test_native_keccak_state_log_parity():
    """The C core records keccak state logs (clk/addr/in/out/prev_ts)
    bit-identical to the Python emulator, so keccak workloads no longer
    fall back to the slow path."""
    import numpy as np
    from nexus_zkvm_tpu.vm import asm, k_trace
    src = """
        addi a7, zero, 0x403
        ecall
        addi t0, a0, 0
        addi t1, zero, 7
        sw   t1, 0(t0)
        keccakf x0, t0, x0
        keccakf x0, t0, x0
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """
    words = asm.assemble(src)
    vp, tp = k_trace(words, backend="python")
    vn, tn = k_trace(words, backend="native")
    for k in tp.steps:
        assert np.array_equal(tp.steps[k], tn.steps[k]), k
    kp = tp.machine_state["keccak_log"]
    kn = tn.machine_state["keccak_log"]
    assert len(kp) == len(kn) == 2
    for a, b in zip(kp, kn):
        for f in ("clk", "addr", "in_words", "out_words", "prev_ts"):
            assert list(np.atleast_1d(a[f])) == list(np.atleast_1d(b[f]))
    assert tp.machine_state["ram_final"] == tn.machine_state["ram_final"]
