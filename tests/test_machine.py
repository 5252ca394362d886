"""Machine AIR tests.

Follows the reference's chip-test strategy
(`/root/reference/prover/src/chips/instructions/i/add.rs:214-248`):
synthetic programs -> trace -> constraint-satisfaction assertion
(fast, no FRI), plus one full prove/verify round-trip and negative
(soundness) cases.
"""

import numpy as np
import pytest

from nexus_zkvm_tpu.air.testing import assert_constraints, \
    ConstraintViolation
from nexus_zkvm_tpu.machine.driver import (
    build_machine_traces, prove_machine, verify_machine,
)
from nexus_zkvm_tpu.machine.cpu import CPU_SCHEMA
from nexus_zkvm_tpu.prover import PcsConfig
from nexus_zkvm_tpu.ops.fri import FriConfig
from nexus_zkvm_tpu.vm import asm, k_trace

CFG = PcsConfig(pow_bits=2, fri=FriConfig(log_blowup=1, log_last_layer=0,
                                          n_queries=8))

EXIT = """
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
"""


machine_traces = build_machine_traces


def check(src, **kw):
    view, trace = k_trace(asm.assemble(src), **kw)
    # a COMMON cpu log size across the per-instruction tests lets every
    # test in this process reuse the first one's compiled eval graphs
    # (shapes are part of the jit cache key) — cuts the file's wall
    # clock by the per-test XLA compile
    comps, log_sizes, traces = machine_traces(view, trace,
                                              min_cpu_log=7)
    assert_constraints(comps, log_sizes, traces)
    return view, trace


# ---------------------------------------------------------------------------
# per-instruction-class constraint satisfaction
# ---------------------------------------------------------------------------

def test_alu_r_constraints():
    check("""
        li t0, 0x12345678
        li t1, 0xfedcba98
        add t2, t0, t1
        sub t3, t0, t1
        and t4, t0, t1
        or  t5, t0, t1
        xor t6, t0, t1
        add s2, t1, t1
        sub s3, t1, t0
    """ + EXIT)


def test_alu_imm_constraints():
    check("""
        li t0, 1000
        addi t1, t0, -999
        addi t2, t0, 2047
        andi t3, t0, 0xff
        ori  t4, t0, 0x0f
        xori t5, t0, -1
        slti t6, t0, 1001
        sltiu s2, t0, 999
    """ + EXIT)


def test_slt_matrix_constraints():
    check("""
        li t0, -5
        li t1, 5
        slt  t2, t0, t1
        slt  t3, t1, t0
        sltu t4, t0, t1
        sltu t5, t1, t0
        slt  t6, t0, t0
        sltu s2, t1, t1
    """ + EXIT)


def test_shift_constraints():
    check("""
        li t0, 0x80c01234
        sll t1, t0, zero
        slli t2, t0, 1
        slli t3, t0, 31
        srli t4, t0, 1
        srli t5, t0, 31
        srai t6, t0, 4
        srai s2, t0, 31
        li  t1, 13
        sll s3, t0, t1
        srl s4, t0, t1
        sra s5, t0, t1
        slli s6, t0, 8
        srli s7, t0, 16
        srai s8, t0, 24
    """ + EXIT)


def test_branch_constraints():
    check("""
        li t0, -3
        li t1, 7
        beq t0, t0, l1
        nop
    l1: bne t0, t1, l2
        nop
    l2: blt t0, t1, l3
        nop
    l3: bge t1, t0, l4
        nop
    l4: bltu t1, t0, l5     # not taken (unsigned -3 is big)
        bgeu t0, t1, l5
        nop
    l5:
    """ + EXIT)


def test_jump_constraints():
    check("""
        jal ra, f
        j   done
    f:  ret
    done:
    """ + EXIT)


def test_lui_auipc_constraints():
    check("""
        lui t0, 0xabcde
        auipc t1, 0x1
        auipc t2, 0xfffff
    """ + EXIT)


def test_memory_constraints():
    check("""
        addi a7, zero, 0x403    # heap pointer
        ecall
        mv   t1, a0
        li   t2, 0x818283f4
        sw   t2, 0(t1)
        lb   t3, 3(t1)          # sign-extended 0x81... top byte
        lbu  t4, 1(t1)
        lh   t5, 2(t1)
        lhu  t6, 0(t1)
        sb   t2, 5(t1)
        sh   t2, 6(t1)
        lw   s2, 4(t1)
        lw   s3, 0x80(zero)     # read the input sentinel (RO region)
    """ + EXIT)


def test_syscall_constraints():
    view, _ = check("""
        addi a7, zero, 0x400    # private input
        ecall
        mv t0, a0
        addi a7, zero, 0x402    # stack pointer
        ecall
        addi a7, zero, 0x403    # heap pointer
        ecall
        addi a7, zero, 0x405    # memory advise
        ecall
    """ + EXIT, private_input=bytes([9]))
    assert view.exit_code == 0


def test_output_and_exit_code():
    view, _ = check("""
        lw   t0, 0x84(zero)
        li   t1, 0xcafef00d
        sw   t1, 0(t0)
        sw   t1, 4(t0)
        addi a0, zero, 3
        addi a7, zero, 0x201
        ecall
    """)
    assert view.exit_code == 3


def test_mul_constraints():
    check("""
        li t0, 0x12345678
        li t1, 0xfedcba98
        mul    t2, t0, t1
        mulh   t3, t0, t1
        mulhsu t4, t0, t1
        mulhu  t5, t0, t1
        mulh   t6, t1, t1
        mul    s2, t1, t1
    """ + EXIT)


def test_div_constraints():
    check("""
        li t0, 100
        li t1, 7
        divu t2, t0, t1
        remu t3, t0, t1
        li t4, -100
        div  t5, t4, t1
        rem  t6, t4, t1
        li t1, -7
        div  s2, t0, t1
        rem  s3, t0, t1
        div  s4, t4, t1
        rem  s5, t4, t1
    """ + EXIT)


def test_div_edge_cases_constraints():
    check("""
        li t0, 100
        div  t1, t0, zero       # div by zero -> -1
        rem  t2, t0, zero       # -> t0
        divu t3, t0, zero
        remu t4, t0, zero
        li t5, 0x80000000       # -2^31
        li t6, -1
        div  s2, t5, t6         # overflow -> -2^31
        rem  s3, t5, t6         # -> 0
    """ + EXIT)


def test_fib_constraints():
    check("""
        addi t0, zero, 12
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
    """ + EXIT)


def test_keccak_constraints():
    """keccakf custom instruction: permutation circuit + RAM binding."""
    view, trace = k_trace(asm.assemble("""
        addi a7, zero, 0x403    # heap pointer
        ecall
        mv   t1, a0
        li   t2, 0xdeadbeef     # seed a couple of state words
        sw   t2, 0(t1)
        sw   t2, 196(t1)
        keccakf x0, t1, x0
        lw   t3, 0(t1)          # read a permuted word back
        keccakf x0, t1, x0      # permute twice
    """ + EXIT))
    assert len(trace.machine_state["keccak_log"]) == 2
    # KAT: zero-seeded lanes move
    first = trace.machine_state["keccak_log"][0]
    assert first["in_words"][0] == 0xdeadbeef
    assert first["out_words"][0] != 0xdeadbeef
    comps, log_sizes, traces = machine_traces(view, trace)
    assert_constraints(comps, log_sizes, traces)


def test_segmented_constraints():
    """Multi-segment execution: chains connect across CPU components."""
    view, trace = k_trace(asm.assemble("""
        addi t0, zero, 40
    loop:
        addi t0, t0, -1
        bne  t0, zero, loop
        lw   t1, 0x84(zero)
        sw   t0, 0(t1)
    """ + EXIT))
    comps, log_sizes, traces = build_machine_traces(view, trace,
                                                    segment_log=4)
    assert sum(1 for c in comps if c.name.startswith("cpu")) > 2
    assert_constraints(comps, log_sizes, traces)


# ---------------------------------------------------------------------------
# tampering is caught by the constraint harness
# ---------------------------------------------------------------------------

def _tamper(name, delta=1, idx=0):
    view, trace = k_trace(asm.assemble("""
        li t0, 41
        addi t1, t0, 1
        lw   t2, 0x84(zero)
        sw   t1, 0(t2)
    """ + EXIT))
    comps, log_sizes, traces = machine_traces(view, trace)
    col = CPU_SCHEMA.slot(name, idx)
    traces[0][col] = traces[0][col].copy()
    traces[0][col][0] = (int(traces[0][col][0]) + delta) % ((1 << 31) - 1)
    with pytest.raises(ConstraintViolation):
        assert_constraints(comps, log_sizes, traces)


def test_tampered_result_caught():
    _tamper("a", idx=0)


def test_tampered_pc_caught():
    _tamper("npc", idx=0)


def test_tampered_flag_caught():
    _tamper("f", idx=0)


# ---------------------------------------------------------------------------
# full STARK round-trip
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_prove_verify_machine():
    view, trace = k_trace(asm.assemble("""
        addi t0, zero, 10
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
    """ + EXIT))
    proof = prove_machine(view, trace, CFG)
    assert verify_machine(view, proof, CFG)

    # a proof for one claim must not verify another
    view2, trace2 = k_trace(asm.assemble("""
        addi t0, zero, 3
        lw   t1, 0x84(zero)
        sw   t0, 0(t1)
    """ + EXIT))
    assert not verify_machine(view2, proof, CFG)

    # tampered exit code in the claim
    import copy
    bad_view = copy.deepcopy(view)
    bad_view.exit_code = 1
    assert not verify_machine(bad_view, proof, CFG)


@pytest.mark.slow
def test_prove_verify_keccak():
    view, trace = k_trace(asm.assemble("""
        addi a7, zero, 0x403
        ecall
        mv   t1, a0
        li   t2, 0x12345678
        sw   t2, 4(t1)
        keccakf x0, t1, x0
        lw   t3, 8(t1)
        lw   t4, 0x84(zero)
        sw   t3, 0(t4)
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """))
    proof = prove_machine(view, trace, CFG)
    assert verify_machine(view, proof, CFG)


_STREAMED_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))) if "__file__" in dir() else None
import numpy as np
from nexus_zkvm_tpu.machine.driver import prove_machine, verify_machine
from nexus_zkvm_tpu.prover import PcsConfig
from nexus_zkvm_tpu.ops.fri import FriConfig
from nexus_zkvm_tpu.vm import asm, k_trace

CFG = PcsConfig(pow_bits=2, fri=FriConfig(log_blowup=1,
                                          log_last_layer=0,
                                          n_queries=8))
view, trace = k_trace(asm.assemble(SRC))
p_batch = prove_machine(view, trace, CFG, segment_log=5)
p_stream = prove_machine(view, trace, CFG, segment_log=5, stream=True)

def eq(a, b):
    if isinstance(a, dict):
        return set(a) == set(b) and all(eq(a[k], b[k]) for k in a)
    if isinstance(a, (list, tuple)):
        return len(a) == len(b) and all(eq(u, v) for u, v in zip(a, b))
    if hasattr(a, "__dict__"):
        return eq(vars(a), vars(b))
    if hasattr(a, "shape"):
        return np.array_equal(np.asarray(a), np.asarray(b))
    return a == b

assert eq(p_batch.stark, p_stream.stark), "streamed proof differs"
assert verify_machine(view, p_stream, CFG)
print("STREAMED_OK")
"""


@pytest.mark.slow
def test_prove_verify_segmented_streamed():
    """Streamed segment shipping changes placement, not the proof:
    bit-identical transcript to the host-batched path, verifier
    unchanged.

    Runs in a fresh subprocess: XLA:CPU nondeterministically segfaults
    compiling this flow's larger programs mid-suite (jaxlib bug —
    crashes inside backend_compile/cache serialize); a clean process
    compiles the identical graphs reliably."""
    import subprocess
    import sys
    src = """
        addi t0, zero, 60
    loop:
        addi t0, t0, -1
        bne  t0, zero, loop
        lw   t1, 0x84(zero)
        sw   t0, 0(t1)
    """ + EXIT
    import os
    code = "SRC = " + repr(src) + "\n" + _STREAMED_CHILD
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=1500,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))), env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "STREAMED_OK" in r.stdout


_SPLIT_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["NZT_COMP_SPLIT_EV"] = "7"
os.environ["NZT_COMP_CHUNK_LOG"] = "4"
os.environ["NZT_COMP_NAT_BUDGET"] = str(1 << 14)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)
from nexus_zkvm_tpu.machine.driver import prove_machine, verify_machine
from nexus_zkvm_tpu.prover import PcsConfig
from nexus_zkvm_tpu.ops.fri import FriConfig
from nexus_zkvm_tpu.vm import asm, k_trace

CFG = PcsConfig(pow_bits=2, fri=FriConfig(log_blowup=1,
                                          log_last_layer=0,
                                          n_queries=8))
view, trace = k_trace(asm.assemble(SRC))
proof = prove_machine(view, trace, CFG)
del os.environ["NZT_COMP_SPLIT_EV"]
assert verify_machine(view, proof, CFG)
print("SPLIT_OK")
"""


@pytest.mark.slow
def test_prove_verify_split_composition():
    """The memory-bounded composition path (per-component dispatch +
    multi-pass natural LDE + scanned chunks) produces a proof the
    standard verifier accepts — identical transcript semantics.

    Subprocess-isolated for the same jaxlib mid-process compile
    fragility as the streamed test above."""
    import os
    import subprocess
    import sys
    src = """
        addi t0, zero, 50
    loop:
        addi t0, t0, -1
        bne  t0, zero, loop
        lw   t1, 0x84(zero)
        sw   t0, 0(t1)
    """ + EXIT
    code = "SRC = " + repr(src) + "\n" + _SPLIT_CHILD
    env = dict(os.environ)
    env.pop("PYTEST_CURRENT_TEST", None)
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True, timeout=1500,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))), env=env)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "SPLIT_OK" in r.stdout


def test_dev_fill_parity():
    """`fill_cpu_dev` (device fill + histogram emits) matches the
    host-numpy `fill_cpu` + `count_multiplicity` bit for bit on a
    mixed-opcode workload (ALU, shifts, bitops, loads/stores,
    branches, syscalls)."""
    from nexus_zkvm_tpu.machine.fill_dev import fill_cpu_dev
    from nexus_zkvm_tpu.machine.cpu import fill_cpu
    from nexus_zkvm_tpu.machine.driver import build_components, _clog2
    from nexus_zkvm_tpu.machine.tables import count_multiplicity, _Table
    src = """
        li   t0, 23
        li   t1, 0x12345678
        addi a7, zero, 0x403     # heap pointer -> a0
        ecall
        mv   s2, a0
    loop:
        add  t2, t0, t1
        sub  t3, t1, t0
        xor  t4, t2, t3
        and  t5, t2, t3
        or   t6, t2, t3
        sll  s3, t1, t0
        srl  s4, t1, t0
        sra  s5, t1, t0
        slt  s6, t0, t1
        sltu s7, t1, t0
        sw   t2, 0(s2)
        lw   s8, 0(s2)
        sb   t3, 1(s2)
        lb   s9, 1(s2)
        lh   s10, 2(s2)
        lui  s11, 0xABCDE
        auipc a2, 4
        addi t0, t0, -1
        bne  t0, zero, loop
        jal  ra, next
    next:
        lw   t1, 0x84(zero)
        sw   t0, 0(t1)
    """ + EXIT
    view, trace = k_trace(asm.assemble(src))
    comps, fixed, (lo, hi) = build_components(view, 1)
    log = _clog2(len(trace.steps["clk"]), lo=4)
    f, emits = fill_cpu(trace, view, log, lo, hi)
    host_mat = np.stack(CPU_SCHEMA.to_columns(f))
    mat, counts = fill_cpu_dev(trace, view, log, lo, hi)
    assert np.array_equal(np.asarray(mat), host_mat)
    for comp in comps:
        if not isinstance(comp, _Table):
            continue
        idx = emits.get(comp.relation, np.zeros(0, np.int64))
        want = count_multiplicity(comp, idx, fixed[comp.name])
        got = np.zeros_like(want)
        v = np.asarray(counts[comp.relation], np.uint32)
        got[: len(v)] += v
        assert np.array_equal(got, want), comp.relation
