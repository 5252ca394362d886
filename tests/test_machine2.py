"""machine2 (per-instruction-family) AIR tests.

Mirrors the machine v1 test strategy (reference analogue:
`/root/reference/prover2/machine/src/components/` per-component tests +
`prove.rs:147-170` round-trip): every instruction class runs through
the family components via the constraint-satisfaction harness, then a
full prove/verify round-trip, cross-claim rejection, and tamper cases.
"""

import numpy as np
import pytest

from nexus_zkvm_tpu.air.testing import (assert_constraints,
                                        ConstraintViolation,
                                        relation_balance_report)
from nexus_zkvm_tpu.machine2 import (build_machine2_traces,
                                     prove_machine2, verify_machine2)
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


def check(src, **kw):
    view, trace = k_trace(asm.assemble(src), **kw)
    comps, log_sizes, traces = build_machine2_traces(view, trace)
    report = relation_balance_report(comps, log_sizes, traces)
    assert not report, f"unbalanced relations: {report}"
    assert_constraints(comps, log_sizes, traces)
    return view, trace


PROGRAMS = {
    "alu": """
        li t0, 0x12345678
        li t1, 0xfedcba98
        add t2, t0, t1
        sub t3, t0, t1
        addi t4, t0, -999
        addi t5, t0, 2047
        lui  t6, 0xabcde
        auipc s2, 0x1
        auipc s3, 0xfffff
    """,
    "bitwise": """
        li t0, 0x12345678
        li t1, 0xfedcba98
        and t2, t0, t1
        or  t3, t0, t1
        xor t4, t0, t1
        andi t5, t0, 0xff
        ori  t6, t0, 0x0f
        xori s2, t0, -1
    """,
    "shift": """
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
    """,
    "cmp": """
        li t0, -5
        li t1, 5
        slt  t2, t0, t1
        slt  t3, t1, t0
        sltu t4, t0, t1
        sltu t5, t1, t0
        slti t6, t0, 1001
        sltiu s2, t0, 999
        slt  s3, t0, t0
    """,
    "branch": """
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
    """,
    "jump": """
        jal ra, f
        j   done
    f:  ret
    done:
    """,
    "memory": """
        addi a7, zero, 0x403    # heap pointer
        ecall
        mv   t1, a0
        li   t2, 0x818283f4
        sw   t2, 0(t1)
        lb   t3, 3(t1)
        lbu  t4, 1(t1)
        lh   t5, 2(t1)
        lhu  t6, 0(t1)
        sb   t2, 5(t1)
        sh   t2, 6(t1)
        lw   s2, 4(t1)
        lw   s3, 0x80(zero)     # RO region read
    """,
    "mext": """
        li t0, 0x12345678
        li t1, 0xfedcba98
        mul    t2, t0, t1
        mulh   t3, t0, t1
        mulhsu t4, t0, t1
        mulhu  t5, t0, t1
        li t4, -100
        li t5, 7
        div  s2, t4, t5
        rem  s3, t4, t5
        divu s4, t0, t5
        remu s5, t0, t5
        div  s6, t0, zero       # div-by-zero edge
    """,
    "fib": """
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
    """,
}


@pytest.mark.parametrize("name", sorted(PROGRAMS))
def test_family_constraints(name):
    check(PROGRAMS[name] + EXIT)


def test_syscalls_and_output():
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
        lw   t1, 0x84(zero)
        li   t2, 0xcafef00d
        sw   t2, 0(t1)
        addi a0, zero, 3
        addi a7, zero, 0x201
        ecall
    """, private_input=bytes([9]))
    assert view.exit_code == 3


def test_keccak_dispatch():
    view, trace = k_trace(asm.assemble("""
        addi a7, zero, 0x403
        ecall
        mv   t1, a0
        li   t2, 0xdeadbeef
        sw   t2, 0(t1)
        keccakf x0, t1, x0
        lw   t3, 0(t1)
    """ + EXIT))
    assert len(trace.machine_state["keccak_log"]) == 1
    comps, log_sizes, traces = build_machine2_traces(view, trace)
    assert_constraints(comps, log_sizes, traces)


# ---------------------------------------------------------------------------
# tampering is caught
# ---------------------------------------------------------------------------

def _tampered(fam_name, col_name, idx=0, delta=1):
    from nexus_zkvm_tpu.machine2.exec_components import EXEC_FAMILIES
    view, trace = k_trace(asm.assemble(PROGRAMS["fib"] + EXIT))
    comps, log_sizes, traces = build_machine2_traces(view, trace)
    ci = [c.name for c in comps].index(fam_name)
    comp = comps[ci]
    col = comp.SCHEMA.slot(col_name, idx)
    traces[ci][col] = traces[ci][col].copy()
    traces[ci][col][0] = (int(traces[ci][col][0]) + delta) \
        % ((1 << 31) - 1)
    with pytest.raises(ConstraintViolation):
        assert_constraints(comps, log_sizes, traces)


def test_tampered_alu_result_caught():
    _tampered("ex_alu", "a", idx=0)


def test_tampered_branch_taken_caught():
    _tampered("ex_branch", "t")


def test_tampered_clk_caught():
    _tampered("ex_alu", "clk")


def test_tampered_flag_caught():
    _tampered("ex_alu", "f", idx=0)


def test_unbalanced_exec_chain_caught():
    """Dropping a step's exec emit (flipping pad on) must break the
    chain balance."""
    view, trace = k_trace(asm.assemble(PROGRAMS["fib"] + EXIT))
    comps, log_sizes, traces = build_machine2_traces(view, trace)
    ci = [c.name for c in comps].index("ex_alu")
    comp = comps[ci]
    col = comp.SCHEMA.slot("pad")
    traces[ci][col] = traces[ci][col].copy()
    traces[ci][col][0] = 1
    with pytest.raises(ConstraintViolation):
        assert_constraints(comps, log_sizes, traces)


# ---------------------------------------------------------------------------
# full STARK round-trip
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_prove_verify_machine2():
    view, trace = k_trace(asm.assemble(PROGRAMS["fib"] + EXIT))
    proof = prove_machine2(view, trace, CFG)
    assert verify_machine2(view, proof, CFG)

    # a proof for one claim must not verify another
    view2, trace2 = k_trace(asm.assemble("""
        addi t0, zero, 3
        lw   t1, 0x84(zero)
        sw   t0, 0(t1)
    """ + EXIT))
    assert not verify_machine2(view2, proof, CFG)

    import copy
    bad_view = copy.deepcopy(view)
    bad_view.exit_code = 1
    assert not verify_machine2(bad_view, proof, CFG)

    # machine v1 and machine2 proofs are not interchangeable
    from nexus_zkvm_tpu.machine import verify_machine
    assert not verify_machine(view, proof, CFG)


# ---------------------------------------------------------------------------
# machine2-specific attack surfaces
# ---------------------------------------------------------------------------

def _m2_traces(src):
    view, trace = k_trace(asm.assemble(src))
    return build_machine2_traces(view, trace)


def _reject(comps, log_sizes, traces):
    with pytest.raises(ConstraintViolation):
        assert_constraints(comps, log_sizes, traces)


def _mutate(comps, traces, fam, col_name, row, val, idx=0):
    ci = [c.name for c in comps].index(fam)
    comp = comps[ci]
    col = comp.SCHEMA.slot(col_name, idx)
    traces[ci] = list(traces[ci])
    traces[ci][col] = traces[ci][col].copy()
    traces[ci][col][row] = val
    return traces


def test_forged_branch_taken_bit_rejected():
    """Flipping the committed taken bit redirects the branch target --
    must break either t's defining constraint or the exec chain."""
    comps, log_sizes, traces = _m2_traces(PROGRAMS["branch"] + EXIT)
    ci = [c.name for c in comps].index("ex_branch")
    t_col = comps[ci].SCHEMA.slot("t")
    row = int(np.flatnonzero(traces[ci][comps[ci].SCHEMA.slot("pad")]
                             == 0)[0])
    traces = _mutate(comps, list(traces), "ex_branch", "t", row,
                     1 - int(traces[ci][t_col][row]))
    _reject(comps, log_sizes, traces)


def test_forged_jalr_wrap_bit_rejected():
    """Flipping the JALR 2^32-wrap bit moves the emitted target by +-2
    (mod M31) -- never onto a word-aligned pc, so the exec chain
    cannot close."""
    comps, log_sizes, traces = _m2_traces(PROGRAMS["jump"] + EXIT)
    ci = [c.name for c in comps].index("ex_jump")
    sch = comps[ci].SCHEMA
    fl = traces[ci][sch.slot("f", 1)]          # JALR flag column
    rows = np.flatnonzero(np.asarray(fl) == 1)
    assert len(rows), "workload has a jalr"
    row = int(rows[0])
    traces = _mutate(comps, list(traces), "ex_jump", "c32", row,
                     1 - int(traces[ci][sch.slot("c32")][row]))
    _reject(comps, log_sizes, traces)


def test_forged_imm_sign_rejected():
    """The immediate sign bit is pinned by its decomposition (im_s /
    im_l7 + r128); flipping it must violate the decomposition."""
    comps, log_sizes, traces = _m2_traces(PROGRAMS["fib"] + EXIT)
    ci = [c.name for c in comps].index("ex_branch")
    sch = comps[ci].SCHEMA
    row = int(np.flatnonzero(
        np.asarray(traces[ci][sch.slot("pad")]) == 0)[0])
    traces = _mutate(comps, list(traces), "ex_branch", "im_s", row,
                     1 - int(traces[ci][sch.slot("im_s")][row]))
    _reject(comps, log_sizes, traces)


def test_wrong_family_routing_rejected():
    """Moving a step into the wrong family forges its fetch tuple: the
    opid emitted to `prog` cannot match the program table."""
    comps, log_sizes, traces = _m2_traces(PROGRAMS["fib"] + EXIT)
    alu_i = [c.name for c in comps].index("ex_alu")
    bit_i = [c.name for c in comps].index("ex_bit")
    alu, bit = comps[alu_i], comps[bit_i]
    # take ex_alu's first real row and append it to ex_bit as an AND
    traces = list(traces)
    tr_bit = [col.copy() for col in traces[bit_i]]
    n_bit = int((np.asarray(tr_bit[bit.SCHEMA.slot("pad")]) == 0).sum())
    assert n_bit + 1 < len(tr_bit[0]), "need padding room"
    for name in ("clk", "pc", "imm", "opa", "opb", "opc", "b"):
        w = alu.SCHEMA.width(name)
        for i in range(w):
            tr_bit[bit.SCHEMA.slot(name, i)][n_bit] = \
                traces[alu_i][alu.SCHEMA.slot(name, i)][0]
    tr_bit[bit.SCHEMA.slot("pad")][n_bit] = 0
    tr_bit[bit.SCHEMA.slot("f", 0)][n_bit] = 1        # claim it's AND
    traces[bit_i] = tr_bit
    _reject(comps, log_sizes, traces)


def test_pc_chain_forgery_rejected():
    """Changing a committed pc must break fetch or the exec chain."""
    comps, log_sizes, traces = _m2_traces(PROGRAMS["fib"] + EXIT)
    ci = [c.name for c in comps].index("ex_alu")
    sch = comps[ci].SCHEMA
    old = int(traces[ci][sch.slot("pc", 0)][0])
    traces = _mutate(comps, list(traces), "ex_alu", "pc", 0,
                     (old + 4) % 256, idx=0)
    _reject(comps, log_sizes, traces)
