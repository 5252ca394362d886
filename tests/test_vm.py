"""VM layer tests: decoder/encoder round-trip, emulator semantics,
two-pass tracing, syscalls, keccak-f, ELF loading.

Mirrors the reference's per-instruction executor tests and the
three-emulator integration matrix
(`/root/reference/vm/src/cpu/instructions/`,
`tests/testing-framework/src/lib.rs:169-180`).
"""

import numpy as np
import pytest

from nexus_zkvm_tpu.vm import (
    Opcode, decode_instruction, encode_instruction, asm, k_trace,
    k_trace_direct,
)
from nexus_zkvm_tpu.vm.decoder import Instruction
from nexus_zkvm_tpu.vm.isa import InstrType
from nexus_zkvm_tpu.vm.keccak import keccak_f1600


# ---------------------------------------------------------------------------
# Decoder / encoder
# ---------------------------------------------------------------------------

KNOWN_ENCODINGS = [
    # (word, opcode, rd, rs1, rs2, imm) — hand-checked RV32 encodings
    (0x00A00513, Opcode.ADDI, 10, 0, 0, 10),          # addi a0, zero, 10
    (0x00B50633, Opcode.ADD, 12, 10, 11, 0),          # add a2, a0, a1
    (0x40B50633, Opcode.SUB, 12, 10, 11, 0),          # sub a2, a0, a1
    (0xFFF50513, Opcode.ADDI, 10, 10, 0, 0xFFFFFFFF),  # addi a0, a0, -1
    (0x02B50533, Opcode.MUL, 10, 10, 11, 0),          # mul a0, a0, a1
    (0x0000_0073, Opcode.ECALL, 0, 17, 10, 0),  # a7/a0 slot wiring
    (0x0000_0013, Opcode.ADDI, 0, 0, 0, 0),           # nop
    (0x00052583, Opcode.LW, 11, 10, 0, 0),            # lw a1, 0(a0)
    (0x00B52023, Opcode.SW, 0, 10, 11, 0),            # sw a1, 0(a0)
    (0x00000397, Opcode.AUIPC, 7, 0, 0, 0),           # auipc t2, 0
    (0x000013B7, Opcode.LUI, 7, 0, 0, 0x1000),        # lui t2, 1
]


@pytest.mark.parametrize("word,opc,rd,rs1,rs2,imm", KNOWN_ENCODINGS)
def test_decode_known(word, opc, rd, rs1, rs2, imm):
    ins = decode_instruction(word)
    assert ins.opcode == opc
    assert ins.rd == rd and ins.rs1 == rs1 and ins.rs2 == rs2
    assert ins.imm == imm


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(7)
    for opc in Opcode:
        if opc in (Opcode.UNIMPL, Opcode.KECCAKF, Opcode.PRECOMPILE):
            continue
        for _ in range(20):
            t = decode_instruction(encode_instruction(
                _random_instr(opc, rng)))
            w = encode_instruction(t)
            assert decode_instruction(w) == t


def _random_instr(opc, rng):
    from nexus_zkvm_tpu.vm.isa import ENCODING
    t = ENCODING[opc][0]
    r = lambda: int(rng.integers(0, 32))
    if t == InstrType.I:
        if opc in (Opcode.SLLI, Opcode.SRLI, Opcode.SRAI):
            imm = int(rng.integers(0, 32))
        else:
            imm = int(rng.integers(-(1 << 11), 1 << 11)) & 0xFFFFFFFF
        return Instruction(opc, t, rd=r(), rs1=r(), imm=imm)
    if t == InstrType.S:
        imm = int(rng.integers(-(1 << 11), 1 << 11)) & 0xFFFFFFFF
        return Instruction(opc, t, rs1=r(), rs2=r(), imm=imm)
    if t == InstrType.B:
        imm = (int(rng.integers(-(1 << 11), 1 << 11)) * 2) & 0xFFFFFFFF
        return Instruction(opc, t, rs1=r(), rs2=r(), imm=imm)
    if t == InstrType.U:
        return Instruction(opc, t, rd=r(),
                           imm=(int(rng.integers(0, 1 << 20)) << 12))
    if t == InstrType.J:
        imm = (int(rng.integers(-(1 << 19), 1 << 19)) * 2) & 0xFFFFFFFF
        return Instruction(opc, t, rd=r(), imm=imm)
    if t == InstrType.SYS:
        return Instruction(opc, t)
    return Instruction(opc, t, rd=r(), rs1=r(), rs2=r())


# ---------------------------------------------------------------------------
# Emulator semantics
# ---------------------------------------------------------------------------

def run_asm(src, **kw):
    """Assemble + two-pass trace; returns (view, trace)."""
    return k_trace(asm.assemble(src), **kw)


def final_reg(trace, reg):
    """Last value written to a register in the trace."""
    steps = trace.steps
    idx = np.nonzero((steps["rd"] == reg) & (steps["rd_written"] == 1))[0]
    assert len(idx), f"register x{reg} never written"
    return int(steps["a_val"][idx[-1]])


EXIT = """
    addi a7, zero, 0x201
    ecall
"""


def test_fib_loop():
    view, trace = run_asm("""
        addi t0, zero, 10      # n
        addi a0, zero, 0       # fib(0)
        addi a1, zero, 1       # fib(1)
    loop:
        add  a2, a0, a1
        mv   a0, a1
        mv   a1, a2
        addi t0, t0, -1
        bne  t0, zero, loop
        mv   t3, a0
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """)
    assert view.exit_code == 0
    assert final_reg(trace, 28) == 55          # fib(10)


@pytest.mark.parametrize("op,a,b,expect", [
    ("add", 7, 5, 12), ("sub", 7, 5, 2), ("sub", 5, 7, 0xFFFFFFFE),
    ("and", 0b1100, 0b1010, 0b1000), ("or", 0b1100, 0b1010, 0b1110),
    ("xor", 0b1100, 0b1010, 0b0110),
    ("sll", 1, 5, 32), ("srl", 32, 5, 1),
    ("slt", -1 & 0xFFFFFFFF, 1, 1), ("sltu", -1 & 0xFFFFFFFF, 1, 0),
    ("mul", 100000, 100000, (100000 * 100000) & 0xFFFFFFFF),
    ("mulhu", 100000, 100000, (100000 * 100000) >> 32),
    ("divu", 100, 7, 14), ("remu", 100, 7, 2),
])
def test_alu_r(op, a, b, expect):
    view, trace = run_asm(f"""
        li t0, {a}
        li t1, {b}
        {op} t2, t0, t1
    """ + EXIT)
    assert final_reg(trace, 7) == expect


@pytest.mark.parametrize("a,b,q,r", [
    (7, 2, 3, 1), (-7, 2, -3, -1), (7, -2, -3, 1), (-7, -2, 3, -1),
    (1, 0, -1, 1), (-(1 << 31), -1, -(1 << 31), 0),
])
def test_div_rem_signed(a, b, q, r):
    view, trace = run_asm(f"""
        li t0, {a & 0xFFFFFFFF}
        li t1, {b & 0xFFFFFFFF}
        div t2, t0, t1
        rem t3, t0, t1
    """ + EXIT)
    assert final_reg(trace, 7) == q & 0xFFFFFFFF
    assert final_reg(trace, 28) == r & 0xFFFFFFFF


def test_sra_negative():
    view, trace = run_asm("""
        li t0, -64
        srai t1, t0, 3
    """ + EXIT)
    assert final_reg(trace, 6) == (-8) & 0xFFFFFFFF


def test_memory_load_store():
    view, trace = run_asm("""
        lw   t0, 0x80(zero)     # input sentinel region is readable
        addi a7, zero, 0x403    # OverwriteHeapPointer -> a0 = heap start
        ecall
        mv   t1, a0
        li   t2, 0x12345678
        sw   t2, 0(t1)
        lb   t3, 1(t1)          # 0x56
        lhu  t4, 2(t1)          # 0x1234
        sh   t2, 8(t1)
        lw   t5, 8(t1)          # 0x5678
    """ + EXIT)
    assert final_reg(trace, 28) == 0x56
    assert final_reg(trace, 29) == 0x1234
    assert final_reg(trace, 30) == 0x5678


def test_branches_and_jumps():
    view, trace = run_asm("""
        addi t0, zero, 3
        addi t1, zero, 0
    loop:
        addi t1, t1, 2
        addi t0, t0, -1
        bne  t0, zero, loop
        jal  ra, func
        addi t3, t1, 0
    """ + EXIT + """
    func:
        addi t1, t1, 100
        ret
    """)
    assert final_reg(trace, 28) == 106
    assert view.exit_code == 0


def test_exit_code_and_output():
    view, trace = run_asm("""
        lw   t0, 0x84(zero)     # public output pointer
        li   t1, 0xdeadbeef
        sw   t1, 0(t0)
        addi a0, zero, 7
        addi a7, zero, 0x201
        ecall
    """)
    assert view.exit_code == 7
    assert view.public_output[:4] == (0xdeadbeef).to_bytes(4, "little")


def test_public_input_read():
    payload = (41).to_bytes(4, "little")
    view, trace = run_asm("""
        lw   t0, 0x80(zero)     # public input pointer
        lw   t1, 0(t0)          # length
        lw   t2, 4(t0)          # first word
        addi t2, t2, 1
    """ + EXIT, public_input=payload)
    assert final_reg(trace, 6) == 4       # length
    assert final_reg(trace, 7) == 42


def test_private_input_tape():
    view, trace = run_asm("""
        addi a7, zero, 0x400
        ecall
        mv t0, a0
        ecall
        mv t1, a0
        ecall                   # tape exhausted -> -1
        mv t2, a0
    """ + EXIT, private_input=bytes([5, 9]))
    assert final_reg(trace, 5) == 5
    assert final_reg(trace, 6) == 9
    assert final_reg(trace, 7) == 0xFFFFFFFF


def test_write_log_captured():
    view, trace = run_asm("""
        lw   t0, 0x84(zero)
        li   t1, 0x6f6c6568     # "helo"
        sw   t1, 0(t0)
        mv   a1, t0
        addi a0, zero, 1
        addi a2, zero, 4
        addi a7, zero, 0x200
        ecall
    """ + EXIT)
    assert view.debug_logs == [b"helo"]


def test_trace_register_timestamps():
    _, trace = k_trace_direct(asm.assemble_instructions("""
        addi t0, zero, 1
        addi t0, t0, 2
        add  t1, t0, t0
    """))
    s = trace.steps
    # step 2 reads t0 (written at step 1, slot 3): ts1_prev = 3*1+3
    assert s["ts1_prev"][1] == 3 * 1 + 3
    # step 3 reads t0 twice: rs1 slot gets ts from step 2's write
    assert s["ts1_prev"][2] == 3 * 2 + 3
    assert s["ts2_prev"][2] == 3 * 3 + 1
    assert s["clk"][0] == 1


def test_trace_split():
    _, trace = run_asm("""
        addi t0, zero, 100
    loop:
        addi t0, t0, -1
        bne  t0, zero, loop
    """ + EXIT)
    segs = trace.split_by(64)
    assert sum(t.n_steps for t in segs) == trace.n_steps
    assert all(t.n_steps == 64 for t in segs[:-1])
    first = np.concatenate([t.steps["clk"] for t in segs])
    assert np.array_equal(first, trace.steps["clk"])


# ---------------------------------------------------------------------------
# keccak-f + custom instruction
# ---------------------------------------------------------------------------

def test_keccak_f1600_zero_vector():
    out = keccak_f1600([0] * 25)
    # standard KAT: first lanes of keccak-f[1600] on the zero state
    assert out[0] == 0xF1258F7940E1DDE7
    assert out[1] == 0x84D5CCF933C0478A
    assert out[24] == 0xEAF1FF7B5CECA249


# ---------------------------------------------------------------------------
# ELF loading (reference fixture, read-only)
# ---------------------------------------------------------------------------

def test_elf_load_reference_fixture():
    import os
    from nexus_zkvm_tpu.vm import ElfFile
    path = "/root/reference/vm/test/fib_10.elf"
    if not os.path.exists(path):
        pytest.skip("reference fixture unavailable")
    elf = ElfFile.from_path(path)
    assert elf.base == 0x88          # ELF_TEXT_START
    assert elf.entry >= elf.base
    assert len(elf.instructions) > 100
    ins = decode_instruction(elf.instructions[(elf.entry - elf.base) // 4])
    assert ins.opcode != Opcode.UNIMPL


def test_k_trace_padding():
    """k>1 pads the final block with UNIMPL steps: clk keeps counting,
    pc freezes (reference `k_step`, vm/src/trace.rs:218-247)."""
    import numpy as np
    from nexus_zkvm_tpu.vm import asm, k_trace
    from nexus_zkvm_tpu.vm.isa import Opcode
    src = """
        addi t0, zero, 1
        addi t1, zero, 2
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """
    for backend in ("python", "native"):
        view, tr = k_trace(asm.assemble(src), k=4, backend=backend)
        assert tr.n_steps % 4 == 0
        ops = tr.steps["opcode"]
        pad = ops == int(Opcode.UNIMPL)
        assert pad.sum() == tr.n_steps - 5
        assert pad[5:].all() and not pad[:5].any()
        assert np.all(np.diff(tr.steps["clk"]) == 1)
        assert (tr.steps["pc"][5:] == tr.steps["next_pc"][4]).all()


def test_k_trace_padded_proof_fill():
    """A k-padded trace fills and satisfies the machine AIR."""
    from nexus_zkvm_tpu.vm import asm, k_trace
    from nexus_zkvm_tpu.machine.driver import build_machine_traces
    from nexus_zkvm_tpu.air.testing import assert_constraints
    src = """
        addi t0, zero, 5
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """
    view, tr = k_trace(asm.assemble(src), k=8)
    comps, log_sizes, traces = build_machine_traces(view, tr)
    assert_constraints(comps, log_sizes, traces)
