"""Precompile framework tests: registry, decode/encode, VM dispatch.

Mirrors the reference precompile integration tests
(`/root/reference/precompiles/tests/integration.rs:8-16`).
"""

import pytest

from nexus_zkvm_tpu import precompiles
from nexus_zkvm_tpu.vm import asm, k_trace, decode_instruction
from nexus_zkvm_tpu.vm.encoder import encode_instruction
from nexus_zkvm_tpu.vm.decoder import Instruction
from nexus_zkvm_tpu.vm.isa import Opcode, InstrType


def test_registry():
    assert precompiles.get(0).name == "dummy_div"
    assert precompiles.get(1).name == "dummy_hash"
    assert precompiles.get(999) is None


def test_encode_decode_roundtrip():
    for idx in (0, 1, 7, 100, 1023):
        ins = Instruction(Opcode.PRECOMPILE, InstrType.CUSTOM, rd=5,
                          rs1=6, rs2=7, imm=idx)
        dec = decode_instruction(encode_instruction(ins))
        assert dec.opcode == Opcode.PRECOMPILE
        assert (dec.rd, dec.rs1, dec.rs2, dec.imm) == (5, 6, 7, idx)


def test_dummy_div_executes():
    view, trace = k_trace(asm.assemble("""
        li t0, 100
        li t1, 7
        precompile 0, t2, t0, t1
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """))
    import numpy as np
    s = trace.steps
    idx = (s["opcode"] == int(Opcode.PRECOMPILE)).nonzero()[0]
    assert len(idx) == 1
    assert s["a_val"][idx[0]] == 14       # 100 // 7
    assert view.exit_code == 0


def test_unregistered_precompile_faults():
    from nexus_zkvm_tpu.vm.emulator import VMError
    with pytest.raises(VMError):
        k_trace(asm.assemble("""
            precompile 55, t2, t0, t1
            addi a7, zero, 0x201
            ecall
        """))


class Doubler(precompiles.Precompile):
    index = 9
    name = "doubler"

    def native_call(self, emulator, b_val, c_val):
        return (2 * b_val) & 0xFFFFFFFF


def test_custom_registration():
    precompiles.register(Doubler())
    view, trace = k_trace(asm.assemble("""
        li t0, 21
        precompile 9, t2, t0, zero
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """))
    s = trace.steps
    idx = (s["opcode"] == int(Opcode.PRECOMPILE)).nonzero()[0]
    assert s["a_val"][idx[0]] == 42


def test_dummy_div_proven_constraints():
    """A guest using the dummy_div precompile fills the dispatch +
    circuit components and satisfies every constraint (the proven
    path, ref `precompiles/src/traits.rs:38-46`)."""
    from nexus_zkvm_tpu.machine.driver import build_machine_traces
    from nexus_zkvm_tpu.air.testing import assert_constraints
    view, trace = k_trace(asm.assemble("""
        li t0, 100
        li t1, 7
        precompile 0, t2, t0, t1
        li t3, 50
        precompile 0, t4, t3, zero
        add s0, t2, t4
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """))
    comps, log_sizes, traces = build_machine_traces(view, trace)
    assert any(c.name == "pre_dummy_div" for c in comps)
    assert_constraints(comps, log_sizes, traces)


def test_dummy_div_forged_result_rejected():
    from nexus_zkvm_tpu.machine.driver import build_machine_traces
    from nexus_zkvm_tpu.air.testing import (assert_constraints,
                                            ConstraintViolation)
    from nexus_zkvm_tpu.machine.precomp import PRECOMP_SCHEMA
    view, trace = k_trace(asm.assemble("""
        li t0, 100
        li t1, 7
        precompile 0, t2, t0, t1
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """))
    comps, log_sizes, traces = build_machine_traces(view, trace)
    ci = next(i for i, c in enumerate(comps)
              if c.name == "pre_dummy_div")
    tr = [col.copy() for col in traces[ci]]
    tr[PRECOMP_SCHEMA.slot("a", 0)][0] += 1     # claim 100//7 == 15
    traces = list(traces)
    traces[ci] = tr
    with pytest.raises(ConstraintViolation):
        assert_constraints(comps, log_sizes, traces)


def test_unproven_precompile_rejected_at_prove():
    """dummy_hash executes natively but has no circuit: the machine
    trace builder must reject it, not silently skip the rows."""
    from nexus_zkvm_tpu.machine.driver import build_machine_traces
    view, trace = k_trace(asm.assemble("""
        li t0, 5
        li t1, 6
        precompile 1, t2, t0, t1
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """))
    with pytest.raises(ValueError, match="without circuits"):
        build_machine_traces(view, trace)
