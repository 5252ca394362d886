"""Compiled-guest integration: run the reference's checked-in ELF
fixtures end-to-end (emulate -> prove -> verify).

Counterpart of the reference's integration tests over real guest
binaries (`/root/reference/tests/testing-framework/src/lib.rs:126-165`
and the `read_testing_elf_from_path!` fixture tests,
`vm/src/lib.rs:14-33`).  These fixtures were produced by the real
Rust guest toolchain, so they exercise runtime start code, sp setup,
static data, `rin`/`wou` custom IO instructions, and the ecall paths —
everything hand-written asm guests skip.
"""

import os

import numpy as np
import pytest

from nexus_zkvm_tpu.sdk import Guest, LocalProver
from nexus_zkvm_tpu.vm.trace import k_trace

FIXTURES = "/root/reference/vm/test"
FIB10 = os.path.join(FIXTURES, "fib_10.elf")
FIB10_NOPRE = os.path.join(FIXTURES, "fib_10_no_precompiles.elf")

needs_fixtures = pytest.mark.skipif(
    not os.path.exists(FIB10), reason="reference fixtures not mounted")

EXPECTED_LOGS = "".join(
    f"fib({i}) = {v}\n" for i, v in
    enumerate([1, 1, 2, 3, 5, 8, 13, 21, 34, 55]))


def _trace(path, backend):
    g = Guest.from_elf(path)
    return k_trace(g.program_words, entry=g.entry, rom_image=g.rom_image,
                   ram_image=g.ram_image, backend=backend,
                   max_steps=2_000_000)


@needs_fixtures
@pytest.mark.parametrize("path", [FIB10, FIB10_NOPRE])
def test_fixture_emulates(path):
    view, trace = _trace(path, "python")
    assert view.exit_code == 0
    assert view.logs_text() == EXPECTED_LOGS
    assert trace.n_steps > 1000


@needs_fixtures
@pytest.mark.parametrize("path", [FIB10, FIB10_NOPRE])
def test_fixture_golden_trace(path):
    """Golden differential values for the fixture ELFs: instruction
    count, final registers, and the syscall-visible state must never
    drift (reference two-pass semantics, `vm/src/trace.rs:302-348`).
    Both fixtures are the same guest (+-precompile attributes) and
    converge to identical machine state."""
    view, trace = _trace(path, "python")
    ms = trace.machine_state
    assert trace.n_steps == 6881
    regs = [int(r) for r in ms["final_regs"]]
    assert regs[1] == 0xB8            # ra: inside the exit shim
    assert regs[2] == 0x112930        # sp: runtime stack after ecalls
    assert regs[3] == 0x1F30          # gp: __global_pointer$
    assert regs[17] == 0x201          # a7: SYS_EXIT
    assert regs[10] == 0              # a0: exit code 0
    assert all(r == 0 for r in regs[18:])
    assert view.public_output[:4] == b"\x00\x00\x00\x00"


@needs_fixtures
def test_fixture_python_native_parity():
    """The C fast path must produce a bit-identical trace on a real
    compiled binary (golden two-pass semantics,
    ref `vm/src/trace.rs:302-348`)."""
    vp, tp = _trace(FIB10, "python")
    vn, tn = _trace(FIB10, "native")
    assert vp.exit_code == vn.exit_code == 0
    assert vp.debug_logs == vn.debug_logs
    assert vp.public_output == vn.public_output
    assert tp.n_steps == tn.n_steps
    for k in tp.steps:
        assert np.array_equal(tp.steps[k], tn.steps[k]), k


@needs_fixtures
@pytest.mark.slow
def test_fixture_prove_verify():
    prover = LocalProver(Guest.from_elf(FIB10))
    view, proof = prover.prove_with_input()
    assert view.exit_code == 0
    assert view.logs_text() == EXPECTED_LOGS
    assert prover.verify(view, proof)
    # proof must not verify against a tampered public claim
    view.exit_code = 1
    assert not prover.verify(view, proof)


@needs_fixtures
def test_fixture_constraints_and_balance():
    """Fast full-machine check on the compiled guest: every constraint
    holds and every LogUp relation multiset balances (catches e.g. the
    missing-rodata-in-View bug without a slow prove)."""
    from nexus_zkvm_tpu.machine.driver import build_machine_traces
    from nexus_zkvm_tpu.air.testing import (assert_constraints,
                                            relation_balance_report)
    view, trace = _trace(FIB10, "auto")
    comps, log_sizes, traces = build_machine_traces(view, trace)
    assert relation_balance_report(comps, log_sizes, traces) == {}
    assert_constraints(comps, log_sizes, traces)
