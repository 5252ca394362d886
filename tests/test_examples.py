"""Integration tests over the example guest suite.

Counterpart of the reference's testing-framework runs over its
`examples/src/bin/` guests (`tests/testing-framework/src/lib.rs:
126-180`): each guest is executed on BOTH emulators (python + native
fast path when eligible), its public output checked against a host
model, and its full machine trace constraint-checked (the fast
no-FRI tier; full prove/verify round-trips are covered by the slow
tier elsewhere).
"""

import os

import numpy as np
import pytest

from nexus_zkvm_tpu.air.testing import (assert_constraints,
                                        relation_balance_report)
from nexus_zkvm_tpu.machine.driver import build_machine_traces
from nexus_zkvm_tpu.sdk import Guest, encode_u32s, decode_u32s
from nexus_zkvm_tpu.vm import k_trace

GUESTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples", "guests")


def run(name, public_input=b"", backend="auto", max_steps=1_000_000):
    g = Guest.from_asm(open(os.path.join(GUESTS, name)).read())
    return k_trace(g.program_words, entry=g.entry,
                   public_input=public_input, backend=backend,
                   max_steps=max_steps)


def check_machine(view, trace):
    comps, log_sizes, traces = build_machine_traces(view, trace)
    assert relation_balance_report(comps, log_sizes, traces) == {}
    assert_constraints(comps, log_sizes, traces)


def test_fib():
    view, trace = run("fib.s", encode_u32s(13))
    assert view.exit_code == 0
    assert decode_u32s(view.public_output, 1) == [233]
    check_machine(view, trace)


def test_fact():
    view, trace = run("fact.s", encode_u32s(10))
    assert view.exit_code == 0
    assert decode_u32s(view.public_output, 1) == [3628800]
    check_machine(view, trace)


def test_multiply():
    a, b = 0xDEADBEEF, 0x12345678
    view, trace = run("multiply.s", encode_u32s(a, b))
    assert view.exit_code == 0
    lo, hi = decode_u32s(view.public_output, 2)
    assert (hi << 32) | lo == a * b
    check_machine(view, trace)


def test_fail_exit_code():
    view, trace = run("fail.s")
    assert view.exit_code == 1
    assert not view.exit_code_ok()
    check_machine(view, trace)


def test_input_output():
    words = [1, 2, 3, 0x7FFFFFFF]
    view, trace = run("input_output.s", encode_u32s(*words))
    assert view.exit_code == 0
    got = decode_u32s(view.public_output, len(words))
    assert got == [(w * 2) & 0xFFFFFFFF for w in words]
    check_machine(view, trace)


def test_long_io():
    words = list(range(1, 101))
    view, trace = run("long_io.s", encode_u32s(*words))
    assert view.exit_code == 0
    s, x = decode_u32s(view.public_output, 2)
    assert s == sum(words) & 0xFFFFFFFF
    xor = 0
    for w in words:
        xor ^= w
    assert x == xor
    check_machine(view, trace)


def test_simple_hash():
    words = [0xCAFEBABE, 17, 42]
    view, trace = run("simple_hash.s", encode_u32s(*words))
    assert view.exit_code == 0
    h = 0x811C9DC5
    for w in words:
        h = ((h ^ w) * 0x01000193) & 0xFFFFFFFF
    assert decode_u32s(view.public_output, 1) == [h]
    check_machine(view, trace)


def test_keccak_guest():
    view, trace = run("keccak.s", encode_u32s(2), backend="python")
    assert view.exit_code == 0
    from nexus_zkvm_tpu.vm.keccak import keccak_f1600_words
    st = [0] * 50
    for _ in range(2):
        st = keccak_f1600_words(st)
    assert decode_u32s(view.public_output, 2) == [st[0], st[1]]
    check_machine(view, trace)


def test_keccak_guest_native_parity():
    vp, tp = run("keccak.s", encode_u32s(1), backend="python")
    vn, tn = run("keccak.s", encode_u32s(1), backend="native")
    assert vp.public_output == vn.public_output
    for k in tp.steps:
        assert np.array_equal(tp.steps[k], tn.steps[k]), k


def test_div_precompile_guest():
    view, trace = run("div_precompile.s", encode_u32s(1000, 7),
                      backend="python")
    assert view.exit_code == 0
    assert decode_u32s(view.public_output, 1) == [142]
    check_machine(view, trace)


def test_sort():
    words = [9, 1, 8, 2, 7, 3, 6, 4, 5]
    view, trace = run("sort.s", encode_u32s(*words))
    assert view.exit_code == 0
    assert decode_u32s(view.public_output, len(words)) == sorted(words)
    check_machine(view, trace)


def test_palindrome():
    src = open(os.path.join(GUESTS, "palindrome.s")).read()
    g = Guest.from_asm(src)
    view, trace = k_trace(g.program_words,
                          public_input=encode_u32s(0x1221))
    assert view.exit_code == 0
    check_machine(view, trace)


# ---------------------------------------------------------------------------
# emulator-configuration matrix (reference common-testing EmulatorType
# {Harvard, Linear, TwoPass}, `common-testing/src/emulator.rs:19-80`)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,inp", [
    ("fib.s", (13,)), ("fact.s", (6,)),
    ("sort.s", (9, 1, 8, 2, 7, 3, 6, 4, 5)),
    ("palindrome.s", (0x1221,)),
])
def test_emulator_config_matrix(name, inp):
    """Harvard (pass 1), python two-pass, and native two-pass must
    agree on exit code and public output for every guest."""
    from nexus_zkvm_tpu.vm.emulator import HarvardEmulator, VMExited
    from nexus_zkvm_tpu.vm.isa import ELF_TEXT_START
    from nexus_zkvm_tpu.vm.native import native_available

    g = Guest.from_asm(open(os.path.join(GUESTS, name)).read())
    pub = encode_u32s(*inp)

    harv = HarvardEmulator(g.program_words, base=ELF_TEXT_START,
                           entry=g.entry, public_input=pub)
    try:
        harv.execute(1_000_000)
    except VMExited:
        pass
    view_py, _ = run(name, pub, backend="python")
    assert harv.exit_code == view_py.exit_code

    if native_available():
        view_nat, trace_nat = run(name, pub, backend="native")
        assert view_nat.exit_code == view_py.exit_code
        assert view_nat.public_output == view_py.public_output


def test_galeshapley():
    """Stable matching vs a host-model Gale-Shapley."""
    men = [[0, 1, 2, 3], [1, 0, 3, 2], [2, 3, 0, 1], [3, 1, 2, 0]]
    women = [[3, 2, 1, 0], [0, 1, 2, 3], [1, 0, 3, 2], [2, 3, 0, 1]]

    def host_gs():
        wrank = [[0] * 4 for _ in range(4)]
        for w in range(4):
            for k, m in enumerate(women[w]):
                wrank[w][m] = k
        nxt, husband, wife = [0] * 4, [None] * 4, [None] * 4
        while None in wife:
            m = wife.index(None)
            w = men[m][nxt[m]]
            nxt[m] += 1
            if husband[w] is None:
                husband[w], wife[m] = m, w
            elif wrank[w][m] < wrank[w][husband[w]]:
                wife[husband[w]] = None
                husband[w], wife[m] = m, w
        return wife

    flat = [x for row in men for x in row] + \
           [x for row in women for x in row]
    view, trace = run("galeshapley.s", encode_u32s(*flat),
                      backend="python")
    assert view.exit_code == 0
    assert decode_u32s(view.public_output, 4) == host_gs()
    check_machine(view, trace)
    # machine2 proves it too
    from nexus_zkvm_tpu.machine2 import build_machine2_traces
    comps, log_sizes, traces = build_machine2_traces(view, trace)
    assert_constraints(comps, log_sizes, traces)


def test_fib1000():
    view, trace = run("fib1000.s", b"")
    assert view.exit_code == 0
    # fib(1000) mod 2^32 with fib(0)=0: iterating 1000 steps from (0,1)
    a, b = 0, 1
    for _ in range(1000):
        a, b = b, (a + b) & 0xFFFFFFFF
    assert decode_u32s(view.public_output, 1) == [a]
    check_machine(view, trace)


def test_interp():
    """Stack-machine interpreter guest (the lambda_calculus-class
    irregular workload, ref `examples/src/bin/lambda_calculus.rs`):
    computes 10! through interpreted PUSH/MUL bytecode."""
    P_, A, S, M, D, W, J, H = range(8)

    def op(code, imm=0):
        return code | (imm << 8)

    prog = [op(P_, 1)]
    for i in range(10, 0, -1):
        prog += [op(P_, i), op(M)]
    prog += [op(H)]
    view, trace = run("interp.s", encode_u32s(len(prog), *prog))
    assert view.exit_code == 0
    depth, top = decode_u32s(view.public_output, 2)
    assert depth == 1 and top == 3628800
    check_machine(view, trace)


def test_interp_jnz():
    """Interpreter branch coverage: one taken and one not-taken JNZ
    (data-dependent jumps through the dispatch loop)."""
    P_, A, S, M, D, W, J, H = range(8)

    def op(code, imm=0):
        return code | (imm << 8)

    prog = [
        op(P_, 42),         # 0: [42]
        op(P_, 1),          # 1: [42, 1]
        op(J, 4),           # 2: pop 1 -> taken, jump to 4
        op(H),              # 3: skipped
        op(P_, 0),          # 4: [42, 0]
        op(J, 3),           # 5: pop 0 -> not taken
        op(H),              # 6: halt; stack [42]
    ]
    view, trace = run("interp.s", encode_u32s(len(prog), *prog))
    assert view.exit_code == 0
    depth, top = decode_u32s(view.public_output, 2)
    assert depth == 1 and top == 42
    check_machine(view, trace)


def test_keccak_input_guest():
    """IO + custom-instruction combined guest (ref
    `examples/src/bin/io/keccak_input.rs`): absorb input words, one
    keccak-f[1600], output the first 4 state words."""
    from nexus_zkvm_tpu.vm.keccak import keccak_f1600_words
    words = [0xDEADBEEF, 0x12345678, 7, 0, 0xFFFFFFFF]
    view, trace = run("keccak_input.s",
                      encode_u32s(len(words), *words),
                      backend="python")
    assert view.exit_code == 0
    st = [0] * 50
    for i, w in enumerate(words):
        st[i] ^= w
    st = keccak_f1600_words(st)
    assert decode_u32s(view.public_output, 4) == \
        [st[0], st[1], st[2], st[3]]
    check_machine(view, trace)
