"""SDK surface tests: guests, IO encoding, proof serialization.

Mirrors the reference's SDK integration tests and
`test_serialize_proofs` (`/root/reference/tests/testing-framework/src/
lib.rs:721`).
"""

import numpy as np
import pytest

from nexus_zkvm_tpu.sdk import (
    Guest, LocalProver, encode_u32s, decode_u32s, proof_to_bytes,
    proof_from_bytes,
)
from nexus_zkvm_tpu.prover import PcsConfig
from nexus_zkvm_tpu.ops.fri import FriConfig

CFG = PcsConfig(pow_bits=2, fri=FriConfig(log_blowup=1, log_last_layer=0,
                                          n_queries=8))

DOUBLER = """
    lw   t0, 0x80(zero)     # public input pointer
    lw   t1, 4(t0)          # first input word
    add  t1, t1, t1
    lw   t2, 0x84(zero)     # output pointer
    sw   t1, 0(t2)
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
"""


def test_guest_from_asm_trace():
    guest = Guest.from_asm(DOUBLER)
    view, trace = LocalProver(guest, CFG).trace(
        public_input=encode_u32s(21))
    assert view.exit_code == 0
    assert decode_u32s(view.public_output, 1) == [42]
    assert trace.n_steps == 8


def test_guest_from_elf_reference_fixture():
    import os
    path = "/root/reference/vm/test/fib_10.elf"
    if not os.path.exists(path):
        pytest.skip("fixture unavailable")
    guest = Guest.from_elf(path)
    assert len(guest.program_words) > 100
    assert guest.entry >= 0x88


def test_io_roundtrip():
    data = encode_u32s(1, 2, 0xFFFFFFFF)
    assert decode_u32s(data) == [1, 2, 0xFFFFFFFF]


@pytest.mark.slow
def test_prove_verify_serialize_roundtrip():
    guest = Guest.from_asm(DOUBLER)
    prover = LocalProver(guest, CFG)
    view, proof = prover.prove_with_input(public_input=encode_u32s(21))
    assert prover.verify(view, proof)

    blob = proof_to_bytes(proof)
    proof2 = proof_from_bytes(blob)
    assert prover.verify(view, proof2)
    assert proof_to_bytes(proof2) == blob

    # tampered blob must not verify
    bad = bytearray(blob)
    bad[len(bad) // 2] ^= 1
    try:
        proof3 = proof_from_bytes(bytes(bad))
    except Exception:
        return
    assert not prover.verify(view, proof3)


def test_view_serialize_roundtrip():
    guest = Guest.from_asm(DOUBLER)
    view, _ = LocalProver(guest, CFG).trace(public_input=encode_u32s(21))
    from nexus_zkvm_tpu.sdk import view_to_bytes, view_from_bytes
    blob = view_to_bytes(view)
    v2 = view_from_bytes(blob)
    assert v2.exit_code == view.exit_code
    assert v2.public_output == view.public_output
    assert v2.public_input == view.public_input
    assert v2.program_info.program == view.program_info.program
    assert v2.initial_memory == view.initial_memory
    assert v2.memory_layout == view.memory_layout
    assert view_to_bytes(v2) == blob


@pytest.mark.slow
def test_bundle_verifies_without_guest():
    """Portable proofs: a third party verifies from the bundle alone —
    no guest program, no re-execution (ref serializes the View with
    the proof, `/root/reference/sdk/src/stwo/seq.rs:141-147`)."""
    from nexus_zkvm_tpu.sdk import (bundle_to_bytes, bundle_from_bytes,
                                    verify)
    guest = Guest.from_asm(DOUBLER)
    prover = LocalProver(guest, CFG)
    view, proof = prover.prove_with_input(public_input=encode_u32s(21))
    blob = bundle_to_bytes(view, proof)
    view2, proof2 = bundle_from_bytes(blob)
    assert decode_u32s(view2.public_output, 1) == [42]
    assert verify(view2, proof2, CFG)
    # a doctored claim (flip the exit code) must not verify
    view2.exit_code = 7
    assert not verify(view2, proof2, CFG)


def test_host_profile_decorator(tmp_path):
    """@sdk.profile wraps a host call and writes a phase report
    (reference analogue: sdk/macros/src/pprof.rs:7-40)."""
    from nexus_zkvm_tpu.sdk import profile
    from nexus_zkvm_tpu.utils.profile import scope

    @profile("unit", dir=str(tmp_path))
    def work(x):
        with scope("phase_a"):
            s = sum(range(x))
        return s

    assert work(1000) == sum(range(1000))
    assert work.last_report_path is not None
    text = open(work.last_report_path).read()
    assert "phase_a" in text

    # nested profiled calls fold into the outer report (no extra file)
    @profile("outer", dir=str(tmp_path))
    def outer():
        return work(10)

    assert outer() == sum(range(10))
    reports = sorted(p.name for p in tmp_path.iterdir())
    assert any(p.startswith("outer") for p in reports)
    assert "profile:unit" in open(outer.last_report_path).read()
