"""Command-line interface: scaffold, run, prove, verify guests.

Counterpart of the reference's `cargo-nexus` CLI
(`/root/reference/cli/src/command/mod.rs:7-20`):

    python -m nexus_zkvm_tpu.cli new my_guest      # scaffold a guest
    python -m nexus_zkvm_tpu.cli run   guest.s --input 21
    python -m nexus_zkvm_tpu.cli prove guest.s --input 21 -o proof.bin
    python -m nexus_zkvm_tpu.cli verify guest.s proof.bin --input 21
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_TEMPLATE = """\
# New guest program. Reads one u32 from the public input, writes one
# u32 result to the public output. See examples/guests/ for more.
    lw   t0, 0x80(zero)      # public input pointer
    lw   a0, 4(t0)           # first input word
    # ... compute on a0 ...
    lw   t1, 0x84(zero)      # public output pointer
    sw   a0, 0(t1)
    addi a0, zero, 0         # exit code 0
    addi a7, zero, 0x201
    ecall
"""

# `new NAME` (no .s suffix) scaffolds a host project like the
# reference's `cargo nexus host` (`cli/src/command/host.rs:18-29`):
# a runtime-based guest plus a host driver script.
_GUEST_TEMPLATE = """\
# Guest program (runtime dialect — see nexus_zkvm_tpu/vm/runtime.py).
# `main` is called by the runtime; its return value is the exit code.
# Helpers: rt_input_word, rt_output_word, rt_alloc, rt_log,
#          rt_read_private, rt_cycle_mark.
main:
    mv   s0, ra
    addi a0, zero, 0
    call rt_input_word       # a0 = first public input word
    add  a1, a0, a0          # ... compute ...
    addi a0, zero, 0
    call rt_output_word      # output[0] = result
    mv   ra, s0
    addi a0, zero, 0         # exit code
    ret
"""

_HOST_TEMPLATE = """\
#!/usr/bin/env python3
\"\"\"Host driver: trace, prove, and verify the guest.\"\"\"
import sys

from nexus_zkvm_tpu.sdk import (Guest, LocalProver, encode_u32s,
                                decode_output, verify)

guest = Guest.from_asm(open("guest.s").read())
prover = LocalProver(guest)

n = int(sys.argv[1]) if len(sys.argv) > 1 else 21
view, proof = prover.prove_with_input(public_input=encode_u32s(n))
print("exit code:", view.exit_code)
print("output:", decode_output(view, 1))
print("verified:", verify(view, proof))
"""


def _load_guest(path: str):
    from .sdk import Guest
    if path.endswith(".s") or path.endswith(".asm"):
        return Guest.from_asm(open(path).read())
    return Guest.from_elf(path)


def _input_bytes(args) -> bytes:
    from .sdk import encode_u32s
    return encode_u32s(*args.input) if args.input else b""


def main(argv=None):
    ap = argparse.ArgumentParser(prog="nexus-zkvm-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_new = sub.add_parser("new", help="scaffold a new guest program")
    p_new.add_argument("name")

    for cmd in ("run", "prove"):
        p = sub.add_parser(cmd)
        p.add_argument("guest", help=".s/.asm assembly or riscv32 ELF")
        p.add_argument("--input", type=lambda s: int(s, 0), nargs="*",
                       help="public input u32 words")
        p.add_argument("--private-input", type=lambda s: int(s, 0),
                       nargs="*", help="private input bytes")
        p.add_argument("--cpu", action="store_true",
                       help="force the CPU backend")
        p.add_argument("--progress", action="store_true",
                       help="live phase ticker on stderr")
        p.add_argument("--profile", action="store_true",
                       help="per-phase host profile on stderr")
        if cmd == "prove":
            p.add_argument("-o", "--output", default="proof.bin")

    # verify is standalone: the bundle carries the View (public claim),
    # so no guest re-execution is needed (ref `sdk/src/stwo/seq.rs:
    # 141-147` ships the View with the proof the same way)
    p_ver = sub.add_parser("verify")
    p_ver.add_argument("proof", help="proof bundle from `prove`")
    p_ver.add_argument("--cpu", action="store_true",
                       help="force the CPU backend")
    p_ver.add_argument("--progress", action="store_true",
                       help="live phase ticker on stderr")
    p_ver.add_argument("--profile", action="store_true",
                       help="per-phase host profile on stderr")

    args = ap.parse_args(argv)

    if args.cmd == "new":
        if args.name.endswith(".s"):          # single-file guest
            if os.path.exists(args.name):
                ap.error(f"{args.name} already exists")
            with open(args.name, "w") as f:
                f.write(_TEMPLATE)
            print(f"wrote {args.name}")
            return 0
        # project scaffold (ref `cargo nexus host`)
        if os.path.exists(args.name):
            ap.error(f"{args.name}/ already exists")
        os.makedirs(args.name)
        with open(os.path.join(args.name, "guest.s"), "w") as f:
            f.write(_GUEST_TEMPLATE)
        with open(os.path.join(args.name, "host.py"), "w") as f:
            f.write(_HOST_TEMPLATE)
        print(f"scaffolded {args.name}/ (guest.s + host.py); "
              f"run: python {args.name}/host.py 21")
        return 0

    if getattr(args, "cpu", False):
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    from .sdk import (LocalProver, bundle_to_bytes, bundle_from_bytes,
                      verify as verify_fn)
    from .utils import enable_progress, profiled

    if getattr(args, "progress", False):
        enable_progress()

    from contextlib import nullcontext
    prof_ctx = profiled() if getattr(args, "profile", False) \
        else nullcontext()

    if args.cmd == "verify":
        view, proof = bundle_from_bytes(open(args.proof, "rb").read())
        t0 = time.time()
        with prof_ctx as prof:
            ok = verify_fn(view, proof)
        if prof is not None:
            print(prof.report(), file=sys.stderr)
        print(f"exit code: {view.exit_code}")
        out = view.public_output.rstrip(b"\0")
        if out:
            print(f"output bytes: {out.hex()}")
        print(f"verified: {ok} in {time.time() - t0:.1f}s")
        return 0 if ok else 1

    guest = _load_guest(args.guest)
    prover = LocalProver(guest)
    priv = bytes(args.private_input or [])

    if args.cmd == "run":
        view, trace = prover.trace(public_input=_input_bytes(args),
                                   private_input=priv)
        print(f"exit code: {view.exit_code}")
        print(f"steps: {trace.n_steps}")
        out = view.public_output.rstrip(b"\\0")
        if out:
            print(f"output bytes: {out.hex()}")
        if view.debug_logs:
            print("logs:", view.logs_text())
        return 0 if view.exit_code == 0 else 1

    if args.cmd == "prove":
        t0 = time.time()
        with prof_ctx as prof:
            view, proof = prover.prove_with_input(
                public_input=_input_bytes(args), private_input=priv)
        if prof is not None:
            print(prof.report(), file=sys.stderr)
        blob = bundle_to_bytes(view, proof)
        with open(args.output, "wb") as f:
            f.write(blob)
        print(f"exit code {view.exit_code}; proof bundle "
              f"{len(blob) / 1024:.0f} KiB -> {args.output} "
              f"in {time.time() - t0:.1f}s")
        return 0


if __name__ == "__main__":
    sys.exit(main())
