"""Multi-workload benchmark harness: per-stage speeds to CSV.

Counterpart of the reference benchmark suite
(`/root/reference/benchmarks/src/{models,runner}.rs`,
`benchmarks/benches/integration_bench.rs:26-60`): measures each stage
(native-ish emulation via the C core, trace generation, proving,
verification) in kHz (steps/sec) over fib and keccak workload ladders
and writes a CSV.

    python benchmarks/run.py [--cpu] [--out results.csv]
             [--workloads fib:12,fib:14 keccak:2]
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

EXIT = """
    addi a0, zero, 0
    addi a7, zero, 0x201
    ecall
"""


def fib_guest(log_steps: int) -> str:
    iters = max(1, ((1 << log_steps) - 16) // 5)
    return f"""
        li   t0, {iters}
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
    """ + EXIT


def keccak_guest(n_perms: int) -> str:
    return f"""
        addi a7, zero, 0x403
        ecall
        mv   t1, a0
        li   t0, {n_perms}
    loop:
        keccakf x0, t1, x0
        addi t0, t0, -1
        bne  t0, zero, loop
        lw   t2, 0x84(zero)
        lw   t3, 0(t1)
        sw   t3, 0(t2)
    """ + EXIT


def run_workload(name: str, source: str, prove: bool = True,
                 machine2: bool = False):
    from nexus_zkvm_tpu.vm import asm, k_trace
    from nexus_zkvm_tpu.vm.native_trace import native_available
    if machine2:
        from nexus_zkvm_tpu.machine2 import (
            prove_machine2 as prove_machine,
            verify_machine2 as verify_machine)
    else:
        from nexus_zkvm_tpu.machine import prove_machine, verify_machine

    words = asm.assemble(source)
    backend = "auto"
    row = {"workload": name}

    t0 = time.perf_counter()
    view, trace = k_trace(words, backend=backend)
    t_trace = time.perf_counter() - t0
    n = trace.n_steps
    row["steps"] = n
    row["emulator"] = ("native" if native_available()
                       and "keccakf" not in source else "python")
    row["trace_khz"] = round(n / t_trace / 1e3, 2)

    if prove:
        proof = prove_machine(view, trace)       # warm-up (compiles)
        t0 = time.perf_counter()
        proof = prove_machine(view, trace)
        t_prove = time.perf_counter() - t0
        row["prove_khz"] = round(n / t_prove / 1e3, 3)
        row["prove_s"] = round(t_prove, 2)
        t0 = time.perf_counter()
        ok = verify_machine(view, proof)
        t_verify = time.perf_counter() - t0
        assert ok
        row["verify_s"] = round(t_verify, 2)
        row["proof_kib"] = round(proof.size_estimate() / 1024, 1)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="bench_results.csv")
    ap.add_argument("--no-prove", action="store_true")
    ap.add_argument("--machine2", action="store_true",
                    help="benchmark the per-instruction-family prover")
    ap.add_argument("--workloads", nargs="*",
                    default=["fib:10", "fib:12", "fib:14", "keccak:2"])
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")

    rows = []
    for spec in args.workloads:
        kind, _, param = spec.partition(":")
        if kind == "fib":
            src, name = fib_guest(int(param)), f"fib-2^{param}"
        elif kind == "keccak":
            src, name = keccak_guest(int(param)), f"keccak-{param}"
        else:
            raise SystemExit(f"unknown workload {spec}")
        print(f"== {name}", flush=True)
        row = run_workload(name, src, prove=not args.no_prove,
                           machine2=args.machine2)
        print(row, flush=True)
        rows.append(row)

    keys = sorted({k for r in rows for k in r},
                  key=lambda k: (k != "workload", k))
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys)
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
