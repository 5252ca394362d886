"""Benchmark: RV32 machine proving throughput (trace rows proved/sec).

The driver runs this on real TPU hardware and records the JSON line.
North-star metric (BASELINE.md): trace rows proved/sec/chip at the
2^16-2^20 ladder (BASELINE.json configs 2); the reference publishes no
numbers (BASELINE.json.published = {}), so vs_baseline is reported
against a fixed nominal target of 100k rows/s (the reference CPU
prover's order of magnitude on comparable log sizes, per prover-benches
workloads 2^18-2^20).

Default emits ONE JSON line whose headline value is the LARGEST ladder
size's throughput, with the full ladder (and a keccak-workload line)
in detail. Usage:
    python bench.py [--log-size 16,18,20] [--keccak-log 16] [--cpu]
                    [--machine2] [--segment-log N] [--stream]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NOMINAL_ROWS_PER_SEC = 100_000.0


def build_workload(log_size: int):
    """A fib-style guest sized to ~2^log_size trace rows."""
    from nexus_zkvm_tpu.vm import asm, k_trace
    target = (1 << log_size) - 16
    iters = max(1, target // 5)          # 5 instructions per loop
    src = f"""
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
        addi a0, zero, 0
        addi a7, zero, 0x201
        ecall
    """
    return k_trace(asm.assemble(src), backend="auto")


def build_keccak_workload(log_size: int):
    """The keccak example guest sized so the keccak AIR component
    reaches 2^log_size rows (BLOCK rows per permutation) — exercises
    the bit-decomposed keccak circuit instead of fib padding.
    Counterpart of the reference keccak ladder
    (`/root/reference/benchmarks/benches/integration_bench.rs:26-60`)."""
    from nexus_zkvm_tpu.machine.keccak import BLOCK
    from nexus_zkvm_tpu.sdk import Guest, encode_u32s
    from nexus_zkvm_tpu.vm import k_trace
    n_perm = max(1, (1 << log_size) // BLOCK)
    here = os.path.dirname(os.path.abspath(__file__))
    src = open(os.path.join(here, "examples", "guests",
                            "keccak.s")).read()
    g = Guest.from_asm(src)
    # keccak.s reads the first input word as the permutation count
    return k_trace(g.program_words, entry=g.entry,
                   public_input=encode_u32s(n_perm),
                   backend="python")


def run_one(args, prove_machine, verify_machine, builder, log_size):
    from nexus_zkvm_tpu.utils import profiled

    t0 = time.perf_counter()
    view, trace = builder(log_size)
    t_trace = time.perf_counter() - t0
    n_rows = trace.n_steps

    # warm-up run compiles every kernel (cached for the timed run);
    # skipped at huge sizes (--warmup-below) where a second full prove
    # would dominate wall clock — the persistent program store makes
    # the single timed run near-warm anyway
    if log_size < args.warmup_below:
        prove_machine(view, trace)
    t0 = time.perf_counter()
    with profiled() as prof:
        proof = prove_machine(view, trace)
    t_prove = time.perf_counter() - t0
    if args.profile:
        print(f"--- prove log={log_size} ---", file=sys.stderr)
        print(prof.report(), file=sys.stderr, flush=True)

    if args.skip_verify:
        t_verify, ok = 0.0, True
    else:
        t0 = time.perf_counter()
        with profiled() as vprof:
            ok = verify_machine(view, proof)
        t_verify = time.perf_counter() - t0
        if args.profile:
            print(f"--- verify log={log_size} ---", file=sys.stderr)
            print(vprof.report(), file=sys.stderr, flush=True)
    assert ok, "proof failed to verify"
    return {
        "n_rows": int(n_rows),
        "log_size": log_size,
        "rows_per_sec": round(n_rows / t_prove, 1),
        # emulation+trace-gen throughput, recorded separately like the
        # reference harness (benchmarks/src/models.rs:8-56)
        "tracegen_steps_per_sec": round(n_rows / max(t_trace, 1e-9), 1),
        "t_trace_s": round(t_trace, 3),
        "t_prove_s": round(t_prove, 3),
        "t_verify_s": round(t_verify, 3),
        "proof_bytes": proof.size_estimate(),
        "phases": prof.phase_seconds(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-size", type=str, default="16,18,20",
                    help="comma-separated fib ladder (default 16,18,20)")
    ap.add_argument("--keccak-log", type=int, default=16,
                    help="keccak-workload size (0 disables)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (tests/dev)")
    ap.add_argument("--profile", action="store_true",
                    help="print a per-phase host profile to stderr")
    ap.add_argument("--skip-verify", action="store_true",
                    help="skip the verification timing")
    ap.add_argument("--machine2", action="store_true",
                    help="use the per-instruction-family machine2 prover")
    ap.add_argument("--warmup-below", type=int, default=21,
                    help="skip the warm-up prove at log sizes >= this")
    ap.add_argument("--segment-log", type=int, default=None,
                    help="split execution into 2^N-step segments (v1)")
    ap.add_argument("--stream", action="store_true",
                    help="ship each segment to device as it fills")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # NOTE: separate cache dir from the CPU test suite — the axon
    # backend's host writes CPU-AOT entries compiled for the REMOTE
    # machine's CPU features; loading those in a local CPU process
    # segfaults (machine-feature mismatch)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)),
                          ".jax_cache" if args.cpu else ".jax_cache_tpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    # persist everything: on a tunneled TPU backend even a micro-op
    # compile is a ~0.4s service round trip, so a ~30ms cache read wins
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    if args.machine2:
        assert args.segment_log is None, \
            "machine2 bounds component sizes per instruction family " \
            "instead of segmenting (see machine2/driver.py docstring)"
        from nexus_zkvm_tpu.machine2 import (
            prove_machine2 as prove_machine,
            verify_machine2 as verify_machine)
    else:
        from nexus_zkvm_tpu.machine import (
            prove_machine as _prove, verify_machine)

        def prove_machine(view, trace):
            return _prove(view, trace, segment_log=args.segment_log,
                          stream=args.stream)

    sizes = [int(s) for s in args.log_size.split(",") if s]
    ladder = []
    for ls in sizes:
        ladder.append(run_one(args, prove_machine, verify_machine,
                              build_workload, ls))
    keccak_entry = None
    if args.keccak_log and not args.machine2:
        k = run_one(args, prove_machine, verify_machine,
                    build_keccak_workload, args.keccak_log)
        # throughput for the keccak shape = dominant (keccak AIR) rows
        k["keccak_rows"] = 1 << args.keccak_log
        k["keccak_rows_per_sec"] = round(
            (1 << args.keccak_log) / k["t_prove_s"], 1)
        keccak_entry = k

    head = ladder[-1]
    rows_per_sec = head["rows_per_sec"]
    print(json.dumps({
        "metric": "trace_rows_proved_per_sec",
        "value": rows_per_sec,
        "unit": "rows/s",
        "vs_baseline": round(rows_per_sec / NOMINAL_ROWS_PER_SEC, 3),
        "detail": {
            "headline_log_size": head["log_size"],
            "machine": "machine2" if args.machine2 else "machine",
            "backend": jax.default_backend(),
            "ladder": ladder,
            "keccak": keccak_entry,
            # headline duplicated flat for easy diffing vs r4
            "n_rows": head["n_rows"],
            "t_trace_s": head["t_trace_s"],
            "t_prove_s": head["t_prove_s"],
            "t_verify_s": head["t_verify_s"],
            "proof_bytes": head["proof_bytes"],
            "phases": head["phases"],
        },
    }))


if __name__ == "__main__":
    main()
