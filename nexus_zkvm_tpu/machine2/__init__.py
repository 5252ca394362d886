"""machine2 — the per-instruction-family prover generation.

Counterpart of the reference's second prover generation (`prover2/`,
`/root/reference/prover2/machine/src/lib.rs:9-65`): instead of one
monolithic CPU component whose ~120 columns every row pays for, the
execution trace is split into **per-instruction-family components**
(ALU adds, bitwise, shifts, compares, branches, jumps, loads, stores,
syscalls, M-ext / keccak / precompile dispatch), each sized to the
power-of-two of its own step count and carrying only the columns that
family needs (~35-60).

The families connect through the same LogUp relations the monolithic
machine already uses — `exec` (clk, pc continuation; reference
analogue `ProgramExecution`, `prover2/machine/src/lookups/
relations.rs:1-95`), `reg`, `mem`, `prog` and the range/bitwise/shift
tables — so the memory-side components (`machine/memside.py`), the
M-extension / keccak / precompile circuits and the lookup tables are
shared unchanged between the two generations.

TPU-first rationale: committed area (and therefore LDE + Merkle +
interaction-generation work, the dominant prover cost) shrinks to the
sum of family_count x family_width instead of trace_len x 120, while
every fill and constraint stays a fixed-shape vectorized program.
"""

from .driver import prove_machine2, verify_machine2, build_machine2_traces
from .exec_components import EXEC_FAMILIES

__all__ = ["prove_machine2", "verify_machine2", "build_machine2_traces",
           "EXEC_FAMILIES"]
