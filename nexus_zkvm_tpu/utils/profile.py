"""Host profiler: nested wall-clock phase timing for the prover.

Counterpart of the reference SDK's host profiling macros
(`/root/reference/sdk/macros/src/pprof.rs:7-40`), redesigned for the
TPU execution model: what matters on this hardware is *where the host
blocks* — device dispatch round-trips over the interconnect, transfers,
and compile stalls — so the profiler records wall time per named nested
scope and reports a tree with counts, totals, and share of the root.

Usage::

    from nexus_zkvm_tpu.utils import profiled, scope

    with profiled() as prof:
        proof = prove_machine(view, trace)
    print(prof.report())

Library code marks phases with ``with scope("fri"): ...`` — a no-op
(two dict lookups) when no profiler is active, so instrumentation can
stay in the hot paths permanently.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

__all__ = ["Profiler", "profiled", "scope", "active_profiler"]

_ACTIVE: "Profiler | None" = None


class Profiler:
    def __init__(self):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}
        self._stack: list[str] = []
        self._t0 = time.perf_counter()

    # -- recording ----------------------------------------------------
    def _enter(self, name: str) -> float:
        self._stack.append(name)
        return time.perf_counter()

    def _exit(self, t_start: float) -> None:
        dt = time.perf_counter() - t_start
        key = "/".join(self._stack)
        self.times[key] = self.times.get(key, 0.0) + dt
        self.counts[key] = self.counts.get(key, 0) + 1
        self._stack.pop()

    # -- reporting ----------------------------------------------------
    def total(self) -> float:
        return time.perf_counter() - self._t0

    def report(self, min_share: float = 0.005) -> str:
        """Indented tree of scopes: total seconds, calls, % of wall."""
        wall = self.total()
        lines = [f"{'scope':<44} {'total_s':>9} {'calls':>7} {'%':>6}"]
        for key in sorted(self.times,
                          key=lambda k: (k.count("/"),
                                         -self.times[k])):
            share = self.times[key] / wall if wall else 0.0
            if share < min_share:
                continue
            depth = key.count("/")
            label = ("  " * depth) + key.rsplit("/", 1)[-1]
            lines.append(f"{label:<44} {self.times[key]:>9.3f} "
                         f"{self.counts[key]:>7d} {100 * share:>5.1f}%")
        lines.append(f"{'(wall)':<44} {wall:>9.3f}")
        return "\n".join(lines)

    def phase_seconds(self) -> dict[str, float]:
        """Top-level phase -> seconds (for bench JSON detail)."""
        return {k: round(v, 3) for k, v in self.times.items()
                if "/" not in k}


@contextmanager
def profiled():
    """Activate a fresh profiler for the enclosed block."""
    global _ACTIVE
    prev = _ACTIVE
    prof = Profiler()
    _ACTIVE = prof
    try:
        yield prof
    finally:
        _ACTIVE = prev


def active_profiler():
    return _ACTIVE


@contextmanager
def scope(name: str):
    """Time a named phase under the active profiler (cheap no-op when
    none is active). Also drives the progress display, if enabled."""
    from . import progress as _prog
    prof = _ACTIVE
    shown = _prog.phase_enter(name)
    if prof is None:
        try:
            yield
        finally:
            _prog.phase_exit(name, shown)
        return
    t0 = prof._enter(name)
    try:
        yield
    finally:
        prof._exit(t0)
        _prog.phase_exit(name, shown)
