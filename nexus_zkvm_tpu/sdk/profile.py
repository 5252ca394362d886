"""Host-side function profiling for SDK users.

Counterpart of the reference's ``#[nexus_sdk_macros::profile]``
(`/root/reference/sdk/macros/src/pprof.rs:7-40`), which wraps a host
function with a pprof guard and writes a ``.pb`` profile file.  The
TPU-native rendering: the wrapped call runs under the framework's
phase profiler (`utils/profile.py` — wall-clock where the host blocks:
device round trips, transfers, compile stalls) and writes a plain-text
phase-tree report next to the process, one file per call.

Usage::

    from nexus_zkvm_tpu.sdk import profile

    @profile("prove")                       # -> prove.<n>.profile.txt
    def run(guest):
        return prover.prove(guest)

Nested ``@profile`` calls compose: inner functions appear as scopes in
the outer report instead of writing their own file (matching the
reference's guard semantics, `pprof.rs:19-27`).
"""

from __future__ import annotations

import functools
import os

from ..utils.profile import Profiler, active_profiler, profiled, scope

__all__ = ["profile"]

_counter = [0]


def profile(name: str | None = None, dir: str | None = None):
    """Decorator: profile the wrapped call's host phases to a file.

    name: report basename (defaults to the function name).
    dir: output directory (defaults to ``NZT_PROFILE_DIR`` or cwd).
    """

    def wrap(fn):
        base = name or fn.__name__

        @functools.wraps(fn)
        def inner(*args, **kwargs):
            if active_profiler() is not None:
                # nested: record as a scope of the active profile
                with scope(f"profile:{base}"):
                    return fn(*args, **kwargs)
            with profiled() as prof:
                out = fn(*args, **kwargs)
            _counter[0] += 1
            d = dir or os.environ.get("NZT_PROFILE_DIR") or os.getcwd()
            path = os.path.join(d, f"{base}.{_counter[0]}.profile.txt")
            with open(path, "w") as f:
                f.write(prof.report())
            inner.last_report_path = path
            return out

        inner.last_report_path = None
        return inner

    return wrap
