"""Host-side utilities: profiling, progress display.

TPU-native counterparts of the reference's host ergonomics — the
`cycles` host profiler (`/root/reference/sdk/macros/src/pprof.rs:7-40`)
and the CLI progress bar (`/root/reference/cli/progress-bar/src/lib.rs`).
"""

from .profile import Profiler, profiled, scope, active_profiler
from .progress import enable_progress, disable_progress

__all__ = ["Profiler", "profiled", "scope", "active_profiler",
           "enable_progress", "disable_progress"]
