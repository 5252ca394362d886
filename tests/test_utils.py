"""Host profiler + progress display tests (utils/)."""

import io
import sys

from nexus_zkvm_tpu.utils import profiled, scope
from nexus_zkvm_tpu.utils import progress as prog_mod
from nexus_zkvm_tpu.utils.progress import (enable_progress,
                                           disable_progress)


def test_profiler_records_nested_scopes():
    with profiled() as prof:
        with scope("outer"):
            with scope("inner"):
                pass
        with scope("outer"):
            pass
    assert prof.counts["outer"] == 2
    assert prof.counts["outer/inner"] == 1
    assert prof.times["outer"] >= prof.times["outer/inner"]
    rep = prof.report(min_share=0.0)
    assert "outer" in rep and "inner" in rep and "(wall)" in rep
    assert set(prof.phase_seconds()) == {"outer"}


def test_scope_noop_without_profiler():
    with scope("anything"):
        x = 1
    assert x == 1


def test_profiler_nesting_restored_after_exception():
    with profiled() as prof:
        try:
            with scope("a"):
                raise ValueError
        except ValueError:
            pass
        with scope("b"):
            pass
    assert prof.counts["a"] == 1
    assert prof.counts["b"] == 1      # not "a/b": stack unwound


def test_progress_ticker_writes_stderr():
    old = sys.stderr
    sys.stderr = io.StringIO()
    try:
        enable_progress()
        with scope("phase-x"):
            with scope("nested"):     # nested phases stay silent
                pass
        out = sys.stderr.getvalue()
    finally:
        disable_progress()
        prog_mod._DEPTH = 0
        sys.stderr = old
    assert "phase-x" in out
    assert "nested" not in out


def test_progress_off_by_default():
    old = sys.stderr
    sys.stderr = io.StringIO()
    try:
        with scope("quiet"):
            pass
        out = sys.stderr.getvalue()
    finally:
        sys.stderr = old
    assert out == ""
