"""Disk-backed ahead-of-time program store for the prover's XLA programs.

Why this exists (TPU-first): a full machine prove runs ~100 distinct
XLA programs (per-component interaction generation and composition
evaluation, CFFT/LDE stacks, Merkle climbs, FRI folds, quotient
accumulation). Under plain ``jax.jit`` every *process* pays Python
tracing + StableHLO lowering for each of them — ~2 minutes of host work
before the first proof, even when the XLA persistent compile cache is
warm (it only skips the backend compile, not tracing/lowering). The
reference amortizes the equivalent cost at `cargo build` time; a
Python/JAX framework has to amortize it at *export* time instead.

Mechanism: every prover program goes through :func:`aot_call`, which
keys on (site key, argument avals, backend, jax version) and

* reuses an in-process ``Exported`` if one is cached,
* else deserializes one from the on-disk store (~1 ms; no tracing,
  no lowering — the serialized artifact IS the StableHLO),
* else traces + exports once and writes the artifact back.

The XLA persistent compile cache (configured by callers/bench) then
makes the per-process backend compile a lookup as well, so a warm
machine proves within seconds of process start.

Sharded runs (an active mesh, or explicitly disabled stores) fall back
to ordinary ``jax.jit`` — exported programs pin the export-time device
topology, while mesh runs want the SPMD partitioner to see the live
sharding.

Reference analogue: none — stwo is compiled Rust; this is the piece of
the runtime that JAX needs to reach the same "compile once, run many"
shape (`/root/reference/Cargo.toml:43-52` pins the prover engine as a
build-time dependency for the same reason).
"""

from __future__ import annotations

import hashlib
import os
import threading

import jax
import numpy as np

__all__ = ["aot_call", "store_dir", "clear_memory_cache"]

# Bump when kernel semantics change incompatibly with stored artifacts
# (the aval key catches shape/dtype changes; this catches math changes).
_STORE_VERSION = "v2"

_mem: dict = {}
_jit_mem: dict = {}
_lock = threading.Lock()


def store_dir() -> str:
    """Artifact directory: keyed by jax version + backend so stale
    artifacts from another environment are never loaded."""
    base = os.environ.get("NZT_PROGRAM_STORE")
    if not base:
        base = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".nzt_programs")
    d = os.path.join(
        base, f"{_STORE_VERSION}-jax{jax.__version__}-"
              f"{jax.default_backend()}")
    return d


def clear_memory_cache() -> None:
    with _lock:
        _mem.clear()
        _jit_mem.clear()


def _aval_sig(args):
    flat, treedef = jax.tree.flatten(args)
    sig = tuple((tuple(x.shape), str(np.asarray(x).dtype)
                 if not hasattr(x, "dtype") else str(x.dtype))
                for x in flat)
    return sig, str(treedef)


def _disabled() -> bool:
    if os.environ.get("NZT_NO_PROGRAM_STORE"):
        return True
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") and \
            jax.default_backend() == "cpu":
        # The TPU-tunnel plugin routes the export/AOT pipeline's
        # backend compiles to the REMOTE host — including CPU-target
        # compiles, which come back built for the remote machine's CPU
        # features (avx512/amx) and abort/SIGILL locally (and poison
        # the persistent cache with foreign-feature entries).  Plain
        # jax.jit compiles locally and is safe; the export store only
        # pays off on the tunneled TPU backend anyway.
        return True
    from ..parallel.context import active_mesh
    return active_mesh() is not None


def aot_call(site_key, fn, *args):
    """Run ``fn(*args)`` as a stored ahead-of-time XLA program.

    ``site_key`` must capture everything that shapes the traced graph
    besides the argument avals (component identity, static sizes...).
    ``fn`` must be pure and weak-ref-free (it is only traced on a store
    miss). Falls back to a cached ``jax.jit`` under an active mesh.
    """
    flat = jax.tree.leaves(args)
    if any(isinstance(x, jax.core.Tracer) for x in flat):
        # already under an outer trace: inline into the caller's graph
        return fn(*args)
    sig, tdef = _aval_sig(args)
    key = (site_key, sig, tdef)
    if _disabled():
        with _lock:
            fj = _jit_mem.get(key)
            if fj is None:
                fj = jax.jit(fn)
                _jit_mem[key] = fj
        return fj(*args)

    with _lock:
        exp = _mem.get(key)
    if exp is None:
        exp = _load_or_export(key, fn, args)
        with _lock:
            _mem[key] = exp
    if jax.default_backend() == "cpu":
        # jaxlib SEGFAULTS serializing an XLA:CPU executable that was
        # compiled from a deserialized exported program into the
        # persistent compile cache (AOT/portable pipeline) — and such
        # entries carry foreign machine-feature flags that poison later
        # processes.  The enable/dir config flags are memoized inside
        # jax's cache machinery, so the only reliable off-switch is the
        # write entry point itself: every exported-program call runs
        # with `put_executable_and_time` neutered.  XLA:CPU compiles
        # are fast locally; skipping their cache writes costs nothing.
        if _install_put_guard():
            _PUT_GUARD.depth = getattr(_PUT_GUARD, "depth", 0) + 1
            try:
                return exp.call(*args)
            finally:
                _PUT_GUARD.depth -= 1
        prev = jax.config.jax_enable_compilation_cache
        jax.config.update("jax_enable_compilation_cache", False)
        try:
            return exp.call(*args)
        finally:
            jax.config.update("jax_enable_compilation_cache", prev)
    return exp.call(*args)


_PUT_GUARD = threading.local()
_PUT_GUARD_INSTALLED = [False]


def _install_put_guard() -> bool:
    """Returns True when the cache-write guard is active.  The patch
    targets a private jax symbol; if a jax upgrade renames it, fall
    back to disabling the compilation cache flag for exported-program
    calls (weaker — the flag is memoized in places — but never an
    AttributeError at prove time)."""
    if _PUT_GUARD_INSTALLED[0]:
        return _PUT_GUARD_INSTALLED[0] is True
    with _lock:
        if _PUT_GUARD_INSTALLED[0]:
            return _PUT_GUARD_INSTALLED[0] is True
        try:
            from jax._src import compilation_cache as _cc
            orig = _cc.put_executable_and_time

            def guarded(*a, **k):
                if getattr(_PUT_GUARD, "depth", 0):
                    return None
                return orig(*a, **k)

            _cc.put_executable_and_time = guarded
            _PUT_GUARD_INSTALLED[0] = True
        except (ImportError, AttributeError):
            _PUT_GUARD_INSTALLED[0] = "fallback"
    return _PUT_GUARD_INSTALLED[0] is True


def _key_digest(key) -> str:
    return hashlib.sha256(repr(key).encode()).hexdigest()[:32]


def _load_or_export(key, fn, args):
    from jax import export as jexport
    d = store_dir()
    path = os.path.join(d, _key_digest(key) + ".nzp")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                return jexport.deserialize(f.read())
        except Exception:
            pass          # stale/corrupt artifact: fall through, re-export
    exp = jexport.export(jax.jit(fn))(*args)
    try:
        os.makedirs(d, exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(exp.serialize())
        os.replace(tmp, path)
        with open(os.path.join(d, "index.txt"), "a") as f:
            f.write(f"{_key_digest(key)}  {key!r}\n")
    except OSError:
        pass              # read-only store: still usable in-memory
    return exp
