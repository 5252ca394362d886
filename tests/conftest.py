"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real-TPU runs are done by bench.py / the driver; unit tests must be
hermetic and exercise the multi-chip sharding paths, so we force the CPU
platform with 8 virtual devices BEFORE jax initializes.
"""
import os
import sys

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session's axon/TPU default
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402  (must come after the env setup above)

# The environment pre-seeds jax_platforms="axon,cpu" (TPU-tunnel plugin) at
# the config level, which overrides JAX_PLATFORMS — force pure CPU here.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: DISABLED for local CPU runs in this
# environment.  jaxlib nondeterministically SEGFAULTS serializing some
# XLA:CPU executables into the cache (put_executable_and_time), and the
# TPU-tunnel plugin's remote AOT compiles poison the cache with entries
# built for the remote host's CPU features (avx512/amx -> SIGILL on
# read).  The flags are memoized inside jax's cache machinery, so the
# only reliable point to turn the cache off is before the first
# compile — here.
jax.config.update("jax_enable_compilation_cache", False)
