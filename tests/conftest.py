"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's test strategy (SURVEY.md §4): unit tests run everywhere;
multi-chip sharding is exercised on a simulated 8-device CPU backend via
``--xla_force_host_platform_device_count`` (the TPU analogue of testing
distributed code without a pod).

Note: this environment pins JAX_PLATFORMS=axon (a remote-TPU tunnel) via a
sitecustomize hook, so we must override the platform *after* importing jax —
the env var alone is not enough.  Eager dispatch over the tunnel is ~5ms/op,
which would make the limb-arithmetic test suite take hours.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The zstandard writer (compilation_cache.put_executable_and_time ->
# zstandard.backend_c) segfaults on this box for some freshly compiled
# XLA:CPU executables (observed twice in round 5 for the affine-MSM graph).
# Blocking the module BEFORE jax imports makes jax._src.compilation_cache
# fall back to zlib (compilation_cache.py:191-198) — same cache, safe
# writer, warm reruns.  Old zstd-compressed entries read as cache misses.
import sys

sys.modules["zstandard"] = None  # noqa: E402  (must precede `import jax`)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
