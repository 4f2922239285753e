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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# XLA:CPU `executable.serialize()` SEGFAULTS on this box for certain
# executables (compilation_cache.py:265; reproduced four times in round 5,
# always ~60 tests into the full suite at the affine-MSM graph, never in
# isolation; nulling the zstd compressor did NOT help, pinning the fault in
# serialize itself).  The only robust mitigation is to never write cache
# entries from CPU test processes — serialize is only called on the write
# path.  Reads stay enabled; TPU bench processes (separate interpreters,
# no conftest) keep their warm cache.  The env var makes zktpu/__init__.py
# (imported after this file) preserve the setting instead of re-enabling
# writes at import time.
os.environ["ZKTPU_CACHE_WRITE"] = "0"
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
