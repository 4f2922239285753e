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

# The persistent compile cache's WRITE path (compilation_cache.
# put_executable_and_time -> zstd) segfaults on this box for some freshly
# compiled XLA:CPU executables (observed for the digit-major mont-mul kernel
# and the affine MSM graph).  Keep cache READS (warm runs stay fast) but
# never write: raise the min-compile-time threshold beyond any real compile.
# The env var makes zktpu/__init__.py (imported AFTER this file, and which
# otherwise re-enables writes) preserve the setting.
os.environ["ZKTPU_CACHE_WRITE"] = "0"
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
