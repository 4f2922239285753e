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

# The compile-cache writer (compilation_cache.put_executable_and_time ->
# zstandard.backend_c / executable.serialize) has segfaulted this box for
# some freshly compiled XLA:CPU executables (three times in round 5, always
# ~60 tests into the full suite around the affine-MSM graph; never in
# isolation).  Force the cache onto the pure-python zlib compressor by
# nulling the module globals compress/decompress_executable check —
# sys.modules blocking is useless here because the axon sitecustomize
# imports jax (and thus zstandard) at interpreter startup, before any
# conftest runs.  Old zstd-compressed entries read as cache misses.
import jax._src.compilation_cache as _cc  # noqa: E402

_cc.zstandard = None
_cc.zstd = None
