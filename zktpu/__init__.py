"""zktpu — TPU-native zero-knowledge proof primitives.

A brand-new JAX/XLA/Pallas framework with the capabilities of the four Rust
crates in sota-zk-labs/zkp-implementation (KZG, FRI, PLONK, Nova), rebuilt
TPU-first: limb-decomposed Montgomery field kernels, Pippenger MSM, radix-2
NTT, vectorized SHA-256 Merkle hashing, and shard_map-based multi-chip
distribution.  See SURVEY.md for the structural map of the reference.
"""
import hashlib
import os
import platform

# Persistent XLA compilation cache: field-limb kernels have large graphs, so
# caching compiled executables across processes matters.
#
# The cache key jax uses does NOT include the host CPU's feature set, and
# XLA:CPU AOT executables are not portable across machines — loading an
# entry compiled on a host with a different ISA (e.g. AMX/AVX-512 variants)
# silently produces executables that hang or SIGILL.  Scope the cache
# directory by the actual CPU feature set (hash of /proc/cpuinfo 'flags'),
# not the hostname: hostnames can collide across different-ISA container
# hosts and ephemeral hostnames would needlessly defeat the cache.


def _isa_fingerprint() -> str:
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line.split(":", 1)[1].strip()
                    break
    except OSError:
        flags = platform.processor()
    digest = hashlib.sha256(flags.encode()).hexdigest()[:12]
    return f"{platform.machine()}-{digest}"


_fingerprint = _isa_fingerprint()
_cache_root = os.environ.get(
    "ZKTPU_JAX_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
_cache_dir = os.path.join(_cache_root, _fingerprint)
try:
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # ZKTPU_CACHE_WRITE=0 keeps cache READS but never writes: the zstd write
    # path segfaults on this box for some fresh XLA:CPU executables.  The
    # gate must live HERE (not only in tests/conftest.py): this import runs
    # after conftest and would otherwise clobber its config.update — which
    # is exactly how the r05 full-suite segfault happened.
    if os.environ.get("ZKTPU_CACHE_WRITE", "1") in ("0", "false", "off"):
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
    else:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass

__version__ = "0.1.0"
