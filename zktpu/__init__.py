"""zktpu — TPU-native zero-knowledge proof primitives.

A brand-new JAX/XLA/Pallas framework with the capabilities of the four Rust
crates in sota-zk-labs/zkp-implementation (KZG, FRI, PLONK, Nova), rebuilt
TPU-first: limb-decomposed Montgomery field kernels, Pippenger MSM, radix-2
NTT, vectorized SHA-256 Merkle hashing, and shard_map-based multi-chip
distribution.  See SURVEY.md for the structural map of the reference.
"""
import os

# Persistent XLA compilation cache: field-limb kernels have large graphs, so
# caching compiled executables across processes matters.
_cache_dir = os.environ.get("ZKTPU_JAX_CACHE", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
try:
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:  # pragma: no cover - cache is best-effort
    pass

__version__ = "0.1.0"
