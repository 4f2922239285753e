"""Size-tier configuration: host scalar path vs device kernel path.

TPU kernels are throughput machines: a 2^20-point MSM or NTT saturates the
VPU, but a 16-point commit is pure dispatch latency (and, on the CPU test
backend, pure XLA compile time).  Every hot primitive therefore dispatches by
size — below the threshold it runs on the host bignum path (identical
semantics, microseconds at these sizes), above it on the device kernels.
Thresholds are env-overridable; set them to 0 to force everything onto the
device (used by the device-path unit tests).
"""
from __future__ import annotations

import os


def _env_int(name: str, default: int) -> int:
    return int(os.environ.get(name, default))


# KZG commit: host double-and-add below, device Pippenger above.
HOST_MSM_MAX = _env_int("ZKTPU_HOST_MSM_MAX", 64)
# SRS sizes small enough to decode to host affine points for the host MSM.
HOST_MSM_SRS_MAX = _env_int("ZKTPU_HOST_MSM_SRS_MAX", 4096)
# NTT/iNTT: host radix-2 below, device butterfly kernel above.
HOST_NTT_MAX = _env_int("ZKTPU_HOST_NTT_MAX", 128)
# Dense poly ops (mul / linear & vanishing division): host below.
HOST_POLY_MAX = _env_int("ZKTPU_HOST_POLY_MAX", 128)

# Pallas fused Montgomery-mul kernel: "auto" = on TPU backends only.
USE_PALLAS = os.environ.get("ZKTPU_USE_PALLAS", "auto")
# Minimum flattened batch for the kernel (smaller batches stay on the
# jnp path: launch+pad overhead beats the fusion win).
PALLAS_MIN_BATCH = _env_int("ZKTPU_PALLAS_MIN_BATCH", 256)


def pallas_enabled() -> bool:
    if USE_PALLAS == "auto":
        import jax

        try:
            return jax.default_backend() == "tpu"
        except Exception:
            return False
    return USE_PALLAS not in ("0", "false", "off")


# MSM coordinate backend: "rns" (Montgomery-RNS residues, fields/rns.py) or
# "digit" (positional 16-bit-digit Montgomery, fields/fp.py).  "auto" = RNS
# on TPU backends (measured 1.98x the digit path at 2^20: NOTES_PERF.md
# round 5 — the carry-free RNS group law fuses into one XLA kernel chain,
# while the digit path pays pallas kernel-boundary costs per point add),
# digit elsewhere (identical results either way; CPU tests exercise both).
MSM_BACKEND = os.environ.get("ZKTPU_MSM_BACKEND", "auto")


def msm_backend() -> str:
    if MSM_BACKEND == "auto":
        import jax

        try:
            return "rns" if jax.default_backend() == "tpu" else "digit"
        except Exception:
            return "digit"
    return MSM_BACKEND


# PLONK quotient: circuit sizes up to this use the exact 8n-domain
# permutation-part division; above it the evaluation-form 4n path (same
# result for honest witnesses, deg(t23) <= 3n+5 < 4n; see
# plonk/prover.py::_quotient_coset) keeps the largest FFT inside HBM.
QUOTIENT_8N_MAX_N = _env_int("ZKTPU_QUOTIENT_8N_MAX_N", 1 << 19)
