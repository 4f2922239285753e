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
