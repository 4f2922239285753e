"""Tracing / profiling and debug-validation hooks (SURVEY.md §5).

The reference has no observability beyond println lines
(plonk/src/prover.rs:62, fri/src/prover.rs:59-62); the TPU build exposes:

* ``maybe_trace(name)`` — context manager.  When ``ZKTPU_PROFILE`` is set,
  wraps the block in ``jax.profiler.trace`` and writes a Perfetto/TensorBoard
  trace under ``$ZKTPU_PROFILE`` (a directory path, or ``1`` for
  ``./zktpu_traces``).  Combined with the ``jax.named_scope`` round
  annotations in the provers, the trace shows per-round / per-kernel device
  time.  No-op (zero overhead) when the env var is unset.

* per-phase wall timings: provers accept ``timings=dict`` and fill
  ``{phase: seconds}`` (see plonk/prover.py::generate_proof).

* ``ZKTPU_DEBUG=1`` — sanitizer mode (the JAX analogue of the reference's
  debug asserts): layer-boundary validation that decoded field elements are
  canonical (< p, digits in range) and that points leaving the device are on
  the curve.  Raises ``AssertionError`` with context on violation.  Off by
  default; costs one host pass per checked boundary when on.
"""
from __future__ import annotations

import contextlib
import os


def profile_dir() -> str | None:
    v = os.environ.get("ZKTPU_PROFILE")
    if not v:
        return None
    return "./zktpu_traces" if v == "1" else v


@contextlib.contextmanager
def maybe_trace(name: str):
    """jax.profiler.trace around the block iff ZKTPU_PROFILE is set."""
    d = profile_dir()
    if d is None:
        yield
        return
    import jax

    os.makedirs(d, exist_ok=True)
    with jax.profiler.trace(d):
        with jax.named_scope(name):
            yield


def debug_enabled() -> bool:
    return os.environ.get("ZKTPU_DEBUG", "0") not in ("", "0", "false", "off")


def check_canonical(field, values, where: str = "") -> None:
    """Assert host ints are canonical field elements (0 <= v < p)."""
    if not debug_enabled():
        return
    p = field.modulus
    for i, v in enumerate(values):
        assert 0 <= v < p, (
            f"ZKTPU_DEBUG: non-canonical field element at {where}[{i}]: "
            f"{hex(v)} not in [0, {hex(p)})"
        )


def check_on_curve(points, where: str = "") -> None:
    """Assert host affine points satisfy y^2 = x^3 + 4 (or are identity)."""
    if not debug_enabled():
        return
    for i, pt in enumerate(points):
        assert pt.is_on_curve(), (
            f"ZKTPU_DEBUG: off-curve point at {where}[{i}]: "
            f"x={hex(pt.x)} y={hex(pt.y)}"
        )
