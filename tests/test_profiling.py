"""Observability + sanitizer hooks (SURVEY.md §5: tracing, debug modes).

The reference has neither (plonk/src/prover.rs:62 println is its tracing);
these tests pin the TPU build's replacements: per-round prover timings,
the ZKTPU_PROFILE trace context, and the ZKTPU_DEBUG layer-boundary
sanitizers.
"""
import os

import pytest

from zktpu import profiling


def test_maybe_trace_noop_when_unset(monkeypatch):
    monkeypatch.delenv("ZKTPU_PROFILE", raising=False)
    with profiling.maybe_trace("x"):
        pass  # must not require jax.profiler or create directories


def test_debug_checks_disabled_by_default(monkeypatch):
    monkeypatch.delenv("ZKTPU_DEBUG", raising=False)
    from zktpu.fields.host import FR

    # out-of-range value passes silently when the sanitizer is off
    profiling.check_canonical(FR, [FR.modulus + 1], "t")


def test_debug_canonical_check_fires(monkeypatch):
    monkeypatch.setenv("ZKTPU_DEBUG", "1")
    from zktpu.fields.host import FR

    profiling.check_canonical(FR, [0, FR.modulus - 1], "ok")
    with pytest.raises(AssertionError, match="non-canonical"):
        profiling.check_canonical(FR, [FR.modulus], "bad")


def test_debug_on_curve_check_fires(monkeypatch):
    monkeypatch.setenv("ZKTPU_DEBUG", "1")
    from zktpu.curves.host_curve import G1Affine

    profiling.check_on_curve([G1Affine.generator(), G1Affine.identity()], "ok")
    with pytest.raises(AssertionError, match="off-curve"):
        profiling.check_on_curve([G1Affine(1, 1)], "bad")


def test_decode_ints_sanitizer_pass(monkeypatch):
    monkeypatch.setenv("ZKTPU_DEBUG", "1")
    from zktpu.fields.host import FR
    from zktpu.fields.fp import device_field

    frd = device_field(FR)
    vals = [0, 1, FR.modulus - 1, 12345]
    assert frd.decode_ints(frd.encode_ints(vals)) == vals


def test_prover_timings_dict():
    """generate_proof(timings=...) reports per-round wall seconds."""
    from zktpu.kzg import Srs
    from zktpu.plonk.prover import generate_proof
    from zktpu.plonk.synthetic import synthetic_mul_chain
    from zktpu.transcript.chacha import StdRng

    circuit = synthetic_mul_chain(3, seed=2)
    srs = Srs.new_from_secret(0x77, circuit.size)
    timings: dict = {}
    generate_proof(circuit, srs, StdRng.from_seed_u64(5), timings=timings)
    assert timings, "expected per-round timings"
    assert all(isinstance(v, float) and v >= 0 for v in timings.values())
    assert any("round" in k for k in timings)
