"""NTT / polynomial algebra tests vs host ground truth.

Covers the arkworks capabilities the reference leans on:
interpolate (plonk/src/circuit.rs:175), poly mul chains
(plonk/src/prover.rs:396-428), divide_by_vanishing_poly (prover.rs:404-441),
division by (X - z) (kzg/src/scheme.rs:116), evaluate.
"""
import random

import pytest

from zktpu.fields import host
from zktpu.fields.fp import device_field
from zktpu.poly.domain import get_domain
from zktpu.poly.poly import Poly, poly_from_evals


def _host_eval(coeffs, z, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * z + c) % p
    return acc


@pytest.mark.parametrize("spec", [host.FR, host.GOLDILOCKS], ids=lambda s: s.name)
@pytest.mark.parametrize("n", [1, 2, 8, 64])
def test_fft_matches_naive(spec, n):
    rng = random.Random(n)
    dom = get_domain(spec, n)
    coeffs = [rng.randrange(spec.modulus) for _ in range(n)]
    df = device_field(spec)
    evals = (
        df.decode_ints(dom.fft(df.encode_ints(coeffs), force_device=True))
        if n > 1
        else coeffs
    )
    # host tier must agree with the device kernel
    if n > 1:
        assert df.decode_ints(dom.fft(df.encode_ints(coeffs))) == evals
    roots = dom.elements_ints()
    expect = [_host_eval(coeffs, w, spec.modulus) for w in roots]
    assert evals == expect


@pytest.mark.parametrize("spec", [host.FR, host.GOLDILOCKS], ids=lambda s: s.name)
def test_ifft_roundtrip_and_coset(spec):
    rng = random.Random(7)
    n = 32
    dom = get_domain(spec, n)
    df = device_field(spec)
    vals = [rng.randrange(spec.modulus) for _ in range(n)]
    arr = df.encode_ints(vals)
    assert (
        df.decode_ints(dom.ifft(dom.fft(arr, force_device=True), force_device=True))
        == vals
    )
    assert df.decode_ints(dom.ifft(dom.fft(arr))) == vals  # host tier
    # coset round trip and correctness
    g = spec.generator
    ce = dom.coset_fft(arr, g)
    expect = [
        _host_eval(vals, spec.mul(g, w), spec.modulus) for w in dom.elements_ints()
    ]
    assert df.decode_ints(ce) == expect
    assert df.decode_ints(dom.coset_ifft(ce, g)) == vals


def test_domain_conventions():
    # arkworks: group_gen = two_adic_root^(2^(s - log n)), ω^n = 1, ω^(n/2) = -1
    for spec in (host.FR, host.GOLDILOCKS):
        dom = get_domain(spec, 16)
        w = dom.group_gen
        assert spec.pow(w, 16) == 1
        assert spec.pow(w, 8) == spec.modulus - 1
        assert dom.element(3) == spec.pow(w, 3)


def test_poly_mul_matches_schoolbook():
    # sizes chosen so out_len > HOST_POLY_MAX: exercises the device NTT mul
    spec = host.FR
    rng = random.Random(3)
    a = [rng.randrange(spec.modulus) for _ in range(90)]
    b = [rng.randrange(spec.modulus) for _ in range(70)]
    pa, pb = Poly.from_ints(spec, a), Poly.from_ints(spec, b)
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            out[i + j] = (out[i + j] + ai * bj) % spec.modulus
    assert (pa * pb).to_ints() == out
    # tiny path
    assert (Poly.from_ints(spec, [1, 2]) * Poly.from_ints(spec, [3, 4])).to_ints() == [
        3,
        10,
        8,
    ]


def test_poly_add_sub_trim():
    spec = host.FR
    a = Poly.from_ints(spec, [1, 2, 3])
    b = Poly.from_ints(spec, [5, 5, spec.modulus - 3])
    s = a + b
    assert s.to_ints() == [6, 7]  # top coefficient cancels -> trimmed
    d = a - a
    assert d.is_zero() and len(d) == 0
    assert (-a).to_ints() == [spec.modulus - 1, spec.modulus - 2, spec.modulus - 3]


@pytest.mark.parametrize("qlen", [19, 150])  # host tier and device tier
def test_divide_by_vanishing(qlen):
    spec = host.FR
    rng = random.Random(11)
    n = 8
    q = [rng.randrange(spec.modulus) for _ in range(qlen)]
    pq = Poly.from_ints(spec, q)
    num = pq.mul_by_vanishing(n)
    got_q, got_r = num.divide_by_vanishing(n)
    assert got_q.to_ints() == q
    assert got_r.is_zero()
    # non-exact: add a remainder
    r = [3, 0, 5]
    num2 = num + Poly.from_ints(spec, r)
    q2, r2 = num2.divide_by_vanishing(n)
    assert q2.to_ints() == q
    assert r2.to_ints() == [3, 0, 5]


def test_divide_by_linear_and_evaluate():
    spec = host.FR
    rng = random.Random(13)
    coeffs = [rng.randrange(spec.modulus) for _ in range(300)]  # device eval path
    p = Poly.from_ints(spec, coeffs)
    z = rng.randrange(spec.modulus)
    assert p.evaluate(z) == _host_eval(coeffs, z, spec.modulus)
    q, rem = p.divide_by_linear(z)
    assert rem == p.evaluate(z)
    # check q * (X - z) + rem == p
    lin = Poly.from_ints(spec, [(-z) % spec.modulus, 1])
    recon = q * lin + Poly.constant(spec, rem)
    assert recon.to_ints() == coeffs
    # z = 0 path
    q0, rem0 = p.divide_by_linear(0)
    assert rem0 == coeffs[0] and q0.to_ints() == coeffs[1:]


def test_interpolate_matches_reference_semantics():
    # Evaluations::from_vec_and_domain(v, domain).interpolate() == our ifft
    spec = host.FR
    dom = get_domain(spec, 8)
    df = device_field(spec)
    vals = list(range(1, 9))
    poly = poly_from_evals(dom, df.encode_ints(vals))
    for i, w in enumerate(dom.elements_ints()):
        assert poly.evaluate(w) == vals[i]


def test_packed_storage_roundtrip_and_ops():
    """Poly's packed at-rest storage (lane-compaction, poly.py docstring)
    must be value-transparent: force the threshold down and compare every
    core op against unpacked polys."""
    import zktpu.poly.poly as pp
    from zktpu.fields.host import FR

    vals_a = [(i * 7919 + 3) % FR.modulus for i in range(1, 130)]
    vals_b = [(i * 104729 + 11) % FR.modulus for i in range(1, 70)]
    saved = pp._PACK_MIN_ROWS
    try:
        big_a, big_b = pp.Poly.from_ints(FR, vals_a), pp.Poly.from_ints(FR, vals_b)
        pp._PACK_MIN_ROWS = 8
        pk_a, pk_b = pp.Poly.from_ints(FR, vals_a), pp.Poly.from_ints(FR, vals_b)
        assert pk_a._packed is not None  # actually packed
        assert pk_a.to_ints() == vals_a
        assert (pk_a + pk_b).to_ints() == (big_a + big_b).to_ints()
        assert (pk_a - pk_b).to_ints() == (big_a - big_b).to_ints()
        assert (pk_a * pk_b).to_ints() == (big_a * big_b).to_ints()
        q1, r1 = pk_a.divide_by_vanishing(16)
        q2, r2 = big_a.divide_by_vanishing(16)
        assert q1.to_ints() == q2.to_ints() and r1.to_ints() == r2.to_ints()
        z = 12345
        assert pk_a.evaluate(z) == big_a.evaluate(z)
    finally:
        pp._PACK_MIN_ROWS = saved
