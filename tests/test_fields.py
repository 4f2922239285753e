"""Field-arithmetic tests: device limb Montgomery vs host python-int ground truth.

Covers the capability of arkworks `ark-ff` as used by the reference
(kzg/src/scheme.rs, fri/src/fields/goldilocks.rs, plonk/src/prover.rs):
add/sub/mul/neg/inv over BLS12-381 Fr/Fq and Goldilocks.
"""
import random

import numpy as np
import pytest

from zktpu.fields import host
from zktpu.fields.fp import device_field, ints_to_digits, digits_to_ints


SPECS = [host.FR, host.FQ, host.GOLDILOCKS]


def _rand_elems(spec, n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(spec.modulus) for _ in range(n)]


def test_bls12_381_constant_derivation():
    x = host.BLS_X
    assert host.FR_MODULUS == x**4 - x**2 + 1
    # q = (x-1)^2/3 * r + x
    assert (x - 1) ** 2 % 3 == 0
    # generator sanity: G1 on curve y^2 = x^3 + 4
    p = host.FQ_MODULUS
    assert (host.G1_GEN_Y**2 - (host.G1_GEN_X**3 + 4)) % p == 0
    # two-adicity facts
    assert (host.FR_MODULUS - 1) % 2**32 == 0
    assert (host.GOLDILOCKS_MODULUS - 1) % 2**32 == 0


def test_g2_generator_on_curve():
    # G2: y^2 = x^3 + 4(1+u) over Fq2 = Fq[u]/(u^2+1)
    p = host.FQ_MODULUS

    def fq2_mul(a, b):
        return ((a[0] * b[0] - a[1] * b[1]) % p, (a[0] * b[1] + a[1] * b[0]) % p)

    x = (host.G2_GEN_X_C0, host.G2_GEN_X_C1)
    y = (host.G2_GEN_Y_C0, host.G2_GEN_Y_C1)
    lhs = fq2_mul(y, y)
    x3 = fq2_mul(fq2_mul(x, x), x)
    rhs = ((x3[0] + 4) % p, (x3[1] + 4) % p)
    assert lhs == rhs


def test_digit_roundtrip():
    spec = host.FR
    vals = _rand_elems(spec, 7, seed=1)
    d = ints_to_digits(vals, spec.num_digits)
    assert digits_to_ints(d) == vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_device_field_matches_host(spec):
    df = device_field(spec)
    n = 33
    a_int = _rand_elems(spec, n, seed=2)
    b_int = _rand_elems(spec, n, seed=3)
    # include edge cases
    a_int[:3] = [0, 1, spec.modulus - 1]
    b_int[:3] = [0, spec.modulus - 1, spec.modulus - 1]
    a = df.encode_ints(a_int)
    b = df.encode_ints(b_int)

    assert df.decode_ints(df.add(a, b)) == [spec.add(x, y) for x, y in zip(a_int, b_int)]
    assert df.decode_ints(df.sub(a, b)) == [spec.sub(x, y) for x, y in zip(a_int, b_int)]
    assert df.decode_ints(df.mont_mul(a, b)) == [
        spec.mul(x, y) for x, y in zip(a_int, b_int)
    ]
    assert df.decode_ints(df.neg(a)) == [spec.neg(x) for x in a_int]
    assert list(np.asarray(df.is_zero(a))) == [x == 0 for x in a_int]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mont_roundtrip(spec):
    df = device_field(spec)
    vals = _rand_elems(spec, 9, seed=4)
    raw = ints_to_digits(vals, spec.num_digits)
    import jax.numpy as jnp

    mont = df.to_mont(jnp.asarray(raw))
    back = df.from_mont(mont)
    assert digits_to_ints(np.asarray(back)) == vals
    assert df.decode_ints(mont) == vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_batch_inv_and_reductions(spec):
    df = device_field(spec)
    n = 17
    vals = [v if v != 0 else 1 for v in _rand_elems(spec, n, seed=5)]
    a = df.encode_ints(vals)
    inv = df.batch_inv(a, host_inv=spec.inv)
    assert df.decode_ints(inv) == [spec.inv(v) for v in vals]

    total = df.sum(a, axis=0)
    expect = 0
    for v in vals:
        expect = spec.add(expect, v)
    assert df.decode_int(total) == expect

    cp = df.cumprod(a, axis=0)
    acc, accs = 1, []
    for v in vals:
        acc = spec.mul(acc, v)
        accs.append(acc)
    assert df.decode_ints(cp) == accs


def test_cumprod_reverse():
    spec = host.GOLDILOCKS
    df = device_field(spec)
    vals = _rand_elems(spec, 8, seed=6)
    a = df.encode_ints(vals)
    cp = df.cumprod(a, axis=0, reverse=True)
    accs = []
    acc = 1
    for v in reversed(vals):
        acc = spec.mul(acc, v)
        accs.append(acc)
    assert df.decode_ints(cp) == list(reversed(accs))
