"""Fused Pallas Montgomery-mul kernel vs the jnp reference path.

Runs the kernel in interpreter mode on the CPU test backend (bit-exact
semantics check); the compiled TPU path is exercised by bench.py and the
verify drives.
"""
import random

import numpy as np
import pytest

from zktpu.fields import host
from zktpu.fields.fp import device_field
from zktpu.fields.pallas_mont import mont_mul_pallas


@pytest.mark.parametrize("spec", [host.FR, host.FQ, host.GOLDILOCKS], ids=lambda s: s.name)
def test_pallas_mont_mul_matches_jnp(spec):
    df = device_field(spec)
    rng = random.Random(17)
    n = 300  # crosses one tile boundary (TILE=256)
    a_int = [rng.randrange(spec.modulus) for _ in range(n)]
    b_int = [rng.randrange(spec.modulus) for _ in range(n)]
    # edge values
    a_int[:3] = [0, 1, spec.modulus - 1]
    b_int[:3] = [spec.modulus - 1, spec.modulus - 1, spec.modulus - 1]
    a = df.encode_ints(a_int)
    b = df.encode_ints(b_int)
    want = df._mont_mul_jnp(a, b)
    got = mont_mul_pallas(spec, a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_pallas_broadcast_matches_jnp():
    spec = host.FR
    df = device_field(spec)
    rng = random.Random(23)
    a = df.encode_ints([rng.randrange(spec.modulus) for _ in range(257)])
    b = df.encode_ints([rng.randrange(spec.modulus)])[0]  # (D,) broadcast
    want = df._mont_mul_jnp(a, b)
    got = mont_mul_pallas(spec, a, b, interpret=True)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
