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


def test_pallas_proj_point_ops_match_jnp():
    """Fused projective add/double kernels vs the jnp group law (interpret mode).

    Covers the complete-formula edge lanes: identity operands, P + P,
    P + (-P), and identity + identity.
    """
    from zktpu.curves import g1
    from zktpu.curves.host_curve import G1Affine
    from zktpu.curves.pallas_g1 import proj_add_pallas, proj_double_pallas

    G = G1Affine.generator()
    pts1 = [G.mul(k) for k in (1, 2, 3, 7, 1)] + [G1Affine.identity()]
    neg7 = G.mul(host.FR_MODULUS - 7)
    pts2 = [G1Affine.identity(), G.mul(5), G.mul(3), neg7, G.mul(11), G1Affine.identity()]
    P = g1.host_points_to_device(pts1)
    Q = g1.host_points_to_device(pts2)

    got = proj_add_pallas(host.FQ, P, Q, interpret=True)
    want = g1._proj_add_jnp(g1.FQD, P, Q)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert g1.proj_to_affine_host(got) == [a + b for a, b in zip(pts1, pts2)]

    gotd = proj_double_pallas(host.FQ, P, interpret=True)
    wantd = g1._proj_double_jnp(g1.FQD, P)
    for a, b in zip(gotd, wantd):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert g1.proj_to_affine_host(gotd) == [p + p for p in pts1]


def test_pallas_proj_madd_matches_jnp():
    """Fused mixed-add kernel (proj + affine) vs the jnp mirror (interpret mode).

    The CPU test backend never dispatches to the compiled kernel
    (config.pallas_enabled() is False there), so without this interpret-mode
    case only _proj_madd_jnp would be exercised and the Pallas kernel could
    drift silently.  Covers the affine-identity (0, 0) lanes, P1 = identity,
    P1 + P1's own affine, and P1 + (-P1).
    """
    from zktpu.curves import g1
    from zktpu.curves.host_curve import G1Affine
    from zktpu.curves.pallas_g1 import proj_madd_pallas

    G = G1Affine.generator()
    pts1 = [G.mul(k) for k in (1, 2, 3, 7, 1)] + [G1Affine.identity()]
    neg7 = G.mul(host.FR_MODULUS - 7)
    aff2 = [G1Affine.identity(), G.mul(5), G.mul(3), neg7, G.mul(11), G1Affine.identity()]
    P = g1.host_points_to_device(pts1)
    # affine operand: identity encoded (0, 0) — off-curve, unambiguous
    Xa = g1.FQD.encode_ints([0 if a.infinity else a.x for a in aff2])
    Ya = g1.FQD.encode_ints([0 if a.infinity else a.y for a in aff2])

    got = proj_madd_pallas(host.FQ, P, (Xa, Ya), interpret=True)
    want = g1._proj_madd_jnp(g1.FQD, P, (Xa, Ya))
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert g1.proj_to_affine_host(got) == [a + b for a, b in zip(pts1, aff2)]
