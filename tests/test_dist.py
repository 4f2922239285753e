"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed code (SURVEY.md §2.C); these tests validate
the new framework's parallel components against their single-chip
counterparts: sharded Pippenger MSM (all_gather + tree reduction) and the
four-step NTT (three all_to_all transposes).
"""
import secrets

import jax
import numpy as np
import pytest

from zktpu.fields.host import FR
from zktpu.fields.fp import device_field
from zktpu.poly.domain import get_domain
from zktpu.curves import g1
from zktpu.curves.host_curve import G1Affine
from zktpu.curves.msm import msm_proj
from zktpu.dist import make_mesh, msm_jacobian_sharded, get_four_step

FRD = device_field(FR)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should force 8 CPU devices"
    return make_mesh(8)


def test_sharded_msm_matches_single_chip(mesh):
    rng = np.random.default_rng(7)
    n = 64
    scalars = [int(rng.integers(0, 1 << 62)) * 3 + i for i in range(n)]
    base = G1Affine.generator()
    pts = g1.fixed_base_mul(base, list(range(2, n + 2)))
    sc = g1.scalars_to_u32(scalars)
    X, Y, Z = pts
    single = msm_proj(sc, X, Y, Z, c=4)
    shard = msm_jacobian_sharded(sc, X, Y, Z, mesh=mesh, c=4)
    assert g1.proj_to_affine_host(tuple(a[None] for a in single)) == g1.proj_to_affine_host(
        tuple(a[None] for a in shard)
    )


@pytest.mark.parametrize("n", [64, 256])
def test_four_step_ntt_matches_single_chip(mesh, n):
    dom = get_domain(FR, n)
    vals = [secrets.randbelow(FR.modulus) for _ in range(n)]
    coeffs = FRD.encode_ints(vals)
    want = dom.fft(coeffs)
    fs = get_four_step(FR, n, mesh)
    got = fs.fft(coeffs)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    back = fs.ifft(got)
    np.testing.assert_array_equal(np.asarray(coeffs), np.asarray(back))
