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


def test_sharded_msm_rns_backend_matches_single_chip(mesh):
    """Sharded MSM over the RNS coordinate backend (fields/rns.py) vs the
    single-chip digit path — validates the residue group law under
    shard_map (no pallas inside, so no varying-axes concerns)."""
    from zktpu.fields.host import FQ
    from zktpu.fields.rns import rns_field

    rf = rns_field(FQ)
    rng = np.random.default_rng(11)
    n = 64
    scalars = [int(rng.integers(0, 1 << 62)) * 5 + i for i in range(n)]
    base = G1Affine.generator()
    pts = g1.fixed_base_mul(base, list(range(2, n + 2)))
    sc = g1.scalars_to_u32(scalars)
    X, Y, Z = pts
    single = msm_proj(sc, X, Y, Z, c=4)
    Xr, Yr, Zr = (rf.from_digit_mont(a) for a in pts)
    shard = msm_jacobian_sharded(sc, Xr, Yr, Zr, mesh=mesh, c=4, fq=rf)
    assert g1.proj_to_affine_host(tuple(a[None] for a in single)) == g1.proj_to_affine_host(
        tuple(a[None] for a in shard), fq=rf
    )


@pytest.mark.parametrize("n", [64, 256, 4096])
def test_four_step_ntt_matches_single_chip(mesh, n):
    dom = get_domain(FR, n)
    vals = [secrets.randbelow(FR.modulus) for _ in range(n)]
    coeffs = FRD.encode_ints(vals)
    want = dom.fft(coeffs, force_device=True)
    fs = get_four_step(FR, n, mesh)
    got = fs.fft(coeffs)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    back = fs.ifft(got)
    np.testing.assert_array_equal(np.asarray(coeffs), np.asarray(back))


def test_dist_fri_layer_matches_single_chip(mesh):
    """Sharded coset evaluation + mesh-sharded Merkle vs FriLayer.from_poly
    at a 2^12 Goldilocks domain (SURVEY §2.C rows 4-5)."""
    from zktpu.fields.host import GOLDILOCKS
    from zktpu.fri.layer import FriLayer
    from zktpu.poly.poly import Poly
    from zktpu.dist.fri import dist_fri_layer

    rng = np.random.default_rng(11)
    deg = 1 << 11
    coeffs = [int(v) for v in rng.integers(0, GOLDILOCKS.modulus, size=deg, dtype=np.uint64)]
    poly = Poly.from_ints(GOLDILOCKS, coeffs)
    domain_size = 1 << 12
    coset = GOLDILOCKS.generator

    single = FriLayer.from_poly(poly, coset, domain_size)
    dist = dist_fri_layer(poly, coset, domain_size, mesh)

    np.testing.assert_array_equal(single.evaluations, dist.evaluations)
    assert single.merkle_tree.root() == dist.merkle_tree.root()
    for level_s, level_d in zip(
        single.merkle_tree.internal_nodes, dist.merkle_tree.internal_nodes
    ):
        assert level_s == level_d
    for idx in (0, 5, domain_size - 1):
        ps, pd = single.merkle_tree.generate_proof(idx), dist.merkle_tree.generate_proof(idx)
        assert (ps.index, ps.leaf_val, ps.hash_proof, ps.root) == (
            pd.index, pd.leaf_val, pd.hash_proof, pd.root
        )


def test_sharded_wire_commits_match_single_chip(mesh):
    """dist/plonk.ShardedWireCommitter (four-step iNTT -> sharded MSM in one
    jitted step) equals interpolate-then-commit on a single chip at 2^8."""
    from zktpu.dist.plonk import ShardedWireCommitter
    from zktpu.kzg.scheme import _mont_digits_to_u32

    n = 1 << 8
    dom = get_domain(FR, n)
    rng = np.random.default_rng(23)
    evals3 = jax.numpy.stack(
        [
            FRD.encode_ints([int(v) for v in rng.integers(0, 1 << 62, size=n)])
            for _ in range(3)
        ]
    )
    base = G1Affine.generator()
    X, Y, Z = g1.fixed_base_mul(base, list(range(2, n + 2)))

    committer = ShardedWireCommitter(FR, n, mesh, c=4)
    got = committer(evals3, X, Y, Z)

    for i in range(3):
        coeffs = dom.ifft(evals3[i])
        sc = _mont_digits_to_u32(coeffs)
        want = msm_proj(sc, X, Y, Z, c=4)
        assert g1.proj_to_affine_host(tuple(a[None] for a in want)) == g1.proj_to_affine_host(
            tuple(a[None] for a in got[i])
        )


def test_sharded_blinded_wire_commits_match_single_chip(mesh):
    """commit_blinded == committing (f + (b_hi X + b_lo) Z_H) directly: the
    sharded MSM plus the 4-term host correction reproduces the reference's
    blinded round-1 commitments (plonk/src/prover.rs:83-90)."""
    from zktpu.dist.plonk import ShardedWireCommitter
    from zktpu.kzg.srs import Srs
    from zktpu.kzg.scheme import KzgScheme
    from zktpu.poly.poly import Poly

    n = 1 << 6
    dom = get_domain(FR, n)
    rng = np.random.default_rng(31)
    evals3 = jax.numpy.stack(
        [
            FRD.encode_ints([int(v) for v in rng.integers(0, 1 << 62, size=n)])
            for _ in range(3)
        ]
    )
    srs = Srs.new_from_secret(123456789, n)
    scheme = KzgScheme(srs)
    blinds = [
        (int(rng.integers(1, 1 << 61)), int(rng.integers(1, 1 << 61)))
        for _ in range(3)
    ]

    committer = ShardedWireCommitter(FR, n, mesh, c=4)
    got = committer.commit_blinded(evals3, srs, blinds)

    for i, (b_hi, b_lo) in enumerate(blinds):
        f = Poly(FR, dom.ifft(evals3[i]))
        blinded = f + Poly.from_ints(FR, [b_lo, b_hi]).mul_by_vanishing(n)
        want = scheme.commit(blinded).point
        assert got[i] == want
