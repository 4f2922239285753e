"""Device G1 / Pippenger MSM / KZG tests.

KZG coverage mirrors the reference suite (kzg/src/commitment.rs:14-120):
commit round-trip with known secret incl. the algebraic identity
C = [p(s)] G, scalar-mul homomorphism, aggregation, batch verification.
"""
import random

import pytest

from zktpu.fields import host
from zktpu.curves import g1 as g1mod
from zktpu.curves.g1 import FQD, proj_add, proj_double, host_points_to_device, proj_to_affine_host
from zktpu.curves.host_curve import G1Affine
from zktpu.curves.msm import msm
from zktpu.kzg import Srs, KzgScheme
from zktpu.poly.poly import Poly
from zktpu.transcript.chacha import StdRng

G = G1Affine.generator()


def test_device_point_ops_match_host():
    pts = [G.mul(k) for k in (1, 2, 3, 7, 1)] + [G1Affine.identity()]
    P = host_points_to_device(pts)
    # pairwise add against host
    Q = host_points_to_device([pts[5], pts[0], pts[2], pts[2], G.mul(host.FR_MODULUS - 1), G1Affine.identity()])
    R = proj_add(FQD, P, Q)
    got = proj_to_affine_host(R)
    want = [a + b for a, b in zip(pts, [pts[5], pts[0], pts[2], pts[2], G.mul(host.FR_MODULUS - 1), G1Affine.identity()])]
    assert got == want  # covers: +inf, add, double-case (3+3), P+(-P), inf+inf

    Dd = proj_double(FQD, P)
    assert proj_to_affine_host(Dd) == [p + p for p in pts]


def test_fixed_base_mul():
    rng = random.Random(5)
    scalars = [0, 1, 2, host.FR_MODULUS - 1] + [rng.randrange(host.FR_MODULUS) for _ in range(4)]
    R = g1mod.fixed_base_mul(G, scalars)
    assert proj_to_affine_host(R) == [G.mul(s) for s in scalars]


@pytest.mark.parametrize("n,c", [(1, 4), (5, 4), (33, 4), (70, 8), (100, 13)])
def test_msm_matches_naive(n, c):
    rng = random.Random(n)
    scalars = [rng.randrange(host.FR_MODULUS) for _ in range(n)]
    scalars[0] = 0  # zero-scalar lane
    base_pts = [G.mul(rng.randrange(1, 2**20)) for _ in range(n)]
    P = host_points_to_device(base_pts)
    got = msm(scalars, P, c=c)
    want = G1Affine.identity()
    for s, pt in zip(scalars, base_pts):
        want = want + pt.mul(s)
    assert got == want


@pytest.mark.parametrize("c", [4, 8, 13, 16])
def test_window_digits_limb_straddling(c):
    """c=13/16 windows straddle u32 limb boundaries (incl. the top window
    with no 9th limb, curves/msm.py:49-51); check every digit against host
    bit slicing of full-width scalars."""
    import numpy as np
    from zktpu.curves.g1 import scalars_to_u32
    from zktpu.curves.msm import window_digits

    rng = random.Random(c)
    scalars = [rng.randrange(1 << 256) % host.FR_MODULUS for _ in range(17)]
    scalars += [0, 1, host.FR_MODULUS - 1, (1 << 255) - 1]
    digits = np.asarray(window_digits(scalars_to_u32(scalars), c))
    num_windows = -(-256 // c)
    assert digits.shape == (num_windows, len(scalars))
    for w in range(num_windows):
        for i, s in enumerate(scalars):
            assert digits[w, i] == (s >> (w * c)) & ((1 << c) - 1), (w, i, c)


@pytest.fixture(scope="module")
def scheme10():
    return KzgScheme(Srs.new_from_secret(2, 10))


def test_kzg_commit_known_secret(scheme10):
    # kzg/src/commitment.rs:40-62 with secret s = 2
    poly = Poly.from_ints(host.FR, [1, 2, 3])
    commitment = scheme10.commit(poly)
    assert poly.evaluate(1) == 6
    assert commitment.point == G.mul(poly.evaluate(2))  # C = [p(s)]G
    opening = scheme10.open(poly, 1)
    assert opening.evaluation == 6
    assert scheme10.verify(commitment, opening, 1)
    # tampered opening must fail
    bad = type(opening)(opening.point, 7)
    assert not scheme10.verify(commitment, bad, 1)


def test_kzg_scalar_mul_homomorphism(scheme10):
    poly = Poly.from_ints(host.FR, [1, 2, 3, 4, 5])
    c1 = scheme10.commit(poly)
    factor = 9
    c2 = scheme10.commit(poly.scale(factor))
    assert c1.mul(factor) == c2


def test_kzg_aggregate(scheme10):
    f1 = Poly.from_ints(host.FR, [1, 2, 3, 4, 5])
    f2 = Poly.from_ints(host.FR, [1, 2, 3, 4, 8])
    c1, c2 = scheme10.commit(f1), scheme10.commit(f2)
    ch = 77777
    batch = KzgScheme.aggregate_commitments([c1, c2], ch)
    assert batch.point == c1.point + c2.point.mul(ch)


def test_kzg_batch_verify(scheme10):
    polys = [
        Poly.from_ints(host.FR, c)
        for c in ([1, 2, 3, 4, 5], [1, 8, 3, 4, 8], [12, 8, 3, 9, 8], [95, 8, 0, 9, 8], [12, 0, 3, 9, 0])
    ]
    zs = [12, 4, 2003, 13, 9]
    openings = [scheme10.open(f, z) for f, z in zip(polys, zs)]
    commits = [scheme10.commit(f) for f in polys]
    assert scheme10.batch_verify(commits, zs, openings, StdRng.from_seed_u64(99))
    # corrupt one evaluation
    openings[2] = type(openings[2])(openings[2].point, openings[2].evaluation + 1)
    assert not scheme10.batch_verify(commits, zs, openings, StdRng.from_seed_u64(99))


def test_kzg_commit_empty(scheme10):
    # commit on empty poly -> identity (scheme.rs:94 unwrap_or zero)
    assert scheme10.commit(Poly.zero(host.FR)).point.infinity


def test_commit_many_matches_individual_commits():
    """KzgScheme.commit_many (one vmapped Pippenger over K polys) equals
    per-poly commits, including mixed lengths and the pow2 pad."""
    import numpy as np

    from zktpu.kzg import KzgScheme, Srs
    from zktpu.poly.poly import Poly

    rng = np.random.default_rng(5)
    srs = Srs.new_from_secret(0xABC, 200)
    scheme = KzgScheme(srs)
    polys = [
        Poly.from_ints(host.FR, [int(v) for v in rng.integers(0, 1 << 62, size=L)])
        for L in (128, 100, 130)
    ]
    many = scheme.commit_many(polys)
    for p, m in zip(polys, many):
        assert scheme.commit(p).point == m.point


def test_proj_madd_matches_full_add():
    """Mixed add (proj + affine, RCB Alg 8) == full add with lifted operand,
    covering: generic, P1=identity, A2=identity (0,0), doubling (P1==P2),
    and P1 = -A2 (result identity)."""
    from zktpu.curves.g1 import proj_madd, affine_to_proj
    import jax.numpy as jnp

    rng = random.Random(9)
    pts1 = [G.mul(rng.randrange(1, 2**20)) for _ in range(3)]
    pts2 = [G.mul(rng.randrange(1, 2**20)) for _ in range(3)]
    pts1 += [G1Affine.identity(), pts2[0], pts2[1], -pts2[2]]
    pts2 += [pts2[0], pts2[0], G1Affine.identity(), pts2[2]]
    P1 = host_points_to_device(pts1)
    xa = FQD.encode_ints([0 if p.infinity else p.x for p in pts2])
    ya = FQD.encode_ints([0 if p.infinity else p.y for p in pts2])
    got = proj_madd(FQD, P1, (xa, ya))
    want = [a + b for a, b in zip(pts1, pts2)]
    assert proj_to_affine_host(got) == want


@pytest.mark.skipif(
    __import__("os").environ.get("ZKTPU_RUN_AFFINE_MSM") != "1",
    reason="XLA:CPU segfaults (in compile AND in executable.serialize) on the"
    " msm_affine graph when it is built ~60 tests into a long-lived process —"
    " 4/4 full-suite runs in round 5 died exactly here, while the same test"
    " passes in a fresh process (run it standalone with ZKTPU_RUN_AFFINE_MSM=1)."
    " msm_affine is an experimental, unwired path (see its docstring); its"
    " kernel correctness is still covered by test_proj_madd_matches_full_add"
    " and tests/test_pallas_mont.py::test_pallas_proj_madd_matches_jnp.",
)
@pytest.mark.parametrize("n,c", [(5, 4), (70, 8)])
def test_msm_affine_matches_naive(n, c):
    """msm_affine (mixed-add scan over affine points, zero-padded identity)
    == naive host MSM, including a zero scalar and pow2 identity padding.

    NOTE: persistent-compile-cache WRITES are disabled suite-wide in
    conftest.py — serializing large fresh XLA:CPU executables (this test's
    MSM graph among them) segfaults in jax's zstd cache writer."""
    _run_msm_affine_case(n, c)


def _run_msm_affine_case(n, c):
    from zktpu.curves.msm import msm_affine, pad_msm_inputs_affine
    from zktpu.curves.g1 import proj_to_affine_dev, scalars_to_u32

    rng = random.Random(n + 1)
    scalars = [rng.randrange(host.FR_MODULUS) for _ in range(n)]
    scalars[0] = 0
    base_pts = [G.mul(rng.randrange(1, 2**20)) for _ in range(n)]
    P = host_points_to_device(base_pts)
    Xa, Ya = proj_to_affine_dev(P)
    sc, Xp, Yp = pad_msm_inputs_affine(scalars_to_u32(scalars), Xa, Ya)
    R = msm_affine(sc, Xp, Yp, c=c)
    got = proj_to_affine_host(tuple(a[None] for a in R))[0]
    want = G1Affine.identity()
    for s, pt in zip(scalars, base_pts):
        want = want + pt.mul(s)
    assert got == want


def test_padded_msm_len_buckets():
    from zktpu.curves.msm import padded_msm_len

    assert padded_msm_len(1) == 16
    assert padded_msm_len(70) == 128
    assert padded_msm_len(4096) == 4096
    assert padded_msm_len(4097) == 4096 + 256
    assert padded_msm_len(4096 + 256) == 4096 + 256
    assert padded_msm_len(4096 + 257) == 8192
    assert padded_msm_len((1 << 18) + 2) == (1 << 18) + 256
    assert padded_msm_len((1 << 20) + 5) == (1 << 20) + 256
