"""RNS field backend (fields/rns.py) vs exact host big-int arithmetic.

The RNS representation is non-positional, so every test validates through
decode: raw CRT reconstruction (bound checks) and canonical mod-p values
(semantics).  The group-law test is the load-bearing one — it runs the
actual RCB complete addition chains the MSM executes and asserts both the
curve result and the documented raw-value bound discipline.
"""
import random

import numpy as np
import pytest

from zktpu.fields import host
from zktpu.fields.fp import device_field
from zktpu.fields.rns import rns_field

FQ = host.FQ
P = FQ.modulus


@pytest.fixture(scope="module")
def rf():
    return rns_field(FQ)


def test_spec_invariants(rf):
    assert len(set(rf.base_b + rf.base_b2)) == 2 * rf.k
    assert (1 << 28) * P <= rf.M1
    assert min(rf.base_b + rf.base_b2) >= (1 << 16) - (1 << 11)
    # Montgomery one decodes to 1
    assert rf.decode_ints(np.asarray(rf.one_np)[None, :]) == [1]
    assert rf.decode_ints(np.asarray(rf.zero_np)[None, :]) == [0]


def test_encode_decode_roundtrip(rf):
    rng = random.Random(7)
    vals = [0, 1, P - 1, P // 2] + [rng.randrange(P) for _ in range(40)]
    enc = rf.encode_ints(vals)
    assert rf.decode_ints(enc) == vals
    # encoded raw value is x*M1 mod p < p
    for raw in rf.decode_raw_ints(enc):
        assert raw < P


def test_mont_mul_matches_bigint(rf):
    rng = random.Random(11)
    a_int = [0, 1, P - 1, rng.randrange(P)] + [rng.randrange(P) for _ in range(60)]
    b_int = [P - 1, P - 1, P - 1, 1] + [rng.randrange(P) for _ in range(60)]
    a = rf.encode_ints(a_int)
    b = rf.encode_ints(b_int)
    out = rf.mont_mul(a, b)
    assert rf.decode_ints(out) == [x * y % P for x, y in zip(a_int, b_int)]
    # output bound: < (k+2) p
    for raw in rf.decode_raw_ints(out):
        assert raw < (rf.k + 2) * P


def test_add_sub_double_neg(rf):
    rng = random.Random(13)
    a_int = [rng.randrange(P) for _ in range(50)]
    b_int = [rng.randrange(P) for _ in range(50)]
    a = rf.encode_ints(a_int)
    b = rf.encode_ints(b_int)
    assert rf.decode_ints(rf.add(a, b)) == [(x + y) % P for x, y in zip(a_int, b_int)]
    assert rf.decode_ints(rf.sub(a, b)) == [(x - y) % P for x, y in zip(a_int, b_int)]
    assert rf.decode_ints(rf.double(a)) == [2 * x % P for x in a_int]
    assert rf.decode_ints(rf.neg(a)) == [(-x) % P for x in a_int]
    # sub's raw output carries the +Kp offset
    for raw in rf.decode_raw_ints(rf.sub(a, b)):
        assert raw < (rf.SUB_K + 2) * P


def test_chained_muls_stay_bounded(rf):
    """Deep mul chains must keep collapsing to the (k+2)p bound."""
    rng = random.Random(17)
    a_int = [rng.randrange(P) for _ in range(8)]
    a = rf.encode_ints(a_int)
    acc, acc_int = a, list(a_int)
    for _ in range(12):
        acc = rf.mont_mul(rf.add(acc, acc), acc)
        acc_int = [2 * x * x % P for x in acc_int]
    assert rf.decode_ints(acc) == acc_int
    for raw in rf.decode_raw_ints(acc):
        assert raw < (rf.k + 2) * P


def test_from_digit_mont(rf):
    fqd = device_field(FQ)
    rng = random.Random(19)
    vals = [0, 1, P - 1] + [rng.randrange(P) for _ in range(30)]
    digits = fqd.encode_ints(vals)
    enc = rf.from_digit_mont(digits)
    assert rf.decode_ints(enc) == vals


def test_group_law_and_bounds(rf):
    """RCB proj add/double/madd chains over the RNS field vs the host curve.

    Exercises the exact op sequences the Pippenger scan runs (including
    identity lanes and P + (-P)) and asserts the sub-contract bound
    (every raw value < 2^14 p, the mul-input limit) on the outputs.
    """
    from zktpu.curves import g1
    from zktpu.curves.host_curve import G1Affine

    G = G1Affine.generator()
    pts1 = [G.mul(k) for k in (1, 2, 3, 7, 11)] + [G1Affine.identity()]
    neg7 = G.mul(host.FR_MODULUS - 7)
    pts2 = [G1Affine.identity(), G.mul(5), G.mul(3), neg7, G.mul(11), G1Affine.identity()]

    def enc_points(pts):
        X = rf.encode_ints([0 if p.infinity else p.x for p in pts])
        Y = rf.encode_ints([1 if p.infinity else p.y for p in pts])
        Z = rf.encode_ints([0 if p.infinity else 1 for p in pts])
        return X, Y, Z

    def dec_points(Pp):
        X, Y, Z = (rf.decode_ints(a) for a in Pp)
        out = []
        for x, y, z in zip(X, Y, Z):
            if z == 0:
                out.append(G1Affine.identity())
            else:
                zi = pow(z, -1, P)
                out.append(G1Affine(x * zi % P, y * zi % P))
        return out

    Pd = enc_points(pts1)
    Qd = enc_points(pts2)
    # chain several adds/doubles to stress bound accumulation
    S = g1._proj_add_jnp(rf, Pd, Qd)
    S = g1._proj_double_jnp(rf, S)
    S = g1._proj_add_jnp(rf, S, Pd)
    want = [((a + b) + (a + b)) + a for a, b in zip(pts1, pts2)]
    assert dec_points(S) == want
    for coord in S:
        for raw in rf.decode_raw_ints(coord):
            assert raw < (1 << 14) * P

    # mixed add with the (0,0) affine-identity sentinel
    Xa = rf.encode_ints([0 if p.infinity else p.x for p in pts2])
    Ya = rf.encode_ints([0 if p.infinity else p.y for p in pts2])
    M = g1._proj_madd_jnp(rf, Pd, (Xa, Ya))
    assert dec_points(M) == [a + b for a, b in zip(pts1, pts2)]


def test_msm_rns_matches_naive(rf):
    """End-to-end Pippenger MSM over the RNS backend vs host naive MSM."""
    from zktpu.curves import g1, msm
    from zktpu.curves.host_curve import G1Affine
    from zktpu.fields.fp import ints_to_digits
    import jax.numpy as jnp

    rng = random.Random(23)
    n = 64
    G = G1Affine.generator()
    pts = [G.mul(rng.randrange(1, host.FR_MODULUS)) for _ in range(n)]
    pts[5] = G1Affine.identity()
    scalars = [rng.randrange(host.FR_MODULUS) for _ in range(n)]
    scalars[9] = 0

    want = G1Affine.identity()
    for s, p in zip(scalars, pts):
        want = want + p.mul(s)

    s_u32 = jnp.asarray(
        np.frombuffer(
            b"".join(int(s).to_bytes(32, "little") for s in scalars), dtype="<u4"
        ).reshape(n, 8)
    )
    X = rf.encode_ints([0 if p.infinity else p.x for p in pts])
    Y = rf.encode_ints([1 if p.infinity else p.y for p in pts])
    Z = rf.encode_ints([0 if p.infinity else 1 for p in pts])
    for c in (4, 8):
        out = msm.msm_proj(s_u32, X, Y, Z, c=c, fq=rf)
        x, y, z = (rf.decode_ints(a[None, :])[0] for a in out)
        if z == 0:
            got = G1Affine.identity()
        else:
            zi = pow(z, -1, P)
            got = G1Affine(x * zi % P, y * zi % P)
        assert got == want, f"c={c}"


def test_kzg_commit_backend_equality(rf):
    """KzgScheme.commit / commit_many produce identical commitments under
    the digit and RNS MSM backends (config.msm_backend dispatch)."""
    from zktpu.kzg import Srs
    from zktpu.kzg.scheme import KzgScheme
    from zktpu.poly.poly import Poly
    import zktpu.config as cfg

    rng = random.Random(9)
    srs = Srs.new_from_secret(0xABC, 200)
    sch = KzgScheme(srs)
    coeffs = [rng.randrange(host.FR.modulus) for _ in range(180)]
    p1 = Poly.from_ints(host.FR, coeffs)
    p2 = Poly.from_ints(host.FR, coeffs[:100])
    saved = cfg.MSM_BACKEND
    try:
        cfg.MSM_BACKEND = "digit"
        want_one, want_many = sch.commit(p1), sch.commit_many([p1, p2])
        cfg.MSM_BACKEND = "rns"
        assert sch.commit(p1) == want_one
        assert sch.commit_many([p1, p2]) == want_many
    finally:
        cfg.MSM_BACKEND = saved
