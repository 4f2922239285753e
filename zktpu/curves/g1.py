"""Device (TPU) BLS12-381 G1 arithmetic over limb vectors.

Points are homogeneous projective triples (X, Y, Z) of Fq digit arrays
(..., 24) uint32 in Montgomery form; the identity is (0 : 1 : 0).

The group law uses the Renes-Costello-Batina *complete* addition formulas
for short-Weierstrass curves with a = 0 (Alg. 7/9 of eprint 2015/1060):
12 field muls per addition, no exceptional cases, so there is no branch or
select logic at all — every lane of a batched add is the same straight-line
code whether the operands are equal, inverse, or the identity.  This is the
TPU-native replacement for arkworks' ark-ec projective arithmetic used by
the reference's MSM loop (kzg/src/scheme.rs:84-96); the branchless-complete
property is what lets the Pippenger scan (zktpu/curves/msm.py) run as pure
vector code.

Multiplications by the curve constant 3b = 12 (BLS12-381 G1: y^2 = x^3 + 4)
are computed as double/add chains — four cheap digit-carry ops instead of a
full 24x24-digit Montgomery product.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.host import FQ
from ..fields.fp import DeviceField, device_field, ints_to_digits
from .host_curve import G1Affine

FQD = device_field(FQ)
D = FQ.num_digits


def proj_identity(shape=()) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(0 : 1 : 0) — Y is the Montgomery one."""
    z = jnp.zeros(shape + (D,), dtype=jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(FQD.one_np), shape + (D,))
    return z, one, z


def affine_to_proj(x_digits: jnp.ndarray, y_digits: jnp.ndarray, inf_mask=None):
    """Affine Montgomery coords -> projective; inf_mask selects identity lanes."""
    one = jnp.broadcast_to(jnp.asarray(FQD.one_np), x_digits.shape)
    z = one
    if inf_mask is not None:
        m = inf_mask[..., None]
        z = jnp.where(m, jnp.zeros_like(one), one)
        x_digits = jnp.where(m, jnp.zeros_like(x_digits), x_digits)
        y_digits = jnp.where(m, one, y_digits)
    return x_digits, y_digits, z


def host_points_to_device(points: list[G1Affine]) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    xs = FQD.encode_ints([p.x for p in points])
    ys = FQD.encode_ints([p.y for p in points])
    inf = jnp.asarray(np.array([p.infinity for p in points], dtype=bool))
    return affine_to_proj(xs, ys, inf)


def _pallas_batch(*arrays) -> int:
    """Flattened batch width of a point-op call (0 if pallas is off)."""
    from ..config import pallas_enabled

    if not pallas_enabled():
        return 0
    n = 1
    for s in jnp.broadcast_shapes(*[a.shape[:-1] for a in arrays]):
        n *= s
    return n


def _mul12(fq: DeviceField, a):
    """12*a = 3b*a for BLS12-381 G1 (b = 4) via a double/add chain."""
    a4 = fq.double(fq.double(a))
    return fq.add(fq.double(a4), a4)


def proj_add(fq: DeviceField, P1, P2):
    from ..config import PALLAS_MIN_BATCH

    if getattr(fq, "pallas_ok", True) and _pallas_batch(*P1, *P2) >= PALLAS_MIN_BATCH:
        from .pallas_g1 import proj_add_pallas

        return proj_add_pallas(fq.spec, P1, P2)
    return _proj_add_jnp(fq, P1, P2)


def _proj_add_jnp(fq: DeviceField, P1, P2):
    """RCB Alg. 7 (a = 0): complete projective addition, 12M + 2 x (3b)."""
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    mul, add, sub = fq.mont_mul, fq.add, fq.sub
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = sub(mul(add(X1, Y1), add(X2, Y2)), add(t0, t1))  # X1Y2 + X2Y1
    t4 = sub(mul(add(Y1, Z1), add(Y2, Z2)), add(t1, t2))  # Y1Z2 + Y2Z1
    t5 = sub(mul(add(X1, Z1), add(X2, Z2)), add(t0, t2))  # X1Z2 + X2Z1
    t0 = add(fq.double(t0), t0)  # 3 X1X2
    t2 = _mul12(fq, t2)  # 3b Z1Z2
    Zc = add(t1, t2)  # Y1Y2 + 3b Z1Z2
    t1 = sub(t1, t2)  # Y1Y2 - 3b Z1Z2
    t5 = _mul12(fq, t5)  # 3b (X1Z2 + X2Z1)
    X3 = sub(mul(t3, t1), mul(t4, t5))
    Y3 = add(mul(t1, Zc), mul(t5, t0))
    Z3 = add(mul(Zc, t4), mul(t0, t3))
    return X3, Y3, Z3


def proj_madd(fq: DeviceField, P1, A2):
    """Mixed addition: projective P1 + affine A2 = (X2, Y2) with Z2 = 1.

    RCB Alg. 8 (a = 0): 11M instead of Alg. 7's 12M and ~6 fewer digit
    adds — phase 1 of the Pippenger suffix scan (zktpu/curves/scan.py)
    always has an ORIGINAL (affine) point as its second operand, which is
    ~80% of all MSM point additions.  Complete for every projective P1
    (including the identity) and every affine P2 on the curve; the affine
    identity is encoded (0, 0) — off-curve, so unambiguous — and handled
    by a final select.
    """
    from ..config import PALLAS_MIN_BATCH

    if getattr(fq, "pallas_ok", True) and _pallas_batch(*P1, *A2) >= PALLAS_MIN_BATCH:
        from .pallas_g1 import proj_madd_pallas

        return proj_madd_pallas(fq.spec, P1, A2)
    return _proj_madd_jnp(fq, P1, A2)


def _proj_madd_jnp(fq: DeviceField, P1, A2):
    X1, Y1, Z1 = P1
    X2, Y2 = A2
    mul, add, sub = fq.mont_mul, fq.add, fq.sub
    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t3 = sub(mul(add(X1, Y1), add(X2, Y2)), add(t0, t1))  # X1Y2 + X2Y1
    t4 = add(Y1, mul(Y2, Z1))  # Y1 + Y2Z1
    t5 = add(X1, mul(X2, Z1))  # X1 + X2Z1
    t0 = add(fq.double(t0), t0)  # 3 X1X2
    t2 = _mul12(fq, Z1)  # 3b Z1
    Zc = add(t1, t2)
    t1 = sub(t1, t2)
    t5 = _mul12(fq, t5)
    X3 = sub(mul(t3, t1), mul(t4, t5))
    Y3 = add(mul(t1, Zc), mul(t5, t0))
    Z3 = add(mul(Zc, t4), mul(t0, t3))
    inf2 = jnp.logical_and(fq.is_zero(X2), fq.is_zero(Y2))
    return (
        fq.select(inf2, X1, X3),
        fq.select(inf2, Y1, Y3),
        fq.select(inf2, Z1, Z3),
    )


def proj_double(fq: DeviceField, P):
    from ..config import PALLAS_MIN_BATCH

    if getattr(fq, "pallas_ok", True) and _pallas_batch(*P) >= PALLAS_MIN_BATCH:
        from .pallas_g1 import proj_double_pallas

        return proj_double_pallas(fq.spec, P)
    return _proj_double_jnp(fq, P)


def _proj_double_jnp(fq: DeviceField, P):
    """RCB Alg. 9 (a = 0): complete projective doubling, 6M + 2S + 1 x (3b)."""
    X, Y, Z = P
    mul, add, sub = fq.mont_mul, fq.add, fq.sub
    t0 = mul(Y, Y)
    Z3 = fq.double(fq.double(fq.double(t0)))  # 8 Y^2
    t1 = mul(Y, Z)
    t2 = _mul12(fq, mul(Z, Z))  # 3b Z^2
    X3 = mul(t2, Z3)
    Y3 = add(t0, t2)
    Z3 = mul(t1, Z3)
    t2 = add(fq.double(t2), t2)  # 9b Z^2
    t0 = sub(t0, t2)  # Y^2 - 9b Z^2
    Y3 = add(mul(t0, Y3), X3)
    X3 = fq.double(mul(t0, mul(X, Y)))
    return X3, Y3, Z3


def proj_tree_sum(P, axis: int = 0, fq=None):
    """Sum a batch of projective points along `axis` via log-depth tree adds."""
    fq = FQD if fq is None else fq
    X, Y, Z = (jnp.moveaxis(a, axis, 0) for a in P)
    n = X.shape[0]
    while n > 1:
        half = n // 2
        sX, sY, sZ = proj_add(
            fq,
            (X[:half], Y[:half], Z[:half]),
            (X[half : 2 * half], Y[half : 2 * half], Z[half : 2 * half]),
        )
        if n % 2:
            sX = jnp.concatenate([sX, X[2 * half : 2 * half + 1]], axis=0)
            sY = jnp.concatenate([sY, Y[2 * half : 2 * half + 1]], axis=0)
            sZ = jnp.concatenate([sZ, Z[2 * half : 2 * half + 1]], axis=0)
        X, Y, Z = sX, sY, sZ
        n = X.shape[0]
    return X[0], Y[0], Z[0]


def proj_to_affine_host(P, fq=None) -> list[G1Affine]:
    """Batch projective -> host affine points.

    Works for any coordinate backend exposing num_digits/decode_ints
    (digit-Montgomery DeviceField or RnsField)."""
    fq = FQD if fq is None else fq
    W = fq.num_digits
    X, Y, Z = P
    X = X.reshape(-1, W)
    Y = Y.reshape(-1, W)
    Z = Z.reshape(-1, W)
    x_ints = fq.decode_ints(X)
    y_ints = fq.decode_ints(Y)
    z_ints = fq.decode_ints(Z)
    p = FQ.modulus
    out = []
    for x, y, z in zip(x_ints, y_ints, z_ints):
        if z == 0:
            out.append(G1Affine.identity())
        else:
            zi = pow(z, -1, p)
            out.append(G1Affine(x * zi % p, y * zi % p))
    from ..profiling import check_on_curve

    check_on_curve(out, "proj_to_affine_host")
    return out


def proj_points_equal_host(P, Q) -> bool:
    return proj_to_affine_host(P) == proj_to_affine_host(Q)


def proj_to_affine_dev(P):
    """Projective (N, D) triple -> affine (Xa, Ya) digit arrays, on device.

    One Montgomery-trick batch inversion (log-depth device cumprods + a
    single host inversion of the total) replaces the reference-style
    per-point host `pow(z, -1, p)` — the one-time SRS affine conversion for
    the mixed-add MSM (msm.msm_affine).  Every Z must be nonzero (no
    identity points): SRS power tables satisfy this by construction.
    """
    X, Y, Z = P
    p = FQ.modulus
    zinv = FQD.batch_inv(Z, host_inv=lambda v: pow(v, -1, p))
    return FQD.mont_mul(X, zinv), FQD.mont_mul(Y, zinv)


# Backwards-compatible aliases (the framework-wide point representation moved
# from Jacobian to complete-projective; callers only rely on the opaque-triple
# interface, which is unchanged).
jac_to_affine_host = proj_to_affine_host
jac_points_equal_host = proj_points_equal_host


# ---------------------------------------------------------------------------
# Fixed-base batch scalar multiplication (SRS generation: kzg/src/srs.rs:48-63)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def _fixed_base_tables(base: G1Affine, window: int = 8):
    """Host-precomputed window tables: tables[k][j] = j * 2^(window k) * base."""
    num_windows = (256 + window - 1) // window
    tables = []
    cur = base
    for _ in range(num_windows):
        row = [G1Affine.identity()]
        for j in range(1, 1 << window):
            row.append(row[-1] + cur)
        tables.append(row)
        for _ in range(window):
            cur = cur + cur
    # encode to device: (num_windows, 2^window, 3, D)
    xs, ys, infs = [], [], []
    for row in tables:
        xs += [pt.x for pt in row]
        ys += [pt.y for pt in row]
        infs += [pt.infinity for pt in row]
    X = FQD.encode_ints(xs).reshape(num_windows, 1 << window, D)
    Y = FQD.encode_ints(ys).reshape(num_windows, 1 << window, D)
    inf = jnp.asarray(np.array(infs, dtype=bool)).reshape(num_windows, 1 << window)
    Xp, Yp, Zp = affine_to_proj(X, Y, inf)
    return Xp, Yp, Zp


def scalars_to_u32(scalars: list[int]) -> jnp.ndarray:
    arr = np.zeros((len(scalars), 8), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s = int(s)
        for j in range(8):
            arr[i, j] = (s >> (32 * j)) & 0xFFFFFFFF
    return jnp.asarray(arr)


def fixed_base_mul_u32(base: G1Affine, scalars_u32: jnp.ndarray, window: int = 8):
    """[s_i] * base for (N, 8) canonical u32-limb device scalars -> projective batch."""
    TX, TY, TZ = _fixed_base_tables(base, window)
    n = scalars_u32.shape[0]
    num_windows = TX.shape[0]
    per_limb = 32 // window

    @jax.jit
    def run(sc):
        acc = proj_identity((n,))

        def body(w, acc):
            limb = w // per_limb
            off = (w % per_limb) * window
            ids = (sc[:, limb] >> off) & ((1 << window) - 1)
            pt = (TX[w][ids], TY[w][ids], TZ[w][ids])
            return proj_add(FQD, acc, pt)

        return jax.lax.fori_loop(0, num_windows, body, acc)

    return run(scalars_u32)


def fixed_base_mul(base: G1Affine, scalars: list[int], window: int = 8):
    """[s_i] * base for a batch of host-int scalars; returns a projective batch."""
    return fixed_base_mul_u32(base, scalars_to_u32(scalars), window)
