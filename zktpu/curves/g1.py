"""Device (TPU) BLS12-381 G1 arithmetic over limb vectors.

Points are Jacobian triples (X, Y, Z) of Fq digit arrays (..., 24) uint32 in
Montgomery form; Z == 0 encodes the identity (so an all-zero buffer is a
valid identity point — bucket initialization is just jnp.zeros).

The group law is branchless: both the general-add and doubling paths are
computed and the correct lane selected, so the same kernel handles identity
operands, P + P and P + (-P).  This is the TPU-native replacement for
arkworks' ark-ec projective arithmetic used by the reference's MSM loop
(kzg/src/scheme.rs:84-96).
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


def jac_identity(shape=()) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    z = jnp.zeros(shape + (D,), dtype=jnp.uint32)
    return z, z, z


def affine_to_jac(x_digits: jnp.ndarray, y_digits: jnp.ndarray, inf_mask=None):
    """Affine Montgomery coords -> Jacobian; inf_mask selects identity lanes."""
    one = jnp.broadcast_to(jnp.asarray(FQD.one_np), x_digits.shape)
    z = one
    if inf_mask is not None:
        z = jnp.where(inf_mask[..., None], jnp.zeros_like(one), one)
    return x_digits, y_digits, z


def host_points_to_device(points: list[G1Affine]) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    xs = FQD.encode_ints([p.x for p in points])
    ys = FQD.encode_ints([p.y for p in points])
    inf = jnp.asarray(np.array([p.infinity for p in points], dtype=bool))
    return affine_to_jac(xs, ys, inf)


def jac_double(fq: DeviceField, P):
    X, Y, Z = P
    A = fq.mont_mul(X, X)
    B = fq.mont_mul(Y, Y)
    C = fq.mont_mul(B, B)
    t = fq.add(X, B)
    t = fq.mont_mul(t, t)
    t = fq.sub(fq.sub(t, A), C)
    Dd = fq.double(t)  # D = 2((X+B)^2 - A - C)
    E = fq.add(fq.double(A), A)  # 3A
    F = fq.mont_mul(E, E)
    X3 = fq.sub(F, fq.double(Dd))
    Y3 = fq.sub(fq.mont_mul(E, fq.sub(Dd, X3)), fq.double(fq.double(fq.double(C))))
    Z3 = fq.double(fq.mont_mul(Y, Z))
    return X3, Y3, Z3


def jac_add(fq: DeviceField, P1, P2):
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    inf1 = fq.is_zero(Z1)
    inf2 = fq.is_zero(Z2)
    Z1Z1 = fq.mont_mul(Z1, Z1)
    Z2Z2 = fq.mont_mul(Z2, Z2)
    U1 = fq.mont_mul(X1, Z2Z2)
    U2 = fq.mont_mul(X2, Z1Z1)
    S1 = fq.mont_mul(fq.mont_mul(Y1, Z2), Z2Z2)
    S2 = fq.mont_mul(fq.mont_mul(Y2, Z1), Z1Z1)
    H = fq.sub(U2, U1)
    rr = fq.sub(S2, S1)
    same_x = fq.is_zero(H)
    same_y = fq.is_zero(rr)

    HH = fq.mont_mul(H, H)
    HHH = fq.mont_mul(H, HH)
    V = fq.mont_mul(U1, HH)
    X3 = fq.sub(fq.sub(fq.mont_mul(rr, rr), HHH), fq.double(V))
    Y3 = fq.sub(fq.mont_mul(rr, fq.sub(V, X3)), fq.mont_mul(S1, HHH))
    Z3 = fq.mont_mul(fq.mont_mul(Z1, Z2), H)

    dX, dY, dZ = jac_double(fq, P1)

    both = jnp.logical_and(jnp.logical_not(inf1), jnp.logical_not(inf2))
    use_dbl = jnp.logical_and(both, jnp.logical_and(same_x, same_y))
    use_inf = jnp.logical_and(both, jnp.logical_and(same_x, jnp.logical_not(same_y)))

    def sel(c, a, b):
        return jnp.where(c[..., None], a, b)

    X3 = sel(use_dbl, dX, X3)
    Y3 = sel(use_dbl, dY, Y3)
    Z3 = sel(use_dbl, dZ, Z3)
    Z3 = jnp.where(use_inf[..., None], jnp.zeros_like(Z3), Z3)
    X3 = sel(inf1, X2, X3)
    Y3 = sel(inf1, Y2, Y3)
    Z3 = sel(inf1, Z2, Z3)
    X3 = sel(inf2, X1, X3)
    Y3 = sel(inf2, Y1, Y3)
    Z3 = sel(inf2, Z1, Z3)
    return X3, Y3, Z3


def jac_tree_sum(P, axis: int = 0):
    """Sum a batch of Jacobian points along `axis` via log-depth tree adds."""
    X, Y, Z = (jnp.moveaxis(a, axis, 0) for a in P)
    n = X.shape[0]
    while n > 1:
        half = n // 2
        sX, sY, sZ = jac_add(FQD, (X[:half], Y[:half], Z[:half]), (X[half : 2 * half], Y[half : 2 * half], Z[half : 2 * half]))
        if n % 2:
            sX = jnp.concatenate([sX, X[2 * half : 2 * half + 1]], axis=0)
            sY = jnp.concatenate([sY, Y[2 * half : 2 * half + 1]], axis=0)
            sZ = jnp.concatenate([sZ, Z[2 * half : 2 * half + 1]], axis=0)
        X, Y, Z = sX, sY, sZ
        n = X.shape[0]
    return X[0], Y[0], Z[0]


def jac_to_affine_host(P) -> list[G1Affine]:
    """Batch Jacobian -> host affine points (one batched inversion)."""
    X, Y, Z = P
    X = X.reshape(-1, D)
    Y = Y.reshape(-1, D)
    Z = Z.reshape(-1, D)
    x_ints = FQD.decode_ints(X)
    y_ints = FQD.decode_ints(Y)
    z_ints = FQD.decode_ints(Z)
    p = FQ.modulus
    out = []
    for x, y, z in zip(x_ints, y_ints, z_ints):
        if z == 0:
            out.append(G1Affine.identity())
        else:
            zi = pow(z, -1, p)
            zi2 = zi * zi % p
            out.append(G1Affine(x * zi2 % p, y * zi2 * zi % p))
    return out


def jac_points_equal_host(P, Q) -> bool:
    return jac_to_affine_host(P) == jac_to_affine_host(Q)


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
    Xj, Yj, Zj = affine_to_jac(X, Y, inf)
    return Xj, Yj, Zj


def scalars_to_u32(scalars: list[int]) -> jnp.ndarray:
    arr = np.zeros((len(scalars), 8), dtype=np.uint32)
    for i, s in enumerate(scalars):
        s = int(s)
        for j in range(8):
            arr[i, j] = (s >> (32 * j)) & 0xFFFFFFFF
    return jnp.asarray(arr)


def fixed_base_mul(base: G1Affine, scalars: list[int], window: int = 8):
    """[s_i] * base for a batch of scalars; returns a Jacobian device point batch."""
    TX, TY, TZ = _fixed_base_tables(base, window)
    sc = scalars_to_u32(scalars)
    n = sc.shape[0]
    num_windows = TX.shape[0]
    per_limb = 32 // window

    @jax.jit
    def run(sc):
        acc = jac_identity((n,))

        def body(w, acc):
            limb = w // per_limb
            off = (w % per_limb) * window
            ids = (sc[:, limb] >> off) & ((1 << window) - 1)
            pt = (TX[w][ids], TY[w][ids], TZ[w][ids])
            return jac_add(FQD, acc, pt)

        return jax.lax.fori_loop(0, num_windows, body, acc)

    return run(sc)
