"""Pippenger multi-scalar multiplication on TPU.

Replaces the reference's naive per-term MSM (kzg/src/scheme.rs:84-96: one
scalar-mul + affine fold-add per coefficient) with a windowed bucket method
formulated for SIMD/XLA:

  per window w (c bits):
    1. ids = w-th c-bit digit of each scalar
    2. sort points by id (XLA sort)
    3. segmented inclusive scan (Hillis-Steele doubling inside a fori_loop:
       log N vectorized point-adds, graph stays one add per loop body)
    4. segment tails scattered into the 2^c bucket array
    5. weighted bucket sum  sum_k k * S_k  via a reverse cumulative point-sum
       and a tree reduction
  windows combined MSB->LSB with c doublings between.

Work: ~N log N + 2^(c+1) point-adds per window — all as full-width vector
ops on the VPU; cross-chip distribution shards points and psums the window
partials (zktpu/dist).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.host import FQ
from ..fields.fp import device_field
from . import g1
from .g1 import FQD, jac_add, jac_double, jac_identity


def _segmented_scan_tails(ids: jnp.ndarray, P, num_buckets: int):
    """ids sorted ascending; returns bucket array S[k] = sum of points with id k."""
    n = ids.shape[0]
    log_n = max((n - 1).bit_length(), 1)

    def body(i, carry):
        ids_c, X, Y, Z = carry
        d = 1 << i
        idx = jnp.arange(n, dtype=jnp.int32) - d
        valid = idx >= 0
        idxc = jnp.clip(idx, 0, n - 1)
        sid = jnp.where(valid, ids_c[idxc], num_buckets + 1)
        sX, sY, sZ = X[idxc], Y[idxc], Z[idxc]
        same = jnp.logical_and(valid, sid == ids_c)
        # add shifted point where in same segment, else keep
        zero = jnp.zeros_like(sZ)
        sZ = jnp.where(same[..., None], sZ, zero)  # identity where different
        nX, nY, nZ = jac_add(FQD, (X, Y, Z), (sX, sY, sZ))
        return (ids_c, nX, nY, nZ)

    X, Y, Z = P
    _, X, Y, Z = jax.lax.fori_loop(0, log_n, body, (ids, X, Y, Z))
    # segment tails: last element of each run
    nxt = jnp.concatenate([ids[1:], jnp.full((1,), num_buckets + 7, ids.dtype)])
    is_tail = nxt != ids
    scatter_idx = jnp.where(is_tail, ids, num_buckets).astype(jnp.int32)
    D = X.shape[-1]
    SX = jnp.zeros((num_buckets + 1, D), dtype=jnp.uint32).at[scatter_idx].set(X)
    SY = jnp.zeros((num_buckets + 1, D), dtype=jnp.uint32).at[scatter_idx].set(Y)
    SZ = jnp.zeros((num_buckets + 1, D), dtype=jnp.uint32).at[scatter_idx].set(Z)
    return SX[:num_buckets], SY[:num_buckets], SZ[:num_buckets]


def _suffix_cumsum(P):
    """Point suffix sums T_j = sum_{k>=j} P_k (log-depth doubling, fori_loop)."""
    X0, Y0, Z0 = P
    n = X0.shape[0]
    log_n = max((n - 1).bit_length(), 1)

    def body(i, carry):
        X, Y, Z = carry
        d = 1 << i
        idx = jnp.arange(n, dtype=jnp.int32) + d
        valid = idx < n
        idxc = jnp.clip(idx, 0, n - 1)
        sX, sY, sZ = X[idxc], Y[idxc], Z[idxc]
        sZ = jnp.where(valid[..., None], sZ, jnp.zeros_like(sZ))
        return jac_add(FQD, (X, Y, Z), (sX, sY, sZ))

    return jax.lax.fori_loop(0, log_n, body, (X0, Y0, Z0))


def _weighted_bucket_sum(S):
    """sum_k k * S_k = sum_{j>=1} T_j with T = suffix sums: two suffix scans.

    (The second scan's element 1 is sum_{j>=1} T_j; reusing the same loop
    keeps the compiled graph at one point-add per loop body.)
    """
    TX, TY, TZ = _suffix_cumsum(S)
    UX, UY, UZ = _suffix_cumsum((TX, TY, TZ))
    return UX[1], UY[1], UZ[1]


def _window_partial(scalars_u32: jnp.ndarray, P, w, c: int):
    """Bucket-accumulated partial sum for window w (traced)."""
    per_limb = 32 // c
    limb = w // per_limb
    off = (w % per_limb) * c
    ids = (scalars_u32[:, limb] >> off) & ((1 << c) - 1)
    order = jnp.argsort(ids)
    ids_s = ids[order].astype(jnp.int32)
    X, Y, Z = P
    Ps = (X[order], Y[order], Z[order])
    S = _segmented_scan_tails(ids_s, Ps, 1 << c)
    return _weighted_bucket_sum(S)


def msm_jacobian_impl(scalars_u32: jnp.ndarray, X, Y, Z, c: int = 8):
    """MSM over Jacobian point batch; returns a single Jacobian point (3 arrays).

    Unjitted trace body — call from inside an enclosing jit/shard_map region
    (the sharded MSM in zktpu/dist/msm.py traces this per shard).

    scalars_u32: (N, 8) canonical little-endian u32 limbs.
    """
    num_windows = 256 // c

    # compute per-window partials via scan to keep the graph at one window body
    def scan_body(carry, w):
        return carry, _window_partial(scalars_u32, (X, Y, Z), w, c)

    _, partials = jax.lax.scan(
        scan_body, 0, jnp.arange(num_windows - 1, -1, -1, dtype=jnp.int32)
    )
    pX, pY, pZ = partials  # ordered MSB window first

    def combine(i, acc):
        def dbl(_, a):
            return jac_double(FQD, a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        return jac_add(FQD, acc, (pX[i], pY[i], pZ[i]))

    acc0 = jac_add(FQD, jac_identity(()), (pX[0], pY[0], pZ[0]))
    return jax.lax.fori_loop(1, num_windows, combine, acc0)


msm_jacobian = jax.jit(msm_jacobian_impl, static_argnames=("c",))


def pad_msm_inputs(scalars_u32: jnp.ndarray, X, Y, Z):
    """Pad N to a power of two (>=16) with zero scalars / identity points so
    MSM compiles once per pow2 bucket instead of once per exact length.
    Zero scalars land in bucket 0 of every window, which the weighted sum
    excludes, so padding cannot change the result."""
    n = scalars_u32.shape[0]
    m = max(16, 1 << (n - 1).bit_length()) if n > 1 else 16
    if m == n:
        return scalars_u32, X, Y, Z
    pad = m - n
    sc = jnp.pad(scalars_u32, ((0, pad), (0, 0)))
    X = jnp.pad(X, ((0, pad), (0, 0)))
    Y = jnp.pad(Y, ((0, pad), (0, 0)))
    Z = jnp.pad(Z, ((0, pad), (0, 0)))
    return sc, X, Y, Z


def pick_window(n: int) -> int:
    """Window size heuristic (must divide 32): balances the N log N segmented
    scan against the 2^(c+1) bucket-scan point-adds per window."""
    if n <= (1 << 8):
        return 4
    if n <= (1 << 15):
        return 8
    return 16


def msm(scalars: list[int], points_dev, c: int | None = None):
    """Host wrapper: scalars (python ints) x device Jacobian points -> G1Affine."""
    from .host_curve import G1Affine

    n = len(scalars)
    if n == 0:
        return G1Affine.identity()
    if c is None:
        c = pick_window(n)
    X, Y, Z = points_dev
    sc = g1.scalars_to_u32(scalars)
    sc, Xp, Yp, Zp = pad_msm_inputs(sc, X[:n], Y[:n], Z[:n])
    R = msm_jacobian(sc, Xp, Yp, Zp, c=c)
    return g1.jac_to_affine_host(tuple(a[None] for a in R))[0]
