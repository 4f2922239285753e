"""Pippenger multi-scalar multiplication on TPU.

Replaces the reference's naive per-term MSM (kzg/src/scheme.rs:84-96: one
scalar-mul + affine fold-add per coefficient) with a windowed bucket method
formulated for SIMD/XLA:

  per window w (c bits):
    1. ids = w-th c-bit digit of each scalar
    2. sort points by id (XLA sort)
    3. one *unsegmented* suffix scan T[i] = sum_{j>=i} P_j over the sorted
       points (work-efficient Blelloch tree: ~3N point-adds, static levels)
    4. the weighted bucket sum telescopes through the sorted order:
         sum_k k * S_k  =  sum_{k=1}^{2^c-1} T[searchsorted(ids, k)]
       so no segmented logic and no bucket array — gather 2^c-1 rows of T
       and tree-reduce them (2^c adds).
  windows combined MSB->LSB with c doublings between.

Work: ~3N + 2^c point-adds per window (vs N log N for the doubling-scan
formulation); every add is a full-width vector op on the VPU with the fused
Pallas Montgomery kernel underneath.  Cross-chip distribution shards points
and tree-reduces the per-chip partials (zktpu/dist/msm.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.host import FQ
from ..fields.fp import device_field
from . import g1
from .g1 import FQD, jac_add, jac_double, jac_identity, jac_tree_sum


def _interleave(a, b):
    """Interleave rows: out[2i] = a[i], out[2i+1] = b[i]."""
    n, D = a.shape
    return jnp.stack([a, b], axis=1).reshape(2 * n, D)


def _prefix_scan_blelloch(P):
    """Inclusive prefix sums of Jacobian points, work-efficient (~3N adds).

    Static python loops over log N halving/doubling levels: upsweep pairwise
    sums, downsweep exclusive scan, one final add for inclusive.
    """
    X, Y, Z = P
    n = X.shape[0]
    assert n & (n - 1) == 0, "blelloch scan requires pow2 length"
    if n == 1:
        return P
    levels = []
    cur = P
    while cur[0].shape[0] > 1:
        even = tuple(a[0::2] for a in cur)
        odd = tuple(a[1::2] for a in cur)
        levels.append(even)
        cur = jac_add(FQD, even, odd)
    # downsweep: exclusive scan
    ex = jac_identity((1,))
    for even in reversed(levels):
        odd_ex = jac_add(FQD, ex, even)
        ex = tuple(_interleave(e, o) for e, o in zip(ex, odd_ex))
    # inclusive[i] = exclusive[i] + P[i]
    return jac_add(FQD, ex, P)


def _suffix_scan(P):
    """T[i] = sum_{j>=i} P_j via reversed Blelloch prefix scan."""
    rev = tuple(jnp.flip(a, axis=0) for a in P)
    inc = _prefix_scan_blelloch(rev)
    return tuple(jnp.flip(a, axis=0) for a in inc)


def _window_partial(scalars_u32: jnp.ndarray, P, w, c: int):
    """Bucket-accumulated partial sum for window w (traced).

    sum_k k*S_k telescopes over bucket starts s_k (S_k = T[s_k] - T[s_{k+1}],
    coefficient of T[s_k] is 1 for every k >= 1)."""
    per_limb = 32 // c
    limb = w // per_limb
    off = (w % per_limb) * c
    ids = (scalars_u32[:, limb] >> off) & ((1 << c) - 1)
    order = jnp.argsort(ids)
    ids_s = ids[order].astype(jnp.int32)
    X, Y, Z = P
    Ps = (X[order], Y[order], Z[order])
    T = _suffix_scan(Ps)
    # extend with identity at index n (empty tail)
    T_ext = tuple(
        jnp.concatenate([a, jnp.zeros((1, a.shape[-1]), a.dtype)], axis=0) for a in T
    )
    ks = jnp.arange(1, 1 << c, dtype=jnp.int32)
    starts = jnp.searchsorted(ids_s, ks, side="left").astype(jnp.int32)
    gathered = tuple(a[starts] for a in T_ext)  # (2^c - 1, D) each
    return jac_tree_sum(gathered)


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
