"""Pippenger multi-scalar multiplication on TPU.

Replaces the reference's naive per-term MSM (kzg/src/scheme.rs:84-96: one
scalar-mul + affine fold-add per coefficient) with a windowed bucket method
formulated for SIMD/XLA:

  per window w (c bits):
    1. ids = w-th c-bit digit of each scalar
    2. sort points by id (XLA sort)
    3. sparse suffix scan: T[i] = sum_{j>=i} P_j evaluated only at the
       2^c - 1 bucket-start positions (blocked fori_loop scan, ~1.1N adds,
       O(log N / log K) graph instances — see curves/scan.py)
    4. the weighted bucket sum telescopes through the sorted order:
         sum_k k * S_k  =  sum_{k=1}^{2^c-1} T[searchsorted(ids, k)]
       so no segmented logic and no bucket array — blocked-sum the 2^c - 1
       gathered suffix values.
  windows combined MSB->LSB with c doublings between (Horner).

Work: ~1.1N + 2^(c+1) point-adds per window; every add is a full-width vector op
on the VPU (fused Pallas complete-projective kernels underneath on TPU).  Cross-chip
distribution shards points and tree-reduces per-chip partials
(zktpu/dist/msm.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.host import FQ
from ..fields.fp import device_field
from . import g1
from .g1 import FQD, proj_add, proj_double, proj_identity
from .scan import (
    point_blocked_sum,
    point_suffix_scan_sparse,
    point_suffix_scan_sparse_affine,
)


def window_digits(scalars_u32: jnp.ndarray, c: int) -> jnp.ndarray:
    """(N, 8) little-endian u32 limbs -> (W, N) c-bit window digits, LSB first.

    c may be any value in [1, 16] (windows may straddle limb boundaries)."""
    num_windows = -(-256 // c)
    cols = []
    for w in range(num_windows):
        bit = w * c
        limb, off = bit >> 5, bit & 31
        lo = scalars_u32[:, limb] >> off
        if off and limb + 1 < scalars_u32.shape[1]:
            lo = lo | (scalars_u32[:, limb + 1] << (32 - off))
        cols.append(lo & ((1 << c) - 1))
    return jnp.stack(cols, axis=0)


def _bucket_starts(ids_s: jnp.ndarray, c: int) -> jnp.ndarray:
    """lower_bound(ids_s, k) for k = 1..2^c-1 — first index with ids_s[i] >= k.

    Vectorized binary search: ~log2(N) rounds of one tiny (2^c-1,) gather
    each.  Replaces jnp.searchsorted, which XLA lowers to a per-query loop
    costing ~22 ms per window at N = 2^20 (r03 profiling: 0.36 s of a
    3.98 s MSM across 16 windows); this form costs ~1 ms total.
    """
    n = ids_s.shape[0]
    ks = jnp.arange(1, 1 << c, dtype=jnp.int32)
    lo = jnp.zeros_like(ks)
    hi = jnp.full_like(ks, n)
    rounds = max(1, (n - 1).bit_length() + 1)

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) >> 1
        go_right = ids_s[mid] < ks
        return jnp.where(go_right, mid + 1, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, rounds, body, (lo, hi))
    return hi


def _window_partial(ids, P, c: int, fq=None):
    """Bucket-accumulated partial sum for one window's digit vector `ids`.

    sum_k k*S_k telescopes over bucket starts s_k (S_k = T[s_k] - T[s_{k+1}],
    coefficient of T[s_k] is 1 for every k >= 1).

    P may be a 3-tuple of (N, D) planes or a single concatenated (N, 3D)
    array; the concatenated form turns the sorted-order reorder into ONE
    row gather instead of three.  Profiling at 2^20 shows that gather —
    not the point additions — dominates the MSM wall clock (the TPU pays
    per gathered row, so 3x fewer row-gathers on 3x wider rows is ~3x
    cheaper)."""
    fq = FQD if fq is None else fq
    # stability is irrelevant: equal ids land in the same bucket and point
    # addition is exact/commutative, so any grouping order gives the same sum
    order = jnp.argsort(ids, stable=False)
    ids_s = ids[order].astype(jnp.int32)
    if isinstance(P, tuple):
        X, Y, Z = P
        Ps = (X[order], Y[order], Z[order])
    else:
        D = P.shape[1] // 3
        g = P[order]
        Ps = (g[:, :D], g[:, D : 2 * D], g[:, 2 * D :])
    starts = _bucket_starts(ids_s, c)
    # suffix sums evaluated only at the bucket starts (starts == n -> identity)
    gathered = point_suffix_scan_sparse(fq, Ps, starts)  # (2^c - 1, D) each
    return point_blocked_sum(fq, gathered)


def msm_proj_impl(scalars_u32: jnp.ndarray, X, Y, Z, c: int = 8, fq=None):
    """MSM over a projective point batch; returns a single projective point (3 arrays).

    Unjitted trace body — call from inside an enclosing jit/shard_map region
    (the sharded MSM in zktpu/dist/msm.py traces this per shard).

    scalars_u32: (N, 8) canonical little-endian u32 limbs.
    fq: field backend for the point coordinates — the digit-Montgomery
    DeviceField (default) or an RnsField (fields/rns.py) over whose
    representation X/Y/Z must already be encoded.
    """
    fq = FQD if fq is None else fq
    digits = window_digits(scalars_u32, c)  # (W, N), LSB window first
    num_windows = digits.shape[0]
    cat = jnp.concatenate([X, Y, Z], axis=1)  # (N, 3D): one gather per window

    # per-window partials via scan: the graph carries ONE window body.
    # (A hoisted batched (W, N) sort before the scan was measured SLOWER —
    # 2.22 s vs 2.03 s at 2^20 — the in-scan per-window argsort stays.)
    def scan_body(carry, ids):
        pX, pY, pZ = _window_partial(ids, cat, c, fq=fq)
        return carry, (pX, pY, pZ)

    _, partials = jax.lax.scan(scan_body, 0, digits[::-1])  # MSB first
    pX, pY, pZ = partials

    # Horner combine: acc = 2^c * acc + partial_w
    def combine(i, acc):
        def dbl(_, a):
            return proj_double(fq, a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        return proj_add(fq, acc, (pX[i][None], pY[i][None], pZ[i][None]))

    acc0 = (pX[0][None], pY[0][None], pZ[0][None])
    out = jax.lax.fori_loop(1, num_windows, combine, acc0)
    return tuple(a[0] for a in out)


msm_proj = jax.jit(msm_proj_impl, static_argnames=("c", "fq"))


def _window_partial_affine(ids, cat, c: int):
    """Affine-point window partial: one (N, 2D) gather + mixed-add scan."""
    order = jnp.argsort(ids)
    ids_s = ids[order].astype(jnp.int32)
    D = cat.shape[1] // 2
    g = cat[order]
    A = (g[:, :D], g[:, D:])
    starts = _bucket_starts(ids_s, c)
    gathered = point_suffix_scan_sparse_affine(FQD, A, starts)
    return point_blocked_sum(FQD, gathered)


def msm_affine_impl(scalars_u32: jnp.ndarray, Xa, Ya, c: int = 8):
    """MSM over an AFFINE point batch (identity = (0, 0)); returns projective.

    EXPERIMENTAL — not wired into any prover/commit path.  On paper it beats
    msm_proj two ways: the per-window sorted gather moves (N, 2D) instead of
    (N, 3D) rows, and every phase-1 scan add is an 11M mixed addition
    (g1.proj_madd) instead of a 12M full projective one.  Measured at 2^20 it
    LOSES to the full-projective path (4.37 s vs 3.98 s — see NOTES_PERF.md
    "Mixed-add experiment" for why); kept correct and tested so any future
    kernel-layout change can re-evaluate it deliberately.
    """
    digits = window_digits(scalars_u32, c)
    num_windows = digits.shape[0]
    cat = jnp.concatenate([Xa, Ya], axis=1)  # (N, 2D)

    def scan_body(carry, ids):
        pX, pY, pZ = _window_partial_affine(ids, cat, c)
        return carry, (pX, pY, pZ)

    _, partials = jax.lax.scan(scan_body, 0, digits[::-1])  # MSB first
    pX, pY, pZ = partials

    def combine(i, acc):
        def dbl(_, a):
            return proj_double(FQD, a)

        acc = jax.lax.fori_loop(0, c, dbl, acc)
        return proj_add(FQD, acc, (pX[i][None], pY[i][None], pZ[i][None]))

    acc0 = (pX[0][None], pY[0][None], pZ[0][None])
    out = jax.lax.fori_loop(1, num_windows, combine, acc0)
    return tuple(a[0] for a in out)


msm_affine = jax.jit(msm_affine_impl, static_argnames=("c",))


@functools.partial(jax.jit, static_argnames=("c",))
def msm_affine_many(scalars_u32_k: jnp.ndarray, Xa, Ya, c: int = 8):
    """(K, N, 8) scalars x one affine point set -> K projective points."""
    return jax.vmap(lambda s: msm_affine_impl(s, Xa, Ya, c=c))(scalars_u32_k)


def pad_msm_inputs_affine(scalars_u32: jnp.ndarray, Xa, Ya):
    """Pow2-pad with zero scalars and (0, 0) affine identity points."""
    n = scalars_u32.shape[0]
    m = padded_msm_len(n)
    if m == n:
        return scalars_u32, Xa, Ya
    pad = m - n
    return (
        jnp.pad(scalars_u32, ((0, pad), (0, 0))),
        jnp.pad(Xa, ((0, pad), (0, 0))),
        jnp.pad(Ya, ((0, pad), (0, 0))),
    )

# Batched variant: K scalar vectors against ONE shared point set -> K points.
# The PLONK prover commits 2-3 same-degree polynomials per round against the
# same SRS (wires, quotient slices, opening witnesses); vmapping the whole
# Pippenger body runs their window scans as one (K*G)-wide batch, so the
# sequential suffix-scan depth and the dispatch chain are paid once instead
# of K times.  Same graph size (vmap adds a batch dim, not instances).
@functools.partial(jax.jit, static_argnames=("c", "fq"))
def msm_proj_many(scalars_u32_k: jnp.ndarray, X, Y, Z, c: int = 8, fq=None):
    """scalars (K, N, 8) x one point set (N, D) -> K projective points ((K, D) x3)."""
    return jax.vmap(lambda s: msm_proj_impl(s, X, Y, Z, c=c, fq=fq))(scalars_u32_k)

# Backwards-compatible aliases (pre-projective-migration names)
msm_jacobian_impl = msm_proj_impl
msm_jacobian = msm_proj


def padded_msm_len(n: int) -> int:
    """Compile-bucket length for an N-point MSM: next pow2 (floor 16), or
    pow2 + 256 when n is just above a power of two.

    The +256 buckets exist for the PLONK prover: blinding puts every wire /
    grand-product / quotient-slice / witness polynomial at degree
    circuit_size + {1..5} (plonk/src/prover.rs:68-90), and rounding those
    to the NEXT pow2 would double the MSM work of all nine size-n commits.
    The scan (curves/scan.py) handles any length, so the only cost is one
    more compile bucket per size."""
    if n <= 1:
        return 16
    m = max(16, 1 << (n - 1).bit_length())
    h = m >> 1
    if h >= 4096 and n <= h + 256:
        return h + 256
    return m


def pad_msm_inputs(scalars_u32: jnp.ndarray, X, Y, Z):
    """Pad N to a power of two (>=16) with zero scalars / identity points so
    MSM compiles once per pow2 bucket instead of once per exact length.
    Zero scalars land in bucket 0 of every window, which the weighted sum
    excludes, so padding cannot change the result."""
    n = scalars_u32.shape[0]
    m = padded_msm_len(n)
    if m == n:
        return scalars_u32, X, Y, Z
    pad = m - n
    sc = jnp.pad(scalars_u32, ((0, pad), (0, 0)))
    iX, iY, iZ = g1.proj_identity((pad,))
    X = jnp.concatenate([X, iX], axis=0)
    Y = jnp.concatenate([Y, iY], axis=0)
    Z = jnp.concatenate([Z, iZ], axis=0)
    return sc, X, Y, Z


def pick_window(n: int) -> int:
    """Window size heuristic: balance the ~2N-add scan per window (more
    windows = more scans) against the 2^c-add bucket fold per window."""
    if n <= (1 << 8):
        return 4
    if n <= (1 << 12):
        return 8
    if n <= (1 << 18):
        return 13
    return 16


def msm(scalars: list[int], points_dev, c: int | None = None):
    """Host wrapper: scalars (python ints) x device projective points -> G1Affine."""
    from .host_curve import G1Affine

    n = len(scalars)
    if n == 0:
        return G1Affine.identity()
    if c is None:
        c = pick_window(n)
    X, Y, Z = points_dev
    sc = g1.scalars_to_u32(scalars)
    sc, Xp, Yp, Zp = pad_msm_inputs(sc, X[:n], Y[:n], Z[:n])
    R = msm_proj(sc, Xp, Yp, Zp, c=c)
    return g1.proj_to_affine_host(tuple(a[None] for a in R))[0]
