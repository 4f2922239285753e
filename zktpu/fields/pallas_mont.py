"""Pallas TPU kernel for batched Montgomery multiplication.

One fused VMEM-resident kernel per batch tile replaces the ~150-op XLA graph
of DeviceField._mont_mul (zktpu/fields/fp.py): the (N, D, D) partial-product
intermediates never touch HBM, so the op becomes compute-bound on the VPU
instead of HBM-bandwidth-bound.

Layout: HBM arrays are (N, D) little-endian base-2^16 digits in uint32.  The
kernel transposes each (T, D) tile to (D, T) so the batch rides the 128-wide
lane axis and digit shifts are cheap sublane slices.  The algorithm is the
same exact-arithmetic Montgomery reduction as the jnp path (schoolbook
columns split lo16/hi16, Kogge-Stone carry resolve, m = t*(-p^-1) mod R,
t + m*p, conditional subtract), so outputs are bit-identical.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .host import FieldSpec

_MASK = np.uint32(0xFFFF)
TILE = 256  # batch elements per grid step


def _digits(value: int, n: int) -> list[int]:
    return [(value >> (16 * i)) & 0xFFFF for i in range(n)]


def _shift_rows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift rows toward higher indices by k (zero fill), same row count."""
    if k == 0:
        return x
    pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[: x.shape[0] - k]], axis=0)


def _ks_resolve_rows(v: jnp.ndarray):
    """Row-axis Kogge-Stone carry resolve; v rows each < 2^17.

    Returns (digits, top_row_value) — the row-axis twin of fp._ks_resolve.
    """
    K = v.shape[0]
    # 0/1 uint32 flags (bool vectors trip Mosaic's vreg bitcasts)
    G = v >> 16  # generate: v >= 2^16 (v < 2^17 so this is 0/1)
    P = ((v & _MASK) + 1) >> 16  # propagate: low half == 0xFFFF
    d = 1
    while d < K:
        G = G | (P & _shift_rows(G, d))
        P = P & _shift_rows(P, d)
        d *= 2
    out = v + _shift_rows(G, 1)
    return out & _MASK, out[K - 1 : K][0]


def _carry_rows(cols: jnp.ndarray, num_out: int):
    """Exact carry propagation of column sums (< 2^31) into 2^16 digits."""
    k_in = cols.shape[0]
    W = num_out + 1
    if k_in < W:
        cols = jnp.concatenate(
            [cols, jnp.zeros((W - k_in,) + cols.shape[1:], cols.dtype)], axis=0
        )
    d = cols & _MASK
    c = cols >> 16
    v = d + _shift_rows(c, 1)
    digits, top = _ks_resolve_rows(v)
    return digits[:num_out], top


def _make_kernel(spec: FieldSpec):
    D = spec.num_digits
    p_digits = _digits(spec.modulus, D)
    pinv_digits = _digits(spec.mont_pinv_full, D)
    mask_minus_p = np.array(
        [0xFFFF - d for d in p_digits], dtype=np.uint32
    ).reshape(D, 1)
    rmp_col = np.array(
        _digits(spec.mont_r - spec.modulus, D), dtype=np.uint32
    ).reshape(D, 1)

    def _pad_rows(x, start, total):
        """Place x's rows at [start, start+rows) within `total` rows."""
        rows = x.shape[0]
        parts = []
        if start:
            parts.append(jnp.zeros((start,) + x.shape[1:], x.dtype))
        parts.append(x)
        tail = total - start - rows
        if tail:
            parts.append(jnp.zeros((tail,) + x.shape[1:], x.dtype))
        return jnp.concatenate(parts, axis=0) if len(parts) > 1 else x

    def conv_full(a, b_rows):
        """Schoolbook columns of a (D,T) x b (D,T) -> (2D, T) sums."""
        acc = None
        for j in range(D):
            prod = a * b_rows[j]
            lo = _pad_rows(prod & _MASK, j, 2 * D)
            hi = _pad_rows(prod >> 16, j + 1, 2 * D)
            term = lo + hi
            acc = term if acc is None else acc + term
        return acc

    def conv_const_low(a, const_digits):
        """Low D columns of a (D,T) x constant."""
        T = a.shape[1]
        acc = jnp.zeros((D, T), jnp.uint32)
        for j in range(D):
            cj = const_digits[j]
            if cj == 0:
                continue
            prod = a * np.uint32(cj)
            acc = acc + _pad_rows((prod & _MASK)[: D - j], j, D)
            if j + 1 < D:
                acc = acc + _pad_rows((prod >> 16)[: D - j - 1], j + 1, D)
        return acc

    def conv_const_full(a, const_digits):
        T = a.shape[1]
        acc = jnp.zeros((2 * D, T), jnp.uint32)
        for j in range(D):
            cj = const_digits[j]
            if cj == 0:
                continue
            prod = a * np.uint32(cj)
            acc = acc + _pad_rows(prod & _MASK, j, 2 * D)
            acc = acc + _pad_rows(prod >> 16, j + 1, 2 * D)
        return acc

    def cond_sub_p(a, carry_top, mask_minus_p, rmp_col):
        """Reduce carry_top * R + a (< 2p) into [0, p)."""
        # a - p via two's complement rows
        v = a + mask_minus_p
        v = jnp.concatenate([v[0:1] + 1, v[1:]], axis=0)
        d, top = _ks_resolve_rows(v)
        ge_p = (top >> 16) > 0  # no borrow -> a >= p
        e_v = a + rmp_col
        e, _ = _ks_resolve_rows(e_v)
        res = jnp.where(ge_p[None, :], d, a)
        return jnp.where((carry_top > 0)[None, :], e, res)

    def kernel(const_ref, a_ref, b_ref, out_ref):
        a = a_ref[:].T  # (D, T)
        b = b_ref[:].T
        b_rows = [b[j : j + 1, :] for j in range(D)]
        cols = conv_full(a, b_rows)
        t_lo, _ = _carry_rows(cols[:D], D)
        m_cols = conv_const_low(t_lo, pinv_digits)
        m, _ = _carry_rows(m_cols, D)
        mp_cols = conv_const_full(m, p_digits)
        _, c_low_total = _carry_rows(cols[:D] + mp_cols[:D], D)
        hi = cols[D:] + mp_cols[D:]
        hi = jnp.concatenate([hi[0:1] + c_low_total[None, :], hi[1:]], axis=0)
        res, carry_top = _carry_rows(hi, D)
        out_ref[:] = cond_sub_p(
            res, carry_top, const_ref[0:1, :].T, const_ref[1:2, :].T
        ).T

    consts = np.stack([mask_minus_p[:, 0], rmp_col[:, 0]])  # (2, D)
    return kernel, consts


@functools.lru_cache(maxsize=None)
def _mont_mul_call(spec: FieldSpec, n_tiles: int, interpret: bool):
    D = spec.num_digits
    kernel, consts = _make_kernel(spec)
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, D), jnp.uint32),
        interpret=interpret,
    )
    # keep consts as numpy: a jnp array materialized during a traced first
    # call would leak that trace's tracer into the lru_cached closure
    def run(a, b):
        return call(consts, a, b)

    return run


def mont_mul_pallas(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched Montgomery product via the fused kernel.

    a, b: (..., D) uint32 digit arrays (broadcastable); returns broadcast shape.
    """
    D = spec.num_digits
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (D,)).reshape(-1, D)
    b = jnp.broadcast_to(b, shape + (D,)).reshape(-1, D)
    n = a.shape[0]
    n_tiles = max(1, -(-n // TILE))
    padded = n_tiles * TILE
    if padded != n:
        a = jnp.pad(a, ((0, padded - n), (0, 0)))
        b = jnp.pad(b, ((0, padded - n), (0, 0)))
    out = _mont_mul_call(spec, n_tiles, interpret)(a, b)
    return out[:n].reshape(shape + (D,))
