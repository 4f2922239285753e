"""Fused Pallas TPU kernels for BLS12-381 G1 projective point operations.

A complete projective point addition (RCB Alg. 7, a = 0) is 12 Montgomery
multiplications plus cheap digit-carry adds.  Composed from per-op kernels
each mul round-trips its operands through HBM (3 x 96 B per element per mul)
and pays a kernel launch; fused here, all intermediates live in VMEM for the
whole group law, so one point-add costs one launch and 9 x 96 B of HBM
traffic (6 inputs + 3 outputs).  This kernel is the inner loop of the
Pippenger MSM (zktpu/curves/msm.py) that replaces the reference's naive
per-term commit loop (kzg/src/scheme.rs:84-96).

Semantics are identical to the jnp path in zktpu/curves/g1.py: complete
formulas, no branches, identity = (0 : 1 : 0), all digit planes canonical
Montgomery base-2^16 in uint32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.host import FieldSpec
from ..fields.pallas_mont import RowOps, row_consts, mont_matmats, use_mxu_consts

TILE = 256


def _mul12(ops, a):
    """12*a = 3b*a for BLS12-381 G1 (b = 4) via a double/add chain."""
    a4 = ops.dbl(ops.dbl(a))
    return ops.add(ops.dbl(a4), a4)


def _proj_add_rows(ops, P1, P2):
    """RCB Alg. 7 over (D, T) row planes; mirrors g1._proj_add_jnp."""
    X1, Y1, Z1 = P1
    X2, Y2, Z2 = P2
    t0 = ops.mul(X1, X2)
    t1 = ops.mul(Y1, Y2)
    t2 = ops.mul(Z1, Z2)
    t3 = ops.sub(ops.mul(ops.add(X1, Y1), ops.add(X2, Y2)), ops.add(t0, t1))
    t4 = ops.sub(ops.mul(ops.add(Y1, Z1), ops.add(Y2, Z2)), ops.add(t1, t2))
    t5 = ops.sub(ops.mul(ops.add(X1, Z1), ops.add(X2, Z2)), ops.add(t0, t2))
    t0 = ops.add(ops.dbl(t0), t0)
    t2 = _mul12(ops, t2)
    Zc = ops.add(t1, t2)
    t1 = ops.sub(t1, t2)
    t5 = _mul12(ops, t5)
    X3 = ops.sub(ops.mul(t3, t1), ops.mul(t4, t5))
    Y3 = ops.add(ops.mul(t1, Zc), ops.mul(t5, t0))
    Z3 = ops.add(ops.mul(Zc, t4), ops.mul(t0, t3))
    return X3, Y3, Z3


def _proj_madd_rows(ops, P1, A2):
    """RCB Alg. 8 (a = 0, Z2 = 1) over (D, T) row planes: 11M mixed add.

    Complete for any projective P1; the affine identity (0, 0) — off-curve,
    unambiguous — is handled by the trailing select.  Mirrors
    g1._proj_madd_jnp.
    """
    X1, Y1, Z1 = P1
    X2, Y2 = A2
    t0 = ops.mul(X1, X2)
    t1 = ops.mul(Y1, Y2)
    t3 = ops.sub(ops.mul(ops.add(X1, Y1), ops.add(X2, Y2)), ops.add(t0, t1))
    t4 = ops.add(Y1, ops.mul(Y2, Z1))
    t5 = ops.add(X1, ops.mul(X2, Z1))
    t0 = ops.add(ops.dbl(t0), t0)
    t2 = _mul12(ops, Z1)
    Zc = ops.add(t1, t2)
    t1 = ops.sub(t1, t2)
    t5 = _mul12(ops, t5)
    X3 = ops.sub(ops.mul(t3, t1), ops.mul(t4, t5))
    Y3 = ops.add(ops.mul(t1, Zc), ops.mul(t5, t0))
    Z3 = ops.add(ops.mul(Zc, t4), ops.mul(t0, t3))
    inf2 = jnp.logical_and(ops.is_zero(X2), ops.is_zero(Y2))  # (1, T)
    return (
        ops.select(inf2, X1, X3),
        ops.select(inf2, Y1, Y3),
        ops.select(inf2, Z1, Z3),
    )


def _proj_double_rows(ops, P):
    """RCB Alg. 9 over (D, T) row planes; mirrors g1._proj_double_jnp."""
    X, Y, Z = P
    t0 = ops.sqr(Y)
    Z3 = ops.dbl(ops.dbl(ops.dbl(t0)))
    t1 = ops.mul(Y, Z)
    t2 = _mul12(ops, ops.sqr(Z))
    X3 = ops.mul(t2, Z3)
    Y3 = ops.add(t0, t2)
    Z3 = ops.mul(t1, Z3)
    t2 = ops.add(ops.dbl(t2), t2)
    t0 = ops.sub(t0, t2)
    Y3 = ops.add(ops.mul(t0, Y3), X3)
    X3 = ops.dbl(ops.mul(t0, ops.mul(X, Y)))
    return X3, Y3, Z3


@functools.lru_cache(maxsize=None)
def _proj_add_call(spec: FieldSpec, n_tiles: int, interpret: bool):
    D = spec.num_digits
    consts = row_consts(spec)
    mxu = use_mxu_consts(spec)
    mats = mont_matmats(spec) if mxu else np.zeros((1, 1, 1), dtype=np.float32)

    def kernel(const_ref, mat_ref, x1, y1, z1, x2, y2, z2, xo, yo, zo):
        ops = RowOps(spec, const_ref[:].T, mat_ref[:] if mxu else None)
        P1 = (x1[:].T, y1[:].T, z1[:].T)
        P2 = (x2[:].T, y2[:].T, z2[:].T)
        X3, Y3, Z3 = _proj_add_rows(ops, P1, P2)
        xo[:] = X3.T
        yo[:] = Y3.T
        zo[:] = Z3.T

    spec_block = pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_block = pl.BlockSpec((3, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_block = pl.BlockSpec(mats.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[const_block, mat_block] + [spec_block] * 6,
        out_specs=(spec_block, spec_block, spec_block),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles * TILE, D), jnp.uint32) for _ in range(3)
        ),
        interpret=interpret,
    )

    def run(*operands):
        return call(consts, mats, *operands)

    return run


@functools.lru_cache(maxsize=None)
def _proj_madd_call(spec: FieldSpec, n_tiles: int, interpret: bool):
    D = spec.num_digits
    consts = row_consts(spec)
    mxu = use_mxu_consts(spec)
    mats = mont_matmats(spec) if mxu else np.zeros((1, 1, 1), dtype=np.float32)

    def kernel(const_ref, mat_ref, x1, y1, z1, x2, y2, xo, yo, zo):
        ops = RowOps(spec, const_ref[:].T, mat_ref[:] if mxu else None)
        P1 = (x1[:].T, y1[:].T, z1[:].T)
        A2 = (x2[:].T, y2[:].T)
        X3, Y3, Z3 = _proj_madd_rows(ops, P1, A2)
        xo[:] = X3.T
        yo[:] = Y3.T
        zo[:] = Z3.T

    spec_block = pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_block = pl.BlockSpec((3, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_block = pl.BlockSpec(mats.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[const_block, mat_block] + [spec_block] * 5,
        out_specs=(spec_block, spec_block, spec_block),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles * TILE, D), jnp.uint32) for _ in range(3)
        ),
        interpret=interpret,
    )

    def run(*operands):
        return call(consts, mats, *operands)

    return run


def proj_madd_pallas(spec: FieldSpec, P1, A2, interpret: bool = False):
    """Fused mixed add: projective (..., D) triple + affine (..., D) pair."""
    D = spec.num_digits
    shape = jnp.broadcast_shapes(*[a.shape[:-1] for a in (*P1, *A2)])
    flat = [
        jnp.broadcast_to(a, shape + (D,)).reshape(-1, D) for a in (*P1, *A2)
    ]
    n = flat[0].shape[0]
    n_tiles = max(1, -(-n // TILE))
    padded = n_tiles * TILE
    if padded != n:
        flat = [jnp.pad(a, ((0, padded - n), (0, 0))) for a in flat]
    X3, Y3, Z3 = _proj_madd_call(spec, n_tiles, interpret)(*flat)
    return tuple(a[:n].reshape(shape + (D,)) for a in (X3, Y3, Z3))


@functools.lru_cache(maxsize=None)
def _proj_double_call(spec: FieldSpec, n_tiles: int, interpret: bool):
    D = spec.num_digits
    consts = row_consts(spec)
    mxu = use_mxu_consts(spec)
    mats = mont_matmats(spec) if mxu else np.zeros((1, 1, 1), dtype=np.float32)

    def kernel(const_ref, mat_ref, x1, y1, z1, xo, yo, zo):
        ops = RowOps(spec, const_ref[:].T, mat_ref[:] if mxu else None)
        X3, Y3, Z3 = _proj_double_rows(ops, (x1[:].T, y1[:].T, z1[:].T))
        xo[:] = X3.T
        yo[:] = Y3.T
        zo[:] = Z3.T

    spec_block = pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_block = pl.BlockSpec((3, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    mat_block = pl.BlockSpec(mats.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[const_block, mat_block] + [spec_block] * 3,
        out_specs=(spec_block, spec_block, spec_block),
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles * TILE, D), jnp.uint32) for _ in range(3)
        ),
        interpret=interpret,
    )

    def run(*operands):
        return call(consts, mats, *operands)

    return run


def _flatten_pair(D, P1, P2):
    shape = jnp.broadcast_shapes(
        *[a.shape[:-1] for a in P1], *[a.shape[:-1] for a in P2]
    )
    flat = []
    for a in (*P1, *P2):
        flat.append(jnp.broadcast_to(a, shape + (D,)).reshape(-1, D))
    return shape, flat


def proj_add_pallas(spec: FieldSpec, P1, P2, interpret: bool = False):
    """Fused complete projective add over (..., D) digit triples (broadcastable).

    Padding rows are all-zero, which the complete formulas map to all-zero
    outputs; the pad is sliced off before returning, so garbage never leaks.
    """
    D = spec.num_digits
    shape, flat = _flatten_pair(D, P1, P2)
    n = flat[0].shape[0]
    n_tiles = max(1, -(-n // TILE))
    padded = n_tiles * TILE
    if padded != n:
        flat = [jnp.pad(a, ((0, padded - n), (0, 0))) for a in flat]
    X3, Y3, Z3 = _proj_add_call(spec, n_tiles, interpret)(*flat)
    return tuple(a[:n].reshape(shape + (D,)) for a in (X3, Y3, Z3))


def proj_double_pallas(spec: FieldSpec, P, interpret: bool = False):
    D = spec.num_digits
    shape = jnp.broadcast_shapes(*[a.shape[:-1] for a in P])
    flat = [jnp.broadcast_to(a, shape + (D,)).reshape(-1, D) for a in P]
    n = flat[0].shape[0]
    n_tiles = max(1, -(-n // TILE))
    padded = n_tiles * TILE
    if padded != n:
        flat = [jnp.pad(a, ((0, padded - n), (0, 0))) for a in flat]
    X3, Y3, Z3 = _proj_double_call(spec, n_tiles, interpret)(*flat)
    return tuple(a[:n].reshape(shape + (D,)) for a in (X3, Y3, Z3))
