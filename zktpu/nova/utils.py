"""Dense linear algebra helpers for Nova (mirrors nova/src/utils.rs:14-163).

The reference's per-element Rust loops become device vector ops: R1CS
matrices live on device as (m, n) Montgomery digit arrays and matrix-vector
products reduce along the shared axis with log-depth field summation.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..fields.host import FR
from ..fields.fp import device_field

FRD = device_field(FR)


def to_f_matrix(rows: list[list[int]]) -> jnp.ndarray:
    """list of rows of ints -> (m, n, D) Montgomery digit array."""
    flat = [x for row in rows for x in row]
    arr = FRD.encode_ints(flat)
    return arr.reshape(len(rows), len(rows[0]), FRD.num_digits)


def to_f_vec(vals: list[int]) -> jnp.ndarray:
    return FRD.encode_ints(vals)


def matrix_vector_product(matrix: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """(m, n, D) x (n, D) -> (m, D)."""
    prod = FRD.mont_mul(matrix, z[None, :, :])
    return FRD.sum(prod, axis=1)


def hadamard_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return FRD.mont_mul(a, b)


def vector_elem_product(a: jnp.ndarray, u: int) -> jnp.ndarray:
    return FRD.mont_mul(a, FRD.encode_int(u))


def vec_add(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return FRD.add(a, b)


def vec_sub(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return FRD.sub(a, b)


def vec_equal(a: jnp.ndarray, b: jnp.ndarray) -> bool:
    import numpy as np
    import jax

    if a.shape != b.shape:
        return False
    return bool(np.asarray(jax.device_get(jnp.all(a == b))))
