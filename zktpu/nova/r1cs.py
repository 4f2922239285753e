"""Relaxed R1CS structures (mirrors nova/src/r1cs/mod.rs).

Z = [W || x || u];  satisfaction: (A Z) o (B Z) = u (C Z) + E, plus
commitment consistency of E and W (r1cs/mod.rs:89-126).
Vectors are device Fr digit arrays; u and x are host ints (x is small IO).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..fields.host import FR
from ..kzg.scheme import KzgCommitment, KzgScheme
from .utils import (
    FRD,
    hadamard_product,
    matrix_vector_product,
    vec_add,
    vec_equal,
    vector_elem_product,
)


@dataclass
class R1CS:
    matrix_a: jnp.ndarray  # (m, n, D)
    matrix_b: jnp.ndarray
    matrix_c: jnp.ndarray
    num_io: int
    num_vars: int


@dataclass
class FInstance:
    com_e: KzgCommitment
    u: int
    com_w: KzgCommitment
    x: list[int]


@dataclass
class FWitness:
    e: jnp.ndarray  # (m, D) device
    w: jnp.ndarray  # (num_vars, D) device

    @classmethod
    def new(cls, w: list[int], length: int) -> "FWitness":
        return cls(
            e=jnp.zeros((length, FRD.num_digits), dtype=jnp.uint32),
            w=FRD.encode_ints(w),
        )

    @classmethod
    def new_trivial_witness(cls, length: int) -> "FWitness":
        zero = jnp.zeros((length, FRD.num_digits), dtype=jnp.uint32)
        return cls(e=zero, w=zero)

    def commit(self, scheme: KzgScheme, x: list[int]) -> FInstance:
        com_e = scheme.commit_coeffs(_trim(self.e))
        com_w = scheme.commit_coeffs(_trim(self.w))
        return FInstance(com_e=com_e, u=1, com_w=com_w, x=list(x))


def _trim(arr: jnp.ndarray) -> jnp.ndarray:
    """commit_vector semantics: DensePolynomial trims trailing zeros."""
    import numpy as np
    import jax

    nz = np.asarray(jax.device_get(jnp.any(arr != 0, axis=-1)))
    if nz.any():
        return arr[: int(np.max(np.nonzero(nz)[0])) + 1]
    return arr[:0]


def z_vector(witness: FWitness, instance_x: list[int], u: int) -> jnp.ndarray:
    """Z = [w || x || u] as a device vector."""
    tail = FRD.encode_ints(list(instance_x) + [u])
    return jnp.concatenate([witness.w, tail], axis=0)


def create_trivial_pair(x_len: int, w_len: int, scheme: KzgScheme):
    trivial_x = [0] * x_len
    trivial_witness = FWitness.new_trivial_witness(w_len)
    trivial_instance = trivial_witness.commit(scheme, trivial_x)
    return trivial_witness, trivial_instance


def is_r1cs_satisfied(
    r1cs: R1CS, f_instance: FInstance, f_witness: FWitness, scheme: KzgScheme
) -> None:
    """Raises NovaError on failure (Result<(), String> analogue)."""
    if r1cs.num_vars != f_witness.w.shape[0]:
        raise NovaError("Witness does not match with matrices")
    if r1cs.num_io != len(f_instance.x):
        raise NovaError("Instance does not match with matrices")

    z = z_vector(f_witness, f_instance.x, f_instance.u)
    az = matrix_vector_product(r1cs.matrix_a, z)
    bz = matrix_vector_product(r1cs.matrix_b, z)
    cz = matrix_vector_product(r1cs.matrix_c, z)

    left = hadamard_product(az, bz)
    right = vec_add(vector_elem_product(cz, f_instance.u), f_witness.e)
    res_eq = vec_equal(left, right)

    res_com = f_instance.com_w == scheme.commit_coeffs(_trim(f_witness.w)) and (
        f_instance.com_e == scheme.commit_coeffs(_trim(f_witness.e))
    )
    if not (res_com and res_eq):
        raise NovaError("Instance does not satisfy the Witness.")


class NovaError(Exception):
    pass
