"""Synthetic PLONK circuits built directly in vectorized form.

The reference's only circuit front-ends are the per-gate builder
(plonk/src/circuit.rs:85-115) and the equation-string parser
(plonk/src/parser.rs) — both inherently per-gate and unusable at 2^20 gates.
This generator produces the *same compiled object* a chained-multiplication
circuit would compile to (selector/witness/sigma evaluations + interpolated
polynomials, plonk/src/circuit.rs:166-245), but builds every column as one
device array: witness values via a log-depth cumulative product, copy
permutation via rolls of the domain-element vector.

Circuit shape: n multiplication gates  a_i * b_i = c_i  with the chain
wiring a_{i+1} = c_i (so every gate's output is copy-constrained into the
next gate's left input — the permutation argument is fully exercised):

  sigma_1 = [w^0,  k2 w^0, k2 w^1, ..., k2 w^{n-2}]   (a_{i+1} <-> c_i)
  sigma_2 = [k1 w^i]                                   (b_i self-wired)
  sigma_3 = [w^1, w^2, ..., w^{n-1}, k2 w^{n-1}]       (c_i <-> a_{i+1})

with k1 = 2, k2 = 3 exactly like circuit.rs:238-245.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..fields.host import FR
from ..fields.fp import device_field, ints_to_digits
from ..poly.domain import get_domain
from ..poly.poly import Poly, poly_from_evals
from .constraint import CompiledCircuit, CopyConstraints, GateConstraints

FRD = device_field(FR)


def synthetic_mul_chain(log_n: int, seed: int = 1) -> CompiledCircuit:
    """A valid n = 2^log_n gate multiplication-chain circuit with witness."""
    n = 1 << log_n
    assert n >= 2
    dom = get_domain(FR, n)
    df = FRD

    # -- witness columns ------------------------------------------------------
    # b_i: pseudorandom nonzero 16-bit values (one digit each, to_mont on
    # device); a_0 = seed; c_i = a_i * b_i; a_{i+1} = c_i
    rng = np.random.default_rng(seed)
    b_raw = rng.integers(1, 1 << 16, size=n, dtype=np.uint64)
    b_e = df.to_mont(jnp.asarray(ints_to_digits(b_raw, df.num_digits)))
    # c = cumprod([seed * b_0, b_1, ..., b_{n-1}])
    first = df.encode_int(FR.mul(seed, int(b_raw[0])))
    c_e = df.cumprod(jnp.concatenate([first[None], b_e[1:]], axis=0), axis=0)
    a_e = jnp.concatenate([df.encode_int(seed)[None], c_e[:-1]], axis=0)

    # -- selectors: pure multiplication gates (gate.rs:63-76) -----------------
    one = jnp.asarray(df.one_np)
    zero = jnp.zeros_like(one)
    minus_one = df.neg(one)
    qm_e = jnp.broadcast_to(one, (n, df.num_digits))
    qo_e = jnp.broadcast_to(minus_one, (n, df.num_digits))
    ql_e = jnp.broadcast_to(zero, (n, df.num_digits))
    qr_e = ql_e
    qc_e = ql_e
    pi_e = ql_e

    # -- copy permutation (circuit.rs:200-245 semantics) ----------------------
    k1, k2 = 2, 3
    roots = dom.elements_device()  # (n, D) w^i
    k1_roots = df.mont_mul(roots, df.encode_int(k1))
    k2_roots = df.mont_mul(roots, df.encode_int(k2))
    # sigma_1: row 0 self (w^0), row i+1 -> position of c_i = k2 w^i
    s1_e = jnp.concatenate([roots[:1], k2_roots[:-1]], axis=0)
    s2_e = k1_roots
    # sigma_3: row i -> position of a_{i+1} = w^{i+1}; last row self
    s3_e = jnp.concatenate([roots[1:], k2_roots[-1:]], axis=0)

    evals = {
        "a": a_e, "b": b_e, "c": c_e,
        "ql": ql_e, "qr": qr_e, "qm": qm_e, "qo": qo_e, "qc": qc_e, "pi": pi_e,
    }
    gate_constraints = GateConstraints(
        f_ax=poly_from_evals(dom, a_e),
        f_bx=poly_from_evals(dom, b_e),
        f_cx=poly_from_evals(dom, c_e),
        q_lx=Poly.zero(FR),
        q_rx=Poly.zero(FR),
        # interpolation of a constant column is the constant polynomial
        q_ox=Poly.constant(FR, FR.neg(1)),
        q_mx=Poly.constant(FR, 1),
        q_cx=Poly.zero(FR),
        pi_x=Poly.zero(FR),
        evals=evals,
    )
    copy_constraints = CopyConstraints(
        s_sigma_1=poly_from_evals(dom, s1_e),
        s_sigma_2=poly_from_evals(dom, s2_e),
        s_sigma_3=poly_from_evals(dom, s3_e),
        k1=k1,
        k2=k2,
        evals={"s1": s1_e, "s2": s2_e, "s3": s3_e},
    )
    return CompiledCircuit(
        size=n, gate_constraints=gate_constraints, copy_constraints=copy_constraints
    )
