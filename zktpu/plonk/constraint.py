"""Constraint containers (mirrors plonk/src/constraint.rs).

In addition to the interpolated polynomials the TPU build retains the raw
evaluation vectors (device arrays over the circuit domain): the prover's
grand-product accumulator and quotient work in evaluation form, which turns
the reference's O(n^2) coefficient-space loops (plonk/src/prover.rs:302-377)
into O(n) vector ops.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from ..poly.poly import Poly


@dataclass
class GateConstraints:
    f_ax: Poly
    f_bx: Poly
    f_cx: Poly
    q_lx: Poly
    q_rx: Poly
    q_ox: Poly
    q_mx: Poly
    q_cx: Poly
    pi_x: Poly
    # evaluation vectors over the circuit domain (n, D) Montgomery digits
    evals: dict | None = None


@dataclass
class CopyConstraints:
    s_sigma_1: Poly
    s_sigma_2: Poly
    s_sigma_3: Poly
    k1: int
    k2: int
    evals: dict | None = None


@dataclass
class CompiledCircuit:
    """plonk/src/compiled_circuit.rs"""

    size: int
    gate_constraints: GateConstraints
    copy_constraints: CopyConstraints
