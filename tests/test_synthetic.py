"""Synthetic-circuit PLONK at nontrivial sizes.

Covers the scale path the per-gate builder cannot reach: the vectorized
circuit generator (zktpu/plonk/synthetic.py), the coset-evaluation quotient
(n >= 64), the batched round-4/5 evaluations, and the bad-witness
remainder panic through the coset path (parity with the reference's
expect("No remainder"), plonk/src/prover.rs:398-443).
"""
import jax.numpy as jnp
import pytest

from zktpu.fields.host import FR
from zktpu.kzg import Srs
from zktpu.plonk.prover import (
    compute_acc,
    compute_quotient_polynomial,
    generate_proof,
)
from zktpu.plonk.synthetic import synthetic_mul_chain
from zktpu.plonk.verifier import verify
from zktpu.poly.domain import get_domain
from zktpu.poly.poly import Poly, poly_from_evals
from zktpu.transcript.chacha import StdRng


@pytest.fixture(scope="module")
def circuit128():
    return synthetic_mul_chain(7, seed=3)


@pytest.fixture(scope="module")
def srs128(circuit128):
    return Srs.new_from_secret(0x5EED5EED, circuit128.size)


def test_synthetic_prove_verify_128(circuit128, srs128):
    timings = {}
    proof = generate_proof(
        circuit128, srs128, StdRng.from_seed_u64(42), timings=timings
    )
    verify(circuit128, srs128, proof)  # raises on failure
    assert set(timings) == {f"round{i}" for i in range(1, 6)}
    assert all(v >= 0 for v in timings.values())


def test_synthetic_bad_witness_panics(circuit128, srs128):
    import numpy as np

    cc = synthetic_mul_chain(7, seed=3)
    gc = cc.gate_constraints
    # corrupt one witness value: gate equation a*b - c = 0 fails at row 5
    a_e = gc.evals["a"]
    bad = jnp.asarray(np.roll(np.asarray(a_e[5]), 1))  # some other field elem
    a_e = a_e.at[5].set(bad)
    gc.evals["a"] = a_e
    dom = get_domain(FR, cc.size)
    gc.f_ax = poly_from_evals(dom, a_e)
    with pytest.raises(AssertionError, match="has remainder"):
        generate_proof(cc, srs128, StdRng.from_seed_u64(7))


def test_quotient_coset_matches_coefficient_path():
    """Element-exact equality of the two quotient implementations at n=64."""
    cc = synthetic_mul_chain(6, seed=9)
    n = cc.size
    dom = get_domain(FR, n)
    gc = cc.gate_constraints
    beta, gamma, alpha = 0x1234, 0x9876, 0xABCDEF

    # deterministic "blinding" so both paths see identical inputs
    ax = gc.f_ax + Poly.from_ints(FR, [3, 5]).mul_by_vanishing(n)
    bx = gc.f_bx + Poly.from_ints(FR, [7, 11]).mul_by_vanishing(n)
    cx = gc.f_cx + Poly.from_ints(FR, [13, 17]).mul_by_vanishing(n)
    acc_x, acc_wx = compute_acc(beta, gamma, dom, cc)
    w = dom.element(1)
    z_x = Poly.from_ints(FR, [23, 29, 31]).mul_by_vanishing(n) + acc_x
    z_wx = (
        Poly.from_ints(FR, [23, FR.mul(29, w), FR.mul(31, dom.element(2))])
        .mul_by_vanishing(n)
        + acc_wx
    )

    t_coset = compute_quotient_polynomial(
        beta, gamma, alpha, ax, bx, cx, z_x, z_wx, dom, cc, force="coset"
    )
    t_coeff = compute_quotient_polynomial(
        beta, gamma, alpha, ax, bx, cx, z_x, z_wx, dom, cc, force="coeff"
    )
    assert t_coset == t_coeff
