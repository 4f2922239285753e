"""Native C++ pairing (native/pairing.cpp) vs the pure-python tower.

The native path is an optimization of the same ate pairing the verifiers
call (kzg/src/scheme.rs:167-169 semantics); these tests pin value-for-value
agreement and the algebraic laws.  Skipped when no toolchain can build the
shared library (the python fallback is covered by test_curves_host.py).
"""
import pytest

from zktpu.curves import pairing as pr
from zktpu.curves.host_curve import G1Affine, G2Affine
from zktpu.curves.native_pairing import _load, native_pairing_product
from zktpu.fields.host import FR

pytestmark = pytest.mark.skipif(_load() is None, reason="native pairing unavailable")

G1 = G1Affine.generator()
G2 = G2Affine.generator()


def _python_product(pairs):
    f = pr.Fq12.one()
    for p, q in pairs:
        f = f * pr._miller_loop(p, q)
    return pr._final_exponentiation(f)


@pytest.mark.parametrize(
    "pairs",
    [
        [(G1, G2)],
        [(G1.mul(7), G2.mul(3))],
        [(G1.mul(5), G2), (G1, G2.mul(11))],
        [(G1Affine.identity(), G2)],
        [(G1, G2Affine.identity()), (G1.mul(2), G2)],
    ],
)
def test_native_matches_python(pairs):
    got = native_pairing_product(pairs)
    assert got is not None
    assert pr._fq12_from_coeffs(got) == _python_product(pairs)


def test_bilinearity_through_dispatch():
    a, b = 123457, 987654323
    lhs = pr.pairing(G1.mul(a), G2.mul(b))
    rhs = pr.pairing(G1.mul(a * b % FR.modulus), G2)
    assert lhs == rhs
    assert pr.pairing_product([(G1.mul(a), G2), (-G1.mul(a), G2)]) == pr.Fq12.one()
