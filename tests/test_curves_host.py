"""Host curve + pairing tests: group laws, subgroup orders, bilinearity."""
import pytest

from zktpu.fields import host
from zktpu.curves.host_curve import G1Affine, G2Affine
from zktpu.curves.pairing import Fq12, pairing, pairing_product, pairings_equal


def test_g1_group_law():
    g = G1Affine.generator()
    assert g.is_on_curve()
    assert (g + g).is_on_curve()
    assert (g + g + g) == g.mul(3)
    assert g.mul(5) + g.mul(7) == g.mul(12)
    assert (g.mul(5) - g.mul(5)).infinity
    # subgroup order
    assert g.mul(host.FR_MODULUS).infinity
    assert not g.mul(host.FR_MODULUS - 1).infinity


def test_g2_group_law():
    h = G2Affine.generator()
    assert h.is_on_curve()
    assert (h + h) == h.mul(2)
    assert h.mul(3) + h.mul(4) == h.mul(7)
    assert h.mul(host.FR_MODULUS).infinity


@pytest.mark.slow
def test_pairing_bilinearity():
    g = G1Affine.generator()
    h = G2Affine.generator()
    e = pairing(g, h)
    assert e != Fq12.one()  # non-degeneracy
    a, b = 6, 11
    # e(aG, bH) = e(G, H)^(ab)
    assert pairing(g.mul(a), h.mul(b)) == e.pow(a * b)
    # e(aG, H) = e(G, aH)
    assert pairing(g.mul(a), h) == pairing(g, h.mul(a))
    # e(G+G', H) = e(G, H) e(G', H)
    g2 = g.mul(9)
    assert pairing(g + g2, h) == pairing(g, h) * pairing(g2, h)


@pytest.mark.slow
def test_pairing_product_and_equality():
    g = G1Affine.generator()
    h = G2Affine.generator()
    # e(2G, 3H) == e(3G, 2H)
    assert pairings_equal(g.mul(2), h.mul(3), g.mul(3), h.mul(2))
    assert not pairings_equal(g.mul(2), h.mul(3), g.mul(3), h.mul(3))
    # product form: e(P,Q) * e(-P,Q) == 1
    assert pairing_product([(g.mul(4), h), (-(g.mul(4)), h)]) == Fq12.one()
    # identity inputs
    assert pairing(G1Affine.identity(), h) == Fq12.one()
    assert pairing(g, G2Affine.identity()) == Fq12.one()
