"""KZG end-to-end example (mirrors kzg/examples/example.rs:7-26).

Commit to x^3 + 3x + 5, open at z = 4, verify — all commitments computed by
the device Pippenger MSM, the pairing check on host.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zktpu.fields.host import FR
from zktpu.kzg import Srs, KzgScheme
from zktpu.poly.poly import Poly


def main():
    srs = Srs.new(10)
    scheme = KzgScheme(srs)

    poly = Poly.from_ints(FR, [5, 3, 0, 1])  # 5 + 3x + x^3
    assert poly.evaluate(1) == 9

    commitment = scheme.commit(poly)
    opening = scheme.open(poly, 4)
    assert scheme.verify(commitment, opening, 4)
    print("KZG commit/open/verify: accepted")


if __name__ == "__main__":
    main()
