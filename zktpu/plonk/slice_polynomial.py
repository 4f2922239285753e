"""Quotient-polynomial slicing (mirrors plonk/src/slice_polynomial.rs).

t(X) is split into 3 chunks of ceil(len/3) coefficients for degree-bounded
commitment; `compact` rejoins them at a point with X^{(degree+1) i} weights.
"""
from __future__ import annotations

from ..fields.host import FR
from ..poly.poly import Poly


class SlicePoly:
    def __init__(self, polynomial: Poly):
        coeffs = polynomial
        length = len(coeffs)
        tmp = length // 3
        if tmp * 3 < length:
            tmp += 1
        tmp = max(tmp, 1)
        self.slices = [Poly.zero(FR) for _ in range(3)]
        for i in range(3):
            chunk = coeffs.coeffs[i * tmp : (i + 1) * tmp]
            if chunk.shape[0]:
                self.slices[i] = Poly(FR, chunk)
        self.degree = tmp - 1

    def get_degree(self) -> int:
        return self.degree

    def commit(self, scheme):
        return scheme.commit_many(self.slices)

    def compact(self, point: int) -> Poly:
        acc = Poly.zero(FR)
        for index, s in enumerate(self.slices):
            weight = FR.pow(point, (self.degree + 1) * index)
            acc = acc + s.scale(weight)
        return acc
