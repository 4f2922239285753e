"""FRI layer: coset evaluation + Merkle commitment (fri/src/fri_layer.rs).

The reference evaluates the polynomial pointwise at every domain element
(O(n * d), fri_layer.rs:40-46); here the layer is produced by a single coset
NTT on device, which yields the identical evaluations
[p(coset * ω^i)]_{i<n} in natural order.
"""
from __future__ import annotations

import numpy as np
import jax

from ..fields.host import GOLDILOCKS
from ..poly.domain import get_domain
from ..poly.poly import Poly
from .merkle import MerkleTree


class FriLayer:
    def __init__(self, evaluations_u64: np.ndarray, merkle_tree: MerkleTree, coset: int, domain_size: int):
        self.evaluations = evaluations_u64  # host canonical values (uint64)
        self.merkle_tree = merkle_tree
        self.coset = coset
        self.domain_size = domain_size

    @classmethod
    def from_poly(cls, poly: Poly, coset: int, domain_size: int) -> "FriLayer":
        spec = poly.spec
        dom = get_domain(spec, domain_size)
        assert dom.size == domain_size
        evals = dom.coset_fft(poly._padded(dom.size), coset)
        df = poly.df
        raw = np.asarray(jax.device_get(df.from_mont(evals))).astype(np.uint64)
        vals = (
            raw[:, 0]
            | raw[:, 1] << np.uint64(16)
            | raw[:, 2] << np.uint64(32)
            | raw[:, 3] << np.uint64(48)
        ) if spec is GOLDILOCKS else np.array(df.decode_ints(evals), dtype=object)
        tree = MerkleTree(list(vals), spec)
        return cls(vals, tree, coset, domain_size)
