"""FRI prover: folding phase + query phase (mirrors fri/src/prover.rs).

Protocol shape is identical to the reference:
  - domain_size = next_pow2(len(coeffs) * blowup), coset = F::GENERATOR,
    #layers = log2(domain_size)  (prover.rs:141-168)
  - per layer: coset-NTT evaluate + Merkle commit, digest root, draw the fold
    challenge, fold even/odd, square the coset, halve the domain
    (prover.rs:47-75)
  - queries: usize challenges mod domain, with symmetric indices and Merkle
    paths per layer (prover.rs:81-134)
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from ..fields.host import GOLDILOCKS, FieldSpec
from ..poly.poly import Poly
from ..transcript.transcripts import FriTranscript
from .layer import FriLayer
from .merkle import MerkleProof


@dataclass
class Decommitment:
    evaluations: list[int]
    auth_paths: list[MerkleProof]
    sym_evaluations: list[int]
    sym_auth_paths: list[MerkleProof]


@dataclass
class Proof:
    domain_size: int
    coset: int
    number_of_queries: int
    layers_root: list[int]
    const_val: int
    decommitment_list: list[Decommitment]
    spec: FieldSpec = GOLDILOCKS


def fold_polynomial(poly: Poly, random_r: int) -> Poly:
    """new_coeff = even_coeff + r * odd_coeff (prover.rs:34-42)."""
    coeffs = poly.coeffs
    even = coeffs[0::2]
    odd = coeffs[1::2]
    if odd.shape[0] == 0:
        return Poly(poly.spec, even)
    df = poly.df
    r = df.encode_int(random_r)
    odd_r = df.mont_mul(odd, r)
    if odd_r.shape[0] < even.shape[0]:
        odd_r = jnp.pad(odd_r, ((0, even.shape[0] - odd_r.shape[0]), (0, 0)))
    return Poly(poly.spec, df.add(even, odd_r))


def folding_phase(poly: Poly, coset: int, domain_size: int, number_layers: int):
    spec = poly.spec
    transcript = FriTranscript(spec, 0)
    fri_layers: list[FriLayer] = []
    for _ in range(number_layers):
        layer = FriLayer.from_poly(poly, coset, domain_size)
        transcript.digest(layer.merkle_tree.root())
        fri_layers.append(layer)
        poly = fold_polynomial(poly, transcript.generate_a_challenge())
        coset = spec.mul(coset, coset)
        domain_size //= 2
    assert len(poly) == 1, "final polynomial must be constant"
    constant = poly.evaluate(0)
    transcript.digest(constant)
    return constant, transcript, fri_layers


def query_phase(number_of_queries: int, domain_size: int, transcript: FriTranscript, fri_layers: list[FriLayer]):
    if not fri_layers:
        return [], []
    challenge_list = [
        v % domain_size
        for v in transcript.generate_challenge_list_usize(number_of_queries)
    ]
    decommitment_list = []
    for challenge in challenge_list:
        evaluations, sym_evaluations, auth_paths, sym_auth_paths = [], [], [], []
        for layer in fri_layers:
            index = challenge % layer.domain_size
            sym_index = (index + layer.domain_size // 2) % layer.domain_size
            evaluations.append(int(layer.evaluations[index]))
            sym_evaluations.append(int(layer.evaluations[sym_index]))
            auth_paths.append(layer.merkle_tree.generate_proof(index))
            sym_auth_paths.append(layer.merkle_tree.generate_proof(sym_index))
        decommitment_list.append(
            Decommitment(evaluations, auth_paths, sym_evaluations, sym_auth_paths)
        )
    return decommitment_list, challenge_list


def generate_proof(poly: Poly, blowup_factor: int, number_of_queries: int) -> Proof:
    spec = poly.spec
    n = len(poly) * blowup_factor
    domain_size = 1 << (n - 1).bit_length() if n > 1 else 1
    coset = spec.generator
    number_of_layers = domain_size.bit_length() - 1

    const_val, transcript, fri_layers = folding_phase(
        poly, coset, domain_size, number_of_layers
    )
    decommitment_list, _ = query_phase(
        number_of_queries, domain_size, transcript, fri_layers
    )
    return Proof(
        domain_size=domain_size,
        coset=coset,
        number_of_queries=number_of_queries,
        layers_root=[l.merkle_tree.root() for l in fri_layers],
        const_val=const_val,
        decommitment_list=decommitment_list,
        spec=spec,
    )
