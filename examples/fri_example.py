"""FRI end-to-end example (mirrors fri/examples/example.rs:9-29).

Degree-5 Goldilocks polynomial, blowup 2, 2 queries: coset-NTT layer
evaluation, vectorized SHA-256 Merkle commits, transcript-replayed verify.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zktpu.fields.host import GOLDILOCKS
from zktpu.fri.prover import generate_proof
from zktpu.fri.verifier import verify
from zktpu.poly.poly import Poly


def main():
    poly = Poly.from_ints(GOLDILOCKS, [1, 2, 3, 4, 5, 6])
    print("Generate proof...")
    proof = generate_proof(poly, blowup_factor=2, number_of_queries=2)
    print("Verify....")
    verify(proof)  # raises on rejection
    print("Accepted!")


if __name__ == "__main__":
    main()
