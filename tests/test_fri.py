"""FRI tests mirroring the reference suite (fri/src/{merkle_tree,prover,verifier}.rs)."""
import numpy as np
import pytest

from zktpu.fields import host
from zktpu.fri.merkle import MerkleTree, verify_merkle_proof
from zktpu.fri.prover import Proof, fold_polynomial, folding_phase, generate_proof, query_phase
from zktpu.fri.verifier import FriVerificationError, verify
from zktpu.hash.host_hash import hash_elem, hash_slice
from zktpu.hash.sha256_vec import hash_elems_vec, hash_pairs_vec, sha256_single_block, _blocks_single
from zktpu.poly.poly import Poly

GL = host.GOLDILOCKS


def test_merkle_roundtrip():
    # fri/src/merkle_tree.rs:134-152
    tree = MerkleTree([1, 2, 3, 4], GL)
    proof = tree.generate_proof(1)
    assert verify_merkle_proof(proof)
    proof.index = 2
    assert not verify_merkle_proof(proof)


def test_hash_semantics():
    import hashlib

    v = 1234567890123456789
    expect = int.from_bytes(hashlib.sha256(str(v).encode()).digest(), "little") % GL.modulus
    assert hash_elem(GL, v) == expect
    expect2 = (
        int.from_bytes(hashlib.sha256((str(v) + str(7)).encode()).digest(), "little")
        % GL.modulus
    )
    assert hash_slice(GL, [v, 7]) == expect2


def test_vectorized_sha_matches_host():
    import random

    rng = random.Random(0)
    vals = [0, 1, 9, 10, GL.modulus - 1] + [rng.randrange(GL.modulus) for _ in range(59)]
    assert hash_elems_vec(GL, vals) == [hash_elem(GL, v) for v in vals]
    pairs_out = hash_pairs_vec(GL, vals)
    want = [hash_slice(GL, vals[i : i + 2]) for i in range(0, len(vals), 2)]
    assert pairs_out == want


def test_vectorized_merkle_matches_host():
    import random

    rng = random.Random(1)
    vals = [rng.randrange(GL.modulus) for _ in range(1 << 13)]
    big = MerkleTree(vals, GL)  # vectorized path (>= 2^12)
    # spot-check against host hashing
    assert big.internal_nodes[0][:4] == [hash_elem(GL, v) for v in vals[:4]]
    assert big.internal_nodes[1][0] == hash_slice(GL, big.internal_nodes[0][:2])
    proof = big.generate_proof(4097)
    assert verify_merkle_proof(proof)


def test_fold_polynomial():
    # fri/src/prover.rs:170-186
    poly = Poly.from_ints(GL, [1, 2, 3, 4])
    folded = fold_polynomial(poly, 1)
    assert folded.to_ints() == [3, 7]


def test_commit_phase_invariants():
    # fri/src/prover.rs:188-205
    poly = Poly.from_ints(GL, [1, 2, 3, 4])
    _c, _t, layers = folding_phase(poly, GL.generator, 4, 2)
    assert layers[1].coset == 49
    assert layers[1].domain_size == 2


def test_query_phase_symmetry():
    # fri/src/prover.rs:207-221
    poly = Poly.from_ints(GL, [1, 2, 3, 4])
    _c, transcript, layers = folding_phase(poly, GL.generator, 4, 2)
    decommitments, _ = query_phase(1, 4, transcript, layers)
    d = decommitments[0]
    assert (d.auth_paths[0].index + 2) % 4 == d.sym_auth_paths[0].index


@pytest.mark.parametrize("coeffs", [[1, 2, 3, 4], [1, 2, 3, 4, 5, 6]])
def test_fri_end_to_end(coeffs):
    # fri/src/verifier.rs:116-152
    poly = Poly.from_ints(GL, coeffs)
    proof = generate_proof(poly, blowup_factor=2, number_of_queries=2)
    verify(proof)  # must not raise


def test_fri_tampered_const_rejected():
    # fri/src/verifier.rs:154-170
    poly = Poly.from_ints(GL, [1, 2, 3, 4])
    proof = generate_proof(poly, 2, 2)
    proof.const_val = (proof.const_val - 1) % GL.modulus
    with pytest.raises(FriVerificationError):
        verify(proof)


def test_fri_tampered_evaluation_rejected():
    poly = Poly.from_ints(GL, [1, 2, 3, 4, 5, 6])
    proof = generate_proof(poly, 2, 2)
    proof.decommitment_list[0].evaluations[1] = (
        proof.decommitment_list[0].evaluations[1] + 1
    ) % GL.modulus
    with pytest.raises(FriVerificationError):
        verify(proof)
