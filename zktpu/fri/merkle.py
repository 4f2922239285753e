"""Merkle tree over field elements (mirrors fri/src/merkle_tree.rs:7-132).

Reference quirks preserved:
  - level 0 hashes the *unpadded* evaluation list; only `leaves` is padded
    to the next power of two with F::ZERO (merkle_tree.rs:42-62);
  - inner levels hash chunks of two (a trailing singleton chunk is hashed
    alone);
  - generate_proof indexes `internal_nodes[i][cur_index ^ 1]` and fails for
    out-of-range neighbours exactly like the Rust code would panic.

The bulk leaf/level hashing can run through the vectorized device SHA-256
(zktpu/hash/sha256_vec.py) for large trees; host hashing is used below a
size threshold.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..fields.host import GOLDILOCKS, FieldSpec
from ..hash.host_hash import hash_elem, hash_slice

_VEC_THRESHOLD = 1 << 12


@dataclass
class MerkleProof:
    index: int
    leaf_val: int
    hash_proof: list[int]
    root: int
    spec: FieldSpec = GOLDILOCKS


class MerkleTree:
    def __init__(self, evaluations, spec: FieldSpec = GOLDILOCKS):
        evaluations = [int(v) for v in evaluations]
        self.spec = spec
        new_len = 1 << (len(evaluations) - 1).bit_length() if len(evaluations) > 1 else 1
        self.depth = new_len.bit_length() - 1
        if len(evaluations) >= _VEC_THRESHOLD:
            first_level = self._hash_leaves_vec(evaluations)
        else:
            first_level = [hash_elem(spec, v) for v in evaluations]
        self.internal_nodes = [first_level]
        for i in range(self.depth):
            prev = self.internal_nodes[i]
            if len(prev) >= _VEC_THRESHOLD and len(prev) % 2 == 0:
                nxt = self._hash_pairs_vec(prev)
            else:
                nxt = [
                    hash_slice(spec, prev[j : j + 2]) for j in range(0, len(prev), 2)
                ]
            self.internal_nodes.append(nxt)
        self.leaves = evaluations + [0] * (new_len - len(evaluations))

    @classmethod
    def from_levels(cls, evaluations, internal_nodes, spec: FieldSpec = GOLDILOCKS) -> "MerkleTree":
        """Assemble a tree whose level hashes were computed externally (e.g.
        the mesh-sharded hasher, zktpu/dist/fri.py); same layout as __init__."""
        obj = cls.__new__(cls)
        obj.spec = spec
        evaluations = [int(v) for v in evaluations]
        new_len = 1 << (len(evaluations) - 1).bit_length() if len(evaluations) > 1 else 1
        obj.depth = new_len.bit_length() - 1
        assert len(internal_nodes) == obj.depth + 1, (len(internal_nodes), obj.depth)
        obj.internal_nodes = internal_nodes
        obj.leaves = evaluations + [0] * (new_len - len(evaluations))
        return obj

    # -- device-vectorized bulk hashing (large trees) --

    def _hash_leaves_vec(self, evaluations):
        from ..hash.sha256_vec import hash_elems_vec

        return hash_elems_vec(self.spec, evaluations)

    def _hash_pairs_vec(self, level):
        from ..hash.sha256_vec import hash_pairs_vec

        return hash_pairs_vec(self.spec, level)

    def root(self) -> int:
        return self.internal_nodes[-1][0]

    def generate_proof(self, index: int) -> MerkleProof:
        leaf_val = self.leaves[index]
        hash_proof = []
        cur = index
        for i in range(self.depth):
            level = self.internal_nodes[i]
            neighbour = level[cur + 1] if cur % 2 == 0 else level[cur - 1]
            hash_proof.append(neighbour)
            cur //= 2
        return MerkleProof(index, leaf_val, hash_proof, self.root(), self.spec)


def verify_merkle_proof(proof: MerkleProof) -> bool:
    spec = proof.spec
    cur_index = proof.index
    cur_hash = hash_elem(spec, proof.leaf_val)
    for neighbour in proof.hash_proof:
        if cur_index % 2 == 0:
            cur_hash = hash_slice(spec, [cur_hash, neighbour])
        else:
            cur_hash = hash_slice(spec, [neighbour, cur_hash])
        cur_index //= 2
    return cur_hash == proof.root
