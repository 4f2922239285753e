"""Mesh-sharded FRI layer: coset evaluation + Merkle commitment.

Distributed replacement for the single-device FriLayer.from_poly
(zktpu/fri/layer.py, mirroring fri/src/fri_layer.rs:36-56 +
fri/src/merkle_tree.rs:42-62) per SURVEY.md §2.C rows 4-5:

  - coset evaluations via the four-step NTT (rows sharded over the mesh;
    the only cross-chip traffic is its three all_to_all transposes);
  - Merkle leaf and pair hashing through a shard_map'd SHA-256 kernel
    (leaves sharded along the batch axis — embarrassingly parallel);
  - the top ~log2(ndev) tree levels — the frontier — are hashed on the
    replicated host side, the shard_map analogue of an all_gather of
    per-device subtree roots.

Outputs are element-exact vs the single-device path: same evaluations,
same level hashes, same root, same proofs.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..fields.host import GOLDILOCKS, FieldSpec
from ..fields.fp import device_field
from ..fri.layer import FriLayer
from ..fri.merkle import MerkleTree
from ..hash.host_hash import hash_slice
from ..hash.sha256_vec import (
    _blocks_pairs,
    _blocks_single,
    _digest_to_field_traced,
    sha256_single_block,
)
from ..poly.poly import Poly
from .mesh import SHARD_AXIS
from .ntt import get_four_step

shard_map = jax.shard_map


@functools.lru_cache(maxsize=8)
def _sharded_sha_fn(spec: FieldSpec, mesh, axis_name: str):
    """(N, 16) message words (N % ndev == 0) -> (N, D) field digit arrays,
    rows sharded over the mesh."""

    def local(words):
        return _digest_to_field_traced(spec, sha256_single_block(words))

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=P(axis_name, None),
        check_vma=False,  # pallas kernels inside carry no varying-axes types
    )
    return jax.jit(fn)


def _hash_words_sharded(spec: FieldSpec, words_np: np.ndarray, mesh, axis_name) -> np.ndarray:
    """Sharded SHA-256 + digest->field; returns canonical u64 values (host)."""
    n = words_np.shape[0]
    ndev = mesh.devices.size
    total = -(-n // ndev) * ndev
    if total != n:
        words_np = np.pad(words_np, ((0, total - n), (0, 0)))
    fn = _sharded_sha_fn(spec, mesh, axis_name)
    v = np.asarray(jax.device_get(fn(jnp.asarray(words_np))))[:n].astype(np.uint64)
    return (
        v[:, 0]
        | v[:, 1] << np.uint64(16)
        | v[:, 2] << np.uint64(32)
        | v[:, 3] << np.uint64(48)
    )


def dist_merkle_tree(values, spec: FieldSpec, mesh, axis_name: str = SHARD_AXIS) -> MerkleTree:
    """Merkle tree with mesh-sharded bulk hashing; identical to
    MerkleTree(values, spec) (reference quirks preserved: unpadded level 0,
    trailing singleton chunks hashed alone, zero-padded `leaves`)."""
    assert spec is GOLDILOCKS, "sharded Merkle fast path is Goldilocks-only"
    values = [int(v) for v in values]
    ndev = mesh.devices.size
    vals = np.array(values, dtype=np.uint64)
    level0 = _hash_words_sharded(spec, _blocks_single(vals), mesh, axis_name)
    levels = [[int(x) for x in level0]]
    while len(levels[-1]) > 1:
        prev = levels[-1]
        if len(prev) % 2 == 0 and len(prev) >= 2 * ndev:
            arr = np.array(prev, dtype=np.uint64)
            nxt_u64 = _hash_words_sharded(
                spec, _blocks_pairs(arr[0::2], arr[1::2]), mesh, axis_name
            )
            nxt = [int(x) for x in nxt_u64]
        else:
            # frontier: top ~log2(ndev) levels on the replicated host side
            nxt = [hash_slice(spec, prev[j : j + 2]) for j in range(0, len(prev), 2)]
        levels.append(nxt)
    return MerkleTree.from_levels(values, levels, spec)


def dist_coset_evals(poly: Poly, coset: int, domain_size: int, mesh, axis_name: str = SHARD_AXIS) -> jnp.ndarray:
    """[p(coset * w^i)] for i < domain_size via the sharded four-step NTT.

    Equals Radix2Domain.coset_fft element-for-element (natural order)."""
    spec = poly.spec
    df = device_field(spec)
    fs = get_four_step(spec, domain_size, mesh, axis_name)
    coeffs = poly._padded(domain_size)
    scaled = df.mont_mul(coeffs, df.powers(coset, domain_size))
    return fs.fft(scaled)


def dist_fri_layer(poly: Poly, coset: int, domain_size: int, mesh, axis_name: str = SHARD_AXIS) -> FriLayer:
    """Mesh-sharded replacement for FriLayer.from_poly (fri_layer.rs:36-56)."""
    spec = poly.spec
    assert spec is GOLDILOCKS
    df = poly.df
    evals = dist_coset_evals(poly, coset, domain_size, mesh, axis_name)
    raw = np.asarray(jax.device_get(df.from_mont(evals))).astype(np.uint64)
    vals = (
        raw[:, 0]
        | raw[:, 1] << np.uint64(16)
        | raw[:, 2] << np.uint64(32)
        | raw[:, 3] << np.uint64(48)
    )
    tree = dist_merkle_tree(list(vals), spec, mesh, axis_name)
    return FriLayer(vals, tree, coset, domain_size)
