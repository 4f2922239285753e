"""Distributed execution layer: device mesh, sharded MSM, sharded NTT.

The reference (sota-zk-labs/zkp-implementation) is entirely sequential
single-threaded Rust (SURVEY.md §2.C); this package is where the TPU build
introduces parallelism as a first-class component: `jax.sharding.Mesh` over a
pod slice, `shard_map`-wrapped kernels that keep all cross-chip traffic on
XLA collectives (psum / all_gather / all_to_all over ICI), and host-replicated
transcript state as the only serialization point between protocol rounds.
"""
from .mesh import make_mesh, local_mesh
from .msm import msm_jacobian_sharded
from .ntt import FourStepNTT, get_four_step
from .fri import dist_coset_evals, dist_fri_layer, dist_merkle_tree
from .plonk import ShardedWireCommitter, get_wire_committer
