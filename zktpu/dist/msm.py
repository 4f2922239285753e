"""Data-parallel Pippenger MSM over a device mesh.

Points and scalars are sharded along the batch axis; each chip runs the full
windowed-bucket MSM (zktpu/curves/msm.py) on its shard, and the per-chip
complete-projective partial sums are combined with a log-depth tree of point
additions.
Cross-chip traffic is exactly n_dev projective points (3 field elements each)
per commit — the communication pattern SURVEY.md §2.C prescribes for
replacing the reference's sequential per-term loop (kzg/src/scheme.rs:84-96)
at scale.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..curves.msm import msm_proj_impl
from ..curves.g1 import proj_tree_sum

shard_map = jax.shard_map


@functools.partial(jax.jit, static_argnames=("mesh", "axis_name", "c", "fq"))
def msm_jacobian_sharded(scalars_u32, X, Y, Z, *, mesh, axis_name="shard", c=8, fq=None):
    """Sharded MSM: scalars (N, 8) u32 + projective point arrays (N, D) sharded
    along axis 0 of `mesh`; returns one projective point (3 arrays of shape (D,)).

    `fq` selects the coordinate backend (digit-Montgomery default, or an
    RnsField with points pre-encoded as residues — see fields/rns.py).
    """

    def local(sc, Xs, Ys, Zs):
        pX, pY, pZ = msm_proj_impl(sc, Xs, Ys, Zs, c=c, fq=fq)
        return pX[None], pY[None], pZ[None]

    sharded = P(axis_name, None)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(sharded, sharded, sharded, sharded),
        out_specs=(sharded, sharded, sharded),
        check_vma=False,  # pallas kernels inside carry no varying-axes types
    )
    partials = fn(scalars_u32, X, Y, Z)  # (n_dev, D) each
    return proj_tree_sum(partials, fq=fq)
