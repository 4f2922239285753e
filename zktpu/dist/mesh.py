"""Device mesh construction for multi-chip ZK proving.

A single mesh axis ("shard") suffices for every parallel pattern this
framework uses (SURVEY.md §2.C): MSM points, NTT rows/columns, FRI coset
evaluations and Merkle leaves are all sharded along it, and the per-protocol
code chooses the collective (psum-style tree reduction for MSM partials,
all_to_all transpose for the four-step NTT, all_gather for Merkle frontiers).
On a real pod slice the axis is laid out over ICI by XLA's default device
ordering.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shard"


def make_mesh(n_devices: int | None = None, axis_name: str = SHARD_AXIS) -> Mesh:
    """1-D mesh over the first `n_devices` devices (all by default)."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return jax.sharding.Mesh(devs[:n_devices], (axis_name,))


def local_mesh() -> Mesh:
    """Mesh over every addressable device of this process."""
    return make_mesh(len(jax.local_devices()))


def shard_leading(mesh: Mesh, arr, axis_name: str = SHARD_AXIS):
    """Place `arr` sharded along its leading axis."""
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicated(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))
