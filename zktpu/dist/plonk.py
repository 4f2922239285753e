"""Mesh-sharded PLONK prover building blocks.

Extends the distributed layer beyond standalone NTT/MSM/FRI to the PLONK
prover's own hot path: round 1's wire commitments (plonk/src/prover.rs:64-92)
are, at scale, three interpolations (iNTT over the n-point domain) feeding
three size-n MSMs against the SRS powers — exactly the composition this
module shards end-to-end over a `jax.sharding.Mesh`:

  evals (3, n, D)  --four-step iNTT (3x all_to_all)-->  coeffs, sharded
                   --to_u32 limbs, local-->             scalars, sharded
                   --per-chip Pippenger + tree reduce--> 3 projective points

The whole step is one jitted computation: wire columns never round-trip the
host between the transform and the commit, and cross-chip traffic is the
three all_to_all transposes per transform plus n_dev projective partials per
MSM.

Blinding (prover.rs:68-80) adds (b0 X + b1) * Z_H(X) to each wire before
committing: only four coefficients (degree 0, 1, n, n+1), so the blinded
commitment is this sharded commitment plus a 4-term host-side correction —
the O(n) work stays sharded.  The single-chip prover (zktpu/plonk/prover.py)
remains the byte-parity path; this module is the scale path validated
against it element-exactly (tests/test_dist.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..fields.host import FR, FieldSpec
from ..fields.fp import device_field
from .ntt import get_four_step
from .msm import msm_jacobian_sharded

SHARD_AXIS = "shard"


class ShardedWireCommitter:
    """Round-1 wire interpolation + commitment, sharded over `mesh`.

    spec: scalar field (FR); n: domain size (power of two, four-step
    shardable by the mesh size); c: Pippenger window.

    NOTE (zero-knowledge): `__call__` commits the UNBLINDED wire
    interpolations — it is the sharded O(n) building block, not a complete
    round-1 committer.  A prover must use `commit_blinded`, which applies
    the reference's (b_hi X + b_lo) * Z_H(X) wire blinding
    (plonk/src/prover.rs:68-90) as a 4-term host-side commitment
    correction; committing `__call__`'s output directly would leak witness
    information.
    """

    def __init__(self, spec: FieldSpec, n: int, mesh, axis_name: str = SHARD_AXIS, c: int = 8):
        self.spec = spec
        self.df = device_field(spec)
        self.n = n
        self.mesh = mesh
        self.axis_name = axis_name
        self.c = c
        self.fs = get_four_step(spec, n, mesh, axis_name)
        self._step = jax.jit(self._build())

    def _build(self):
        df, fs = self.df, self.fs
        mesh, ax, c = self.mesh, self.axis_name, self.c

        def step(evals3, X, Y, Z):
            # evals3: (3, n, D) wire evaluation columns; SRS powers (n, D) x3
            outs = []
            for i in range(evals3.shape[0]):
                coeffs = fs._inv(evals3[i])  # sharded four-step iNTT
                sc = df.to_u32_limbs(coeffs)  # Montgomery digits -> canonical u32
                outs.append(
                    msm_jacobian_sharded(sc, X, Y, Z, mesh=mesh, axis_name=ax, c=c)
                )
            return tuple(outs)

        return step

    def __call__(self, evals3: jnp.ndarray, X, Y, Z):
        """Returns a 3-tuple of projective points (X, Y, Z digit triples)."""
        return self._step(evals3, X, Y, Z)

    def commit_blinded(self, evals3: jnp.ndarray, srs, blinds):
        """Zero-knowledge round-1 commitments: sharded MSM + blinding fixup.

        Each wire polynomial is a_x = f_ax + (b_hi X + b_lo) * Z_H(X) with
        Z_H(X) = X^n - 1 (plonk/src/prover.rs:83-90).  The blinding touches
        only coefficients {0, 1, n, n+1}, so the blinded commitment is the
        sharded commitment of f_ax plus

            b_hi * ([s^{n+1}] - [s])  +  b_lo * ([s^n] - [1])

        — four host scalar-muls against SRS powers; the O(n) interpolation
        and MSM stay sharded on the mesh.

        blinds: sequence of 3 (b_hi, b_lo) int pairs (one per wire).
        Returns 3 host G1Affine points, equal to committing the blinded
        polynomials directly.
        """
        from ..curves import g1 as g1mod

        n = self.n
        X, Y, Z = srs.g1_proj
        raw = self._step(evals3, X[:n], Y[:n], Z[:n])
        # decode the three projective results + the 4 SRS powers in one host pass
        rX = jnp.stack([p[0] for p in raw])
        rY = jnp.stack([p[1] for p in raw])
        rZ = jnp.stack([p[2] for p in raw])
        pts = g1mod.proj_to_affine_host((rX, rY, rZ))
        p0, p1, pn, pn1 = g1mod.proj_to_affine_host(
            tuple(jnp.stack([a[0], a[1], a[n], a[n + 1]]) for a in srs.g1_proj)
        )
        out = []
        for pt, (b_hi, b_lo) in zip(pts, blinds):
            corr = (pn1 - p1).mul(b_hi) + (pn - p0).mul(b_lo)
            out.append(pt + corr)
        return out


@functools.lru_cache(maxsize=None)
def get_wire_committer(n: int, mesh, axis_name: str = SHARD_AXIS, c: int = 8) -> ShardedWireCommitter:
    return ShardedWireCommitter(FR, n, mesh, axis_name, c)
