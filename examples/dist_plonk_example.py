"""Distributed PLONK round-1 example: sharded wire commitments on a mesh.

Runs the ShardedWireCommitter (four-step iNTT -> sharded Pippenger MSM, one
jitted step, cross-chip traffic = 3x all_to_all + n_dev projective partials
per wire) on a virtual 8-device CPU mesh and cross-checks the three wire
commitments against the single-chip interpolate-then-commit path.

On a real pod slice the same code runs unchanged over a hardware
`jax.sharding.Mesh`; the virtual mesh validates layout and collectives
without multi-chip hardware (SURVEY.md §2.C).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from zktpu.curves import g1
    from zktpu.curves.host_curve import G1Affine
    from zktpu.curves.msm import msm_proj
    from zktpu.dist import ShardedWireCommitter, make_mesh
    from zktpu.fields.fp import device_field
    from zktpu.fields.host import FR
    from zktpu.kzg.scheme import _mont_digits_to_u32
    from zktpu.poly.domain import get_domain

    frd = device_field(FR)
    n = 1 << 8
    mesh = make_mesh(8)
    dom = get_domain(FR, n)

    rng = np.random.default_rng(42)
    evals3 = jax.numpy.stack(
        [frd.encode_ints([int(v) for v in rng.integers(0, 1 << 62, size=n)]) for _ in range(3)]
    )
    X, Y, Z = g1.fixed_base_mul(G1Affine.generator(), list(range(2, n + 2)))

    committer = ShardedWireCommitter(FR, n, mesh, c=4)
    got = committer(evals3, X, Y, Z)

    for i in range(3):
        sc = _mont_digits_to_u32(dom.ifft(evals3[i]))
        want = msm_proj(sc, X, Y, Z, c=4)
        assert g1.proj_to_affine_host(tuple(a[None] for a in want)) == g1.proj_to_affine_host(
            tuple(a[None] for a in got[i])
        ), f"wire {i} commitment mismatch"
    print(f"sharded wire commitments on {mesh.devices.size}-device mesh: all 3 match single-chip")


if __name__ == "__main__":
    main()
