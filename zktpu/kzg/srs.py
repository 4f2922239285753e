"""Structured reference string (trusted setup) for the KZG scheme.

Mirrors kzg/src/srs.rs: `new` samples a random secret (thread_rng there, OS
entropy here), `new_from_secret` deterministically builds
[G, sG, s^2 G, ..., s^{size+2} G] (size + 3 points, srs.rs:51) plus G2 and
s*G2.  The G1 powers are produced on-device with a windowed fixed-base
batch multiply instead of the reference's sequential per-point loop.
"""
from __future__ import annotations

import secrets

from ..fields.host import FR
from ..curves import g1
from ..curves.host_curve import G1Affine, G2Affine


class Srs:
    def __init__(self, g1_proj, g2: G2Affine, g2s: G2Affine, size: int, secret: int | None = None):
        # g1_proj: device projective arrays (X, Y, Z) each (size, D)
        self.g1_proj = g1_proj
        self._g2 = g2
        self._g2s = g2s
        self.size = size
        self._secret = secret  # retained only when constructed from a known secret
        self._g1_host: list[G1Affine] | None = None
        self._g1_aff = None  # device affine (Xa, Ya) cache for the mixed-add MSM
        self._g1_rns = None  # device RNS residue planes for the RNS MSM backend

    @classmethod
    def new(cls, circuit_size: int) -> "Srs":
        secret = secrets.randbelow(FR.modulus)
        return cls.new_from_secret(secret, circuit_size)

    @classmethod
    def new_from_secret(cls, secret: int, circuit_size: int) -> "Srs":
        n = circuit_size + 3
        if n <= 4096:
            # latency tier: host power chain
            powers, cur = [], 1
            for _ in range(n):
                powers.append(cur)
                cur = FR.mul(cur, secret)
            pts = g1.fixed_base_mul(G1Affine.generator(), powers)
        else:
            # device path: log-depth cumprod of tau powers, packed to u32
            # limbs on device (replaces the reference's sequential per-point
            # loop, kzg/src/srs.rs:48-63, with zero host bignum work)
            from ..fields.fp import device_field

            frd = device_field(FR)
            powers_mont = frd.powers(secret, n)
            sc = frd.to_u32_limbs(powers_mont)
            pts = g1.fixed_base_mul_u32(G1Affine.generator(), sc)
        g2 = G2Affine.generator()
        g2s = g2.mul(secret)
        return cls(pts, g2, g2s, n, secret)

    def g1_affine(self):
        """Device affine (Xa, Ya) digit arrays of the G1 powers (cached).

        Computed once by a device batch inversion (g1.proj_to_affine_dev);
        feeds msm_affine's mixed-add path, which is both lighter on the
        per-window sorted gather (2 coordinate planes instead of 3) and one
        Montgomery mul cheaper per scan addition.
        """
        if self._g1_aff is None:
            self._g1_aff = g1.proj_to_affine_dev(self.g1_proj)
        return self._g1_aff

    def g1_rns(self):
        """Device RNS residue planes (X, Y, Z) of the G1 powers (cached).

        One-time chunked digit->RNS conversion (fields/rns.py
        from_digit_mont); feeds msm_proj(..., fq=rns_field(FQ)), the default
        commit backend on TPU (config.msm_backend)."""
        if self._g1_rns is None:
            import jax
            import jax.numpy as jnp

            from ..fields.host import FQ
            from ..fields.rns import rns_field

            rf = rns_field(FQ)
            conv = jax.jit(rf.from_digit_mont)
            step = 1 << 19
            n = self.g1_proj[0].shape[0]

            def plane(a):
                if n <= step:
                    return conv(a)
                return jnp.concatenate(
                    [conv(a[i : i + step]) for i in range(0, n, step)]
                )

            self._g1_rns = tuple(plane(a) for a in self.g1_proj)
        return self._g1_rns

    def offload_digit_planes(self) -> None:
        """Move the digit-Montgomery G1 planes to host memory (numpy).

        After g1_rns() conversion the TPU commit path never touches them,
        but at rest they hold ~1.6 GB of lane-padded HBM at a 2^20 SRS.
        Every consumer (host fallbacks, checkpointing, generator slice)
        accepts numpy transparently; jnp ops re-upload on demand."""
        import numpy as _np
        import jax as _jax

        self.g1_proj = tuple(
            _np.asarray(_jax.device_get(a)) for a in self.g1_proj
        )

    def g1_points_host(self) -> list[G1Affine]:
        if self._g1_host is None:
            self._g1_host = g1.proj_to_affine_host(self.g1_proj)
        return self._g1_host

    def g1_generator_host(self) -> G1Affine:
        """First SRS point ([1]G) without decoding the whole point table."""
        if self._g1_host is not None:
            return self._g1_host[0]
        if getattr(self, "_g1_first", None) is None:
            self._g1_first = g1.proj_to_affine_host(
                tuple(a[:1] for a in self.g1_proj)
            )[0]
        return self._g1_first

    def g2(self) -> G2Affine:
        return self._g2

    def g2s(self) -> G2Affine:
        return self._g2s

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Srs)
            and self.size == other.size
            and self.g2() == other.g2()
            and self.g2s() == other.g2s()
            and self.g1_points_host() == other.g1_points_host()
        )
