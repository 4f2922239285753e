"""KZG polynomial commitment scheme (mirrors kzg/src/scheme.rs semantics).

commit / commit_vector / commit_para / open / open_vector / verify /
aggregate_commitments / batch_verify.  The per-coefficient MSM of the
reference (scheme.rs:84-96) is replaced by the device Pippenger MSM; openings
use the scan-based linear division (kzg/src/scheme.rs:108-120 semantics).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..config import HOST_MSM_MAX, HOST_MSM_SRS_MAX
from ..fields.host import FR
from ..fields.fp import device_field
from ..poly.poly import Poly
from ..curves import g1 as g1mod
from ..curves.host_curve import G1Affine
from ..curves.msm import msm_proj
from ..curves.pairing import pairing_product, Fq12
from ..transcript.chacha import StdRng
from .srs import Srs

FRD = device_field(FR)


class KzgCommitment:
    __slots__ = ("point",)

    def __init__(self, point: G1Affine):
        self.point = point

    # transcript feeding interface (x, y, infinity)
    @property
    def x(self):
        return self.point.x

    @property
    def y(self):
        return self.point.y

    @property
    def infinity(self):
        return self.point.infinity

    def inner(self) -> G1Affine:
        return self.point

    def __add__(self, other):
        return KzgCommitment(self.point + other.point)

    def __sub__(self, other):
        return KzgCommitment(self.point - other.point)

    def __neg__(self):
        return KzgCommitment(-self.point)

    def mul(self, k: int) -> "KzgCommitment":
        return KzgCommitment(self.point.mul(k))

    def __eq__(self, other):
        return isinstance(other, KzgCommitment) and self.point == other.point

    def __repr__(self):
        return f"KzgCommitment({'inf' if self.point.infinity else hex(self.point.x)[:14]}...)"


class KzgOpening:
    __slots__ = ("point", "evaluation")

    def __init__(self, point: G1Affine, evaluation: int):
        self.point = point
        self.evaluation = evaluation

    def eval(self) -> int:
        return self.evaluation


def _mont_digits_to_u32(coeffs: jnp.ndarray) -> jnp.ndarray:
    """(N, 16) Montgomery digit array -> (N, 8) canonical u32 limbs, on device."""
    return FRD.to_u32_limbs(coeffs)


def _pad_identity_rows(fq, planes, pad: int):
    """Append `pad` identity rows (0 : 1 : 0) in the backend's representation."""
    f = g1mod.FQD if fq is None else fq
    z = jnp.zeros((pad, f.num_digits), jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(f.one_np), (pad, f.num_digits))
    X, Y, Z = planes
    return (
        jnp.concatenate([X, z], axis=0),
        jnp.concatenate([Y, one], axis=0),
        jnp.concatenate([Z, z], axis=0),
    )


class KzgScheme:
    def __init__(self, srs: Srs):
        self.srs = srs

    def commit(self, polynomial: Poly) -> KzgCommitment:
        return self.commit_coeffs(polynomial.coeffs)

    def commit_coeffs(self, coeffs: jnp.ndarray) -> KzgCommitment:
        n = coeffs.shape[0]
        assert self.srs.size > max(n - 1, 0), "polynomial degree exceeds SRS"
        if n == 0:
            return KzgCommitment(G1Affine.identity())
        if n <= HOST_MSM_MAX and self.srs.size <= HOST_MSM_SRS_MAX:
            # latency tier: tiny MSMs are dispatch-bound, not compute-bound
            scalars = FRD.decode_ints(coeffs)
            acc = G1Affine.identity()
            for s, pt in zip(scalars, self.srs.g1_points_host()):
                if s:
                    acc = acc + pt.mul(s)
            return KzgCommitment(acc)
        sc = _mont_digits_to_u32(coeffs)
        from ..curves.msm import padded_msm_len, pick_window

        c = pick_window(n)
        fq, (X, Y, Z) = self._msm_planes()
        m = padded_msm_len(n)
        Xp, Yp, Zp = X[:n], Y[:n], Z[:n]
        if m != n:
            sc = jnp.pad(sc, ((0, m - n), (0, 0)))
            Xp, Yp, Zp = _pad_identity_rows(fq, (Xp, Yp, Zp), m - n)
        R = msm_proj(sc, Xp, Yp, Zp, c=c, fq=fq)
        pt = g1mod.proj_to_affine_host(tuple(a[None] for a in R), fq=fq)[0]
        return KzgCommitment(pt)

    def _msm_planes(self):
        """(field backend, SRS point planes) per config.msm_backend()."""
        from ..config import msm_backend

        if msm_backend() == "rns":
            from ..fields.host import FQ
            from ..fields.rns import rns_field

            return rns_field(FQ), self.srs.g1_rns()
        return None, self.srs.g1_proj

    def commit_many(self, polys: list[Poly]) -> list[KzgCommitment]:
        """Commit K same-SRS polynomials via ONE batched MSM.

        The PLONK prover's rounds commit 2-3 polynomials each (wires,
        quotient slices, opening witnesses; plonk/src/prover.rs:85-91,
        147-149, 264-270); batching runs their window scans as one
        (K*G)-wide device batch instead of K sequential MSMs.  Results are
        identical to [commit(p) for p in polys].
        """
        if not polys:
            return []
        n = max(p.coeffs.shape[0] for p in polys)
        if len(polys) == 1 or (n <= HOST_MSM_MAX and self.srs.size <= HOST_MSM_SRS_MAX):
            return [self.commit(p) for p in polys]
        # Above ~2^19 points a K-wide vmapped MSM multiplies every scan
        # buffer by K (3 x 3 GB lane-padded buffers x6 at 2^21 OOMs the
        # chip), and the per-MSM latency the batching amortizes is long
        # gone — go sequential.
        if n > (1 << 19):
            return [self.commit(p) for p in polys]
        assert self.srs.size > n - 1, "polynomial degree exceeds SRS"
        from ..curves.msm import msm_proj_many, padded_msm_len, pick_window

        stacked = jnp.stack(
            [jnp.pad(p.coeffs, ((0, n - p.coeffs.shape[0]), (0, 0))) for p in polys]
        )  # (K, n, D)
        sc = _mont_digits_to_u32(stacked.reshape(-1, stacked.shape[-1]))
        sc = sc.reshape(len(polys), n, -1)
        fq, (X, Y, Z) = self._msm_planes()
        c = pick_window(n)
        # pad point count to the pow2 compile bucket (scalar pad per-K)
        m = padded_msm_len(n)
        Xp, Yp, Zp = X[:n], Y[:n], Z[:n]
        if m != n:
            sc = jnp.pad(sc, ((0, 0), (0, m - n), (0, 0)))
            Xp, Yp, Zp = _pad_identity_rows(fq, (Xp, Yp, Zp), m - n)
        R = msm_proj_many(sc, Xp, Yp, Zp, c=c, fq=fq)
        pts = g1mod.proj_to_affine_host(R, fq=fq)
        return [KzgCommitment(pt) for pt in pts]

    def commit_vector(self, coeffs: list[int]) -> KzgCommitment:
        return self.commit(Poly.from_ints(FR, coeffs))

    def commit_para(self, para: int) -> KzgCommitment:
        return KzgCommitment(self.srs.g1_generator_host().mul(para))

    def open(self, polynomial: Poly, z: int) -> KzgOpening:
        quotient, evaluation = polynomial.divide_by_linear(z)
        opening_pt = self.commit(quotient).point
        return KzgOpening(opening_pt, evaluation)

    def open_vector(self, coeffs: list[int], z: int) -> KzgOpening:
        return self.open(Poly.from_ints(FR, coeffs), z)

    def verify(self, commitment: KzgCommitment, opening: KzgOpening, z: int) -> bool:
        """e([Q], [x]_2 - z[1]_2) == e([P] - y[1]_1, [1]_2)  (scheme.rs:155-171)."""
        g2s = self.srs.g2s()
        g2 = self.srs.g2()
        a = g2s - g2.mul(z)
        b = commitment.point - G1Affine.generator().mul(opening.evaluation)
        return pairing_product([(opening.point, a), (-b, g2)]) == Fq12.one()

    @staticmethod
    def aggregate_commitments(commitments, challenge: int) -> KzgCommitment:
        acc = G1Affine.identity()
        pw = 1
        for c in commitments:
            acc = acc + c.point.mul(pw)
            pw = FR.mul(pw, challenge)
        return KzgCommitment(acc)

    def batch_verify(self, commitments, points, openings, rng: StdRng) -> bool:
        """Random-linear-combination batch check (scheme.rs:215-245)."""
        assert len(commitments) == len(points) == len(openings)
        g = G1Affine.generator()
        e1 = G1Affine.identity()
        e2 = G1Affine.identity()
        for cm, z, op in zip(commitments, points, openings):
            w, s = op.point, op.evaluation
            cm_minus_s = cm.point - g.mul(s)
            z_mul_w = w.mul(z)
            r_prime = rng.gen_u128() % FR.modulus  # Fr::from(rng.gen::<u128>())
            e1 = e1 + (cm_minus_s + z_mul_w).mul(r_prime)
            e2 = e2 + w.mul(r_prime)
        return pairing_product([(e1, self.srs.g2()), (-e2, self.srs.g2s())]) == Fq12.one()
