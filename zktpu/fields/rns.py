"""Residue-number-system (RNS) prime-field backend for TPU.

This is the speed-of-light formulation of big-field multiplication for the
VPU+MXU (NOTES_PERF.md "Next levers" #1): instead of one 24x16-bit-digit
positional integer with carry chains (fields/fp.py — ~11,800 lane-ops per
Fq mul), a field element is held as its residues modulo ~52 independent
16-bit primes.  Multiplication becomes

  * pointwise 16x16->32-bit residue products + a short fold/csub reduction
    per channel (no carries ACROSS channels — the VPU's ideal shape), and
  * two *base extensions*, each a constant (k x k) matrix contraction that
    maps exactly onto the MXU as four bf16 matmuls after an 8-bit digit
    split (products <= 255^2 and sums < 2^24 are exact in f32 accumulation).

Layout: an element is a uint32 array (..., C) with C = 2k+1 channels:
  [0, k)    residues modulo base-B primes  m_0..m_{k-1}
  [k, 2k)   residues modulo base-B' primes m'_0..m'_{k-1}
  [2k]      residue modulo the redundant modulus m_r = 2^16

Montgomery-RNS (Bajard et al. / Kawamura et al.): elements are stored as
x_hat = x * M1 mod p where M1 = prod(B).  mont_mul(a, b) = a*b*M1^{-1}:

  1. d_c   = a_c * b_c mod m_c                    (all channels)
  2. qs_i  = d_i * (-p^{-1} (M1/m_i)^{-1}) mod m_i     (base B)
  3. q~    = sum_i qs_i * (M1/m_i)  — "sloppy" CRT extension of q to
     B' + m_r WITHOUT the alpha*M1 correction: q~ = q + alpha*M1 for some
     0 <= alpha < k, which only grows the output bound by k*p (absorbed).
  4. r_j   = (d_j + q~_j * p) * M1^{-1} mod m'_j  (base B' + m_r) — the
     exact integer r = (d + q~ p)/M1 < (k+2)p, represented in B' + m_r.
  5. extend r back to base B EXACTLY via Shenoy-Kumaresan: the redundant
     residue r mod 2^16 pins the CRT overflow count
     alpha' = (sum_j sigma_j (M2/m'_j) - r) / M2 mod 2^16  (alpha' < k).

Bound discipline (validated by tests/test_rns.py::test_group_law_bounds):
  - mont_mul OUTPUT raw value < (k+2) * p  for inputs < 2^14 * p,
    guaranteed by  2^28 * p <= M1  (asserted at spec build).
  - add doubles bounds; sub(a, b) returns a + Kp - b with K = 2^13 and
    REQUIRES b's raw value < 2^13 * p.  The RCB complete group law
    (curves/g1.py) keeps every sub operand < ~1000 p and every mul operand
    < ~2^13.1 p across arbitrarily many chained point ops (mul outputs
    collapse back to < (k+2) p each iteration), so the contract holds with
    ~8x margin.

Exactness of every step is integer exactness: the bf16 matmuls see only
8-bit operands (exact in bf16's 8-bit significand) accumulated in f32
(sums < 2^24), and the fold/csub reductions are plain u32 arithmetic whose
intermediate bounds are documented inline.  There is no floating-point
alpha estimation anywhere.

Replaces the arkworks 64-bit-limb Montgomery backend the reference uses
for its curve arithmetic hot loop (kzg/src/scheme.rs:84-96) — see
curves/msm.py msm_proj(..., fq=rns_fq()) for the MSM integration.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .host import FieldSpec, FQ
from .fp import ints_to_digits

_U32 = jnp.uint32
_BF16 = jnp.bfloat16
_F32 = jnp.float32


def _primes_below_2_16(count: int) -> list[int]:
    """Largest `count` primes below 2^16, descending."""
    n = 1 << 16
    sieve = np.ones(n, dtype=bool)
    sieve[:2] = False
    for i in range(2, 256):
        if sieve[i]:
            sieve[i * i :: i] = False
    primes = np.nonzero(sieve)[0][::-1][:count]
    if len(primes) < count:
        raise ValueError("not enough 16-bit primes")
    return [int(m) for m in primes]


def _fold(x: jnp.ndarray, r1: jnp.ndarray) -> jnp.ndarray:
    """(x >> 16) * r1 + (x & 0xFFFF)  with  r1 = 2^16 mod m  (< 2^11).

    Value-preserving mod m.  For x < 2^32 the product (x>>16)*r1 < 2^27 and
    the sum < 2^27 + 2^16 — never overflows u32 given r1 < 2^11 (all spec
    primes are within 2^11 of 2^16; the redundant channel has r1 = 0 and
    folds straight to x & 0xFFFF).
    """
    return (x >> 16) * r1 + (x & jnp.uint32(0xFFFF))


def _csub(x: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(x >= m, x - m, x)


def _reduce(x: jnp.ndarray, r1: jnp.ndarray, m: jnp.ndarray, folds: int, csubs: int) -> jnp.ndarray:
    for _ in range(folds):
        x = _fold(x, r1)
    for _ in range(csubs):
        x = _csub(x, m)
    return x


class RnsField:
    """Drop-in DeviceField-alike over the RNS representation.

    Exposes the interface the generic group law / scans consume
    (curves/g1.py, curves/scan.py): mont_mul, add, sub, double, neg,
    is_zero, select, one_np, zero_np, num_digits.  `pallas_ok = False`
    routes proj_add/proj_double/proj_madd to their jnp bodies (the RNS ops
    are carry-free elementwise chains + matmuls, which XLA fuses well
    without hand-written kernels).
    """

    pallas_ok = False  # gate off the digit-layout pallas point kernels

    SUB_K = 1 << 13  # sub(a, b) = a + SUB_K*p - b; requires b < SUB_K * p

    def __init__(self, spec: FieldSpec, k: int = 26):
        p = spec.modulus
        self.spec = spec
        self.k = k
        C = 2 * k + 1
        self.num_digits = C  # channel count; named for DeviceField parity

        primes = _primes_below_2_16(2 * k)
        B = primes[0::2]
        B2 = primes[1::2]
        self.base_b = B
        self.base_b2 = B2
        M1 = 1
        for m in B:
            M1 *= m
        M2 = 1
        for m in B2:
            M2 *= m
        self.M1, self.M2 = M1, M2
        # mul-input bound 2^14 p  =>  output bound (k+2) p   (see module doc)
        assert (1 << 28) * p <= M1, "RNS base B too small for the bound discipline"
        assert (self.SUB_K * 4) * p < M2, "RNS base B' too small"
        assert min(primes) >= (1 << 16) - (1 << 11), "fold bound needs m > 2^16 - 2^11"

        mods = np.array(B + B2 + [1 << 16], dtype=np.uint64)
        self._mods_np = mods.astype(np.uint32)
        self._r1_np = ((1 << 16) % mods).astype(np.uint32)
        self.mods = jnp.asarray(self._mods_np)
        self.r1 = jnp.asarray(self._r1_np)

        def res(v: int, ms) -> np.ndarray:
            return np.array([v % m for m in ms], dtype=np.uint32)

        # step-2 constant: (-p^{-1} mod m_i) * ((M1/m_i)^{-1} mod m_i) mod m_i
        self._qs_const = np.array(
            [
                (-pow(p, -1, m)) % m * pow(M1 // m, -1, m) % m
                for m in B
            ],
            dtype=np.uint32,
        )
        # step-3 matrix: T1[i, j] = (M1/m_i) mod target_j, targets = B' + [2^16]
        t1_targets = B2 + [1 << 16]
        T1 = np.array(
            [[(M1 // mi) % mj for mj in t1_targets] for mi in B], dtype=np.uint32
        )
        self._t1_blk = self._pack_w(T1)
        self._t1_mods = jnp.asarray(np.array(t1_targets, dtype=np.uint32))
        self._t1_r1 = jnp.asarray(
            np.array([(1 << 16) % m for m in t1_targets], dtype=np.uint32)
        )
        # step-4 constants over B' + m_r, with M1^{-1} folded into both terms:
        # r = (d + q~ p) M1^{-1} = d*invM1 + q~*(p*invM1)  (mod m'_j)
        self._invM1_b2r = jnp.asarray(
            np.array([pow(M1, -1, m) for m in t1_targets], dtype=np.uint32)
        )
        self._pinvM1_b2r = jnp.asarray(
            np.array([p * pow(M1, -1, m) % m for m in t1_targets], dtype=np.uint32)
        )
        # step-5 constants
        self._sig_const = jnp.asarray(
            np.array([pow(M2 // m, -1, m) for m in B2], dtype=np.uint32)
        )
        T2 = np.array([[(M2 // mj) % mi for mi in B] for mj in B2], dtype=np.uint32)
        self._t2_blk = self._pack_w(T2)
        self._m2j_mod16 = jnp.asarray(
            np.array([(M2 // m) & 0xFFFF for m in B2], dtype=np.uint32)
        )
        self._invM2_16 = jnp.uint32(pow(M2, -1, 1 << 16))
        self._m2_modB = jnp.asarray(res(M2, B))
        self._modsB = jnp.asarray(np.array(B, dtype=np.uint32))
        self._r1B = jnp.asarray(
            np.array([(1 << 16) % m for m in B], dtype=np.uint32)
        )
        # sub offset: SUB_K * p residues
        self._kp = jnp.asarray(res(self.SUB_K * p, B + B2 + [1 << 16]))

        self.zero_np = np.zeros(C, dtype=np.uint32)
        self.one_np = self._encode_np([1])[0]

        # device conversion from the positional digit-Montgomery form
        # (fields/fp.py): digits represent v = x * 2^(16 J); one matmul to
        # residues + one mont_mul by M1^2 * 2^(-16 J) lands x * M1 mod p.
        J = spec.num_digits
        W = np.array(
            [[pow(2, 16 * j, int(m)) for m in mods] for j in range(J)],
            dtype=np.uint32,
        )
        self._w_blk = self._pack_w(W)
        corr = M1 * M1 % p * pow(pow(2, 16 * J, p), -1, p) % p
        self._digit_corr = jnp.asarray(res(corr, B + B2 + [1 << 16]))

    # -- host encode/decode ------------------------------------------------
    def _encode_np(self, values) -> np.ndarray:
        p, M1 = self.spec.modulus, self.M1
        mods = self._mods_np
        out = np.zeros((len(values), len(mods)), dtype=np.uint32)
        for r, v in enumerate(values):
            vm = int(v) * M1 % p
            for c, m in enumerate(mods):
                out[r, c] = vm % int(m)
        return out

    def encode_ints(self, values) -> jnp.ndarray:
        """Python ints -> (N, C) Montgomery-RNS residues."""
        return jnp.asarray(self._encode_np(list(values)))

    def decode_raw_ints(self, arr) -> list[int]:
        """(N, C) residues -> raw CRT integers over base B (NOT reduced mod p).

        Valid whenever the represented value < M1, which the bound
        discipline guarantees (< 2^14 p < M1 / 2^14).
        """
        a = np.asarray(jax.device_get(arr), dtype=np.uint64).reshape(-1, self.num_digits)
        k, M1 = self.k, self.M1
        consts = [
            (M1 // m * pow(M1 // m, -1, m), m) for m in self.base_b
        ]
        out = []
        for row in a:
            v = 0
            for i, (ci, m) in enumerate(consts):
                v += int(row[i]) % m * ci
            out.append(v % M1)
        return out

    def decode_ints(self, arr) -> list[int]:
        """(N, C) Montgomery-RNS residues -> canonical ints (undoes *M1)."""
        p = self.spec.modulus
        inv = pow(self.M1, -1, p)
        return [v % p * inv % p for v in self.decode_raw_ints(arr)]

    # -- core reductions ---------------------------------------------------
    def _red_prod(self, prod: jnp.ndarray, mods=None, r1=None) -> jnp.ndarray:
        """Reduce a full-range u32 (< 2^32) to [0, m) per channel.

        Bound chase (r1 < 2^11): 2^32 -> fold 2^27.1 -> fold 2^22.2 ->
        fold < 2^17.4 < 3m -> 3 csubs.
        """
        m = self.mods if mods is None else mods
        r = self.r1 if r1 is None else r1
        return _reduce(prod, r, m, folds=3, csubs=3)

    @staticmethod
    def _pack_w(W: np.ndarray) -> jnp.ndarray:
        """(J, C) u32 matrix -> (2J, 3C) bf16 block matrix for _matmul_mod.

        One matmul of [xl | xh] against [[Wlo Whi 0], [0 Wlo Whi]] yields
        [ll | mid | hh] in a single MXU pass (instead of four), with better
        lane utilization of the padded output tile.
        """
        J, C = W.shape
        lo = (W & 0xFF).astype(np.float32)
        hi = (W >> 8).astype(np.float32)
        blk = np.zeros((2 * J, 3 * C), dtype=np.float32)
        blk[:J, :C] = lo
        blk[:J, C : 2 * C] = hi
        blk[J:, C : 2 * C] = lo
        blk[J:, 2 * C :] = hi
        return jnp.asarray(blk, dtype=_BF16)

    def _matmul_mod(self, x, w_blk, mods, r1) -> jnp.ndarray:
        """sum_j x[..., j] * W[j, c]  mod mods[c], exactly, via the MXU.

        x < 2^16 per entry, W < 2^16, J = x.shape[-1] <= 32.  8-bit splits
        packed as ONE bf16 matmul with f32 accumulation (partial sums <
        2*J*255^2 < 2^23 — exact).  Recombine mod m: hh*2^16 == red(hh)*r1
        (mod m), mid*2^8 and ll join below 2^30.2, then one full reduction.
        """
        C = w_blk.shape[1] // 3
        xs = jnp.concatenate([x & jnp.uint32(0xFF), x >> 8], axis=-1).astype(_BF16)
        out = jnp.matmul(xs, w_blk, preferred_element_type=_F32).astype(_U32)
        ll, mid, hh = out[..., :C], out[..., C : 2 * C], out[..., 2 * C :]
        hh = _reduce(hh, r1, mods, folds=1, csubs=2)  # fold: < 2^16.9 < 3m
        total = hh * r1 + mid * jnp.uint32(256) + ll  # < 2^27 + 2^30 + 2^22
        return self._red_prod(total, mods, r1)

    # -- field ops (DeviceField interface) ---------------------------------
    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        k = self.k
        d = self._red_prod(a * b)  # step 1, all channels
        qs = self._red_prod(d[..., :k] * self._qs_const, self._modsB, self._r1B)
        qt = self._matmul_mod(qs, self._t1_blk, self._t1_mods, self._t1_r1)
        # step 4: r = (d + q~ p) M1^{-1} over B' + m_r, one fused reduction:
        # pre-fold both < 2^32 products to < 2^27.1, add (< 2^28.1), reduce.
        t = _fold(d[..., k:] * self._invM1_b2r, self._t1_r1) + _fold(
            qt * self._pinvM1_b2r, self._t1_r1
        )
        r = _reduce(t, self._t1_r1, self._t1_mods, folds=3, csubs=2)
        rB2, r_r = r[..., :k], r[..., k]
        # step 5: Shenoy-Kumaresan exact extension B' -> B
        sig = self._red_prod(rB2 * self._sig_const, self._t1_mods[:k], self._t1_r1[:k])
        s16 = jnp.sum(sig * self._m2j_mod16, axis=-1)  # u32 wrap == mod 2^16 info
        alpha = ((s16 - r_r) * self._invM2_16) & jnp.uint32(0xFFFF)  # < k, exact
        outB = self._matmul_mod(sig, self._t2_blk, self._modsB, self._r1B)
        amod = self._red_prod(alpha[..., None] * self._m2_modB, self._modsB, self._r1B)
        outB = _csub(outB + self._modsB - amod, self._modsB)
        return jnp.concatenate([outB, rB2, r_r[..., None]], axis=-1)

    def mont_sqr(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, a)

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return _csub(a + b, self.mods)

    def double(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """a + SUB_K*p - b; requires b's raw value < SUB_K * p (module doc)."""
        t = a + self._kp + (self.mods - b)  # < 3m < 2^18
        return _csub(_csub(t, self.mods), self.mods)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(jnp.zeros_like(a), a)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        """All-channels-zero test — detects exact zero ENCODINGS (e.g. the
        (0, 0) affine-identity sentinel), not p-multiples."""
        return jnp.all(a == 0, axis=-1)

    def select(self, cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(cond[..., None], a, b)

    # -- conversions -------------------------------------------------------
    def from_digit_mont(self, digits: jnp.ndarray) -> jnp.ndarray:
        """(..., J) 16-bit-digit Montgomery form (fields/fp.py) -> RNS form.

        digits encode v = x*2^(16 J) mod p; residues of v by constant
        matmul, then one mont_mul by M1^2 * 2^(-16 J) mod p gives
        x * M1 mod p with the standard < (k+2) p bound.
        """
        v = self._matmul_mod(digits, self._w_blk, self.mods, self.r1)
        return self.mont_mul(v, self._digit_corr)


@functools.lru_cache(maxsize=None)
def rns_field(spec: FieldSpec = FQ, k: int = 26) -> RnsField:
    return RnsField(spec, k)
