"""Dense univariate polynomials over device field vectors.

Semantics mirror arkworks `DensePolynomial` as used by the reference
(kzg/src/scheme.rs, plonk/src/prover.rs): coefficient vectors are trimmed of
trailing zeros (the zero polynomial has no coefficients), `degree() = len-1`.

Bulk arithmetic runs on device: multiplication via NTT, division by the
vanishing polynomial via the strided-suffix-sum identity
    q_i = sum_{j>=1} p_{i+jn},   remainder_i = p_i + q_i  (i < n),
and division by a linear factor (X - z) via a reverse cumulative sum with
powers of z (exact in a field, no sequential recurrence).
"""
from __future__ import annotations

import jax
import math
import jax.numpy as jnp
import numpy as np

from ..config import HOST_POLY_MAX
from ..fields.host import FieldSpec
from ..fields.fp import device_field, ints_to_digits
from .domain import Radix2Domain, get_domain


_PACK_MIN_ROWS = 1 << 16


class Poly:
    """coeffs: (len, D) uint32 Montgomery digits, trailing zeros trimmed.

    Storage: XLA:TPU lane-pads the D-digit minor dim of every at-rest array
    to 128 lanes (8x HBM for Fr's D = 16), so large coefficient arrays are
    held PACKED as (m/k, k*D) with k*D a multiple of 128 (a pure reshape) —
    at a 2^20-gate PLONK circuit this is the difference between ~9 GB and
    ~1.2 GB of resident polynomials.  The `coeffs` property unpacks on
    access (a transient relayout, bandwidth-cost only)."""

    __slots__ = ("spec", "df", "_raw", "_packed")

    def __init__(self, spec: FieldSpec, coeffs: jnp.ndarray, trim: bool = True):
        self.spec = spec
        self.df = device_field(spec)
        if trim and coeffs.shape[0]:
            coeffs = self._trim(coeffs)
        n, D = coeffs.shape
        k = 128 // math.gcd(D, 128)
        if n >= _PACK_MIN_ROWS and k > 1:
            m = -(-n // k) * k
            if m != n:
                coeffs = jnp.pad(coeffs, ((0, m - n), (0, 0)))
            self._raw = None
            self._packed = (coeffs.reshape(m // k, k * D), n, D)
        else:
            self._raw = coeffs
            self._packed = None

    @property
    def coeffs(self) -> jnp.ndarray:
        if self._raw is not None:
            return self._raw
        arr2d, n, D = self._packed
        return arr2d.reshape(-1, D)[:n]

    # -- construction --

    @classmethod
    def from_ints(cls, spec: FieldSpec, values) -> "Poly":
        df = device_field(spec)
        vals = [int(v) % spec.modulus for v in values]
        if not vals:
            return cls.zero(spec)
        return cls(spec, df.encode_ints(vals))

    @classmethod
    def zero(cls, spec: FieldSpec) -> "Poly":
        df = device_field(spec)
        return cls(spec, jnp.zeros((0, df.num_digits), dtype=jnp.uint32), trim=False)

    @classmethod
    def constant(cls, spec: FieldSpec, value: int) -> "Poly":
        return cls.from_ints(spec, [value])

    def _trim(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        nz = np.asarray(jax.device_get(jnp.any(coeffs != 0, axis=-1)))
        if nz.any():
            last = int(np.max(np.nonzero(nz)[0]))
            return coeffs[: last + 1]
        return coeffs[:0]

    # -- basic properties --

    def __len__(self) -> int:
        return int(self.coeffs.shape[0])

    @property
    def degree(self) -> int:
        """arkworks degree(): 0 for the zero polynomial (by convention)."""
        return max(len(self) - 1, 0)

    def is_zero(self) -> bool:
        return len(self) == 0

    def to_ints(self) -> list[int]:
        return self.df.decode_ints(self.coeffs) if len(self) else []

    def __eq__(self, other) -> bool:
        if not isinstance(other, Poly) or len(self) != len(other):
            return False
        if len(self) == 0:
            return True
        return bool(np.asarray(jax.device_get(jnp.all(self.coeffs == other.coeffs))))

    # -- arithmetic --

    def _padded(self, n: int) -> jnp.ndarray:
        if len(self) == n:
            return self.coeffs
        return jnp.pad(self.coeffs, ((0, n - len(self)), (0, 0)))

    def __add__(self, other: "Poly") -> "Poly":
        n = max(len(self), len(other))
        if n == 0:
            return Poly.zero(self.spec)
        return Poly(self.spec, self.df.add(self._padded(n), other._padded(n)))

    def __sub__(self, other: "Poly") -> "Poly":
        n = max(len(self), len(other))
        if n == 0:
            return Poly.zero(self.spec)
        return Poly(self.spec, self.df.sub(self._padded(n), other._padded(n)))

    def __neg__(self) -> "Poly":
        if len(self) == 0:
            return self
        return Poly(self.spec, self.df.neg(self.coeffs), trim=False)

    def scale(self, k: int) -> "Poly":
        """Multiply by a scalar (canonical int)."""
        k = k % self.spec.modulus
        if len(self) == 0 or k == 0:
            return Poly.zero(self.spec)
        kd = self.df.encode_int(k)
        return Poly(self.spec, self.df.mont_mul(self.coeffs, kd), trim=False)

    def __mul__(self, other: "Poly") -> "Poly":
        if len(self) == 0 or len(other) == 0:
            return Poly.zero(self.spec)
        out_len = len(self) + len(other) - 1
        if out_len <= HOST_POLY_MAX:  # small: host schoolbook (latency tier)
            a, b = self.to_ints(), other.to_ints()
            p = self.spec.modulus
            out = [0] * out_len
            for i, ai in enumerate(a):
                for j, bj in enumerate(b):
                    out[i + j] = (out[i + j] + ai * bj) % p
            return Poly.from_ints(self.spec, out)
        dom = get_domain(self.spec, out_len)
        ea = dom.fft(self._padded(dom.size))
        eb = dom.fft(other._padded(dom.size))
        prod = dom.ifft(self.df.mont_mul(ea, eb))
        return Poly(self.spec, prod[:out_len])

    def shift(self, k: int) -> "Poly":
        """Multiply by X^k."""
        if len(self) == 0 or k == 0:
            return self
        pad = jnp.zeros((k, self.df.num_digits), dtype=jnp.uint32)
        return Poly(self.spec, jnp.concatenate([pad, self.coeffs]), trim=False)

    def mul_by_vanishing(self, n: int) -> "Poly":
        """p(X) * (X^n - 1)."""
        return self.shift(n) - self

    def divide_by_vanishing(self, n: int) -> tuple["Poly", "Poly"]:
        """Divide by X^n - 1; returns (quotient, remainder)."""
        L = len(self)
        if L <= n:
            return Poly.zero(self.spec), self
        if L <= HOST_POLY_MAX:  # small: host ints (latency tier)
            p = self.spec.modulus
            c = self.to_ints()
            q = [0] * (L - n)
            for i in range(L - n - 1, -1, -1):
                q[i] = (c[i + n] + (q[i + n] if i + n < L - n else 0)) % p
            r = [(c[i] + (q[i] if i < L - n else 0)) % p for i in range(n)]
            return Poly.from_ints(self.spec, q), Poly.from_ints(self.spec, r)
        qlen = L - n
        nblocks = (qlen + n - 1) // n
        total = nblocks * n
        high = jnp.pad(self.coeffs[n:], ((0, total - qlen), (0, 0)))
        blocks = high.reshape(nblocks, n, self.df.num_digits)
        # suffix cumulative block sum: q_block[j] = sum_{k>=j} p_block[k]
        acc = blocks[-1]
        out = [acc]
        for j in range(nblocks - 2, -1, -1):
            acc = self.df.add(acc, blocks[j])
            out.append(acc)
        q = jnp.stack(list(reversed(out)), axis=0).reshape(total, -1)[:qlen]
        r = self.df.add(self.coeffs[:n], jnp.pad(q, ((0, max(0, n - qlen)), (0, 0)))[:n])
        return Poly(self.spec, q), Poly(self.spec, r)

    def divide_by_linear(self, z: int) -> tuple["Poly", int]:
        """Divide by (X - z); returns (quotient, remainder=p(z))."""
        L = len(self)
        if L == 0:
            return Poly.zero(self.spec), 0
        if L == 1:
            return Poly.zero(self.spec), self.to_ints()[0]
        z = z % self.spec.modulus
        if z == 0:
            rem = self.df.decode_int(self.coeffs[0])
            return Poly(self.spec, self.coeffs[1:]), rem
        if L <= HOST_POLY_MAX:  # small: host synthetic (Ruffini) division
            p = self.spec.modulus
            c = self.to_ints()
            q = [0] * (L - 1)
            acc = c[L - 1]
            for i in range(L - 2, 0, -1):
                q[i] = acc
                acc = (c[i] + z * acc) % p
            q[0] = acc
            rem = (c[0] + z * acc) % p
            return Poly.from_ints(self.spec, q), rem
        spec, df = self.spec, self.df
        # q_i = sum_{j>i} c_j z^{j-i-1} = z^{-(i+1)} * S_i, S_i = sum_{j>i} c_j z^j
        zp = df.powers(z, L)
        cz = df.mont_mul(self.coeffs, zp)  # c_j z^j
        # reverse exclusive cumulative sum (inclusive scan, shifted)
        incl = df.cumsum(cz, axis=0, reverse=True)
        S = jnp.concatenate(
            [incl[1:], jnp.zeros((1, df.num_digits), dtype=jnp.uint32)], axis=0
        )
        zinv = spec.inv(z)
        # zinv^{i+1} = powers(zinv)[i] * zinv
        zip_ = df.mont_mul(df.powers(zinv, L), df.encode_int(zinv))
        q = df.mont_mul(S, zip_)[: L - 1]
        rem = spec.mul(df.decode_int(incl[0]), 1)  # p(z) = S_{-1} = sum c_j z^j
        return Poly(self.spec, q), rem

    def evaluate(self, z: int) -> int:
        z = z % self.spec.modulus
        L = len(self)
        if L == 0:
            return 0
        if L <= 256:
            acc = 0
            for c in reversed(self.to_ints()):
                acc = (acc * z + c) % self.spec.modulus
            return acc
        df = self.df
        terms = df.mont_mul(self.coeffs, df.powers(z, L))
        return df.decode_int(df.sum(terms, axis=0))

    def __repr__(self) -> str:
        return f"Poly({self.spec.name}, deg={'-inf' if self.is_zero() else self.degree}, len={len(self)})"


def poly_from_evals(dom: Radix2Domain, evals: jnp.ndarray) -> Poly:
    """arkworks Evaluations::from_vec_and_domain(...).interpolate()."""
    return Poly(dom.spec, dom.ifft(evals))


def evaluate_many(polys: list[Poly], z: int) -> list[int]:
    """[p(z) for p in polys] with ONE shared power table and one device pass.

    The PLONK rounds 4-5 evaluate ~10 full-size polynomials at zeta
    (plonk/src/prover.rs:156-178, 469-568); evaluating them one-by-one
    rebuilds the z-power table per call.  Batch: one cumprod, one stacked
    multiply, one tree-sum, one host decode.
    """
    if not polys:
        return []
    spec = polys[0].spec
    df = polys[0].df
    L = max(len(p) for p in polys)
    if L == 0:
        return [0] * len(polys)
    if L <= 256:  # latency tier: host Horner
        return [p.evaluate(z) for p in polys]
    zpow = df.powers(z, L)
    stacked = jnp.stack([p._padded(L) for p in polys], axis=0)  # (K, L, D)
    terms = df.mont_mul(stacked, zpow)
    sums = df.sum(terms, axis=1)  # (K, D)
    return df.decode_ints(sums)
