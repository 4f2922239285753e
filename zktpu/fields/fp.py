"""Device (TPU) prime-field arithmetic: vectorized multi-limb Montgomery.

Representation
--------------
A field element is a vector of ``D`` base-2^16 digits stored little-endian in a
``uint32`` array of shape ``(..., D)``; elements are kept in Montgomery form
(``stored = a * R mod p`` with ``R = 2^(16 D)``), canonical (every digit
< 2^16 and the represented integer < p).

Why 16-bit digits in uint32 lanes: the TPU VPU has native 32-bit integer
multiply; 16x16 -> 32-bit products never overflow, and column sums of a
schoolbook product stay far below 2^32 (bounded by ``2 D * 2^16``), so the
whole multiplier runs in exact uint32 arithmetic with no 64-bit emulation.
This replaces the arkworks 64-bit-limb Montgomery backend used throughout the
reference (e.g. kzg/src/scheme.rs, plonk/src/prover.rs) with a formulation
that vectorizes across the batch dimension on the 8x128 VPU.

All public ops are shape-polymorphic over leading axes and jit-compatible.
"""
from __future__ import annotations

import functools
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .host import FieldSpec

_U32 = jnp.uint32
_MASK = np.uint32(0xFFFF)


def _spec_digits(value: int, num_digits: int) -> np.ndarray:
    return np.array(
        [(value >> (16 * i)) & 0xFFFF for i in range(num_digits)], dtype=np.uint32
    )


def ints_to_digits(values, num_digits: int) -> np.ndarray:
    """Host conversion: iterable of python ints -> (N, D) uint32 digit array."""
    if isinstance(values, np.ndarray) and values.dtype == np.uint64:
        # fast vectorized path (Goldilocks-sized values)
        out = np.zeros(values.shape + (num_digits,), dtype=np.uint32)
        for i in range(min(num_digits, 4)):
            out[..., i] = ((values >> np.uint64(16 * i)) & np.uint64(0xFFFF)).astype(
                np.uint32
            )
        return out
    values = list(values)
    if not values:
        return np.zeros((0, num_digits), dtype=np.uint32)
    # single to_bytes per int + one frombuffer beats a per-digit python loop
    # by ~20x at 2^20 elements
    nbytes = 2 * num_digits
    buf = b"".join(int(v).to_bytes(nbytes, "little") for v in values)
    u16 = np.frombuffer(buf, dtype="<u2").reshape(len(values), num_digits)
    return u16.astype(np.uint32)


def digits_to_ints(digits: np.ndarray) -> list[int]:
    flat = np.ascontiguousarray(
        np.asarray(digits, dtype=np.uint32).reshape(-1, digits.shape[-1]).astype("<u2")
    )
    nbytes = 2 * flat.shape[-1]
    buf = flat.tobytes()
    return [
        int.from_bytes(buf[i * nbytes : (i + 1) * nbytes], "little")
        for i in range(flat.shape[0])
    ]


def _shift_digits(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """Shift toward higher digit indices by d (zero fill), same width."""
    pad = jnp.zeros(x.shape[:-1] + (d,), x.dtype)
    return jnp.concatenate([pad, x[..., :-d]], axis=-1)


def _ks_resolve(v: jnp.ndarray):
    """Resolve values v (each < 2^17) into base-2^16 digits via Kogge-Stone
    carry-lookahead: log-depth instead of a sequential ripple, which keeps
    XLA graphs small (compile time) and the dependency chain shallow.

    Returns (digits (..., K) uint32, value-at-top-after-carry (...,) uint32).
    """
    K = v.shape[-1]
    g = v >> 16 != 0  # generate (binary: v < 2^17)
    p = (v & _MASK) == _MASK  # propagate
    G, Pp = g, p
    d = 1
    while d < K:
        G = G | (Pp & _shift_digits(G, d))
        Pp = Pp & _shift_digits(Pp, d)
        d *= 2
    carry_in = _shift_digits(G, 1).astype(_U32)
    out = v + carry_in
    return out & _MASK, out[..., -1] >> 0


def _carry_digits(cols: jnp.ndarray, num_out: int):
    """Exact carry propagation: column sums (< 2^31 - slack) -> base-2^16 digits.

    Returns (digits: (..., num_out) uint32, carry_out: (...,) uint32).
    Two-phase: fold the multi-bit column carries once (after which every value
    is < 2^17), then resolve the remaining binary carries in log depth.
    """
    k_in = cols.shape[-1]
    assert k_in <= num_out, (k_in, num_out)
    W = num_out + 1
    if k_in < W:
        cols = jnp.pad(cols, [(0, 0)] * (cols.ndim - 1) + [(0, W - k_in)])
    d = cols & _MASK
    c = cols >> 16
    v = d + _shift_digits(c, 1)  # each < 2^17
    digits, top = _ks_resolve(v)
    return digits[..., :num_out], top


class DeviceField:
    """Per-field vectorized arithmetic over uint32 digit arrays."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        D = spec.num_digits
        self.num_digits = D
        p = spec.modulus
        self._p_np = _spec_digits(p, D)
        self._pinv_np = _spec_digits(spec.mont_pinv_full, D)
        self._r2_np = _spec_digits(spec.mont_r2, D)
        self._r_minus_p_np = _spec_digits(spec.mont_r - p, D)
        self._one_raw_np = _spec_digits(1, D)
        # frequently used montgomery constants
        self.zero_np = np.zeros(D, dtype=np.uint32)
        self.one_np = _spec_digits(spec.to_mont(1), D)

    # -- low-level building blocks (pure jnp, safe under jit) --

    def _antidiag_sums(self, M: jnp.ndarray) -> jnp.ndarray:
        """Anti-diagonal sums of (..., D, D): out[k] = sum_{i+j=k} M[i, j].

        Uses the skewed-reshape trick: pad rows to width 2D, flatten, pad the
        tail to (D+1)*(2D-1) and reshape to (D+1, 2D-1) — element (i, j) lands
        in column (i*2D + j) mod (2D-1) = i+j, so a single axis-sum yields all
        2D-1 anti-diagonals.  ~6 tensor ops instead of O(D) slice-updates.
        """
        D = self.num_digits
        lead = M.shape[:-2]
        Mp = jnp.pad(M, [(0, 0)] * len(lead) + [(0, 0), (0, D)])
        flat = Mp.reshape(lead + (2 * D * D,))
        flat = jnp.pad(flat, [(0, 0)] * len(lead) + [(0, D - 1)])
        skew = flat.reshape(lead + (D + 1, 2 * D - 1))
        return jnp.sum(skew, axis=-2, dtype=_U32)

    def _conv_full(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Schoolbook product columns of two D-digit numbers -> (..., 2D) uint32."""
        D = self.num_digits
        prod = a[..., :, None] * jnp.asarray(b, _U32)[..., None, :]  # (..., D, D)
        clo = self._antidiag_sums(prod & _MASK)  # (..., 2D-1)
        chi = self._antidiag_sums(prod >> 16)
        pad_spec = [(0, 0)] * (clo.ndim - 1)
        cols = jnp.pad(clo, pad_spec + [(0, 1)]) + jnp.pad(chi, pad_spec + [(1, 0)])
        return cols

    def _conv_low(self, a: jnp.ndarray, b_const: np.ndarray) -> jnp.ndarray:
        """Low D columns of a * b_const (b constant digits)."""
        D = self.num_digits
        return self._conv_full(a, jnp.asarray(b_const, _U32))[..., :D]

    def _sub_digits(self, a: jnp.ndarray, b) -> tuple[jnp.ndarray, jnp.ndarray]:
        """a - b over D digits; returns (result mod R, borrow_out in {0,1})."""
        b = jnp.asarray(b, _U32)
        # two's complement: a + (R-1 - b) + 1; all lanes < 2^17
        v = a + (jnp.asarray(_MASK, _U32) - b)
        v = v.at[..., 0].add(1)
        digits, top = _ks_resolve(v)
        carry_out = top >> 16  # 1 iff a >= b
        return digits, (1 - carry_out).astype(_U32)

    def _add_digits(self, a: jnp.ndarray, b) -> tuple[jnp.ndarray, jnp.ndarray]:
        v = a + jnp.asarray(b, _U32)  # each < 2^17
        digits, top = _ks_resolve(v)
        return digits, top >> 16

    def _cond_sub_p(self, a: jnp.ndarray, carry_top: jnp.ndarray) -> jnp.ndarray:
        """Reduce value = carry_top * R + a (< 2p) into [0, p)."""
        d, borrow = self._sub_digits(a, self._p_np)
        e, _ = self._add_digits(a, self._r_minus_p_np)
        ge_p = (borrow == 0)[..., None]
        res = jnp.where(ge_p, d, a)
        return jnp.where((carry_top > 0)[..., None], e, res)

    # -- public vectorized ops --

    # -- eager-call dispatch with shape bucketing ------------------------------
    #
    # The limb kernels are hundreds of primitive ops, so eager op-by-op
    # dispatch would dominate runtime; jitting per exact shape would instead
    # trigger a compile for every distinct polynomial length.  Eager calls are
    # therefore flattened to (N, D), padded to a power-of-two bucket and run
    # through a per-(op, bucket) jitted kernel (persistently cached on disk).
    # Calls made while tracing (inside an outer jit, e.g. the NTT) inline the
    # raw implementation: the enclosing jit already amortizes dispatch.

    @staticmethod
    def _is_traced(*arrays) -> bool:
        return any(isinstance(x, jax.core.Tracer) for x in arrays)

    @functools.cached_property
    def _bucketed_kernels(self):
        return {}

    def _dispatch2(self, name: str, impl, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        if self._is_traced(a, b):
            return impl(a, b)
        D = self.num_digits
        shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, shape + (D,)).reshape(-1, D)
        b = jnp.broadcast_to(b, shape + (D,)).reshape(-1, D)
        n = a.shape[0]
        bucket = max(16, 1 << (n - 1).bit_length()) if n else 16
        key = (name, bucket)
        fn = self._bucketed_kernels.get(key)
        if fn is None:
            fn = jax.jit(impl)
            self._bucketed_kernels[key] = fn
        if n != bucket:
            pad = ((0, bucket - n), (0, 0))
            a = jnp.pad(a, pad)
            b = jnp.pad(b, pad)
        out = fn(a, b)
        return out[:n].reshape(shape + (D,))

    def mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product: returns a*b*R^{-1} mod p, canonical digits."""
        return self._dispatch2("mul", self._mont_mul, a, b)

    def _mont_mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        from ..config import PALLAS_MIN_BATCH, pallas_enabled

        if pallas_enabled():
            batch = 1
            for s in jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]):
                batch *= s
            if batch >= PALLAS_MIN_BATCH:
                from .pallas_mont import mont_mul_pallas

                return mont_mul_pallas(self.spec, a, b)
        return self._mont_mul_jnp(a, b)

    def _mont_mul_jnp(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        D = self.num_digits
        cols = self._conv_full(a, b)
        # exact low-half digits of T
        t_lo, c_lo = _carry_digits(cols[..., :D], D)
        # m = (T mod R) * (-p^{-1}) mod R
        m_cols = self._conv_low(t_lo, self._pinv_np)
        m, _ = _carry_digits(m_cols, D)
        # T + m*p: low half becomes 0 mod R; we need its carry-out.
        mp_cols = self._conv_full(m, self._p_np)
        _, c_low_total = _carry_digits(cols[..., :D] + mp_cols[..., :D], D)
        hi_cols = cols[..., D:] + mp_cols[..., D:]
        hi_cols = hi_cols.at[..., 0].add(c_low_total)
        res, carry_top = _carry_digits(hi_cols, D)
        return self._cond_sub_p(res, carry_top)

    def mont_sqr(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, a)

    def _add_impl(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        s, carry = self._add_digits(a, b)
        return self._cond_sub_p(s, carry)

    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self._dispatch2("add", self._add_impl, a, b)

    def _sub_impl(self, a, b):
        a, b = jnp.broadcast_arrays(a, b)
        d, borrow = self._sub_digits(a, b)
        dp, _ = self._add_digits(d, self._p_np)
        return jnp.where((borrow > 0)[..., None], dp, d)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return self._dispatch2("sub", self._sub_impl, a, b)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        zero = jnp.zeros_like(a)
        return self.sub(zero, a)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    def select(self, cond: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.where(cond[..., None], a, b)

    def to_mont(self, raw: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(raw, jnp.asarray(self._r2_np))

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mont_mul(a, jnp.asarray(self._one_raw_np))

    def double(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.add(a, a)

    def sum(self, a: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
        """Field sum along `axis` via binary tree reduction (log depth)."""
        a = jnp.moveaxis(a, axis, 0)
        n = a.shape[0]
        while n > 1:
            half = n // 2
            lo = a[:half]
            hi = a[half : 2 * half]
            s = self.add(lo, hi)
            if n % 2:
                s = jnp.concatenate([s, a[2 * half : 2 * half + 1]], axis=0)
            a = s
            n = a.shape[0]
        return a[0]

    def _hillis_steele(self, op, a: jnp.ndarray, identity_row: np.ndarray, axis: int, reverse: bool) -> jnp.ndarray:
        """Inclusive scan via log-depth doubling.

        Unlike jax.lax.associative_scan (which unrolls ~2N combiner calls into
        the graph — prohibitive when the combiner is a several-hundred-op limb
        multiply), this emits only ceil(log2 N) vectorized combiner calls.
        """
        a = jnp.moveaxis(a, axis, 0)
        if reverse:
            a = jnp.flip(a, axis=0)
        n = a.shape[0]
        ident = jnp.broadcast_to(jnp.asarray(identity_row), a.shape[1:])
        d = 1
        while d < n:
            shifted = jnp.concatenate(
                [jnp.broadcast_to(ident[None], (d,) + a.shape[1:]), a[:-d]], axis=0
            )
            a = op(a, shifted)
            d *= 2
        if reverse:
            a = jnp.flip(a, axis=0)
        return jnp.moveaxis(a, 0, axis)

    def cumprod(self, a: jnp.ndarray, axis: int = 0, reverse: bool = False) -> jnp.ndarray:
        """Inclusive cumulative field product (log-depth doubling scan)."""
        return self._hillis_steele(self.mont_mul, a, self.one_np, axis, reverse)

    def cumsum(self, a: jnp.ndarray, axis: int = 0, reverse: bool = False) -> jnp.ndarray:
        return self._hillis_steele(self.add, a, self.zero_np, axis, reverse)

    def powers(self, base: int, count: int) -> jnp.ndarray:
        """[1, z, z^2, ..., z^{count-1}] as (count, D) Montgomery digits.

        Log-depth device cumprod — replaces O(count) host bignum loops when
        building power tables (offset powers, evaluation tables, SRS powers).
        """
        base = int(base) % self.spec.modulus
        if count <= 0:
            return jnp.zeros((0, self.num_digits), dtype=jnp.uint32)
        g = self.encode_int(base)
        arr = jnp.broadcast_to(g, (count, self.num_digits))
        arr = jnp.concatenate([jnp.asarray(self.one_np)[None], arr[:-1]], axis=0)
        return self.cumprod(arr, axis=0)

    def to_u32_limbs(self, mont_digits: jnp.ndarray) -> jnp.ndarray:
        """(..., D) Montgomery digits -> (..., D/2) canonical little-endian
        u32 limbs, entirely on device (MSM scalar format)."""
        raw = self.from_mont(mont_digits)
        return raw[..., 0::2] | (raw[..., 1::2] << 16)

    def batch_inv(self, a: jnp.ndarray, host_inv) -> jnp.ndarray:
        """Montgomery-trick batch inversion over the leading axis.

        `host_inv` is a callback (int -> int) used once to invert the total
        product on host (canonical ints).  Raises ZeroDivisionError via the
        callback if the total product is zero; individual zeros propagate NaN-
        like garbage, so callers must ensure nonzero inputs.
        """
        flat = a.reshape(-1, self.num_digits)
        prefix = self.cumprod(flat, axis=0)  # P_i = a_0 ... a_i
        suffix = self.cumprod(flat, axis=0, reverse=True)  # S_i = a_i ... a_{n-1}
        total = prefix[-1]
        total_int = self.digits_to_int_host(total)
        inv_total_int = host_inv(total_int)
        inv_total = jnp.asarray(
            _spec_digits(self.spec.to_mont(inv_total_int), self.num_digits)
        )
        n = flat.shape[0]
        # inv(a_i) = P_{i-1} * S_{i+1} * inv_total
        ones = jnp.asarray(self.one_np)[None]
        p_left = jnp.concatenate([ones, prefix[:-1]], axis=0)
        s_right = jnp.concatenate([suffix[1:], ones], axis=0)
        out = self.mont_mul(self.mont_mul(p_left, s_right), inv_total)
        return out.reshape(a.shape)

    # -- host/device conversion helpers --

    def encode_ints(self, values) -> jnp.ndarray:
        """Canonical python ints -> Montgomery digit device array."""
        spec = self.spec
        mont = [spec.to_mont(int(v) % spec.modulus) for v in values]
        return jnp.asarray(ints_to_digits(mont, self.num_digits))

    def encode_int(self, value: int) -> jnp.ndarray:
        return self.encode_ints([value])[0]

    def decode_ints(self, arr: jnp.ndarray) -> list[int]:
        """Montgomery digit array -> canonical python ints (host sync)."""
        raw = np.asarray(jax.device_get(arr))
        rinv = pow(self.spec.mont_r, -1, self.spec.modulus)
        vals = digits_to_ints(raw)
        from ..profiling import debug_enabled

        if debug_enabled():
            # sanitizer: device kernels must hand back in-range digits and
            # fully reduced (< p) Montgomery representatives
            assert raw.size == 0 or int(raw.max()) < (1 << 16), (
                f"ZKTPU_DEBUG: digit overflow in decode_ints "
                f"(max={int(raw.max()):#x}, digits are 16-bit)"
            )
            for i, v in enumerate(vals):
                assert 0 <= v < self.spec.modulus, (
                    f"ZKTPU_DEBUG: unreduced Montgomery value at [{i}]: {v:#x}"
                )
        return [(v * rinv) % self.spec.modulus for v in vals]

    def decode_int(self, arr: jnp.ndarray) -> int:
        return self.decode_ints(arr.reshape(1, -1))[0]

    def digits_to_int_host(self, arr: jnp.ndarray) -> int:
        """Digit array (still Montgomery) -> canonical int."""
        return self.decode_int(arr)


@functools.lru_cache(maxsize=None)
def device_field(spec: FieldSpec) -> DeviceField:
    return DeviceField(spec)
