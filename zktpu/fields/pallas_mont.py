"""Pallas TPU kernels for batched Montgomery field arithmetic.

One fused VMEM-resident kernel per batch tile replaces the ~150-op XLA graph
of DeviceField._mont_mul (zktpu/fields/fp.py): the (N, D, D) partial-product
intermediates never touch HBM, so the op becomes compute-bound on the VPU
instead of HBM-bandwidth-bound.

Layout: HBM arrays are (N, D) little-endian base-2^16 digits in uint32.  The
kernels transpose each (T, D) tile to (D, T) so the batch rides the 128-wide
lane axis and digit shifts are cheap sublane slices.  The algorithm is the
same exact-arithmetic Montgomery reduction as the jnp path (schoolbook
columns split lo16/hi16, Kogge-Stone carry resolve, m = t*(-p^-1) mod R,
t + m*p, conditional subtract), so outputs are bit-identical.

``RowOps`` packages the in-kernel building blocks (mul/add/sub/select over
(D, T) row-major digit planes) so larger fused kernels — the complete-
projective point kernels in zktpu/curves/pallas_g1.py — can compose whole
group-law formulas inside a single VMEM region.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .host import FieldSpec

_MASK = np.uint32(0xFFFF)
TILE = 256  # batch elements per grid step


def _digits(value: int, n: int) -> list[int]:
    return [(value >> (16 * i)) & 0xFFFF for i in range(n)]


def _shift_rows(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift rows toward higher indices by k (zero fill), same row count."""
    if k == 0:
        return x
    pad = jnp.zeros((k,) + x.shape[1:], x.dtype)
    return jnp.concatenate([pad, x[: x.shape[0] - k]], axis=0)


def _ks_resolve_rows(v: jnp.ndarray):
    """Row-axis Kogge-Stone carry resolve; v rows each < 2^17.

    Returns (digits, top_row_value) — the row-axis twin of fp._ks_resolve.
    """
    K = v.shape[0]
    # 0/1 uint32 flags (bool vectors trip Mosaic's vreg bitcasts)
    G = v >> 16  # generate: v >= 2^16 (v < 2^17 so this is 0/1)
    P = ((v & _MASK) + 1) >> 16  # propagate: low half == 0xFFFF
    d = 1
    while d < K:
        G = G | (P & _shift_rows(G, d))
        P = P & _shift_rows(P, d)
        d *= 2
    out = v + _shift_rows(G, 1)
    return out & _MASK, out[K - 1 : K][0]


def _carry_rows(cols: jnp.ndarray, num_out: int):
    """Exact carry propagation of column sums (< 2^31) into 2^16 digits."""
    k_in = cols.shape[0]
    W = num_out + 1
    if k_in < W:
        cols = jnp.concatenate(
            [cols, jnp.zeros((W - k_in,) + cols.shape[1:], cols.dtype)], axis=0
        )
    d = cols & _MASK
    c = cols >> 16
    v = d + _shift_rows(c, 1)
    digits, top = _ks_resolve_rows(v)
    return digits[:num_out], top


def _pad_rows_at(x, start, total):
    """Place x's rows at [start, start+rows) within `total` rows."""
    rows = x.shape[0]
    parts = []
    if start:
        parts.append(jnp.zeros((start,) + x.shape[1:], x.dtype))
    parts.append(x)
    tail = total - start - rows
    if tail:
        parts.append(jnp.zeros((tail,) + x.shape[1:], x.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else x


def row_consts(spec: FieldSpec) -> np.ndarray:
    """Host-side (3, D) constant block every row-ops kernel takes as input.

    Pallas kernels may not capture array constants, so the three per-field
    digit vectors used by carry logic (0xFFFF - p, R - p, p) ride in as a
    tiny extra operand; scalar digit constants (p, -p^-1) are baked into the
    instruction stream instead.
    """
    D = spec.num_digits
    p_digits = _digits(spec.modulus, D)
    return np.stack(
        [
            np.array([0xFFFF - d for d in p_digits], dtype=np.uint32),
            np.array(_digits(spec.mont_r - spec.modulus, D), dtype=np.uint32),
            np.array(p_digits, dtype=np.uint32),
        ]
    )


# ---------------------------------------------------------------------------
# MXU offload of the two CONSTANT convolutions inside a Montgomery product
# (x * (-p^-1) mod R and m * p).  An 8-bit digit split makes them exact bf16
# matmuls: block-order 8-bit digits (<= 255, bf16-exact) contracted against
# constant matrices whose entries are 8-bit digits of the constant; products
# are <= 16 bits, f32 MXU accumulation of <= 2D of them stays below 2^24, so
# the systolic array computes the integer convolution exactly.  Measured
# +15% on the fused mul chain at 2^18 (tools/prof_mulkernels.py) vs the
# all-VPU path, with bit-identical outputs.

MXU_MIN_DIGITS = 16  # tiny fields (Goldilocks D=4) stay on the VPU path


def use_mxu_consts(spec: FieldSpec) -> bool:
    return spec.num_digits >= MXU_MIN_DIGITS


def _digits8(value: int, n8: int) -> np.ndarray:
    return np.array([(value >> (8 * i)) & 0xFF for i in range(n8)], dtype=np.int64)


def mont_matmats(spec: FieldSpec) -> np.ndarray:
    """(4, 2D, 2D) f32 constant matrices for the MXU const-conv path.

    Rows r index BLOCK-ORDER 8-bit input digits (lo block then hi block,
    true index t_r = 2r for r < D else 2(r-D)+1); output row s is the s-th
    16-bit column; matrices A carry the weight-1 (even true col 2s) digit
    products and B the weight-256 (odd true col 2s+1) ones:
        cols16[s] = (A @ x8)[s] + 256 * (B @ x8)[s].
    Layout: [0]=pinv_A (rows <D), [1]=pinv_B, [2]=p_A, [3]=p_B.
    """
    D = spec.num_digits
    t = np.zeros(2 * D, dtype=np.int64)
    t[:D] = 2 * np.arange(D)
    t[D:] = 2 * np.arange(D) + 1
    pinv8 = _digits8(spec.mont_pinv_full, 2 * D)
    p8 = _digits8(spec.modulus, 2 * D)

    def build(dig8, S):
        A = np.zeros((S, 2 * D), dtype=np.float32)
        B = np.zeros((S, 2 * D), dtype=np.float32)
        for s in range(S):
            for r in range(2 * D):
                ia = 2 * s - t[r]
                ib = 2 * s + 1 - t[r]
                if 0 <= ia < 2 * D:
                    A[s, r] = dig8[ia]
                if 0 <= ib < 2 * D:
                    B[s, r] = dig8[ib]
        return A, B

    pinv_A, pinv_B = build(pinv8, D)
    p_A, p_B = build(p8, 2 * D)
    out = np.zeros((4, 2 * D, 2 * D), dtype=np.float32)
    out[0, :D] = pinv_A
    out[1, :D] = pinv_B
    out[2] = p_A
    out[3] = p_B
    return out


class RowOps:
    """In-kernel field ops over (D, T) row-major digit planes.

    All methods trace plain jnp ops valid inside a Pallas kernel body.
    Construct INSIDE the kernel with ``RowOps(spec, consts_ref[:].T)`` where
    the consts operand is ``row_consts(spec)``.
    """

    def __init__(self, spec: FieldSpec, consts_dt: jnp.ndarray, mats=None):
        self.spec = spec
        D = spec.num_digits
        self.D = D
        self.p_digits = _digits(spec.modulus, D)
        self.pinv_digits = _digits(spec.mont_pinv_full, D)
        # consts_dt: (D, 3) — columns are [0xFFFF - p, R - p, p]
        self.c_mask_minus_p = consts_dt[:, 0:1]
        self.c_rmp = consts_dt[:, 1:2]
        self.c_p = consts_dt[:, 2:3]
        # mats: (4, 2D, 2D) mont_matmats block -> MXU const-conv path in mul
        if mats is not None:
            self.m_pinv_A = mats[0, :D].astype(jnp.bfloat16)
            self.m_pinv_B = mats[1, :D].astype(jnp.bfloat16)
            self.m_p_A = mats[2].astype(jnp.bfloat16)
            self.m_p_B = mats[3].astype(jnp.bfloat16)
        else:
            self.m_pinv_A = None

    # -- structural helpers ------------------------------------------------

    def conv_full(self, a, b):
        """Schoolbook product columns of a (D,T) x b (D,T) -> (2D, T) sums."""
        D = self.D
        acc = None
        for j in range(D):
            prod = a * b[j : j + 1, :]
            lo = _pad_rows_at(prod & _MASK, j, 2 * D)
            hi = _pad_rows_at(prod >> 16, j + 1, 2 * D)
            term = lo + hi
            acc = term if acc is None else acc + term
        return acc

    def conv_const_low(self, a, const_digits):
        """Low D columns of a (D,T) x constant."""
        D = self.D
        T = a.shape[1]
        acc = jnp.zeros((D, T), jnp.uint32)
        for j in range(D):
            cj = const_digits[j]
            if cj == 0:
                continue
            prod = a * np.uint32(cj)
            acc = acc + _pad_rows_at((prod & _MASK)[: D - j], j, D)
            if j + 1 < D:
                acc = acc + _pad_rows_at((prod >> 16)[: D - j - 1], j + 1, D)
        return acc

    def conv_const_full(self, a, const_digits):
        D = self.D
        T = a.shape[1]
        acc = jnp.zeros((2 * D, T), jnp.uint32)
        for j in range(D):
            cj = const_digits[j]
            if cj == 0:
                continue
            prod = a * np.uint32(cj)
            acc = acc + _pad_rows_at(prod & _MASK, j, 2 * D)
            acc = acc + _pad_rows_at(prod >> 16, j + 1, 2 * D)
        return acc

    def cond_sub_p(self, a, carry_top):
        """Reduce carry_top * R + a (< 2p) into [0, p)."""
        # a - p via two's complement rows
        v = a + self.c_mask_minus_p
        v = jnp.concatenate([v[0:1] + 1, v[1:]], axis=0)
        d, top = _ks_resolve_rows(v)
        ge_p = (top >> 16) > 0  # no borrow -> a >= p
        e_v = a + self.c_rmp
        e, _ = _ks_resolve_rows(e_v)
        res = jnp.where(ge_p[None, :], d, a)
        return jnp.where((carry_top > 0)[None, :], e, res)

    # -- field ops -----------------------------------------------------------

    def _to8(self, x16):
        """(D, T) u32 16-bit digits -> (2D, T) bf16 block-order 8-bit digits."""
        x8 = jnp.concatenate([x16 & jnp.uint32(0xFF), x16 >> 8], axis=0)
        # Mosaic has no u32->bf16 cast; go via int32 -> float32 -> bf16
        return x8.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    def _const_mxu(self, x16, A, B):
        """Exact const-conv on the MXU: cols16 = (A @ x8) + 256*(B @ x8)."""
        x8 = self._to8(x16)
        ca = jnp.dot(A, x8, preferred_element_type=jnp.float32)
        cb = jnp.dot(B, x8, preferred_element_type=jnp.float32)
        return ca.astype(jnp.int32).astype(jnp.uint32) + (
            cb.astype(jnp.int32).astype(jnp.uint32) << 8
        )

    def mul(self, a, b):
        """Montgomery product over (D, T) planes: a*b*R^-1 mod p."""
        D = self.D
        cols = self.conv_full(a, b)
        t_lo, _ = _carry_rows(cols[:D], D)
        if self.m_pinv_A is not None:
            m_cols = self._const_mxu(t_lo, self.m_pinv_A, self.m_pinv_B)
        else:
            m_cols = self.conv_const_low(t_lo, self.pinv_digits)
        m, _ = _carry_rows(m_cols, D)
        if self.m_pinv_A is not None:
            mp_cols = self._const_mxu(m, self.m_p_A, self.m_p_B)
        else:
            mp_cols = self.conv_const_full(m, self.p_digits)
        _, c_low_total = _carry_rows(cols[:D] + mp_cols[:D], D)
        hi = cols[D:] + mp_cols[D:]
        hi = jnp.concatenate([hi[0:1] + c_low_total[None, :], hi[1:]], axis=0)
        res, carry_top = _carry_rows(hi, D)
        return self.cond_sub_p(res, carry_top)

    def sqr(self, a):
        return self.mul(a, a)

    def add(self, a, b):
        v = a + b  # digits < 2^16 each -> rows < 2^17
        digits, top = _ks_resolve_rows(v)
        return self.cond_sub_p(digits, top >> 16)

    def sub(self, a, b):
        # a + (R-1 - b) + 1 over rows; borrow -> add p back
        v = a + (jnp.asarray(_MASK, jnp.uint32) - b)
        v = jnp.concatenate([v[0:1] + 1, v[1:]], axis=0)
        d, top = _ks_resolve_rows(v)
        no_borrow = (top >> 16) > 0
        vp = d + self.c_p
        dp, _ = _ks_resolve_rows(vp)
        return jnp.where(no_borrow[None, :], d, dp)

    def dbl(self, a):
        return self.add(a, a)

    def is_zero(self, a):
        """(D, T) -> (1, T) bool: all digits zero.

        int32 reduction: Mosaic has no unsigned reductions; digit rows are
        < 2^16 so the D-row sum fits int32 exactly."""
        return jnp.sum(a.astype(jnp.int32), axis=0, keepdims=True) == 0

    def select(self, cond_row, a, b):
        """cond_row: (1, T) bool; broadcasts over rows."""
        return jnp.where(cond_row, a, b)


def inputs_vma(*arrays) -> frozenset:
    """Union of the mesh axes the inputs vary over (shard_map varying-axes).

    pallas_call out_shapes must carry the same `vma` as the inputs when traced
    inside `jax.shard_map` with vma checking on; outside shard_map this is the
    empty set and the out_shape is built without a vma annotation."""
    vma: frozenset = frozenset()
    for a in arrays:
        try:
            vma = vma | jax.typeof(a).vma
        except Exception:
            pass
    return vma


def _sds(shape, vma: frozenset):
    if vma:
        return jax.ShapeDtypeStruct(shape, jnp.uint32, vma=vma)
    return jax.ShapeDtypeStruct(shape, jnp.uint32)


@functools.lru_cache(maxsize=None)
def _mont_mul_call(spec: FieldSpec, n_tiles: int, interpret: bool, vma: frozenset = frozenset()):
    # DIGIT-MAJOR boundary layout: operands cross the pallas boundary as
    # (D, N) so the 128-lane minor dim is the batch (no padding) instead of
    # the D digits (which XLA pads to 128 — an 8x HBM blowup for D=16 that
    # OOMed the 2^18-gate PLONK quotient).  Bonus: the kernel body needs no
    # transposes — blocks arrive in the (D, T) orientation RowOps wants.
    D = spec.num_digits
    consts = row_consts(spec)
    mxu = use_mxu_consts(spec)
    mats = mont_matmats(spec) if mxu else None

    def kernel(const_ref, mat_ref, a_ref, b_ref, out_ref):
        ops = RowOps(spec, const_ref[:].T, mat_ref[:] if mxu else None)
        out_ref[:] = ops.mul(a_ref[:], b_ref[:])

    mat_shape = (4, 2 * D, 2 * D) if mxu else (1, 1, 1)
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mat_shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=_sds((D, n_tiles * TILE), vma),
        interpret=interpret,
    )

    if mats is None:
        mats = np.zeros((1, 1, 1), dtype=np.float32)

    # keep consts as numpy: a jnp array materialized during a traced first
    # call would leak that trace's tracer into the lru_cached closure
    def run(a_dt, b_dt):
        c, m = consts, mats
        if vma:  # under shard_map all pallas inputs must share the varying axes
            c = jax.lax.pvary(jnp.asarray(c), tuple(vma))
            m = jax.lax.pvary(jnp.asarray(m), tuple(vma))
        return call(c, m, a_dt, b_dt)

    return run


# Max rows a single pallas call sees.  The custom-call's operand layout pads
# the D-lane minor dim to 128 (8x HBM expansion for D=16, 5.3x for D=24): a
# 2^24-row Fr multiply — e.g. the PLONK quotient's batched coset NTT at
# 2^18 gates — would need 3 x 8 GB of padded temps and OOM the 16 GB chip.
# Chunking bounds the padded transient to ~3 x 512 MB while leaving the
# unpadded arrays packed outside the kernel.
MAX_ROWS = 1 << 21


def mont_mul_pallas(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched Montgomery product via the fused kernel.

    a, b: (..., D) uint32 digit arrays (broadcastable); returns broadcast shape.
    """
    D = spec.num_digits
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (D,)).reshape(-1, D)
    b = jnp.broadcast_to(b, shape + (D,)).reshape(-1, D)
    n = a.shape[0]
    if n > MAX_ROWS:
        outs = [
            mont_mul_pallas(spec, a[i : i + MAX_ROWS], b[i : i + MAX_ROWS], interpret)
            for i in range(0, n, MAX_ROWS)
        ]
        return jnp.concatenate(outs, axis=0).reshape(shape + (D,))
    n_tiles = max(1, -(-n // TILE))
    padded = n_tiles * TILE
    if padded != n:
        a = jnp.pad(a, ((0, padded - n), (0, 0)))
        b = jnp.pad(b, ((0, padded - n), (0, 0)))
    out = _mont_mul_call(spec, n_tiles, interpret, inputs_vma(a, b))(a.T, b.T)
    return out.T[:n].reshape(shape + (D,))
