"""Microbenchmark candidate Montgomery-mul kernel structures on the real TPU.

Each variant runs CHAIN chained muls inside ONE pallas kernel (VMEM-resident)
so the number measures compute, not HBM round-trips or launch overhead.

Variants:
  base   — RowOps.mul as shipped (u32 schoolbook-16 + KS carries)
  mxu    — const convolutions (x pinv mod R, x p) as bf16 MXU matmuls
  f32    — variable conv as 8-bit-block f32 FMA accumulation + mxu const convs

Usage: python tools/prof_mulkernels.py [N] [variant...]
"""
import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from zktpu.fields.host import FQ
from zktpu.fields.fp import device_field
from zktpu.fields.pallas_mont import (
    RowOps,
    row_consts,
    _carry_rows,
    _digits,
    TILE,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
CHAIN = int(__import__("os").environ.get("CHAIN", 12))
variants = sys.argv[2:] or ["base", "mxu"]

fqd = device_field(FQ)
rng = np.random.default_rng(0)


def rand_fq(n):
    vals = [int.from_bytes(rng.bytes(47), "little") % FQ.modulus for _ in range(min(n, 1024))]
    base = fqd.encode_ints(vals)
    reps = -(-n // base.shape[0])
    return jnp.tile(base, (reps, 1))[:n]


# ---------------------------------------------------------------- matrices
def _digits8(value: int, n8: int) -> np.ndarray:
    return np.array([(value >> (8 * i)) & 0xFF for i in range(n8)], dtype=np.int64)


def _true_idx(D: int) -> np.ndarray:
    """Block-order row r -> true 8-bit digit index (lo block then hi block)."""
    t = np.zeros(2 * D, dtype=np.int64)
    t[:D] = 2 * np.arange(D)
    t[D:] = 2 * np.arange(D) + 1
    return t


def const_matmats(spec):
    """(4, S, 2D) bf16 matrices: pinv_A, pinv_B (S=D), p_A, p_B (S=2D) padded."""
    D = spec.num_digits
    t = _true_idx(D)
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
    # stack into one operand, padded to (4, 2D, 2D)
    out = np.zeros((4, 2 * D, 2 * D), dtype=np.float32)
    out[0, :D] = pinv_A
    out[1, :D] = pinv_B
    out[2] = p_A
    out[3] = p_B
    return out


class RowOpsMXU(RowOps):
    """RowOps with the two constant convolutions on the MXU (bf16 matmuls)."""

    def __init__(self, spec, consts_dt, mats):
        super().__init__(spec, consts_dt)
        self.m_pinv_A = mats[0, : self.D].astype(jnp.bfloat16)
        self.m_pinv_B = mats[1, : self.D].astype(jnp.bfloat16)
        self.m_p_A = mats[2].astype(jnp.bfloat16)
        self.m_p_B = mats[3].astype(jnp.bfloat16)

    def _to8(self, x16):
        """(D, T) u32 16-bit digits -> (2D, T) bf16 8-bit block-order digits."""
        x8 = jnp.concatenate([x16 & jnp.uint32(0xFF), x16 >> 8], axis=0)
        # Mosaic has no u32->bf16 cast; go via int32 -> float32 -> bf16
        return x8.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    def _const_mat(self, x16, A, B):
        """cols16[s] = sum_r (A[s,r] + 256*B[s,r]) * x8[r]   (exact)."""
        x8 = self._to8(x16)
        ca = jnp.dot(A, x8, preferred_element_type=jnp.float32)
        cb = jnp.dot(B, x8, preferred_element_type=jnp.float32)
        cai = ca.astype(jnp.int32).astype(jnp.uint32)
        cbi = cb.astype(jnp.int32).astype(jnp.uint32)
        return cai + (cbi << 8)

    def mul(self, a, b):
        D = self.D
        cols = self.conv_full(a, b)
        t_lo, _ = _carry_rows(cols[:D], D)
        m_cols = self._const_mat(t_lo, self.m_pinv_A, self.m_pinv_B)
        m, _ = _carry_rows(m_cols, D)
        mp_cols = self._const_mat(m, self.m_p_A, self.m_p_B)
        _, c_low_total = _carry_rows(cols[:D] + mp_cols[:D], D)
        hi = cols[D:] + mp_cols[D:]
        hi = jnp.concatenate([hi[0:1] + c_low_total[None, :], hi[1:]], axis=0)
        res, carry_top = _carry_rows(hi, D)
        return self.cond_sub_p(res, carry_top)


class RowOpsF32(RowOpsMXU):
    """MXU const convs + variable conv as 8-bit-block f32 products."""

    def conv_full(self, a, b):
        D = self.D
        alo = (a & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32)
        ahi = (a >> 8).astype(jnp.int32).astype(jnp.float32)
        blo = (b & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32)
        bhi = (b >> 8).astype(jnp.int32).astype(jnp.float32)
        T = a.shape[1]

        def pad_at(x, start, total):
            parts = []
            if start:
                parts.append(jnp.zeros((start, T), jnp.float32))
            parts.append(x)
            tail = total - start - x.shape[0]
            if tail:
                parts.append(jnp.zeros((tail, T), jnp.float32))
            return jnp.concatenate(parts, axis=0) if len(parts) > 1 else x

        # accA: ll at offset j, hh at offset j+1 (weight 1)
        # accB: lh + hl at offset j (weight 256)
        accA = jnp.zeros((2 * D, T), jnp.float32)
        accB = jnp.zeros((2 * D, T), jnp.float32)
        for j in range(D):
            pll = alo * blo[j : j + 1]
            phh = ahi * bhi[j : j + 1]
            px = alo * bhi[j : j + 1] + ahi * blo[j : j + 1]
            accA = accA + pad_at(pll, j, 2 * D) + pad_at(phh, j + 1, 2 * D)
            accB = accB + pad_at(px, j, 2 * D)
        return accA.astype(jnp.int32).astype(jnp.uint32) + (
            accB.astype(jnp.int32).astype(jnp.uint32) << 8
        )


# ---------------------------------------------------------------- harness
def make_chain(variant, n_tiles):
    D = FQ.num_digits
    consts = row_consts(FQ)
    mats = const_matmats(FQ)

    def kernel(const_ref, mat_ref, a_ref, b_ref, out_ref):
        if variant == "base":
            ops = RowOps(FQ, const_ref[:].T)
        elif variant == "mxu":
            ops = RowOpsMXU(FQ, const_ref[:].T, mat_ref[:])
        elif variant == "f32":
            ops = RowOpsF32(FQ, const_ref[:].T, mat_ref[:])
        else:
            raise ValueError(variant)
        a = a_ref[:].T
        b = b_ref[:].T
        for _ in range(CHAIN):
            a = ops.mul(a, b)
        out_ref[:] = a.T

    D2 = 2 * D
    call = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, D2, D2), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE, D), jnp.uint32),
    )

    @jax.jit
    def run(a, b):
        return call(consts, mats, a, b)

    return run


def main():
    a = rand_fq(N)
    b = rand_fq(N)
    n_tiles = N // TILE
    ref = None
    for v in variants:
        fn = make_chain(v, n_tiles)
        t0 = time.time()
        out = jax.block_until_ready(fn(a, b))
        tc = time.time() - t0
        ts = []
        for _ in range(3):
            t0 = time.time()
            out = fn(a, b)
            np.asarray(jax.device_get(out[:1]))
            ts.append(time.time() - t0)
        best = min(ts) / CHAIN
        ok = ""
        got = np.asarray(jax.device_get(out))
        if ref is None:
            ref = got
        else:
            ok = "MATCH" if np.array_equal(ref, got) else "** MISMATCH **"
        print(
            f"{v:6s} N={N} compile={tc:6.1f}s  {best*1e3:7.3f} ms/mul  "
            f"{N/best/1e6:8.2f} Mmul/s  {ok}",
            flush=True,
        )


if __name__ == "__main__":
    main()
