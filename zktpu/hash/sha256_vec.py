"""Vectorized single-block SHA-256 for bulk Merkle hashing on TPU.

The reference hashes every Merkle leaf/node as SHA256(decimal_string(x))
(fri/src/hasher.rs:14-36).  Goldilocks decimals are <= 20 chars and pair
concatenations <= 40 chars, so every tree hash fits one 64-byte SHA block:

  host (numpy): u64 -> decimal digits (vectorized divmod), padded block build
  device (jnp): 64-round SHA-256 compression over uint32 lanes
  device: digest -> field element (from_le_bytes_mod_order) via limb folding

This is the TPU replacement for the reference's per-leaf `sha2` calls in
fri/src/merkle_tree.rs:42-62.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.host import GOLDILOCKS, FieldSpec
from ..fields.fp import device_field, ints_to_digits

_K = np.array(
    [
        0x428A2F98, 0x71374491, 0xB5C0FBCF, 0xE9B5DBA5, 0x3956C25B, 0x59F111F1,
        0x923F82A4, 0xAB1C5ED5, 0xD807AA98, 0x12835B01, 0x243185BE, 0x550C7DC3,
        0x72BE5D74, 0x80DEB1FE, 0x9BDC06A7, 0xC19BF174, 0xE49B69C1, 0xEFBE4786,
        0x0FC19DC6, 0x240CA1CC, 0x2DE92C6F, 0x4A7484AA, 0x5CB0A9DC, 0x76F988DA,
        0x983E5152, 0xA831C66D, 0xB00327C8, 0xBF597FC7, 0xC6E00BF3, 0xD5A79147,
        0x06CA6351, 0x14292967, 0x27B70A85, 0x2E1B2138, 0x4D2C6DFC, 0x53380D13,
        0x650A7354, 0x766A0ABB, 0x81C2C92E, 0x92722C85, 0xA2BFE8A1, 0xA81A664B,
        0xC24B8B70, 0xC76C51A3, 0xD192E819, 0xD6990624, 0xF40E3585, 0x106AA070,
        0x19A4C116, 0x1E376C08, 0x2748774C, 0x34B0BCB5, 0x391C0CB3, 0x4ED8AA4A,
        0x5B9CCA4F, 0x682E6FF3, 0x748F82EE, 0x78A5636F, 0x84C87814, 0x8CC70208,
        0x90BEFFFA, 0xA4506CEB, 0xBEF9A3F7, 0xC67178F2,
    ],
    dtype=np.uint32,
)

_H0 = np.array(
    [0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A, 0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19],
    dtype=np.uint32,
)


def _rotr(x, n):
    return (x >> n) | (x << (32 - n))


@jax.jit
def sha256_single_block(words: jnp.ndarray) -> jnp.ndarray:
    """words: (N, 16) uint32 big-endian message words -> (N, 8) digest words.

    The message schedule is unrolled (pure dataflow); the 64 compression
    rounds run under lax.fori_loop — one round body in the graph instead of
    64 copies, which compiles ~3x faster and sidesteps an XLA:CPU codegen
    hang observed with the fully unrolled form on some hosts.
    """
    n = words.shape[0]
    w = [words[:, i] for i in range(16)]
    for t in range(16, 64):
        s0 = _rotr(w[t - 15], 7) ^ _rotr(w[t - 15], 18) ^ (w[t - 15] >> 3)
        s1 = _rotr(w[t - 2], 17) ^ _rotr(w[t - 2], 19) ^ (w[t - 2] >> 10)
        w.append(w[t - 16] + s0 + w[t - 7] + s1)
    W = jnp.stack(w, axis=0)  # (64, N)
    K = jnp.asarray(_K)  # (64,)
    # derive the initial state from the input so the fori_loop carry keeps
    # the input's varying-axes type under shard_map (zktpu/dist/fri.py)
    zero = jnp.zeros_like(words[:, 0])
    state0 = tuple(jnp.uint32(int(v)) + zero for v in _H0)

    def round_body(t, st):
        a, b, c, d, e, f, g, h = st
        S1 = _rotr(e, 6) ^ _rotr(e, 11) ^ _rotr(e, 25)
        ch = (e & f) ^ (~e & g)
        t1 = h + S1 + ch + K[t] + W[t]
        S0 = _rotr(a, 2) ^ _rotr(a, 13) ^ _rotr(a, 22)
        maj = (a & b) ^ (a & c) ^ (b & c)
        return (t1 + S0 + maj, a, b, c, d + t1, e, f, g)

    st = jax.lax.fori_loop(0, 64, round_body, state0)
    return jnp.stack([o + jnp.uint32(int(v)) for o, v in zip(st, _H0)], axis=1)


def _decimal_digits(vals: np.ndarray, max_digits: int = 20):
    """u64 array -> (digits lsd-first (N, max_digits), lengths (N,))."""
    vals = vals.astype(np.uint64)
    digits = np.zeros((len(vals), max_digits), dtype=np.uint8)
    tmp = vals.copy()
    for k in range(max_digits):
        digits[:, k] = (tmp % np.uint64(10)).astype(np.uint8)
        tmp //= np.uint64(10)
    lengths = np.full(len(vals), 1, dtype=np.int64)
    nz = np.argmax(digits[:, ::-1] != 0, axis=1)  # idx of msd from top
    has = (vals != 0)
    lengths[has] = max_digits - nz[has]
    return digits, lengths


def _place_decimal(bytes_mat, rows, digits, lengths, offsets):
    """Scatter ASCII digits of each value at byte offset `offsets`."""
    max_digits = digits.shape[1]
    for k in range(max_digits):
        mask = k < lengths
        cols = offsets + lengths - 1 - k
        bytes_mat[rows[mask], cols[mask]] = 48 + digits[mask, k]


def _finalize_blocks(bytes_mat, total_len):
    n = bytes_mat.shape[0]
    rows = np.arange(n)
    bytes_mat[rows, total_len] = 0x80
    bitlen = (total_len * 8).astype(np.uint64)
    for i in range(8):
        bytes_mat[:, 56 + i] = ((bitlen >> np.uint64(8 * (7 - i))) & np.uint64(0xFF)).astype(np.uint8)
    words = (
        bytes_mat[:, 0::4].astype(np.uint32) << 24
        | bytes_mat[:, 1::4].astype(np.uint32) << 16
        | bytes_mat[:, 2::4].astype(np.uint32) << 8
        | bytes_mat[:, 3::4].astype(np.uint32)
    )
    return words  # (N, 16)


def _blocks_single(vals: np.ndarray) -> np.ndarray:
    n = len(vals)
    mat = np.zeros((n, 64), dtype=np.uint8)
    digits, lengths = _decimal_digits(vals)
    _place_decimal(mat, np.arange(n), digits, lengths, np.zeros(n, dtype=np.int64))
    return _finalize_blocks(mat, lengths)


def _blocks_pairs(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    n = len(a)
    mat = np.zeros((n, 64), dtype=np.uint8)
    da, la = _decimal_digits(a)
    db, lb = _decimal_digits(b)
    rows = np.arange(n)
    _place_decimal(mat, rows, da, la, np.zeros(n, dtype=np.int64))
    _place_decimal(mat, rows, db, lb, la)
    return _finalize_blocks(mat, la + lb)


_CHUNK = 4096


@functools.lru_cache(maxsize=4)
def _fold_constants(spec: FieldSpec):
    df = device_field(spec)
    consts = [spec.to_mont(pow(2, 32 * i, spec.modulus)) for i in range(8)]
    # keep as numpy: a jnp array materialized during a traced first call
    # would leak that trace's tracer into the lru cache (multiple distinct
    # jits call this — the single-chip hasher and the shard_map'd one)
    return df, np.asarray(ints_to_digits(consts, df.num_digits), dtype=np.uint32)


def _digest_to_field_traced(spec: FieldSpec, digest: jnp.ndarray) -> jnp.ndarray:
    """digest (N, 8) BE words -> canonical field digit array (N, D).

    from_le_bytes_mod_order: value = sum_i byteswap32(h_i) * 2^(32 i) mod p.
    """
    df, consts = _fold_constants(spec)
    sw = (
        (digest & 0xFF) << 24
        | ((digest >> 8) & 0xFF) << 16
        | ((digest >> 16) & 0xFF) << 8
        | (digest >> 24)
    )
    D = df.num_digits
    raw = jnp.zeros(sw.shape + (D,), dtype=jnp.uint32)
    raw = raw.at[..., 0].set(sw & 0xFFFF)
    raw = raw.at[..., 1].set(sw >> 16)
    mont = df.to_mont(raw)  # (N, 8, D)
    terms = df.mont_mul(mont, consts)  # broadcast (8, D)
    acc = df.sum(terms, axis=1)
    return df.from_mont(acc)


@functools.lru_cache(maxsize=4)
def _sha_to_field_jit(spec: FieldSpec):
    @jax.jit
    def run(words):
        return _digest_to_field_traced(spec, sha256_single_block(words))

    return run


def _hash_blocks_to_u64(spec: FieldSpec, words_np: np.ndarray) -> np.ndarray:
    """(N, 16) message words -> canonical u64 field values, in fixed-size
    device chunks so exactly one kernel shape is ever compiled."""
    n = words_np.shape[0]
    fn = _sha_to_field_jit(spec)
    total = ((n + _CHUNK - 1) // _CHUNK) * _CHUNK
    if total != n:
        words_np = np.pad(words_np, ((0, total - n), (0, 0)))
    outs = []
    for i in range(0, total, _CHUNK):
        outs.append(np.asarray(jax.device_get(fn(jnp.asarray(words_np[i : i + _CHUNK])))))
    v = np.concatenate(outs, axis=0)[:n].astype(np.uint64)
    return v[:, 0] | v[:, 1] << np.uint64(16) | v[:, 2] << np.uint64(32) | v[:, 3] << np.uint64(48)


def hash_elems_vec(spec: FieldSpec, values) -> list[int]:
    """Vectorized hash(x) for each x (Goldilocks fast path)."""
    if spec is not GOLDILOCKS:
        from .host_hash import hash_elem

        return [hash_elem(spec, v) for v in values]
    vals = np.array([int(v) for v in values], dtype=np.uint64)
    words = _blocks_single(vals)
    return [int(x) for x in _hash_blocks_to_u64(spec, words)]


def hash_pairs_vec(spec: FieldSpec, level) -> list[int]:
    """Vectorized hash_slice([a, b]) over consecutive pairs of `level`."""
    if spec is not GOLDILOCKS:
        from .host_hash import hash_slice

        return [hash_slice(spec, level[i : i + 2]) for i in range(0, len(level), 2)]
    arr = np.array([int(v) for v in level], dtype=np.uint64)
    a, b = arr[0::2], arr[1::2]
    words = _blocks_pairs(a, b)
    return [int(x) for x in _hash_blocks_to_u64(spec, words)]
