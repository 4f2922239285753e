"""Compile-light batched point reductions and scans.

The round-1 MSM used a Blelloch scan and halving tree-sums whose levels were
unrolled into the XLA graph: every level instantiated a fresh copy of the
~16-field-mul point addition, so one MSM graph carried ~50 distinct
point-add subgraphs (20+ minutes of XLA/Mosaic compile on both CPU and TPU).

These helpers express the same O(N) work with a *constant* number of
point-add instances by blocking: reshape (N,) -> (G, K), run the sequential
K-step loop as a `lax.fori_loop` whose body contains exactly one point-add
(width G), recurse on the G row-totals, and apply one broadcast add.  Work is
~2N adds for the scan and ~N for the sum; graph size is O(log_K N) add
instances.  Sequential depth is K * ceil(log_K N), which at K=16..32 keeps
the VPU batch width >= N/K on the dominant level.

All functions take/return projective point batches as (X, Y, Z) tuples of
(..., D) uint32 digit arrays.  The group identity is (0, 1, 0) — NOT the
all-zero triple (which the complete formulas absorb) — so padding uses
``_pad_identity`` rather than jnp.pad.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..fields.fp import DeviceField


def _add(fq, P, Q):
    from .g1 import proj_add

    return proj_add(fq, P, Q)


def _identity_rows(fq, n: int):
    """(0 : 1 : 0) rows in fq's own representation (digit or RNS layout)."""
    z = jnp.zeros((n, fq.num_digits), dtype=jnp.uint32)
    one = jnp.broadcast_to(jnp.asarray(fq.one_np), (n, fq.num_digits))
    return z, one, z


def _pad_identity(fq, P, target: int):
    n = P[0].shape[0]
    if n == target:
        return P
    idr = _identity_rows(fq, target - n)
    return tuple(jnp.concatenate([a, i], axis=0) for a, i in zip(P, idr))


def point_blocked_sum(fq: DeviceField, P, K: int = 16):
    """Sum of a (N, D) point batch -> (D,) triple.

    fori_loop accumulation over K-element blocks (one add instance per
    level), ~N + N/K + ... total adds, ceil(log_K N) levels.
    """
    n = P[0].shape[0]
    while n > 1:
        if n <= K:
            # final tail: fold sequentially at width 1 via fori_loop
            rest = tuple(a[1:][:, None, :] for a in P)  # (n-1, 1, D)
            stacked = jnp.stack(rest, axis=1)  # (n-1, 3, 1, D)

            def tail(i, acc):
                q = (stacked[i, 0], stacked[i, 1], stacked[i, 2])
                return _add(fq, acc, q)

            acc0 = tuple(a[0:1] for a in P)
            out = jax.lax.fori_loop(0, n - 1, tail, acc0)
            return tuple(a[0] for a in out)
        g = -(-n // K)
        P = _pad_identity(fq, P, g * K)
        blocks = tuple(a.reshape(g, K, -1) for a in P)

        def body(k, acc):
            cur = tuple(a[:, k] for a in blocks)
            return _add(fq, acc, cur)

        acc0 = tuple(a[:, 0] for a in blocks)
        P = jax.lax.fori_loop(1, K, body, acc0)
        n = g
    return tuple(a[0] for a in P)


def point_suffix_scan_sparse(fq: DeviceField, P, idx, K: int = 16):
    """T[idx] where T[i] = sum_{j>=i} P[j], for a (M,) int32 index vector.

    Like point_suffix_scan but skips the full-width broadcast phase: after
    the within-block suffix scans (N adds) and the recursive scan of block
    totals (~2N/K adds), the block-suffix correction is added only at the M
    gathered positions (M adds) — ~1.1N + M total adds instead of ~2N + M.
    This is the Pippenger inner loop's shape: M = 2^c - 1 bucket starts.

    idx entries equal to N (empty suffix) return the group identity.
    """
    n = P[0].shape[0]
    g = -(-n // K)
    Pp = _pad_identity(fq, P, g * K)
    x = tuple(a.reshape(g, K, -1) for a in Pp)  # (G, K, D)

    # phase 1: within-block suffix scan, sequential over K (reverse order)
    def body(i, state):
        carry, out = state
        t = K - 2 - i
        cur = tuple(a[:, t] for a in x)
        carry = _add(fq, carry, cur)
        out = tuple(
            jax.lax.dynamic_update_slice(o, c[:, None], (0, t, 0))
            for o, c in zip(out, carry)
        )
        return carry, out

    carry0 = tuple(a[:, K - 1] for a in x)
    row_tot, S = jax.lax.fori_loop(0, K - 1, body, (carry0, x))
    S_flat = tuple(a.reshape(g * K, -1) for a in S)

    # phase 2: suffix-scan the G block totals, shift to exclusive
    R = point_suffix_scan(fq, row_tot, K)  # (G, D) inclusive
    idr = _identity_rows(fq, 1)
    Rx = tuple(jnp.concatenate([r[1:], i], axis=0) for r, i in zip(R, idr))

    # phase 3: correction only at the gathered positions
    idx = idx.astype(jnp.int32)
    valid = (idx < n)[:, None]
    idx_c = jnp.minimum(idx, n - 1)
    gathered = _add(
        fq,
        tuple(a[idx_c] for a in S_flat),
        tuple(r[idx_c // K] for r in Rx),
    )
    ident = _identity_rows(fq, idx.shape[0])
    return tuple(jnp.where(valid, a, i) for a, i in zip(gathered, ident))


def point_suffix_scan_sparse_affine(fq: DeviceField, A, idx, K: int = 16):
    """Affine-input variant of point_suffix_scan_sparse.

    A = (Xa, Ya) is a batch of AFFINE points ((N, D) Montgomery digit
    arrays), the identity encoded as (0, 0) — which is also what zero
    padding produces, so pad rows are handled for free.  Phase 1's
    sequential in-block adds become MIXED additions (proj carry + affine
    original point, 11M instead of 12M — g1.proj_madd); phases 2-3 operate
    on the projective partials exactly as the projective variant.
    """
    from .g1 import proj_madd, affine_to_proj

    Xa, Ya = A
    n = Xa.shape[0]
    g = -(-n // K)
    if g * K != n:
        pad = g * K - n
        Xa = jnp.pad(Xa, ((0, pad), (0, 0)))
        Ya = jnp.pad(Ya, ((0, pad), (0, 0)))
    xb = Xa.reshape(g, K, -1)
    yb = Ya.reshape(g, K, -1)

    # Only block-column K-1 survives the loop unwritten, so lift just those
    # G points to projective (selects over (G, D), not (N, D)) and start
    # from zeroed output buffers — positions 0..K-2 are all overwritten.
    xl, yl = xb[:, K - 1], yb[:, K - 1]
    inf = jnp.logical_and(fq.is_zero(xl), fq.is_zero(yl))
    carry0 = affine_to_proj(xl, yl, inf)
    x = tuple(
        jax.lax.dynamic_update_slice(
            jnp.zeros((g, K, xb.shape[-1]), jnp.uint32), c[:, None], (0, K - 1, 0)
        )
        for c in carry0
    )

    # phase 1: within-block suffix scan; carry is projective, cur affine
    def body(i, state):
        carry, out = state
        t = K - 2 - i
        cur = (xb[:, t], yb[:, t])
        carry = proj_madd(fq, carry, cur)
        out = tuple(
            jax.lax.dynamic_update_slice(o, c[:, None], (0, t, 0))
            for o, c in zip(out, carry)
        )
        return carry, out

    row_tot, S = jax.lax.fori_loop(0, K - 1, body, (carry0, x))
    S_flat = tuple(a.reshape(g * K, -1) for a in S)

    # phase 2: suffix-scan the G block totals, shift to exclusive
    R = point_suffix_scan(fq, row_tot, K)
    idr = _identity_rows(fq, 1)
    Rx = tuple(jnp.concatenate([r[1:], i], axis=0) for r, i in zip(R, idr))

    # phase 3: correction only at the gathered positions
    idx = idx.astype(jnp.int32)
    valid = (idx < n)[:, None]
    idx_c = jnp.minimum(idx, n - 1)
    gathered = _add(
        fq,
        tuple(a[idx_c] for a in S_flat),
        tuple(r[idx_c // K] for r in Rx),
    )
    ident = _identity_rows(fq, idx.shape[0])
    return tuple(jnp.where(valid, a, i) for a, i in zip(gathered, ident))


def point_suffix_scan(fq: DeviceField, P, K: int = 16):
    """Inclusive suffix scan T[i] = sum_{j>=i} P[j] over a (N, D) point batch.

    Blocked two-phase scan: per-block sequential suffix (fori_loop, one add
    instance), recursive scan of block totals, one broadcast add.  ~2N adds,
    O(log_K N) add instances in the graph.
    """
    n = P[0].shape[0]
    if n <= K:
        # sequential suffix scan at tiny width
        def body(i, state):
            carry, out = state
            t = n - 2 - i
            cur = tuple(a[t][None] for a in P)
            carry = _add(fq, carry, cur)
            out = tuple(
                jax.lax.dynamic_update_slice(o, c, (t, 0))
                for o, c in zip(out, carry)
            )
            return carry, out

        carry0 = tuple(a[n - 1 :] for a in P)
        out0 = tuple(jnp.asarray(a) for a in P)
        _, out = jax.lax.fori_loop(0, n - 1, body, (carry0, out0))
        return out

    g = -(-n // K)
    Pp = _pad_identity(fq, P, g * K)
    x = tuple(a.reshape(g, K, -1) for a in Pp)  # (G, K, D)

    # phase 1: within-block suffix scan, sequential over K (reverse order)
    def body(i, state):
        carry, out = state
        t = K - 2 - i
        cur = tuple(a[:, t] for a in x)
        carry = _add(fq, carry, cur)
        out = tuple(
            jax.lax.dynamic_update_slice(o, c[:, None], (0, t, 0))
            for o, c in zip(out, carry)
        )
        return carry, out

    carry0 = tuple(a[:, K - 1] for a in x)
    out0 = x
    row_tot, S = jax.lax.fori_loop(0, K - 1, body, (carry0, out0))

    # phase 2: suffix-scan the G block totals, shift to exclusive
    R = point_suffix_scan(fq, row_tot, K)  # (G, D) inclusive
    idr = _identity_rows(fq, 1)
    Rx = tuple(
        jnp.concatenate([r[1:], i], axis=0) for r, i in zip(R, idr)
    )  # exclusive: identity at last block

    # phase 3: broadcast add of the exclusive block suffix
    T = _add(fq, S, tuple(r[:, None, :] for r in Rx))
    return tuple(a.reshape(g * K, -1)[:n] for a in T)
