"""Profile MSM component costs on the real TPU: sort/gather vs point-adds.

Usage: python tools/prof_msm.py [log_n] [c]

Times, at the same shapes as one full MSM:
  1. full msm_proj
  2. per-window argsort + point gather only (no adds)
  3. per-window suffix-scan + bucket fold only (no sort: identity order)
so (1) - (2) - (3) ~ residual (Horner doublings, dispatch).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from zktpu.fields.host import FR
from zktpu.curves import g1
from zktpu.curves.g1 import FQD
from zktpu.curves.msm import msm_proj, window_digits
from zktpu.curves.scan import point_blocked_sum, point_suffix_scan_sparse

LOG_N = int(sys.argv[1]) if len(sys.argv) > 1 else 18
C = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N = 1 << LOG_N

rng = np.random.default_rng(7)
scalars = [int.from_bytes(rng.bytes(32), "little") % FR.modulus for _ in range(N)]
sc = g1.scalars_to_u32(scalars)

# points: tile a small random batch (values don't affect op cost)
base = 1024
tau = 0xABCDE
powers, cur = [], 1
for _ in range(base):
    powers.append(cur)
    cur = FR.mul(cur, tau)
X, Y, Z = g1.fixed_base_mul(g1.G1Affine.generator(), powers)
reps = N // base
X, Y, Z = (jnp.tile(a, (reps, 1)) for a in (X, Y, Z))


def fetch(out):
    return np.asarray(jax.device_get(jax.tree.leaves(out)[0]).reshape(-1)[:1])


@jax.jit
def sort_gather_only(sc, X, Y, Z):
    digits = window_digits(sc, C)

    def body(carry, ids):
        order = jnp.argsort(ids)
        # fold gathered points into a cheap checksum so gathers aren't DCE'd
        s = X[order][0] + Y[order][0] + Z[order][0]
        return carry + s[0], None

    tot, _ = jax.lax.scan(body, jnp.uint32(0), digits)
    return tot


@jax.jit
def adds_only(sc, X, Y, Z):
    digits = window_digits(sc, C)

    def body(carry, ids):
        ids_s = ids.astype(jnp.int32)  # unsorted: same op count, no sort
        ks = jnp.arange(1, 1 << C, dtype=jnp.int32)
        starts = jnp.searchsorted(ids_s, ks, side="left").astype(jnp.int32)
        gathered = point_suffix_scan_sparse(FQD, (X, Y, Z), starts)
        pX, pY, pZ = point_blocked_sum(FQD, gathered)
        return carry, (pX, pY, pZ)

    _, partials = jax.lax.scan(body, 0, digits)
    return partials


def timeit(name, fn, *args):
    t0 = time.time()
    out = fn(*args)
    fetch(out)
    tc = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        fetch(out)
        ts.append(time.time() - t0)
    print(f"{name:22s} compile={tc:7.1f}s best={min(ts) * 1e3:9.1f}ms", flush=True)
    return min(ts)


t_full = timeit("full msm", lambda *a: msm_proj(*a, c=C), sc, X, Y, Z)
t_sort = timeit("sort+gather only", sort_gather_only, sc, X, Y, Z)
t_adds = timeit("scan+fold adds only", adds_only, sc, X, Y, Z)

W = -(-256 // C)
n_adds = W * (N * 1.07 + 2 * ((1 << C) - 1))
print(f"n={N} c={C} windows={W}  est adds={n_adds / 1e6:.1f}M")
print(
    f"full={t_full * 1e3:.0f}ms sort={t_sort * 1e3:.0f}ms adds={t_adds * 1e3:.0f}ms "
    f"residual={(t_full - t_sort - t_adds) * 1e3:.0f}ms  "
    f"adds/s={n_adds / t_adds / 1e6:.2f}M  Fqmul/s={12 * n_adds / t_adds / 1e6:.0f}M"
)
