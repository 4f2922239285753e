"""Scratch: profile field/point primitive throughput on the real TPU."""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from zktpu.fields.host import FQ, FR
from zktpu.fields.fp import device_field

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 16
REPS = 8

fqd = device_field(FQ)
rng = np.random.default_rng(0)


def rand_fq(n):
    vals = [int.from_bytes(rng.bytes(47), "little") % FQ.modulus for _ in range(min(n, 1024))]
    base = fqd.encode_ints(vals)
    reps = -(-n // base.shape[0])
    return jnp.tile(base, (reps, 1))[:n]


a = rand_fq(N)
b = rand_fq(N)


def timeit(name, fn, *args):
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    # fetch tiny slice to force full completion through the tunnel
    np.asarray(jax.device_get(jax.tree.leaves(out)[0][:1]))
    tc = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree.leaves(out)[0][:1]))
        ts.append(time.time() - t0)
    best = min(ts)
    per = best / REPS
    print(f"{name:34s} N={N} compile={tc:7.2f}s best={per*1e3:8.3f}ms  {N/per/1e6:9.3f} Mops/s", flush=True)
    return out


which = sys.argv[2] if len(sys.argv) > 2 else "all"

# 1. jnp mont_mul (REPS chained muls inside one jit)
@jax.jit
def chain_jnp(a, b):
    x = a
    for _ in range(REPS):
        x = fqd._mont_mul_jnp(x, b)
    return x


# 2. pallas mont_mul
from zktpu.fields.pallas_mont import mont_mul_pallas


@jax.jit
def chain_pallas(a, b):
    x = a
    for _ in range(REPS):
        x = mont_mul_pallas(FQ, x, b)
    return x


# 3. fused projective add kernel
from zktpu.curves import g1 as g1m
from zktpu.curves.pallas_g1 import proj_add_pallas

X = rand_fq(N); Y = rand_fq(N); Z = rand_fq(N)
X2 = rand_fq(N); Y2 = rand_fq(N); Z2 = rand_fq(N)


@jax.jit
def chain_add(X, Y, Z, X2, Y2, Z2):
    P = (X, Y, Z)
    for _ in range(REPS):
        P = proj_add_pallas(FQ, P, (X2, Y2, Z2))
    return P


# 4. gather + sort (the non-arithmetic parts of a Pippenger window)
@jax.jit
def chain_sortgather(ids, X):
    for _ in range(REPS):
        order = jnp.argsort(ids)
        X = X[order]
        ids = ids + 1
    return X

if which in ("all", "jnp"):
    timeit("mont_mul jnp", chain_jnp, a, b)
if which in ("all", "pallas"):
    timeit("mont_mul pallas", chain_pallas, a, b)
if which in ("all", "add"):
    timeit("proj_add pallas fused", chain_add, X, Y, Z, X2, Y2, Z2)
if which in ("all", "sort"):
    ids = jnp.asarray(rng.integers(0, 1 << 13, size=N, dtype=np.int32))
    timeit("argsort+gather (24-digit x3)", chain_sortgather, ids, jnp.concatenate([X, Y, Z], axis=1))
