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
    tc = time.time() - t0
    ts = []
    for _ in range(3):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    best = min(ts)
    per = best / REPS
    print(f"{name:28s} N={N} compile={tc:7.2f}s best={per*1e3:8.3f}ms  {N/per/1e6:9.2f} Mops/s")
    return out


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


# 3. jac_add jnp full-width
from zktpu.curves import g1 as g1m

X = rand_fq(N); Y = rand_fq(N); Z = rand_fq(N)
X2 = rand_fq(N); Y2 = rand_fq(N); Z2 = rand_fq(N)


@jax.jit
def chain_add(X, Y, Z, X2, Y2, Z2):
    P = (X, Y, Z)
    for _ in range(REPS):
        P = g1m.jac_add(fqd, P, (X2, Y2, Z2))
    return P


which = sys.argv[2] if len(sys.argv) > 2 else "all"
if which in ("all", "jnp"):
    timeit("mont_mul jnp", chain_jnp, a, b)
if which in ("all", "pallas"):
    timeit("mont_mul pallas", chain_pallas, a, b)
if which in ("all", "add"):
    timeit("jac_add (pallas-mul inside)", chain_add, X, Y, Z, X2, Y2, Z2)
