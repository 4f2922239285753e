"""Profile the RNS field backend vs the digit-Montgomery backend on TPU.

Two measurements:
  mul  — chained Fq muls (jit, device-resident carry between reps) for both
         backends: Mmul/s head-to-head.
  msm  — full Pippenger MSM at --log-n with fq=digit vs fq=rns, same
         window, same (cached) SRS-like points; the RNS run converts the
         cached digit-form affine planes on device first.

Usage: python tools/prof_rns.py [mul|msm|all] [--log-n 20] [--iters 3]
"""
import argparse
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from zktpu.fields.host import FQ, FR
from zktpu.fields.fp import device_field
from zktpu.fields.rns import rns_field


def fetch(x):
    """Tunnel-safe barrier: fetch a real slice (block_until_ready lies)."""
    return np.asarray(jax.device_get(x))


def bench_mul(n=1 << 18, chain=32, iters=3):
    fqd = device_field(FQ)
    rf = rns_field(FQ)
    rng = np.random.default_rng(0)
    vals = [int.from_bytes(rng.bytes(47), "little") % FQ.modulus for _ in range(1024)]
    reps = -(-n // 1024)

    a_d = jnp.tile(fqd.encode_ints(vals), (reps, 1))[:n]
    a_r = jnp.tile(rf.encode_ints(vals), (reps, 1))[:n]

    def chain_digit(a):
        def body(i, x):
            return fqd.mont_mul(x, a)

        return jax.lax.fori_loop(0, chain, body, a)

    def chain_rns(a):
        def body(i, x):
            return rf.mont_mul(x, a)

        return jax.lax.fori_loop(0, chain, body, a)

    for name, fn, arg in (("digit", chain_digit, a_d), ("rns", chain_rns, a_r)):
        f = jax.jit(fn)
        t0 = time.time()
        fetch(f(arg)[:1])
        comp = time.time() - t0
        times = []
        for _ in range(iters):
            t0 = time.time()
            fetch(f(arg)[:1])
            times.append(time.time() - t0)
        best = min(times)
        print(
            f"mul[{name:5s}] N={n} chain={chain} compile={comp:.1f}s "
            f"best={best*1e3:.1f}ms -> {n*chain/best/1e6:.1f} Mmul/s"
        )


def load_points(log_n):
    from zktpu.curves import g1
    from zktpu.curves.host_curve import G1Affine

    n = 1 << log_n
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    pts_file = os.path.join(cache, f"msm_aff_pts_2e{log_n}.npz")
    if os.path.exists(pts_file):
        data = np.load(pts_file)
        return jnp.asarray(data["Xa"]), jnp.asarray(data["Ya"])
    tau = 0x1F3A5
    powers, cur = [], 1
    for _ in range(n):
        powers.append(cur)
        cur = FR.mul(cur, tau)
    step = min(n, 1 << 20)
    xs, ys = [], []
    for i in range(0, n, step):
        P = g1.fixed_base_mul(G1Affine.generator(), powers[i : i + step])
        cXa, cYa = g1.proj_to_affine_dev(P)
        xs.append(np.asarray(cXa))
        ys.append(np.asarray(cYa))
    Xa = jnp.asarray(np.concatenate(xs, axis=0))
    Ya = jnp.asarray(np.concatenate(ys, axis=0))
    np.savez(pts_file, Xa=np.asarray(Xa), Ya=np.asarray(Ya))
    return Xa, Ya


def bench_msm(log_n=20, iters=3, c=None, which=("digit", "rns")):
    from zktpu.curves import g1
    from zktpu.curves.msm import msm_proj, pick_window

    n = 1 << log_n
    c = c or pick_window(n)
    rf = rns_field(FQ)
    fqd = g1.FQD

    rng = np.random.default_rng(12345)
    scalars = [int.from_bytes(rng.bytes(32), "little") % FR.modulus for _ in range(n)]
    sc = g1.scalars_to_u32(scalars)

    t0 = time.time()
    Xa, Ya = load_points(log_n)
    Z1 = jnp.broadcast_to(jnp.asarray(fqd.one_np), Xa.shape)
    print(f"points ready {time.time()-t0:.1f}s")

    # device conversion digit -> RNS (chunked; one-time, cacheable like SRS)
    t0 = time.time()
    conv = jax.jit(rf.from_digit_mont)
    step = 1 << 19
    Xr = jnp.concatenate([conv(Xa[i : i + step]) for i in range(0, n, step)])
    Yr = jnp.concatenate([conv(Ya[i : i + step]) for i in range(0, n, step)])
    Zr = jnp.broadcast_to(jnp.asarray(rf.one_np), (n, rf.num_digits))
    fetch(Xr[:1])
    print(f"rns convert {time.time()-t0:.1f}s")

    runs = {
        "digit": lambda: msm_proj(sc, Xa, Ya, Z1, c=c),
        "rns": lambda: msm_proj(sc, Xr, Yr, Zr, c=c, fq=rf),
    }
    results = {}
    for name in which:
        fn = runs[name]
        t0 = time.time()
        out = fn()
        r0 = fetch(out[0])
        comp = time.time() - t0
        times = []
        for _ in range(iters):
            t0 = time.time()
            fetch(fn()[0])
            times.append(time.time() - t0)
        best = min(times)
        results[name] = out
        print(
            f"msm[{name:5s}] 2^{log_n} c={c} compile={comp:.1f}s "
            f"best={best*1e3:.1f}ms -> {n/best:.0f} points/s"
        )
    if "digit" in results and "rns" in results:
        want = g1.proj_to_affine_host(tuple(a[None] for a in results["digit"]))
        got = results["rns"]
        x, y, z = (rf.decode_ints(a[None, :])[0] for a in got)
        p = FQ.modulus
        zi = pow(z, -1, p)
        from zktpu.curves.host_curve import G1Affine

        assert [G1Affine(x * zi % p, y * zi % p)] == want, "RNS MSM mismatch!"
        print("cross-check OK: rns == digit result")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("what", nargs="?", default="all", choices=["mul", "msm", "all"])
    ap.add_argument("--log-n", type=int, default=20)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--only", type=str, default=None, help="digit|rns")
    args = ap.parse_args()
    if args.what in ("mul", "all"):
        bench_mul(chain=args.chain, iters=args.iters)
    if args.what in ("msm", "all"):
        which = (args.only,) if args.only else ("digit", "rns")
        bench_msm(args.log_n, args.iters, c=args.window, which=which)
