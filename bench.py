"""Headline benchmark: KZG commit (Pippenger MSM) throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no performance numbers at all (BASELINE.md: no
benches/, no criterion dep, no timings in any doc), so vs_baseline chains to
the most recent BENCH_r{N}.json points/s value in-repo (the driver's history
is the only cross-round accounting anchor); 1.0 when no prior round exists.

Config: MSM over N = 2^20 BLS12-381 G1 points (BASELINE.json config #1
scaled up; stretch target 2^22).  Steady-state timing after one compile.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def prev_round_points_per_s() -> float | None:
    """Latest kzg_commit_msm points/s recorded by the driver (BENCH_r{N}.json)."""
    import glob
    import os
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best_n, best_val = -1, None
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                rec = json.load(f)
            parsed = rec.get("parsed") or {}
            if parsed.get("unit") == "points/s" and int(m.group(1)) > best_n:
                best_n, best_val = int(m.group(1)), float(parsed["value"])
        except (OSError, ValueError, KeyError):
            continue
    return best_val


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--log-n", type=int, default=20, help="log2 number of MSM points")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--window", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    def jnp_small():
        return jnp.zeros((8,), jnp.uint32)

    from zktpu.fields.host import FR
    from zktpu.curves import g1
    from zktpu.curves.host_curve import G1Affine
    from zktpu.curves.msm import msm_proj, pick_window

    n = 1 << args.log_n
    c = args.window or pick_window(n)

    rng = np.random.default_rng(12345)
    # random-looking full-width scalars (deterministic)
    scalars = [
        int.from_bytes(rng.bytes(32), "little") % FR.modulus for _ in range(n)
    ]
    # SRS-like points: tau^i * G computed on device via fixed-base windows,
    # batch-normalized (Z = 1) so the cache stores 2 coordinate planes and
    # either MSM path can consume it.  Cached on disk — the points are a
    # deterministic function of (n, tau) and regenerating them costs far
    # more than the benchmark itself.
    import os

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    os.makedirs(cache, exist_ok=True)
    pts_file = os.path.join(cache, f"msm_aff_pts_2e{args.log_n}.npz")
    t0 = time.time()
    if os.path.exists(pts_file):
        data = np.load(pts_file)
        Xa, Ya = (jnp.asarray(data[k]) for k in ("Xa", "Ya"))
    else:
        tau = 0x1F3A5
        powers, cur = [], 1
        for _ in range(n):
            powers.append(cur)
            cur = FR.mul(cur, tau)
        # chunk the fixed-base windows + affine normalization: at 2^22 the
        # full-width table gathers and adds need ~18 GB of padded HBM temps
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
    # coordinate backend: RNS on TPU (config.msm_backend; ~2x the digit
    # path at 2^20 — NOTES_PERF.md round 5), digit elsewhere.
    from zktpu.config import msm_backend

    backend = msm_backend()
    if backend == "rns":
        from zktpu.fields.host import FQ
        from zktpu.fields.rns import rns_field

        rf = rns_field(FQ)
        conv = jax.jit(rf.from_digit_mont)
        step = 1 << 19
        Xa = jnp.concatenate([conv(Xa[i : i + step]) for i in range(0, n, step)])
        Ya = jnp.concatenate([conv(Ya[i : i + step]) for i in range(0, n, step)])
        one_np = rf.one_np
    else:
        rf = None
        one_np = g1.FQD.one_np
    Z1 = jnp.broadcast_to(jnp.asarray(one_np), Xa.shape)
    setup_s = time.time() - t0

    sc = g1.scalars_to_u32(scalars)

    # At 2^22 the single-shot MSM graph needs ~16.7 GB of (lane-padded) HBM
    # — ~1 GB over the chip.  MSM is linear in its inputs: split into 2^21
    # halves and combine the two projective partials (one extra point add).
    half = min(n, 1 << 21)

    def run():
        parts = []
        for i in range(0, n, half):
            parts.append(
                msm_proj(
                    sc[i : i + half],
                    Xa[i : i + half],
                    Ya[i : i + half],
                    Z1[i : i + half],
                    c=c,
                    fq=rf,
                )
            )
        acc = parts[0]
        from zktpu.curves.g1 import proj_add, FQD

        add_fq = rf if rf is not None else FQD
        for p in parts[1:]:
            acc = proj_add(add_fq, tuple(a[None] for a in acc), tuple(a[None] for a in p))
            acc = tuple(a[0] for a in acc)
        # NOTE: block_until_ready is not a reliable barrier through the
        # remote-TPU tunnel; fetching the (tiny) result is.
        return tuple(np.asarray(jax.device_get(a)) for a in acc)

    # tunnel roundtrip baseline
    f0 = jax.jit(lambda v: v + 1)
    _ = np.asarray(jax.device_get(f0(jnp_small())))
    t0 = time.time()
    _ = np.asarray(jax.device_get(f0(jnp_small())))
    rt = time.time() - t0

    t0 = time.time()
    out = run()
    compile_s = time.time() - t0

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        run()
        times.append(time.time() - t0)
    best = max(min(times) - rt, 1e-9)
    pps = n / best

    print(
        f"# msm 2^{args.log_n} c={c} backend={jax.devices()[0].platform}/{backend} "
        f"setup={setup_s:.1f}s compile={compile_s:.1f}s best={best * 1e3:.1f}ms",
        file=sys.stderr,
    )
    prev = prev_round_points_per_s()
    print(
        json.dumps(
            {
                "metric": f"kzg_commit_msm_points_per_s_2e{args.log_n}",
                "value": round(pps, 1),
                "unit": "points/s",
                "vs_baseline": round(pps / prev, 3) if prev else 1.0,
            }
        )
    )


if __name__ == "__main__":
    main()
