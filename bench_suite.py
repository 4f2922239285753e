"""BASELINE measurement matrix (BASELINE.md configs #1-#5).

Each subcommand measures one config and prints ONE JSON line in the bench.py
format.  `--all` runs every config.  The headline driver metric stays in
bench.py (MSM); this suite covers the rest of the matrix:

  ntt    — NTT butterflies/s over BLS12-381 Fr at 2^20 (north-star metric)
  plonk  — PLONK prove + verify wall time at 2^14 gates (config #3),
           with the per-round prover breakdown printed to stderr
  fri    — FRI commit + query phases over a 2^12-point Goldilocks domain
           (config #2)
  nova   — 64 IVC folding steps of the x^3+x+5 R1CS (config #4)
  kzg    — KZG commit+open+verify at degree 2^10 (config #1)

The reference publishes no numbers (BASELINE.md), so vs_baseline is reported
against the prior round's recorded value when one exists, else 1.0.
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def _emit(metric: str, value: float, unit: str, extra: str = "") -> None:
    import jax

    print(f"# {metric} backend={jax.devices()[0].platform} {extra}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": unit,
                "vs_baseline": 1.0,
            }
        ),
        flush=True,
    )


def bench_ntt(log_n: int = 20, iters: int = 3) -> None:
    import jax
    import numpy as np

    from zktpu.fields.host import FR
    from zktpu.fields.fp import device_field
    from zktpu.poly.domain import get_domain

    n = 1 << log_n
    frd = device_field(FR)
    dom = get_domain(FR, n)
    rng = np.random.default_rng(0)
    vals = frd.to_mont(
        jax.numpy.asarray(
            rng.integers(0, 1 << 16, size=(n, frd.num_digits), dtype=np.uint64).astype(
                np.uint32
            )
        )
    )
    t0 = time.time()
    out = dom.fft(vals, force_device=True)
    np.asarray(jax.device_get(out[:1]))
    compile_s = time.time() - t0
    times = []
    for _ in range(iters):
        t0 = time.time()
        out = dom.fft(vals, force_device=True)
        np.asarray(jax.device_get(out[:1]))
        times.append(time.time() - t0)
    best = min(times)
    butterflies = n // 2 * log_n
    _emit(
        f"ntt_fr_butterflies_per_s_2e{log_n}",
        butterflies / best,
        "butterflies/s",
        f"compile={compile_s:.1f}s best={best * 1e3:.1f}ms",
    )


def bench_plonk(log_n: int = 14) -> None:
    from zktpu.kzg import Srs
    from zktpu.plonk.prover import generate_proof
    from zktpu.plonk.synthetic import synthetic_mul_chain
    from zktpu.plonk.verifier import verify
    from zktpu.transcript.chacha import StdRng

    t0 = time.time()
    circuit = synthetic_mul_chain(log_n, seed=1)
    compile_circuit_s = time.time() - t0
    t0 = time.time()
    srs = Srs.new_from_secret(0x5EED, circuit.size)
    srs_s = time.time() - t0
    if log_n >= 19:
        import jax as _jax

        if _jax.default_backend() == "tpu":
            # big circuits are HBM-bound: build the RNS commit planes now and
            # drop the digit planes from the chip (srs.offload_digit_planes)
            srs.g1_rns()
            srs.offload_digit_planes()

    # cold run includes XLA compiles (one per kernel/size bucket, persisted
    # to the on-disk cache); the warm run is the steady-state prove time
    t0 = time.time()
    generate_proof(circuit, srs, StdRng.from_seed_u64(7))
    cold_s = time.time() - t0
    from zktpu.profiling import maybe_trace

    timings: dict = {}
    t0 = time.time()
    with maybe_trace("plonk_prove"):  # ZKTPU_PROFILE=<dir> dumps a Perfetto trace
        proof = generate_proof(circuit, srs, StdRng.from_seed_u64(7), timings=timings)
    prove_s = time.time() - t0
    t0 = time.time()
    verify(circuit, srs, proof)  # raises PlonkVerificationError on failure
    verify_cold_s = time.time() - t0
    t0 = time.time()
    verify(circuit, srs, proof)
    verify_s = time.time() - t0
    rounds = " ".join(f"{k}={v:.2f}s" for k, v in timings.items())
    _emit(
        f"plonk_prove_s_2e{log_n}_gates",
        prove_s,
        "s",
        f"cold={cold_s:.1f}s compile_circuit={compile_circuit_s:.1f}s "
        f"srs={srs_s:.1f}s verify={verify_s:.1f}s (cold {verify_cold_s:.1f}s) | {rounds}",
    )


def bench_fri(log_domain: int = 12, queries: int = 32) -> None:
    import numpy as np

    from zktpu.fields.host import GOLDILOCKS
    from zktpu.fri.prover import generate_proof
    from zktpu.fri.verifier import verify
    from zktpu.poly.poly import Poly

    # degree 2^(log_domain-1) - 1 poly, blowup 2 -> 2^log_domain domain
    rng = np.random.default_rng(3)
    coeffs = [int(v) for v in rng.integers(0, GOLDILOCKS.modulus, size=1 << (log_domain - 1), dtype=np.uint64)]
    poly = Poly.from_ints(GOLDILOCKS, coeffs)
    t0 = time.time()
    generate_proof(poly, blowup_factor=2, number_of_queries=queries)
    cold_s = time.time() - t0
    t0 = time.time()
    proof = generate_proof(poly, blowup_factor=2, number_of_queries=queries)
    prove_s = time.time() - t0
    t0 = time.time()
    verify(proof)
    verify_s = time.time() - t0
    _emit(
        f"fri_prove_s_2e{log_domain}_domain",
        prove_s,
        "s",
        f"cold={cold_s:.1f}s queries={queries} verify={verify_s:.2f}s",
    )


def bench_nova(steps: int = 64) -> None:
    from zktpu.fields import host
    from zktpu.fields.fp import device_field
    from zktpu.kzg import Srs, KzgScheme
    from zktpu.nova.circuit import (
        AugmentedCircuit,
        FCircuit,
        State,
        base_to_scalar,
        hash_io,
    )
    from zktpu.nova.ivc import IVC, IVCProof, ZkIVCProof
    from zktpu.nova.nifs import gen_test_values
    from zktpu.nova.r1cs import FInstance, FWitness, create_trivial_pair
    from zktpu.transcript.transcripts import NovaTranscript

    FR = host.FR
    FRD = device_field(FR)

    class CubicCircuit(FCircuit):
        def run(self, z_i: State, w_i: FWitness) -> State:
            x = FRD.decode_int(w_i.w[0])
            res = (x**3 + x + 5) % FR.modulus
            base_res = host.FQ.from_le_bytes_mod_order(res.to_bytes(32, "little"))
            return State(state=(z_i.state + base_res) % host.FQ.modulus)

    inputs = [(i % 7) + 1 for i in range(steps)]
    r1cs, witnesses, x = gen_test_values(inputs)
    srs = Srs.new_from_secret(0xABCDE, len(witnesses[0]) + len(x[0]) + 1)
    scheme = KzgScheme(srs)
    m = r1cs.matrix_a.shape[0]
    w = [FWitness.new(wi, m) for wi in witnesses]
    u = [wi.commit(scheme, xi) for wi, xi in zip(w, x)]
    trivial_witness, trivial_instance = create_trivial_pair(
        len(x[0]), len(witnesses[0]), scheme
    )
    f_circuit = CubicCircuit()
    z = [State(0)]
    for i in range(1, steps + 1):
        z.append(f_circuit.run(z[i - 1], w[i - 1]))

    t0 = time.time()
    verifier_transcript = NovaTranscript()
    ivc = IVC(scheme, AugmentedCircuit(f_circuit, trivial_instance, z[0]))
    ivc_proof = IVCProof.trivial_ivc_proof(trivial_instance, trivial_witness)
    zk_ivc_proof = ZkIVCProof.trivial_zk_ivc_proof(trivial_instance)
    folded_witness, folded_instance = trivial_witness, trivial_instance
    for step in range(steps):
        if step == 0:
            ivc.augmented_circuit.run(u[step], None, w[step], None)
        else:
            ivc.augmented_circuit.run(
                ivc_proof.u_i, ivc_proof.big_u_i, ivc_proof.w_i, zk_ivc_proof.com_t
            )
        ivc.verify(zk_ivc_proof, verifier_transcript)
        if step != steps - 1:
            ivc.augmented_circuit.next_step()
            prover_transcript = NovaTranscript()
            verifier_transcript = NovaTranscript()
            hash_x = hash_io(step + 1, z[0], z[step + 1], folded_instance)
            u[step + 1] = FInstance(
                com_e=u[step + 1].com_e,
                u=u[step + 1].u,
                com_w=u[step + 1].com_w,
                x=[base_to_scalar(hash_x)],
            )
            ivc_proof = IVCProof(
                u[step + 1], w[step + 1], folded_instance, folded_witness
            )
            folded_witness, folded_instance, zk_ivc_proof = ivc.prove(
                r1cs, ivc_proof, prover_transcript
            )
    total = time.time() - t0
    _emit(f"nova_ivc_{steps}_steps_s", total, "s", f"{total / steps * 1e3:.1f}ms/step")


def bench_kzg(log_deg: int = 10) -> None:
    import numpy as np

    from zktpu.fields.host import FR
    from zktpu.kzg import Srs, KzgScheme
    from zktpu.poly.poly import Poly

    n = 1 << log_deg
    rng = np.random.default_rng(1)
    coeffs = [int.from_bytes(rng.bytes(32), "little") % FR.modulus for _ in range(n)]
    srs = Srs.new_from_secret(0xFACE, n)
    scheme = KzgScheme(srs)
    poly = Poly.from_ints(FR, coeffs)
    z = 0x123456789

    def run():
        commitment = scheme.commit(poly)
        opening = scheme.open(poly, z)
        assert scheme.verify(commitment, opening, z)

    t0 = time.time()
    run()
    cold_s = time.time() - t0
    t0 = time.time()
    run()
    total = time.time() - t0
    _emit(f"kzg_commit_open_verify_s_2e{log_deg}", total, "s", f"cold={cold_s:.1f}s")


def bench_scaling(log_n: int = 14, iters: int = 3) -> None:
    """Chip-seconds scaling efficiency on the virtual 8-device CPU mesh.

    Methodology stand-in for the >=80%-at-a-pod target (BASELINE.md): run the
    four-step sharded NTT (the long-axis transform — one all-to-all transpose)
    on meshes of 1/2/4/8 virtual CPU devices over the same 2^log_n domain and
    report efficiency(n) = T_1 / (n * T_n).  Virtual devices map to host
    threads, so this measures exactly the partitioning + collective overhead
    the real-pod run would pay over ICI (minus the ICI latency itself).

    Requires JAX_PLATFORMS=cpu with xla_force_host_platform_device_count=8;
    re-execs itself with those set when launched on another backend.
    """
    import os
    import subprocess

    if os.environ.get("JAX_PLATFORMS") != "cpu":
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()
        subprocess.call(
            [sys.executable, __file__, "scaling", "--log-n", str(log_n)], env=env
        )
        return

    import jax
    import numpy as np

    from zktpu.dist.mesh import make_mesh
    from zktpu.dist.ntt import get_four_step
    from zktpu.fields.host import FR
    from zktpu.fields.fp import device_field

    n = 1 << log_n
    frd = device_field(FR)
    rng = np.random.default_rng(0)
    vals = frd.to_mont(
        jax.numpy.asarray(
            rng.integers(0, 1 << 16, size=(n, frd.num_digits), dtype=np.uint64).astype(
                np.uint32
            )
        )
    )

    results = {}
    for ndev in (1, 2, 4, 8):
        ntt = get_four_step(FR, n, make_mesh(ndev))
        out = ntt.fft(vals)  # compile
        np.asarray(jax.device_get(out[:1]))
        times = []
        for _ in range(iters):
            t0 = time.time()
            out = ntt.fft(vals)
            np.asarray(jax.device_get(out[:1]))
            times.append(time.time() - t0)
        results[ndev] = min(times)

    # Virtual devices beyond the physical core count share cores, so raw
    # chip-seconds (n * T_n / T_1) conflate oversubscription with collective
    # overhead; normalize by the parallelism actually available.
    ncores = os.cpu_count() or 1
    t1 = results[1]
    table = " ".join(
        f"{nd}dev={t * 1e3:.1f}ms(eff={t1 / (min(nd, ncores) * t) * 100:.0f}%)"
        for nd, t in results.items()
    )
    eff8 = t1 / (min(8, ncores) * results[8])
    _emit(
        f"ntt_fourstep_scaling_eff_8dev_2e{log_n}",
        eff8,
        "fraction",
        f"virtual-cpu-mesh ncores={ncores} (eff normalized by min(ndev, ncores)) {table}",
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "what",
        choices=["ntt", "plonk", "fri", "nova", "kzg", "scaling", "all"],
        nargs="?",
        default="all",
    )
    ap.add_argument("--log-n", type=int, default=None)
    args = ap.parse_args()

    runners = {
        "ntt": lambda: bench_ntt(args.log_n or 20),
        "plonk": lambda: bench_plonk(args.log_n or 14),
        "fri": lambda: bench_fri(args.log_n or 12),
        "nova": lambda: bench_nova(),
        "kzg": lambda: bench_kzg(args.log_n or 10),
        "scaling": lambda: bench_scaling(args.log_n or 14),
    }
    if args.what == "all":
        for name, fn in runners.items():
            fn()
    else:
        runners[args.what]()


if __name__ == "__main__":
    main()
