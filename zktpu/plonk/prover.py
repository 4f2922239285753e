"""PLONK prover: the 5-round protocol of plonk/src/prover.rs:61-293, with the
hot loops redesigned for TPU:

  - grand-product accumulator z(x): evaluation-form ratios + batched field
    inversion + log-depth cumulative product, replacing the O(n^2)
    coefficient-space loop of compute_acc (prover.rs:302-377);
  - quotient t(X): NTT-based polynomial products + the strided vanishing
    division, replacing dense coefficient convolutions (prover.rs:381-444);
  - openings: scan-based division by (X - z) (prover.rs:214-265 semantics,
    including the panic on non-exact division for a bad witness).

Committed polynomials are identical to the reference's; with the same
blinding scalars the proofs agree point-for-point.
"""
from __future__ import annotations

import secrets
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.host import FR
from ..fields.fp import device_field
from ..kzg.scheme import KzgCommitment, KzgScheme
from ..poly.domain import get_domain
from ..poly.poly import Poly, evaluate_many, poly_from_evals
from ..transcript.ark_rand import fp_rand
from ..transcript.chacha import StdRng
from ..transcript.transcripts import PlonkChallengeGenerator
from .constraint import CompiledCircuit
from .slice_polynomial import SlicePoly

FRD = device_field(FR)


@dataclass
class Proof:
    a_commit: KzgCommitment
    b_commit: KzgCommitment
    c_commit: KzgCommitment
    z_commit: KzgCommitment
    t_lo_commit: KzgCommitment
    t_mid_commit: KzgCommitment
    t_hi_commit: KzgCommitment
    w_ev_x_commit: KzgCommitment
    w_ev_wx_commit: KzgCommitment
    bar_a: int
    bar_b: int
    bar_c: int
    bar_s_sigma_1: int
    bar_s_sigma_2: int
    bar_z_w: int
    u: int
    degree: int


def generate_proof(
    compiled_circuit: CompiledCircuit,
    srs,
    rng: StdRng | None = None,
    timings: dict | None = None,
) -> Proof:
    """rng: source for the 9 blinding scalars (reference: StdRng::from_entropy,
    prover.rs:68); inject a seeded StdRng for deterministic proofs.

    timings: optional dict filled with per-round wall seconds
    ({"round1": ..., ..., "round5": ...}) for observability (SURVEY §5)."""
    if rng is None:
        rng = StdRng(secrets.token_bytes(32))
    scheme = KzgScheme(srs)
    n = compiled_circuit.size
    dom = get_domain(FR, n)
    gc = compiled_circuit.gate_constraints
    cc = compiled_circuit.copy_constraints
    t_round = time.time()

    def _mark(name: str, block_on=None):
        """Record wall seconds since the previous mark.

        block_on: optional device arrays (or Polys) to block_until_ready first
        so async dispatch doesn't smear one phase's device time into the next;
        phases that end in a host value (commit/evaluate) are already synced.
        """
        nonlocal t_round
        if timings is not None:
            if block_on is not None:
                jax.block_until_ready(
                    jax.tree.map(
                        lambda x: x.coeffs if isinstance(x, Poly) else x, block_on,
                        is_leaf=lambda x: isinstance(x, Poly),
                    )
                )
            now = time.time()
            timings[name] = now - t_round
            t_round = now

    # ---- Round 1 (prover.rs:64-92) ----
    with jax.named_scope("plonk_round1"):
        b = [fp_rand(FR, rng) for _ in range(6)]
        pre1 = Poly.from_ints(FR, [b[1], b[0]])
        pre2 = Poly.from_ints(FR, [b[3], b[2]])
        pre3 = Poly.from_ints(FR, [b[5], b[4]])

        ax = gc.f_ax + pre1.mul_by_vanishing(n)
        bx = gc.f_bx + pre2.mul_by_vanishing(n)
        cx = gc.f_cx + pre3.mul_by_vanishing(n)
        _mark("round1.wires", block_on=(ax, bx, cx))

        a_commit, b_commit, c_commit = scheme.commit_many([ax, bx, cx])
    _mark("round1.commits")

    # ---- Round 2 (prover.rs:94-127) ----
    with jax.named_scope("plonk_round2"):
        challenge = PlonkChallengeGenerator()
        challenge.feed(a_commit)
        challenge.feed(b_commit)
        challenge.feed(c_commit)
        beta, gamma = challenge.generate_challenges(2)

        b7, b8, b9 = (fp_rand(FR, rng) for _ in range(3))
        pre4 = Poly.from_ints(FR, [b9, b8, b7]).mul_by_vanishing(n)
        w = dom.element(1)
        pre4w = Poly.from_ints(
            FR, [b9, FR.mul(b8, w), FR.mul(b7, dom.element(2))]
        ).mul_by_vanishing(n)

        acc_x, acc_wx = compute_acc(beta, gamma, dom, compiled_circuit)
        z_x = pre4 + acc_x
        z_wx = pre4w + acc_wx
        _mark("round2.grand_product", block_on=(z_x, z_wx))
        z_commit = scheme.commit(z_x)
    _mark("round2.commit")

    # ---- Round 3 (prover.rs:129-150) ----
    with jax.named_scope("plonk_round3"):
        challenge.feed(z_commit)
        (alpha,) = challenge.generate_challenges(1)
        tx = compute_quotient_polynomial(
            beta, gamma, alpha, ax, bx, cx, z_x, z_wx, dom, compiled_circuit
        )
        _mark("round3.quotient", block_on=tx)
        slice_poly = SlicePoly(tx)
        t_lo_commit, t_mid_commit, t_hi_commit = slice_poly.commit(scheme)
    _mark("round3.commits")

    # ---- Round 4 (prover.rs:152-178) ----
    with jax.named_scope("plonk_round4"):
        challenge.feed(t_lo_commit)
        challenge.feed(t_mid_commit)
        challenge.feed(t_hi_commit)
        (zeta,) = challenge.generate_challenges(1)

        # batched: one shared power table for all zeta-point evaluations
        (
            bar_a, bar_b, bar_c,
            bar_s_sigma_1, bar_s_sigma_2, bar_s_sigma_3,
            pi_e, z_zeta,
        ) = evaluate_many(
            [ax, bx, cx, cc.s_sigma_1, cc.s_sigma_2, cc.s_sigma_3, gc.pi_x, z_x],
            zeta,
        )
        bar_z_w = z_x.evaluate(FR.mul(zeta, w))
        tx_compact = slice_poly.compact(zeta)
    _mark("round4.evals", block_on=tx_compact)

    # ---- Round 5 (prover.rs:180-272) ----
    with jax.named_scope("plonk_round5"):
        for val in (bar_a, bar_b, bar_c, bar_s_sigma_1, bar_s_sigma_2, bar_z_w):
            challenge.feed(scheme.commit_para(val))
        (v,) = challenge.generate_challenges(1)

        r_x = compute_linearisation_polynomial(
            beta, gamma, alpha, zeta,
            bar_a, bar_b, bar_c, bar_s_sigma_1, bar_s_sigma_2, bar_z_w,
            pi_e, tx_compact, z_x, dom, compiled_circuit,
            bar_s_sigma_3=bar_s_sigma_3, z_zeta=z_zeta,
        )
        _mark("round5.linearisation", block_on=r_x)
        bar_r = r_x.evaluate(zeta)

        w_ev_x = (
            _sub_para(r_x, bar_r)
            + _sub_para(ax, bar_a).scale(v)
            + _sub_para(bx, bar_b).scale(FR.pow(v, 2))
            + _sub_para(cx, bar_c).scale(FR.pow(v, 3))
            + _sub_para(cc.s_sigma_1, bar_s_sigma_1).scale(FR.pow(v, 4))
            + _sub_para(cc.s_sigma_2, bar_s_sigma_2).scale(FR.pow(v, 5))
        )
        w_ev_x, rem = w_ev_x.divide_by_linear(zeta)
        assert rem == 0, "w_ev_x was computed incorrectly"

        w_ev_wx = _sub_para(z_x, bar_z_w)
        w_ev_wx, rem = w_ev_wx.divide_by_linear(FR.mul(zeta, w))
        assert rem == 0, "w_ev_wx was computed incorrectly"
        _mark("round5.witness_polys", block_on=(w_ev_x, w_ev_wx))

        w_ev_x_commit, w_ev_wx_commit = scheme.commit_many([w_ev_x, w_ev_wx])
        challenge.feed(w_ev_x_commit)
        challenge.feed(w_ev_wx_commit)
        (u,) = challenge.generate_challenges(1)
    _mark("round5.commits")
    if timings is not None:  # per-round totals from the dotted segment marks
        for rn in ("round1", "round2", "round3", "round4", "round5"):
            timings[rn] = sum(v for k, v in timings.items() if k.startswith(rn + "."))

    return Proof(
        a_commit, b_commit, c_commit, z_commit,
        t_lo_commit, t_mid_commit, t_hi_commit,
        w_ev_x_commit, w_ev_wx_commit,
        bar_a, bar_b, bar_c, bar_s_sigma_1, bar_s_sigma_2, bar_z_w,
        u, slice_poly.get_degree(),
    )


def _sub_para(poly: Poly, para: int) -> Poly:
    return poly - Poly.constant(FR, para)


def compute_acc(beta: int, gamma: int, dom, compiled_circuit: CompiledCircuit):
    """Grand product z over the domain, in evaluation form.

    acc_e[0] = 1;  acc_e[i] = prod_{j<i} num_j / den_j  with
    num_j = (a_j + beta w^j + gamma)(b_j + beta k1 w^j + gamma)(c_j + beta k2 w^j + gamma)
    den_j analogous with the sigma evaluations.  Matches the values the
    reference computes with per-step polynomial evaluation (prover.rs:302-377).
    """
    cc = compiled_circuit.copy_constraints
    gc = compiled_circuit.gate_constraints
    n = compiled_circuit.size
    df = FRD

    roots = dom.elements_device()  # (n, D)
    a_e = _eval_padded(gc.evals["a"], n)
    b_e = _eval_padded(gc.evals["b"], n)
    c_e = _eval_padded(gc.evals["c"], n)
    s1 = cc.evals["s1"]
    s2 = cc.evals["s2"]
    s3 = cc.evals["s3"]

    beta_d = df.encode_int(beta)
    gamma_d = df.encode_int(gamma)
    k1_d = df.encode_int(cc.k1)
    k2_d = df.encode_int(cc.k2)

    broots = df.mont_mul(roots, beta_d)
    num = df.mont_mul(
        df.mont_mul(
            df.add(df.add(a_e, broots), gamma_d),
            df.add(df.add(b_e, df.mont_mul(broots, k1_d)), gamma_d),
        ),
        df.add(df.add(c_e, df.mont_mul(broots, k2_d)), gamma_d),
    )
    den = df.mont_mul(
        df.mont_mul(
            df.add(df.add(a_e, df.mont_mul(s1, beta_d)), gamma_d),
            df.add(df.add(b_e, df.mont_mul(s2, beta_d)), gamma_d),
        ),
        df.add(df.add(c_e, df.mont_mul(s3, beta_d)), gamma_d),
    )
    den_inv = df.batch_inv(den, host_inv=FR.inv)
    ratio = df.mont_mul(num, den_inv)
    prefix = df.cumprod(ratio, axis=0)  # inclusive
    one = jnp.asarray(df.one_np)[None]
    acc_e = jnp.concatenate([one, prefix[: n - 1]], axis=0)
    acc_e_shifted = jnp.concatenate([acc_e[1:], acc_e[:1]], axis=0)  # rotate_left(1)
    acc = poly_from_evals(dom, acc_e)
    acc_w = poly_from_evals(dom, acc_e_shifted)
    return acc, acc_w


def _eval_padded(arr: jnp.ndarray, n: int) -> jnp.ndarray:
    if arr.shape[0] == n:
        return arr
    return jnp.pad(arr, ((0, n - arr.shape[0]), (0, 0)))


def _div_vanishing_exact(poly: Poly, n: int) -> Poly:
    q, r = poly.divide_by_vanishing(n)
    if not r.is_zero():
        raise AssertionError("has remainder")  # reference expect("No remainder")
    return q


def compute_quotient_polynomial(
    beta, gamma, alpha, ax: Poly, bx: Poly, cx: Poly, z_x: Poly, z_wx: Poly, dom, compiled_circuit,
    force: str | None = None,
) -> Poly:
    """t(X) = [line1 + line2 - line3 + line4] / Z_H (prover.rs:381-444).

    Small circuits use coefficient-space products (host latency tier); large
    circuits evaluate each part on a coset and divide pointwise — identical
    coefficients, one batched FFT pass instead of ~12 chained transforms.
    Both raise AssertionError("has remainder") on a bad witness, preserving
    the reference's expect("No remainder") panics.

    force: "coset" | "coeff" | None — test hook to pin the implementation.
    """
    use_coset = compiled_circuit.size >= 64 if force is None else force == "coset"
    if use_coset:
        return _quotient_coset(
            beta, gamma, alpha, ax, bx, cx, z_x, z_wx, dom, compiled_circuit
        )
    cc = compiled_circuit.copy_constraints
    gc = compiled_circuit.gate_constraints
    n = compiled_circuit.size

    line1 = (
        (ax * bx) * gc.q_mx
        + ax * gc.q_lx
        + bx * gc.q_rx
        + cx * gc.q_ox
        + gc.pi_x
        + gc.q_cx
    )
    quotient1 = _div_vanishing_exact(line1, n)

    gb = Poly.from_ints(FR, [gamma, beta])
    gbk1 = Poly.from_ints(FR, [gamma, FR.mul(beta, cc.k1)])
    gbk2 = Poly.from_ints(FR, [gamma, FR.mul(beta, cc.k2)])
    line2 = (((ax + gb) * (bx + gbk1)) * (cx + gbk2) * z_x).scale(alpha)

    gconst = Poly.constant(FR, gamma)
    line3 = (
        ((ax + cc.s_sigma_1.scale(beta) + gconst) * (bx + cc.s_sigma_2.scale(beta) + gconst))
        * (cx + cc.s_sigma_3.scale(beta) + gconst)
        * z_wx
    ).scale(alpha)

    quotient23 = _div_vanishing_exact(line2 - line3, n)

    l1 = l1_poly(dom)
    line4 = ((z_x - Poly.constant(FR, 1)) * l1).scale(FR.mul(alpha, alpha))
    quotient4 = _div_vanishing_exact(line4, n)

    return quotient1 + quotient23 + quotient4


def _batched_coset_fft(dom_big, polys: list[Poly], offset: int) -> jnp.ndarray:
    """Stack polynomials and evaluate all on offset*<w> in ONE transform.

    The batch is chunked so batch*m stays below ~2^22 elements: XLA:TPU
    pads the 16-digit minor dim of every NTT intermediate to 128 lanes (8x
    HBM expansion), so an unchunked 7..9-poly batch at the 8n domain of a
    2^18-gate circuit allocates >3.5 GB per temp and OOMs the chip."""
    m = dom_big.size
    chunk = max(1, (1 << 22) // m)
    out = []
    for i in range(0, len(polys), chunk):
        part = polys[i : i + chunk]
        stacked = jnp.stack([p._padded(m) for p in part], axis=0)  # (K, m, D)
        scaled = FRD.mont_mul(stacked, dom_big._offset_powers(offset))
        out.append(dom_big.fft(scaled, force_device=True))
    return jnp.concatenate(out, axis=0) if len(out) > 1 else out[0]


def _coset_divide_zh(dom_big, evals: jnp.ndarray, offset: int, n: int, max_deg: int) -> Poly:
    """evals of a numerator on offset*<w_m> -> numerator / (X^n - 1).

    Z_H(offset * w_m^i) = offset^n * w_k^(i mod k) - 1 with k = m/n takes only
    k distinct values (inverted on host).  Exactness proof: the coset iFFT
    yields the unique T of deg < m with T*Z_H = num on all m points; if
    coeffs(T) vanish above max_deg then deg(T*Z_H) <= max_deg + n <= m - 1,
    so T*Z_H = num identically and the division was remainder-free.  A
    nonzero tail therefore reproduces the reference's expect("No remainder")
    panic (plonk/src/prover.rs:398-443) for any bad witness.
    """
    m = dom_big.size
    k = m // n
    off_n = FR.pow(offset, n)
    w_k = FR.pow(dom_big.group_gen, n)  # order-k root
    zh_vals, cur = [], off_n
    for _ in range(k):
        zh_vals.append(FR.sub(cur, 1))
        cur = FR.mul(cur, w_k)
    assert all(v != 0 for v in zh_vals), "coset offset hits the domain"
    zh_inv = FRD.encode_ints([FR.inv(v) for v in zh_vals])  # (k, D)
    tiled = jnp.tile(zh_inv, (m // k, 1))
    t_evals = FRD.mont_mul(evals, tiled)
    coeffs = dom_big.coset_ifft(t_evals, offset)
    tail = coeffs[max_deg + 1 :]
    if bool(np.asarray(jax.device_get(jnp.any(tail != 0)))):
        raise AssertionError("has remainder")  # reference expect("No remainder")
    return Poly(FR, coeffs[: max_deg + 1])


def _quotient_coset(
    beta, gamma, alpha, ax: Poly, bx: Poly, cx: Poly, z_x: Poly, z_wx: Poly, dom, compiled_circuit
) -> Poly:
    """Coset-evaluation quotient: three parts on the smallest sufficient
    domains (4n for the gate part and L1 part, 8n for the permutation part
    whose numerator has degree 4n+5)."""
    cc = compiled_circuit.copy_constraints
    gc = compiled_circuit.gate_constraints
    n = compiled_circuit.size
    df = FRD
    off = FR.generator

    beta_d = df.encode_int(beta)
    gamma_d = df.encode_int(gamma)
    alpha_d = df.encode_int(alpha)

    # -- part 1: gate constraints, deg(num) <= 3n+1 -> 4n points
    dom4 = get_domain(FR, 4 * n)
    A, B, C, QM, QL, QR, QO, QC, PI = _batched_coset_fft(
        dom4,
        [ax, bx, cx, gc.q_mx, gc.q_lx, gc.q_rx, gc.q_ox, gc.q_cx, gc.pi_x],
        off,
    )
    line1 = df.add(
        df.add(
            df.add(df.mont_mul(df.mont_mul(A, B), QM), df.mont_mul(A, QL)),
            df.add(df.mont_mul(B, QR), df.mont_mul(C, QO)),
        ),
        df.add(PI, QC),
    )
    q1 = _coset_divide_zh(dom4, line1, off, n, max_deg=2 * n + 1)

    def perm_lines(Ax, Bx, Cx, Zx, Zw, S1x, S2x, S3x, bX):
        """alpha * (z*f - z_w*g) pointwise on a coset (prover.rs:381-420)."""
        t2 = df.mont_mul(
            df.mont_mul(
                df.add(df.add(Ax, bX), gamma_d),
                df.add(df.add(Bx, df.mont_mul(bX, df.encode_int(cc.k1))), gamma_d),
            ),
            df.mont_mul(
                df.add(df.add(Cx, df.mont_mul(bX, df.encode_int(cc.k2))), gamma_d), Zx
            ),
        )
        t3 = df.mont_mul(
            df.mont_mul(
                df.add(df.add(Ax, df.mont_mul(S1x, beta_d)), gamma_d),
                df.add(df.add(Bx, df.mont_mul(S2x, beta_d)), gamma_d),
            ),
            df.mont_mul(df.add(df.add(Cx, df.mont_mul(S3x, beta_d)), gamma_d), Zw),
        )
        return df.mont_mul(df.sub(t2, t3), alpha_d)

    from ..config import QUOTIENT_8N_MAX_N

    if n <= QUOTIENT_8N_MAX_N:
        # -- part 2-3 (exact path): deg(num) <= 4n+5 -> 8n points
        dom8 = get_domain(FR, 8 * n)
        A8, B8, C8, Z8, S1, S2, S3 = _batched_coset_fft(
            dom8, [ax, bx, cx, z_x, cc.s_sigma_1, cc.s_sigma_2, cc.s_sigma_3], off
        )
        # z_wx(X) = z_x(wX) and w = w_{8n}^8, so its coset evals are a rotation
        Z8w = jnp.roll(Z8, -8, axis=0)
        X8 = df.mont_mul(dom8.elements_device(), df.encode_int(off))  # coset points
        line23 = perm_lines(A8, B8, C8, Z8, Z8w, S1, S2, S3, df.mont_mul(X8, beta_d))
        q23 = _coset_divide_zh(dom8, line23, off, n, max_deg=3 * n + 5)
        Z4, L1_4 = _batched_coset_fft(dom4, [z_x, l1_poly(dom)], off)
    else:
        # -- part 2-3 (evaluation-form path for large n): the QUOTIENT
        # t23 = num23 / Z_H has degree <= 3n+5 < 4n, so its values on the
        # SAME 4n coset as part 1 determine it exactly — no 8n domain.  The
        # numerator (deg 4n+5) aliases on 4n points, but num23/Z_H evaluated
        # pointwise equals t23 there whenever the division is remainder-free
        # (honest witness); a bad witness still trips the iFFT tail check
        # with overwhelming probability over beta/gamma (aliasing moves the
        # remainder term into the checked tail), rather than with certainty
        # as on the 8n path.  This halves the largest FFT domain: at 2^20
        # gates the 8n path's 2^23-point transforms exceed HBM (the 16-digit
        # minor dim is lane-padded 8x), the 4n path's 2^22 fit.
        Z4, S1, S2, S3, L1_4 = _batched_coset_fft(
            dom4, [z_x, cc.s_sigma_1, cc.s_sigma_2, cc.s_sigma_3, l1_poly(dom)], off
        )
        Z4w = jnp.roll(Z4, -4, axis=0)  # z(wX): w = w_{4n}^4 on the 4n coset
        X4 = df.mont_mul(dom4.elements_device(), df.encode_int(off))
        line23 = perm_lines(A, B, C, Z4, Z4w, S1, S2, S3, df.mont_mul(X4, beta_d))
        q23 = _coset_divide_zh(dom4, line23, off, n, max_deg=3 * n + 5)

    # -- part 4: L1 * (z - 1), deg(num) <= 2n+1 -> 4n points
    one_d = jnp.asarray(df.one_np)
    a2 = df.encode_int(FR.mul(alpha, alpha))
    line4 = df.mont_mul(df.mont_mul(df.sub(Z4, one_d), L1_4), a2)
    q4 = _coset_divide_zh(dom4, line4, off, n, max_deg=n + 1)

    return q1 + q23 + q4


def l1_poly(dom) -> Poly:
    """First Lagrange basis polynomial: interpolating e_0 over H gives
    coefficients identically 1/n (iNTT of e_0 = (1/n) * ones)."""
    n = dom.size
    inv_n = FR.inv(n % FR.modulus)
    coeffs = jnp.broadcast_to(FRD.encode_int(inv_n), (n, FRD.num_digits))
    return Poly(FR, coeffs, trim=False)


def compute_linearisation_polynomial(
    beta, gamma, alpha, zeta,
    bar_a, bar_b, bar_c, bar_s_sigma_1, bar_s_sigma_2, bar_z_w,
    pi_e, tx_compact: Poly, z_x: Poly,
    dom, compiled_circuit: CompiledCircuit,
    *, bar_s_sigma_3: int, z_zeta: int,
) -> Poly:
    """r(X) per plonk/src/prover.rs:469-568.

    The reference's internal sanity asserts (prover.rs:514-553) compare the
    linearised line2/line3 against re-evaluations of the full permutation
    products at zeta; here all evaluations at zeta come from the batched
    round-4 pass (bar_* / bar_s_sigma_3 / z_zeta = z_x(zeta)), and the same
    structural identity is asserted on scalars.  Note ev(z_wx)(zeta) =
    z_x(omega*zeta) = bar_z_w.
    """
    cc = compiled_circuit.copy_constraints
    gc = compiled_circuit.gate_constraints

    line1 = (
        gc.q_mx.scale(FR.mul(bar_a, bar_b))
        + gc.q_lx.scale(bar_a)
        + gc.q_rx.scale(bar_b)
        + gc.q_ox.scale(bar_c)
        + gc.q_cx
        + Poly.constant(FR, pi_e)
    )

    l2s = alpha
    for t in (
        FR.add(FR.add(bar_a, FR.mul(beta, zeta)), gamma),
        FR.add(FR.add(bar_b, FR.mul(FR.mul(beta, cc.k1), zeta)), gamma),
        FR.add(FR.add(bar_c, FR.mul(FR.mul(beta, cc.k2), zeta)), gamma),
    ):
        l2s = FR.mul(l2s, t)
    line2 = z_x.scale(l2s)

    l3s = FR.mul(
        FR.mul(
            FR.add(FR.add(bar_a, FR.mul(beta, bar_s_sigma_1)), gamma),
            FR.add(FR.add(bar_b, FR.mul(beta, bar_s_sigma_2)), gamma),
        ),
        FR.mul(bar_z_w, alpha),
    )
    tmp2 = cc.s_sigma_3.scale(beta) + Poly.constant(FR, FR.add(bar_c, gamma))
    line3 = tmp2.scale(l3s)

    # reference sanity check (prover.rs:514-553) on scalars
    line22 = FR.mul(
        FR.mul(
            FR.mul(
                FR.add(bar_a, FR.add(gamma, FR.mul(beta, zeta))),
                FR.add(bar_b, FR.add(gamma, FR.mul(FR.mul(beta, cc.k1), zeta))),
            ),
            FR.add(bar_c, FR.add(gamma, FR.mul(FR.mul(beta, cc.k2), zeta))),
        ),
        FR.mul(alpha, z_zeta),
    )
    line32 = FR.mul(
        FR.mul(
            FR.mul(
                FR.add(bar_a, FR.add(FR.mul(bar_s_sigma_1, beta), gamma)),
                FR.add(bar_b, FR.add(FR.mul(bar_s_sigma_2, beta), gamma)),
            ),
            FR.add(bar_c, FR.add(FR.mul(bar_s_sigma_3, beta), gamma)),
        ),
        FR.mul(alpha, bar_z_w),
    )
    diff2 = FR.sub(line32, line22)
    ev_line3 = FR.mul(l3s, FR.add(FR.mul(beta, bar_s_sigma_3), FR.add(bar_c, gamma)))
    ev_line2 = FR.mul(l2s, z_zeta)
    cur = FR.sub(ev_line3, ev_line2)
    assert diff2 == cur, "Wrong: line2 or line3 of round 5"

    # L1(zeta) closed form (same value the interpolated poly evaluates to):
    # (zeta^n - 1) / (n (zeta - 1)); zeta = 1 cannot occur for an accepted
    # transcript challenge except with negligible probability — fall back to
    # the polynomial evaluation in that case.
    z_h_e = dom.evaluate_vanishing(zeta)
    if zeta != 1:
        l1_e = FR.mul(z_h_e, FR.inv(FR.mul(dom.size % FR.modulus, FR.sub(zeta, 1))))
    else:  # pragma: no cover
        l1_e = l1_poly(dom).evaluate(zeta)
    line4 = (z_x - Poly.constant(FR, 1)).scale(FR.mul(l1_e, FR.mul(alpha, alpha)))

    line5 = tx_compact.scale(z_h_e)

    return line1 + line2 - line3 + line4 - line5
