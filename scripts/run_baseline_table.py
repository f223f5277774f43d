"""Reproduce the full BASELINE.md table across the five benchmark configs.

The round-over-round tracking harness (the counterpart of the
reference's ``compare_*.py`` family + ``docs/benchmarks.md``): runs all
five BASELINE.json configs — dense 5-D BS, TT-Cross 5-D BS, 2-D spline
kink, 10-D slider, portfolio TT-ALS/algebra — and emits every metric
next to the reference's published number.

Usage:
    python scripts/run_baseline_table.py [--cpu] [--json OUT] [--md OUT]

Markdown goes to stdout (and ``--md``); machine-readable JSON to
``--json``.  On a CPU backend the device-throughput rows still run
(smaller batches) and are labeled with the backend so they are not
mistaken for chip numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import pychebyshev_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp
from scipy.stats import norm

jax.config.update("jax_compilation_cache_dir", "/tmp/pychebyshev_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


# ---------------------------------------------------------------------------
# shared utilities
# ---------------------------------------------------------------------------

from pychebyshev_tpu.utils.benchtime import (  # noqa: E402
    chained_time_fn as time_fn,
    host_time_fn as time_host,
)


def sample_box(domain, n, seed, margin=0.02):
    rng = np.random.default_rng(seed)
    lo = np.array([b[0] for b in domain])
    hi = np.array([b[1] for b in domain])
    return lo + (hi - lo) * rng.uniform(margin, 1 - margin,
                                        size=(n, len(domain)))


# The reference's published-benchmark protocol
# (compare_methods_time_accuracy.py): this domain, q = 2% continuous
# dividend, 200 uniform samples at seed 42, per-greek relative errors.
DOMAIN = [[80.0, 120.0], [90.0, 110.0], [0.25, 1.0], [0.15, 0.35],
          [0.01, 0.08]]
Q_DIV = 0.02


def bs_price(points, _data=None):
    """Black-Scholes call with continuous dividend yield Q_DIV."""
    points = np.asarray(points, dtype=np.float64)
    s, k, t, sg, r = (points[:, i] for i in range(5))
    sq = np.sqrt(t)
    d1 = (np.log(s / k) + (r - Q_DIV + 0.5 * sg ** 2) * t) / (sg * sq)
    d2 = d1 - sg * sq
    return (s * np.exp(-Q_DIV * t) * norm.cdf(d1)
            - k * np.exp(-r * t) * norm.cdf(d2))


def bs_greeks(points):
    """Analytic call greeks with dividend yield Q_DIV."""
    points = np.asarray(points, dtype=np.float64)
    s, k, t, sg, r = (points[:, i] for i in range(5))
    sq = np.sqrt(t)
    d1 = (np.log(s / k) + (r - Q_DIV + 0.5 * sg ** 2) * t) / (sg * sq)
    d2 = d1 - sg * sq
    pdf, dq, dr = norm.pdf(d1), np.exp(-Q_DIV * t), np.exp(-r * t)
    return {
        "delta": dq * norm.cdf(d1),
        "gamma": dq * pdf / (s * sg * sq),
        "vega": s * dq * pdf * sq,
        "rho": k * t * dr * norm.cdf(d2),
        "theta": (-s * dq * pdf * sg / (2 * sq)
                  - r * k * dr * norm.cdf(d2)
                  + Q_DIV * s * dq * norm.cdf(d1)),
    }


def reference_samples(n=200, seed=42):
    rng = np.random.default_rng(seed)
    out = np.empty((n, 5))
    for d, (lo, hi) in enumerate(DOMAIN):
        out[:, d] = rng.uniform(lo, hi, n)
    return out


# Times the reference implementation's host eval paths in a clean
# subprocess (it must not import jax or this package).
_REF_SINGLE_SNIPPET = """
import sys, time
sys.path.insert(0, {src!r})
from pychebyshev import ChebyshevApproximation
from scipy.stats import norm
from math import log, exp, sqrt
DOM = [[80.,120.],[90.,110.],[0.25,1.0],[0.15,0.35],[0.01,0.08]]
def bs(x, _):
    s,k,t,sg,r = x
    sq = sqrt(t)
    d1 = (log(s/k) + (r - 0.02 + 0.5*sg*sg)*t)/(sg*sq); d2 = d1 - sg*sq
    return s*exp(-0.02*t)*norm.cdf(d1) - k*exp(-r*t)*norm.cdf(d2)
c = ChebyshevApproximation(bs, 5, DOM, [11]*5)
c.build(verbose=False)
pt = [100.,100.,0.8,0.2,0.03]
specs = [[0]*5,[1,0,0,0,0],[2,0,0,0,0],[0,0,1,0,0],[0,0,0,1,0],[0,0,0,0,1]]
c.vectorized_eval(pt, [0]*5); c.vectorized_eval_multi(pt, specs)
a = b = 1e30
for _ in range(5):
    t0=time.perf_counter()
    for _ in range({n}): c.vectorized_eval(pt, [0]*5)
    a = min(a, (time.perf_counter()-t0)/{n}*1e6)
    t0=time.perf_counter()
    for _ in range({n}): c.vectorized_eval_multi(pt, specs)
    b = min(b, (time.perf_counter()-t0)/{n}*1e6)
print(a, b)
"""

ROWS = []  # (config, metric, ours, reference, note)


def row(config, metric, ours, reference="—", note=""):
    ROWS.append({"config": config, "metric": metric, "ours": ours,
                 "reference": reference, "note": note})


# ---------------------------------------------------------------------------
# Config 1: dense 5-D Black-Scholes, 11^5 grid
# ---------------------------------------------------------------------------

def run_dense(batch_n):
    from pychebyshev_tpu import ChebyshevApproximation
    from pychebyshev_tpu.ops import eval as eval_ops

    C = "dense 5-D BS 11^5"
    t0 = time.time()
    cheb = ChebyshevApproximation(bs_price, 5, DOMAIN, [11] * 5,
                                  vectorized=True)
    cheb.build(verbose=False)
    cold = time.time() - t0
    t0 = time.time()
    cheb = ChebyshevApproximation(bs_price, 5, DOMAIN, [11] * 5,
                                  vectorized=True)
    cheb.build(verbose=False)
    warm = time.time() - t0
    row(C, "build time (161,051 evals)",
        f"{cold:.3f} s cold / {warm:.3f} s warm", "~0.35 s",
        "BASELINE.md:15")

    # The reference protocol: 200 uniform samples (seed 42), price +
    # 5 greeks, per-greek max relative error, theta = -dV/dT (+q term).
    pts = reference_samples()
    exact = bs_price(pts)
    greeks = bs_greeks(pts)
    approx = cheb.vectorized_eval_batch(pts, [0] * 5)
    rel = np.abs(approx - exact) / np.abs(exact)
    row(C, "price err vs analytic (mean / max rel, 200 pts)",
        f"{rel.mean() * 100:.4f}% / {rel.max() * 100:.4f}%",
        "0.000% (mean, 3 dp)",
        "max dominated by a $0.009 deep-OTM price")

    specs = {"delta": [1, 0, 0, 0, 0], "gamma": [2, 0, 0, 0, 0],
             "vega": [0, 0, 0, 1, 0], "rho": [0, 0, 0, 0, 1],
             "theta": [0, 0, 1, 0, 0]}
    worst = 0.0
    for name, orders in specs.items():
        got = cheb.vectorized_eval_batch(pts, orders)
        if name == "theta":
            got = -got  # theta = -dV/dT (T is V's only time variable)
        ref = greeks[name]
        worst = max(worst, float((np.abs(got - ref)
                                  / np.abs(ref)).max()))
    row(C, "max Greek err (delta/gamma/vega/theta/rho)",
        f"{worst * 100:.3f}%", "1.980%", "BASELINE.md:14")

    pt = [100.0, 100.0, 0.8, 0.2, 0.03]
    n_single = 200
    dt_single = time_host(lambda: cheb.vectorized_eval(pt, [0] * 5),
                          n=n_single)
    row(C, "single query (vectorized_eval)",
        f"{dt_single * 1e3:.3f} ms", "~0.065 ms",
        "BASELINE.md:16; floor measured r4: the C kernel streams the "
        "1.3 MB tensor once per query (~84-91 us at this host's "
        "single-thread DRAM rate); an OpenMP first-pass split measured "
        "SLOWER here (106-136 us — shared-vCPU thread wake exceeds the "
        "~30 us of streaming it saves), so the gap to the published "
        "number is host memory bandwidth, not kernel work; same-host "
        "the reference runs 0.249 ms (3x slower)")

    # Compressed single-query route (r5): the C TT kernel
    # (cpp/hosteval.c pch_tt_eval) streams ~190 KB of exact-compression
    # cores instead of the 1.3 MB dense tensor — the latency answer for
    # hosts whose DRAM bandwidth binds the dense kernel.
    tt_single = cheb.to_tt(tolerance=1e-13)
    v_tt = tt_single.eval(pt)
    v_dense = float(cheb.vectorized_eval(pt, [0] * 5))
    dt_tt_single = time_host(lambda: tt_single.eval(pt), n=n_single)
    row(C, "single query via exact compression (to_tt(1e-13).eval)",
        f"{dt_tt_single * 1e3:.3f} ms", "~0.065 ms",
        f"r5: same value to {abs(v_tt - v_dense):.1e}; the compressed "
        f"C kernel reads ~7x less memory per query than the dense one")

    multi_specs = [[0] * 5, [1, 0, 0, 0, 0], [2, 0, 0, 0, 0],
                   [0, 0, 1, 0, 0], [0, 0, 0, 1, 0], [0, 0, 0, 0, 1]]
    dt_multi = time_host(
        lambda: cheb.vectorized_eval_multi(pt, multi_specs), n=n_single)
    row(C, "price + 5 Greeks (vectorized_eval_multi)",
        f"{dt_multi * 1e3:.3f} ms", "~0.29 ms", "BASELINE.md:17")

    # Same-host reference timing: the published 0.065/0.29 ms come from
    # unspecified hardware; when the reference checkout is present, time
    # its host paths on THIS machine for an apples-to-apples column.
    ref_src = os.path.join(
        os.environ.get("PYCHEBYSHEV_REFERENCE", "/root/reference"), "src")
    if os.path.isdir(ref_src):
        out = subprocess.run(
            [sys.executable, "-c", _REF_SINGLE_SNIPPET.format(
                src=ref_src, n=n_single)],
            capture_output=True, text=True, timeout=900)
        if out.returncode == 0:
            us_single, us_multi = map(float, out.stdout.split())
            r1 = us_single * 1e-6 / dt_single
            r2 = us_multi * 1e-6 / dt_multi
            row(C, "reference library on THIS host: single / multi",
                f"{us_single / 1e3:.3f} ms / {us_multi / 1e3:.3f} ms",
                "0.065 ms / 0.29 ms (their hw)",
                f"this repo is {r1:.1f}x / {r2:.1f}x faster same-host")

    nodes, weights, diffs = cheb._grid_tuples()
    orders = (0,) * 5
    pts64 = jnp.asarray(sample_box(DOMAIN, batch_n, seed=1))
    pts32 = pts64.astype(jnp.float32)

    dt64 = time_fn(lambda p: eval_ops.eval_batch(
        cheb.tensor_values, nodes, weights, diffs, p, orders),
        pts64, iters=4, reps=2)
    row(C, "batched f64 throughput", f"{batch_n / dt64:,.0f} q/s",
        "~15,400 q/s single-query", "software f64 on TPU")

    t32 = cheb.tensor_values.astype(jnp.float32)
    g32 = tuple(tuple(a.astype(jnp.float32) for a in g)
                for g in (nodes, weights, diffs))
    dt32 = time_fn(lambda p: eval_ops.eval_batch(
        t32, g32[0], g32[1], g32[2], p, orders), pts32)
    row(C, "batched f32 throughput", f"{batch_n / dt32:,.0f} q/s", "—",
        "bf16x3 GEMMs; ~2.6e-5 dev from f64")

    try:
        from pychebyshev_tpu.ops.pallas_eval import (fused_eval_batch,
                                                     supports_fused)
        if not supports_fused(cheb.tensor_values.shape, jnp.float32):
            raise RuntimeError("unsupported shape")
        dt_f = time_fn(lambda p: fused_eval_batch(
            cheb.tensor_values, nodes, weights, diffs, p, orders),
            pts32)
        row(C, "batched f32 fused Pallas throughput",
            f"{batch_n / dt_f:,.0f} q/s", "—", "TPU-only kernel")
    except Exception as e:
        row(C, "batched f32 fused Pallas throughput",
            f"skipped ({type(e).__name__})", "—", "TPU-only kernel")

    try:
        from pychebyshev_tpu.ops.eval_dd import eval_batch_dd
        dt_dd = time_fn(lambda p: eval_batch_dd(
            cheb.tensor_values, nodes, weights, diffs, p, orders),
            pts64, iters=6, reps=2)
        dd = np.asarray(eval_batch_dd(cheb.tensor_values, nodes, weights,
                                      diffs, jnp.asarray(pts), orders))
        dev = np.abs(dd - approx).max() / np.abs(exact).max()
        row(C, "batched digit-GEMM (near-f64) throughput",
            f"{batch_n / dt_dd:,.0f} q/s", "—",
            f"dev from f64 {dev:.1e}")
    except Exception as e:
        row(C, "batched digit-GEMM (near-f64) throughput",
            f"skipped ({type(e).__name__})", "—", "")

    # Exact-compression serving: the 1e-12-class route past 10M q/s
    # (to_tt + grouped supercore dd chain, round 4).
    try:
        from pychebyshev_tpu.ops.tt_eval_dd import tt_eval_batch_dd
        ttc = cheb.to_tt(tolerance=1e-13)
        comp_cores = ttc._cores_on_device(np.float64)
        comp_dom = np.asarray(ttc.domain, dtype=np.float64)
        dt_c = time_fn(lambda p: tt_eval_batch_dd(
            comp_cores, comp_dom, p, groups="auto"),
            pts64, iters=6, reps=2)
        got = np.asarray(tt_eval_batch_dd(comp_cores, comp_dom,
                                          jnp.asarray(pts),
                                          groups="auto"))
        dev_c = np.abs(got - approx).max() / np.abs(exact).max()
        row(C, "compressed (to_tt 1e-13) grouped dd throughput",
            f"{batch_n / dt_c:,.0f} q/s", "—",
            f"dev from dense f64 {dev_c:.1e} — 1e-12-class serving "
            f"past the 10M north star (docs/performance.md)")
    except Exception as e:
        row(C, "compressed (to_tt 1e-13) grouped dd throughput",
            f"skipped ({type(e).__name__})", "—", "")
    return cheb


# ---------------------------------------------------------------------------
# Config 2: 5-D BS via TT-Cross (reference benchmark config)
# ---------------------------------------------------------------------------

def run_tt(batch_n):
    from pychebyshev_tpu import ChebyshevTT
    from pychebyshev_tpu.ops.tt_eval import tt_eval_batch

    C = "TT-Cross 5-D BS"
    # The reference's compare_tensor_train.py config: the same narrow
    # domain + 2% dividend as config 1, tol 1e-6, seed-42 uniform
    # 50-point test set filtered at |price| >= $0.50.
    tt_domain = DOMAIN

    t0 = time.time()
    tt = ChebyshevTT(bs_price, 5, tt_domain, [11] * 5, max_rank=15,
                     max_sweeps=10, tolerance=1e-6, vectorized=True)
    tt.build(verbose=False, seed=42)
    row(C, "build time", f"{time.time() - t0:.3f} s", "~0.35 s",
        "BASELINE.md:21")
    row(C, "unique function evaluations", f"{tt.total_build_evals:,}",
        "7,419", "BASELINE.md:22")
    row(C, "TT ranks", str(tt.tt_ranks), "[1, 11, 11, 11, 7, 1]",
        "BASELINE.md:23")
    row(C, "compression ratio", f"{tt.compression_ratio:.1f}x", "43.4x",
        "BASELINE.md:24")

    rng = np.random.default_rng(42)
    pts50 = np.stack([rng.uniform(lo, hi, 50) for lo, hi in tt_domain],
                     axis=1)
    exact = bs_price(pts50)
    keep = np.abs(exact) >= 0.50
    vals = tt.eval_batch(pts50)
    err = np.abs((vals - exact) / exact)[keep] * 100
    row(C, "price err mean / max (50 pts)",
        f"{err.mean():.4f}% / {err.max():.4f}%", "0.002% / 0.014%",
        "BASELINE.md:20")

    cores = tuple(jnp.asarray(c) for c in tt._coeff_cores)
    dom = np.asarray(tt_domain)
    ptsq = jnp.asarray(sample_box(tt_domain, batch_n, seed=3))
    # Digit-GEMM TT tier BEFORE the f64 chain (sustained software-f64
    # degrades subsequent timings on this platform — CLAUDE.md).
    from pychebyshev_tpu.ops.tt_eval_dd import tt_eval_batch_dd
    dt_dd = time_fn(lambda p: tt_eval_batch_dd(cores, dom, p), ptsq)
    dd_vals = np.asarray(tt_eval_batch_dd(cores, dom,
                                          jnp.asarray(pts50)))
    dd_dev = np.abs(dd_vals - np.asarray(vals)).max() / \
        np.abs(vals).max()
    row(C, "batched digit-GEMM (near-f64) throughput",
        f"{batch_n / dt_dd:,.0f} q/s", "—",
        f"dev from f64 chain {dd_dev:.1e}")

    dt = time_fn(lambda p: tt_eval_batch(cores, dom, p), ptsq)
    row(C, "batched f64 throughput", f"{batch_n / dt:,.0f} q/s",
        "250,000 q/s (0.004 ms/pt)", "BASELINE.md:25")

    # FD Greeks (reference parity path) on a 25-point subset.
    sub = pts50[keep][:25]
    g = bs_greeks(sub)
    delta_exact, gamma_exact = g["delta"], g["gamma"]
    deltas = np.array([tt.eval_multi(list(p), [[1, 0, 0, 0, 0]])[0]
                       for p in sub])
    gammas = np.array([tt.eval_multi(list(p), [[2, 0, 0, 0, 0]])[0]
                       for p in sub])
    d_err = np.abs((deltas - delta_exact) / delta_exact).mean() * 100
    g_err = np.abs((gammas - gamma_exact) / gamma_exact).mean() * 100
    row(C, "FD Greek avg err: delta / gamma",
        f"{d_err:.3f}% / {g_err:.3f}%", "0.029% / 0.019%",
        "BASELINE.md:26")

    # Beyond-reference: analytic TT Greeks at batch speed.
    dtt = tt.differentiate([1, 0, 0, 0, 0])
    dcores = tuple(jnp.asarray(c) for c in dtt._coeff_cores)
    adelta = np.array(tt_eval_batch(dcores, dom, jnp.asarray(sub)))
    ad_err = np.abs((adelta - delta_exact) / delta_exact).mean() * 100
    row(C, "analytic-TT delta avg err (beyond reference)",
        f"{ad_err:.3f}%", "n/a (FD only)", "")
    return tt


# ---------------------------------------------------------------------------
# Config 3: 2-D spline with the payoff kink
# ---------------------------------------------------------------------------

def run_spline(batch_n):
    from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline

    C = "2-D spline (payoff kink)"

    def payoff(x, _):
        return max(x[0] - 1.0, 0.0) * float(np.exp(-0.1 * x[1]))

    domain = [[0.0, 2.0], [0.0, 1.0]]
    pts = sample_box(domain, 4000, seed=0, margin=0.001)
    exact = np.maximum(pts[:, 0] - 1.0, 0.0) * np.exp(-0.1 * pts[:, 1])

    plain = ChebyshevApproximation(payoff, 2, domain, [17, 17])
    plain.build(verbose=False)
    err_plain = np.abs(plain.vectorized_eval_batch(pts, [0, 0])
                       - exact).max()

    t0 = time.time()
    spline = ChebyshevSpline(payoff, 2, domain, [17, 17], [[1.0], []])
    spline.build(verbose=False)
    dt_build = time.time() - t0
    err_spline = np.abs(spline.eval_batch(pts, [0, 0]) - exact).max()
    row(C, "max abs err: global 17^2 tensor vs spline w/ knot",
        f"{err_plain:.1e} -> {err_spline:.1e}",
        "spectral convergence restored", "SURVEY §2 spline")
    row(C, "build time (2 pieces x 17^2)", f"{dt_build:.3f} s", "—", "")

    # special_points constructor dispatch is part of the contract.
    via_dispatch = ChebyshevApproximation(
        payoff, 2, domain, [[17, 17], [17]],
        special_points=[[1.0], []])
    assert isinstance(via_dispatch, ChebyshevSpline)
    row(C, "special_points __new__ dispatch", "ChebyshevSpline", "same",
        "barycentric.py:271-339")

    big = sample_box(domain, batch_n, seed=5, margin=0.001)
    spline.eval_batch(big[:4096], [0, 0])   # warm the masked executable
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spline.eval_batch(big, [0, 0])
        best = min(best, time.perf_counter() - t0)
    row(C, "batched f64 throughput (fused masked pieces)",
        f"{batch_n / best:,.0f} q/s", "—",
        "one dispatch; incl. host<->device transfer")

    # f32 serving story (VERDICT r2 #3): fused masked pieces at f32 with
    # host-side f64 piece routing, through the bucketed serving engine.
    # Timing: the engine consumes/returns HOST arrays (the np output
    # conversion fences device completion), so salted min-of-reps wall
    # time is sound here — a device-side chain would force an unfair
    # 16 MB D2H readback per iteration.
    import jax.numpy as jnp

    from pychebyshev_tpu.serving import BatchedEvaluator

    eng32 = BatchedEvaluator(spline, dtype=jnp.float32,
                             bucket_sizes=(batch_n,))
    eng32.warmup()
    err32 = np.abs(eng32(pts).astype(np.float64) - exact).max()
    salt_rng = np.random.default_rng()
    t32 = float("inf")
    for _ in range(4):
        salted = big * (1.0 + salt_rng.uniform(0, 1e-9))
        t0 = time.perf_counter()
        eng32(salted)
        t32 = min(t32, time.perf_counter() - t0)
    row(C, "batched f32 serving engine (masked pieces, f64 routing)",
        f"{batch_n / t32:,.0f} q/s", "—",
        f"max abs err {err32:.1e}; end-to-end incl. 12 MB/call relay "
        f"transfer — device-resident kernel measures 69M q/s at P=2 "
        f"(scripts/sweep_spline_crossover.py)")
    return spline


# ---------------------------------------------------------------------------
# Config 4: 10-D slider basket + auto-N
# ---------------------------------------------------------------------------

def run_slider(batch_n):
    from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSlider

    C = "10-D slider basket"
    D = 10
    w = np.linspace(0.5, 1.5, D)
    dom = [[-1.0, 1.0]] * D

    def basket(points, _=None):
        p = np.asarray(points, dtype=np.float64)
        return np.sum(w * np.sin(p), axis=1) + 0.25 * np.sum(p ** 2,
                                                             axis=1)

    t0 = time.time()
    slider = ChebyshevSlider(basket, D, dom, [9] * D,
                             partition=[[i] for i in range(D)],
                             pivot_point=[0.0] * D, vectorized=True)
    slider.build(verbose=False)
    row(C, "build time / evaluations",
        f"{time.time() - t0:.3f} s / {slider.total_build_evals} evals",
        "9^10 = 3.5e9 for the dense tensor", "additive decomposition")

    pts = np.random.default_rng(0).uniform(-1, 1, size=(5000, D))
    err = np.abs(slider.eval_batch(pts) - basket(pts)).max()
    row(C, "max abs err (5000 pts, f additive => exact)", f"{err:.1e}",
        "—", "")

    # Serving throughput: f32 engine first, f64 after (platform rule).
    from pychebyshev_tpu.serving import BatchedEvaluator
    ptsq = sample_box(dom, batch_n, seed=5)
    eng32 = BatchedEvaluator(slider, dtype=jnp.float32,
                             bucket_sizes=(batch_n,))
    dt32 = time_fn(lambda p: eng32._run(jnp.asarray(p, jnp.float32)),
                   jnp.asarray(ptsq, jnp.float32))
    row(C, "batched f32 serving engine throughput",
        f"{batch_n / dt32:,.0f} q/s", "—",
        "per-slide kernels, one additive sum")
    from pychebyshev_tpu.ops.slider_eval import slider_batch_dd
    sdata = tuple((s.tensor_values,) + s._grid_tuples()
                  for s in slider.slides)
    sgroups = tuple(tuple(g) for g in slider.partition)
    dt_dd = time_fn(lambda p: slider_batch_dd(
        sdata, slider.pivot_value, sgroups, p), jnp.asarray(ptsq))
    dd_small = np.asarray(slider_batch_dd(
        sdata, slider.pivot_value, sgroups, pts[:2048]))
    dd_dev = np.abs(dd_small - slider.eval_batch(pts[:2048])).max() / \
        np.abs(dd_small).max()
    row(C, "batched digit-GEMM (near-f64) throughput",
        f"{batch_n / dt_dd:,.0f} q/s", "—",
        f"one concatenated digit-GEMM; dev from f64 {dd_dev:.1e}")
    eng64 = BatchedEvaluator(slider, dtype=jnp.float64,
                             bucket_sizes=(batch_n,))
    dt64 = time_fn(lambda p: eng64._run(jnp.asarray(p, jnp.float64)),
                   jnp.asarray(ptsq), iters=4, reps=2)
    row(C, "batched f64 serving engine throughput",
        f"{batch_n / dt64:,.0f} q/s", "—", "software f64 on TPU")

    total = slider.integrate()
    exact_int = 0.25 * D * (2.0 / 3.0) * 2.0 ** (D - 1)
    row(C, "closed-form 10-D integral rel err",
        f"{abs(total - exact_int) / exact_int:.1e}", "—",
        "slider.py:881-1136 semantics")

    n1 = ChebyshevApproximation.get_optimal_n1(
        lambda x, _: float(np.sin(3 * x[0]) + np.exp(x[0])),
        (-1.0, 1.0), 1e-10)
    row(C, "auto-N (sin(3x)+e^x @ 1e-10)", f"N={n1}", "—",
        "error-threshold doubling")
    return slider


# ---------------------------------------------------------------------------
# Config 5: portfolio proxy — TT-ALS + completion + algebra
# ---------------------------------------------------------------------------

def run_portfolio():
    from pychebyshev_tpu import ChebyshevTT

    C = "portfolio TT-ALS/algebra"
    dom = [[80.0, 120.0], [0.25, 2.0], [0.1, 0.5], [0.01, 0.05]]

    def inst_a(points, _=None):
        p = np.asarray(points, dtype=np.float64)
        s, t, sg, r = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
        return (5.0 * np.log1p(np.exp((s - 100.0) / 5.0))
                * np.exp(-r * t) * (1 + 0.5 * sg))

    def inst_b(points, _=None):
        p = np.asarray(points, dtype=np.float64)
        s, t, sg, r = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
        return 100.0 * np.exp(-r * t) + 0.1 * s * sg * np.sqrt(t)

    t0 = time.time()
    tta = ChebyshevTT(inst_a, 4, dom, [9] * 4, max_rank=8,
                      tolerance=1e-8, vectorized=True)
    tta.build(verbose=False, method="als", seed=0)
    ttb = ChebyshevTT(inst_b, 4, dom, [9] * 4, max_rank=8,
                      tolerance=1e-8, vectorized=True)
    ttb.build(verbose=False, method="als", seed=1)
    row(C, "two TT-ALS builds", f"{time.time() - t0:.3f} s "
        f"(ranks {tta.tt_ranks} / {ttb.tt_ranks})", "—", "rank-adaptive")

    t0 = time.time()
    tta.run_completion(tolerance=1e-10, max_iter=5)
    row(C, "run_completion (5 iters)", f"{time.time() - t0:.3f} s", "—",
        "fixed-rank sharpening")

    portfolio = tta * 2.0 + ttb
    pts = sample_box(dom, 500, seed=2, margin=0.05)
    exact = 2.0 * inst_a(pts) + inst_b(pts)
    err = np.abs(portfolio.eval_batch(pts) - exact).max() \
        / np.abs(exact).max()
    row(C, "portfolio (2A+B) eval max err/scale", f"{err:.1e}", "—",
        "block-diag add + TT-SVD rounding")

    before = portfolio.eval([100.0, 1.0, 0.3, 0.03])
    portfolio.orth_left(3)
    portfolio.orth_right(0)
    drift = abs(portfolio.eval([100.0, 1.0, 0.3, 0.03]) - before)
    row(C, "orth sweep value drift", f"{drift:.1e}", "—", "QR/LQ sweeps")

    ip = tta.inner_product(ttb)
    dense_ip = float(np.vdot(tta.to_dense()._coeff_dense(),
                             ttb.to_dense()._coeff_dense())) \
        if hasattr(tta.to_dense(), "_coeff_dense") else None
    note = ("core-chain contraction" if dense_ip is None else
            f"vs dense contraction: {abs(ip - dense_ip):.1e}")
    row(C, "<A,B> inner product", f"{ip:.4f}", "—", note)

    sliced = portfolio.slice((3, 0.03))
    pts3 = pts[:100, :3]
    exact3 = 2.0 * inst_a(np.column_stack([pts3, np.full(100, 0.03)])) \
        + inst_b(np.column_stack([pts3, np.full(100, 0.03)]))
    err3 = np.abs(sliced.eval_batch(pts3) - exact3).max() \
        / np.abs(exact3).max()
    row(C, "slice(r=3%) -> 3-D proxy max err/scale", f"{err3:.1e}", "—",
        "core contraction + absorption")
    return portfolio


# ---------------------------------------------------------------------------

def render_markdown() -> str:
    lines = ["# Benchmark table vs reference (BASELINE.md)", ""]
    backend = jax.default_backend()
    lines.append(f"Backend: **{backend}** ({jax.devices()[0].device_kind}); "
                 f"x64 enabled. Reference numbers: single-CPU NumPy "
                 f"(BASELINE.md).")
    lines.append("")
    current = None
    for r in ROWS:
        if r["config"] != current:
            current = r["config"]
            lines += [f"## {current}", "",
                      "| Metric | This repo | Reference | Note |",
                      "|---|---|---|---|"]
        lines.append(f"| {r['metric']} | {r['ours']} | {r['reference']} "
                     f"| {r['note']} |")
        if r is ROWS[-1] or ROWS[ROWS.index(r) + 1]["config"] != current:
            lines.append("")
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend")
    ap.add_argument("--json", default=None, help="write JSON here")
    ap.add_argument("--md", default=None, help="write markdown here")
    ap.add_argument("--batch", type=int, default=None,
                    help="throughput batch size override")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    backend = jax.default_backend()
    batch_n = args.batch or (1 << 20 if backend == "tpu" else 1 << 16)
    print(f"backend={backend}, throughput batch={batch_n:,}",
          file=sys.stderr)

    run_dense(batch_n)
    run_tt(batch_n)
    run_spline(batch_n)
    run_slider(batch_n)
    run_portfolio()

    md = render_markdown()
    print(md)
    if args.md:
        with open(args.md, "w") as f:
            f.write(md + "\n")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"backend": backend, "batch_n": batch_n,
                       "rows": ROWS}, f, indent=1)
        print(f"wrote {args.json}", file=sys.stderr)


if __name__ == "__main__":
    main()
