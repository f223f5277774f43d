"""Grouped-supercore TT dd serving: the exact-compression route, measured.

Serves the dense 11^5 Black-Scholes benchmark model through
``to_tt`` compression with (a) the round-3 per-dim digit-GEMM chain,
(b) the grouped supercore chain (``ops.tt_eval_dd`` ``groups=``), and
(c) per-bond sup-norm trimming (``to_tt(sup_target=...)``) — the two
levers VERDICT r3 left untried on the dense full-grid 1e-12 x 10M
north-star.  Rows: config -> queries/s (chained protocol) + max
scale-normalized deviation vs the dense f64 eval path.

Run on the real TPU:  python scripts/bench_tt_grouped.py
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pychebyshev_tpu import ChebyshevApproximation  # noqa: E402
from pychebyshev_tpu.ops import tt_eval_dd  # noqa: E402
from pychebyshev_tpu.utils.benchtime import chained_time_fn  # noqa: E402

DOMAIN = [[80.0, 120.0], [90.0, 110.0], [0.25, 2.0], [0.1, 0.5],
          [0.01, 0.05]]


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bs_price(points, _data=None):
    from scipy.stats import norm
    p = np.asarray(points, dtype=np.float64)
    s, k, t, sigma, r = (p[:, i] for i in range(5))
    sq = np.sqrt(t)
    d1 = (np.log(s / k) + (r + 0.5 * sigma ** 2) * t) / (sigma * sq)
    d2 = d1 - sigma * sq
    return s * norm.cdf(d1) - k * np.exp(-r * t) * norm.cdf(d2)


def main():
    t0 = time.time()
    x = jnp.arange(131072.0 + np.random.randint(512))
    jax.jit(lambda a: (a * a).sum())(x).block_until_ready()
    log(f"canary {time.time() - t0:.1f}s on {jax.devices()}")

    cheb = ChebyshevApproximation(bs_price, 5, DOMAIN, n_nodes=[11] * 5,
                                  vectorized=True)
    cheb.build()

    tt_a = cheb.to_tt(tolerance=1e-13)
    tt_c = cheb.to_tt(tolerance=1e-13, sup_target=3e-12)
    log(f"A (tol 1e-13): ranks={tt_a.tt_ranks}")
    log(f"C (sup_target 3e-12): ranks={tt_c.tt_ranks} "
        f"diag={tt_c.compression_diagnostics}")
    shapes_a = tuple(tuple(int(x) for x in c.shape)
                     for c in tt_a._coeff_cores)
    log(f"auto groups for A: {tt_eval_dd.tt_dd_auto_groups(shapes_a)}")

    n = 1 << 20
    rng = np.random.default_rng(7)
    lo = np.array([b[0] for b in DOMAIN])
    hi = np.array([b[1] for b in DOMAIN])
    pts = jnp.asarray(lo + (hi - lo) * rng.uniform(0.02, 0.98, (n, 5)))
    probe = pts[:65536]

    configs = [
        ("A per-dim (r3 baseline)", tt_a, None),
        ("A grouped (2,2,1)", tt_a, (2, 2, 1)),
        ("A grouped (1,2,2)", tt_a, (1, 2, 2)),
        ("A grouped auto", tt_a, "auto"),
        ("C trimmed per-dim", tt_c, None),
        ("C trimmed grouped auto", tt_c, "auto"),
    ]

    # All timing first, accuracy after (software f64 degrades later
    # device timings on this platform — CLAUDE.md).
    rows = []
    for label, tt, groups in configs:
        cores = tt._cores_on_device(np.float64)
        dom = np.asarray(tt.domain, dtype=np.float64)

        def fn(p, cores=cores, dom=dom, groups=groups):
            return tt_eval_dd.tt_eval_batch_dd(cores, dom, p,
                                               groups=groups)

        t0 = time.time()
        fn(probe)  # compile
        log(f"{label}: compile+first {time.time() - t0:.1f}s")
        dt = chained_time_fn(fn, pts, iters=6, reps=2)
        rows.append({"config": label, "groups": str(groups),
                     "ranks": list(tt.tt_ranks), "ms": dt * 1e3,
                     "qps": n / dt})
        log(f"{label}: {dt * 1e3:.2f} ms -> {n / dt:,.0f} q/s")

    # f32 tier: per-dim vs grouped chain on the compression ranks.
    from pychebyshev_tpu.ops.tt_eval import tt_eval_batch
    cores32 = tt_a._cores_on_device(np.float32)
    dom_a = np.asarray(tt_a.domain, dtype=np.float64)
    pts32 = pts.astype(jnp.float32)
    for label, groups in (("A f32 per-dim", None),
                          ("A f32 grouped auto", "auto")):
        def fn32(p, groups=groups):
            return tt_eval_batch(cores32, dom_a, p, groups=groups)

        t0 = time.time()
        fn32(pts32[:65536])
        log(f"{label}: compile+first {time.time() - t0:.1f}s")
        dt = chained_time_fn(fn32, pts32, iters=6, reps=2)
        rows.append({"config": label, "groups": str(groups),
                     "ms": dt * 1e3, "qps": n / dt})
        log(f"{label}: {dt * 1e3:.2f} ms -> {n / dt:,.0f} q/s")

    # Accuracy pass: dense f64 truth on the probe slice.
    dense_ref = np.asarray(cheb.eval_batch(
        np.asarray(probe), derivative_order=[0] * 5))
    scale = np.abs(dense_ref).max()
    for row, (label, tt, groups) in zip(rows, configs):
        cores = tt._cores_on_device(np.float64)
        dom = np.asarray(tt.domain, dtype=np.float64)
        out = np.asarray(tt_eval_dd.tt_eval_batch_dd(
            cores, dom, probe, groups=groups))
        row["dev_vs_dense_f64"] = float(
            np.abs(out - dense_ref).max() / scale)
        log(f"{row['config']}: dev {row['dev_vs_dense_f64']:.2e}")

    print(json.dumps(rows, indent=1), flush=True)


if __name__ == "__main__":
    main()
