"""Grouped dd TT books on chip: Greek reports on compressed models.

Measures a 6-model TT book (price + 5 first-order Greeks of the 11^5
BS compression) through the per-dim vs grouped digit-GEMM chains —
the round-4 book extension of the grouped supercore serving route.

Run on the real TPU:  python scripts/bench_tt_book_grouped.py
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

    cheb = ChebyshevApproximation(bs_price, 5, DOMAIN,
                                  n_nodes=[11] * 5, vectorized=True)
    cheb.build(verbose=False)
    tt = cheb.to_tt(tolerance=1e-13)
    specs = [[0] * 5] + [[1 if i == k else 0 for i in range(5)]
                         for k in range(5)]
    models = [tt if s == [0] * 5 else tt.differentiate(s)
              for s in specs]
    cores = [tuple(m._cores_on_device(np.float64)) for m in models]
    dom = np.asarray(DOMAIN)
    log(f"book ranks: {[m.tt_ranks for m in models]}")

    n = 1 << 19
    rng = np.random.default_rng(3)
    lo = np.array([b[0] for b in DOMAIN])
    hi = np.array([b[1] for b in DOMAIN])
    pts = jnp.asarray(lo + (hi - lo) * rng.uniform(0.02, 0.98, (n, 5)))

    rows = []
    for label, groups in (("per-dim", None), ("grouped auto", "auto")):
        runner = tt_eval_dd.tt_dd_book_runner(cores, dom,
                                              groups=groups)
        t0 = time.time()
        runner(pts[:4096])
        log(f"{label}: compile+first {time.time() - t0:.1f}s")
        dt = chained_time_fn(lambda p, r=runner: r(p), pts, iters=6,
                             reps=2)
        rows.append({"config": label, "ms": dt * 1e3,
                     "sets_per_sec": n / dt})
        log(f"{label}: {dt * 1e3:.2f} ms -> {n / dt:,.0f} "
            f"full 6-model sets/s")

    a = np.asarray(tt_eval_dd.tt_eval_batch_dd_models(
        cores, dom, np.asarray(pts[:16384]), groups=None))
    b = np.asarray(tt_eval_dd.tt_eval_batch_dd_models(
        cores, dom, np.asarray(pts[:16384]), groups="auto"))
    for m in range(len(models)):
        scale = np.abs(a[m]).max()
        rows.append({"model": m,
                     "grouped_vs_perdim": float(
                         np.abs(a[m] - b[m]).max() / scale)})
        log(f"model {m}: grouped-vs-perdim {rows[-1]['grouped_vs_perdim']:.2e}")

    print(json.dumps(rows, indent=1), flush=True)


if __name__ == "__main__":
    main()
