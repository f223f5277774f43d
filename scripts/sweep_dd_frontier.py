"""Digit-GEMM accuracy-throughput frontier sweep (VERDICT r2 #2).

Measures, for each pair cutoff, the throughput (chained protocol) and
the max scale-normalized deviation from the true f64 path on the 5-D
Black-Scholes 11^5 benchmark.  Writes results as JSON to stdout.

Run on the real TPU:  python scripts/sweep_dd_frontier.py [cutoffs...]
"""

import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pychebyshev_tpu import ChebyshevApproximation  # noqa: E402
from pychebyshev_tpu.ops import eval as eval_ops  # noqa: E402
from pychebyshev_tpu.ops import eval_dd  # noqa: E402
from pychebyshev_tpu.utils.benchtime import chained_time_fn  # noqa: E402

DOMAIN = [[50.0, 150.0], [50.0, 150.0], [0.1, 2.0], [0.05, 0.5],
          [0.0, 0.1]]


def bs_price(x, _):
    from scipy.stats import norm
    s, k, t, sig, r = x
    d1 = (np.log(s / k) + (r + 0.5 * sig ** 2) * t) / (sig * np.sqrt(t))
    d2 = d1 - sig * np.sqrt(t)
    return s * norm.cdf(d1) - k * np.exp(-r * t) * norm.cdf(d2)


def main():
    cutoffs = [int(c) for c in sys.argv[1:]] or [33, 36, 40, 42, 44, 46]
    n_batch = 1 << 17

    cheb = ChebyshevApproximation(bs_price, 5, DOMAIN, [11] * 5)
    cheb.build(verbose=False)
    nodes, weights, diffs = cheb._grid_tuples()
    tensor = cheb.tensor_values

    rng = np.random.default_rng(17)
    lo = np.array([b[0] for b in DOMAIN])
    hi = np.array([b[1] for b in DOMAIN])
    pts = lo + (hi - lo) * rng.uniform(0.02, 0.98, size=(n_batch, 5))
    pts_dev = jnp.asarray(pts, jnp.float64)
    small = pts_dev[:4096]

    # f64 truth on a subsample (f64 emulation is slow; 4096 points is
    # plenty for a max-deviation estimate).  Run AFTER timing? No:
    # deviations first would poison timings (f64 degradation) — so do
    # all TIMING first at every cutoff, then accuracy, then print.
    results = []
    for cutoff in cutoffs:
        fn = lambda p, c=cutoff: eval_dd.eval_batch_dd(
            tensor, nodes, weights, diffs, p, (0,) * 5, cutoff=c)
        import time as _t
        _t0 = _t.time()
        jax.block_until_ready(fn(pts_dev))  # compile + plane build
        print(f"cutoff {cutoff}: compiled in {_t.time() - _t0:.0f}s",
              file=sys.stderr, flush=True)
        t = chained_time_fn(fn, pts_dev, iters=8, reps=3)
        plan = eval_dd.dd_plan((11,) * 5, cutoff)
        results.append({
            "cutoff": cutoff,
            "qps": n_batch / t,
            "ms_per_batch": t * 1e3,
            "n_pairs": len(plan["pairs"]),
            "n_gemms": sum(1 for js in plan["js_by_i"] if js),
        })
        print(f"cutoff {cutoff}: {n_batch / t / 1e6:.2f}M q/s "
              f"({t * 1e3:.1f} ms; {len(plan['pairs'])} pairs, "
              f"{results[-1]['n_gemms']} GEMMs)", file=sys.stderr,
              flush=True)

    # Accuracy pass (software f64 last — it degrades later timings).
    truth = np.asarray(eval_ops.eval_batch(
        tensor, nodes, weights, diffs, small, (0,) * 5))
    scale = np.abs(truth).max()
    for row in results:
        got = np.asarray(eval_dd.eval_batch_dd(
            tensor, nodes, weights, diffs, small, (0,) * 5,
            cutoff=row["cutoff"]))
        row["max_dev"] = float(np.abs(got - truth).max() / scale)
        print(f"cutoff {row['cutoff']}: max scale-normalized dev "
              f"{row['max_dev']:.2e}", file=sys.stderr, flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
