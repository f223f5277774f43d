"""TT digit-GEMM accuracy-throughput frontier sweep.

The TT analog of ``sweep_dd_frontier.py``: for each pair cutoff,
measures throughput (chained protocol) and max scale-normalized
deviation from the f64 TT chain on the reference's own 5-D
Black-Scholes TT benchmark config.  Writes results as JSON to stdout.

Run on the real TPU:  python scripts/sweep_tt_dd_frontier.py [cutoffs...]
"""

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pychebyshev_tpu import ChebyshevTT  # noqa: E402
from pychebyshev_tpu.ops import tt_eval, tt_eval_dd  # noqa: E402
from pychebyshev_tpu.utils.benchtime import chained_time_fn  # noqa: E402

TT_DOMAIN = [[80.0, 120.0], [90.0, 110.0], [0.25, 1.0],
             [0.15, 0.35], [0.01, 0.08]]
TT_Q = 0.02


def bs_div(points, _data=None):
    from scipy.stats import norm
    p = np.asarray(points, dtype=np.float64)
    s, k, t, sigma, r = (p[:, i] for i in range(5))
    sq = np.sqrt(t)
    d1 = (np.log(s / k) + (r - TT_Q + 0.5 * sigma ** 2) * t) / (sigma * sq)
    d2 = d1 - sigma * sq
    return (s * np.exp(-TT_Q * t) * norm.cdf(d1)
            - k * np.exp(-r * t) * norm.cdf(d2))


def main():
    cutoffs = [int(c) for c in sys.argv[1:]] or [24, 28, 32, 36, 40, 44]
    n_batch = 1 << 20

    tt = ChebyshevTT(bs_div, 5, TT_DOMAIN, [11] * 5, max_rank=15,
                     max_sweeps=10, tolerance=1e-6, vectorized=True)
    tt.build(verbose=False, seed=42)
    cores = tuple(jnp.asarray(c) for c in tt._coeff_cores)
    dom = np.asarray(TT_DOMAIN)
    print(f"ranks={tt.tt_ranks}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(17)
    pts = jnp.asarray(np.stack(
        [rng.uniform(lo, hi, n_batch) for lo, hi in TT_DOMAIN], axis=1))
    small = pts[:4096]

    # All timing first, accuracy after (software f64 degrades later
    # device timings on this platform — CLAUDE.md).
    results = []
    for cutoff in cutoffs:
        fn = lambda p, c=cutoff: tt_eval_dd.tt_eval_batch_dd(
            cores, dom, p, cutoff=c)
        t0 = time.time()
        jax.block_until_ready(fn(pts))      # compile + plane build
        print(f"cutoff {cutoff}: compiled in {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)
        t = chained_time_fn(fn, pts, iters=8, reps=3)
        plan = tt_eval_dd.tt_dd_plan(
            [c.shape for c in tt._coeff_cores], cutoff)
        results.append({
            "cutoff": cutoff,
            "qps": n_batch / t,
            "ms_per_batch": t * 1e3,
            "n_pairs": len(plan["pairs"]),
            "n_gemms_per_dim": sum(1 for js in plan["js_by_i"] if js),
        })
        print(f"cutoff {cutoff}: {n_batch / t / 1e6:.2f}M q/s "
              f"({t * 1e3:.1f} ms; {len(plan['pairs'])} pairs, "
              f"{results[-1]['n_gemms_per_dim']} GEMMs/dim)",
              file=sys.stderr, flush=True)

    truth = np.asarray(tt_eval.tt_eval_batch(cores, dom, small))
    scale = np.abs(truth).max()
    for row in results:
        got = np.asarray(tt_eval_dd.tt_eval_batch_dd(
            cores, dom, small, cutoff=row["cutoff"]))
        row["max_dev"] = float(np.abs(got - truth).max() / scale)
        print(f"cutoff {row['cutoff']}: max scale-normalized dev "
              f"{row['max_dev']:.2e}", file=sys.stderr, flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
