"""TT-fit engine bench: host vs device ALS at huge N (round 5).

Measures ``fit_tt_cores`` samples/s-per-sweep for the host-f64 engine
and the device engine (design rows, Gram GEMMs, and interface chains
accelerator-resident).  Run on the real chip by default; ``--cpu``
forces the CPU backend (the engines' relative cost there reflects
BLAS-vs-XLA, not the MXU).

    python scripts/bench_tt_fit.py [--cpu] [--n 1000000]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pychebyshev_tpu  # noqa: F401  (x64 on)
import jax

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--skip-host", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    from pychebyshev_tpu.utils.fitting import fit_tt_cores

    rng = np.random.default_rng(0)
    d = 5
    pts = rng.uniform(0.0, 1.0, (args.n, d))
    vals = (np.prod(np.cos(2 * pts), axis=1) + 0.1 * pts.sum(1)
            + rng.normal(0.0, 1e-4, args.n))
    dom = [[0.0, 1.0]] * d

    def run(tag, **kw):
        t0 = time.perf_counter()
        _, diag = fit_tt_cores(pts, vals, dom, [7] * d, max_rank=5,
                               sweeps=args.sweeps, l2=1e-8, **kw)
        dt = time.perf_counter() - t0
        ns = len(diag["sweep_rms"])
        rate = args.n * ns / dt
        print(f"{tag:12s} {dt:7.1f} s  {ns} sweeps  "
              f"{rate:,.0f} sample-sweeps/s  rms {diag['rms']:.3e}")
        return dt

    t_dev = run("device", engine="device")
    # warm second run (first pays jit compiles)
    t_dev2 = run("device-warm", engine="device")
    if not args.skip_host:
        t_host = run("host")
        print(f"speedup (warm device vs host): {t_host / t_dev2:.2f}x")


if __name__ == "__main__":
    main()
