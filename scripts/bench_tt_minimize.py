"""A/B bench: anchored vs full-chain TT certified minimization.

Round-5 measurement for the TT rank/degree anchoring in
``ops.subdivision.minimize_tt_cores``: a 10-D rank-8 coefficient-core
chain minimized with the CURRENT working tree and, with ``--ab``, with
the implementation at git HEAD — same cores and seed, results and
certificates compared.

CPU-only.  Run: python scripts/bench_tt_minimize.py [--ab]
"""

import argparse
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def _load_head(ref="r5-pre-anchor"):
    import importlib.util

    src = subprocess.run(
        ["git", "show",
         f"{ref}:pychebyshev_tpu/ops/subdivision.py"],
        check=True, capture_output=True, text=True,
        cwd=Path(__file__).resolve().parent.parent).stdout
    tmp = tempfile.NamedTemporaryFile(
        "w", suffix="_subdivision_head.py", delete=False)
    tmp.write(src)
    tmp.close()
    spec = importlib.util.spec_from_file_location(
        "subdivision_head_tt", tmp.name)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _build_chain(d=10, n=7, max_rank=8):
    """10-D rank-8 coefficient-core chain via TT-Cross on a smooth
    coupled function (a basket-style payoff surrogate)."""
    from pychebyshev_tpu import ChebyshevTT

    w = 0.6 + 0.4 * np.cos(np.arange(d))

    def f(pts, _data=None):
        x = np.asarray(pts)
        s = x @ w
        return np.exp(-0.5 * np.sum(x * x, axis=-1) / d) \
            * np.cos(1.7 * s) + 0.1 * s

    tt = ChebyshevTT(f, d, [[-1.0, 1.0]] * d, [n] * d,
                     max_rank=max_rank, tolerance=1e-12,
                     vectorized=True)
    tt.build(verbose=False)
    return [np.asarray(c, dtype=np.float64)
            for c in tt._coeff_cores], tt


def _run(tag, fn, cores, tol, max_boxes):
    t0 = time.perf_counter()
    res = fn(cores, tol=tol, max_boxes=max_boxes)
    dt = time.perf_counter() - t0
    print(f"  {tag:10s} {dt:8.2f} s   value {res.value:+.12e}  "
          f"gap {res.gap:.2e}  certified {res.certified}  "
          f"boxes {res.boxes}")
    return dt, res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ab", action="store_true")
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--max-boxes", type=int, default=400000)
    args = ap.parse_args()

    from pychebyshev_tpu.ops.subdivision import minimize_tt_cores

    cores, tt = _build_chain()
    print(f"10-D chain, ranks {[c.shape[2] for c in cores[:-1]]}, "
          f"n=7 per dim, tol={args.tol}")
    t_new, r_new = _run("anchored", minimize_tt_cores, cores,
                        args.tol, args.max_boxes)
    if args.ab:
        head = _load_head()
        t_old, r_old = _run("HEAD", head.minimize_tt_cores, cores,
                            args.tol, args.max_boxes)
        dv = abs(r_new.value - r_old.value)
        print(f"  speedup {t_old / t_new:5.2f}x   |dvalue| {dv:.2e}  "
              f"certified {r_old.certified} -> {r_new.certified}")


if __name__ == "__main__":
    main()
