"""Measured costs of the global-calculus surfaces (host-side search).

Prints a markdown table: certified global minimize per family,
critical-point finding, and system solving, with wall time and box
counts, plus scipy.optimize.differential_evolution on the same
interpolants as an uncertified-heuristic context row.

Run:  python scripts/bench_global_calculus.py
(The search is host-bound; numbers are for the machine it runs on.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import pychebyshev_tpu  # noqa: F401
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from pychebyshev_tpu import (  # noqa: E402
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
    solve_system,
)


def timed(fn, reps=3):
    best = np.inf
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    rows = []

    def waves(p, _):
        p = np.atleast_2d(np.asarray(p, float))
        return (np.sin(3 * p[:, 0]) + np.cos(4 * p[:, 1])
                + 0.5 * p[:, 0] * p[:, 1])

    c2 = ChebyshevApproximation(waves, 2, [[-1.5, 1.5], [-1, 2]],
                                [21, 21], vectorized=True)
    c2.build(verbose=False)
    (v, pt), dt = timed(lambda: c2.minimize(tol=1e-9))
    rows.append(("dense 2-D 21x21 (wavy), certified 1e-9",
                 f"{dt * 1e3:.0f} ms", f"min {v:+.6f}"))

    from scipy.optimize import differential_evolution
    (res, dt) = timed(lambda: differential_evolution(
        lambda x: float(c2.vectorized_eval_batch(x[None], [0, 0])[0]),
        bounds=[(-1.5, 1.5), (-1, 2)], seed=0, tol=1e-10), reps=1)
    rows.append(("  scipy differential_evolution (heuristic, same f)",
                 f"{dt * 1e3:.0f} ms", f"min {res.fun:+.6f}"))

    def bowl3(p, _):
        p = np.atleast_2d(np.asarray(p, float))
        return ((p[:, 0] ** 2 - 0.5) ** 2 + (p[:, 1] - 0.2) ** 2
                + np.exp(0.5 * p[:, 2]) * 0.1)

    c3 = ChebyshevApproximation(bowl3, 3, [[-1, 1]] * 3, [9, 9, 9],
                                vectorized=True)
    c3.build(verbose=False)
    (v, pt), dt = timed(lambda: c3.minimize(tol=1e-9))
    rows.append(("dense 3-D 9^3, certified 1e-9",
                 f"{dt * 1e3:.0f} ms", f"min {v:+.6f}"))

    def osc5(p, _):
        p = np.atleast_2d(np.asarray(p, float))
        return (np.sin(3 * p[:, 0]) * np.cos(2 * p[:, 1])
                + np.sin(2 * p[:, 2] + p[:, 3])
                + 0.5 * np.cos(4 * p[:, 4])
                + 0.2 * np.sin(p[:, 0] * p[:, 4] * 2)
                + 0.1 * np.cos(p[:, 1] + p[:, 2] * p[:, 3]))

    c5 = ChebyshevApproximation(osc5, 5, [[-1, 1]] * 5, [21] * 5,
                                vectorized=True)
    c5.build(verbose=False)
    # The r4 hierarchical-anchoring stress row (VERDICT r3 item 5):
    # pre-anchor this search ran 626 s to the same uncertified state;
    # warm reps amortize the per-shape XLA compiles a long-lived
    # process pays once.
    (v, pt), dt = timed(lambda: c5.minimize(tol=1e-7, max_boxes=5000),
                        reps=2)
    rows.append(("dense 5-D 21^5 oscillatory, tol 1e-7 (5k boxes)",
                 f"{dt:.1f} s", f"min {v:+.6f}"))

    def kinked(p, _):
        p = np.asarray(p, float)
        return np.abs(p[:, 0]) + (p[:, 1] - 0.2) ** 2

    sp = ChebyshevSpline(kinked, 2, [[-1, 1], [-1, 1]], [[9, 9], [9]],
                         knots=[[0.0], []], vectorized=True)
    sp.build(verbose=False)
    (v, pt), dt = timed(lambda: sp.minimize(tol=1e-9))
    rows.append(("spline 2 pieces (kink min at knot), certified 1e-9",
                 f"{dt * 1e3:.0f} ms", f"min {v:+.6f}"))

    def basket(p, _):
        p = np.atleast_2d(np.asarray(p, float))
        return sum((p[:, i] - 0.05 * i) ** 2 for i in range(10))

    sl = ChebyshevSlider(basket, 10, [[-1, 1]] * 10, [9] * 10,
                         partition=[[i] for i in range(10)],
                         pivot_point=[0.0] * 10, vectorized=True)
    sl.build(verbose=False)
    (v, pt), dt = timed(lambda: sl.minimize(tol=1e-9))
    rows.append(("slider 10-D (10 groups), EXACT global",
                 f"{dt * 1e3:.0f} ms", f"min {v:+.2e}"))

    def q3(p, _):
        p = np.asarray(p, float)
        return ((p[:, 0] ** 2 - 0.25) ** 2 + (p[:, 1] - 0.3) ** 2
                + (p[:, 2] + 0.4) ** 2)

    tt = ChebyshevTT(q3, 3, [[-1, 1]] * 3, [9, 9, 9], tolerance=1e-12,
                     max_rank=8, vectorized=True)
    tt.build(verbose=False)
    (v, pt), dt = timed(lambda: tt.minimize(tol=1e-9), reps=2)
    rows.append(("TT 3-D rank<=8, certified 1e-9 (warm; batched chain)",
                 f"{dt * 1e3:.0f} ms", f"min {v:+.2e}"))

    cps, dt = timed(lambda: c3.critical_points())
    rows.append(("critical_points dense 3-D",
                 f"{dt * 1e3:.0f} ms", f"{len(cps)} points"))

    cps, dt = timed(lambda: tt.critical_points(), reps=2)
    rows.append(("critical_points TT 3-D (gradient TTs)",
                 f"{dt * 1e3:.0f} ms", f"{len(cps)} points"))

    f1 = ChebyshevApproximation(
        lambda p, _: p[:, 0] ** 2 + p[:, 1] ** 2 - 0.64, 2,
        [[-1, 1]] * 2, [7, 7], vectorized=True)
    f1.build(verbose=False)
    f2 = ChebyshevApproximation(
        lambda p, _: p[:, 0] - p[:, 1], 2, [[-1, 1]] * 2, [7, 7],
        vectorized=True)
    f2.build(verbose=False)
    roots, dt = timed(lambda: solve_system([f1, f2]))
    rows.append(("solve_system 2x2 (circle x line)",
                 f"{dt * 1e3:.0f} ms", f"{roots.shape[0]} roots"))

    width = max(len(r[0]) for r in rows)
    print(f"| {'case':<{width}} | time | result |")
    print(f"|{'-' * (width + 2)}|------|--------|")
    for name, t, out in rows:
        print(f"| {name:<{width}} | {t} | {out} |")


if __name__ == "__main__":
    main()
