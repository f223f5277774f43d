"""10-D basket proxy via the sliding technique + error-threshold auto-N.

A near-separable 10-D function builds from ~100 evaluations instead of
9^10 = 3.5 billion.

Run:  python examples/slider_10d.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time

import numpy as np

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSlider

D = 10
DOMAIN = [[-1.0, 1.0]] * D
WEIGHTS = np.linspace(0.5, 1.5, D)


def basket(points, _=None):
    points = np.asarray(points, dtype=np.float64)
    return (np.sum(WEIGHTS * np.sin(points), axis=1)
            + 0.25 * np.sum(points ** 2, axis=1))


def main():
    t0 = time.time()
    slider = ChebyshevSlider(basket, D, DOMAIN, [9] * D,
                             partition=[[i] for i in range(D)],
                             pivot_point=[0.0] * D, vectorized=True)
    slider.build(verbose=False)
    print(f"build: {time.time() - t0:.3f}s "
          f"({slider.total_build_evals} evaluations vs 9^10 = "
          f"{9 ** 10:,} for the full tensor)")
    print(f"per-slide error estimate sum: {slider.error_estimate():.2e}")

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1, 1, size=(5000, D))
    approx = slider.eval_batch(pts)
    exact = basket(pts)
    print(f"5000 random points: max abs err "
          f"{np.abs(approx - exact).max():.2e} (exact: f is additive)")

    # Derivatives route to the owning slide.
    pt = list(rng.uniform(-1, 1, D))
    d3 = slider.eval(pt, [0] * 3 + [1] + [0] * 6)
    exact_d3 = WEIGHTS[3] * np.cos(pt[3]) + 0.5 * pt[3]
    print(f"d/dx3: {d3:.8f} vs analytic {exact_d3:.8f}")

    # Error-threshold auto-N on a single dimension (capacity estimate).
    n1 = ChebyshevApproximation.get_optimal_n1(
        lambda x, _: float(np.sin(3 * x[0]) + np.exp(x[0])),
        (-1.0, 1.0), 1e-10)
    print(f"auto-N: sin(3x)+exp(x) needs N={n1} for 1e-10")

    # Closed-form integration of the sliding sum.
    total = slider.integrate()
    # exact: sin terms integrate to 0; sum x^2 term = 0.25 * D * (2/3) * 2^(D-1)
    exact_int = 0.25 * D * (2.0 / 3.0) * 2.0 ** (D - 1)
    print(f"integral over [-1,1]^10: {total:.6f} vs exact "
          f"{exact_int:.6f}")


if __name__ == "__main__":
    main()
