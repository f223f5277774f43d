"""2-D call payoff with a strike kink: plain tensor vs spline.

Demonstrates the point of ChebyshevSpline — a kink destroys spectral
convergence of a global interpolant; placing a knot at the strike
restores it.

Run:  python examples/spline_kink_2d.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import math

import numpy as np

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline


def payoff(x, _):
    # discounted call payoff with a kink at K = 1.0 along dim 0
    return max(x[0] - 1.0, 0.0) * math.exp(-0.1 * x[1])


def max_err(obj, is_spline):
    rng = np.random.default_rng(0)
    pts = np.column_stack([rng.uniform(0, 2, 2000),
                           rng.uniform(0, 1, 2000)])
    exact = np.array([payoff(p, None) for p in pts])
    if is_spline:
        approx = obj.eval_batch(pts, [0, 0])
    else:
        approx = obj.vectorized_eval_batch(pts, [0, 0])
    return np.abs(approx - exact).max()


def main():
    domain = [[0.0, 2.0], [0.0, 1.0]]

    print("nodes/dim | plain tensor max err | spline (knot at K) max err")
    for n in [9, 13, 17, 21]:
        plain = ChebyshevApproximation(payoff, 2, domain, [n, n])
        plain.build(verbose=False)
        spline = ChebyshevSpline(payoff, 2, domain, [n, n], [[1.0], []])
        spline.build(verbose=False)
        print(f"{n:9d} | {max_err(plain, False):20.2e} | "
              f"{max_err(spline, True):26.2e}")

    # Automatic kink detection finds the strike.
    auto = ChebyshevSpline.auto_knots(payoff, 2, domain)
    print(f"auto_knots found knots: {auto.knots}")

    # Derivative routing: delta jumps across the kink.
    sp = ChebyshevSpline(payoff, 2, domain, [15, 9], [[1.0], []])
    sp.build(verbose=False)
    print(f"delta left of strike:  {sp.eval([0.95, 0.5], [1, 0]):+.6f}")
    print(f"delta right of strike: {sp.eval([1.05, 0.5], [1, 0]):+.6f}")


if __name__ == "__main__":
    main()
