"""Generate committed .pcb test fixtures + expected evaluation values.

Writes three fixtures to tests/fixtures/ (same trio as the reference
repo's cross-language fixture set):
  approx_2d_simple.pcb   — 2-D sin(x)+cos(y), 7x9 grid
  approx_5d_bs.pcb       — 5-D Black-Scholes, 6^5 grid (small on purpose)
  spline_1d_kink.pcb     — 1-D |x| with a knot at 0, 9 nodes/piece

Each fixture gets a sibling ``<name>.expected`` text file with
``x0 x1 ... expected_value`` rows produced by this library's own
evaluator, consumed by the C++ test binary (cpp/test_pcb_reader.cpp) to
verify cross-language numerical agreement.

Run from the repo root:  python scripts/generate_test_fixtures.py
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Host-side data generation: force the CPU backend (the container may pin
# a tunneled TPU platform whose remote compiles dwarf the actual work).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline  # noqa: E402

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures")
# --out DIR writes elsewhere (CI smoke-runs the generator without
# touching the committed fixtures).
if "--out" in sys.argv:
    FIXTURES = sys.argv[sys.argv.index("--out") + 1]
    os.makedirs(FIXTURES, exist_ok=True)


def write_expected(path, obj, points, is_spline=False):
    with open(path, "w") as f:
        for pt in points:
            if is_spline:
                val = obj.eval(list(pt), [0] * obj.num_dimensions)
            else:
                val = obj.vectorized_eval(list(pt),
                                          [0] * obj.num_dimensions)
            coords = " ".join(f"{x:.17g}" for x in pt)
            f.write(f"{coords} {val:.17g}\n")


def main():
    os.makedirs(FIXTURES, exist_ok=True)

    # --- 2-D simple ---
    cheb2 = ChebyshevApproximation(
        lambda x, _: math.sin(x[0]) + math.cos(x[1]),
        2, [[-1.0, 1.0], [0.0, 2.0]], [7, 9])
    cheb2.build(verbose=False)
    cheb2.save(os.path.join(FIXTURES, "approx_2d_simple.pcb"),
               format="binary")
    rng = np.random.default_rng(0)
    pts2 = np.column_stack([rng.uniform(-1, 1, 5), rng.uniform(0, 2, 5)])
    write_expected(os.path.join(FIXTURES, "approx_2d_simple.expected"),
                   cheb2, pts2)

    # --- 5-D Black-Scholes ---
    from scipy.stats import norm

    def bs(points, _):
        points = np.asarray(points, dtype=np.float64)
        s, k, t, sigma, r = (points[:, i] for i in range(5))
        sqrt_t = np.sqrt(t)
        d1 = (np.log(s / k) + (r + 0.5 * sigma ** 2) * t) / (sigma * sqrt_t)
        d2 = d1 - sigma * sqrt_t
        return s * norm.cdf(d1) - k * np.exp(-r * t) * norm.cdf(d2)

    domain = [[80.0, 120.0], [90.0, 110.0], [0.25, 2.0], [0.1, 0.5],
              [0.01, 0.05]]
    cheb5 = ChebyshevApproximation(bs, 5, domain, [6] * 5,
                                   vectorized=True)
    cheb5.build(verbose=False)
    cheb5.save(os.path.join(FIXTURES, "approx_5d_bs.pcb"), format="binary")
    lo = np.array([b[0] for b in domain])
    hi = np.array([b[1] for b in domain])
    pts5 = lo + (hi - lo) * rng.uniform(0.1, 0.9, size=(5, 5))
    write_expected(os.path.join(FIXTURES, "approx_5d_bs.expected"),
                   cheb5, pts5)

    # --- 1-D spline with a kink ---
    sp = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1.0, 1.0]], [9],
                         [[0.0]])
    sp.build(verbose=False)
    sp.save(os.path.join(FIXTURES, "spline_1d_kink.pcb"), format="binary")
    pts1 = np.array([[-0.77], [-0.2], [0.0], [0.33], [0.9]])
    write_expected(os.path.join(FIXTURES, "spline_1d_kink.expected"),
                   sp, pts1, is_spline=True)

    print(f"fixtures written to {FIXTURES}")


if __name__ == "__main__":
    main()
