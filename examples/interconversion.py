"""Interconversion: moving models between the four families.

The reference already interconverts through dense tensors
(``ChebyshevTT.to_dense`` / ``from_values``); this framework closes
the matrix with two exact conversions INTO tensor-train form, because
on TPU the TT serving tiers are often the fastest near-f64 path:

    dense.to_tt(tolerance)   TT-SVD of the value tensor (uncapped
                             ranks) — a 5-D Black-Scholes surface
                             compresses to ~[1,11,23,48,8,1] at 1e-12.
    slider.to_tt()           EXACT, no dense materialization: the
                             additive sum maps onto accumulator +
                             pass-through channels (rank 2 between
                             groups), so a 10-D basket converts at
                             machine epsilon.

    tt.to_slider(partition, z)  the reverse: the sliding-technique
                             additive projection of ANY built TT,
                             from exact TT slices — zero evaluations.

Once in TT form a model gains TT algebra (e.g. adding a low-rank
non-additive correction onto a slider-built basket), inner_product,
TT Sobol, ``eval_batch_dd``, and ``.npz`` TT checkpoints.

Run:  python examples/interconversion.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSlider


def basket(points, _data=None):
    p = np.asarray(points, dtype=np.float64)
    return np.sum(np.sin(p), axis=1) + 0.5 * np.sum(p ** 2, axis=1)


def cross_term(points, _data=None):
    # A non-additive correction no slider partition can express.
    p = np.asarray(points, dtype=np.float64)
    return 0.05 * np.prod(np.cos(p[:, :2]), axis=1)


def main():
    rng = np.random.default_rng(0)

    # --- dense -> TT: exact compression of a built surface ----------
    dom5 = [[0.0, 1.0]] * 5

    def surface(points, _data=None):
        p = np.asarray(points, dtype=np.float64)
        return np.exp(-p[:, 0]) * np.sin(p.sum(axis=1)) + p[:, 2] ** 2

    dense = ChebyshevApproximation(surface, 5, dom5, [11] * 5,
                                   vectorized=True)
    dense.build(verbose=False)
    tt = dense.to_tt(tolerance=1e-12)
    pts5 = rng.uniform(0.02, 0.98, (2048, 5))
    want = np.asarray(dense.vectorized_eval_batch(pts5, [0] * 5))
    got = np.asarray(tt.eval_batch(pts5))
    print(f"dense->TT: ranks {tt.tt_ranks}, "
          f"{tt.compression_ratio:.1f}x fewer parameters, "
          f"max dev {np.abs(got - want).max():.2e}")

    # --- slider -> TT: exact, no dense grid ever materializes -------
    d = 10
    dom10 = [[-1.0, 1.0]] * d
    slider = ChebyshevSlider(basket, d, dom10, [9] * d,
                             partition=[[i] for i in range(d)],
                             pivot_point=[0.0] * d, vectorized=True)
    slider.build(verbose=False)
    stt = slider.to_tt()
    pts10 = rng.uniform(-0.95, 0.95, (2048, d))
    want = np.asarray(slider.eval_batch(pts10, [0] * d))
    got = np.asarray(stt.eval_batch(pts10))
    print(f"slider->TT: ranks {stt.tt_ranks} (additive = rank 2), "
          f"max dev {np.abs(got - want).max():.2e}")

    # --- TT algebra the slider could not express ---------------------
    # Build a low-rank TT of the cross term and ADD it to the basket:
    # the slider family has no representation for cross-group terms,
    # but its TT form composes freely.
    from pychebyshev_tpu import ChebyshevTT
    corr = ChebyshevTT(cross_term, d, dom10, [9] * d, max_rank=4,
                       vectorized=True)
    corr.build(verbose=False, seed=0)
    corrected = stt + corr
    truth = basket(pts10) + cross_term(pts10)
    got = np.asarray(corrected.eval_batch(pts10))
    print(f"slider-TT + correction-TT: ranks {corrected.tt_ranks}, "
          f"max dev vs analytic {np.abs(got - truth).max():.2e}")

    # --- the converted model rides the near-f64 TT tier --------------
    got_dd = np.asarray(corrected.eval_batch_dd(pts10[:256]))
    base = np.asarray(corrected.eval_batch(pts10[:256]))
    print(f"corrected model via eval_batch_dd: max dev vs f64 chain "
          f"{np.abs(got_dd - base).max():.2e}")

    # --- and back: TT -> slider (additive projection, zero evals) ----
    # Which dims does the correction couple?  The interaction matrix
    # answers from the cores alone, and suggest_partition turns it
    # into the right additive grouping for the projection.
    part = corrected.suggest_partition(threshold=1e-9)
    print(f"suggested partition of the corrected model: {part}")
    projected = corrected.to_slider(part, [0.0] * d)
    got = np.asarray(projected.eval_batch(pts10[:256], [0] * d))
    print(f"TT -> slider via suggested partition: max residual "
          f"{np.abs(got - base[:256]).max():.2e} (the coupled dims "
          f"grouped together, so the projection is near-exact)")


if __name__ == "__main__":
    main()
