"""The digit-GEMM near-f64 tier across all four interpolant families.

TPU v5e has no f64 hardware: the parity-exact f64 paths run in XLA's
software emulation (~0.3-1M queries/s), and the f32 throughput tiers
trade down to ~1e-5-class deviation.  The digit-GEMM ("dd") tier sits
in between — exact integer bf16 MXU products recombined in double-f32
give ~1e-11-to-1e-13-class agreement with the f64 paths at 7-35M
queries/s per chip (see docs/performance.md for the measured ladder):

    dense    eval_batch_dd            ~7M  q/s @ ~1.6e-11
    TT       eval_batch_dd            ~27M q/s @ ~5e-14
    slider   eval_batch_dd            ~35M q/s @ ~1e-12
    spline   eval_batch_dd            host-routed per-piece dense dd

plus the serving engines: ``BatchedEvaluator(model, dtype="dd")`` on
all four families, ``MultiSpecEvaluator(..., dtype="dd")`` for whole
near-f64 Greek reports, and ``MultiModelEvaluator(..., dtype="dd")``
for books.

Run:  python examples/near_f64_tiers.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)
from pychebyshev_tpu.serving import BatchedEvaluator, MultiSpecEvaluator


def target(points, _data=None):
    p = np.asarray(points, dtype=np.float64)
    if p.ndim == 1:
        p = p[None, :]
    return np.exp(-p[:, 0]) * np.sin(p.sum(axis=1)) + 0.1 * p[:, 1] ** 2


def dev(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)


def main():
    dom4 = [[0.0, 1.0]] * 4
    rng = np.random.default_rng(0)
    pts = rng.uniform(0.02, 0.98, (4096, 4))

    # Dense: the class method and its "fast" preset.
    dense = ChebyshevApproximation(target, 4, dom4, [9] * 4,
                                   vectorized=True)
    dense.build(verbose=False)
    f64 = dense.vectorized_eval_batch(pts, [0] * 4)
    print(f"dense  dd dev vs f64: {dev(dense.eval_batch_dd(pts), f64):.1e}"
          f" (fast: {dev(dense.eval_batch_dd(pts, mode='fast'), f64):.1e})")

    # TT: same spelling; derivatives ride differentiate().
    tt = ChebyshevTT(target, 4, dom4, [9] * 4, max_rank=8,
                     vectorized=True)
    tt.build(verbose=False)
    print(f"TT     dd dev vs f64: {dev(tt.eval_batch_dd(pts), tt.eval_batch(pts)):.1e}")
    delta = tt.differentiate([1, 0, 0, 0])
    print(f"TT d/dx0 dd dev:      {dev(delta.eval_batch_dd(pts), delta.eval_batch(pts)):.1e}")

    # Slider: the additive sum is ONE concatenated digit GEMM.
    slider = ChebyshevSlider(target, 4, dom4, [9] * 4,
                             [[0, 1], [2], [3]], [0.5] * 4,
                             vectorized=True)
    slider.build(verbose=False)
    print(f"slider dd dev vs f64: {dev(slider.eval_batch_dd(pts), slider.eval_batch(pts)):.1e}")

    # Spline: host piece routing + per-piece dense dd.
    def kinked(points, _data=None):
        p = np.asarray(points, dtype=np.float64)
        if p.ndim == 1:
            p = p[None, :]
        return np.abs(p[:, 0] - 0.5) * (1.0 + p[:, 1])

    spline = ChebyshevSpline(kinked, 2, [[0, 1]] * 2, [9, 9],
                             [[0.5], []], vectorized=True)
    spline.build(verbose=False)
    pts2 = rng.uniform(0.02, 0.98, (2048, 2))
    print(f"spline dd dev vs f64: "
          f"{dev(spline.eval_batch_dd(pts2), spline.eval_batch(pts2, [0, 0])):.1e}")

    # Serving: the bucket engine and a near-f64 Greek report.
    engine = BatchedEvaluator(tt, dtype="dd", bucket_sizes=(4096,))
    print(f"TT dd engine dev:     {dev(engine(pts), tt.eval_batch(pts)):.1e}")

    specs = [[0] * 4, [1, 0, 0, 0], [0, 1, 0, 0]]
    report = MultiSpecEvaluator(dense, specs, dtype="dd",
                                bucket_sizes=(4096,))
    table = report(pts)
    worst = max(dev(table[:, m], dense.vectorized_eval_batch(pts, s))
                for m, s in enumerate(specs))
    print(f"dd Greek report (N, {len(specs)}) worst dev: {worst:.1e}")

    # Slider near-f64 Greek report: all specs share one row-plane
    # build over the full slide concatenation.
    sl_report = MultiSpecEvaluator(slider, specs, dtype="dd",
                                   bucket_sizes=(4096,))
    sl_table = sl_report(pts)
    worst = max(dev(sl_table[:, m], slider.eval_batch(pts, list(s)))
                for m, s in enumerate(specs))
    print(f"slider dd report worst dev: {worst:.1e}")

    # TT near-f64 book: differentiate() models, one dispatch per
    # bucket (MultiModelEvaluator dtype="dd" on TT).
    from pychebyshev_tpu.serving import MultiModelEvaluator
    book = MultiModelEvaluator([tt, delta], dtype="dd",
                               bucket_sizes=(4096,))
    rows = book(pts)
    worst = max(dev(rows[0], tt.eval_batch(pts)),
                dev(rows[1], delta.eval_batch(pts)))
    print(f"TT dd book worst dev:       {worst:.1e}")


if __name__ == "__main__":
    main()
