"""Coverage for validation branches the feature tests skip.

The additive and TT fitters duplicate the dense fitter's input gate;
these parametric probes pin every branch (the line-coverage sweep
showed them unexecuted), plus the per-box `_tt_box_stats` spec kept as
the reference implementation for the batched TT bounder.
"""

import numpy as np
import pytest

from pychebyshev_tpu.ops import subdivision as sd
from pychebyshev_tpu.utils import fitting

DOM4 = [[0.0, 1.0]] * 4
GROUPS = [[0, 1], [2, 3]]


def _good(n=200, d=4):
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (n, d))
    return pts, pts.sum(axis=1)


class TestAdditiveFitValidation:
    def test_domain_length(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="len\\(domain\\)"):
            fitting.fit_additive_tensors(pts, y, DOM4[:3], [5] * 4,
                                         GROUPS)

    def test_points_shape(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="points must be"):
            fitting.fit_additive_tensors(pts[:, :3], y, DOM4, [5] * 4,
                                         GROUPS)

    def test_values_shape(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="values must be"):
            fitting.fit_additive_tensors(pts, y[:-1], DOM4, [5] * 4,
                                         GROUPS)

    def test_empty(self):
        with pytest.raises(ValueError, match="at least one sample"):
            fitting.fit_additive_tensors(np.zeros((0, 4)), np.zeros(0),
                                         DOM4, [5] * 4, GROUPS)

    def test_nonfinite_points(self):
        pts, y = _good()
        pts[0, 0] = np.nan
        with pytest.raises(ValueError, match="points contain"):
            fitting.fit_additive_tensors(pts, y, DOM4, [5] * 4, GROUPS)

    def test_nonfinite_values(self):
        pts, y = _good()
        y[0] = np.inf
        with pytest.raises(ValueError, match="values contain"):
            fitting.fit_additive_tensors(pts, y, DOM4, [5] * 4, GROUPS)

    def test_bad_l2(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="l2 must be"):
            fitting.fit_additive_tensors(pts, y, DOM4, [5] * 4, GROUPS,
                                         l2=-1.0)

    def test_empty_group(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="non-empty"):
            fitting.fit_additive_tensors(pts, y, DOM4, [5] * 4,
                                         [[0, 1], [], [2, 3]])

    def test_bad_cover(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="cover dims"):
            fitting.fit_additive_tensors(pts, y, DOM4, [5] * 4,
                                         [[0, 1], [2, 2]])

    def test_bad_n_nodes(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="n_nodes"):
            fitting.fit_additive_tensors(pts, y, DOM4, [5, 5, 0, 5],
                                         GROUPS)

    def test_out_of_domain(self):
        pts, y = _good()
        pts[0, 2] = 1.5
        with pytest.raises(ValueError, match="outside domain"):
            fitting.fit_additive_tensors(pts, y, DOM4, [5] * 4, GROUPS)

    def test_bad_weight_shape(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="sample_weight"):
            fitting.fit_additive_tensors(pts, y, DOM4, [5] * 4, GROUPS,
                                         sample_weight=np.ones(3))

    def test_negative_weight(self):
        pts, y = _good()
        w = np.ones(len(y))
        w[0] = -1.0
        with pytest.raises(ValueError, match="non-negative"):
            fitting.fit_additive_tensors(pts, y, DOM4, [5] * 4, GROUPS,
                                         sample_weight=w)

    def test_all_zero_weight(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="all zero"):
            fitting.fit_additive_tensors(
                pts, y, DOM4, [5] * 4, GROUPS,
                sample_weight=np.zeros(len(y)))


class TestTTFitValidation:
    def test_needs_2d(self):
        pts, y = _good(50, 1)
        with pytest.raises(ValueError, match="at least 2"):
            fitting.fit_tt_cores(pts, y, [[0, 1]], [5])

    def test_domain_length(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="len\\(domain\\)"):
            fitting.fit_tt_cores(pts, y, DOM4[:3], [5] * 4)

    def test_points_shape(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="points must be"):
            fitting.fit_tt_cores(pts[:, :2], y, DOM4, [5] * 4)

    def test_values_shape(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="values must be"):
            fitting.fit_tt_cores(pts, y[:-1], DOM4, [5] * 4)

    def test_empty(self):
        with pytest.raises(ValueError, match="at least one sample"):
            fitting.fit_tt_cores(np.zeros((0, 4)), np.zeros(0), DOM4,
                                 [5] * 4)

    def test_nonfinite(self):
        pts, y = _good()
        pts[1, 1] = np.inf
        with pytest.raises(ValueError, match="points contain"):
            fitting.fit_tt_cores(pts, y, DOM4, [5] * 4)
        pts[1, 1] = 0.5
        y[1] = np.nan
        with pytest.raises(ValueError, match="values contain"):
            fitting.fit_tt_cores(pts, y, DOM4, [5] * 4)

    def test_bad_l2_rank_sweeps(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="l2 must be"):
            fitting.fit_tt_cores(pts, y, DOM4, [5] * 4, l2=np.inf)
        with pytest.raises(ValueError, match="max_rank"):
            fitting.fit_tt_cores(pts, y, DOM4, [5] * 4, max_rank=0)
        with pytest.raises(ValueError, match="sweeps"):
            fitting.fit_tt_cores(pts, y, DOM4, [5] * 4, sweeps=0)

    def test_bad_n_nodes(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="n_nodes"):
            fitting.fit_tt_cores(pts, y, DOM4, [5, 5, -1, 5])

    def test_bad_domain_order(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="strictly less"):
            fitting.fit_tt_cores(pts, y,
                                 [[0, 1], [1, 0], [0, 1], [0, 1]],
                                 [5] * 4)

    def test_out_of_domain(self):
        pts, y = _good()
        pts[3, 0] = -0.5
        with pytest.raises(ValueError, match="outside domain"):
            fitting.fit_tt_cores(pts, y, DOM4, [5] * 4)

    def test_weight_validation(self):
        pts, y = _good()
        with pytest.raises(ValueError, match="sample_weight"):
            fitting.fit_tt_cores(pts, y, DOM4, [5] * 4,
                                 sample_weight=np.ones(2))
        with pytest.raises(ValueError, match="all zero"):
            fitting.fit_tt_cores(pts, y, DOM4, [5] * 4,
                                 sample_weight=np.zeros(len(y)))


class TestTTBoxStatsSpec:
    def test_per_box_spec_matches_batch(self):
        # _tt_box_stats is the per-box SPEC the batched bounder must
        # reproduce exactly.
        rng = np.random.default_rng(0)
        cores = [rng.normal(size=(1, 9, 4)),
                 rng.normal(size=(4, 9, 5)) * 0.3,
                 rng.normal(size=(5, 9, 1)) * 0.2]
        boxes = np.stack([
            np.array([[-1.0, 1.0], [-1.0, 0.0], [0.25, 0.75]]),
            np.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]]),
            np.array([[-0.5, -0.25], [0.0, 0.5], [-1.0, -0.5]]),
        ])
        bm, br, bc, bt = sd._tt_box_stats_batch(cores, boxes)
        for b in range(3):
            m, r, c, t = sd._tt_box_stats(cores, boxes[b])
            assert abs(m - bm[b]) < 1e-12
            assert abs(r - br[b]) < 1e-12
            assert abs(c - bc[b]) < 1e-12
            np.testing.assert_allclose(t, bt[b], atol=1e-12)
