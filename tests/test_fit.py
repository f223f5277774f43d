"""Scattered-data least-squares construction (ChebyshevApproximation.fit).

Beyond-reference capability (the reference constructs only from exact
nodal evaluations — reference barycentric.py build/from_values); these
tests pin the solver (utils/fitting.py) and the classmethod surface.
"""

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.utils.fitting import (
    barycentric_rows_np,
    fit_dense_tensor,
)
from pychebyshev_tpu.ops.chebyshev import (
    barycentric_weights_np,
    nodes_for_dim_np,
)

DOM2 = [[-1.0, 1.0], [0.0, 2.0]]


def _f2(x, y):
    return np.sin(1.3 * x) * np.exp(-0.5 * y) + 0.2 * x * y


def _samples(n, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-1, 0], [1, 2], size=(n, 2))
    return pts, _f2(pts[:, 0], pts[:, 1])


class TestBarycentricRows:
    def test_rows_interpolate_polynomials_exactly(self):
        nodes = nodes_for_dim_np(-1.0, 1.0, 9)
        weights = barycentric_weights_np(nodes)
        x = np.linspace(-0.95, 0.95, 17)
        rows = barycentric_rows_np(x, nodes, weights)
        # exact for any poly of degree < n on the nodal values
        for poly in (lambda t: t ** 3 - 0.5 * t,
                     lambda t: 2 * t ** 7 + t ** 2):
            np.testing.assert_allclose(rows @ poly(nodes), poly(x),
                                       rtol=0, atol=1e-12)

    def test_exact_node_hit_is_one_hot(self):
        nodes = nodes_for_dim_np(0.0, 2.0, 7)
        weights = barycentric_weights_np(nodes)
        rows = barycentric_rows_np(np.array([nodes[3]]), nodes, weights)
        want = np.zeros(7)
        want[3] = 1.0
        np.testing.assert_array_equal(rows[0], want)

    def test_rows_sum_to_one(self):
        nodes = nodes_for_dim_np(-2.0, 5.0, 11)
        weights = barycentric_weights_np(nodes)
        x = np.linspace(-2, 5, 23)
        rows = barycentric_rows_np(x, nodes, weights)
        np.testing.assert_allclose(rows.sum(axis=1), 1.0, atol=1e-12)


class TestFitSolver:
    def test_clean_data_recovers_interpolant_accuracy(self):
        pts, vals = _samples(4000)
        tensor, diag = fit_dense_tensor(pts, vals, DOM2, [11, 11])
        m = ChebyshevApproximation.from_values(tensor, 2, DOM2, [11, 11])
        test, want = _samples(500, seed=9)
        err = np.max(np.abs(m.eval_batch(test, [0, 0]) - want))
        assert err < 1e-8
        assert diag["rank"] == 121
        assert diag["rms"] < 1e-9
        assert diag["max_abs_residual"] < 1e-8

    def test_grid_samples_reproduce_from_values_exactly(self):
        g = ChebyshevApproximation(
            lambda p, d=None: _f2(p[0], p[1]), 2, DOM2, n_nodes=[7, 7])
        g.build(verbose=False)
        gp = g.get_evaluation_points()
        gv = np.asarray(g.eval_batch(gp, [0, 0]))
        tensor, _ = fit_dense_tensor(gp, gv, DOM2, [7, 7])
        np.testing.assert_allclose(
            tensor, np.asarray(g.tensor_values), rtol=0, atol=1e-12)

    def test_noise_is_averaged_down(self):
        rng = np.random.default_rng(4)
        pts, vals = _samples(20000, seed=4)
        noisy = vals + rng.normal(0, 1e-2, vals.shape)
        tensor, diag = fit_dense_tensor(pts, noisy, DOM2, [7, 7],
                                        l2=1e-8)
        m = ChebyshevApproximation.from_values(tensor, 2, DOM2, [7, 7])
        test, want = _samples(500, seed=5)
        err = np.max(np.abs(m.eval_batch(test, [0, 0]) - want))
        # ~N/G = 400 samples per dof: noise shrinks well below sigma
        assert err < 3e-3
        assert 5e-3 < diag["rms"] < 2e-2  # rms ~ sigma, not ~ err

    def test_weighted_fit_prefers_heavy_samples(self):
        # two inconsistent constant levels; weights pick the heavy one
        pts = np.concatenate([_samples(300, seed=1)[0],
                              _samples(300, seed=2)[0]])
        vals = np.concatenate([np.zeros(300), np.ones(300)])
        w = np.concatenate([np.full(300, 1e4), np.full(300, 1.0)])
        tensor, _ = fit_dense_tensor(pts, vals, DOM2, [3, 3], l2=1e-10,
                                     sample_weight=w)
        m = ChebyshevApproximation.from_values(tensor, 2, DOM2, [3, 3])
        mid = float(m.eval([0.0, 1.0], [0, 0]))
        assert abs(mid) < 0.01  # pulled to the heavy level 0

    def test_l2_shrinks_toward_zero(self):
        pts, vals = _samples(500, seed=3)
        t_small, _ = fit_dense_tensor(pts, vals, DOM2, [5, 5], l2=1e-12)
        t_big, _ = fit_dense_tensor(pts, vals, DOM2, [5, 5], l2=1e6)
        assert np.linalg.norm(t_big) < 1e-3 * np.linalg.norm(t_small)

    def test_underdetermined_requires_l2(self):
        pts, vals = _samples(50)
        with pytest.raises(ValueError, match="underdetermined"):
            fit_dense_tensor(pts, vals, DOM2, [11, 11])
        tensor, _ = fit_dense_tensor(pts, vals, DOM2, [11, 11], l2=1e-6)
        assert np.isfinite(tensor).all()

    def test_validation_errors(self):
        pts, vals = _samples(100)
        with pytest.raises(ValueError, match="outside domain"):
            fit_dense_tensor(pts + 10.0, vals, DOM2, [5, 5])
        with pytest.raises(ValueError, match="NaN or Inf"):
            bad = vals.copy()
            bad[3] = np.nan
            fit_dense_tensor(pts, bad, DOM2, [5, 5])
        with pytest.raises(ValueError, match="NaN or Inf"):
            badp = pts.copy()
            badp[0, 0] = np.inf
            fit_dense_tensor(badp, vals, DOM2, [5, 5])
        with pytest.raises(ValueError, match="l2"):
            fit_dense_tensor(pts, vals, DOM2, [5, 5], l2=-1.0)
        with pytest.raises(ValueError, match="positive int"):
            fit_dense_tensor(pts, vals, DOM2, [5, None])
        with pytest.raises(ValueError, match="must be \\(100,\\)"):
            fit_dense_tensor(pts, vals[:50], DOM2, [5, 5])
        with pytest.raises(ValueError, match="at least one"):
            fit_dense_tensor(np.zeros((0, 2)), np.zeros(0), DOM2, [5, 5])
        with pytest.raises(ValueError, match="exceeds the fit solver"):
            fit_dense_tensor(pts, vals, DOM2, [65, 65])
        with pytest.raises(ValueError, match="non-negative"):
            fit_dense_tensor(pts, vals, DOM2, [5, 5],
                             sample_weight=-np.ones(100))
        with pytest.raises(ValueError, match="all zero"):
            fit_dense_tensor(pts, vals, DOM2, [5, 5],
                             sample_weight=np.zeros(100))


class TestFitClassmethod:
    def test_returns_fully_built_model(self):
        pts, vals = _samples(3000)
        m = ChebyshevApproximation.fit(pts, vals, 2, DOM2, [9, 9])
        assert m.is_construction_finished()
        assert m.fit_diagnostics["n_samples"] == 3000
        assert m.n_evaluations == 3000
        # derivative + calculus + serialization all work
        test, want = _samples(200, seed=8)
        err = np.max(np.abs(m.eval_batch(test, [0, 0]) - want))
        assert err < 1e-6
        d = m.eval([0.3, 1.0], [1, 0])
        analytic = 1.3 * np.cos(1.3 * 0.3) * np.exp(-0.5) + 0.2
        assert d == pytest.approx(analytic, rel=1e-5)
        assert np.isfinite(m.integrate())

    def test_length_validation(self):
        pts, vals = _samples(100)
        with pytest.raises(ValueError, match="num_dimensions"):
            ChebyshevApproximation.fit(pts, vals, 2, DOM2, [9])

    def test_pickle_round_trip(self, tmp_path):
        pts, vals = _samples(500)
        m = ChebyshevApproximation.fit(pts, vals, 2, DOM2, [7, 7],
                                       l2=1e-10)
        p = tmp_path / "fit.pkl"
        m.save(str(p))
        back = ChebyshevApproximation.load(str(p))
        pt = [0.2, 0.9]
        assert back.eval(pt, [0, 0]) == pytest.approx(
            m.eval(pt, [0, 0]), rel=0, abs=0)

    def test_composes_with_to_tt_and_serving(self):
        pts, vals = _samples(3000)
        m = ChebyshevApproximation.fit(pts, vals, 2, DOM2, [9, 9])
        tt = m.to_tt(tolerance=1e-12)
        test, _ = _samples(64, seed=12)
        np.testing.assert_allclose(
            np.asarray(tt.eval_batch(test)),
            m.eval_batch(test, [0, 0]), atol=1e-9)
        from pychebyshev_tpu.serving import BatchedEvaluator
        eng = BatchedEvaluator(m, dtype=np.float64)
        np.testing.assert_allclose(np.asarray(eng(test)),
                                   m.eval_batch(test, [0, 0]),
                                   rtol=1e-12)


class TestSplineFit:
    DOM = [[-1.0, 1.0], [0.0, 2.0]]

    @staticmethod
    def _kinked(x, y):
        return np.abs(x) * (1.0 + 0.5 * y) + 0.1 * y * y

    def _samples(self, n, seed=0):
        rng = np.random.default_rng(seed)
        pts = rng.uniform([-1, 0], [1, 2], size=(n, 2))
        return pts, self._kinked(pts[:, 0], pts[:, 1])

    def test_kinked_data_fits_through_the_knot(self):
        from pychebyshev_tpu import ChebyshevSpline
        pts, vals = self._samples(8000)
        sp = ChebyshevSpline.fit(pts, vals, 2, self.DOM, [7, 7],
                                 knots=[[0.0], []])
        test, want = self._samples(800, seed=3)
        err = np.max(np.abs(sp.eval_batch(test, [0, 0]) - want))
        assert err < 1e-9  # piecewise-smooth: spectral through the kink
        # a DENSE fit on the same data cannot do this
        m = ChebyshevApproximation.fit(pts, vals, 2, self.DOM, [7, 7])
        dense_err = np.max(np.abs(m.eval_batch(test, [0, 0]) - want))
        assert dense_err > 100 * err

    def test_diagnostics_aggregate(self):
        from pychebyshev_tpu import ChebyshevSpline
        pts, vals = self._samples(4000, seed=1)
        sp = ChebyshevSpline.fit(pts, vals, 2, self.DOM, [5, 5],
                                 knots=[[0.0], []])
        d = sp.fit_diagnostics
        assert d["n_samples"] == 4000
        assert len(d["per_piece"]) == 2
        assert d["rms"] < 1e-9
        assert sum(p["n_samples"] for p in d["per_piece"]) == 4000

    def test_empty_piece_raises(self):
        from pychebyshev_tpu import ChebyshevSpline
        rng = np.random.default_rng(2)
        pts = rng.uniform([0.1, 0], [1, 2], size=(200, 2))  # x>0 only
        vals = self._kinked(pts[:, 0], pts[:, 1])
        with pytest.raises(ValueError, match="received no samples"):
            ChebyshevSpline.fit(pts, vals, 2, self.DOM, [5, 5],
                                knots=[[0.0], []])

    def test_underdetermined_piece_names_piece(self):
        from pychebyshev_tpu import ChebyshevSpline
        rng = np.random.default_rng(5)
        # 5 samples on the left piece, plenty on the right
        left = rng.uniform([-1, 0], [-0.01, 2], size=(5, 2))
        right = rng.uniform([0.01, 0], [1, 2], size=(500, 2))
        pts = np.concatenate([left, right])
        vals = self._kinked(pts[:, 0], pts[:, 1])
        with pytest.raises(ValueError, match="piece 0 .*underdetermined"):
            ChebyshevSpline.fit(pts, vals, 2, self.DOM, [5, 5],
                                knots=[[0.0], []])
        sp = ChebyshevSpline.fit(pts, vals, 2, self.DOM, [5, 5],
                                 knots=[[0.0], []], l2=1e-8)
        assert sp.is_construction_finished()

    def test_nested_n_nodes_rejected(self):
        from pychebyshev_tpu import ChebyshevSpline
        pts, vals = self._samples(100)
        with pytest.raises(NotImplementedError):
            ChebyshevSpline.fit(pts, vals, 2, self.DOM, [[5, 5], [5]],
                                knots=[[0.0], []])

    def test_weighted_routing_consistency(self):
        from pychebyshev_tpu import ChebyshevSpline
        pts, vals = self._samples(3000, seed=7)
        w = np.ones(3000)
        sp_w = ChebyshevSpline.fit(pts, vals, 2, self.DOM, [5, 5],
                                   knots=[[0.0], []], sample_weight=w)
        sp = ChebyshevSpline.fit(pts, vals, 2, self.DOM, [5, 5],
                                 knots=[[0.0], []])
        test, _ = self._samples(100, seed=8)
        np.testing.assert_allclose(sp_w.eval_batch(test, [0, 0]),
                                   sp.eval_batch(test, [0, 0]),
                                   rtol=1e-12)


class TestReviewRegressions:
    """Round-3 session-10 review findings (fixed)."""

    def test_zero_weight_outlier_excluded_from_max_residual(self):
        pts, vals = _samples(400, seed=20)
        bad = vals.copy()
        bad[7] = 1e6  # known-bad sample, excluded by weight 0
        w = np.ones(400)
        w[7] = 0.0
        tensor, diag = fit_dense_tensor(pts, bad, DOM2, [7, 7],
                                        sample_weight=w)
        # truncation-level residuals only (7-node fit of sin*exp is
        # ~2e-5); the 1e6 outlier is neither reported nor fitted
        assert diag["max_abs_residual"] < 1e-3
        assert diag["rms"] < 1e-4
        m = ChebyshevApproximation.from_values(tensor, 2, DOM2, [7, 7])
        test, want = _samples(100, seed=21)
        assert np.max(np.abs(m.eval_batch(test, [0, 0]) - want)) < 1e-3

    def test_residuals_cover_all_samples_chunked(self):
        # force multiple chunks through the residual pass by monkeying
        # the chunk target down; the last sample carries the worst
        # residual and must be seen.
        import pychebyshev_tpu.utils.fitting as fitting
        pts, vals = _samples(5000, seed=22)
        noisy = vals.copy()
        noisy[-1] += 0.5  # outlier at the END of the data
        old = fitting._CHUNK_ELEMS
        fitting._CHUNK_ELEMS = 1 << 14  # ~330 rows/chunk at G=49
        try:
            _, diag = fitting.fit_dense_tensor(pts, noisy, DOM2, [7, 7])
        finally:
            fitting._CHUNK_ELEMS = old
        assert diag["max_abs_residual"] > 0.4  # outlier residual seen

    def test_spline_fit_zero_weight_piece_names_piece(self):
        from pychebyshev_tpu import ChebyshevSpline
        rng = np.random.default_rng(23)
        pts = rng.uniform([-1, 0], [1, 2], size=(800, 2))
        vals = np.abs(pts[:, 0]) * pts[:, 1]
        w = np.where(pts[:, 0] < 0, 0.0, 1.0)  # left piece all-zero
        with pytest.raises(ValueError, match="piece 0 .*all zero"):
            ChebyshevSpline.fit(pts, vals, 2, [[-1, 1], [0, 2]],
                                [5, 5], knots=[[0.0], []],
                                sample_weight=w)

    def test_fit_routing_matches_eval_routing(self):
        # the shared helper IS eval's routing: fit a function of the
        # piece index and check knot-boundary points agree with
        # eval_batch's piece choice.
        from pychebyshev_tpu import ChebyshevSpline
        from pychebyshev_tpu.models.spline import route_points_to_pieces
        rng = np.random.default_rng(24)
        pts = rng.uniform([-1, 0], [1, 2], size=(2000, 2))
        pts[:50, 0] = 0.0  # exactly on the knot
        vals = np.where(pts[:, 0] >= 0, 1.0, -1.0)  # right piece at knot
        sp = ChebyshevSpline.fit(pts, vals, 2, [[-1, 1], [0, 2]],
                                 [5, 5], knots=[[0.0], []])
        flat = route_points_to_pieces(sp.knots, sp._shape, pts)
        np.testing.assert_array_equal(flat, sp._route_batch(pts))
        out = sp.eval_batch(pts[:50], [0, 0])
        np.testing.assert_allclose(out, 1.0, atol=1e-10)


class TestSliderFit:
    PART = [[0, 1], [2], [3, 4]]
    PIVOT = [0.1] * 5
    DOM5 = [[-1.0, 1.0]] * 5

    @staticmethod
    def _additive(p):
        p = np.asarray(p)
        return (np.sin(p[..., 0]) * p[..., 1] + p[..., 2] ** 3
                + np.cos(p[..., 3] + 0.5 * p[..., 4]) + 2.0)

    def _samples(self, n, seed=0):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-1, 1, (n, 5))
        return pts, self._additive(pts)

    def test_recovers_additive_function(self):
        from pychebyshev_tpu import ChebyshevSlider
        pts, vals = self._samples(20000)
        sl = ChebyshevSlider.fit(pts, vals, 5, self.DOM5, [9] * 5,
                                 self.PART, self.PIVOT)
        test, want = self._samples(500, seed=2)
        err = np.max(np.abs(sl.eval_batch(test) - want))
        assert err < 1e-6
        d = sl.fit_diagnostics
        assert d["columns"] == 1 + 81 + 9 + 81
        # rank excludes exactly the k=3 constant redundancies
        assert d["rank"] == d["columns"] - 3

    def test_matches_direct_build(self):
        from pychebyshev_tpu import ChebyshevSlider
        pts, vals = self._samples(20000, seed=1)
        sl = ChebyshevSlider.fit(pts, vals, 5, self.DOM5, [9] * 5,
                                 self.PART, self.PIVOT)
        direct = ChebyshevSlider(
            lambda p, d=None: self._additive(p), 5, self.DOM5, [9] * 5,
            self.PART, self.PIVOT)
        direct.build(verbose=False)
        test, _ = self._samples(300, seed=3)
        np.testing.assert_allclose(sl.eval_batch(test),
                                   direct.eval_batch(test), atol=1e-6)

    def test_pivot_gauge_identity(self):
        from pychebyshev_tpu import ChebyshevSlider
        pts, vals = self._samples(5000, seed=4)
        sl = ChebyshevSlider.fit(pts, vals, 5, self.DOM5, [7] * 5,
                                 self.PART, self.PIVOT)
        # every slide passes through the pivot value (sliding identity)
        assert sl.eval(self.PIVOT, [0] * 5) == pytest.approx(
            sl.pivot_value, rel=0, abs=1e-12)
        for slide, group in zip(sl.slides, sl.partition):
            sub = [self.PIVOT[d] for d in group]
            assert slide.eval(sub, [0] * len(group)) == pytest.approx(
                sl.pivot_value, abs=1e-9)

    def test_result_is_ordinary_slider(self):
        from pychebyshev_tpu import ChebyshevSlider
        pts, vals = self._samples(8000, seed=5)
        sl = ChebyshevSlider.fit(pts, vals, 5, self.DOM5, [7] * 5,
                                 self.PART, self.PIVOT)
        assert sl.is_construction_finished()
        assert np.isfinite(sl.integrate())
        # derivative routing + differentiate + to_tt all compose
        g = sl.eval([0.2] * 5, [1, 0, 0, 0, 0])
        assert g == pytest.approx(np.cos(0.2) * 0.2, rel=1e-4)
        d = sl.differentiate([0, 0, 1, 0, 0])
        assert d.eval([0.0] * 5, [0] * 5) == pytest.approx(0.0, abs=1e-6)
        tt = sl.to_tt()
        test, _ = self._samples(50, seed=6)
        np.testing.assert_allclose(np.asarray(tt.eval_batch(test)),
                                   sl.eval_batch(test), atol=1e-9)

    def test_noise_and_l2(self):
        from pychebyshev_tpu import ChebyshevSlider
        rng = np.random.default_rng(7)
        pts, vals = self._samples(30000, seed=7)
        noisy = vals + rng.normal(0, 1e-2, 30000)
        sl = ChebyshevSlider.fit(pts, noisy, 5, self.DOM5, [7] * 5,
                                 self.PART, self.PIVOT, l2=1e-8)
        test, want = self._samples(500, seed=8)
        err = np.max(np.abs(sl.eval_batch(test) - want))
        assert err < 5e-3  # well below sigma
        assert 5e-3 < sl.fit_diagnostics["rms"] < 2e-2

    def test_underdetermined_counts_effective_dof(self):
        from pychebyshev_tpu.utils.fitting import fit_additive_tensors
        pts, vals = self._samples(100, seed=9)
        # columns = 1+81+9+81 = 172, dof = 169 > 100 samples
        with pytest.raises(ValueError, match="underdetermined"):
            fit_additive_tensors(pts, vals, self.DOM5, [9] * 5,
                                 self.PART)
        tensors, c0, _ = fit_additive_tensors(
            pts, vals, self.DOM5, [9] * 5, self.PART, l2=1e-6)
        assert all(np.isfinite(t).all() for t in tensors)

    def test_validation(self):
        from pychebyshev_tpu import ChebyshevSlider
        pts, vals = self._samples(100, seed=10)
        with pytest.raises(ValueError, match="cover all dimensions"):
            ChebyshevSlider.fit(pts, vals, 5, self.DOM5, [5] * 5,
                                [[0, 1], [3, 4]], self.PIVOT)
        with pytest.raises(ValueError, match="non-empty"):
            ChebyshevSlider.fit(pts, vals, 5, self.DOM5, [5] * 5,
                                [[0, 1], [], [2, 3, 4]], self.PIVOT)
        with pytest.raises(ValueError, match="pivot_point length"):
            ChebyshevSlider.fit(pts, vals, 5, self.DOM5, [5] * 5,
                                self.PART, [0.1] * 3)

    def test_nonadditive_residual_shows_in_rms(self):
        from pychebyshev_tpu import ChebyshevSlider
        rng = np.random.default_rng(11)
        pts = rng.uniform(-1, 1, (10000, 5))
        # strong cross-group coupling the additive model cannot fit
        vals = self._additive(pts) + 0.5 * pts[:, 0] * pts[:, 2]
        sl = ChebyshevSlider.fit(pts, vals, 5, self.DOM5, [7] * 5,
                                 self.PART, self.PIVOT)
        assert sl.fit_diagnostics["rms"] > 0.05  # honest lack-of-fit


class TestTTFit:
    DOM4 = [[-1.0, 1.0]] * 4

    @staticmethod
    def _lowrank(p):
        p = np.asarray(p)
        return (np.sin(p[..., 0]) * np.sin(p[..., 1])
                * np.sin(p[..., 2]) * np.sin(p[..., 3])
                + np.exp(0.3 * (p[..., 0] + p[..., 3])))

    def _samples(self, n, seed=0):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(-1, 1, (n, 4))
        return pts, self._lowrank(pts)

    def test_recovers_lowrank_nonadditive(self):
        from pychebyshev_tpu import ChebyshevTT
        pts, vals = self._samples(40000)
        tt = ChebyshevTT.fit(pts, vals, 4, self.DOM4, [9] * 4,
                             max_rank=4, seed=1)
        test, want = self._samples(500, seed=2)
        err = np.max(np.abs(np.asarray(tt.eval_batch(test)) - want))
        assert err < 1e-6
        d = tt.fit_diagnostics
        assert d["rms"] < 1e-7
        assert len(d["sweep_rms"]) >= 2
        assert d["sweep_rms"][-1] <= d["sweep_rms"][0]

    def test_beats_additive_fit_on_product_structure(self):
        # the product term is cross-group for ANY partition — a slider
        # fit cannot express it, a rank-4 TT can.
        from pychebyshev_tpu import ChebyshevSlider, ChebyshevTT
        pts, vals = self._samples(30000, seed=3)
        sl = ChebyshevSlider.fit(pts, vals, 4, self.DOM4, [9] * 4,
                                 [[0, 1], [2, 3]], [0.0] * 4)
        tt = ChebyshevTT.fit(pts, vals, 4, self.DOM4, [9] * 4,
                             max_rank=4, seed=0)
        assert tt.fit_diagnostics["rms"] < 1e-6
        assert sl.fit_diagnostics["rms"] > 1e-3  # honest lack of fit

    def test_result_is_ordinary_tt(self):
        from pychebyshev_tpu import ChebyshevTT
        pts, vals = self._samples(30000, seed=4)
        tt = ChebyshevTT.fit(pts, vals, 4, self.DOM4, [7] * 4,
                             max_rank=3, seed=0)
        assert tt.is_construction_finished()
        assert tt.get_constructor_type() == "ChebyshevTT"
        assert np.isfinite(tt.integrate())
        d = tt.differentiate([1, 0, 0, 0])
        test, _ = self._samples(50, seed=5)
        assert np.isfinite(np.asarray(d.eval_batch(test))).all()
        # TT algebra + npz round trip work on the fitted object
        two = tt + tt
        np.testing.assert_allclose(np.asarray(two.eval_batch(test)),
                                   2 * np.asarray(tt.eval_batch(test)),
                                   rtol=1e-9, atol=1e-12)

    def test_seed_determinism(self):
        from pychebyshev_tpu.utils.fitting import fit_tt_cores
        pts, vals = self._samples(5000, seed=6)
        c1, d1 = fit_tt_cores(pts, vals, self.DOM4, [7] * 4,
                              max_rank=2, seed=42, sweeps=3)
        c2, d2 = fit_tt_cores(pts, vals, self.DOM4, [7] * 4,
                              max_rank=2, seed=42, sweeps=3)
        for a, b in zip(c1, c2):
            np.testing.assert_array_equal(a, b)
        assert d1["sweep_rms"] == d2["sweep_rms"]

    def test_noise_and_convergence_reporting(self):
        from pychebyshev_tpu import ChebyshevTT
        rng = np.random.default_rng(7)
        pts, vals = self._samples(40000, seed=7)
        noisy = vals + rng.normal(0, 1e-3, 40000)
        tt = ChebyshevTT.fit(pts, noisy, 4, self.DOM4, [7] * 4,
                             max_rank=4, seed=0, l2=1e-8)
        test, want = self._samples(500, seed=8)
        err = np.max(np.abs(np.asarray(tt.eval_batch(test)) - want))
        assert err < 2e-3  # below ~2 sigma
        # rms reports ~sigma, not the (smaller) true error
        assert 5e-4 < tt.fit_diagnostics["rms"] < 5e-3

    def test_validation(self):
        from pychebyshev_tpu.utils.fitting import fit_tt_cores
        pts, vals = self._samples(100, seed=9)
        with pytest.raises(ValueError, match="at least 2"):
            fit_tt_cores(pts[:, :1], vals, [[-1, 1]], [5],
                         max_rank=2)
        with pytest.raises(ValueError, match="underdetermined"):
            fit_tt_cores(pts, vals, self.DOM4, [9] * 4, max_rank=5,
                         l2=0.0)
        with pytest.raises(ValueError, match="max_rank"):
            fit_tt_cores(pts, vals, self.DOM4, [5] * 4, max_rank=0)
        with pytest.raises(ValueError, match="sweeps"):
            fit_tt_cores(pts, vals, self.DOM4, [5] * 4, max_rank=2,
                         sweeps=0)
        with pytest.raises(ValueError, match="outside domain"):
            fit_tt_cores(pts + 5.0, vals, self.DOM4, [5] * 4,
                         max_rank=2)

    def test_rank_clamping_at_boundaries(self):
        from pychebyshev_tpu.utils.fitting import fit_tt_cores
        pts, vals = self._samples(3000, seed=10)
        # max_rank 50 must clamp to valid TT ranks for n=5 grids
        cores, diag = fit_tt_cores(pts, vals, self.DOM4, [5] * 4,
                                   max_rank=50, sweeps=2, l2=1e-8)
        r = diag["tt_ranks"]
        assert r[0] == 1 and r[-1] == 1
        assert r[1] <= 5 and r[3] <= 5
        for k, c in enumerate(cores):
            assert c.shape[1] == 5


class TestDeviceEngine:
    """engine="device": accelerator-accumulated normal equations.

    The f32/bf16x3 tier for huge noisy sample sets; on the CPU test
    backend the same code path runs through XLA, so equivalence with
    the host-f64 engine is checked directly.
    """

    def test_matches_host_engine_on_noisy_fit(self):
        rng = np.random.default_rng(70)
        pts, clean = _samples(20_000, seed=71)
        noisy = clean + rng.normal(0, 0.01, clean.shape[0])
        host = ChebyshevApproximation.fit(
            pts, noisy, 2, DOM2, [9, 9], l2=1e-9)
        dev = ChebyshevApproximation.fit(
            pts, noisy, 2, DOM2, [9, 9], l2=1e-9, engine="device")
        tst, want = _samples(2000, seed=72)
        h = np.asarray(host.eval_batch(tst, [0, 0]))
        d = np.asarray(dev.eval_batch(tst, [0, 0]))
        # engines agree far below the noise floor
        assert np.sqrt(np.mean((h - d) ** 2)) < 1e-3
        assert np.sqrt(np.mean((d - want) ** 2)) < 0.01
        assert dev.fit_diagnostics["engine"] == "device"
        assert host.fit_diagnostics["engine"] == "host"

    def test_device_engine_with_gradients_and_weights(self):
        rng = np.random.default_rng(73)
        pts, vals = _samples(3000, seed=74)
        # finite-difference d/dx observations
        h = 1e-6
        up = pts.copy(); up[:, 0] += h
        dn = pts.copy(); dn[:, 0] -= h
        gx = (_f2(up[:, 0], up[:, 1]) - _f2(dn[:, 0], dn[:, 1])) / (2 * h)
        sw = rng.uniform(0.5, 2.0, pts.shape[0])
        dev = ChebyshevApproximation.fit(
            pts, vals, 2, DOM2, [9, 9], l2=1e-9, engine="device",
            sample_weight=sw,
            derivative_data=[(pts, [1, 0], gx, 0.5)])
        diag = dev.fit_diagnostics
        assert diag["rms"] < 1e-4
        assert diag["derivative_blocks"][0]["rms"] < 1e-2
        assert np.isfinite(diag["objective_sse"])

    def test_engine_validated(self):
        pts, vals = _samples(100, seed=75)
        with pytest.raises(ValueError, match="engine must be"):
            ChebyshevApproximation.fit(pts, vals, 2, DOM2, [4, 4],
                                       l2=1e-8, engine="gpu")
