"""Gradient-enhanced scattered-data fitting (derivative_data blocks).

Beyond-reference capability on top of fit(): derivative observations
(AAD / pathwise Greeks, the differential-machine-learning shape) join
the least-squares system as rows with the spectral differentiation
matrix folded into the per-dim design rows —
``utils/fitting.py::normalize_derivative_data`` and the
``derivative_data=`` kwarg on all four families' ``fit``.
"""

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)
from pychebyshev_tpu.utils.fitting import (
    fit_dense_tensor,
    normalize_derivative_data,
)

DOM2 = [[-1.0, 2.0], [0.5, 3.0]]


def _source_model(seed=0):
    """A realizable 2-D target: a built dense model itself."""
    def f(p, _):
        return np.sin(p[:, 0]) * np.cos(p[:, 1]) + p[:, 0] ** 2

    src = ChebyshevApproximation(f, 2, DOM2, [6, 6], vectorized=True)
    src.build(verbose=False)
    return src


def _points(n, dom, seed=0):
    rng = np.random.default_rng(seed)
    return np.column_stack(
        [rng.uniform(lo, hi, n) for lo, hi in dom])


class TestDenseGradientFit:
    def test_exact_recovery_values_plus_gradients(self):
        # 20 value rows < 36 unknowns, but +2 gradient blocks make the
        # l2=0 system determined — and the target is realizable, so
        # recovery is exact to solver precision.
        src = _source_model()
        pts = _points(20, DOM2, seed=1)
        vals = np.asarray(src.eval_batch(pts, derivative_order=[0, 0]))
        gx = np.asarray(src.eval_batch(pts, derivative_order=[1, 0]))
        gy = np.asarray(src.eval_batch(pts, derivative_order=[0, 1]))
        fit = ChebyshevApproximation.fit(
            pts, vals, 2, DOM2, [6, 6],
            derivative_data=[(pts, [1, 0], gx), (pts, [0, 1], gy)])
        tst = _points(200, DOM2, seed=2)
        got = np.asarray(fit.eval_batch(tst, derivative_order=[0, 0]))
        want = np.asarray(src.eval_batch(tst, derivative_order=[0, 0]))
        assert np.max(np.abs(got - want)) < 1e-8
        # ... and the fitted model's own derivatives match the observed
        # blocks (the whole point of gradient data).
        dgot = np.asarray(fit.eval_batch(pts, derivative_order=[1, 0]))
        assert np.max(np.abs(dgot - gx)) < 1e-8

    def test_values_only_same_rows_is_underdetermined(self):
        src = _source_model()
        pts = _points(20, DOM2, seed=1)
        vals = np.asarray(src.eval_batch(pts, derivative_order=[0, 0]))
        with pytest.raises(ValueError, match="underdetermined"):
            ChebyshevApproximation.fit(pts, vals, 2, DOM2, [6, 6])

    def test_exactly_determined_row_count(self):
        # N value rows + block rows == G exactly still solves at l2=0.
        src = _source_model()
        pts = _points(18, DOM2, seed=3)
        vals = np.asarray(src.eval_batch(pts, derivative_order=[0, 0]))
        gx = np.asarray(src.eval_batch(pts, derivative_order=[1, 0]))
        fit = ChebyshevApproximation.fit(
            pts, vals, 2, DOM2, [6, 6],
            derivative_data=[(pts, [1, 0], gx)])
        assert fit.fit_diagnostics["rms"] < 1e-9

    def test_second_order_block(self):
        src = _source_model()
        pts = _points(40, DOM2, seed=4)
        vals = np.asarray(src.eval_batch(pts, derivative_order=[0, 0]))
        gxx = np.asarray(src.eval_batch(pts, derivative_order=[2, 0]))
        fit = ChebyshevApproximation.fit(
            pts, vals, 2, DOM2, [6, 6],
            derivative_data=[(pts, [2, 0], gxx)])
        dgot = np.asarray(fit.eval_batch(pts, derivative_order=[2, 0]))
        assert np.max(np.abs(dgot - gxx)) < 1e-7

    def test_diagnostics_schema(self):
        src = _source_model()
        pts = _points(50, DOM2, seed=5)
        vals = np.asarray(src.eval_batch(pts, derivative_order=[0, 0]))
        gx = np.asarray(src.eval_batch(pts, derivative_order=[1, 0]))
        fit = ChebyshevApproximation.fit(
            pts, vals, 2, DOM2, [6, 6],
            derivative_data=[(pts, [1, 0], gx, 2.5)])
        diag = fit.fit_diagnostics
        (block,) = diag["derivative_blocks"]
        assert block["orders"] == [1, 0]
        assert block["n_samples"] == 50
        assert block["weight"] == 2.5
        assert block["rms"] < 1e-9
        assert block["max_abs_residual"] >= block["rms"]
        assert diag["objective_sse"] >= diag["sse"]
        # No derivative data -> no block keys (schema unchanged).
        fit2 = ChebyshevApproximation.fit(pts, vals, 2, DOM2, [4, 4])
        assert "derivative_blocks" not in fit2.fit_diagnostics
        assert "objective_sse" not in fit2.fit_diagnostics

    def test_noisy_gradients_reduce_test_error(self):
        # Differential-ML effect: at fixed sample count, adding (even
        # noisy) gradient observations reduces out-of-sample error.
        rng = np.random.default_rng(7)

        def f(x, y):
            return np.sin(1.5 * x) * np.exp(-0.4 * y)

        def fx(x, y):
            return 1.5 * np.cos(1.5 * x) * np.exp(-0.4 * y)

        def fy(x, y):
            return -0.4 * np.sin(1.5 * x) * np.exp(-0.4 * y)

        pts = _points(60, DOM2, seed=8)
        x, y = pts[:, 0], pts[:, 1]
        noise = 1e-3
        vals = f(x, y) + noise * rng.standard_normal(60)
        gx = fx(x, y) + noise * rng.standard_normal(60)
        gy = fy(x, y) + noise * rng.standard_normal(60)
        tst = _points(400, DOM2, seed=9)
        want = f(tst[:, 0], tst[:, 1])

        plain = ChebyshevApproximation.fit(
            pts, vals, 2, DOM2, [6, 6], l2=1e-10)
        grad = ChebyshevApproximation.fit(
            pts, vals, 2, DOM2, [6, 6], l2=1e-10,
            derivative_data=[(pts, [1, 0], gx), (pts, [0, 1], gy)])
        err_plain = np.sqrt(np.mean((np.asarray(
            plain.eval_batch(tst, derivative_order=[0, 0])) - want) ** 2))
        err_grad = np.sqrt(np.mean((np.asarray(
            grad.eval_batch(tst, derivative_order=[0, 0])) - want) ** 2))
        assert err_grad < err_plain

    def test_block_weight_trades_residuals(self):
        # On an unrealizable (noisy) problem, upweighting the gradient
        # block must not worsen its residual.
        rng = np.random.default_rng(11)
        pts = _points(80, DOM2, seed=12)
        vals = rng.standard_normal(80)
        gx = rng.standard_normal(80)
        lo = fit_dense_tensor(pts, vals, DOM2, [4, 4],
                              derivative_data=[(pts, [1, 0], gx, 1e-3)])[1]
        hi = fit_dense_tensor(pts, vals, DOM2, [4, 4],
                              derivative_data=[(pts, [1, 0], gx, 1e3)])[1]
        assert (hi["derivative_blocks"][0]["rms"]
                <= lo["derivative_blocks"][0]["rms"])
        assert hi["rms"] >= lo["rms"]


class TestDerivativeDataValidation:
    def setup_method(self):
        self.pts = _points(10, DOM2, seed=20)
        self.vals = np.zeros(10)

    def _fit(self, blocks):
        return ChebyshevApproximation.fit(
            self.pts, self.vals, 2, DOM2, [4, 4], l2=1e-8,
            derivative_data=blocks)

    def test_orders_length(self):
        with pytest.raises(ValueError, match="orders must have length"):
            self._fit([(self.pts, [1], self.vals)])

    def test_negative_order(self):
        with pytest.raises(ValueError, match="non-negative int"):
            self._fit([(self.pts, [-1, 0], self.vals)])

    def test_order_at_least_n_nodes(self):
        with pytest.raises(ValueError, match="identically zero"):
            self._fit([(self.pts, [4, 0], self.vals)])

    def test_points_outside_domain(self):
        bad = self.pts.copy()
        bad[0, 0] = DOM2[0][1] + 1.0
        with pytest.raises(ValueError, match="outside domain"):
            self._fit([(bad, [1, 0], self.vals)])

    def test_nonfinite_values(self):
        bad = self.vals.copy()
        bad[3] = np.nan
        with pytest.raises(ValueError, match="NaN or Inf"):
            self._fit([(self.pts, [1, 0], bad)])

    def test_bad_weight(self):
        with pytest.raises(ValueError, match="weight must be finite"):
            self._fit([(self.pts, [1, 0], self.vals, 0.0)])

    def test_bad_tuple_arity(self):
        with pytest.raises(ValueError, match="must be"):
            self._fit([(self.pts, [1, 0])])

    def test_empty_block(self):
        with pytest.raises(ValueError, match="at least one sample"):
            self._fit([(self.pts[:0], [1, 0], self.vals[:0])])

    def test_values_shape_mismatch(self):
        with pytest.raises(ValueError, match="values must be"):
            self._fit([(self.pts, [1, 0], self.vals[:5])])

    def test_default_weight_is_one(self):
        blocks = normalize_derivative_data(
            [(self.pts, [1, 0], self.vals)], 2, DOM2, [4, 4])
        assert blocks[0][3] == 1.0


class TestStructuralDeterminedness:
    """Derivative rows only count up to their D^o rank (review F1).

    Raw row totals would let rank-deficient systems through to a
    silent min-norm solve; these pin the capped accounting.
    """

    def test_dense_derivative_rows_cap_at_do_rank(self):
        # 1 value + 35 d/dx rows on a [6,6] grid: the block's rows
        # span at most (6-1)*6 = 30 directions, so 1 + 30 < 36 — must
        # raise, not silently min-norm a rank-31 system.
        src = _source_model()
        pts = _points(35, DOM2, seed=60)
        gx = np.asarray(src.eval_batch(pts, derivative_order=[1, 0]))
        v1 = np.asarray(src.eval_batch(pts[:1], derivative_order=[0, 0]))
        with pytest.raises(ValueError, match="informative rows"):
            ChebyshevApproximation.fit(
                pts[:1], v1, 2, DOM2, [6, 6],
                derivative_data=[(pts, [1, 0], gx)])

    def test_slider_starved_group_raises(self):
        # 4 values + 16 group-0-only derivative rows: group 1's 16
        # nodal values see only the 4 value rows — the old raw count
        # (20 rows >= 20 dof) trained to rms 1e-15 and returned
        # garbage out-of-sample.
        dom3 = [[0.0, 1.0]] * 3
        part = [[0], [1, 2]]
        pts = _points(4, dom3, seed=61)
        vals = np.ones(4)
        dpts = _points(16, dom3, seed=62)
        dvals = np.zeros(16)
        with pytest.raises(ValueError, match="underdetermined"):
            ChebyshevSlider.fit(
                pts, vals, 3, dom3, [5, 4, 4], part, [0.5] * 3,
                derivative_data=[(dpts, [1, 0, 0], dvals)])

    def test_tt_high_order_block_rows_capped(self):
        # A (4,4,4)-order block's rows all live in a 1-dim space
        # (prod(5-4) = 1): 10 values + 15 such rows must still be
        # underdetermined for a 20-unknown core.
        dom3 = [[0.0, 1.0]] * 3
        pts = _points(10, dom3, seed=63)
        dpts = _points(15, dom3, seed=64)
        with pytest.raises(ValueError, match="informative rows"):
            ChebyshevTT.fit(
                pts, np.ones(10), 3, dom3, [5, 5, 5], max_rank=2,
                l2=0.0,
                derivative_data=[(dpts, [4, 4, 4], np.zeros(15))])


class TestSliderGradientFit:
    DOM3 = [[0.0, 1.0]] * 3
    PART = [[0], [1, 2]]

    @staticmethod
    def _f(p):
        # Realizable at n=[5,4,4]: degree-3 in x plus degree-(2,1) in
        # (y, z).
        return 2.0 + (0.5 * p[:, 0] ** 3 - p[:, 0]) \
            + p[:, 1] ** 2 * p[:, 2]

    def test_recovery_with_group_gradients(self):
        pts = _points(40, self.DOM3, seed=30)
        vals = self._f(pts)
        dx = 1.5 * pts[:, 0] ** 2 - 1.0
        dyz = 2.0 * pts[:, 1]  # d2/dydz of y^2 z
        sl = ChebyshevSlider.fit(
            pts, vals, 3, self.DOM3, [5, 4, 4], self.PART, [0.5] * 3,
            derivative_data=[(pts, [1, 0, 0], dx),
                             (pts, [0, 1, 1], dyz)])
        tst = _points(300, self.DOM3, seed=31)
        got = np.asarray(sl.eval_batch(tst, derivative_order=[0, 0, 0]))
        assert np.max(np.abs(got - self._f(tst))) < 1e-9
        # Slider derivative routing agrees with the observed gradients.
        dgot = np.asarray(sl.eval_batch(pts, derivative_order=[1, 0, 0]))
        assert np.max(np.abs(dgot - dx)) < 1e-9

    def test_cross_group_mixed_partial_rejected(self):
        pts = _points(40, self.DOM3, seed=32)
        vals = self._f(pts)
        with pytest.raises(ValueError, match="cross-group"):
            ChebyshevSlider.fit(
                pts, vals, 3, self.DOM3, [5, 4, 4], self.PART,
                [0.5] * 3,
                derivative_data=[(pts, [1, 1, 0], vals)])

    def test_zero_orders_block_acts_as_extra_values(self):
        # An all-zero orders block is just more value observations —
        # it must count toward determinedness and fit cleanly.
        pts = _points(12, self.DOM3, seed=33)
        vals = self._f(pts)
        extra = _points(20, self.DOM3, seed=34)
        evals = self._f(extra)
        # columns = 1 + 5 + 16 = 22; dof 20; 12 value rows alone would
        # be underdetermined.
        with pytest.raises(ValueError, match="underdetermined"):
            ChebyshevSlider.fit(pts, vals, 3, self.DOM3, [5, 4, 4],
                                self.PART, [0.5] * 3)
        sl = ChebyshevSlider.fit(
            pts, vals, 3, self.DOM3, [5, 4, 4], self.PART, [0.5] * 3,
            derivative_data=[(extra, [0, 0, 0], evals)])
        tst = _points(100, self.DOM3, seed=35)
        got = np.asarray(sl.eval_batch(tst, derivative_order=[0, 0, 0]))
        assert np.max(np.abs(got - self._f(tst))) < 1e-8

    def test_sliding_identity_preserved(self):
        pts = _points(60, self.DOM3, seed=36)
        vals = self._f(pts)
        dx = 1.5 * pts[:, 0] ** 2 - 1.0
        sl = ChebyshevSlider.fit(
            pts, vals, 3, self.DOM3, [5, 4, 4], self.PART, [0.4] * 3,
            derivative_data=[(pts, [1, 0, 0], dx)])
        for slide in sl.slides:
            z = [0.4] * slide.num_dimensions
            got = slide.eval(z, derivative_order=[0] * slide.num_dimensions)
            assert abs(got - sl.pivot_value) < 1e-10


class TestTTGradientFit:
    DOM3 = [[0.0, 1.0]] * 3

    @staticmethod
    def _f(p):
        # Rank-1, low-degree: exactly TT-representable at n=[5,5,5].
        return (p[:, 0] ** 2 - 0.5) * (1.0 + p[:, 1]) * (2.0 - p[:, 2])

    @staticmethod
    def _fx(p):
        return 2.0 * p[:, 0] * (1.0 + p[:, 1]) * (2.0 - p[:, 2])

    def test_gradient_rows_join_the_als(self):
        pts = _points(200, self.DOM3, seed=40)
        tt = ChebyshevTT.fit(
            pts, self._f(pts), 3, self.DOM3, [5, 5, 5], max_rank=2,
            sweeps=30, seed=1, l2=1e-12,
            derivative_data=[(pts, [1, 0, 0], self._fx(pts))])
        tst = _points(200, self.DOM3, seed=41)
        got = np.asarray(tt.eval_batch(tst))
        assert np.max(np.abs(got - self._f(tst))) < 1e-4
        diag = tt.fit_diagnostics
        (block,) = diag["derivative_blocks"]
        assert block["orders"] == [1, 0, 0]
        assert diag["objective_sse"] >= diag["sse"]
        # sweep_rms tracks the full objective and must have converged
        # downward.
        assert diag["sweep_rms"][-1] <= diag["sweep_rms"][0]

    def test_block_rows_count_toward_determinedness(self):
        pts = _points(30, self.DOM3, seed=42)
        vals = self._f(pts)
        # max core unknowns = 2*5*2 = 20 < 30 values: fine; shrink to
        # 10 values so l2=0 underdetermines, then blocks rescue it.
        with pytest.raises(ValueError, match="underdetermined"):
            ChebyshevTT.fit(pts[:10], vals[:10], 3, self.DOM3,
                            [5, 5, 5], max_rank=2, l2=0.0)
        ChebyshevTT.fit(
            pts[:10], vals[:10], 3, self.DOM3, [5, 5, 5], max_rank=2,
            l2=0.0, sweeps=2,
            derivative_data=[(pts, [1, 0, 0], self._fx(pts))])


class TestSplineGradientFit:
    DOM1 = [[-1.0, 1.0]]

    @staticmethod
    def _f(x):
        return np.abs(x) + 0.3 * x

    @staticmethod
    def _df(x):
        return np.sign(x) + 0.3

    def test_kinked_recovery_with_derivatives(self):
        rng = np.random.default_rng(50)
        x = rng.uniform(-1, 1, (40, 1))
        spl = ChebyshevSpline.fit(
            x, self._f(x[:, 0]), 1, self.DOM1, [6], [[0.0]],
            derivative_data=[(x, [1], self._df(x[:, 0]))])
        t = np.linspace(-0.99, 0.99, 101)[:, None]
        got = np.asarray(spl.eval_batch(t, derivative_order=[0]))
        assert np.max(np.abs(got - self._f(t[:, 0]))) < 1e-10
        dgot = np.asarray(spl.eval_batch(t, derivative_order=[1]))
        assert np.max(np.abs(dgot - self._df(t[:, 0]))) < 1e-9

    def test_derivative_on_knot_routes_right(self):
        rng = np.random.default_rng(51)
        x = rng.uniform(-1, 1, (40, 1))
        knot = np.array([[0.0]])
        # The RIGHT-side derivative at the kink is +1 + 0.3.
        spl = ChebyshevSpline.fit(
            x, self._f(x[:, 0]), 1, self.DOM1, [6], [[0.0]],
            derivative_data=[(knot, [1], np.array([1.3]))])
        (blk,) = [d for d in spl.fit_diagnostics["per_piece"]
                  if "derivative_blocks" in d]
        assert blk["derivative_blocks"][0]["rms"] < 1e-9
        # The left piece saw no derivative rows.
        others = [d for d in spl.fit_diagnostics["per_piece"]
                  if "derivative_blocks" not in d]
        assert len(others) == 1
        assert spl.fit_diagnostics["n_derivative_rows"] == 1

    def test_underdetermined_piece_rescued_by_gradients(self):
        rng = np.random.default_rng(52)
        left = rng.uniform(-1, 0, (10, 1))
        right = rng.uniform(0, 1, (4, 1))  # < 6 value rows
        x = np.vstack([left, right])
        y = self._f(x[:, 0])
        with pytest.raises(ValueError, match="underdetermined"):
            ChebyshevSpline.fit(x, y, 1, self.DOM1, [6], [[0.0]])
        gx = rng.uniform(0.01, 1, (4, 1))
        spl = ChebyshevSpline.fit(
            x, y, 1, self.DOM1, [6], [[0.0]],
            derivative_data=[(gx, [1], self._df(gx[:, 0]))])
        t = np.linspace(0.01, 0.99, 50)[:, None]
        got = np.asarray(spl.eval_batch(t, derivative_order=[0]))
        assert np.max(np.abs(got - self._f(t[:, 0]))) < 1e-9
