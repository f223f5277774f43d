"""differentiate() as a 4/4 common surface: spline + slider legs.

Dense and TT differentiate() are covered in test_approximation.py /
test_tensor_train.py; these tests pin the spline and slider
counterparts added to complete the surface (reference exposes
derivatives on these classes only through per-call routing —
reference spline.py / slider.py eval paths).
"""

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
)


def _kinked(point, data=None):
    x, y = point[0], point[1]
    return abs(x) * y + 0.25 * y * y + np.sin(1.3 * x)


def _kinked_vec(pts, data=None):
    pts = np.asarray(pts)
    x, y = pts[..., 0], pts[..., 1]
    return np.abs(x) * y + 0.25 * y * y + np.sin(1.3 * x)


@pytest.fixture(scope="module")
def spline2d():
    sp = ChebyshevSpline(_kinked, 2, [[-1.0, 1.0], [0.0, 2.0]],
                         n_nodes=[9, 7], knots=[[0.0], []])
    sp.build(verbose=False)
    return sp


@pytest.fixture(scope="module")
def slider10d():
    def f(point, data=None):
        p = np.asarray(point)
        return (np.sin(p[0]) * p[1] + p[2] ** 3
                + np.cos(p[3] + 0.5 * p[4]))

    sl = ChebyshevSlider(f, 5, [[-1.0, 1.0]] * 5, n_nodes=[13] * 5,
                         partition=[[0, 1], [2], [3, 4]],
                         pivot_point=[0.1] * 5)
    sl.build(verbose=False)
    return sl


class TestSplineDifferentiate:
    def test_matches_per_call_derivative(self, spline2d):
        d = spline2d.differentiate([1, 0])
        pts = np.array([[-0.7, 0.3], [0.4, 1.9], [0.9, 1.1]])
        want = spline2d.eval_batch(pts, derivative_order=[1, 0])
        got = d.eval_batch(pts, [0, 0])
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_mixed_partial_single_points(self, spline2d):
        d = spline2d.differentiate([1, 1])
        for pt in ([-0.5, 0.5], [0.6, 1.5]):
            want = spline2d.eval(pt, derivative_order=[1, 1])
            assert d.eval(pt, [0, 0]) == pytest.approx(want, rel=1e-12, abs=1e-12)

    def test_zero_order_copies(self, spline2d):
        d = spline2d.differentiate([0, 0])
        pts = np.array([[-0.2, 0.8], [0.3, 0.1]])
        np.testing.assert_allclose(d.eval_batch(pts, [0, 0]),
                                   spline2d.eval_batch(pts, [0, 0]),
                                   rtol=0, atol=0)
        assert d is not spline2d

    def test_uncapped_order(self, spline2d):
        # The derivative-id registry caps at max_derivative_order=2,
        # but differentiate() is uncapped.
        with pytest.raises(ValueError):
            spline2d.get_derivative_id([3, 0])
        d3 = spline2d.differentiate([3, 0])
        # d^3/dx^3 sin(1.3 x) = -1.3^3 cos(1.3 x) on the smooth term;
        # |x|*y differentiates to 0 at order 3 within a piece.
        got = d3.eval([0.5, 1.0], [0, 0])
        assert got == pytest.approx(-(1.3 ** 3) * np.cos(1.3 * 0.5),
                                    rel=1e-6)

    def test_derivative_again(self, spline2d):
        dd = spline2d.differentiate([1, 0]).differentiate([0, 1])
        want = spline2d.differentiate([1, 1])
        pts = np.array([[0.25, 0.75]])
        np.testing.assert_allclose(dd.eval_batch(pts, [0, 0]),
                                   want.eval_batch(pts, [0, 0]),
                                   rtol=1e-12)

    def test_result_is_servable_spline(self, spline2d):
        d = spline2d.differentiate([0, 1])
        assert isinstance(d, ChebyshevSpline)
        assert d.knots == spline2d.knots
        assert d.is_construction_finished()
        # integrates / roots machinery still works on the result
        val = d.integrate()
        assert np.isfinite(val)

    def test_validation(self, spline2d):
        with pytest.raises(ValueError):
            spline2d.differentiate([1])
        with pytest.raises(ValueError):
            spline2d.differentiate([-1, 0])


class TestSliderDifferentiate:
    def test_single_group_matches_per_call(self, slider10d):
        d = slider10d.differentiate([1, 0, 0, 0, 0])
        rng = np.random.default_rng(7)
        pts = rng.uniform(-1, 1, size=(6, 5))
        want = slider10d.eval_batch(pts, derivative_order=[1, 0, 0, 0, 0])
        got = d.eval_batch(pts)
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-12)

    def test_within_group_mixed(self, slider10d):
        d = slider10d.differentiate([1, 1, 0, 0, 0])
        pt = [0.3, -0.4, 0.2, 0.6, -0.1]
        want = slider10d.eval(pt, derivative_order=[1, 1, 0, 0, 0])
        z = [0] * 5
        assert d.eval(pt, z) == pytest.approx(want, rel=1e-11, abs=1e-12)
        # analytic: d2/dx0 dx1 sin(x0) x1 = cos(x0)
        assert d.eval(pt, z) == pytest.approx(np.cos(0.3), rel=1e-8)

    def test_cross_group_is_exact_zero(self, slider10d):
        d = slider10d.differentiate([1, 0, 1, 0, 0])
        rng = np.random.default_rng(3)
        pts = rng.uniform(-1, 1, size=(4, 5))
        np.testing.assert_array_equal(d.eval_batch(pts), 0.0)
        assert d.eval([0.1] * 5, [0] * 5) == 0.0

    def test_zero_order_copies(self, slider10d):
        d = slider10d.differentiate([0] * 5)
        pt = [0.2, 0.4, -0.3, 0.5, 0.9]
        z = [0] * 5
        assert d.eval(pt, z) == pytest.approx(slider10d.eval(pt, z),
                                              rel=0, abs=0)

    def test_uncapped_order(self, slider10d):
        with pytest.raises(ValueError):
            slider10d.get_derivative_id([0, 0, 3, 0, 0])
        d3 = slider10d.differentiate([0, 0, 3, 0, 0])
        # d^3/dx^3 x^3 = 6 everywhere.
        assert d3.eval([0.5, 0.5, 0.7, 0.0, 0.0], [0] * 5) == \
            pytest.approx(6.0, rel=1e-8)

    def test_result_is_servable_slider(self, slider10d):
        d = slider10d.differentiate([0, 0, 1, 0, 0])
        assert isinstance(d, ChebyshevSlider)
        assert d.partition == slider10d.partition
        # error_estimate / integrate still run on the result
        assert np.isfinite(d.integrate())
        # and it can be differentiated again
        d2 = d.differentiate([0, 0, 1, 0, 0])
        assert d2.eval([0.0, 0.0, 0.4, 0.0, 0.0], [0] * 5) == \
            pytest.approx(6 * 0.4, rel=1e-8)

    def test_validation(self, slider10d):
        with pytest.raises(ValueError):
            slider10d.differentiate([1, 0])
        with pytest.raises(ValueError):
            slider10d.differentiate([-1, 0, 0, 0, 0])


class TestDifferentiateCommonSurface:
    def test_all_four_families_expose_it(self, spline2d, slider10d):
        dense = ChebyshevApproximation(
            lambda p, d=None: np.sin(p[0]) + p[1] ** 2, 2,
            [[-1, 1], [-1, 1]], n_nodes=[9, 9])
        dense.build(verbose=False)
        for obj in (dense, spline2d, slider10d):
            assert hasattr(obj, "differentiate")
        from pychebyshev_tpu import ChebyshevTT
        assert hasattr(ChebyshevTT, "differentiate")

    def test_spline_derivative_serves_in_engine(self, spline2d):
        from pychebyshev_tpu.serving import BatchedEvaluator
        d = spline2d.differentiate([1, 0])
        eng = BatchedEvaluator(d, dtype=np.float64)
        pts = np.array([[-0.6, 0.4], [0.7, 1.2]])
        np.testing.assert_allclose(
            np.asarray(eng(pts)), d.eval_batch(pts, [0, 0]), rtol=1e-12)

    def test_slider_derivative_serves_in_engine(self, slider10d):
        from pychebyshev_tpu.serving import BatchedEvaluator
        d = slider10d.differentiate([0, 1, 0, 0, 0])
        eng = BatchedEvaluator(d, dtype=np.float64)
        rng = np.random.default_rng(11)
        pts = rng.uniform(-1, 1, size=(5, 5))
        np.testing.assert_allclose(
            np.asarray(eng(pts)), d.eval_batch(pts), rtol=1e-11,
            atol=1e-12)
