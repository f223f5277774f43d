"""Calculus completion: Slider and TT integration edge cases, cross-class
consistency with the dense interpolant."""

import math

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevTT,
)


def f3(x, _):
    return math.sin(x[0]) + math.exp(0.5 * x[1]) * math.cos(x[2])


def dense_f3():
    c = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [11] * 3)
    c.build(verbose=False)
    return c


class TestTTIntegration:
    @pytest.fixture(scope="class")
    def tt(self):
        t = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [11] * 3, max_rank=8)
        t.build(verbose=False, method="svd")
        return t

    @pytest.fixture(scope="class")
    def dense(self):
        return dense_f3()

    def test_full_matches_dense(self, tt, dense):
        assert abs(tt.integrate() - dense.integrate()) < 1e-9

    def test_leading_dim_partial(self, tt, dense):
        a = tt.integrate(dims=[0])
        b = dense.integrate(dims=[0])
        pt = [0.3, -0.4]
        assert abs(a.eval(pt) - b.vectorized_eval(pt, [0, 0])) < 1e-9

    def test_trailing_dim_partial(self, tt, dense):
        # pending matrix absorbed into the right rank of the last kept core
        a = tt.integrate(dims=[2])
        b = dense.integrate(dims=[2])
        pt = [0.1, 0.7]
        assert abs(a.eval(pt) - b.vectorized_eval(pt, [0, 0])) < 1e-9

    def test_consecutive_dims(self, tt, dense):
        a = tt.integrate(dims=[1, 2])
        b = dense.integrate(dims=[1, 2])
        assert abs(a.eval([0.25]) - b.vectorized_eval([0.25], [0])) < 1e-9

    def test_bounds_single_tuple(self, tt, dense):
        a = tt.integrate(dims=[1], bounds=(0.0, 0.5))
        b = dense.integrate(dims=[1], bounds=(0.0, 0.5))
        pt = [0.3, -0.2]
        assert abs(a.eval(pt) - b.vectorized_eval(pt, [0, 0])) < 1e-9

    def test_bounds_validation(self, tt):
        with pytest.raises(ValueError):
            tt.integrate(dims=[0], bounds=(-2.0, 0.5))
        with pytest.raises(ValueError):
            tt.integrate(dims=[0, 1], bounds=[(0.0, 0.5)])
        with pytest.raises(ValueError):
            tt.integrate(dims=[5])

    def test_integrate_then_eval_consistency(self, tt):
        # integrate out dim 1, then slice dim 1-free object matches
        # numerically integrating by quadrature sampling
        reduced = tt.integrate(dims=[1])
        xs = np.linspace(-1, 1, 201)
        vals = tt.eval_batch(np.column_stack([
            np.full_like(xs, 0.3), xs, np.full_like(xs, -0.4)]))
        trapz = np.trapezoid(vals, xs)
        assert abs(reduced.eval([0.3, -0.4]) - trapz) < 1e-4


class TestTTIntegrationReordered:
    def test_reordered_partial(self):
        tt = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [9] * 3, max_rank=8)
        tt.build(verbose=False, method="svd")
        rt = tt.reorder([2, 0, 1])
        dense = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [9] * 3)
        dense.build(verbose=False)
        # user-frame dims=[1]: storage position differs after reorder
        a = rt.integrate(dims=[1])
        b = dense.integrate(dims=[1])
        pt = [0.4, 0.6]
        assert abs(a.eval(pt) - b.vectorized_eval(pt, [0, 0])) < 1e-8

    def test_reordered_bounds(self):
        tt = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [9] * 3, max_rank=8)
        tt.build(verbose=False, method="svd")
        rt = tt.reorder([1, 2, 0])
        dense = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [9] * 3)
        dense.build(verbose=False)
        a = rt.integrate(dims=[0, 2], bounds=[(-0.5, 0.5), None])
        b = dense.integrate(dims=[0, 2], bounds=[(-0.5, 0.5), None])
        assert abs(a.eval([0.2]) - b.vectorized_eval([0.2], [0])) < 1e-8


class TestSliderIntegrationCompletion:
    @pytest.fixture(scope="class")
    def slider(self):
        s = ChebyshevSlider(f3, 3, [[-1, 1]] * 3, [11] * 3,
                            partition=[[0], [1, 2]],
                            pivot_point=[0.0, 0.0, 0.0])
        s.build(verbose=False)
        return s

    def test_full_matches_sliding_identity(self, slider):
        # slider approximates f as s0(x0) + s12(x1,x2) - pv; its integral
        # must match the analytic integral of that decomposition
        i_sin = 0.0  # int sin over [-1,1]
        i_exp_cos = ((math.exp(0.5) - math.exp(-0.5)) / 0.5
                     * 2.0 * math.sin(1.0))
        expected = i_sin * 4.0 + i_exp_cos * 2.0
        assert abs(slider.integrate() - expected) < 1e-9

    def test_partial_full_group(self, slider):
        # integrating dims [1, 2] fully absorbs the second slide
        reduced = slider.integrate(dims=[1, 2])
        assert reduced.num_dimensions == 1
        i_exp_cos = ((math.exp(0.5) - math.exp(-0.5)) / 0.5
                     * 2.0 * math.sin(1.0))
        got = reduced.eval([0.5], [0])
        expected = 4.0 * math.sin(0.5) + i_exp_cos
        assert abs(got - expected) < 1e-9

    def test_partial_within_group(self, slider):
        # integrating dim 1 only: partial intersection with group [1, 2]
        reduced = slider.integrate(dims=[1])
        assert reduced.num_dimensions == 2
        i_exp = (math.exp(0.5) - math.exp(-0.5)) / 0.5
        got = reduced.eval([0.5, 0.3], [0, 0])
        expected = 2.0 * math.sin(0.5) + i_exp * math.cos(0.3)
        assert abs(got - expected) < 1e-9

    def test_partial_with_bounds(self, slider):
        reduced = slider.integrate(dims=[0], bounds=[(0.0, 1.0)])
        assert reduced.num_dimensions == 2
        i_sin_01 = 1.0 - math.cos(1.0)
        got = reduced.eval([0.3, -0.2], [0, 0])
        expected = i_sin_01 + 1.0 * math.exp(0.15) * math.cos(-0.2)
        assert abs(got - expected) < 1e-9

    def test_derivative_after_partial(self, slider):
        reduced = slider.integrate(dims=[1])
        d = reduced.eval([0.5, 0.3], [1, 0])
        assert abs(d - 2.0 * math.cos(0.5)) < 1e-8

    def test_bounds_validation(self, slider):
        with pytest.raises(ValueError):
            slider.integrate(dims=[0], bounds=[(-3.0, 0.0)])
        with pytest.raises(ValueError):
            slider.integrate(dims=[7])


class TestSliderRoundTripThroughCalculus:
    def test_slice_then_integrate(self):
        # fully additive f so the singleton partition is exact
        def g(x, _):
            return math.sin(x[0]) + math.exp(0.5 * x[1]) + math.cos(x[2])

        s = ChebyshevSlider(g, 3, [[-1, 1]] * 3, [11] * 3,
                            partition=[[0], [1], [2]],
                            pivot_point=[0.1, 0.1, 0.1])
        s.build(verbose=False)
        sl = s.slice((2, 0.25))
        got = sl.integrate()
        i_exp = (math.exp(0.5) - math.exp(-0.5)) / 0.5
        # integral over (x0, x1) in [-1,1]^2 of g(x0, x1, 0.25)
        expected = 0.0 + 2.0 * i_exp + 4.0 * math.cos(0.25)
        assert abs(got - expected) < 1e-9

    def test_extrude_then_integrate(self):
        s = ChebyshevSlider(lambda x, _: math.sin(x[0]), 1, [[-1, 1]],
                            [9], partition=[[0]], pivot_point=[0.0])
        s.build(verbose=False)
        ext = s.extrude((1, (0.0, 2.0), 5))
        assert abs(ext.integrate() - 0.0) < 1e-12
        assert abs(ext.integrate(dims=[1]).eval([0.5], [0])
                   - 2.0 * math.sin(0.5)) < 1e-7
