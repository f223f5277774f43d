"""Uniform MoCaX-ergonomics surface across all four interpolant classes."""

import math

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
    __version__,
)


def f2(x, _):
    return math.sin(x[0]) + 0.5 * x[1]


@pytest.fixture(scope="module")
def built_all():
    approx = ChebyshevApproximation(f2, 2, [[-1, 1], [-1, 1]], [7, 7])
    approx.build(verbose=False)
    spline = ChebyshevSpline(f2, 2, [[-1, 1], [-1, 1]], [7, 7],
                             [[0.0], []])
    spline.build(verbose=False)
    tt = ChebyshevTT(f2, 2, [[-1, 1], [-1, 1]], [7, 7], max_rank=4)
    tt.build(verbose=False, seed=0)
    slider = ChebyshevSlider(f2, 2, [[-1, 1], [-1, 1]], [7, 7],
                             [[0], [1]], [0.0, 0.0])
    slider.build(verbose=False)
    return {"approx": approx, "spline": spline, "tt": tt,
            "slider": slider}


NAMES = {"approx": "ChebyshevApproximation",
         "spline": "ChebyshevSpline",
         "tt": "ChebyshevTT",
         "slider": "ChebyshevSlider"}


@pytest.mark.parametrize("key", list(NAMES))
class TestUniformSurface:
    def test_constructor_type(self, built_all, key):
        assert built_all[key].get_constructor_type() == NAMES[key]

    def test_construction_finished(self, built_all, key):
        assert built_all[key].is_construction_finished()

    def test_used_ns(self, built_all, key):
        ns = built_all[key].get_used_ns()
        assert all(n == 7 for dim in ns
                   for n in (dim if isinstance(dim, list) else [dim]))

    def test_descriptor_round_trip(self, built_all, key):
        obj = built_all[key]
        assert obj.get_descriptor() == ""
        obj.set_descriptor("labelled")
        assert obj.get_descriptor() == "labelled"
        with pytest.raises(TypeError):
            obj.set_descriptor(3.14)
        obj.set_descriptor("")

    def test_max_derivative_order(self, built_all, key):
        assert built_all[key].get_max_derivative_order() == 2

    def test_dimensionality_allowed(self, built_all, key):
        cls = type(built_all[key])
        assert cls.is_dimensionality_allowed(1)
        assert cls.is_dimensionality_allowed(12)
        assert not cls.is_dimensionality_allowed(0)
        assert not cls.is_dimensionality_allowed("3")

    def test_evaluation_points_shape(self, built_all, key):
        obj = built_all[key]
        pts = obj.get_evaluation_points()
        assert pts.shape == (obj.get_num_evaluation_points(), 2)
        assert np.isfinite(pts).all()

    def test_clone_is_independent(self, built_all, key):
        obj = built_all[key]
        c = obj.clone()
        assert c is not obj
        assert c.function is None
        c.set_descriptor("clone-only")
        assert obj.get_descriptor() == ""

    def test_error_estimate_positive_finite(self, built_all, key):
        est = built_all[key].error_estimate()
        assert np.isfinite(est) and est >= 0

    def test_str_contains_class_name(self, built_all, key):
        assert NAMES[key] in str(built_all[key])
        assert NAMES[key] in repr(built_all[key])


class TestEvaluationPointValues:
    def test_approx_grid_values_reproduce_tensor(self, built_all):
        obj = built_all["approx"]
        pts = obj.get_evaluation_points()
        vals = np.array([f2(p, None) for p in pts]).reshape(7, 7)
        np.testing.assert_allclose(np.asarray(obj.tensor_values), vals,
                                   atol=1e-14)

    def test_derivative_id_shared_semantics(self, built_all):
        for key in ("approx", "spline", "slider"):
            obj = built_all[key]
            i0 = obj.get_derivative_id([0, 0])
            i1 = obj.get_derivative_id([1, 0])
            assert i0 != i1
            assert obj.get_derivative_id([0, 0]) == i0
            with pytest.raises(ValueError):
                obj.get_derivative_id([0, 0, 0])
            with pytest.raises(ValueError):
                obj.get_derivative_id([9, 0])

    def test_special_points_getters(self, built_all):
        assert built_all["approx"].get_special_points() is None
        assert built_all["spline"].get_special_points() == [[0.0], []]

    def test_error_threshold_getters(self, built_all):
        assert built_all["approx"].get_error_threshold() is None
        assert built_all["spline"].get_error_threshold() is None

    def test_version_string(self):
        assert isinstance(__version__, str) and __version__.count(".") == 2
