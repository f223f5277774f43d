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


class TestAdditionalData:
    """additional_data threading, persistence, and the binary-format
    rejection, across classes."""

    def test_threaded_into_every_build_eval(self):
        seen = []

        def recorder(point, data):
            seen.append(data)
            return point[0] + point[1]

        payload = {"strike": 100.0}
        c = ChebyshevApproximation(recorder, 2, [[-1, 1]] * 2, [4, 4],
                                   additional_data=payload)
        c.build(verbose=False)
        assert len(seen) == 16 and all(d is payload for d in seen)

    def test_spline_pieces_see_payload(self):
        seen = []
        payload = ("spline", 1)
        spl = ChebyshevSpline(
            lambda x, d: seen.append(d) or abs(x[0]), 1, [[-1, 1]],
            [4], [[0.0]], additional_data=payload)
        spl.build(verbose=False)
        assert len(seen) == 8 and all(d is payload for d in seen)

    def test_slider_and_tt_threading(self):
        seen_s, seen_t = [], []
        payload = object()
        s = ChebyshevSlider(
            lambda x, d: seen_s.append(d) or (x[0] + x[1]), 2,
            [[-1, 1]] * 2, [4, 4], [[0], [1]], [0.0, 0.0],
            additional_data=payload)
        s.build(verbose=False)
        t = ChebyshevTT(
            lambda x, d: seen_t.append(d) or (x[0] + x[1]), 2,
            [[-1, 1]] * 2, [4, 4], max_rank=3, additional_data=payload)
        t.build(verbose=False, seed=0)
        assert seen_s and all(d is payload for d in seen_s)
        assert seen_t and all(d is payload for d in seen_t)

    def test_pickle_keeps_binary_rejects(self, tmp_path):
        payload = {"rate": 0.05}
        c = ChebyshevApproximation(f2, 2, [[-1, 1]] * 2, [5, 5],
                                   additional_data=payload)
        c.build(verbose=False)
        p = tmp_path / "a.pkl"
        c.save(str(p))
        assert ChebyshevApproximation.load(str(p)).additional_data \
            == payload
        with pytest.raises(NotImplementedError,
                           match="additional_data"):
            c.save(str(tmp_path / "a.pcb"), format="binary")


class TestFactoryPathResets:
    """Derived objects (algebra / extrude / slice) start with fresh
    metadata — no inherited descriptor, payload, or derivative ids."""

    def _src(self):
        c = ChebyshevApproximation(f2, 2, [[-1, 1]] * 2, [6, 6])
        c.build(verbose=False)
        c.set_descriptor("origin")
        c.additional_data = {"k": 1}
        c.get_derivative_id([1, 0])
        c.get_derivative_id([0, 1])
        return c

    def test_algebra_result_fresh(self):
        a = self._src()
        out = a + a
        assert out.get_descriptor() == ""
        assert out.additional_data is None
        assert out.get_derivative_id([1, 0]) == 0  # registry restarts

    def test_extrude_result_fresh(self):
        out = self._src().extrude((2, (0.0, 1.0), 4))
        assert out.get_descriptor() == ""
        assert out.additional_data is None
        assert out.get_derivative_id([0, 0, 1]) == 0

    def test_slice_result_fresh(self):
        out = self._src().slice((0, 0.25))
        assert out.get_descriptor() == ""
        assert out.additional_data is None
        assert out.get_derivative_id([2]) == 0


class TestDerivativeIdValidation:
    @pytest.fixture(scope="class")
    def objs(self):
        a = ChebyshevApproximation(f2, 2, [[-1, 1]] * 2, [6, 6])
        a.build(verbose=False)
        spl = ChebyshevSpline(f2, 2, [[-1, 1]] * 2, [6, 6], [[0.0], []])
        spl.build(verbose=False)
        sl = ChebyshevSlider(f2, 2, [[-1, 1]] * 2, [6, 6],
                             [[0], [1]], [0.0, 0.0])
        sl.build(verbose=False)
        return [a, spl, sl]

    def test_wrong_length(self, objs):
        for o in objs:
            with pytest.raises(ValueError,
                               match="does not match num_dimensions"):
                o.get_derivative_id([1])

    def test_non_int_entries(self, objs):
        for o in objs:
            with pytest.raises(ValueError, match="must be int"):
                o.get_derivative_id([1.0, 0])

    def test_out_of_range_entries(self, objs):
        for o in objs:
            with pytest.raises(ValueError, match="out of range"):
                o.get_derivative_id([-1, 0])
            with pytest.raises(ValueError, match="out of range"):
                o.get_derivative_id([99, 0])

    def test_unknown_id_raises(self, objs):
        for o in objs:
            with pytest.raises(KeyError, match="unknown derivative_id"):
                o.eval([0.1, 0.2], derivative_id=-1)

    def test_ids_stable_and_reusable(self, objs):
        for o in objs:
            i1 = o.get_derivative_id([1, 0])
            i2 = o.get_derivative_id([0, 1])
            assert o.get_derivative_id([1, 0]) == i1 != i2
            v_by_id = o.eval([0.1, 0.2], derivative_id=i1)
            v_by_spec = o.eval([0.1, 0.2], [1, 0])
            assert abs(v_by_id - v_by_spec) < 1e-14

    def test_both_spec_and_id_raises(self, objs):
        for o in objs:
            i = o.get_derivative_id([1, 0])
            with pytest.raises(ValueError, match="not both"):
                o.eval([0.1, 0.2], [1, 0], derivative_id=i)


@pytest.mark.parametrize("key", list(NAMES))
class TestDescriptorSetter:
    """set_descriptor validation + persistence on all four classes
    (reference tests/test_ergonomics.py::TestDescriptor)."""

    def test_non_string_rejected(self, built_all, key):
        with pytest.raises(TypeError, match="descriptor must be str"):
            built_all[key].set_descriptor(123)

    def test_pickle_preserves(self, built_all, key, tmp_path):
        import pickle
        obj = built_all[key].clone()
        obj.set_descriptor("label-X")
        restored = pickle.loads(pickle.dumps(obj))
        assert restored.get_descriptor() == "label-X"

    def test_mutable_after_build(self, built_all, key):
        obj = built_all[key].clone()
        obj.set_descriptor("first")
        obj.set_descriptor("second")
        assert obj.get_descriptor() == "second"
