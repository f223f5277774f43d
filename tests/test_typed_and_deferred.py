"""Typed constructor helpers and the deferred-construction workflow.

Behavior classes the reference pins in its polish suite (reference
tests/test_v016_polish.py: TestTypedHelpers, TestSetOriginalFunctionValues,
TestDeferBuildRejections): the frozen Domain/Ns/SpecialPoints wrappers
must be interchangeable with raw lists, and defer_build must reject
every configuration it cannot later complete.
"""

import dataclasses
import math

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSpline,
    ChebyshevSlider,
    ChebyshevTT,
    Domain,
    Ns,
    SpecialPoints,
)


def f2d(pts, _):
    return np.sin(pts[:, 0]) + pts[:, 1] ** 2


# ---------------------------------------------------------------------------
# Typed helpers
# ---------------------------------------------------------------------------

class TestTypedHelpers:
    @pytest.mark.parametrize("wrapper,payload", [
        (Domain, [[0.0, 1.0]]),
        (Ns, [9]),
        (SpecialPoints, [[0.5]]),
    ])
    def test_wrappers_are_frozen_dataclasses(self, wrapper, payload):
        obj = wrapper(payload)
        assert dataclasses.is_dataclass(obj)
        field = dataclasses.fields(obj)[0].name
        with pytest.raises(dataclasses.FrozenInstanceError):
            setattr(obj, field, payload)

    def test_typed_and_raw_builds_bit_identical(self):
        raw = ChebyshevApproximation(
            f2d, 2, [[-1.0, 2.0], [0.0, 1.0]], [9, 7], vectorized=True)
        raw.build(verbose=False)
        typed = ChebyshevApproximation(
            f2d, 2, Domain([[-1.0, 2.0], [0.0, 1.0]]), Ns([9, 7]),
            vectorized=True)
        typed.build(verbose=False)
        assert np.array_equal(np.asarray(raw.tensor_values),
                              np.asarray(typed.tensor_values))
        assert typed.domain == raw.domain
        assert typed.n_nodes == raw.n_nodes

    def test_mixed_typed_domain_raw_ns(self):
        ap = ChebyshevApproximation(
            f2d, 2, Domain([[-1.0, 1.0], [-1.0, 1.0]]), [11, 11],
            vectorized=True)
        ap.build(verbose=False)
        assert ap.vectorized_eval([0.2, 0.4], [0, 0]) == pytest.approx(
            math.sin(0.2) + 0.16, abs=1e-8)

    def test_typed_special_points_all_empty_stays_dense(self):
        ap = ChebyshevApproximation(
            f2d, 2, [[-1, 1], [-1, 1]], [7, 7],
            special_points=SpecialPoints([[], []]), vectorized=True)
        assert isinstance(ap, ChebyshevApproximation)
        assert not isinstance(ap, ChebyshevSpline)

    def test_typed_special_points_kink_dispatches_to_spline(self):
        # one knot in dim 0 -> nested per-sub-interval node counts
        sp = ChebyshevApproximation(
            lambda pts, _: np.abs(pts[:, 0]) + pts[:, 1], 2,
            Domain([[-1, 1], [-1, 1]]), [[9, 9], [9]],
            special_points=SpecialPoints([[0.0], []]), vectorized=True)
        assert isinstance(sp, ChebyshevSpline)
        sp.build(verbose=False)
        assert sp.eval([0.5, 0.25], [0, 0]) == pytest.approx(
            0.75, abs=1e-10)

    def test_slider_and_tt_accept_typed_wrappers(self):
        sl = ChebyshevSlider(
            lambda x, _: math.sin(x[0]) + math.cos(x[1]), 2,
            Domain([[-1, 1], [-1, 1]]), Ns([9, 9]),
            partition=[[0], [1]], pivot_point=[0.0, 0.0])
        sl.build(verbose=False)
        assert sl.eval([0.3, 0.1], [0, 0]) == pytest.approx(
            math.sin(0.3) + math.cos(0.1), abs=1e-8)

        tt = ChebyshevTT(
            lambda x, _: math.sin(x[0]) * math.cos(x[1]), 2,
            Domain([[-1, 1], [-1, 1]]), Ns([9, 9]))
        tt.build(verbose=False)
        assert tt.eval([0.3, 0.1]) == pytest.approx(
            math.sin(0.3) * math.cos(0.1), abs=1e-7)


# ---------------------------------------------------------------------------
# Deferred construction
# ---------------------------------------------------------------------------

def grid_values(info, fn):
    return fn(info["full_grid"]).reshape(info["shape"])


class TestDeferredWorkflow:
    def test_full_external_fill_cycle(self):
        ap = ChebyshevApproximation(None, 2, [[-1, 1], [0, 2]], [9, 11],
                                    defer_build=True)
        assert not ap.is_construction_finished()
        info = ChebyshevApproximation.nodes(2, [[-1, 1], [0, 2]], [9, 11])
        vals = grid_values(info, lambda p: np.exp(p[:, 0]) * p[:, 1])
        ap.set_original_function_values(vals)
        assert ap.is_construction_finished()
        assert ap.function is None
        assert ap.vectorized_eval([0.5, 1.5], [0, 0]) == pytest.approx(
            math.exp(0.5) * 1.5, abs=1e-7)

    def test_deferred_fill_bit_identical_to_from_values(self):
        dom, ns = [[-1.0, 1.0]], [13]
        probe = ChebyshevApproximation(None, 1, dom, ns, defer_build=True)
        info = ChebyshevApproximation.nodes(1, dom, ns)
        vals = grid_values(info, lambda p: np.sin(3 * p[:, 0]))
        probe.set_original_function_values(vals)
        direct = ChebyshevApproximation.from_values(vals, 1, dom, ns)
        assert np.array_equal(np.asarray(probe.tensor_values),
                              np.asarray(direct.tensor_values))

    def test_second_fill_rejected(self):
        ap = ChebyshevApproximation(None, 1, [[-1, 1]], [7],
                                    defer_build=True)
        info = ChebyshevApproximation.nodes(1, [[-1, 1]], [7])
        vals = grid_values(info, lambda p: p[:, 0])
        ap.set_original_function_values(vals)
        with pytest.raises((RuntimeError, ValueError)):
            ap.set_original_function_values(vals)

    def test_fill_on_normally_built_object_rejected(self, cheb_sin3d):
        vals = np.asarray(cheb_sin3d.tensor_values)
        with pytest.raises((RuntimeError, ValueError)):
            cheb_sin3d.set_original_function_values(vals)

    def test_wrong_shape_rejected(self):
        ap = ChebyshevApproximation(None, 2, [[-1, 1], [-1, 1]], [7, 9],
                                    defer_build=True)
        with pytest.raises(ValueError):
            ap.set_original_function_values(np.zeros((9, 7)))

    @pytest.mark.parametrize("poison", [np.nan, np.inf, -np.inf])
    def test_nonfinite_values_rejected(self, poison):
        ap = ChebyshevApproximation(None, 1, [[-1, 1]], [7],
                                    defer_build=True)
        vals = np.ones(7)
        vals[3] = poison
        with pytest.raises(ValueError):
            ap.set_original_function_values(vals)
        # the failed fill must not have half-built the object
        assert not ap.is_construction_finished()

    def test_special_points_route_to_deferred_spline(self):
        sp = ChebyshevApproximation(
            None, 1, [[-1, 1]], [[9, 9]], special_points=[[0.0]],
            defer_build=True)
        assert isinstance(sp, ChebyshevSpline)
        meta = ChebyshevSpline.nodes(1, [[-1, 1]], [9], [[0.0]])
        vals = [np.abs(piece["full_grid"][:, 0]).reshape(piece["shape"])
                for piece in meta["pieces"]]
        sp.set_original_function_values(vals)
        assert sp.eval([0.5], [0]) == pytest.approx(0.5, abs=1e-12)
        assert sp.eval([-0.25], [0]) == pytest.approx(0.25, abs=1e-12)


class TestDeferRejections:
    def test_function_alongside_defer_rejected(self):
        with pytest.raises(ValueError, match="defer"):
            ChebyshevApproximation(lambda x, _: x[0], 1, [[-1, 1]], [9],
                                   defer_build=True)

    def test_auto_n_alongside_defer_rejected(self):
        # Threshold-driven N discovery needs a callable to probe; a
        # deferred object has none.
        with pytest.raises(ValueError):
            ChebyshevApproximation(None, 1, [[-1, 1]], None,
                                   error_threshold=1e-8,
                                   defer_build=True)

    @pytest.mark.parametrize("bad_ns", [[0], [-3], [7, None]])
    def test_invalid_node_counts_rejected(self, bad_ns):
        ndim = len(bad_ns)
        with pytest.raises((ValueError, TypeError)):
            ap = ChebyshevApproximation(
                None, ndim, [[-1, 1]] * ndim, bad_ns, defer_build=True)
            ap.nodes()
