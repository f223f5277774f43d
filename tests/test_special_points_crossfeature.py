"""Special-points dispatch pass-through + cross-feature integration.

Native coverage of the dispatch/cross-feature half of the reference's
special-points suite (reference tests/test_special_points.py): kwargs
flowing through ``__new__`` into the spline, and special-points-built
splines working with pickle, algebra, calculus, extrude/slice,
from_values, and the v0.12 defensive branches.  The declaration
validation matrix and kink-accuracy cases live in
tests/test_special_points_matrix.py.
"""

import math
import pickle

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline


def vee(x, _):
    return abs(x[0])


DOM1 = [[-1.0, 1.0]]


def _kinked(n_nodes=None, **kw):
    return ChebyshevApproximation(
        vee, 1, DOM1, n_nodes=n_nodes, special_points=[[0.0]], **kw)


class TestDispatchPassThrough:
    def test_threshold_kwarg_lands_on_the_spline(self):
        obj = _kinked(error_threshold=1e-6)
        assert type(obj) is ChebyshevSpline
        assert obj.error_threshold == 1e-6

    def test_max_n_kwarg_lands_on_the_spline(self):
        obj = _kinked(error_threshold=1e-6, max_n=32)
        assert obj.max_n == 32

    def test_none_special_points_kwarg_stays_dense(self):
        obj = ChebyshevApproximation(
            lambda x, _: x[0], 1, DOM1, [9], special_points=None)
        assert type(obj) is ChebyshevApproximation

    def test_dispatched_object_starts_unbuilt(self):
        obj = _kinked(n_nodes=[[9, 9]])
        assert type(obj) is ChebyshevSpline
        assert obj._built is False


class TestCrossFeature:
    def test_pickle_roundtrip_keeps_spline_type_and_values(self, tmp_path):
        obj = _kinked(n_nodes=[[11, 11]])
        obj.build(verbose=False)
        blob = pickle.dumps(obj)
        back = pickle.loads(blob)
        assert type(back) is ChebyshevSpline
        for x in (-0.45, 0.15, 0.85):
            assert back.eval([x], [0]) == obj.eval([x], [0])

    def test_addition_with_a_sibling_kink_model(self):
        a = _kinked(n_nodes=[[11, 11]])
        b = ChebyshevApproximation(
            lambda x, _: x[0] ** 3, 1, DOM1, n_nodes=[[11, 11]],
            special_points=[[0.0]])
        a.build(verbose=False)
        b.build(verbose=False)
        total = a + b
        for x in (-0.5, 0.3, 0.7):
            assert total.eval([x], [0]) == pytest.approx(
                abs(x) + x ** 3, abs=1e-12)

    def test_integrate_across_the_kink_is_exact(self):
        obj = _kinked(n_nodes=[[11, 11]])
        obj.build(verbose=False)
        assert obj.integrate() == pytest.approx(1.0, abs=1e-12)

    def test_extrude_then_slice_returns_the_original(self):
        obj = _kinked(n_nodes=[[9, 9]])
        obj.build(verbose=False)
        fat = obj.extrude((1, (-3.0, 3.0), 5))
        thin = fat.slice((1, 1.25))
        for x in (-0.6, 0.4):
            assert thin.eval([x], [0]) == pytest.approx(
                obj.eval([x], [0]), abs=1e-12)

    def test_from_values_with_knots_recovers_a_kinked_surface(self):
        layout = ChebyshevSpline.nodes(
            2, [[-1, 1], [-1, 1]], n_nodes=[7, 9], knots=[[0.3], []])
        per_piece = []
        for piece in layout["pieces"]:
            pts = np.asarray(piece["full_grid"])
            vals = np.abs(pts[:, 0] - 0.3) + pts[:, 1] ** 2
            per_piece.append(vals.reshape(piece["shape"]))
        sp = ChebyshevSpline.from_values(
            per_piece, 2, [[-1, 1], [-1, 1]], [7, 9], [[0.3], []])
        for x in (-0.4, 0.5):
            for y in (-0.8, 0.1):
                assert sp.eval([x, y], [0, 0]) == pytest.approx(
                    abs(x - 0.3) + y ** 2, abs=1e-10)


class TestDefensiveBranches:
    def test_nested_sentinel_without_threshold_raises(self):
        with pytest.raises(ValueError, match="require error_threshold"):
            _kinked(n_nodes=[[None, 11]])

    def test_build_on_a_from_values_spline_raises(self):
        layout = ChebyshevSpline.nodes(1, DOM1, n_nodes=[11], knots=[[0.0]])
        per_piece = [
            np.abs(np.asarray(p["full_grid"])[:, 0]).reshape(p["shape"])
            for p in layout["pieces"]
        ]
        sp = ChebyshevSpline.from_values(per_piece, 1, DOM1, [11], [[0.0]])
        with pytest.raises(RuntimeError, match="no function assigned"):
            sp.build(verbose=False)

    def test_verbose_nested_auto_n_mentions_auto(self, capsys):
        obj = _kinked(n_nodes=[[None, None]], error_threshold=1e-6)
        obj.build(verbose=True)
        assert "auto" in capsys.readouterr().out

    def test_unbuilt_nested_eval_budget_sums_pieces(self):
        obj = _kinked(n_nodes=[[11, 13]])
        assert obj.total_build_evals == 24

    def test_nodes_refuses_nested_budgets(self):
        with pytest.raises(NotImplementedError, match="special-points.md"):
            ChebyshevSpline.nodes(1, DOM1, n_nodes=[[11, 13]], knots=[[0.0]])

    def test_from_values_refuses_nested_budgets(self):
        with pytest.raises(NotImplementedError, match="special-points.md"):
            ChebyshevSpline.from_values(
                [np.zeros(11), np.zeros(13)], 1, DOM1,
                n_nodes=[[11, 13]], knots=[[0.0]])

    def test_setstate_backfills_the_nested_flag(self):
        obj = _kinked(n_nodes=[[11, 11]])
        obj.build(verbose=False)
        state = obj.__getstate__()
        state.pop("_n_nodes_nested", None)
        revived = ChebyshevSpline.__new__(ChebyshevSpline)
        revived.__setstate__(state)
        assert revived._n_nodes_nested is True
        for x in (-0.5, 0.3):
            assert revived.eval([x], [0]) == obj.eval([x], [0])


class TestManyKinks:
    def test_sum_of_four_vees_is_pieced_exactly(self):
        folds = [-0.6, -0.2, 0.1, 0.5]

        def pleats(x, _):
            return sum(abs(x[0] - k) for k in folds)

        obj = ChebyshevApproximation(
            pleats, 1, DOM1, n_nodes=[[5] * 5], special_points=[folds])
        obj.build(verbose=False)
        for x in (-0.7, -0.4, 0.0, 0.3, 0.7):
            assert obj.eval([x], [0]) == pytest.approx(
                sum(abs(x - k) for k in folds), abs=1e-13)

    def test_probe_rejects_a_special_points_channel(self):
        with pytest.raises(TypeError):
            ChebyshevApproximation.get_optimal_n1(
                vee, (-1, 1), 1e-6, special_points=[[0.0]])
