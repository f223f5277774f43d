"""Clone isolation depth, peek laziness, and legacy-pickle backfill.

Native coverage of the remaining reference v0.16-polish behaviors
(reference tests/test_v016_polish.py) not already pinned by
tests/test_ergonomics.py / tests/test_typed_and_deferred.py: deep clone
isolation, ``peek_format_version`` edge handling, per-class
``get_num_evaluation_points`` semantics, and max_derivative_order
surviving pickles (including legacy states without the field).
"""

import math
import pickle

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)


def hump3(x, _):
    return math.sin(x[0]) + x[1] * x[2]


CUBE = [[-1.0, 1.0]] * 3


@pytest.fixture(scope="module")
def dense():
    c = ChebyshevApproximation(hump3, 3, CUBE, [7, 6, 5])
    c.build(verbose=False)
    return c


class TestEvalPointCounts:
    def test_spline_counts_sum_over_pieces(self):
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) + x[1], 2, [[-1, 1], [-1, 1]],
            n_nodes=[6, 5], knots=[[0.0], []])
        sp.build(verbose=False)
        assert sp.get_num_evaluation_points() == 2 * 6 * 5
        pts = np.asarray(sp.get_evaluation_points())
        assert pts.shape == (2 * 6 * 5, 2)

    def test_tt_reports_the_full_virtual_grid(self):
        tt = ChebyshevTT(hump3, 3, CUBE, [7, 6, 5], max_rank=4)
        tt.build(verbose=False)
        assert tt.get_num_evaluation_points() == 7 * 6 * 5

    def test_slider_counts_match_build_evals(self):
        sl = ChebyshevSlider(
            lambda x, _: x[0] ** 2 + x[1] + x[2], 3, CUBE, [5, 5, 5],
            partition=[[0], [1, 2]], pivot_point=[0.0, 0.0, 0.0])
        sl.build(verbose=False)
        assert sl.get_num_evaluation_points() == sl.total_build_evals
        pts = np.asarray(sl.get_evaluation_points())
        assert pts.ndim == 2 and pts.shape[1] == 3

    def test_dense_grid_columns_hold_unique_nodes(self, dense):
        pts = np.asarray(dense.get_evaluation_points())
        for d, n in enumerate([7, 6, 5]):
            assert len(np.unique(pts[:, d])) == n


class TestCloneIsolationDepth:
    def test_descriptor_edits_do_not_leak(self, dense):
        twin = dense.clone()
        twin.set_descriptor("copy-label")
        assert dense.get_descriptor() != "copy-label"

    def test_additional_data_rides_along(self):
        c = ChebyshevApproximation(
            lambda x, d: d["k"] * x[0], 1, [[-1, 1]], [7],
            additional_data={"k": 2.0})
        c.build(verbose=False)
        assert c.clone().additional_data == {"k": 2.0}

    def test_derivative_id_registry_survives(self, dense):
        d_id = dense.get_derivative_id([1, 0, 0])
        twin = dense.clone()
        p = [0.3, 0.2, -0.4]
        assert twin.eval(p, derivative_id=d_id) == pytest.approx(
            dense.eval(p, derivative_id=d_id), abs=1e-12)

    def test_clone_of_an_extrude_result(self, dense):
        fat = dense.extrude((3, (-2.0, 2.0), 4))
        twin = fat.clone()
        p = [0.3, 0.2, -0.4, 1.0]
        assert twin.eval(p, [0, 0, 0, 0]) == pytest.approx(
            fat.eval(p, [0, 0, 0, 0]), abs=1e-12)

    def test_pickle_strips_the_function(self, dense):
        revived = pickle.loads(pickle.dumps(dense))
        assert revived.function is None
        p = [0.1, -0.5, 0.7]
        assert revived.eval(p, [0, 0, 0]) == dense.eval(p, [0, 0, 0])


class TestPeekLaziness:
    def test_peek_on_a_spline_file(self, tmp_path):
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]), 1, [[-1, 1]], n_nodes=[7],
            knots=[[0.0]])
        sp.build(verbose=False)
        path = tmp_path / "kink.pcb"
        sp.save(str(path), format="binary")
        assert ChebyshevApproximation.peek_format_version(str(path)) == 1

    def test_peek_missing_file_raises(self, tmp_path):
        with pytest.raises((FileNotFoundError, OSError)):
            ChebyshevApproximation.peek_format_version(
                str(tmp_path / "ghost.pcb"))

    def test_peek_reads_only_the_header(self, dense, tmp_path):
        path = tmp_path / "clipped.pcb"
        dense.save(str(path), format="binary")
        blob = path.read_bytes()
        clipped = tmp_path / "head_only.pcb"
        clipped.write_bytes(blob[:16])  # magic + version survive
        assert ChebyshevApproximation.peek_format_version(
            str(clipped)) == 1


class TestMaxDerivativeOrderPersistence:
    def test_tt_custom_order_survives_pickle(self, tmp_path):
        tt = ChebyshevTT(hump3, 3, CUBE, [6, 6, 6], max_rank=4,
                         max_derivative_order=3)
        tt.build(verbose=False)
        path = tmp_path / "tt.pkl"
        tt.save(str(path))
        with open(path, "rb") as fh:
            back = pickle.load(fh)
        assert back.get_max_derivative_order() == 3

    def test_tt_legacy_state_backfills_the_order(self):
        tt = ChebyshevTT(hump3, 3, CUBE, [6, 6, 6], max_rank=4)
        tt.build(verbose=False)
        state = tt.__getstate__()
        state.pop("max_derivative_order", None)
        revived = ChebyshevTT.__new__(ChebyshevTT)
        revived.__setstate__(state)
        assert revived.get_max_derivative_order() == 2

    def test_dense_legacy_state_backfills_the_order(self, dense):
        state = dense.__getstate__()
        state.pop("max_derivative_order", None)
        revived = ChebyshevApproximation.__new__(ChebyshevApproximation)
        revived.__setstate__(state)
        assert revived.get_max_derivative_order() == 2
        p = [0.1, 0.2, 0.3]
        assert revived.eval(p, [0, 0, 0]) == dense.eval(p, [0, 0, 0])


class TestSplineDeferThreading:
    def test_deferred_pieces_inherit_additional_data(self):
        sp = ChebyshevSpline(
            None, 1, [[-1, 1]], n_nodes=[7], knots=[[0.0]],
            defer_build=True, additional_data={"tag": "xyz"})
        assert all(p.additional_data == {"tag": "xyz"}
                   for p in sp._pieces)
