"""Extrude/slice error paths, metadata, serialization, and portfolio flows.

Native coverage of the reference's extrude/slice suite beyond the value
checks in tests/test_extrude_slice.py (reference
tests/test_extrude_slice.py): validator error matrix, metadata/domain
updates, derivative preservation, eval-surface availability on
transformed objects, slider pivot/partition handling, and the
trade-portfolio alignment use case.
"""

import math
import pickle

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
)


def slope2(x, _):
    return math.sin(x[0]) + 0.5 * x[1] ** 2


SQ = [[-1.0, 1.0], [-1.0, 1.0]]


@pytest.fixture(scope="module")
def flat2():
    c = ChebyshevApproximation(slope2, 2, SQ, [9, 9])
    c.build(verbose=False)
    return c


class TestValidatorMatrix:
    def test_extrude_before_build_raises(self):
        c = ChebyshevApproximation(slope2, 2, SQ, [9, 9])
        with pytest.raises(RuntimeError):
            c.extrude((2, (-1.0, 1.0), 5))

    def test_slice_before_build_raises(self):
        c = ChebyshevApproximation(slope2, 2, SQ, [9, 9])
        with pytest.raises(RuntimeError):
            c.slice((0, 0.5))

    def test_extrude_index_out_of_range(self, flat2):
        with pytest.raises(ValueError, match="out of range"):
            flat2.extrude((5, (-1.0, 1.0), 5))

    def test_extrude_duplicate_targets(self, flat2):
        with pytest.raises(ValueError, match="Duplicate dim_index"):
            flat2.extrude([(2, (-1.0, 1.0), 5), (2, (0.0, 1.0), 4)])

    def test_extrude_inverted_bounds(self, flat2):
        with pytest.raises(ValueError, match="lo must be < hi"):
            flat2.extrude((2, (1.0, -1.0), 5))

    def test_extrude_tiny_node_count(self, flat2):
        with pytest.raises(ValueError, match="n_nodes"):
            flat2.extrude((2, (-1.0, 1.0), 1))

    def test_slice_index_out_of_range(self, flat2):
        with pytest.raises(ValueError, match="out of range"):
            flat2.slice((3, 0.5))

    def test_slice_every_dim_refused(self, flat2):
        with pytest.raises(ValueError, match="0D"):
            flat2.slice([(0, 0.5), (1, 0.5)])

    def test_slice_value_outside_domain(self, flat2):
        with pytest.raises(ValueError):
            flat2.slice((0, 1.5))

    def test_non_int_dim_index_rejected(self, flat2):
        with pytest.raises(TypeError, match="int"):
            flat2.slice([(0.5, 0.5)])


class TestMetadataUpdates:
    def test_extrude_grows_the_domain_records(self, flat2):
        fat = flat2.extrude((2, (0.0, 4.0), 6))
        assert fat.num_dimensions == 3
        assert fat.n_nodes == [9, 9, 6]
        assert list(fat.domain[2]) == [0.0, 4.0]

    def test_slice_shrinks_the_domain_records(self, flat2):
        thin = flat2.slice((0, 0.25))
        assert thin.num_dimensions == 1
        assert thin.n_nodes == [9]
        assert list(thin.domain[0]) == [-1.0, 1.0]

    def test_min_node_extrusion_works(self, flat2):
        fat = flat2.extrude((2, (-1.0, 1.0), 2))
        assert fat.eval([0.3, 0.1, 0.7], [0, 0, 0]) == pytest.approx(
            flat2.eval([0.3, 0.1], [0, 0]), abs=1e-12)

    def test_boundary_slices_both_edges(self, flat2):
        for edge in (-1.0, 1.0):
            thin = flat2.slice((1, edge))
            assert thin.eval([0.4], [0]) == pytest.approx(
                flat2.eval([0.4, edge], [0, 0]), abs=1e-12)


class TestDerivativesAndEstimates:
    def test_slice_keeps_original_dim_derivatives(self, flat2):
        thin = flat2.slice((1, 0.3))
        assert thin.eval([0.2], [1]) == pytest.approx(
            flat2.eval([0.2, 0.3], [1, 0]), abs=1e-10)

    def test_extrude_keeps_original_dim_derivatives(self, flat2):
        fat = flat2.extrude((2, (-1.0, 1.0), 4))
        assert fat.eval([0.2, 0.1, 0.5], [0, 1, 0]) == pytest.approx(
            flat2.eval([0.2, 0.1], [0, 1]), abs=1e-10)

    def test_new_dim_derivative_is_identically_zero(self, flat2):
        fat = flat2.extrude((2, (-1.0, 1.0), 4))
        for t in (-0.8, 0.0, 0.9):
            assert fat.eval([0.2, 0.1, t], [0, 0, 1]) == pytest.approx(
                0.0, abs=1e-11)

    def test_error_estimates_exist_on_transforms(self, flat2):
        assert np.isfinite(flat2.extrude((2, (0, 1), 4)).error_estimate())
        assert np.isfinite(flat2.slice((0, 0.2)).error_estimate())

    def test_batch_and_multi_eval_on_transforms(self, flat2):
        fat = flat2.extrude((0, (0.0, 1.0), 4))
        pts = np.array([[0.5, 0.3, 0.1], [0.2, -0.4, 0.8]])
        got = np.asarray(fat.vectorized_eval_batch(pts, [0, 0, 0]))
        want = [flat2.eval([p[1], p[2]], [0, 0]) for p in pts]
        np.testing.assert_allclose(got, want, atol=1e-10)

        thin = flat2.slice((1, 0.5))
        multi = thin.vectorized_eval_multi([0.3], [[0], [1]])
        assert multi[0] == pytest.approx(
            flat2.eval([0.3, 0.5], [0, 0]), abs=1e-10)
        assert multi[1] == pytest.approx(
            flat2.eval([0.3, 0.5], [1, 0]), abs=1e-10)


class TestTransformSerialization:
    def test_pickle_after_extrude(self, flat2):
        fat = flat2.extrude((2, (-2.0, 2.0), 5))
        back = pickle.loads(pickle.dumps(fat))
        p = [0.3, -0.2, 1.1]
        assert back.eval(p, [0, 0, 0]) == fat.eval(p, [0, 0, 0])

    def test_pcb_after_slice(self, flat2, tmp_path):
        thin = flat2.slice((0, -0.4))
        path = tmp_path / "thin.pcb"
        thin.save(str(path), format="binary")
        back = ChebyshevApproximation.load(str(path))
        assert back.eval([0.6], [0]) == pytest.approx(
            thin.eval([0.6], [0]), abs=1e-14)


class TestSplineTransformShapes:
    @pytest.fixture(scope="class")
    def kinked(self):
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) + 0.2 * x[1], 2, SQ,
            n_nodes=[9, 7], knots=[[0.0], []])
        sp.build(verbose=False)
        return sp

    def test_extrude_preserves_piece_count(self, kinked):
        fat = kinked.extrude((2, (0.0, 1.0), 4))
        assert len(fat._pieces) == len(kinked._pieces)
        assert fat.knots[:2] == kinked.knots
        assert fat.knots[2] == []

    def test_slicing_the_kink_dim_halves_the_pieces(self, kinked):
        thin = kinked.slice((0, 0.5))  # right of the knot
        assert len(thin._pieces) == 1
        assert thin.eval([0.3], [0]) == pytest.approx(
            kinked.eval([0.5, 0.3], [0, 0]), abs=1e-10)

    def test_slicing_the_smooth_dim_keeps_the_knots(self, kinked):
        thin = kinked.slice((1, 0.25))
        assert thin.knots == [[0.0]]
        assert len(thin._pieces) == 2


class TestSliderTransformShapes:
    @pytest.fixture(scope="class")
    def slider(self):
        sl = ChebyshevSlider(
            lambda x, _: x[0] ** 2 + math.sin(x[1]) + x[2], 3,
            [[-1, 1]] * 3, [7, 7, 7],
            partition=[[0], [1, 2]], pivot_point=[0.0, 0.0, 0.0])
        sl.build(verbose=False)
        return sl

    def test_extrude_extends_the_pivot(self, slider):
        fat = slider.extrude((3, (0.0, 2.0), 4))
        assert len(fat.pivot_point) == 4
        p = [0.3, 0.2, -0.1]
        assert fat.eval(p + [1.5], [0, 0, 0, 0]) == pytest.approx(
            slider.eval(p, [0, 0, 0]), abs=1e-10)

    def test_slice_single_dim_group_drops_the_group(self, slider):
        thin = slider.slice((0, 0.4))
        assert thin.num_dimensions == 2
        assert thin.eval([0.2, -0.3], [0, 0]) == pytest.approx(
            slider.eval([0.4, 0.2, -0.3], [0, 0, 0]), abs=1e-10)

    def test_slice_inside_a_multi_dim_group(self, slider):
        thin = slider.slice((1, 0.6))
        assert thin.num_dimensions == 2
        assert thin.eval([0.2, -0.3], [0, 0]) == pytest.approx(
            slider.eval([0.2, 0.6, -0.3], [0, 0, 0]), abs=1e-8)


class TestPortfolioAlignment:
    def test_extrude_aligns_two_trades_for_addition(self):
        # Trade A depends on (S,); trade B on (T,).  Extrude each over
        # the other's variable, then add into a 2-D book model.
        a = ChebyshevApproximation(
            lambda x, _: x[0] ** 2, 1, [[0.5, 2.0]], [9])
        b = ChebyshevApproximation(
            lambda x, _: math.exp(-x[0]), 1, [[0.1, 1.0]], [9])
        a.build(verbose=False)
        b.build(verbose=False)
        a2 = a.extrude((1, (0.1, 1.0), 9))
        b2 = b.extrude((0, (0.5, 2.0), 9))
        book = a2 + b2
        for s, t in ((0.8, 0.3), (1.6, 0.9)):
            assert book.eval([s, t], [0, 0]) == pytest.approx(
                s ** 2 + math.exp(-t), abs=1e-9)
        # Greeks separate cleanly: dV/dS has no T-term and vice versa.
        assert book.eval([1.2, 0.5], [1, 0]) == pytest.approx(
            2 * 1.2, abs=1e-8)
        assert book.eval([1.2, 0.5], [0, 1]) == pytest.approx(
            -math.exp(-0.5), abs=1e-8)
