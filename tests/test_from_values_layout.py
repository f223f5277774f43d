"""Spline nodes() layout metadata and remaining from_values edges.

Native coverage of the reference's from_values suite's layout half
(reference tests/test_from_values.py): piece enumeration order,
duplicate-knot and degenerate-domain rejection, high-dim __str__
truncation, and the analytic-derivative order cap.  Bit-equality and
round-trip flows live in tests/test_from_values.py.
"""

import math

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline
from pychebyshev_tpu.ops.chebyshev import barycentric_derivative_analytical


class TestSplineNodesLayout:
    def test_empty_knots_single_piece(self):
        info = ChebyshevSpline.nodes(1, [[-1, 1]], [10], [[]])
        assert info["num_pieces"] == 1
        assert info["piece_shape"] == (1,)

    def test_piece_enumeration_is_row_major(self):
        info = ChebyshevSpline.nodes(
            2, [[-1, 1], [0, 2]], [5, 5], [[0.0], [1.0]])
        assert info["num_pieces"] == 4
        assert info["piece_shape"] == (2, 2)
        got = [p["piece_index"] for p in info["pieces"]]
        assert got == list(np.ndindex(2, 2))

    def test_sub_domains_tile_the_box(self):
        info = ChebyshevSpline.nodes(
            1, [[-1.0, 1.0]], [6], [[-0.25, 0.5]])
        subs = [p["sub_domain"][0] for p in info["pieces"]]
        assert [list(s) for s in subs] == [
            [-1.0, -0.25], [-0.25, 0.5], [0.5, 1.0]]

    def test_duplicate_knots_rejected_everywhere(self):
        with pytest.raises(ValueError, match="duplicates"):
            ChebyshevSpline.nodes(1, [[-1, 1]], [10], [[0.0, 0.0]])
        with pytest.raises(ValueError, match="duplicates"):
            ChebyshevSpline.from_values(
                [np.ones(10)], 1, [[-1, 1]], [10], [[0.0, 0.0]])

    def test_degenerate_domain_rejected(self):
        with pytest.raises(ValueError, match="strictly less"):
            ChebyshevSpline.nodes(1, [[1, 1]], [10], [[]])
        with pytest.raises(ValueError, match="strictly less"):
            ChebyshevApproximation.from_values(
                np.ones(5), 1, [[2, 1]], [5])


class TestFromValuesRemainingEdges:
    def test_multi_knot_1d_round_trip(self):
        knots = [[-0.3, 0.4]]
        layout = ChebyshevSpline.nodes(1, [[-1, 1]], [8], knots)

        def w(t):
            return abs(t + 0.3) * abs(t - 0.4)

        per_piece = [
            np.array([w(q[0]) for q in p["full_grid"]]).reshape(p["shape"])
            for p in layout["pieces"]
        ]
        sp = ChebyshevSpline.from_values(per_piece, 1, [[-1, 1]], [8],
                                         knots)
        for t in (-0.7, -0.3, 0.0, 0.4, 0.8):
            assert sp.eval([t], [0]) == pytest.approx(w(t), abs=1e-9)

    def test_knotless_spline_equals_dense_from_same_values(self):
        layout = ChebyshevApproximation.nodes(1, [[-1, 1]], [9])
        vals = np.cos(layout["nodes_per_dim"][0])
        dense = ChebyshevApproximation.from_values(vals, 1, [[-1, 1]], [9])
        sp = ChebyshevSpline.from_values([vals], 1, [[-1, 1]], [9], [[]])
        for t in (-0.8, 0.1, 0.6):
            assert sp.eval([t], [0]) == pytest.approx(
                dense.vectorized_eval([t], [0]), abs=1e-14)

    def test_max_derivative_order_kwarg_stored_and_high_orders_work(self):
        layout = ChebyshevApproximation.nodes(1, [[0, math.pi]], [25])
        vals = np.sin(layout["nodes_per_dim"][0])
        c = ChebyshevApproximation.from_values(
            vals, 1, [[0, math.pi]], [25], max_derivative_order=3)
        assert c.get_max_derivative_order() == 3
        # d3/dx3 sin = -cos
        assert c.vectorized_eval([1.0], [3]) == pytest.approx(
            -math.cos(1.0), abs=1e-4)
        # The registry enforces the cap (the documented guard surface).
        with pytest.raises(ValueError, match="out of range"):
            c.get_derivative_id([4])

    def test_str_of_a_from_values_object_renders(self):
        layout = ChebyshevApproximation.nodes(2, [[-1, 1], [-1, 1]],
                                              [5, 5])
        c = ChebyshevApproximation.from_values(
            np.ones((5, 5)), 2, [[-1, 1], [-1, 1]], [5, 5])
        s = str(c)
        assert "ChebyshevApproximation" in s and "5" in s


class TestDiagnosticsText:
    def test_high_dim_str_is_truncated(self):
        c = ChebyshevApproximation(
            lambda x, _: sum(x), 7, [[-1, 1]] * 7, [3] * 7)
        s = str(c)
        assert "..." in s
        assert "2,187" in s  # full grid size still reported

    def test_analytic_derivative_order_cap(self):
        nodes = np.array([0.0, 1.0])
        with pytest.raises(ValueError, match="not supported"):
            barycentric_derivative_analytical(
                0.5, nodes, np.array([0.0, 1.0]), np.array([1.0, -1.0]),
                np.array([[0.0, 1.0], [-1.0, 0.0]]), order=3)


def _dense_fv_2d():
    """x^2 + sin(y) on [0,1]x[0,2] from externally-computed values."""
    dom = [[0.0, 1.0], [0.0, 2.0]]
    info = ChebyshevApproximation.nodes(2, dom, [9, 11])
    g = info["full_grid"]
    vals = (g[:, 0] ** 2 + np.sin(g[:, 1])).reshape(9, 11)
    return ChebyshevApproximation.from_values(vals, 2, dom, [9, 11])


class TestFromValuesTransforms:
    """Extrude/slice and the full calculus surface work on objects born
    from from_values, identically to built ones (reference
    tests/test_from_values.py::TestFromValuesApprox extrude/slice/
    integrate rows)."""

    def test_extrude_adds_inert_dimension(self):
        m = _dense_fv_2d()
        e = m.extrude([[2, [0.0, 5.0], 4]])
        assert e.num_dimensions == 3
        want = 0.3 ** 2 + math.sin(1.1)
        for z in (0.0, 2.5, 5.0):
            assert e.vectorized_eval([0.3, 1.1, z], [0, 0, 0]) == \
                pytest.approx(want, abs=1e-10)

    def test_slice_inverts_extrude(self):
        m = _dense_fv_2d()
        s = m.extrude([[2, [0.0, 5.0], 4]]).slice([[2, 1.0]])
        assert s.num_dimensions == 2
        pt = [0.4, 0.9]
        assert s.vectorized_eval(pt, [0, 0]) == pytest.approx(
            m.vectorized_eval(pt, [0, 0]), abs=1e-12)

    def test_partial_integrate(self):
        m = _dense_fv_2d()
        g = m.integrate(dims=[1])      # -> 2*x^2 + (1 - cos 2) in x
        assert g.num_dimensions == 1
        want = 2 * 0.5 ** 2 + (1.0 - math.cos(2.0))
        assert g.vectorized_eval([0.5], [0]) == pytest.approx(
            want, abs=1e-9)

    def test_sub_interval_integrate(self):
        m = _dense_fv_2d()
        got = m.integrate(bounds=[[0.0, 1.0], [0.5, 1.5]])
        want = 1.0 / 3.0 + (math.cos(0.5) - math.cos(1.5))
        assert got == pytest.approx(want, abs=1e-9)

    def test_algebra_chain(self):
        m = _dense_fv_2d()
        chain = (m + m) * 0.5 - m      # should be ~0 everywhere
        rng = np.random.default_rng(3)
        pts = np.column_stack([rng.uniform(0, 1, 32),
                               rng.uniform(0, 2, 32)])
        vals = chain.vectorized_eval_batch(pts, [0, 0])
        assert np.max(np.abs(vals)) < 1e-11


class TestSplineFromValuesServing:
    """Spline from_values objects carry the full serving surface
    (reference tests/test_from_values.py::TestFromValuesSpline
    batch/multi/roots rows)."""

    @pytest.fixture(scope="class")
    def spline_fv(self):
        knots = [[1.0]]
        info = ChebyshevSpline.nodes(1, [[0.0, 2.0]], [11], knots)
        pv = [(np.sin(p["full_grid"][:, 0]) - 0.5).reshape(11)
              for p in info["pieces"]]
        return ChebyshevSpline.from_values(pv, 1, [[0.0, 2.0]], [11],
                                           knots)

    def test_batch_eval(self, spline_fv):
        pts = np.linspace(0.05, 1.95, 23)[:, None]
        got = spline_fv.eval_batch(pts, [0])
        np.testing.assert_allclose(got, np.sin(pts[:, 0]) - 0.5,
                                   atol=1e-9)

    def test_multi_eval_value_and_derivative(self, spline_fv):
        got = spline_fv.eval_multi([0.7], [[0], [1]])
        assert got[0] == pytest.approx(math.sin(0.7) - 0.5, abs=1e-10)
        assert got[1] == pytest.approx(math.cos(0.7), abs=1e-8)

    def test_roots(self, spline_fv):
        roots = spline_fv.roots()
        assert len(roots) == 1
        assert roots[0] == pytest.approx(math.asin(0.5), abs=1e-9)

    def test_extrude(self, spline_fv):
        e = spline_fv.extrude([[1, [0.0, 1.0], 5]])
        assert e.num_dimensions == 2
        assert e.eval([0.7, 0.25], [0, 0]) == pytest.approx(
            math.sin(0.7) - 0.5, abs=1e-9)

    def test_minimize_maximize(self, spline_fv):
        mx, loc = spline_fv.maximize(dim=0)
        assert mx == pytest.approx(math.sin(math.pi / 2) - 0.5, abs=1e-8)
        assert loc == pytest.approx(math.pi / 2, abs=1e-5)
        mn, loc = spline_fv.minimize(dim=0)
        assert mn == pytest.approx(-0.5, abs=1e-9)
        assert loc == pytest.approx(0.0, abs=1e-5)
