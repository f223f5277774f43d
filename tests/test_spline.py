"""ChebyshevSpline: kink recovery, routing, special_points dispatch,
calculus, algebra, serialization, auto_knots."""

import math
import pickle

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSpline,
    SpecialPoints,
)


def abs_kink(x, _):
    return abs(x[0])


def payoff_2d(x, _):
    # call-payoff-style kink along dim 0 at K=1.0, smooth in dim 1
    return max(x[0] - 1.0, 0.0) * math.exp(-0.1 * x[1])


@pytest.fixture(scope="module")
def spline_abs():
    sp = ChebyshevSpline(abs_kink, 1, [[-1, 1]], [15], [[0.0]])
    sp.build(verbose=False)
    return sp


@pytest.fixture(scope="module")
def spline_2d():
    sp = ChebyshevSpline(payoff_2d, 2, [[0.0, 2.0], [0.0, 1.0]],
                         [12, 10], [[1.0], []])
    sp.build(verbose=False)
    return sp


class TestAccuracy:
    def test_abs_recovered_exactly(self, spline_abs):
        for x in [-0.73, -0.3, 0.001, 0.5, 0.99]:
            assert abs(spline_abs.eval([x], [0]) - abs(x)) < 1e-12

    def test_knot_point_routes_right(self, spline_abs):
        assert abs(spline_abs.eval([0.0], [0])) < 1e-13

    def test_derivative_piecewise(self, spline_abs):
        assert abs(spline_abs.eval([0.5], [1]) - 1.0) < 1e-10
        assert abs(spline_abs.eval([-0.5], [1]) + 1.0) < 1e-10

    def test_derivative_at_knot_raises(self, spline_abs):
        with pytest.raises(ValueError, match="not defined"):
            spline_abs.eval([0.0], [1])

    def test_2d_payoff(self, spline_2d):
        for pt in [[0.5, 0.3], [1.5, 0.7], [1.0001, 0.1]]:
            expected = payoff_2d(pt, None)
            assert abs(spline_2d.eval(pt, [0, 0]) - expected) < 1e-10

    def test_spline_beats_plain_approximation(self):
        # The whole point: a kink destroys spectral convergence for the
        # plain tensor but not for the spline.
        plain = ChebyshevApproximation(abs_kink, 1, [[-1, 1]], [15])
        plain.build(verbose=False)
        sp = ChebyshevSpline(abs_kink, 1, [[-1, 1]], [15], [[0.0]])
        sp.build(verbose=False)
        x = 0.137
        assert abs(sp.eval([x], [0]) - abs(x)) < 1e-12
        assert abs(plain.vectorized_eval([x], [0]) - abs(x)) > 1e-4


class TestDispatch:
    def test_special_points_dispatches_to_spline(self):
        obj = ChebyshevApproximation(
            abs_kink, 1, [[-1, 1]], n_nodes=[[15, 15]],
            special_points=[[0.0]])
        assert isinstance(obj, ChebyshevSpline)
        obj.build(verbose=False)
        assert abs(obj.eval([0.4], [0]) - 0.4) < 1e-12

    def test_empty_special_points_stays_approximation(self):
        obj = ChebyshevApproximation(
            abs_kink, 1, [[-1, 1]], [15], special_points=[[]])
        assert isinstance(obj, ChebyshevApproximation)

    def test_typed_helper(self):
        obj = ChebyshevApproximation(
            abs_kink, 1, [[-1, 1]], n_nodes=[[9, 9]],
            special_points=SpecialPoints(knots_per_dim=[[0.0]]))
        assert isinstance(obj, ChebyshevSpline)

    def test_special_points_validation(self):
        with pytest.raises(ValueError):
            ChebyshevApproximation(abs_kink, 1, [[-1, 1]], [[9, 9]],
                                   special_points=[[2.0]])  # outside
        with pytest.raises(ValueError):
            ChebyshevApproximation(abs_kink, 2, [[-1, 1], [-1, 1]],
                                   special_points=[[0.0]])  # wrong len
        with pytest.raises(ValueError):
            ChebyshevApproximation(abs_kink, 1, [[-1, 1]], [9],
                                   special_points=[[0.0]])  # flat n_nodes
        with pytest.raises(ValueError):
            ChebyshevApproximation(abs_kink, 1, [[-1, 1]],
                                   special_points=[0.0])  # not nested

    def test_knot_validation(self):
        with pytest.raises(ValueError, match="sorted"):
            ChebyshevSpline(abs_kink, 1, [[-1, 1]], [9],
                            [[0.5, -0.5]])
        with pytest.raises(ValueError, match="strictly"):
            ChebyshevSpline(abs_kink, 1, [[-1, 1]], [9], [[1.0]])


class TestBatchRouting:
    def test_batch_matches_single(self, spline_2d):
        rng = np.random.default_rng(11)
        pts = np.column_stack([rng.uniform(0, 2, 50),
                               rng.uniform(0, 1, 50)])
        batch = spline_2d.eval_batch(pts, [0, 0])
        singles = [spline_2d.eval(list(p), [0, 0]) for p in pts]
        np.testing.assert_allclose(batch, singles, atol=1e-13)

    def test_batch_spans_pieces(self, spline_abs):
        pts = np.array([[-0.5], [0.5], [-0.1], [0.9]])
        out = spline_abs.eval_batch(pts, [0])
        np.testing.assert_allclose(out, [0.5, 0.5, 0.1, 0.9], atol=1e-12)

    def test_eval_multi(self, spline_2d):
        pt = [0.5, 0.5]
        multi = spline_2d.eval_multi(pt, [[0, 0], [0, 1]])
        assert abs(multi[0] - spline_2d.eval(pt, [0, 0])) < 1e-13
        assert abs(multi[1] - spline_2d.eval(pt, [0, 1])) < 1e-13

    def test_derivative_id(self, spline_2d):
        did = spline_2d.get_derivative_id([0, 1])
        a = spline_2d.eval([0.5, 0.5], derivative_id=did)
        b = spline_2d.eval([0.5, 0.5], [0, 1])
        assert a == b


class TestNestedNs:
    def test_nested_n_nodes(self):
        sp = ChebyshevSpline(abs_kink, 1, [[-1, 1]], [[9, 17]], [[0.0]])
        sp.build(verbose=False)
        assert sp._pieces[0].n_nodes == [9]
        assert sp._pieces[1].n_nodes == [17]
        assert abs(sp.eval([0.6], [0]) - 0.6) < 1e-12
        assert sp.get_used_ns() == [[9, 17]]

    def test_nested_length_validation(self):
        with pytest.raises(ValueError, match="entries"):
            ChebyshevSpline(abs_kink, 1, [[-1, 1]], [[9, 9, 9]], [[0.0]])

    def test_auto_n_per_piece(self):
        sp = ChebyshevSpline(abs_kink, 1, [[-1, 1]],
                             error_threshold=1e-10, knots=[[0.0]])
        sp.build(verbose=False)
        assert sp.error_estimate() <= 1e-10


class TestErrorAndSobol:
    def test_error_is_max_over_pieces(self, spline_abs):
        per_piece = [p.error_estimate() for p in spline_abs._pieces]
        assert spline_abs.error_estimate() == max(per_piece)

    def test_sobol_single_piece_matches_approx(self):
        def f(x, _):
            return math.sin(x[0]) + 0.3 * x[1]

        sp = ChebyshevSpline(f, 2, [[-1, 1], [-1, 1]], [9, 9],
                             [[], []])
        sp.build(verbose=False)
        ap = ChebyshevApproximation(f, 2, [[-1, 1], [-1, 1]], [9, 9])
        ap.build(verbose=False)
        s1, s2 = sp.sobol_indices(), ap.sobol_indices()
        for d in range(2):
            assert abs(s1["first_order"][d] - s2["first_order"][d]) < 1e-10


class TestCalculus:
    def test_integrate_full(self, spline_abs):
        # integral of |x| over [-1, 1] = 1
        assert abs(spline_abs.integrate() - 1.0) < 1e-12

    def test_integrate_sub_bounds(self, spline_abs):
        got = spline_abs.integrate(dims=0, bounds=(-0.5, 0.5))
        assert abs(got - 0.25) < 1e-12

    def test_integrate_partial(self, spline_2d):
        reduced = spline_2d.integrate(dims=0)
        assert isinstance(reduced, ChebyshevSpline)
        assert reduced.num_dimensions == 1
        # int_0^2 max(x-1,0) dx = 0.5, times exp(-0.1 y)
        got = reduced.eval([0.3], [0])
        assert abs(got - 0.5 * math.exp(-0.03)) < 1e-9

    def test_roots_across_pieces(self):
        def f(x, _):
            return abs(x[0]) - 0.5

        sp = ChebyshevSpline(f, 1, [[-1, 1]], [15], [[0.0]])
        sp.build(verbose=False)
        np.testing.assert_allclose(sp.roots(), [-0.5, 0.5], atol=1e-9)

    def test_minimize_maximize(self, spline_abs):
        val, loc = spline_abs.minimize()
        assert abs(val) < 1e-10 and abs(loc) < 1e-6
        val, loc = spline_abs.maximize()
        assert abs(val - 1.0) < 1e-10 and abs(abs(loc) - 1.0) < 1e-10


class TestExtrudeSlice:
    def test_extrude(self, spline_abs):
        ext = spline_abs.extrude((1, (0.0, 5.0), 4))
        assert ext.num_dimensions == 2
        assert ext.knots == [[0.0], []]
        assert abs(ext.eval([0.5, 3.0], [0, 0]) - 0.5) < 1e-11

    def test_slice_selects_surviving_piece(self, spline_2d):
        sl = spline_2d.slice((0, 1.5))
        assert sl.num_dimensions == 1
        got = sl.eval([0.4], [0])
        assert abs(got - payoff_2d([1.5, 0.4], None)) < 1e-10

    def test_slice_smooth_dim_keeps_knots(self, spline_2d):
        sl = spline_2d.slice((1, 0.5))
        assert sl.num_dimensions == 1
        assert sl.knots == [[1.0]]
        assert sl.num_pieces == 2
        got = sl.eval([0.5, ][0:1], [0])
        assert abs(got - payoff_2d([0.5, 0.5], None)) < 1e-10


class TestAlgebra:
    def test_add_and_scalar(self, spline_abs):
        sp2 = spline_abs + spline_abs
        assert abs(sp2.eval([0.3], [0]) - 0.6) < 1e-12
        sp3 = spline_abs * 3.0
        assert abs(sp3.eval([-0.4], [0]) - 1.2) < 1e-12
        sp4 = -spline_abs
        assert abs(sp4.eval([0.2], [0]) + 0.2) < 1e-12

    def test_inplace(self):
        sp = ChebyshevSpline(abs_kink, 1, [[-1, 1]], [9], [[0.0]])
        sp.build(verbose=False)
        sp *= 2.0
        assert abs(sp.eval([0.3], [0]) - 0.6) < 1e-12

    def test_knot_mismatch(self, spline_abs):
        other = ChebyshevSpline(abs_kink, 1, [[-1, 1]], [15], [[0.5]])
        other.build(verbose=False)
        with pytest.raises(ValueError, match="Knot mismatch"):
            _ = spline_abs + other


class TestSerialization:
    def test_pickle_roundtrip(self, spline_2d, tmp_path):
        p = tmp_path / "sp.pkl"
        spline_2d.save(p)
        loaded = ChebyshevSpline.load(p)
        pt = [0.7, 0.2]
        assert abs(loaded.eval(pt, [0, 0])
                   - spline_2d.eval(pt, [0, 0])) < 1e-14

    def test_pickle_after_masked_cache(self):
        # Regression: eval_batch populates the strong-ref _masked_cache,
        # which must be dropped by __getstate__ (device arrays and
        # unpicklable handles live in it) and lazily rebuilt after load.
        import pickle

        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) + x[1], 2,
            [[-1, 1], [0, 1]], [7, 7], [[0.0], []])
        sp.build(verbose=False)
        pts = np.column_stack(
            [np.linspace(-0.9, 0.9, 32), np.linspace(0.1, 0.9, 32)])
        before = sp.eval_batch(pts, [0, 0])
        loaded = pickle.loads(pickle.dumps(sp))
        after = loaded.eval_batch(pts, [0, 0])
        np.testing.assert_array_equal(before, after)

    def test_binary_roundtrip(self, spline_2d, tmp_path):
        p = tmp_path / "sp.pcb"
        spline_2d.save(p, format="binary")
        raw = p.read_bytes()
        assert raw[:4] == b"PCB\x00"
        assert raw[6:8] == (2).to_bytes(2, "little")
        loaded = ChebyshevSpline.load(p)
        pt = [1.3, 0.8]
        assert abs(loaded.eval(pt, [0, 0])
                   - spline_2d.eval(pt, [0, 0])) < 1e-14

    def test_binary_rejects_nested(self, tmp_path):
        sp = ChebyshevSpline(abs_kink, 1, [[-1, 1]], [[9, 11]], [[0.0]])
        sp.build(verbose=False)
        with pytest.raises(NotImplementedError):
            sp.save(tmp_path / "x.pcb", format="binary")

    def test_nodes_from_values_roundtrip(self, spline_abs):
        info = ChebyshevSpline.nodes(1, [[-1, 1]], [15], [[0.0]])
        assert info["num_pieces"] == 2
        piece_values = [
            np.abs(piece["full_grid"][:, 0]).reshape(piece["shape"])
            for piece in info["pieces"]
        ]
        sp = ChebyshevSpline.from_values(
            piece_values, 1, [[-1, 1]], [15], [[0.0]])
        for x in [-0.8, -0.2, 0.3, 0.7]:
            assert abs(sp.eval([x], [0])
                       - spline_abs.eval([x], [0])) < 1e-14

    def test_defer_build(self):
        sp = ChebyshevSpline(None, 1, [[-1, 1]], [9], [[0.0]],
                             defer_build=True)
        assert not sp.is_construction_finished()
        vals = [np.abs(p.get_evaluation_points()[:, 0]).reshape(9)
                for p in sp._pieces]
        sp.set_original_function_values(vals)
        assert sp.is_construction_finished()
        assert abs(sp.eval([0.5], [0]) - 0.5) < 1e-12

    def test_defer_build_atomic(self):
        sp = ChebyshevSpline(None, 1, [[-1, 1]], [9], [[0.0]],
                             defer_build=True)
        bad = [np.zeros(9), np.zeros(7)]  # second has wrong shape
        with pytest.raises(ValueError):
            sp.set_original_function_values(bad)
        # atomicity: nothing was filled
        assert all(p.tensor_values is None for p in sp._pieces)


class TestErgonomics:
    def test_surface(self, spline_abs):
        assert spline_abs.get_constructor_type() == "ChebyshevSpline"
        assert spline_abs.num_pieces == 2
        assert spline_abs.get_special_points() == [[0.0]]
        assert spline_abs.get_num_evaluation_points() == 30
        assert spline_abs.get_evaluation_points().shape == (30, 1)
        assert spline_abs.total_build_evals == 30
        assert ChebyshevSpline.is_dimensionality_allowed(3)
        s = str(spline_abs)
        assert "ChebyshevSpline" in s and "Pieces" in s

    def test_clone(self, spline_abs):
        c = spline_abs.clone()
        c *= 2.0
        assert abs(spline_abs.eval([0.5], [0]) - 0.5) < 1e-12
        assert abs(c.eval([0.5], [0]) - 1.0) < 1e-12

    def test_unbuilt_errors(self):
        sp = ChebyshevSpline(abs_kink, 1, [[-1, 1]], [9], [[0.0]])
        with pytest.raises(RuntimeError):
            sp.eval([0.5], [0])
        with pytest.raises(RuntimeError):
            sp.error_estimate()
        with pytest.raises(RuntimeError):
            sp.integrate()
        with pytest.raises(RuntimeError):
            sp.save("/tmp/x.pkl")


class TestAutoKnots:
    def test_finds_kink(self):
        sp = ChebyshevSpline.auto_knots(abs_kink, 1, [[-1, 1]])
        assert len(sp.knots[0]) >= 1
        assert min(abs(k) for k in sp.knots[0]) < 0.02
        assert abs(sp.eval([0.37], [0]) - 0.37) < 1e-6

    def test_smooth_function_no_knots(self):
        def f(x, _):
            return math.sin(x[0])

        sp = ChebyshevSpline.auto_knots(f, 1, [[-1, 1]])
        assert sp.knots == [[]]

    def test_2d(self):
        sp = ChebyshevSpline.auto_knots(payoff_2d, 2,
                                        [[0.0, 2.0], [0.0, 1.0]])
        assert len(sp.knots[0]) >= 1
        assert min(abs(k - 1.0) for k in sp.knots[0]) < 0.02
        assert sp.knots[1] == []


class TestMaskedLargePieceCount:
    """P > MASKED_GROUP exercises the group-chunked masked path."""

    def test_27_pieces_matches_single_point(self):
        f = (lambda x, _: abs(x[0]) * abs(x[1] - 0.2)
             + np.sin(3 * x[2]) * abs(x[2] + 0.4))
        knots = [[-0.3, 0.0], [-0.5, 0.2], [-0.4, 0.4]]
        spl = ChebyshevSpline(f, 3, [[-1, 1]] * 3, n_nodes=[6, 6, 6],
                              knots=knots)
        spl.build(verbose=False)
        from pychebyshev_tpu.ops import spline_eval
        assert len(spl._pieces) == 27 > spline_eval.MASKED_GROUP
        assert len(spl._pieces) <= spline_eval.MASKED_MAX_PIECES
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (300, 3))
        batch = spl.eval_batch(pts, [0, 0, 0])
        single = np.array([spl.eval(list(p), [0, 0, 0]) for p in pts])
        np.testing.assert_allclose(batch, single, rtol=0, atol=1e-12)

    def test_routing_host_f64(self):
        # route_piece_indices must agree with the per-point _find_piece
        # including points exactly at knots (side='right').
        spl = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]], [5],
                              [[0.0, 0.5]])
        spl.build(verbose=False)
        from pychebyshev_tpu.ops.spline_eval import (
            piece_strides, route_piece_indices)
        strides = piece_strides([2])
        pts = np.array([[-1.0], [-0.1], [0.0], [0.25], [0.5], [0.9]])
        flat = route_piece_indices(spl.knots, strides, pts)
        assert list(flat) == [0, 0, 1, 1, 2, 2]


class TestBatchMulti:
    """Fused batch x multi-spec path (vectorized_eval_batch_multi)."""

    def test_masked_matches_per_spec(self, spline_2d):
        rng = np.random.default_rng(7)
        pts = rng.uniform([0.0, 0.0], [2.0, 1.0], size=(400, 2))
        orders_list = [[0, 0], [1, 0], [0, 1], [1, 1], [2, 0]]
        out = spline_2d.vectorized_eval_batch_multi(pts, orders_list)
        assert out.shape == (400, 5)
        for j, orders in enumerate(orders_list):
            expected = spline_2d.eval_batch(pts, orders)
            np.testing.assert_allclose(out[:, j], expected, atol=1e-12)

    def test_matches_eval_multi_single_point(self, spline_2d):
        pt = [0.7, 0.4]  # away from the knot
        orders_list = [[0, 0], [1, 0], [0, 2]]
        batch = spline_2d.vectorized_eval_batch_multi([pt], orders_list)
        single = spline_2d.eval_multi(pt, orders_list)
        np.testing.assert_allclose(batch[0], single, atol=1e-12)

    def test_knot_point_one_sided(self, spline_abs):
        # Batched multi never raises at knots: points on a knot take
        # the right piece's one-sided derivative, like eval_batch.
        out = spline_abs.vectorized_eval_batch_multi(
            [[0.0]], [[0], [1]])
        assert abs(out[0, 0]) < 1e-13
        assert abs(out[0, 1] - 1.0) < 1e-10

    def test_nested_grid_grouped_path(self):
        sp = ChebyshevSpline(abs_kink, 1, [[-1, 1]],
                             [[13, 9]], [[0.0]])
        sp.build(verbose=False)
        pts = np.linspace(-0.95, 0.95, 41)[:, None]
        out = sp.vectorized_eval_batch_multi(pts, [[0], [1]])
        np.testing.assert_allclose(out[:, 0],
                                   sp.eval_batch(pts, [0]), atol=1e-12)
        np.testing.assert_allclose(out[:, 1],
                                   sp.eval_batch(pts, [1]), atol=1e-12)

    def test_many_pieces_grouped_fallback(self):
        # 4 knots x 2 dims -> 25 pieces <= 32 masked; push past the
        # f64 masked cap with 6x6=36 pieces to hit the host-grouped
        # per-piece fallback.
        f = lambda x, _: abs(np.sin(2.5 * x[0])) + abs(x[1]) * x[0]
        knots = [[-0.6, -0.2, 0.1, 0.4, 0.7],
                 [-0.5, -0.1, 0.2, 0.5, 0.8]]
        spl = ChebyshevSpline(f, 2, [[-1, 1]] * 2, [5, 5], knots)
        spl.build(verbose=False)
        from pychebyshev_tpu.ops import spline_eval
        assert len(spl._pieces) == 36 > spline_eval.MASKED_MAX_PIECES_F64
        rng = np.random.default_rng(3)
        pts = rng.uniform(-1, 1, (200, 2))
        orders_list = [[0, 0], [1, 0]]
        out = spl.vectorized_eval_batch_multi(pts, orders_list)
        for j, orders in enumerate(orders_list):
            np.testing.assert_allclose(
                out[:, j], spl.eval_batch(pts, orders), atol=1e-12)

    def test_validation(self, spline_2d):
        with pytest.raises(ValueError, match="does not match"):
            spline_2d.vectorized_eval_batch_multi(
                np.zeros((2, 2)), [[0, 0, 0]])
        unbuilt = ChebyshevSpline(abs_kink, 1, [[-1, 1]], [7], [[0.0]])
        with pytest.raises(RuntimeError, match="build"):
            unbuilt.vectorized_eval_batch_multi(
                np.zeros((1, 1)), [[0]])

    def test_alias(self, spline_2d):
        assert (spline_2d.eval_batch_multi
                == spline_2d.vectorized_eval_batch_multi)


class TestSpecialPointsDeeper:
    """Dispatch parity details: the dispatched object must be
    indistinguishable from a directly-constructed ChebyshevSpline."""

    def test_matches_direct_spline(self):
        via = ChebyshevApproximation(
            abs_kink, 1, [[-1, 1]], n_nodes=[[11, 11]],
            special_points=[[0.0]])
        direct = ChebyshevSpline(abs_kink, 1, [[-1, 1]], [[11, 11]],
                                 [[0.0]])
        via.build(verbose=False)
        direct.build(verbose=False)
        for x in (-0.9, -0.01, 0.01, 0.5):
            assert via.eval([x], [0]) == direct.eval([x], [0])

    def test_multi_dim_kinks(self):
        f = lambda x, _: abs(x[0]) + abs(x[1] - 0.5)
        obj = ChebyshevApproximation(
            f, 2, [[-1, 1], [-1, 1]],
            n_nodes=[[8, 8], [8, 8]],
            special_points=[[0.0], [0.5]])
        assert isinstance(obj, ChebyshevSpline)
        obj.build(verbose=False)
        assert len(obj._pieces) == 4
        assert abs(obj.eval([0.4, 0.9], [0, 0]) - (0.4 + 0.4)) < 1e-10

    def test_mixed_kink_and_smooth_dims(self):
        f = lambda x, _: abs(x[0]) + x[1] ** 2
        obj = ChebyshevApproximation(
            f, 2, [[-1, 1], [-1, 1]],
            n_nodes=[[8, 8], [8]], special_points=[[0.0], []])
        assert isinstance(obj, ChebyshevSpline)
        obj.build(verbose=False)
        assert len(obj._pieces) == 2
        assert abs(obj.eval([-0.3, 0.5], [0, 0]) - 0.55) < 1e-10

    def test_dispatched_object_pickles(self, tmp_path):
        import pickle
        obj = ChebyshevApproximation(
            abs_kink, 1, [[-1, 1]], n_nodes=[[9, 9]],
            special_points=[[0.0]])
        obj.build(verbose=False)
        back = pickle.loads(pickle.dumps(obj))
        assert isinstance(back, ChebyshevSpline)
        assert back.eval([0.3], [0]) == obj.eval([0.3], [0])

    def test_dispatched_binary_rejected_nested(self, tmp_path):
        # dispatch always produces nested n_nodes, and the .pcb spline
        # record stores one shared n_nodes vector — so a dispatched
        # object is pickle-only (reference restriction).
        f = lambda x, _: abs(x[0])
        obj = ChebyshevApproximation(
            f, 1, [[-1, 1]], n_nodes=[[9, 9]], special_points=[[0.0]])
        obj.build(verbose=False)
        with pytest.raises(NotImplementedError, match="n_nodes"):
            obj.save(str(tmp_path / "d.pcb"), format="binary")

    def test_per_piece_node_counts(self):
        # nested n_nodes may differ per sub-interval
        obj = ChebyshevSpline(abs_kink, 1, [[-1, 1]], [[6, 12]],
                              [[0.0]])
        obj.build(verbose=False)
        assert obj._pieces[0].n_nodes == [6]
        assert obj._pieces[1].n_nodes == [12]
        assert abs(obj.eval([0.5], [0]) - 0.5) < 1e-11


class TestAutoNResolutionAndHeterogeneousPieces:
    def test_homogeneous_auto_n_resolves_flat_n_nodes(self):
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) ** 3, 1, [[-1, 1]],
            error_threshold=1e-8, knots=[[0.0]])
        sp.build(verbose=False)
        assert all(isinstance(n, int) for n in sp.n_nodes)
        # Downstream consumers of resolved n_nodes all work now:
        doubled = sp + sp
        assert doubled.eval([0.4], [0]) == pytest.approx(
            2 * sp.eval([0.4], [0]), abs=1e-12)
        assert sp.get_used_ns() == sp.n_nodes

    def test_heterogeneous_auto_n_pieces_still_batch(self):
        # One smooth piece (small N) + one hard piece (large N): the
        # masked stack cannot apply; routing per piece must kick in
        # instead of crashing in jnp.stack.
        def lopsided(x, _):
            return x[0] if x[0] < 0 else math.sin(25 * x[0])

        sp = ChebyshevSpline(lopsided, 1, [[-1, 1]],
                             error_threshold=1e-8, knots=[[0.0]])
        sp.build(verbose=False)
        shapes = {tuple(p.n_nodes) for p in sp._pieces}
        assert len(shapes) > 1  # genuinely heterogeneous
        pts = np.linspace(-0.9, 0.9, 50).reshape(-1, 1)
        out = np.asarray(sp.eval_batch(pts, [0]))
        want = np.array([lopsided(p, None) for p in pts])
        np.testing.assert_allclose(out, want, atol=1e-7)
        multi = np.asarray(sp.vectorized_eval_batch_multi(
            pts, [[0], [1]]))
        assert multi.shape == (50, 2)

    def test_ctor_rejects_duplicate_knots(self):
        with pytest.raises(ValueError, match="duplicates"):
            ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]], [7],
                            knots=[[0.5, 0.5]])

    def test_deferred_fill_seeds_the_host_cache(self):
        layout = ChebyshevSpline.nodes(1, [[-1, 1]], [9], [[0.0]])
        vals = [np.abs(np.asarray(p["full_grid"])[:, 0]).reshape(
            p["shape"]) for p in layout["pieces"]]
        sp = ChebyshevSpline(None, 1, [[-1, 1]], [9], [[0.0]],
                             defer_build=True)
        sp.set_original_function_values(vals)
        for piece in sp._pieces:
            assert piece._host_arrays() is not None  # cache seeded
        assert sp.eval([0.4], [0]) == pytest.approx(0.4, abs=1e-12)


class TestSplineInteractionAnalysis:
    def test_detects_coupling_across_pieces(self):
        import math

        def f(x, _):
            return abs(x[0]) + x[1] * x[2]

        s = ChebyshevSpline(f, 3, [[-1, 1]] * 3, [7, 7, 7],
                            knots=[[0.0], [], []])
        s.build(verbose=False)
        m = s.interaction_matrix()
        assert m[1, 2] > 0.1
        assert abs(m[0, 1]) < 1e-10 and abs(m[0, 2]) < 1e-10
        assert s.suggest_partition() == [[0], [1, 2]]

    def test_additive_kink_all_singletons(self, spline_abs):
        m = spline_abs.interaction_matrix()
        assert m.max() < 1e-10

    def test_unbuilt_raises(self):
        s = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]], [7],
                            knots=[[0.0]])
        with pytest.raises(RuntimeError):
            s.interaction_matrix()
