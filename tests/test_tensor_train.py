"""ChebyshevTT: build methods, eval paths, TT algebra/calculus,
orthogonality, ordering, serialization."""

import math
import pickle

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevTT

from conftest import BS_DOMAIN_5D, BS_POINT, bs_price, bs_price_vectorized


def sin_sum(x, _):
    return math.sin(x[0]) + math.sin(x[1]) + math.sin(x[2])


def separable(x, _):
    # rank-2 function: exp(x) * exp(y) + sin(x) * sin(y)... actually
    # f = g(x)h(y) + u(x)v(y) has TT rank <= 2
    return math.exp(x[0]) * math.cos(x[1]) + math.sin(x[0]) * x[1]


@pytest.fixture(scope="module")
def tt_bs5d():
    tt = ChebyshevTT(bs_price_vectorized, 5, BS_DOMAIN_5D, [11] * 5,
                     max_rank=15, vectorized=True)
    tt.build(verbose=False, seed=42)
    return tt


@pytest.fixture(scope="module")
def tt_sin3d():
    tt = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [11] * 3, max_rank=8)
    tt.build(verbose=False, seed=42)
    return tt


class TestBuild:
    def test_bs5d_accuracy(self, tt_bs5d):
        rng = np.random.default_rng(3)
        lo = np.array([b[0] for b in BS_DOMAIN_5D])
        hi = np.array([b[1] for b in BS_DOMAIN_5D])
        pts = lo + (hi - lo) * rng.uniform(0.05, 0.95, size=(50, 5))
        approx = tt_bs5d.eval_batch(pts)
        exact = bs_price_vectorized(pts)
        rel = np.abs(approx - exact) / np.maximum(np.abs(exact), 1e-10)
        assert np.mean(rel) < 1e-3
        assert np.max(rel) < 5e-3

    def test_cross_far_fewer_evals_than_full(self, tt_bs5d):
        assert tt_bs5d.total_build_evals < 11 ** 5 / 4

    def test_separable_low_rank(self):
        tt = ChebyshevTT(separable, 2, [[-1, 1], [-1, 1]], [9, 9],
                         max_rank=8)
        tt.build(verbose=False, seed=0)
        assert tt.tt_ranks[1] <= 3  # true rank 2 (+ tolerance slack)

    def test_seeded_determinism(self):
        results = []
        for _ in range(2):
            tt = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3,
                             max_rank=6)
            tt.build(verbose=False, seed=123)
            results.append(tt.eval([0.3, -0.2, 0.8]))
        assert results[0] == results[1]

    def test_warm_start_enrichment_grows_ranks(self):
        # With init_rank + kick, bond ranks climb past the per-dim node
        # count (impossible for the default full-size start, whose
        # pivot sets bound every SVD rank).
        tt = ChebyshevTT(bs_price_vectorized, 5, BS_DOMAIN_5D, [11] * 5,
                         max_rank=15, vectorized=True)
        tt.build(verbose=False, seed=0, init_rank=4, kick=3)
        assert max(tt.tt_ranks) > 11
        rng = np.random.default_rng(3)
        lo = np.array([b[0] for b in BS_DOMAIN_5D])
        hi = np.array([b[1] for b in BS_DOMAIN_5D])
        pts = lo + (hi - lo) * rng.uniform(0.05, 0.95, size=(50, 5))
        rel = np.abs(tt.eval_batch(pts) - bs_price_vectorized(pts)) / \
            np.maximum(np.abs(bs_price_vectorized(pts)), 1e-10)
        assert np.max(rel) < 5e-3

    def test_warm_start_without_kick_keeps_small_ranks(self):
        tt = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3, max_rank=8)
        tt.build(verbose=False, seed=0, init_rank=2, kick=0)
        assert max(tt.tt_ranks) <= 2

    def test_stagnation_stop_keeps_best_cores(self):
        # The BS build stalls above tol; the early stop must return the
        # best half-sweep's cores, so accuracy matches a long run.
        tt = ChebyshevTT(bs_price_vectorized, 5, BS_DOMAIN_5D, [11] * 5,
                         max_rank=15, vectorized=True)
        tt.build(verbose=False, seed=0)
        assert tt.total_build_evals < 11 ** 5 / 10
        rng = np.random.default_rng(4)
        lo = np.array([b[0] for b in BS_DOMAIN_5D])
        hi = np.array([b[1] for b in BS_DOMAIN_5D])
        pts = lo + (hi - lo) * rng.uniform(0.05, 0.95, size=(50, 5))
        rel = np.abs(tt.eval_batch(pts) - bs_price_vectorized(pts)) / \
            np.maximum(np.abs(bs_price_vectorized(pts)), 1e-10)
        assert np.max(rel) < 5e-3

    def test_svd_matches_cross(self):
        pt = [0.3, -0.5, 0.7]
        tc = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3, max_rank=8)
        tc.build(verbose=False, seed=1)
        ts = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3, max_rank=8)
        ts.build(verbose=False, method="svd")
        assert abs(tc.eval(pt) - ts.eval(pt)) < 1e-8
        assert abs(ts.eval(pt) - sin_sum(pt, None)) < 1e-7

    def test_als_build(self):
        tt = ChebyshevTT(separable, 2, [[-1, 1], [-1, 1]], [9, 9],
                         max_rank=5, tolerance=1e-10)
        tt.build(verbose=False, method="als", seed=7)
        pt = [0.4, -0.3]
        assert abs(tt.eval(pt) - separable(pt, None)) < 1e-7

    def test_bad_method(self, tt_sin3d):
        with pytest.raises(ValueError):
            ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3).build(
                verbose=False, method="magic")

    def test_ctor_validation(self):
        with pytest.raises(ValueError):
            ChebyshevTT(sin_sum, 3, [[-1, 1]] * 2, [9] * 3)
        with pytest.raises(ValueError):
            ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 2)

    def test_properties(self, tt_bs5d):
        assert tt_bs5d.tt_ranks[0] == 1 and tt_bs5d.tt_ranks[-1] == 1
        assert tt_bs5d.compression_ratio > 5
        assert tt_bs5d.get_num_evaluation_points() == 11 ** 5
        assert tt_bs5d.get_evaluation_points().shape == (11 ** 5, 5)
        s = str(tt_bs5d)
        assert "TT ranks" in s and "Compression" in s


class TestEval:
    def test_batch_matches_single(self, tt_sin3d):
        rng = np.random.default_rng(5)
        pts = rng.uniform(-1, 1, size=(20, 3))
        batch = tt_sin3d.eval_batch(pts)
        singles = [tt_sin3d.eval(list(p)) for p in pts]
        np.testing.assert_allclose(batch, singles, atol=1e-13)

    def test_eval_multi_value(self, tt_sin3d):
        out = tt_sin3d.eval_multi([0.2, 0.4, -0.1], [[0, 0, 0]])
        assert abs(out[0] - tt_sin3d.eval([0.2, 0.4, -0.1])) < 1e-14

    def test_fd_derivatives(self, tt_sin3d):
        pt = [0.3, -0.2, 0.5]
        d1 = tt_sin3d.eval_multi(pt, [[1, 0, 0]])[0]
        assert abs(d1 - math.cos(0.3)) < 1e-5
        d2 = tt_sin3d.eval_multi(pt, [[2, 0, 0]])[0]
        assert abs(d2 + math.sin(0.3)) < 1e-4

    def test_fd_greeks_bs(self, tt_bs5d):
        s, k, t, sigma, r = BS_POINT
        from conftest import bs_delta, bs_gamma
        delta = tt_bs5d.eval_multi(BS_POINT, [[1, 0, 0, 0, 0]])[0]
        gamma = tt_bs5d.eval_multi(BS_POINT, [[2, 0, 0, 0, 0]])[0]
        assert abs(delta - bs_delta(*BS_POINT)) / bs_delta(*BS_POINT) < 0.01
        assert abs(gamma - bs_gamma(*BS_POINT)) / bs_gamma(*BS_POINT) < 0.01

    def test_mixed_partial_fd(self, tt_sin3d):
        # cross derivative of an additive function is ~0
        out = tt_sin3d.eval_multi([0.1, 0.2, 0.3], [[1, 1, 0]])[0]
        assert abs(out) < 1e-4

    def test_batch_multi_matches_eval_multi(self, tt_sin3d):
        rng = np.random.default_rng(9)
        pts = rng.uniform(-1, 1, size=(25, 3))
        orders_list = [[0, 0, 0], [1, 0, 0], [2, 0, 0], [1, 1, 0],
                       [1, 2, 0], [1, 1, 1]]
        out = tt_sin3d.vectorized_eval_batch_multi(pts, orders_list)
        assert out.shape == (25, 6)
        # The stencils are identical; the two contraction backends
        # (device batch vs host loop) differ by ~1e-13 per eval, and
        # each spec's stencil divisor amplifies that noise by
        # prod(1/(2h) per order-1 dim, 1/h^2 per order-2 dim).
        h = tt_sin3d._fd_step(0)
        for i, p in enumerate(pts):
            expected = tt_sin3d.eval_multi(list(p), orders_list)
            for j, orders in enumerate(orders_list):
                amp = 1.0
                for o in orders:
                    amp *= {0: 1.0, 1: 0.5 / h, 2: 1.0 / h ** 2}[o]
                assert abs(out[i, j] - expected[j]) < 1e-13 * amp + 1e-12

    def test_batch_multi_near_boundary_nudge(self, tt_sin3d):
        # Points at the domain edge exercise the boundary clip.
        pts = np.array([[-1.0, 1.0, 0.99999], [1.0, -1.0, -1.0]])
        orders_list = [[1, 0, 0], [0, 2, 0]]
        out = tt_sin3d.vectorized_eval_batch_multi(pts, orders_list)
        for i, p in enumerate(pts):
            expected = tt_sin3d.eval_multi(list(p), orders_list)
            np.testing.assert_allclose(out[i], expected, rtol=0,
                                       atol=1e-5)

    def test_batch_multi_reordered_frame(self, tt_bs5d):
        # The user->storage permutation must thread through specs.
        r = tt_bs5d.reorder([4, 2, 0, 1, 3])
        pts = np.random.default_rng(3).uniform(
            [80, 80, 0.3, 0.15, 0.01], [120, 120, 1.8, 0.35, 0.08],
            size=(8, 5))
        orders_list = [[0] * 5, [1, 0, 0, 0, 0], [0, 0, 1, 0, 0]]
        out = r.vectorized_eval_batch_multi(pts, orders_list)
        for i, p in enumerate(pts):
            expected = r.eval_multi(list(p), orders_list)
            np.testing.assert_allclose(out[i], expected, rtol=1e-8)

    def test_batch_with_derivative_routes_fused(self, tt_sin3d):
        pts = np.random.default_rng(4).uniform(-1, 1, size=(12, 3))
        out = tt_sin3d.vectorized_eval_batch(pts, [1, 0, 0])
        expected = [tt_sin3d.eval_multi(list(p), [[1, 0, 0]])[0]
                    for p in pts]
        np.testing.assert_allclose(out, expected, rtol=0, atol=1e-9)

    def test_batch_multi_validation(self, tt_sin3d):
        with pytest.raises(ValueError, match="does not match"):
            tt_sin3d.vectorized_eval_batch_multi(
                np.zeros((2, 3)), [[0, 0]])
        with pytest.raises(ValueError, match="not supported"):
            tt_sin3d.vectorized_eval_batch_multi(
                np.zeros((2, 3)), [[3, 0, 0]])
        assert tt_sin3d.vectorized_eval_batch_multi(
            np.zeros((4, 3)), []).shape == (4, 0)
        assert (tt_sin3d.eval_batch_multi
                == tt_sin3d.vectorized_eval_batch_multi)

    def test_unbuilt_raises(self):
        tt = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3)
        with pytest.raises(RuntimeError):
            tt.eval([0, 0, 0])
        with pytest.raises(RuntimeError):
            tt.eval_batch(np.zeros((2, 3)))
        with pytest.raises(RuntimeError):
            tt.error_estimate()
        with pytest.raises(RuntimeError):
            _ = tt.tt_ranks


class TestOrthogonality:
    def test_orth_left(self, tt_sin3d):
        tt = tt_sin3d.clone()
        pt = [0.3, 0.1, -0.7]
        before = tt.eval(pt)
        tt.orth_left(2)
        # value unchanged
        assert abs(tt.eval(pt) - before) < 1e-12
        # cores 0..1 left-orthogonal
        for k in range(2):
            c = tt._coeff_cores[k]
            m = c.reshape(-1, c.shape[2])
            np.testing.assert_allclose(m.T @ m, np.eye(c.shape[2]),
                                       atol=1e-12)

    def test_orth_right(self, tt_sin3d):
        tt = tt_sin3d.clone()
        pt = [0.3, 0.1, -0.7]
        before = tt.eval(pt)
        tt.orth_right(0)
        assert abs(tt.eval(pt) - before) < 1e-12
        for k in range(1, 3):
            c = tt._coeff_cores[k]
            m = c.reshape(c.shape[0], -1)
            np.testing.assert_allclose(m @ m.T, np.eye(c.shape[0]),
                                       atol=1e-12)

    def test_orth_position_validation(self, tt_sin3d):
        tt = tt_sin3d.clone()
        with pytest.raises(ValueError):
            tt.orth_left(0)
        with pytest.raises(ValueError):
            tt.orth_right(2)

    def test_run_completion(self):
        tt = ChebyshevTT(separable, 2, [[-1, 1], [-1, 1]], [9, 9],
                         max_rank=3)
        tt.build(verbose=False, seed=2)
        before_ranks = tt.tt_ranks
        tt.run_completion(tolerance=1e-10, max_iter=10)
        assert tt.tt_ranks[1] <= before_ranks[1]  # no rank growth
        pt = [0.4, -0.3]
        assert abs(tt.eval(pt) - separable(pt, None)) < 1e-8


class TestInnerProductAndAlgebra:
    def _pair(self):
        a = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6)
        a.build(verbose=False, seed=1)

        def g(x, _):
            return math.cos(x[0]) * math.cos(x[1]) + x[2]

        b = ChebyshevTT(g, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6)
        b.build(verbose=False, seed=2)
        return a, b

    def test_inner_product_vs_dense(self):
        a, b = self._pair()
        from pychebyshev_tpu.utils.sensitivity import (
            chebyshev_coefficient_tensor,
        )
        ca = np.asarray(chebyshev_coefficient_tensor(a.to_dense()))
        cb = np.asarray(chebyshev_coefficient_tensor(b.to_dense()))
        expected = float(np.sum(ca * cb))
        assert abs(a.inner_product(b) - expected) < 1e-9

    def test_inner_product_validation(self, tt_sin3d):
        with pytest.raises(ValueError):
            tt_sin3d.inner_product("nope")
        other = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [7] * 3)
        other.build(verbose=False)
        with pytest.raises(ValueError):
            tt_sin3d.inner_product(other)

    def test_add_sub_scalar(self):
        a, b = self._pair()
        pt = [0.3, -0.6, 0.1]
        fa, fb = a.eval(pt), b.eval(pt)
        assert abs((a + b).eval(pt) - (fa + fb)) < 1e-8
        assert abs((a - b).eval(pt) - (fa - fb)) < 1e-8
        assert abs((a * 2.5).eval(pt) - 2.5 * fa) < 1e-10
        assert abs((3 * a).eval(pt) - 3 * fa) < 1e-10
        assert abs((a / 2).eval(pt) - fa / 2) < 1e-10
        assert abs((-a).eval(pt) + fa) < 1e-10

    def test_add_rounds_rank(self):
        a, _ = self._pair()
        s = a + a
        # sum of identical TTs has the same intrinsic rank after rounding
        assert s.tt_ranks[1] <= 2 * a.tt_ranks[1]
        pt = [0.1, 0.2, 0.3]
        assert abs(s.eval(pt) - 2 * a.eval(pt)) < 1e-8

    def test_div_by_zero(self, tt_sin3d):
        with pytest.raises(ZeroDivisionError):
            _ = tt_sin3d / 0.0

    def test_type_errors(self, tt_sin3d):
        with pytest.raises(TypeError):
            _ = tt_sin3d * tt_sin3d
        with pytest.raises(TypeError):
            _ = tt_sin3d + 5


class TestCalculus:
    def test_integrate_full(self, tt_sin3d):
        # integral of sin over symmetric domain = 0
        assert abs(tt_sin3d.integrate()) < 1e-9

    def test_integrate_full_nonzero(self):
        def f(x, _):
            return math.exp(x[0]) * math.exp(x[1])

        tt = ChebyshevTT(f, 2, [[0, 1], [0, 1]], [11, 11], max_rank=5)
        tt.build(verbose=False, seed=0)
        expected = (math.e - 1.0) ** 2
        assert abs(tt.integrate() - expected) < 1e-9

    def test_integrate_partial(self, tt_sin3d):
        reduced = tt_sin3d.integrate(dims=1)
        assert isinstance(reduced, ChebyshevTT)
        assert reduced.num_dimensions == 2
        got = reduced.eval([0.5, 0.7])
        expected = 2.0 * (math.sin(0.5) + math.sin(0.7))
        assert abs(got - expected) < 1e-8

    def test_integrate_bounds(self):
        def f(x, _):
            return x[0] ** 3 + x[1]

        tt = ChebyshevTT(f, 2, [[-2, 2], [0, 1]], [9, 9], max_rank=5)
        tt.build(verbose=False, seed=0)
        got = tt.integrate(dims=[0], bounds=[(0.0, 1.5)])
        # over x in [0,1.5]: int x^3 = 1.5^4/4; int x[1] dx0 = 1.5 * x[1]
        val = got.eval([0.3])
        assert abs(val - (1.5 ** 4 / 4 + 1.5 * 0.3)) < 1e-9

    def test_roots_min_max(self):
        def f(x, _):
            return (x[0] - 0.3) * (x[1] + 2.0)

        tt = ChebyshevTT(f, 2, [[-1, 1], [-1, 1]], [9, 9], max_rank=4)
        tt.build(verbose=False, seed=0)
        roots = tt.roots(dim=0, fixed={1: 0.5})
        np.testing.assert_allclose(roots, [0.3], atol=1e-8)
        val, loc = tt.minimize(dim=0, fixed={1: 0.5})
        assert abs(loc + 1.0) < 1e-8
        val, loc = tt.maximize(dim=0, fixed={1: 0.5})
        assert abs(loc - 1.0) < 1e-8

    def test_error_estimate(self, tt_sin3d):
        assert tt_sin3d.error_estimate() < 1e-8  # sin at n=11 is tiny


class TestExtrudeSlice:
    def test_slice_matches_function(self, tt_sin3d):
        sl = tt_sin3d.slice((1, 0.4))
        assert sl.num_dimensions == 2
        got = sl.eval([0.3, 0.8])
        assert abs(got - sin_sum([0.3, 0.4, 0.8], None)) < 1e-9

    def test_slice_at_node(self, tt_sin3d):
        from pychebyshev_tpu.ops.chebyshev import nodes_for_dim
        node = float(np.asarray(nodes_for_dim(-1.0, 1.0, 11))[4])
        sl = tt_sin3d.slice((0, node))
        got = sl.eval([0.2, -0.6])
        assert abs(got - sin_sum([node, 0.2, -0.6], None)) < 1e-9

    def test_extrude_constant(self, tt_sin3d):
        ext = tt_sin3d.extrude((1, (0.0, 9.0), 5))
        assert ext.num_dimensions == 4
        got = ext.eval([0.3, 7.7, -0.2, 0.8])
        assert abs(got - tt_sin3d.eval([0.3, -0.2, 0.8])) < 1e-10

    def test_to_dense_from_values_roundtrip(self, tt_sin3d):
        dense = tt_sin3d.to_dense()
        tt2 = ChebyshevTT.from_values(dense, 3, [[-1, 1]] * 3, [11] * 3)
        pt = [0.25, -0.4, 0.6]
        assert abs(tt2.eval(pt) - tt_sin3d.eval(pt)) < 1e-10

    def test_from_values_validation(self):
        with pytest.raises(ValueError):
            ChebyshevTT.from_values(np.zeros((3, 3)), 2,
                                    [[-1, 1], [-1, 1]], [3, 4])
        bad = np.zeros((3, 3))
        bad[1, 1] = np.inf
        with pytest.raises(ValueError):
            ChebyshevTT.from_values(bad, 2, [[-1, 1], [-1, 1]], [3, 3])


class TestDimOrder:
    def test_reorder_preserves_function(self, tt_sin3d):
        rt = tt_sin3d.reorder([2, 0, 1])
        assert rt.dim_order == [2, 0, 1]
        pt = [0.3, -0.2, 0.8]
        assert abs(rt.eval(pt) - tt_sin3d.eval(pt)) < 1e-9
        pts = np.random.default_rng(0).uniform(-1, 1, (10, 3))
        np.testing.assert_allclose(rt.eval_batch(pts),
                                   tt_sin3d.eval_batch(pts), atol=1e-9)

    def test_reorder_validation(self, tt_sin3d):
        with pytest.raises(ValueError):
            tt_sin3d.reorder([0, 1])
        with pytest.raises(ValueError):
            tt_sin3d.reorder([0, 0, 1])

    def test_with_auto_order(self):
        tt = ChebyshevTT.with_auto_order(
            separable, 2, [[-1, 1], [-1, 1]], [9, 9], max_rank=6,
            n_trials=2)
        pt = [0.4, -0.3]
        assert abs(tt.eval(pt) - separable(pt, None)) < 1e-7

    def test_reordered_slice_and_integrate(self, tt_sin3d):
        rt = tt_sin3d.reorder([2, 0, 1])
        sl = rt.slice((1, 0.4))
        assert abs(sl.eval([0.3, 0.8])
                   - sin_sum([0.3, 0.4, 0.8], None)) < 1e-8
        assert abs(rt.integrate() - tt_sin3d.integrate()) < 1e-9

    def test_reordered_sobol_keys_user_frame(self):
        def f(x, _):
            return 10 * math.sin(x[0]) + 0.1 * x[1]

        tt = ChebyshevTT(f, 2, [[-1, 1], [-1, 1]], [9, 9], max_rank=4)
        tt.build(verbose=False, seed=0)
        rt = tt.reorder([1, 0])
        s0 = tt.sobol_indices()
        s1 = rt.sobol_indices()
        assert abs(s0["first_order"][0] - s1["first_order"][0]) < 1e-8
        assert s1["first_order"][0] > 0.99


class TestSobol:
    def test_tt_sobol_matches_dense(self, tt_sin3d):
        dense = ChebyshevApproximation.from_values(
            tt_sin3d.to_dense(), 3, [[-1, 1]] * 3, [11] * 3)
        s_tt = tt_sin3d.sobol_indices()
        s_dense = dense.sobol_indices()
        for d in range(3):
            assert abs(s_tt["first_order"][d]
                       - s_dense["first_order"][d]) < 1e-9
            assert abs(s_tt["total_order"][d]
                       - s_dense["total_order"][d]) < 1e-9
        assert abs(s_tt["variance"] - s_dense["variance"]) < 1e-9


class TestSerialization:
    def test_pickle_roundtrip(self, tt_bs5d, tmp_path):
        p = tmp_path / "tt.pkl"
        tt_bs5d.save(p)
        loaded = ChebyshevTT.load(p)
        assert loaded.function is None
        assert abs(loaded.eval(BS_POINT) - tt_bs5d.eval(BS_POINT)) < 1e-14
        assert loaded.tt_ranks == tt_bs5d.tt_ranks

    def test_load_wrong_type(self, tmp_path):
        p = tmp_path / "x.pkl"
        with open(p, "wb") as f:
            pickle.dump([1, 2, 3], f)
        with pytest.raises(TypeError):
            ChebyshevTT.load(p)

    def test_unbuilt_save_raises(self, tmp_path):
        tt = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3)
        with pytest.raises(RuntimeError):
            tt.save(tmp_path / "x.pkl")

    def test_clone_independent(self, tt_sin3d):
        c = tt_sin3d.clone()
        assert c.function is None
        c._coeff_cores[0] = c._coeff_cores[0] * 2.0
        assert abs(tt_sin3d.eval([0.1, 0.2, 0.3])
                   - sin_sum([0.1, 0.2, 0.3], None)) < 1e-9


class TestErgonomics:
    def test_surface(self, tt_sin3d):
        assert tt_sin3d.is_construction_finished()
        assert tt_sin3d.get_constructor_type() == "ChebyshevTT"
        assert tt_sin3d.get_used_ns() == [11, 11, 11]
        assert tt_sin3d.get_max_derivative_order() == 2
        assert ChebyshevTT.is_dimensionality_allowed(10)
        tt_sin3d.set_descriptor("tt test")
        assert tt_sin3d.get_descriptor() == "tt test"
        tt_sin3d.set_descriptor("")
        info = ChebyshevTT.nodes(3, [[-1, 1]] * 3, [11] * 3)
        assert len(info["nodes_per_dim"]) == 3


class TestAnalyticDifferentiate:
    def test_matches_dense_analytic(self, tt_sin3d):
        from pychebyshev_tpu import ChebyshevApproximation
        dense = ChebyshevApproximation.from_values(
            tt_sin3d.to_dense(), 3, [[-1, 1]] * 3, [11] * 3)
        d_tt = tt_sin3d.differentiate([1, 0, 0])
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, size=(20, 3))
        got = d_tt.eval_batch(pts)
        expected = dense.vectorized_eval_batch(pts, [1, 0, 0])
        np.testing.assert_allclose(got, expected, atol=1e-9)

    def test_beats_fd_accuracy(self, tt_sin3d):
        pt = [0.3, -0.2, 0.5]
        exact = math.cos(0.3)
        analytic = tt_sin3d.differentiate([1, 0, 0]).eval(pt)
        fd = tt_sin3d.eval_multi(pt, [[1, 0, 0]])[0]
        assert abs(analytic - exact) < abs(fd - exact)
        assert abs(analytic - exact) < 1e-9

    def test_second_and_mixed_orders(self, tt_sin3d):
        pt = [0.3, -0.2, 0.5]
        d2 = tt_sin3d.differentiate([2, 0, 0]).eval(pt)
        assert abs(d2 + math.sin(0.3)) < 1e-7
        # additive function: mixed partial is ~0
        mixed = tt_sin3d.differentiate([1, 1, 0]).eval(pt)
        assert abs(mixed) < 1e-7

    def test_reordered_frame(self, tt_sin3d):
        rt = tt_sin3d.reorder([2, 0, 1])
        pt = [0.3, -0.2, 0.5]
        a = rt.differentiate([0, 1, 0]).eval(pt)
        b = tt_sin3d.differentiate([0, 1, 0]).eval(pt)
        assert abs(a - b) < 1e-9
        assert abs(a - math.cos(-0.2)) < 1e-8

    def test_validation(self, tt_sin3d):
        with pytest.raises(ValueError):
            tt_sin3d.differentiate([1, 0])
        with pytest.raises(ValueError):
            tt_sin3d.differentiate([-1, 0, 0])


class TestMaskedRefinement:
    def test_refinement_improves_bs_accuracy(self):
        # Full-range sampling (edges included): this is where the raw
        # cross has its worst tails (seed 42: ~8% max rel), which the
        # least-squares refinement attacks.  On already-good interior
        # points refinement is roughly neutral.
        rng = np.random.default_rng(3)
        lo = np.array([b[0] for b in BS_DOMAIN_5D])
        hi = np.array([b[1] for b in BS_DOMAIN_5D])
        pts = lo + (hi - lo) * rng.uniform(0.0, 1.0, size=(500, 5))
        exact = bs_price_vectorized(pts)

        def max_rel(tt):
            rel = np.abs(tt.eval_batch(pts) - exact) / np.abs(exact)
            return np.max(rel[np.abs(exact) > 1])

        plain = ChebyshevTT(bs_price_vectorized, 5, BS_DOMAIN_5D,
                            [11] * 5, max_rank=15, vectorized=True)
        plain.build(verbose=False, seed=42)
        refined = ChebyshevTT(bs_price_vectorized, 5, BS_DOMAIN_5D,
                              [11] * 5, max_rank=15, vectorized=True)
        refined.build(verbose=False, seed=42, refine_sweeps=2)
        # Zero extra evaluations, strictly better off-pivot accuracy.
        assert refined.total_build_evals == plain.total_build_evals
        assert max_rel(refined) < 0.6 * max_rel(plain)

    def test_refine_samples_counted(self):
        tt = ChebyshevTT(bs_price_vectorized, 5, BS_DOMAIN_5D, [11] * 5,
                         max_rank=15, vectorized=True)
        tt.build(verbose=False, seed=0, refine_sweeps=2,
                 refine_samples=2000)
        base = ChebyshevTT(bs_price_vectorized, 5, BS_DOMAIN_5D,
                           [11] * 5, max_rank=15, vectorized=True)
        base.build(verbose=False, seed=0)
        assert tt.total_build_evals > base.total_build_evals
        assert tt.total_build_evals < 11 ** 5 / 8  # still far from full

    def test_refinement_deterministic(self):
        vals = []
        for _ in range(2):
            tt = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3,
                             max_rank=6)
            tt.build(verbose=False, seed=5, refine_sweeps=2,
                     refine_samples=100)
            vals.append(tt.eval([0.3, -0.2, 0.8]))
        assert vals[0] == vals[1]


class TestRefineBlackBox:
    def test_refinement_with_scalar_callable(self):
        # Non-vectorized (black-box) oracle path through refinement.
        def f(x, _):
            return math.sin(x[0]) + math.cos(x[1]) * x[2]

        tt = ChebyshevTT(f, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6,
                         vectorized=False)
        tt.build(verbose=False, seed=0, refine_sweeps=2,
                 refine_samples=100)
        pt = [0.3, -0.2, 0.8]
        assert abs(tt.eval(pt) - f(pt, None)) < 1e-7


def test_error_estimate_tail_robust_to_parity():
    import math

    from pychebyshev_tpu import ChebyshevTT
    t = ChebyshevTT(lambda x, _: math.sin(8 * x[0]) + 0.0 * x[1], 2,
                    [[-1, 1]] * 2, [3, 3], max_rank=3)
    t.build(verbose=False, method="svd")
    assert t.error_estimate(tail=2) > t.error_estimate()


class TestCrossRobustness:
    def test_refine_preserves_tiny_amplitude_functions(self):
        """Relative Tikhonov: refinement must not shrink a ~1e-9-scale
        function toward zero (absolute reg once collapsed the cores)."""
        import math

        def tiny(x, _):
            return 1e-9 * (math.sin(x[0]) + 0.5 * x[1])

        tt = ChebyshevTT(tiny, 2, [[-1, 1]] * 2, [9, 9], max_rank=4)
        tt.build(verbose=False, seed=0, refine_sweeps=2)
        pts = np.random.default_rng(2).uniform(-0.9, 0.9, (50, 2))
        want = 1e-9 * (np.sin(pts[:, 0]) + 0.5 * pts[:, 1])
        got = tt.eval_batch(pts)
        assert np.abs(got - want).max() / np.abs(want).max() < 1e-6

    def test_nan_oracle_never_returns_none_cores(self):
        """A NaN-poisoned target makes every error check NaN; the cross
        must stop with usable (possibly NaN-valued) cores, not None."""
        def holey(x, _):
            return float("nan")

        tt = ChebyshevTT(holey, 2, [[-1, 1]] * 2, [5, 5], max_rank=3)
        with pytest.raises(ValueError):
            # The build-level NaN guard fires on the degenerate target;
            # the point is that it raises a CLEAR error, not TypeError
            # from iterating None cores.
            tt.build(verbose=False, seed=0)

    def test_tol_meeting_sweep_is_kept(self):
        """Convergence keeps the cores that just met tol (an older
        'best' from the >=10%-improvement gate must not displace them)."""
        import math
        tt = ChebyshevTT(lambda x, _: math.sin(x[0]) * math.cos(x[1]),
                         2, [[-1, 1]] * 2, [11, 11], max_rank=6,
                         tolerance=1e-8)
        tt.build(verbose=False, seed=0)
        pts = np.random.default_rng(3).uniform(-0.9, 0.9, (50, 2))
        want = np.sin(pts[:, 0]) * np.cos(pts[:, 1])
        assert np.abs(tt.eval_batch(pts) - want).max() < 1e-6

    def test_f32_points_do_not_downcast_f64_cores(self):
        """tt_eval_batch computes in the widest dtype: f32 query points
        against f64 cores stay at f64-class accuracy."""
        import math
        from pychebyshev_tpu.ops.tt_eval import tt_eval_batch
        tt = ChebyshevTT(lambda x, _: math.sin(x[0]) + x[1], 2,
                         [[-1, 1]] * 2, [9, 9], max_rank=4)
        tt.build(verbose=False, seed=0)
        pts32 = np.random.default_rng(4).uniform(
            -0.9, 0.9, (50, 2)).astype(np.float32)
        out = np.asarray(tt_eval_batch(
            tt._coeff_cores, np.asarray(tt.domain, np.float64), pts32))
        assert out.dtype == np.float64
        want = np.asarray(tt.eval_batch(np.asarray(pts32, np.float64)))
        np.testing.assert_allclose(out, want, atol=1e-12)

    def test_empty_oracle_observations_are_well_shaped(self):
        from pychebyshev_tpu.models.tt_algorithms import GridOracle
        oracle = GridOracle(lambda p, _: 0.0,
                            [np.linspace(-1, 1, 5)] * 3)
        keys, vals = oracle.observations()
        assert keys.shape == (0, 3)
        assert vals.shape == (0,)


class TestDenseToTT:
    """ChebyshevApproximation.to_tt — the inverse of to_dense."""

    def test_roundtrip_tensor(self, cheb_bs5d):
        tt = cheb_bs5d.to_tt(tolerance=1e-12)
        dense_back = tt.to_dense()
        tv = np.asarray(cheb_bs5d.tensor_values)
        scale = np.abs(tv).max()
        # Sequential per-bond truncation accumulates ~d x tolerance.
        assert np.abs(dense_back - tv).max() < 2e-11 * scale
        assert tt.num_dimensions == 5
        assert tt.n_nodes == [11] * 5
        assert tt.domain == [list(b) for b in BS_DOMAIN_5D]

    def test_eval_agreement(self, cheb_bs5d):
        rng = np.random.default_rng(3)
        lo = np.array([b[0] for b in BS_DOMAIN_5D])
        hi = np.array([b[1] for b in BS_DOMAIN_5D])
        pts = lo + (hi - lo) * rng.uniform(0.05, 0.95, size=(64, 5))
        tt = cheb_bs5d.to_tt(tolerance=1e-12)
        want = np.asarray(
            cheb_bs5d.vectorized_eval_batch(pts, [0] * 5))
        got = np.asarray(tt.eval_batch(pts))
        assert np.abs(got - want).max() < 5e-12 * np.abs(want).max()

    def test_default_rank_cap_is_unbounded(self, cheb_bs5d):
        # 1e-12 on the BS tensor needs bond ranks past max(n_nodes)=11;
        # from_values' None default would cap there and lose accuracy.
        tt = cheb_bs5d.to_tt(tolerance=1e-12)
        assert max(tt.tt_ranks) > 11

    def test_explicit_max_rank_honored(self, cheb_bs5d):
        tt = cheb_bs5d.to_tt(max_rank=5, tolerance=1e-12)
        assert max(tt.tt_ranks) <= 5

    def test_additive_function_compresses_to_rank_2(self, cheb_sin3d):
        tt = cheb_sin3d.to_tt(tolerance=1e-10)
        assert tt.tt_ranks == [1, 2, 2, 1]

    def test_metadata_carries_over(self, cheb_sin3d):
        cheb = cheb_sin3d.clone()
        cheb.set_descriptor("sin3d")
        tt = cheb.to_tt()
        assert tt.get_descriptor() == "sin3d"
        assert (tt.get_max_derivative_order()
                == cheb.get_max_derivative_order())
        assert tt.function is None
        assert tt.is_construction_finished()

    def test_unbuilt_raises(self):
        cheb = ChebyshevApproximation(
            None, 3, [[-1, 1]] * 3, [9] * 3, defer_build=True)
        with pytest.raises(RuntimeError, match="build"):
            cheb.to_tt()

    def test_dd_serving_composes(self, cheb_bs5d):
        # The compressed model rides the TT digit-GEMM tier directly.
        tt = cheb_bs5d.to_tt(tolerance=1e-12)
        rng = np.random.default_rng(5)
        lo = np.array([b[0] for b in BS_DOMAIN_5D])
        hi = np.array([b[1] for b in BS_DOMAIN_5D])
        pts = lo + (hi - lo) * rng.uniform(0.05, 0.95, size=(32, 5))
        want = np.asarray(
            cheb_bs5d.vectorized_eval_batch(pts, [0] * 5))
        got = np.asarray(tt.eval_batch_dd(pts))
        assert np.abs(got - want).max() < 1e-10 * np.abs(want).max()


class TestToSlider:
    """ChebyshevTT.to_slider — additive projection via exact TT slices."""

    @pytest.fixture(scope="class")
    def tt_mixed(self):
        def mixed(x, _):
            return math.sin(x[0]) + x[1] * x[2]

        tt = ChebyshevTT(mixed, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6,
                         tolerance=1e-10)
        tt.build(verbose=False, seed=0)
        return tt

    def test_additive_projection_is_exact(self):
        def add3(x, _):
            return math.sin(x[0]) + math.cos(x[1]) + x[2] ** 2

        tt = ChebyshevTT(add3, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6,
                         tolerance=1e-10)
        tt.build(verbose=False, seed=0)
        sl = tt.to_slider([[0], [1], [2]], [0.0, 0.0, 0.0])
        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.9, 0.9, (100, 3))
        want = np.asarray(tt.eval_batch(pts))
        got = np.asarray(sl.eval_batch(pts, [0] * 3))
        assert np.abs(got - want).max() < 1e-9

    def test_matches_directly_built_slider(self, tt_mixed):
        from pychebyshev_tpu import ChebyshevSlider

        def mixed(x, _):
            return math.sin(x[0]) + x[1] * x[2]

        direct = ChebyshevSlider(mixed, 3, [[-1, 1]] * 3, [9] * 3,
                                 partition=[[0], [1, 2]],
                                 pivot_point=[0.1, -0.2, 0.3])
        direct.build(verbose=False)
        projected = tt_mixed.to_slider([[0], [1, 2]], [0.1, -0.2, 0.3])
        rng = np.random.default_rng(1)
        pts = rng.uniform(-0.9, 0.9, (100, 3))
        want = np.asarray(direct.eval_batch(pts, [0] * 3))
        got = np.asarray(projected.eval_batch(pts, [0] * 3))
        # TT slicing is exact polynomial evaluation, so the projection
        # matches the sliding technique to TT accuracy.
        assert np.abs(got - want).max() < 1e-9

    def test_group_order_preserved(self, tt_mixed):
        a = tt_mixed.to_slider([[2, 1], [0]], [0.1, -0.2, 0.3])
        b = tt_mixed.to_slider([[1, 2], [0]], [0.1, -0.2, 0.3])
        rng = np.random.default_rng(2)
        pts = rng.uniform(-0.9, 0.9, (50, 3))
        np.testing.assert_allclose(
            np.asarray(a.eval_batch(pts, [0] * 3)),
            np.asarray(b.eval_batch(pts, [0] * 3)), atol=1e-12)

    def test_round_trips_through_to_tt(self, tt_mixed):
        sl = tt_mixed.to_slider([[0], [1, 2]], [0.1, -0.2, 0.3])
        back = sl.to_tt()
        rng = np.random.default_rng(3)
        pts = rng.uniform(-0.9, 0.9, (50, 3))
        np.testing.assert_allclose(
            np.asarray(back.eval_batch(pts)),
            np.asarray(sl.eval_batch(pts, [0] * 3)), atol=1e-12)

    def test_validation(self, tt_mixed):
        with pytest.raises(ValueError, match="Partition must cover"):
            tt_mixed.to_slider([[0], [1]], [0.0, 0.0, 0.0])
        with pytest.raises(ValueError, match="non-empty"):
            tt_mixed.to_slider([[0, 1, 2], []], [0.0, 0.0, 0.0])
        with pytest.raises(ValueError, match="integers"):
            tt_mixed.to_slider([[0], [1.5], [2]], [0.0, 0.0, 0.0])
        with pytest.raises(ValueError, match="pivot_point length"):
            tt_mixed.to_slider([[0], [1], [2]], [0.0, 0.0])
        with pytest.raises(ValueError, match="outside the domain"):
            tt_mixed.to_slider([[0], [1], [2]], [0.0, 0.0, 5.0])
        unbuilt = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3)
        with pytest.raises(RuntimeError):
            unbuilt.to_slider([[0], [1], [2]], [0.0] * 3)

    def test_single_group_degenerate(self, tt_mixed):
        sl = tt_mixed.to_slider([[0, 1, 2]], [0.0, 0.0, 0.0])
        rng = np.random.default_rng(4)
        pts = rng.uniform(-0.9, 0.9, (50, 3))
        np.testing.assert_allclose(
            np.asarray(sl.eval_batch(pts, [0] * 3)),
            np.asarray(tt_mixed.eval_batch(pts)), atol=1e-10)


class TestInteractionAnalysis:
    """interaction_matrix / suggest_partition (pairwise TT Sobol)."""

    @pytest.fixture(scope="class")
    def tt_pair(self):
        def mixed(x, _):
            return math.sin(x[0]) + x[1] * x[2] + math.cos(x[3])

        tt = ChebyshevTT(mixed, 4, [[-1, 1]] * 4, [9] * 4, max_rank=6,
                         tolerance=1e-10)
        tt.build(verbose=False, seed=0)
        return tt

    def test_detects_the_coupled_pair(self, tt_pair):
        m = tt_pair.interaction_matrix()
        assert m[1, 2] > 0.1
        assert m[1, 2] == m[2, 1]
        mask = np.ones((4, 4), dtype=bool)
        mask[1, 2] = mask[2, 1] = False
        assert np.abs(m[mask]).max() < 1e-12
        assert tt_pair.suggest_partition() == [[0], [1, 2], [3]]

    def test_additive_function_is_all_singletons(self):
        tt = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3, max_rank=4,
                         tolerance=1e-10)
        tt.build(verbose=False, seed=0)
        assert tt.suggest_partition() == [[0], [1], [2]]
        assert tt.interaction_matrix().max() < 1e-12

    def test_user_frame_invariant_under_reorder(self, tt_pair):
        m = tt_pair.interaction_matrix()
        r = tt_pair.reorder([2, 0, 3, 1])
        np.testing.assert_allclose(r.interaction_matrix(), m,
                                   atol=1e-12)

    def test_pipeline_to_slider(self, tt_pair):
        sl = tt_pair.to_slider(tt_pair.suggest_partition(), [0.0] * 4)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-0.9, 0.9, (64, 4))
        want = np.asarray(tt_pair.eval_batch(pts))
        got = np.asarray(sl.eval_batch(pts, [0] * 4))
        assert np.abs(got - want).max() < 1e-9

    def test_threshold_semantics(self, tt_pair):
        # Above the pair's 0.376 share nothing merges; at the default
        # threshold (1e-8, above numerical roundoff) only the real
        # coupling does.  threshold=0 is NOT meaningful: roundoff-level
        # positive entries (~1e-16) would merge everything.
        assert tt_pair.suggest_partition(threshold=0.5) == [
            [0], [1], [2], [3]]
        assert tt_pair.suggest_partition(threshold=1e-8) == [
            [0], [1, 2], [3]]

    def test_unbuilt_raises(self):
        tt = ChebyshevTT(sin_sum, 3, [[-1, 1]] * 3, [9] * 3)
        with pytest.raises(RuntimeError):
            tt.interaction_matrix()

    def test_matches_dense_sobol_decomposition(self, tt_pair):
        # Sum rule: first-order shares + all pairwise interaction
        # shares account for the whole variance of this 2-way function.
        m = tt_pair.interaction_matrix()
        s = tt_pair.sobol_indices()
        total_share = sum(s["first_order"].values()) + m.sum() / 2.0
        assert total_share == pytest.approx(1.0, abs=1e-9)
