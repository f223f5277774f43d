"""ChebyshevApproximation: accuracy vs analytic oracle, cross-path
consistency, error machinery, calculus, algebra, serialization."""

import math
import pickle

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, Domain, Ns

from conftest import (
    BS_DOMAIN_5D,
    BS_POINT,
    bs_delta,
    bs_gamma,
    bs_price,
    bs_price_vectorized,
    bs_vega,
    sin_sum_3d,
)


# ---------------------------------------------------------------------------
# Accuracy vs analytic oracle
# ---------------------------------------------------------------------------

class TestAccuracy:
    def test_bs5d_price(self, cheb_bs5d):
        approx = cheb_bs5d.vectorized_eval(BS_POINT, [0] * 5)
        exact = bs_price(*BS_POINT)
        assert abs(approx - exact) / exact < 1e-5

    def test_bs5d_price_many_points(self, cheb_bs5d):
        rng = np.random.default_rng(7)
        lo = np.array([b[0] for b in BS_DOMAIN_5D])
        hi = np.array([b[1] for b in BS_DOMAIN_5D])
        pts = lo + (hi - lo) * rng.uniform(0.05, 0.95, size=(50, 5))
        approx = cheb_bs5d.vectorized_eval_batch(pts, [0] * 5)
        exact = bs_price_vectorized(pts)
        rel = np.abs(approx - exact) / np.maximum(np.abs(exact), 1e-10)
        assert np.max(rel) < 5e-4

    def test_bs5d_greeks(self, cheb_bs5d):
        s, k, t, sigma, r = BS_POINT
        delta = cheb_bs5d.vectorized_eval(BS_POINT, [1, 0, 0, 0, 0])
        gamma = cheb_bs5d.vectorized_eval(BS_POINT, [2, 0, 0, 0, 0])
        vega = cheb_bs5d.vectorized_eval(BS_POINT, [0, 0, 0, 1, 0])
        assert abs(delta - bs_delta(s, k, t, sigma, r)) / bs_delta(
            s, k, t, sigma, r) < 0.02
        assert abs(gamma - bs_gamma(s, k, t, sigma, r)) / bs_gamma(
            s, k, t, sigma, r) < 0.02
        assert abs(vega - bs_vega(s, k, t, sigma, r)) / bs_vega(
            s, k, t, sigma, r) < 0.02

    def test_sin3d_value_and_derivative(self, cheb_sin3d):
        pt = [0.5, -0.3, 0.7]
        val = cheb_sin3d.vectorized_eval(pt, [0, 0, 0])
        assert abs(val - (math.sin(0.5) + math.sin(-0.3)
                          + math.sin(0.7))) < 1e-9
        d0 = cheb_sin3d.vectorized_eval(pt, [1, 0, 0])
        assert abs(d0 - math.cos(0.5)) < 1e-7
        d2 = cheb_sin3d.vectorized_eval(pt, [2, 0, 0])
        assert abs(d2 + math.sin(0.5)) < 1e-5


# ---------------------------------------------------------------------------
# Cross-path consistency
# ---------------------------------------------------------------------------

class TestCrossPathConsistency:
    @pytest.mark.parametrize("orders", [[0, 0, 0], [1, 0, 0], [0, 2, 0],
                                        [1, 1, 0], [2, 2, 2]])
    def test_eval_vs_vectorized(self, cheb_sin3d, orders):
        pt = [0.41, -0.73, 0.16]
        a = cheb_sin3d.eval(pt, orders)
        b = cheb_sin3d.vectorized_eval(pt, orders)
        assert abs(a - b) < 1e-10

    def test_eval_at_node_coincidence(self, cheb_sin3d):
        pt = [float(np.asarray(cheb_sin3d.nodes[0])[2]), 0.3,
              float(np.asarray(cheb_sin3d.nodes[2])[8])]
        a = cheb_sin3d.eval(pt, [0, 0, 0])
        b = cheb_sin3d.vectorized_eval(pt, [0, 0, 0])
        assert abs(a - b) < 1e-12

    def test_batch_matches_single(self, cheb_sin3d):
        rng = np.random.default_rng(3)
        pts = rng.uniform(-1, 1, size=(20, 3))
        batch = cheb_sin3d.vectorized_eval_batch(pts, [1, 0, 0])
        singles = [cheb_sin3d.vectorized_eval(list(p), [1, 0, 0])
                   for p in pts]
        np.testing.assert_allclose(batch, singles, atol=1e-12)

    def test_multi_matches_single(self, cheb_sin3d):
        pt = [0.2, 0.4, -0.6]
        orders_list = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 0, 0]]
        multi = cheb_sin3d.vectorized_eval_multi(pt, orders_list)
        for got, orders in zip(multi, orders_list):
            assert abs(got - cheb_sin3d.vectorized_eval(pt, orders)) < 1e-12

    def test_fast_eval_deprecated(self, cheb_sin3d):
        with pytest.warns(DeprecationWarning):
            v = cheb_sin3d.fast_eval([0.1, 0.2, 0.3], [0, 0, 0])
        assert abs(v - cheb_sin3d.vectorized_eval(
            [0.1, 0.2, 0.3], [0, 0, 0])) < 1e-12

    def test_derivative_id_roundtrip(self, cheb_sin3d):
        did = cheb_sin3d.get_derivative_id([1, 0, 0])
        assert cheb_sin3d.get_derivative_id([1, 0, 0]) == did
        a = cheb_sin3d.vectorized_eval([0.1, 0.2, 0.3], derivative_id=did)
        b = cheb_sin3d.vectorized_eval([0.1, 0.2, 0.3], [1, 0, 0])
        assert a == b

    def test_derivative_arg_validation(self, cheb_sin3d):
        with pytest.raises(ValueError):
            cheb_sin3d.vectorized_eval([0.1, 0.2, 0.3])
        with pytest.raises(ValueError):
            cheb_sin3d.vectorized_eval([0.1, 0.2, 0.3], [0, 0, 0],
                                       derivative_id=0)
        with pytest.raises(KeyError):
            cheb_sin3d.vectorized_eval([0.1, 0.2, 0.3], derivative_id=999)


# ---------------------------------------------------------------------------
# Error machinery + auto-N
# ---------------------------------------------------------------------------

class TestErrorMachinery:
    def test_error_estimate_decreases_with_n(self):
        def f(x, _):
            return math.sin(4 * x[0]) + math.cos(5 * x[1])

        errs = []
        for n in [5, 9, 17]:
            cheb = ChebyshevApproximation(f, 2, [[-1, 1]] * 2, [n] * 2)
            cheb.build(verbose=False)
            errs.append(cheb.error_estimate())
        assert errs[0] > errs[1] > errs[2]
        assert errs[2] < 1e-5

    def test_per_dim_sums_to_total(self, cheb_sin3d):
        per_dim = cheb_sin3d._error_estimate_per_dim()
        assert abs(sum(per_dim) - cheb_sin3d.error_estimate()) < 1e-14

    def test_coefficients_1d_matches_scipy(self):
        from scipy.fft import dct
        rng = np.random.default_rng(5)
        v = rng.normal(size=9)
        ours = ChebyshevApproximation._chebyshev_coefficients_1d(v)
        expected = dct(v[::-1], type=2) / 9
        expected[0] /= 2
        np.testing.assert_allclose(ours, expected, atol=1e-13)

    def test_auto_n_reaches_threshold(self):
        def f(x, _):
            return math.sin(3 * x[0]) * math.cos(2 * x[1])

        cheb = ChebyshevApproximation(
            f, 2, [[-1, 1], [-1, 1]], error_threshold=1e-8)
        cheb.build(verbose=False)
        assert cheb.error_estimate() <= 1e-8
        assert all(isinstance(n, int) for n in cheb.n_nodes)
        # counters accumulate across doubling iterations
        assert cheb.n_evaluations > int(np.prod(cheb.n_nodes))

    def test_auto_n_partial(self):
        def f(x, _):
            return math.exp(2 * x[0]) + x[1] ** 2

        cheb = ChebyshevApproximation(
            f, 2, [[-1, 1], [-1, 1]], n_nodes=[None, 5],
            error_threshold=1e-7)
        cheb.build(verbose=False)
        assert cheb.n_nodes[1] == 5
        assert cheb.n_nodes[0] > 3

    def test_auto_n_max_n_warns(self):
        def f(x, _):
            return abs(x[0] - 0.123)  # off-center kink: slow convergence

        cheb = ChebyshevApproximation(
            f, 1, [[-1, 1]], error_threshold=1e-12, max_n=8)
        with pytest.warns(RuntimeWarning):
            cheb.build(verbose=False)
        assert cheb.n_nodes[0] == 8

    def test_get_optimal_n1(self):
        def f(x, _):
            return math.exp(x[0])

        n = ChebyshevApproximation.get_optimal_n1(f, (-1, 1), 1e-10)
        assert 3 < n <= 64

    def test_ctor_validation(self):
        with pytest.raises(ValueError):
            ChebyshevApproximation(sin_sum_3d, 3, [[-1, 1]] * 3)
        with pytest.raises(ValueError):
            ChebyshevApproximation(sin_sum_3d, 3, [[-1, 1]] * 3,
                                   [None, 5, 5])
        with pytest.raises(ValueError):
            ChebyshevApproximation(sin_sum_3d, 3, [[-1, 1]] * 3,
                                   error_threshold=1e-6, max_n=2)

    def test_nan_rejected(self):
        def f(x, _):
            return float("nan") if x[0] > 0 else 1.0

        cheb = ChebyshevApproximation(f, 1, [[-1, 1]], [5])
        with pytest.raises(ValueError, match="non-finite"):
            cheb.build(verbose=False)


# ---------------------------------------------------------------------------
# Sobol indices
# ---------------------------------------------------------------------------

class TestSobol:
    def test_additive_function(self, cheb_sin3d):
        result = cheb_sin3d.sobol_indices()
        # additive: first-order == total-order, all equal by symmetry
        for d in range(3):
            assert abs(result["first_order"][d]
                       - result["total_order"][d]) < 1e-8
            assert abs(result["first_order"][d] - 1.0 / 3.0) < 1e-6
        assert result["variance"] > 0

    def test_single_dim_dominance(self):
        def f(x, _):
            return 10.0 * math.sin(x[0]) + 0.01 * x[1]

        cheb = ChebyshevApproximation(f, 2, [[-1, 1], [-1, 1]], [9, 9])
        cheb.build(verbose=False)
        s = cheb.sobol_indices()
        assert s["first_order"][0] > 0.99
        assert s["first_order"][1] < 0.01

    def test_1d(self):
        def f(x, _):
            return math.cos(x[0])

        cheb = ChebyshevApproximation(f, 1, [[-1, 1]], [9])
        cheb.build(verbose=False)
        s = cheb.sobol_indices()
        assert s["first_order"][0] == 1.0
        assert s["variance"] > 0


# ---------------------------------------------------------------------------
# Calculus
# ---------------------------------------------------------------------------

class TestCalculus:
    def test_integrate_sin_full(self):
        def f(x, _):
            return math.sin(x[0])

        cheb = ChebyshevApproximation(f, 1, [[0.0, math.pi]], [15])
        cheb.build(verbose=False)
        assert abs(cheb.integrate() - 2.0) < 1e-12

    def test_integrate_partial_returns_lower_dim(self, cheb_sin3d):
        reduced = cheb_sin3d.integrate(dims=1)
        assert isinstance(reduced, ChebyshevApproximation)
        assert reduced.num_dimensions == 2
        # integral of sin over [-1,1] is 0 -> reduced == sin(x)+sin(z)
        # evaluated over a symmetric domain the dim-1 term vanishes... but
        # here reduced(x, z) = 2*... actually int_{-1}^{1} sin(y) dy = 0 and
        # int of the constant-in-y terms scales by 2.
        got = reduced.vectorized_eval([0.5, 0.7], [0, 0])
        expected = 2.0 * (math.sin(0.5) + math.sin(0.7))
        assert abs(got - expected) < 1e-9

    def test_integrate_sub_bounds(self):
        def f(x, _):
            return x[0] ** 3

        cheb = ChebyshevApproximation(f, 1, [[-2.0, 2.0]], [9])
        cheb.build(verbose=False)
        got = cheb.integrate(dims=0, bounds=(0.0, 1.5))
        assert abs(got - 1.5 ** 4 / 4.0) < 1e-12

    def test_integrate_bounds_validation(self, cheb_sin3d):
        with pytest.raises(ValueError):
            cheb_sin3d.integrate(dims=0, bounds=(-5.0, 0.5))
        with pytest.raises(ValueError):
            cheb_sin3d.integrate(dims=7)

    def test_roots_1d(self):
        def f(x, _):
            return math.sin(x[0])

        cheb = ChebyshevApproximation(f, 1, [[0.5, 7.0]], [33])
        cheb.build(verbose=False)
        roots = cheb.roots()
        np.testing.assert_allclose(roots, [math.pi, 2 * math.pi],
                                   atol=1e-9)

    def test_roots_multi_d_requires_fixed(self, cheb_sin3d):
        with pytest.raises(ValueError):
            cheb_sin3d.roots(dim=0)
        roots = cheb_sin3d.roots(dim=0, fixed={1: 0.5, 2: -0.2})
        # sin(x) = -(sin(0.5)+sin(-0.2)) has one root in [-1,1]
        expected = math.asin(-(math.sin(0.5) + math.sin(-0.2)))
        np.testing.assert_allclose(roots, [expected], atol=1e-8)

    def test_minimize_maximize(self):
        def f(x, _):
            return (x[0] - 0.3) ** 2

        cheb = ChebyshevApproximation(f, 1, [[-1, 1]], [9])
        cheb.build(verbose=False)
        val, loc = cheb.minimize()
        assert abs(val) < 1e-10 and abs(loc - 0.3) < 1e-7
        val, loc = cheb.maximize()
        assert abs(loc + 1.0) < 1e-10
        assert abs(val - (1.3) ** 2) < 1e-9


# ---------------------------------------------------------------------------
# Extrude / slice
# ---------------------------------------------------------------------------

class TestExtrudeSlice:
    def test_extrude_constant(self, cheb_sin3d):
        ext = cheb_sin3d.extrude((1, (0.0, 10.0), 5))
        assert ext.num_dimensions == 4
        for v in [0.5, 5.0, 9.9]:
            got = ext.vectorized_eval([0.3, v, -0.2, 0.8], [0, 0, 0, 0])
            expected = cheb_sin3d.vectorized_eval([0.3, -0.2, 0.8],
                                                  [0, 0, 0])
            assert abs(got - expected) < 1e-11

    def test_slice_matches_direct_build(self, cheb_sin3d):
        sl = cheb_sin3d.slice((1, 0.4))
        assert sl.num_dimensions == 2
        got = sl.vectorized_eval([0.3, 0.8], [0, 0])
        expected = cheb_sin3d.vectorized_eval([0.3, 0.4, 0.8], [0, 0, 0])
        assert abs(got - expected) < 1e-12

    def test_slice_at_node_exact(self, cheb_sin3d):
        node_val = float(np.asarray(cheb_sin3d.nodes[0])[3])
        sl = cheb_sin3d.slice((0, node_val))
        expected = np.asarray(cheb_sin3d.tensor_values)[3]
        np.testing.assert_array_equal(np.asarray(sl.tensor_values),
                                      expected)

    def test_slice_validation(self, cheb_sin3d):
        with pytest.raises(ValueError):
            cheb_sin3d.slice((0, 5.0))  # out of domain
        with pytest.raises(ValueError):
            cheb_sin3d.slice([(0, 0.1), (1, 0.1), (2, 0.1)])  # all dims

    def test_extrude_validation(self, cheb_sin3d):
        with pytest.raises(ValueError):
            cheb_sin3d.extrude((0, (1.0, 0.0), 5))
        with pytest.raises(ValueError):
            cheb_sin3d.extrude((0, (0.0, 1.0), 1))
        with pytest.raises(TypeError):
            cheb_sin3d.extrude((0.5, (0.0, 1.0), 5))


# ---------------------------------------------------------------------------
# Algebra
# ---------------------------------------------------------------------------

class TestAlgebra:
    def _pair(self):
        def f(x, _):
            return math.sin(x[0]) + x[1]

        def g(x, _):
            return math.cos(x[0]) * x[1]

        a = ChebyshevApproximation(f, 2, [[-1, 1], [-1, 1]], [9, 9])
        b = ChebyshevApproximation(g, 2, [[-1, 1], [-1, 1]], [9, 9])
        a.build(verbose=False)
        b.build(verbose=False)
        return a, b

    def test_add_sub_mul_div(self):
        a, b = self._pair()
        pt = [0.3, -0.6]
        fa = a.vectorized_eval(pt, [0, 0])
        fb = b.vectorized_eval(pt, [0, 0])
        assert abs((a + b).vectorized_eval(pt, [0, 0]) - (fa + fb)) < 1e-12
        assert abs((a - b).vectorized_eval(pt, [0, 0]) - (fa - fb)) < 1e-12
        assert abs((a * 2.5).vectorized_eval(pt, [0, 0]) - 2.5 * fa) < 1e-12
        assert abs((3 * a).vectorized_eval(pt, [0, 0]) - 3 * fa) < 1e-12
        assert abs((a / 2).vectorized_eval(pt, [0, 0]) - fa / 2) < 1e-12
        assert abs((-a).vectorized_eval(pt, [0, 0]) + fa) < 1e-12

    def test_inplace(self):
        a, b = self._pair()
        pt = [0.1, 0.2]
        fa = a.vectorized_eval(pt, [0, 0])
        fb = b.vectorized_eval(pt, [0, 0])
        a += b
        assert abs(a.vectorized_eval(pt, [0, 0]) - (fa + fb)) < 1e-12
        a *= 2.0
        assert abs(a.vectorized_eval(pt, [0, 0]) - 2 * (fa + fb)) < 1e-12

    def test_incompatible(self):
        a, _ = self._pair()
        c = ChebyshevApproximation(
            lambda x, _: x[0], 2, [[-1, 1], [-1, 1]], [7, 9])
        c.build(verbose=False)
        with pytest.raises(ValueError):
            _ = a + c

    def test_mul_non_scalar(self):
        a, b = self._pair()
        with pytest.raises(TypeError):
            _ = a * b


# ---------------------------------------------------------------------------
# Serialization + deferred construction
# ---------------------------------------------------------------------------

class TestSerialization:
    def test_pickle_roundtrip(self, cheb_sin3d, tmp_path):
        p = tmp_path / "s.pkl"
        cheb_sin3d.save(p)
        loaded = ChebyshevApproximation.load(p)
        assert loaded.function is None
        pt = [0.3, 0.5, -0.1]
        assert abs(loaded.vectorized_eval(pt, [1, 0, 0])
                   - cheb_sin3d.vectorized_eval(pt, [1, 0, 0])) < 1e-14

    def test_pickle_roundtrip_bitwise(self, cheb_sin3d, tmp_path):
        """Bitwise reproducibility across save/load (reference contract):
        the host eval path must produce identical bits whether its cache
        was seeded at build time or rebuilt from restored arrays."""
        p = tmp_path / "bits.pkl"
        cheb_sin3d.save(p)
        loaded = ChebyshevApproximation.load(p)
        for pt in ([0.3, 0.5, -0.1], [-0.9, 0.2, 0.8]):
            for orders in ([0, 0, 0], [1, 0, 0], [0, 2, 1]):
                a = cheb_sin3d.vectorized_eval(pt, orders)
                b = loaded.vectorized_eval(pt, orders)
                assert a == b, (pt, orders, a - b)

    def test_pickle_after_host_cache(self):
        """Pickling AFTER the host eval cache is populated must work and
        reproduce identical bits (the strong-ref caches are popped by
        __getstate__ and rebuilt lazily on the loaded object)."""
        import pickle

        c = ChebyshevApproximation(
            lambda x, _: x[0] ** 2, 1, [[-1, 1]], [5])
        c.build(verbose=False)
        before = c.vectorized_eval([0.3], [0])  # populates _host_cache
        loaded = pickle.loads(pickle.dumps(c))
        assert loaded.vectorized_eval([0.3], [0]) == before

    def test_binary_roundtrip(self, cheb_sin3d, tmp_path):
        p = tmp_path / "s.pcb"
        cheb_sin3d.save(p, format="binary")
        assert ChebyshevApproximation.peek_format_version(str(p)) == 1
        loaded = ChebyshevApproximation.load(p)
        pt = [0.3, 0.5, -0.1]
        assert abs(loaded.vectorized_eval(pt, [0, 0, 0])
                   - cheb_sin3d.vectorized_eval(pt, [0, 0, 0])) < 1e-14

    def test_binary_header_bytes(self, cheb_sin3d, tmp_path):
        p = tmp_path / "s.pcb"
        cheb_sin3d.save(p, format="binary")
        raw = p.read_bytes()
        assert raw[:4] == b"PCB\x00"
        assert raw[4] == 1 and raw[5] == 0
        assert raw[6:8] == (1).to_bytes(2, "little")
        assert raw[8:12] == b"\x00\x00\x00\x00"
        d = 3
        expected_size = 12 + 4 + 8 * d * 2 + 4 * d + 8 * 11 ** 3
        assert len(raw) == expected_size

    def test_unbuilt_save_raises(self):
        cheb = ChebyshevApproximation(sin_sum_3d, 3, [[-1, 1]] * 3,
                                      [5, 5, 5])
        with pytest.raises(RuntimeError):
            cheb.save("/tmp/nope.pkl")

    def test_bad_format(self, cheb_sin3d):
        with pytest.raises(ValueError):
            cheb_sin3d.save("/tmp/nope.xyz", format="xml")

    def test_load_rejects_wrong_type(self, tmp_path):
        p = tmp_path / "x.pkl"
        with open(p, "wb") as f:
            pickle.dump({"not": "an interpolant"}, f)
        with pytest.raises(TypeError):
            ChebyshevApproximation.load(p)

    def test_version_stamp_warning(self, cheb_sin3d, tmp_path):
        p = tmp_path / "s.pkl"
        cheb_sin3d.save(p)
        with open(p, "rb") as f:
            obj = pickle.load(f)
        state = obj.__getstate__()
        state["_pychebyshev_version"] = "0.0.1"
        fresh = object.__new__(ChebyshevApproximation)
        with pytest.warns(UserWarning, match="saved with"):
            fresh.__setstate__(state)

    def test_from_values_matches_build(self, cheb_sin3d):
        info = ChebyshevApproximation.nodes(3, [[-1, 1]] * 3, [11, 11, 11])
        vals = (np.sin(info["full_grid"][:, 0])
                + np.sin(info["full_grid"][:, 1])
                + np.sin(info["full_grid"][:, 2])).reshape(info["shape"])
        cheb = ChebyshevApproximation.from_values(
            vals, 3, [[-1, 1]] * 3, [11, 11, 11])
        pt = [0.3, -0.4, 0.9]
        assert abs(cheb.vectorized_eval(pt, [0, 0, 0])
                   - cheb_sin3d.vectorized_eval(pt, [0, 0, 0])) < 1e-14

    def test_from_values_validation(self):
        with pytest.raises(ValueError):
            ChebyshevApproximation.from_values(
                np.zeros((3, 3)), 2, [[-1, 1], [-1, 1]], [3, 4])
        bad = np.zeros((3, 3))
        bad[0, 0] = np.nan
        with pytest.raises(ValueError):
            ChebyshevApproximation.from_values(
                bad, 2, [[-1, 1], [-1, 1]], [3, 3])
        with pytest.raises(ValueError):
            ChebyshevApproximation.from_values(
                np.zeros((3, 3)), 2, [[1, -1], [-1, 1]], [3, 3])

    def test_defer_build(self):
        cheb = ChebyshevApproximation(
            None, 2, [[-1, 1], [-1, 1]], [5, 5], defer_build=True)
        assert not cheb.is_construction_finished()
        pts = cheb.get_evaluation_points()
        vals = (pts[:, 0] ** 2 + pts[:, 1]).reshape(5, 5)
        cheb.set_original_function_values(vals)
        assert cheb.is_construction_finished()
        assert abs(cheb.vectorized_eval([0.5, 0.3], [0, 0])
                   - (0.25 + 0.3)) < 1e-12
        with pytest.raises(RuntimeError):
            cheb.set_original_function_values(vals)

    def test_defer_build_validation(self):
        with pytest.raises(ValueError):
            ChebyshevApproximation(sin_sum_3d, 2, [[-1, 1], [-1, 1]],
                                   [5, 5], defer_build=True)
        with pytest.raises(ValueError):
            ChebyshevApproximation(None, 2, [[-1, 1], [-1, 1]],
                                   defer_build=True)


# ---------------------------------------------------------------------------
# Ergonomics surface
# ---------------------------------------------------------------------------

class TestErgonomics:
    def test_getters(self, cheb_sin3d):
        assert cheb_sin3d.is_construction_finished()
        assert cheb_sin3d.get_constructor_type() == "ChebyshevApproximation"
        assert cheb_sin3d.get_used_ns() == [11, 11, 11]
        assert cheb_sin3d.get_max_derivative_order() == 2
        assert cheb_sin3d.get_error_threshold() is None
        assert cheb_sin3d.get_num_evaluation_points() == 11 ** 3
        assert cheb_sin3d.get_evaluation_points().shape == (11 ** 3, 3)
        assert cheb_sin3d.get_special_points() is None
        assert ChebyshevApproximation.is_dimensionality_allowed(5)
        assert not ChebyshevApproximation.is_dimensionality_allowed(0)

    def test_descriptor(self, cheb_sin3d):
        assert cheb_sin3d.get_descriptor() == ""
        cheb_sin3d.set_descriptor("test label")
        assert cheb_sin3d.get_descriptor() == "test label"
        with pytest.raises(TypeError):
            cheb_sin3d.set_descriptor(42)
        cheb_sin3d.set_descriptor("")

    def test_clone_independent(self, cheb_sin3d):
        c = cheb_sin3d.clone()
        assert c.function is None
        pt = [0.1, 0.2, 0.3]
        assert c.vectorized_eval(pt, [0, 0, 0]) == cheb_sin3d.vectorized_eval(
            pt, [0, 0, 0])
        c *= 2.0
        assert abs(c.vectorized_eval(pt, [0, 0, 0])
                   - 2 * cheb_sin3d.vectorized_eval(pt, [0, 0, 0])) < 1e-12

    def test_eval_batch_alias(self, cheb_sin3d):
        # Common-surface contract: every family spells the batched entry
        # point `eval_batch`; on the dense class it is an alias of
        # vectorized_eval_batch.
        assert (ChebyshevApproximation.eval_batch
                is ChebyshevApproximation.vectorized_eval_batch)
        assert (ChebyshevApproximation.eval_multi
                is ChebyshevApproximation.vectorized_eval_multi)
        pts = np.random.default_rng(0).uniform(-1, 1, (8, 3))
        np.testing.assert_array_equal(
            cheb_sin3d.eval_batch(pts, [0, 0, 0]),
            cheb_sin3d.vectorized_eval_batch(pts, [0, 0, 0]))

    def test_clone_inplace_cache_isolation(self):
        """In-place algebra on a clone (or the original) must never leak
        into the other object's results, including through the
        identity-keyed host/device eval caches built before cloning."""
        cheb = ChebyshevApproximation(
            lambda x, _: np.sin(x[0]) * x[1], 2, [[-1, 1], [0, 2]], [9, 9])
        cheb.build(verbose=False)
        pts = np.column_stack(
            [np.linspace(-0.9, 0.9, 16), np.linspace(0.1, 1.9, 16)])
        a0 = cheb.eval_batch(pts, [0, 0])          # seeds device cache
        h0 = cheb.vectorized_eval([0.3, 0.7], [0, 0])  # seeds host cache
        other = cheb.clone()
        other *= 2.0
        np.testing.assert_array_equal(a0, cheb.eval_batch(pts, [0, 0]))
        assert h0 == cheb.vectorized_eval([0.3, 0.7], [0, 0])
        b1 = other.eval_batch(pts, [0, 0])
        np.testing.assert_allclose(b1, 2 * a0, rtol=0, atol=1e-12)
        cheb /= 4.0
        np.testing.assert_array_equal(b1, other.eval_batch(pts, [0, 0]))
        np.testing.assert_allclose(
            cheb.eval_batch(pts, [0, 0]), a0 / 4, rtol=0, atol=1e-12)

    def test_typed_helpers(self):
        cheb = ChebyshevApproximation(
            sin_sum_3d, 3, Domain(bounds=[(-1, 1)] * 3),
            Ns(counts=[5, 5, 5]))
        cheb.build(verbose=False)
        assert cheb.n_nodes == [5, 5, 5]

    def test_str_repr(self, cheb_sin3d):
        s = str(cheb_sin3d)
        assert "ChebyshevApproximation" in s and "built" in s
        r = repr(cheb_sin3d)
        assert "dims=3" in r

    def test_unbuilt_errors(self):
        cheb = ChebyshevApproximation(sin_sum_3d, 3, [[-1, 1]] * 3,
                                      [5, 5, 5])
        for fn in [
            lambda: cheb.vectorized_eval([0, 0, 0], [0, 0, 0]),
            lambda: cheb.eval([0, 0, 0], [0, 0, 0]),
            lambda: cheb.error_estimate(),
            lambda: cheb.sobol_indices(),
            lambda: cheb.integrate(),
            lambda: cheb.roots(dim=0, fixed={1: 0, 2: 0}),
            lambda: cheb.slice((0, 0.5)),
            lambda: cheb.extrude((0, (0, 1), 5)),
        ]:
            with pytest.raises(RuntimeError):
                fn()

    def test_build_without_function_raises(self, cheb_sin3d, tmp_path):
        p = tmp_path / "x.pkl"
        cheb_sin3d.save(p)
        loaded = ChebyshevApproximation.load(p)
        with pytest.raises(RuntimeError, match="no function"):
            loaded.build()


class TestParallelBuild:
    def test_n_workers_normalization(self):
        from pychebyshev_tpu.utils.parallel_build import normalize_n_workers
        assert normalize_n_workers(None) is None
        assert normalize_n_workers(4) == 4
        assert normalize_n_workers(-1) >= 1
        with pytest.raises(ValueError):
            normalize_n_workers(0)
        with pytest.raises(ValueError):
            normalize_n_workers(-3)

    def test_parallel_build_matches_sequential(self):
        seq = ChebyshevApproximation(_module_f, 2, [[-1, 1], [-1, 1]],
                                     [5, 5])
        seq.build(verbose=False)
        par = ChebyshevApproximation(_module_f, 2, [[-1, 1], [-1, 1]],
                                     [5, 5], n_workers=2)
        par.build(verbose=False)
        np.testing.assert_array_equal(np.asarray(seq.tensor_values),
                                      np.asarray(par.tensor_values))


def _module_f(x, _):
    return x[0] * x[1] + x[0] ** 2


class TestBatchMulti:
    def test_matches_per_spec_batches(self, cheb_sin3d):
        rng = np.random.default_rng(4)
        pts = rng.uniform(-1, 1, size=(700, 3))
        orders_list = [[0, 0, 0], [1, 0, 0], [0, 1, 0], [2, 0, 0]]
        out = cheb_sin3d.vectorized_eval_batch_multi(pts, orders_list)
        assert out.shape == (700, 4)
        for j, orders in enumerate(orders_list):
            expected = cheb_sin3d.vectorized_eval_batch(pts, orders)
            np.testing.assert_allclose(out[:, j], expected, atol=1e-12)

    def test_matches_single_point_multi(self, cheb_sin3d):
        pt = [0.2, -0.5, 0.8]
        orders_list = [[0, 0, 0], [1, 1, 0]]
        batch = cheb_sin3d.vectorized_eval_batch_multi([pt], orders_list)
        single = cheb_sin3d.vectorized_eval_multi(pt, orders_list)
        np.testing.assert_allclose(batch[0], single, atol=1e-12)

    def test_validation(self, cheb_sin3d):
        with pytest.raises(ValueError):
            cheb_sin3d.vectorized_eval_batch_multi(
                np.zeros((3, 3)), [[0, 0]])


class TestDifferentiate:
    """Dense differentiate(): first-class derivative interpolants (the
    dense counterpart of ChebyshevTT.differentiate)."""

    def test_matches_derivative_spec(self, cheb_sin3d):
        delta = cheb_sin3d.differentiate([1, 0, 0])
        pts = np.random.default_rng(0).uniform(-0.9, 0.9, size=(64, 3))
        np.testing.assert_allclose(
            delta.vectorized_eval_batch(pts, [0, 0, 0]),
            cheb_sin3d.vectorized_eval_batch(pts, [1, 0, 0]),
            rtol=1e-12, atol=1e-12)

    def test_chains_and_mixed(self, cheb_sin3d):
        gamma = cheb_sin3d.differentiate([1, 0, 0]).differentiate(
            [1, 0, 0])
        pt = [0.3, 0.5, -0.2]
        assert abs(gamma.vectorized_eval(pt, [0, 0, 0])
                   - cheb_sin3d.vectorized_eval(pt, [2, 0, 0])) < 1e-10
        vanna = cheb_sin3d.differentiate([1, 1, 0])
        assert abs(vanna.vectorized_eval(pt, [0, 0, 0])
                   - cheb_sin3d.vectorized_eval(pt, [1, 1, 0])) < 1e-10

    def test_is_first_class(self, cheb_sin3d, tmp_path):
        delta = cheb_sin3d.differentiate([0, 1, 0])
        # algebra
        doubled = delta + delta
        pt = [0.1, 0.2, 0.3]
        assert abs(doubled.vectorized_eval(pt, [0, 0, 0])
                   - 2 * delta.vectorized_eval(pt, [0, 0, 0])) < 1e-12
        # serialization round trip
        p = tmp_path / "delta.pcb"
        delta.save(p, format="binary")
        back = ChebyshevApproximation.load(p)
        assert abs(back.vectorized_eval(pt, [0, 0, 0])
                   - delta.vectorized_eval(pt, [0, 0, 0])) < 1e-13

    def test_validation(self, cheb_sin3d):
        with pytest.raises(ValueError):
            cheb_sin3d.differentiate([1, 0])          # wrong length
        with pytest.raises(ValueError):
            cheb_sin3d.differentiate([-1, 0, 0])      # negative order
        unbuilt = ChebyshevApproximation(lambda x, _: x[0], 1,
                                         [[-1, 1]], [5])
        with pytest.raises(RuntimeError):
            unbuilt.differentiate([1])


class TestAutoNDeeper:
    """Error-threshold construction details (reference
    test_error_threshold.py behaviors, repo-native)."""

    def test_worst_dim_doubles_anisotropic(self):
        # dim 0 is rough, dim 1 nearly linear: auto-N must spend nodes
        # on dim 0.  (The phase offset breaks odd symmetry — a parity-
        # symmetric function zeroes the last coefficient and fools the
        # tail estimate in this AND the reference implementation.)
        f = lambda x, _: math.sin(8 * x[0] + 0.3) + 0.01 * x[1]
        cheb = ChebyshevApproximation(
            f, 2, [[-1, 1]] * 2, error_threshold=1e-9)
        cheb.build(verbose=False)
        assert cheb.n_nodes[0] > cheb.n_nodes[1]
        assert cheb.error_estimate() <= 1e-9

    def test_threshold_getter_and_flag(self):
        f = lambda x, _: math.sin(x[0])
        cheb = ChebyshevApproximation(f, 1, [[-1, 1]],
                                      error_threshold=1e-6)
        assert cheb.get_error_threshold() == 1e-6
        fixed = ChebyshevApproximation(f, 1, [[-1, 1]], [9])
        assert fixed.get_error_threshold() is None

    def test_eval_accuracy_meets_threshold(self):
        # phase offset: see test_worst_dim_doubles_anisotropic
        f = lambda x, _: math.exp(x[0]) * math.cos(2 * x[1] + 0.7)
        thr = 1e-8
        cheb = ChebyshevApproximation(
            f, 2, [[-1, 1]] * 2, error_threshold=thr)
        cheb.build(verbose=False)
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (200, 2))
        got = cheb.vectorized_eval_batch(pts, [0, 0])
        want = np.array([f(p, None) for p in pts])
        # the estimate is a sup-norm bound up to a small constant
        assert np.abs(got - want).max() < 50 * thr

    def test_auto_n_then_binary_round_trip(self, tmp_path):
        import io

        from pychebyshev_tpu.utils import binary
        f = lambda x, _: math.sin(2 * x[0])
        cheb = ChebyshevApproximation(f, 1, [[-1, 1]],
                                      error_threshold=1e-7)
        cheb.build(verbose=False)
        buf = io.BytesIO()
        binary.write_approx(buf, cheb)
        buf.seek(0)
        loaded = binary.read_approx(buf)
        assert loaded.n_nodes == cheb.n_nodes
        assert loaded.eval([0.37], [0]) == cheb.eval([0.37], [0])

    def test_build_time_accumulates(self):
        f = lambda x, _: math.sin(6 * x[0])
        cheb = ChebyshevApproximation(f, 1, [[-1, 1]],
                                      error_threshold=1e-10)
        cheb.build(verbose=False)
        assert cheb.build_time > 0.0

    def test_mixed_fixed_and_auto_respects_fixed(self):
        f = lambda x, _: math.sin(5 * x[0]) + math.sin(5 * x[1])
        cheb = ChebyshevApproximation(
            f, 2, [[-1, 1]] * 2, n_nodes=[7, None],
            error_threshold=1e-9)
        cheb.build(verbose=False)
        assert cheb.n_nodes[0] == 7
        assert cheb.n_nodes[1] != 7 or cheb.error_estimate() <= 1e-9


class TestTailEstimate:
    """error_estimate(tail=2): the parity-robust beyond-reference knob
    (default tail=1 stays reference-exact)."""

    def test_catches_parity_aliasing(self):
        f = lambda x, _: math.sin(8 * x[0])
        c = ChebyshevApproximation(f, 1, [[-1, 1]], [3])
        c.build(verbose=False)
        assert c.error_estimate() < 1e-12          # fooled (reference too)
        assert c.error_estimate(tail=2) > 0.1      # robust knob sees it

    def test_agrees_on_resolved_fits(self):
        f = lambda x, _: math.exp(x[0]) + 0.3 * x[1]
        c = ChebyshevApproximation(f, 2, [[-1, 1]] * 2, [14, 6])
        c.build(verbose=False)
        e1, e2 = c.error_estimate(), c.error_estimate(tail=2)
        assert e1 <= e2 < 100 * max(e1, 1e-15)

    def test_default_still_cached(self):
        f = lambda x, _: x[0] ** 3
        c = ChebyshevApproximation(f, 1, [[-1, 1]], [6])
        c.build(verbose=False)
        assert c.error_estimate() == c.error_estimate()
        c.error_estimate(tail=3)                   # does not poison cache
        assert c._cached_error_estimate == c.error_estimate()


def test_tail_estimate_threads_through_spline_and_slider():
    from pychebyshev_tpu import ChebyshevSlider, ChebyshevSpline
    f = lambda x, _: math.sin(8 * x[0])
    spl = ChebyshevSpline(f, 1, [[-1, 1]], [3], [[0.35]])
    spl.build(verbose=False)
    assert spl.error_estimate(tail=2) > spl.error_estimate()
    sl = ChebyshevSlider(lambda x, _: math.sin(8 * x[0]) + math.sin(
        8 * x[1]), 2, [[-1, 1]] * 2, [3, 3], [[0], [1]], [0.0, 0.0])
    sl.build(verbose=False)
    assert sl.error_estimate(tail=2) > 0.1 > sl.error_estimate()


class TestDenseInteractionAnalysis:
    def test_detects_planted_coupling(self):
        import math

        def mixed(x, _):
            return math.sin(x[0]) + x[1] * x[2] + math.cos(x[3])

        dense = ChebyshevApproximation(mixed, 4, [[-1, 1]] * 4, [9] * 4)
        dense.build(verbose=False)
        m = dense.interaction_matrix()
        assert m[1, 2] > 0.1 and m[1, 2] == m[2, 1]
        mask = np.ones((4, 4), dtype=bool)
        mask[1, 2] = mask[2, 1] = False
        assert np.abs(m[mask]).max() < 1e-12
        assert dense.suggest_partition() == [[0], [1, 2], [3]]

    def test_matches_tt_interaction_matrix(self):
        import math

        def mixed(x, _):
            return math.sin(x[0]) + 0.5 * x[1] * x[2]

        dense = ChebyshevApproximation(mixed, 3, [[-1, 1]] * 3, [9] * 3)
        dense.build(verbose=False)
        tt = dense.to_tt(tolerance=1e-13)
        np.testing.assert_allclose(tt.interaction_matrix(),
                                   dense.interaction_matrix(),
                                   atol=1e-10)

    def test_unbuilt_raises(self):
        dense = ChebyshevApproximation(
            lambda x, _: x[0], 2, [[-1, 1]] * 2, [5] * 2)
        with pytest.raises(RuntimeError):
            dense.interaction_matrix()
