"""Global calculus: certified global optima, critical points, and
N-D system solving (the surface the reference roadmap's v0.21 plans
but never shipped — reference docs/roadmap.md).

Covers the subdivision machinery (ops/subdivision.py) directly and the
family-level wiring (utils/globalcalc.py) on all four classes.
"""

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
    CriticalPoint,
    solve_system,
)
from pychebyshev_tpu.ops.chebyshev import _chebpts1_np
from pychebyshev_tpu.ops.dct import _coeff_matrix_np
from pychebyshev_tpu.ops.subdivision import (
    box_enclosure,
    center_values,
    isolate_common_zeros,
    minimize_coeff_tensor,
    minimize_tt_cores,
    restrict_box_coeffs,
    restriction_matrix,
)


def _coeffs_2d(f, nx=9, ny=9):
    xs, ys = _chebpts1_np(nx), _chebpts1_np(ny)
    values = f(xs[:, None], ys[None, :])
    return _coeff_matrix_np(nx) @ values @ _coeff_matrix_np(ny).T


def _build_dense(f, ndim, domain, n_nodes):
    cheb = ChebyshevApproximation(f, ndim, domain, n_nodes,
                                  vectorized=True)
    cheb.build(verbose=False)
    return cheb


class TestSubdivisionPrimitives:
    def test_restriction_exact_for_polynomials(self):
        rng = np.random.default_rng(7)
        for n in (4, 9, 14):
            c = rng.normal(size=n)
            lo, hi = sorted(rng.uniform(-1, 1, size=2))
            mat = restriction_matrix(n, lo, hi)
            t = np.linspace(-1, 1, 41)
            x = 0.5 * (lo + hi) + 0.5 * (hi - lo) * t
            orig = np.polynomial.chebyshev.chebval(x, c)
            sub = np.polynomial.chebyshev.chebval(t, mat @ c)
            np.testing.assert_allclose(sub, orig, atol=1e-12)

    def test_restriction_rejects_bad_interval(self):
        with pytest.raises(ValueError, match="not inside"):
            restriction_matrix(5, -1.5, 0.0)
        with pytest.raises(ValueError, match="not inside"):
            restriction_matrix(5, 0.4, 0.3)

    def test_point_restriction_evaluates(self):
        # lo == hi -> the point restriction: coefficients of f(lo).
        rng = np.random.default_rng(9)
        c = rng.normal(size=8)
        mat = restriction_matrix(8, 0.3, 0.3)
        got = mat @ c
        want = float(np.polynomial.chebyshev.chebval(0.3, c))
        assert abs(got[0] - want) < 1e-14
        np.testing.assert_allclose(got[1:], 0.0, atol=0.0)

    def test_enclosure_contains_samples(self):
        rng = np.random.default_rng(3)
        coeffs = rng.normal(size=(6, 7, 5))
        boxes = np.array([
            [[-1.0, 0.0], [0.25, 1.0], [-0.5, 0.5]],
            [[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]],
        ])
        sub = restrict_box_coeffs(coeffs, boxes)
        c0, rad = box_enclosure(sub)
        for b in range(2):
            pts = np.stack([rng.uniform(lo, hi, 200)
                            for lo, hi in boxes[b]], axis=1)
            vals = []
            for p in pts:
                v = coeffs
                for xi in p:
                    v = np.tensordot(
                        np.polynomial.chebyshev.chebvander(
                            np.array([xi]), v.shape[0] - 1)[0],
                        v, axes=([0], [0]))
                vals.append(float(v))
            vals = np.array(vals)
            assert (vals >= c0[b] - rad[b] - 1e-10).all()
            assert (vals <= c0[b] + rad[b] + 1e-10).all()

    def test_center_values_exact(self):
        rng = np.random.default_rng(5)
        coeffs = rng.normal(size=(5, 6))
        got = center_values(coeffs[None])[0]
        want = float(np.polynomial.chebyshev.chebval(
            0.0, np.polynomial.chebyshev.chebval(0.0, coeffs.T)))
        assert abs(got - want) < 1e-13

    def test_bnb_finds_global_min_2d(self):
        coeffs = _coeffs_2d(
            lambda x, y: (x ** 2 - 0.25) ** 2 + (y - 0.3) ** 2)
        res = minimize_coeff_tensor(coeffs, tol=1e-11)
        assert res.certified
        assert res.value < 1e-10
        assert abs(abs(res.location[0]) - 0.5) < 1e-4
        assert abs(res.location[1] - 0.3) < 1e-4

    def test_bnb_rejects_bad_tol(self):
        coeffs = _coeffs_2d(lambda x, y: x + y)
        with pytest.raises(ValueError, match="tol must be positive"):
            minimize_coeff_tensor(coeffs, tol=0.0)

    def test_isolation_circle_line(self):
        f1 = _coeffs_2d(lambda x, y: x ** 2 + y ** 2 - 0.64)
        f2 = _coeffs_2d(lambda x, y: x - y + 0.0 * x)
        cands = isolate_common_zeros([f1, f2], delta=1e-3)
        assert cands.shape[0] >= 2
        r = 0.8 / np.sqrt(2)
        for c in cands:
            assert min(abs(c[0] - r), abs(c[0] + r)) < 5e-3

    def test_isolation_budget_raises_on_manifold(self):
        # f1 == f2: the zero set is the whole circle -> not isolated.
        f1 = _coeffs_2d(lambda x, y: x ** 2 + y ** 2 - 0.64)
        with pytest.raises(ValueError, match="max_boxes"):
            isolate_common_zeros([f1, f1], delta=1e-4, max_boxes=2000)

    def test_isolation_empty_when_no_zero(self):
        f1 = _coeffs_2d(lambda x, y: x ** 2 + y ** 2 + 1.0)
        f2 = _coeffs_2d(lambda x, y: x - y + 0.0 * x)
        assert isolate_common_zeros([f1, f2]).shape[0] == 0

    def test_tt_cores_bnb_separable(self):
        def c1(f, n=9):
            x = _chebpts1_np(n)
            return _coeff_matrix_np(n) @ f(x)

        a = c1(lambda x: (x ** 2 - 0.25) ** 2)
        b = c1(lambda y: (y - 0.3) ** 2)
        one = np.zeros(9)
        one[0] = 1.0
        g1 = np.zeros((1, 9, 2))
        g1[0, :, 0], g1[0, :, 1] = a, one
        g2 = np.zeros((2, 9, 1))
        g2[0, :, 0], g2[1, :, 0] = one, b
        res = minimize_tt_cores([g1, g2], tol=1e-10, max_boxes=50000)
        assert res.certified
        assert res.value < 1e-9


class TestDenseGlobal:
    def setup_method(self):
        self.cheb = _build_dense(
            lambda p, d: (p[:, 0] ** 2 - 1.0) ** 2 + (p[:, 1] - 0.3) ** 2,
            2, [[-2, 2], [-1, 1]], [9, 7])

    def test_global_minimize(self):
        value, point = self.cheb.minimize()
        assert abs(value) < 1e-10
        assert abs(abs(point[0]) - 1.0) < 1e-8
        assert abs(point[1] - 0.3) < 1e-8

    def test_global_maximize_boundary(self):
        value, point = self.cheb.maximize()
        # (4-1)^2 + (-1-0.3)^2 at (+-2, -1)
        assert abs(value - 10.69) < 1e-9
        assert abs(abs(point[0]) - 2.0) < 1e-8
        assert abs(point[1] + 1.0) < 1e-8

    def test_global_value_matches_eval_at_point(self):
        value, point = self.cheb.minimize()
        assert abs(float(self.cheb.vectorized_eval(point, [0, 0])) - value) < 1e-12

    def test_fixed_subset_matches_sliced_global(self):
        cheb = _build_dense(
            lambda p, d: ((p[:, 0] ** 2 - 1.0) ** 2 + (p[:, 1] - 0.3) ** 2
                          + p[:, 2]),
            3, [[-2, 2], [-1, 1], [0, 1]], [9, 7, 5])
        value, point = cheb.minimize(fixed={2: 0.5})
        assert abs(value - 0.5) < 1e-9
        assert point[2] == 0.5
        sliced = cheb.slice([(2, 0.5)])
        v2, p2 = sliced.minimize()
        assert abs(value - v2) < 1e-10

    def test_fixed_all_but_one_uses_exact_path(self):
        value, point = self.cheb.minimize(fixed={0: 0.0})
        assert point[0] == 0.0
        assert abs(value - 1.0) < 1e-10
        assert abs(point[1] - 0.3) < 1e-10

    def test_one_dim_semantics_unchanged(self):
        c1 = _build_dense(lambda p, d: (p[:, 0] - 0.2) ** 2, 1,
                          [[-1, 1]], [7])
        value, loc = c1.minimize()
        assert isinstance(loc, float)
        assert abs(loc - 0.2) < 1e-10

    def test_dim_path_unchanged(self):
        value, loc = self.cheb.minimize(dim=0, fixed={1: 0.3})
        assert isinstance(loc, float)
        assert abs(abs(loc) - 1.0) < 1e-8

    def test_fixed_everything_raises(self):
        with pytest.raises(ValueError, match="at least one dim"):
            self.cheb.minimize(fixed={0: 0.0, 1: 0.0})

    def test_fixed_out_of_domain_raises(self):
        with pytest.raises(ValueError, match="outside"):
            self.cheb.minimize(fixed={1: 5.0})

    def test_fixed_bad_dim_raises(self):
        with pytest.raises(ValueError, match="out of range"):
            self.cheb.minimize(fixed={7: 0.0})

    def test_before_build_raises(self):
        cheb = ChebyshevApproximation(
            None, 2, [[-1, 1], [-1, 1]], [5, 5], defer_build=True)
        with pytest.raises(RuntimeError, match="build"):
            cheb.minimize()

    def test_uncertified_warns(self):
        rng = np.random.default_rng(0)
        # A wiggly function that needs many boxes at a tiny tolerance.
        cheb = _build_dense(
            lambda p, d: np.sin(9 * p[:, 0]) * np.cos(7 * p[:, 1])
            + 0.3 * p[:, 0],
            2, [[-2, 2], [-2, 2]], [33, 33])
        with pytest.warns(RuntimeWarning, match="not[ \n]+certified"):
            cheb.minimize(tol=1e-12, max_boxes=40)

    def test_matches_dense_scan(self):
        rng = np.random.default_rng(11)
        cheb = _build_dense(
            lambda p, d: np.sin(3 * p[:, 0]) + np.cos(4 * p[:, 1])
            + 0.5 * p[:, 0] * p[:, 1],
            2, [[-1.5, 1.5], [-1, 2]], [21, 21])
        value, point = cheb.minimize()
        # brute-force check on a fine grid of the INTERPOLANT
        xs = np.linspace(-1.5, 1.5, 301)
        ys = np.linspace(-1, 2, 301)
        grid = np.stack(np.meshgrid(xs, ys, indexing="ij"), axis=-1)
        vals = cheb.vectorized_eval_batch(grid.reshape(-1, 2), [0, 0])
        assert value <= float(np.min(vals)) + 1e-9


class TestCriticalPoints:
    def test_two_minima_and_saddle(self):
        cheb = _build_dense(
            lambda p, d: (p[:, 0] ** 2 - 1.0) ** 2 + (p[:, 1] - 0.3) ** 2,
            2, [[-2, 2], [-1, 1]], [9, 7])
        cps = cheb.critical_points()
        kinds = sorted(c.kind for c in cps)
        assert kinds == ["minimum", "minimum", "saddle"]
        mins = [c for c in cps if c.kind == "minimum"]
        assert {round(float(c.point[0]), 6) for c in mins} == {-1.0, 1.0}
        for c in cps:
            assert isinstance(c, CriticalPoint)

    def test_no_interior_critical_points(self):
        cheb = _build_dense(lambda p, d: p[:, 0] + 2.0 * p[:, 1], 2,
                            [[-1, 1], [-1, 1]], [5, 5])
        assert cheb.critical_points() == []

    def test_one_dim_classification(self):
        cheb = _build_dense(lambda p, d: (p[:, 0] ** 2 - 1.0) ** 2, 1,
                            [[-2, 2]], [9])
        cps = cheb.critical_points()
        kinds = [c.kind for c in sorted(cps, key=lambda c: c.point[0])]
        assert kinds == ["minimum", "maximum", "minimum"]

    def test_fixed_subset(self):
        cheb = _build_dense(
            lambda p, d: ((p[:, 0] ** 2 - 1.0) ** 2
                          + (p[:, 1] - 0.3) ** 2 + 0.0 * p[:, 2]),
            3, [[-2, 2], [-1, 1], [0, 1]], [9, 7, 3])
        cps = cheb.critical_points(fixed={2: 0.25})
        assert all(c.point[2] == 0.25 for c in cps)
        assert sorted(c.kind for c in cps) == [
            "minimum", "minimum", "saddle"]

    def test_sorted_by_value(self):
        cheb = _build_dense(
            lambda p, d: (p[:, 0] ** 2 - 1.0) ** 2 + (p[:, 1] - 0.3) ** 2,
            2, [[-2, 2], [-1, 1]], [9, 7])
        cps = cheb.critical_points()
        vals = [c.value for c in cps]
        assert vals == sorted(vals)


class TestSplineGlobal:
    def setup_method(self):
        def kinked(p, d):
            p = np.asarray(p, float)
            return np.abs(p[:, 0]) + (p[:, 1] - 0.2) ** 2

        self.sp = ChebyshevSpline(kinked, 2, [[-1, 1], [-1, 1]],
                                  [[7, 7], [9]], knots=[[0.0], []],
                                  vectorized=True)
        self.sp.build(verbose=False)

    def test_global_min_at_kink(self):
        value, point = self.sp.minimize()
        assert abs(value) < 1e-10
        assert abs(point[0]) < 1e-8
        assert abs(point[1] - 0.2) < 1e-8

    def test_global_max(self):
        value, point = self.sp.maximize()
        assert abs(value - 2.44) < 1e-9

    def test_dim_path_unchanged(self):
        value, loc = self.sp.minimize(dim=0, fixed={1: 0.2})
        assert isinstance(loc, float)
        assert abs(value) < 1e-10

    def test_critical_points_per_piece(self):
        def bowl(p, d):
            p = np.asarray(p, float)
            return (p[:, 0] - 0.5) ** 2 + (p[:, 1] - 0.2) ** 2

        sp = ChebyshevSpline(bowl, 2, [[-1, 1], [-1, 1]], [[5, 5], [7]],
                             knots=[[0.0], []], vectorized=True)
        sp.build(verbose=False)
        cps = sp.critical_points()
        mins = [c for c in cps if c.kind == "minimum"]
        assert len(mins) == 1
        np.testing.assert_allclose(mins[0].point, [0.5, 0.2], atol=1e-8)


class TestSliderGlobal:
    def setup_method(self):
        def f(p, d):
            p = np.asarray(p, float)
            if p.ndim == 1:
                p = p[None]
            return ((p[:, 0] - 0.3) ** 2 + (p[:, 1] + 0.5) ** 2
                    + (p[:, 2] ** 2 - 0.5) ** 2)

        self.sl = ChebyshevSlider(
            f, 3, [[-1, 1]] * 3, [9, 9, 9], partition=[[0], [1], [2]],
            pivot_point=[0.0, 0.0, 0.0], vectorized=True)
        self.sl.build(verbose=False)

    def test_exactly_separable_minimum(self):
        value, point = self.sl.minimize()
        assert abs(value) < 1e-12
        assert abs(point[0] - 0.3) < 1e-10
        assert abs(point[1] + 0.5) < 1e-10
        assert abs(abs(point[2]) - np.sqrt(0.5)) < 1e-8

    def test_maximum(self):
        value, point = self.sl.maximize()
        # per-group maxima: (1.69) + (2.25) + (0.25) at (-1, 1, 0)
        assert abs(value - (1.69 + 2.25 + 0.25)) < 1e-10

    def test_fixed_subset(self):
        value, point = self.sl.minimize(fixed={0: 0.0})
        assert point[0] == 0.0
        assert abs(value - 0.09) < 1e-10

    def test_matches_dense_counterpart(self):
        def f(p, d):
            p = np.asarray(p, float)
            if p.ndim == 1:
                p = p[None]
            return (p[:, 0] - 0.3) ** 2 + (p[:, 1] + 0.5) ** 2

        sl = ChebyshevSlider(f, 2, [[-1, 1]] * 2, [9, 9],
                             partition=[[0], [1]],
                             pivot_point=[0.0, 0.0], vectorized=True)
        sl.build(verbose=False)
        dense = _build_dense(f, 2, [[-1, 1]] * 2, [9, 9])
        v_s, p_s = sl.minimize()
        v_d, p_d = dense.minimize()
        assert abs(v_s - v_d) < 1e-10
        np.testing.assert_allclose(p_s, p_d, atol=1e-8)


class TestTTGlobal:
    def setup_method(self):
        def f(p, d):
            p = np.asarray(p, float)
            return ((p[:, 0] ** 2 - 0.25) ** 2 + (p[:, 1] - 0.3) ** 2
                    + (p[:, 2] + 0.4) ** 2)

        self.tt = ChebyshevTT(f, 3, [[-1, 1]] * 3, [9, 9, 9],
                              tolerance=1e-12, max_rank=8,
                              vectorized=True)
        self.tt.build(verbose=False)

    def test_global_minimize(self):
        value, point = self.tt.minimize()
        assert abs(value) < 1e-9
        assert abs(abs(point[0]) - 0.5) < 1e-6
        assert abs(point[1] - 0.3) < 1e-6
        assert abs(point[2] + 0.4) < 1e-6

    def test_global_maximize(self):
        value, point = self.tt.maximize()
        # max over box: (1-.25)^2 + 1.69 + .36 boundaries at (+-1,-1,1)
        want = (1 - 0.25) ** 2 + (1.3) ** 2 + (1.4) ** 2
        assert abs(value - want) < 1e-8

    def test_reordered_frame(self):
        tt2 = self.tt.reorder([2, 0, 1])
        v1, p1 = self.tt.minimize()
        v2, p2 = tt2.minimize()
        assert abs(v1 - v2) < 1e-9
        np.testing.assert_allclose(np.abs(p1), np.abs(p2), atol=1e-6)

    def test_matches_dense(self):
        dense = self.tt.to_dense()
        cheb = ChebyshevApproximation.from_values(
            np.asarray(dense), 3, [[-1, 1]] * 3, [9, 9, 9])
        v_t, _ = self.tt.minimize()
        v_d, _ = cheb.minimize()
        assert abs(v_t - v_d) < 1e-8

    def test_dim_path_unchanged(self):
        value, loc = self.tt.minimize(dim=1, fixed={0: 0.5, 2: -0.4})
        assert isinstance(loc, float)
        assert abs(loc - 0.3) < 1e-8


class TestSolveSystem:
    def test_circle_line(self):
        f1 = _build_dense(lambda p, d: p[:, 0] ** 2 + p[:, 1] ** 2 - 0.64,
                          2, [[-1, 1], [-1, 1]], [7, 7])
        f2 = _build_dense(lambda p, d: p[:, 0] - p[:, 1],
                          2, [[-1, 1], [-1, 1]], [7, 7])
        roots = solve_system([f1, f2])
        assert roots.shape == (2, 2)
        r = 0.8 / np.sqrt(2)
        np.testing.assert_allclose(roots, [[-r, -r], [r, r]], atol=1e-9)
        # residuals vanish
        for f in (f1, f2):
            vals = f.vectorized_eval_batch(roots, [0, 0])
            np.testing.assert_allclose(np.asarray(vals), 0.0, atol=1e-9)

    def test_three_dim_system(self):
        # x^2+y^2+z^2 = 0.75, x = y, z = x  ->  +-(0.5, 0.5, 0.5)
        dom = [[-1, 1]] * 3
        f1 = _build_dense(
            lambda p, d: (p ** 2).sum(axis=1) - 0.75, 3, dom, [5, 5, 5])
        f2 = _build_dense(lambda p, d: p[:, 0] - p[:, 1], 3, dom,
                          [3, 3, 3])
        f3 = _build_dense(lambda p, d: p[:, 2] - p[:, 0], 3, dom,
                          [3, 3, 3])
        roots = solve_system([f1, f2, f3])
        np.testing.assert_allclose(
            roots, [[-0.5] * 3, [0.5] * 3], atol=1e-9)

    def test_no_solutions(self):
        f1 = _build_dense(lambda p, d: p[:, 0] ** 2 + p[:, 1] ** 2 + 1.0,
                          2, [[-1, 1], [-1, 1]], [5, 5])
        f2 = _build_dense(lambda p, d: p[:, 0] - p[:, 1],
                          2, [[-1, 1], [-1, 1]], [5, 5])
        assert solve_system([f1, f2]).shape == (0, 2)

    def test_count_mismatch_raises(self):
        f1 = _build_dense(lambda p, d: p[:, 0], 2, [[-1, 1], [-1, 1]],
                          [5, 5])
        with pytest.raises(ValueError, match="as many equations"):
            solve_system([f1])

    def test_domain_mismatch_raises(self):
        f1 = _build_dense(lambda p, d: p[:, 0], 2, [[-1, 1], [-1, 1]],
                          [5, 5])
        f2 = _build_dense(lambda p, d: p[:, 0], 2, [[-2, 2], [-1, 1]],
                          [5, 5])
        with pytest.raises(ValueError, match="share one dimension"):
            solve_system([f1, f2])

    def test_empty_raises(self):
        with pytest.raises(ValueError, match="at least one"):
            solve_system([])


class TestReviewRegressions:
    """Pins for review-found defects (round-3 session-9 review pass)."""

    def test_boundary_zero_not_pruned(self):
        # The unique common zero sits exactly on the domain corner; the
        # knife-edge enclosure there must not lose it to roundoff.
        f1 = _build_dense(lambda p, d: p[:, 0] - 1.0, 2,
                          [[-1, 1], [-1, 1]], [5, 5])
        f2 = _build_dense(lambda p, d: p[:, 1] + 1.0, 2,
                          [[-1, 1], [-1, 1]], [5, 5])
        roots = solve_system([f1, f2])
        assert roots.shape == (1, 2)
        np.testing.assert_allclose(roots[0], [1.0, -1.0], atol=1e-9)

    def test_restrict_does_not_mutate_per_box_input(self):
        rng = np.random.default_rng(2)
        per_box = rng.normal(size=(2, 5, 5))
        keep = per_box.copy()
        boxes = np.array([[[-1.0, 0.0], [0.0, 1.0]],
                          [[-0.5, 0.5], [-1.0, 1.0]]])
        restrict_box_coeffs(per_box, boxes)
        np.testing.assert_array_equal(per_box, keep)

    def test_slider_summed_certificate(self):
        # Each group certifies to tol/groups so the SUM meets tol.
        def f(p, d):
            p = np.atleast_2d(np.asarray(p, float))
            return sum((p[:, i] - 0.1 * i) ** 2 for i in range(4))

        sl = ChebyshevSlider(f, 4, [[-1, 1]] * 4, [7] * 4,
                             partition=[[0], [1], [2], [3]],
                             pivot_point=[0.0] * 4, vectorized=True)
        sl.build(verbose=False)
        value, point = sl.minimize(tol=1e-10)
        assert abs(value) < 1e-10
        np.testing.assert_allclose(point, [0.0, 0.1, 0.2, 0.3],
                                   atol=1e-8)

    def test_spline_incumbent_shared_across_pieces(self):
        # A many-piece spline where most pieces are far above the
        # minimum: the shared incumbent keeps the search cheap and the
        # answer exact.
        def g(p, d):
            p = np.asarray(p, float)
            return (p[:, 0] - 0.9) ** 2 + p[:, 1] ** 2

        sp = ChebyshevSpline(g, 2, [[-1, 1], [-1, 1]], [[5] * 4, [5]],
                             knots=[[-0.5, 0.0, 0.5], []],
                             vectorized=True)
        sp.build(verbose=False)
        value, point = sp.minimize()
        assert abs(value) < 1e-10
        np.testing.assert_allclose(point, [0.9, 0.0], atol=1e-8)


class TestCriticalPointsSliderTT:
    def test_slider_product_structure(self):
        def f(p, d):
            p = np.atleast_2d(np.asarray(p, float))
            return (p[:, 0] ** 2 - 0.25) ** 2 + (p[:, 1] + 0.5) ** 2

        sl = ChebyshevSlider(f, 2, [[-1, 1]] * 2, [9, 9],
                             partition=[[0], [1]], pivot_point=[0, 0],
                             vectorized=True)
        sl.build(verbose=False)
        cps = sl.critical_points()
        kinds = sorted(c.kind for c in cps)
        assert kinds == ["minimum", "minimum", "saddle"]
        saddle = [c for c in cps if c.kind == "saddle"][0]
        np.testing.assert_allclose(saddle.point, [0.0, -0.5], atol=1e-8)
        assert abs(saddle.value - 0.0625) < 1e-10

    def test_slider_empty_when_one_group_monotone(self):
        def f(p, d):
            p = np.atleast_2d(np.asarray(p, float))
            return p[:, 0] + (p[:, 1] + 0.5) ** 2

        sl = ChebyshevSlider(f, 2, [[-1, 1]] * 2, [5, 7],
                             partition=[[0], [1]], pivot_point=[0, 0],
                             vectorized=True)
        sl.build(verbose=False)
        assert sl.critical_points() == []

    def test_slider_fixed_and_cap(self):
        def f(p, d):
            p = np.atleast_2d(np.asarray(p, float))
            return ((p[:, 0] ** 2 - 0.25) ** 2
                    + (p[:, 1] ** 2 - 0.25) ** 2)

        sl = ChebyshevSlider(f, 2, [[-1, 1]] * 2, [9, 9],
                             partition=[[0], [1]], pivot_point=[0, 0],
                             vectorized=True)
        sl.build(verbose=False)
        cps = sl.critical_points(fixed={1: 0.5})
        assert all(c.point[1] == 0.5 for c in cps)
        assert sorted(c.kind for c in cps) == [
            "maximum", "minimum", "minimum"]
        with pytest.raises(ValueError, match="max_points"):
            sl.critical_points(max_points=2)

    def test_tt_matches_dense(self):
        def q(p, d):
            p = np.asarray(p, float)
            return (p[:, 0] ** 2 - 0.25) ** 2 + (p[:, 1] - 0.3) ** 2

        tt = ChebyshevTT(q, 2, [[-1, 1]] * 2, [9, 9], tolerance=1e-12,
                         max_rank=6, vectorized=True)
        tt.build(verbose=False)
        dense = _build_dense(q, 2, [[-1, 1]] * 2, [9, 9])
        t_cps = tt.critical_points()
        d_cps = dense.critical_points()
        assert len(t_cps) == len(d_cps) == 3
        t_set = {(tuple(np.round(c.point, 6)), c.kind) for c in t_cps}
        d_set = {(tuple(np.round(c.point, 6)), c.kind) for c in d_cps}
        assert t_set == d_set

    def test_tt_one_dim(self):
        tt = ChebyshevTT(lambda p, d: (p[:, 0] ** 2 - 1.0) ** 2, 1,
                         [[-2, 2]], [9], tolerance=1e-12, max_rank=4,
                         vectorized=True)
        tt.build(verbose=False)
        kinds = [c.kind for c in sorted(tt.critical_points(),
                                        key=lambda c: c.point[0])]
        assert kinds == ["minimum", "maximum", "minimum"]

    def test_tt_reordered_frame(self):
        def q(p, d):
            p = np.asarray(p, float)
            return ((p[:, 0] - 0.2) ** 2 + (p[:, 1] + 0.4) ** 2
                    + (p[:, 2] ** 2 - 0.25) ** 2)

        tt = ChebyshevTT(q, 3, [[-1, 1]] * 3, [7, 7, 9],
                         tolerance=1e-12, max_rank=6, vectorized=True)
        tt.build(verbose=False)
        tt2 = tt.reorder([2, 0, 1])
        p1 = {tuple(np.round(c.point, 6)) for c in tt.critical_points()}
        p2 = {tuple(np.round(c.point, 6)) for c in tt2.critical_points()}
        assert p1 == p2


class TestJittedStatsParity:
    def test_jax_path_matches_numpy(self, monkeypatch):
        # Force the fused XLA bound evaluator on a small tensor and
        # check the search agrees with the NumPy path digit-for-digit
        # on value and location.
        import pychebyshev_tpu.ops.subdivision as sd

        coeffs = _coeffs_2d(
            lambda x, y: (x ** 2 - 0.25) ** 2 + (y - 0.3) ** 2
            + 0.1 * np.sin(1.0 + x) * 0.0)
        res_np = minimize_coeff_tensor(coeffs, tol=1e-11)
        monkeypatch.setattr(sd, "_JAX_STATS_MIN_SIZE", 1)
        res_jax = minimize_coeff_tensor(coeffs, tol=1e-11)
        assert res_jax.certified
        assert abs(res_jax.value - res_np.value) < 1e-13
        np.testing.assert_allclose(res_jax.location, res_np.location,
                                   atol=1e-12)
        assert res_jax.boxes == res_np.boxes
