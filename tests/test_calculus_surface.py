"""Dense + spline calculus surface, behavior-level.

Native coverage for the behavior classes the reference pins in its
calculus suite (reference tests/test_calculus.py): quadrature
exactness, sub-interval integrals, colleague-matrix rootfinding,
derivative-based extrema, and the spline variants of each.  All
oracles here are closed forms or scipy cross-checks; structure and
tolerances are this repo's own.
"""

import math

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline


def make1d(fn, lo, hi, n=21):
    """1-D interpolant over [lo, hi] from a vectorized closure."""
    ap = ChebyshevApproximation(
        lambda pts, _: fn(pts[:, 0]), 1, [[lo, hi]], [n], vectorized=True)
    ap.build(verbose=False)
    return ap


def make2d(fn, dom, ns=(15, 15)):
    ap = ChebyshevApproximation(
        lambda pts, _: fn(pts[:, 0], pts[:, 1]), 2, dom, list(ns),
        vectorized=True)
    ap.build(verbose=False)
    return ap


# ---------------------------------------------------------------------------
# Full-domain integration (dense)
# ---------------------------------------------------------------------------

class TestDenseIntegralExactness:
    # (integrand, domain, closed-form integral)
    CASES = [
        (lambda x: np.full_like(x, 4.25), (-2.0, 5.0), 4.25 * 7.0),
        (lambda x: x, (1.0, 4.0), (16.0 - 1.0) / 2.0),
        (lambda x: x ** 2, (-1.0, 2.0), 3.0),
        (lambda x: x ** 3 - x, (0.0, 2.0), 4.0 - 2.0),
        (lambda x: np.sin(x), (0.0, math.pi), 2.0),
        (lambda x: np.cos(x), (-math.pi / 2, math.pi / 2), 2.0),
        (lambda x: np.exp(x), (-1.0, 1.0), math.e - 1.0 / math.e),
    ]

    @pytest.mark.parametrize("fn,dom,exact", CASES)
    def test_closed_forms(self, fn, dom, exact):
        ap = make1d(fn, *dom)
        assert ap.integrate() == pytest.approx(exact, abs=1e-11)

    def test_low_degree_needs_few_nodes(self):
        # Fejer-1 on n nodes integrates degree < n exactly; a cubic on
        # 5 nodes must already be exact to rounding.
        ap = make1d(lambda x: 2 * x ** 3 + x ** 2 - 3, -1.0, 1.0, n=5)
        assert ap.integrate() == pytest.approx(2.0 / 3.0 - 6.0, abs=1e-13)

    def test_scipy_cross_check(self):
        from scipy.integrate import quad
        fn = lambda x: np.exp(-x ** 2) * np.cos(3 * x)  # noqa: E731
        ap = make1d(fn, -2.0, 2.0, n=33)
        ref, _ = quad(lambda x: math.exp(-x * x) * math.cos(3 * x),
                      -2.0, 2.0)
        assert ap.integrate() == pytest.approx(ref, abs=1e-10)

    def test_2d_full_is_product_for_separable(self):
        ap = make2d(lambda x, y: np.sin(x) * np.exp(y),
                    [[0.0, math.pi], [0.0, 1.0]])
        assert ap.integrate() == pytest.approx(2.0 * (math.e - 1.0),
                                               abs=1e-9)

    def test_unbuilt_rejected(self):
        ap = ChebyshevApproximation(None, 1, [[-1, 1]], [9],
                                    defer_build=True)
        with pytest.raises(RuntimeError):
            ap.integrate()

    def test_dim_out_of_range_rejected(self, cheb_sin3d):
        with pytest.raises(ValueError):
            cheb_sin3d.integrate(dims=3)


# ---------------------------------------------------------------------------
# Partial integration (dense)
# ---------------------------------------------------------------------------

class TestPartialIntegration:
    @pytest.fixture(scope="class")
    def sep2d(self):
        # f(x, y) = (x^2 + 1) * cos(y) on [0,2] x [0, pi/2]
        return make2d(lambda x, y: (x ** 2 + 1) * np.cos(y),
                      [[0.0, 2.0], [0.0, math.pi / 2]])

    def test_integrating_dim0_leaves_function_of_y(self, sep2d):
        reduced = sep2d.integrate(dims=0)
        assert reduced.num_dimensions == 1
        # ∫_0^2 (x^2+1) dx = 14/3
        for y in (0.1, 0.7, 1.3):
            assert reduced.vectorized_eval([y], [0]) == pytest.approx(
                14.0 / 3.0 * math.cos(y), abs=1e-10)

    def test_integrating_dim1_leaves_function_of_x(self, sep2d):
        reduced = sep2d.integrate(dims=1)
        assert reduced.num_dimensions == 1
        # ∫_0^{pi/2} cos = 1
        for x in (0.25, 1.0, 1.9):
            assert reduced.vectorized_eval([x], [0]) == pytest.approx(
                x * x + 1.0, abs=1e-10)

    def test_two_stage_equals_full(self, sep2d):
        staged = sep2d.integrate(dims=0).integrate()
        assert staged == pytest.approx(sep2d.integrate(), rel=1e-12)

    def test_reduced_domain_drops_integrated_dim(self, sep2d):
        reduced = sep2d.integrate(dims=0)
        assert reduced.domain == [[0.0, math.pi / 2]]

    def test_3d_middle_dim(self, cheb_sin3d):
        reduced = cheb_sin3d.integrate(dims=1)
        # ∫_{-1}^{1} sin = 0, so the middle term vanishes and the
        # constant 2 multiplies nothing; remaining sum keeps dims 0, 2.
        got = reduced.vectorized_eval([0.3, -0.6], [0, 0])
        want = 2.0 * (math.sin(0.3) + math.sin(-0.6))
        assert got == pytest.approx(want, abs=1e-9)


# ---------------------------------------------------------------------------
# Sub-interval integration (dense)
# ---------------------------------------------------------------------------

class TestSubIntervalIntegrals:
    def test_polynomial_exact_on_random_windows(self):
        ap = make1d(lambda x: x ** 3 - 2 * x + 1, -2.0, 3.0, n=9)
        F = lambda x: x ** 4 / 4 - x ** 2 + x  # noqa: E731
        rng = np.random.default_rng(11)
        for _ in range(5):
            lo, hi = np.sort(rng.uniform(-2.0, 3.0, 2))
            got = ap.integrate(dims=0, bounds=(lo, hi))
            assert got == pytest.approx(F(hi) - F(lo), abs=1e-10)

    def test_zero_width_window_is_zero(self):
        ap = make1d(np.exp, -1.0, 1.0)
        assert ap.integrate(dims=0, bounds=(0.25, 0.25)) == pytest.approx(
            0.0, abs=1e-13)

    def test_window_equal_to_domain_matches_full(self):
        ap = make1d(lambda x: np.sin(3 * x) + x, -1.5, 2.5)
        assert ap.integrate(dims=0, bounds=(-1.5, 2.5)) == pytest.approx(
            ap.integrate(), rel=1e-12)

    def test_partition_additivity(self):
        ap = make1d(lambda x: np.exp(np.sin(x)), 0.0, 4.0, n=33)
        cuts = [0.0, 0.9, 1.7, 3.1, 4.0]
        parts = sum(ap.integrate(dims=0, bounds=(a, b))
                    for a, b in zip(cuts, cuts[1:]))
        assert parts == pytest.approx(ap.integrate(), rel=1e-11)

    def test_bare_pair_shorthand_for_one_dim(self):
        ap = make1d(lambda x: x ** 2, -1.0, 1.0)
        a = ap.integrate(dims=0, bounds=(0.0, 1.0))
        b = ap.integrate(dims=0, bounds=[(0.0, 1.0)])
        assert a == pytest.approx(b, rel=1e-14)
        assert a == pytest.approx(1.0 / 3.0, abs=1e-12)

    def test_mixed_window_and_full_dims(self):
        ap = make2d(lambda x, y: x * y + y ** 2,
                    [[0.0, 1.0], [0.0, 2.0]])
        # window on x, full range on y (None entry)
        got = ap.integrate(dims=[0, 1], bounds=[(0.0, 0.5), None])
        # ∫0^.5 ∫0^2 (xy + y^2) dy dx = ∫0^.5 (2x + 8/3) dx = .25 + 4/3
        assert got == pytest.approx(0.25 + 4.0 / 3.0, abs=1e-10)

    def test_window_outside_domain_rejected(self):
        ap = make1d(np.exp, -1.0, 1.0)
        with pytest.raises(ValueError, match="outside"):
            ap.integrate(dims=0, bounds=(-2.0, 0.0))

    def test_inverted_window_rejected(self):
        ap = make1d(np.exp, -1.0, 1.0)
        with pytest.raises(ValueError, match="lo"):
            ap.integrate(dims=0, bounds=(0.5, -0.5))

    def test_bounds_arity_mismatch_rejected(self):
        ap = make2d(lambda x, y: x + y, [[-1, 1], [-1, 1]])
        with pytest.raises(ValueError, match="length"):
            ap.integrate(dims=[0, 1], bounds=[(0.0, 1.0)])


# ---------------------------------------------------------------------------
# Rootfinding (dense)
# ---------------------------------------------------------------------------

class TestRootfinding:
    def test_sine_roots_across_periods(self):
        ap = make1d(np.sin, 0.5, 9.8, n=41)
        roots = ap.roots()
        assert np.allclose(roots, [math.pi, 2 * math.pi, 3 * math.pi],
                           atol=1e-9)

    def test_roots_come_back_sorted(self):
        ap = make1d(lambda x: np.cos(4 * x), -2.0, 2.0, n=41)
        roots = ap.roots()
        assert np.all(np.diff(roots) > 0)
        assert np.allclose(np.cos(4 * roots), 0.0, atol=1e-8)

    def test_rational_roots_of_cubic(self):
        ap = make1d(lambda x: (x - 0.5) * (x + 1.25) * (x - 2.0),
                    -3.0, 3.0, n=9)
        assert np.allclose(ap.roots(), [-1.25, 0.5, 2.0], atol=1e-10)

    def test_sign_definite_function_has_no_roots(self):
        ap = make1d(lambda x: x ** 2 + 0.3, -1.0, 1.0)
        assert ap.roots().size == 0

    def test_root_on_the_domain_edge_is_kept(self):
        ap = make1d(lambda x: x - 1.0, -1.0, 1.0, n=5)
        roots = ap.roots()
        assert roots.size == 1
        assert roots[0] == pytest.approx(1.0, abs=1e-10)

    def test_tangency_reports_a_tight_cluster(self):
        # A double root splits into a near-pair at ~sqrt(eps) spacing
        # (conditioning of the tangency, not an implementation choice);
        # everything reported must sit on the tangency point.
        ap = make1d(lambda x: (x - 0.4) ** 2, -1.0, 1.0, n=9)
        roots = ap.roots()
        assert 0 < roots.size <= 2
        assert np.allclose(roots, 0.4, atol=1e-4)

    def test_multi_dim_needs_dim_and_fixed(self, cheb_sin3d):
        with pytest.raises(ValueError, match="dim"):
            cheb_sin3d.roots()
        with pytest.raises(ValueError, match="fixed"):
            cheb_sin3d.roots(dim=0, fixed={1: 0.0})

    def test_multi_dim_slice_roots(self, cheb_sin3d):
        # sin(x) + sin(a) + sin(b) = 0 along x with a, b pinned.
        a, b = 0.4, -0.2
        roots = cheb_sin3d.roots(dim=0, fixed={1: a, 2: b})
        target = -math.sin(a) - math.sin(b)
        assert roots.size == 1
        assert math.sin(roots[0]) == pytest.approx(target, abs=1e-9)

    def test_fixed_value_outside_domain_rejected(self, cheb_sin3d):
        with pytest.raises(ValueError, match="outside"):
            cheb_sin3d.roots(dim=0, fixed={1: 4.0, 2: 0.0})

    def test_two_node_linear_interpolant(self):
        ap = make1d(lambda x: 3.0 * x - 0.6, -1.0, 1.0, n=2)
        assert np.allclose(ap.roots(), [0.2], atol=1e-12)


# ---------------------------------------------------------------------------
# Extrema (dense)
# ---------------------------------------------------------------------------

class TestExtremaSearch:
    def test_parabola_vertex(self):
        ap = make1d(lambda x: (x - 0.3) ** 2 + 1.5, -1.0, 1.0, n=7)
        val, loc = ap.minimize()
        assert val == pytest.approx(1.5, abs=1e-11)
        assert loc == pytest.approx(0.3, abs=1e-9)

    def test_parabola_max_sits_on_the_far_edge(self):
        ap = make1d(lambda x: (x - 0.3) ** 2 + 1.5, -1.0, 1.0, n=7)
        val, loc = ap.maximize()
        assert loc == pytest.approx(-1.0, abs=1e-12)
        assert val == pytest.approx(1.69 + 1.5, abs=1e-10)

    def test_interior_and_edge_candidates_compared(self):
        # x^3 - x on [-1, 1.4]: interior min at 1/sqrt(3), but the
        # global max is at the right edge, above the interior hump.
        ap = make1d(lambda x: x ** 3 - x, -1.0, 1.4, n=9)
        vmin, xmin = ap.minimize()
        vmax, xmax = ap.maximize()
        s3 = 1.0 / math.sqrt(3.0)
        assert xmin == pytest.approx(s3, abs=1e-9)
        assert vmin == pytest.approx(s3 ** 3 - s3, abs=1e-11)
        assert xmax == pytest.approx(1.4, abs=1e-12)

    def test_wide_domain_trig(self):
        ap = make1d(np.sin, 0.0, 3 * math.pi, n=41)
        vmin, xmin = ap.minimize()
        vmax, xmax = ap.maximize()
        assert vmin == pytest.approx(-1.0, abs=1e-10)
        assert xmin == pytest.approx(1.5 * math.pi, abs=1e-7)
        assert vmax == pytest.approx(1.0, abs=1e-10)

    def test_flat_function_min_equals_max(self):
        ap = make1d(lambda x: np.full_like(x, -2.5), -1.0, 1.0, n=5)
        assert ap.minimize()[0] == pytest.approx(-2.5, abs=1e-12)
        assert ap.maximize()[0] == pytest.approx(-2.5, abs=1e-12)

    def test_result_is_value_location_pair(self):
        ap = make1d(np.cos, -1.0, 1.0)
        out = ap.minimize()
        assert isinstance(out, tuple) and len(out) == 2
        val, loc = out
        assert -1.0 <= loc <= 1.0
        assert val == pytest.approx(math.cos(1.0), abs=1e-10)

    def test_multi_dim_extremum_on_slice(self, cheb_sin3d):
        vmax, xmax = cheb_sin3d.maximize(dim=0, fixed={1: 0.0, 2: 0.0})
        assert vmax == pytest.approx(math.sin(1.0), abs=1e-9)
        assert xmax == pytest.approx(1.0, abs=1e-9)

    def test_unbuilt_rejected(self):
        ap = ChebyshevApproximation(None, 1, [[-1, 1]], [9],
                                    defer_build=True)
        with pytest.raises(RuntimeError):
            ap.minimize()


# ---------------------------------------------------------------------------
# Spline calculus
# ---------------------------------------------------------------------------

def kink_spline(shift=0.0, lo=-1.0, hi=1.0, n=15):
    """|x - shift| spline with the kink declared as a knot."""
    sp = ChebyshevSpline(
        lambda pts, _: np.abs(pts[:, 0] - shift), 1, [[lo, hi]],
        n_nodes=[n], knots=[[shift]], vectorized=True)
    sp.build(verbose=False)
    return sp


class TestSplineCalculus:
    def test_abs_integral_exact(self):
        sp = kink_spline()
        assert sp.integrate() == pytest.approx(1.0, abs=1e-12)

    def test_shifted_kink_integral(self):
        # ∫_{-1}^{1} |x - 0.25| dx = (1.25^2 + 0.75^2)/2
        sp = kink_spline(shift=0.25)
        assert sp.integrate() == pytest.approx(
            (1.25 ** 2 + 0.75 ** 2) / 2.0, abs=1e-12)

    def test_window_spanning_the_knot(self):
        sp = kink_spline()
        # ∫_{-0.5}^{0.75} |x| dx = 0.125 + 0.28125
        got = sp.integrate(dims=0, bounds=(-0.5, 0.75))
        assert got == pytest.approx(0.40625, abs=1e-12)

    def test_window_ending_exactly_at_the_knot(self):
        sp = kink_spline()
        left = sp.integrate(dims=0, bounds=(-1.0, 0.0))
        right = sp.integrate(dims=0, bounds=(0.0, 1.0))
        assert left == pytest.approx(0.5, abs=1e-12)
        assert right == pytest.approx(0.5, abs=1e-12)

    def test_smooth_spline_matches_unsplit_dense(self):
        # An artificial knot in a smooth function must not change the
        # integral.
        sp = ChebyshevSpline(
            lambda pts, _: np.exp(pts[:, 0]), 1, [[-1.0, 1.0]],
            n_nodes=[13], knots=[[0.3]], vectorized=True)
        sp.build(verbose=False)
        dense = make1d(np.exp, -1.0, 1.0, n=13)
        assert sp.integrate() == pytest.approx(dense.integrate(),
                                               rel=1e-12)

    def test_2d_partial_integral(self):
        sp = ChebyshevSpline(
            lambda pts, _: np.abs(pts[:, 0]) * (pts[:, 1] + 2.0), 2,
            [[-1.0, 1.0], [0.0, 1.0]], n_nodes=[11, 11],
            knots=[[0.0], []], vectorized=True)
        sp.build(verbose=False)
        reduced = sp.integrate(dims=0)
        for y in (0.2, 0.8):
            assert reduced.eval([y], [0]) == pytest.approx(
                1.0 * (y + 2.0), abs=1e-10)

    def test_roots_on_both_sides_of_the_kink(self):
        sp = ChebyshevSpline(
            lambda pts, _: np.abs(pts[:, 0]) - 0.5, 1, [[-1.0, 1.0]],
            n_nodes=[15], knots=[[0.0]], vectorized=True)
        sp.build(verbose=False)
        assert np.allclose(sp.roots(), [-0.5, 0.5], atol=1e-10)

    def test_root_landing_on_the_knot_reported_once(self):
        sp = kink_spline()  # |x| has its only zero exactly at the knot
        roots = sp.roots()
        assert roots.size == 1
        assert roots[0] == pytest.approx(0.0, abs=1e-10)

    def test_minimum_at_the_kink(self):
        sp = kink_spline(shift=0.25)
        val, loc = sp.minimize()
        assert val == pytest.approx(0.0, abs=1e-11)
        assert loc == pytest.approx(0.25, abs=1e-9)

    def test_maximum_on_the_outer_edge(self):
        sp = kink_spline(shift=0.25)
        val, loc = sp.maximize()
        assert loc == pytest.approx(-1.0, abs=1e-12)
        assert val == pytest.approx(1.25, abs=1e-11)

    def test_unbuilt_spline_rejected(self):
        sp = ChebyshevSpline(
            None, 1, [[-1, 1]], n_nodes=[9], knots=[[0.0]],
            defer_build=True)
        with pytest.raises(RuntimeError):
            sp.integrate()
        with pytest.raises(RuntimeError):
            sp.roots()
