"""Auto-N constructor contract: sentinels, caps, getters, probe, spline defaults.

Native coverage of the ctor-level half of the reference's error-threshold
suite (reference tests/test_error_threshold.py): how ``n_nodes=None``
sentinels and ``error_threshold`` combine, the ``max_n`` bounds, the
``get_optimal_n1`` probe contract, and the spline-side defaults and
verbose banners.  The doubling loop's *stopping rules* live in
tests/test_auto_n_surface.py.
"""

import math
import warnings

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline


def wavy2(x, _):
    return math.sin(1.3 * x[0]) * math.cos(0.7 * x[1])


def wavy3(x, _):
    return math.sin(x[0]) + math.cos(x[1]) * x[2]


SQ = [[-1.0, 1.0], [-1.0, 1.0]]
CUBE = [[-1.0, 1.0]] * 3


class TestSentinelCombinations:
    def test_explicit_ints_leave_threshold_unset(self):
        c = ChebyshevApproximation(wavy2, 2, SQ, [9, 7])
        assert c.n_nodes == [9, 7]
        assert c.error_threshold is None

    def test_threshold_alone_fills_all_none_sentinels(self):
        c = ChebyshevApproximation(wavy2, 2, SQ, error_threshold=1e-7)
        assert c.n_nodes == [None, None]
        assert c.error_threshold == 1e-7

    def test_explicit_all_none_equals_omitted(self):
        omitted = ChebyshevApproximation(wavy2, 2, SQ, error_threshold=1e-7)
        spelled = ChebyshevApproximation(
            wavy2, 2, SQ, n_nodes=[None, None], error_threshold=1e-7)
        assert spelled.n_nodes == omitted.n_nodes == [None, None]

    def test_mixed_sentinels_survive_until_build(self):
        c = ChebyshevApproximation(
            wavy3, 3, CUBE, n_nodes=[None, 13, 9], error_threshold=1e-6)
        assert c.n_nodes == [None, 13, 9]

    def test_build_resolves_only_the_auto_dims(self):
        c = ChebyshevApproximation(
            wavy3, 3, CUBE, n_nodes=[None, 13, 9], error_threshold=1e-6)
        c.build(verbose=False)
        assert c.n_nodes[1] == 13 and c.n_nodes[2] == 9
        assert isinstance(c.n_nodes[0], int)
        assert c.error_estimate() <= 1e-6

    def test_sentinel_without_threshold_is_rejected(self):
        with pytest.raises(ValueError, match="error_threshold"):
            ChebyshevApproximation(wavy2, 2, SQ, n_nodes=[None, 9])

    def test_omitting_both_is_rejected(self):
        with pytest.raises(ValueError, match="n_nodes.*error_threshold"):
            ChebyshevApproximation(wavy2, 2, SQ)


class TestMaxNBounds:
    def test_default_cap_is_64(self):
        c = ChebyshevApproximation(wavy2, 2, SQ, error_threshold=1e-7)
        assert c.max_n == 64

    def test_custom_cap_is_stored(self):
        c = ChebyshevApproximation(
            wavy2, 2, SQ, error_threshold=1e-7, max_n=96)
        assert c.max_n == 96

    @pytest.mark.parametrize("bad", [2, 1, 0, -4])
    def test_cap_below_loop_start_rejected(self, bad):
        with pytest.raises(ValueError, match="max_n must be at least 3"):
            ChebyshevApproximation(
                wavy2, 2, SQ, error_threshold=1e-7, max_n=bad)

    def test_cap_of_exactly_three_is_legal(self):
        c = ChebyshevApproximation(
            wavy2, 2, SQ, error_threshold=1e-7, max_n=3)
        assert c.max_n == 3
        c.build(verbose=False)  # degenerate loop: one pass, maybe a warning
        assert all(n == 3 for n in c.n_nodes)

    def test_hitting_the_cap_warns_but_stays_usable(self):
        def gnarly(x, _):
            return math.sin(19 * x[0]) - math.cos(23 * x[0])

        c = ChebyshevApproximation(
            gnarly, 1, [[-1, 1]], error_threshold=1e-13, max_n=12)
        with warnings.catch_warnings(record=True) as log:
            warnings.simplefilter("always")
            c.build(verbose=False)
        assert any(w.category is RuntimeWarning and "max_n" in str(w.message)
                   for w in log)
        assert c.n_nodes[0] <= 12
        assert np.isfinite(c.vectorized_eval([0.25], [0]))


class TestConvergenceTargets:
    def test_linear_target_stops_at_the_floor(self):
        c = ChebyshevApproximation(
            lambda x, _: 2.0 * x[0] - x[1], 2, SQ, error_threshold=1e-6)
        c.build(verbose=False)
        assert c.n_nodes == [3, 3]

    def test_gaussian_reaches_1e12(self):
        # Center the bump off-axis: an even target on a symmetric domain
        # would blind the last-coefficient estimator (parity blind spot,
        # shared with the reference) and void the accuracy check below.
        c = ChebyshevApproximation(
            lambda x, _: math.exp(-((x[0] - 0.3) ** 2)), 1, [[-2, 2]],
            error_threshold=1e-12)
        c.build(verbose=False)
        assert c.error_estimate() <= 1e-12
        xs = np.linspace(-1.9, 1.9, 41)
        got = np.array([c.vectorized_eval([x], [0]) for x in xs])
        np.testing.assert_allclose(got, np.exp(-((xs - 0.3) ** 2)), atol=5e-11)

    def test_3d_all_auto_meets_threshold(self):
        c = ChebyshevApproximation(wavy3, 3, CUBE, error_threshold=1e-6)
        c.build(verbose=False)
        assert all(isinstance(n, int) for n in c.n_nodes)
        assert c.error_estimate() <= 1e-6

    def test_getter_reports_the_ctor_threshold(self):
        c = ChebyshevApproximation(wavy2, 2, SQ, error_threshold=2.5e-7)
        c.build(verbose=False)
        assert c.get_error_threshold() == 2.5e-7


class TestOptimalN1Contract:
    def test_result_is_an_int_in_the_legal_band(self):
        n = ChebyshevApproximation.get_optimal_n1(
            lambda x, _: math.cos(2 * x[0]), [-1, 1], 1e-8)
        assert isinstance(n, int) and 3 <= n <= 64

    def test_linear_probe_answers_the_floor(self):
        n = ChebyshevApproximation.get_optimal_n1(
            lambda x, _: 4.0 * x[0] + 1.0, [-1, 1], 1e-10)
        assert n == 3

    def test_unreachable_target_returns_cap_and_warns(self):
        with warnings.catch_warnings(record=True) as log:
            warnings.simplefilter("always")
            n = ChebyshevApproximation.get_optimal_n1(
                lambda x, _: math.sin(47 * x[0]) + math.cos(31 * x[0]),
                [-1, 1], 1e-14, max_n=8)
        assert n == 8
        assert any(w.category is RuntimeWarning and "max_n" in str(w.message)
                   for w in log)


class TestSplineCtorDefaults:
    def test_omitted_knots_normalize_to_empty_per_dim(self):
        sp = ChebyshevSpline(wavy2, 2, SQ, error_threshold=1e-6)
        assert sp.knots == [[], []]
        sp.build(verbose=False)
        assert len(sp._pieces) == 1

    def test_spline_default_cap_matches_dense(self):
        sp = ChebyshevSpline(wavy2, 2, SQ, error_threshold=1e-6)
        assert sp.max_n == 64

    def test_nested_n_with_sentinel_needs_threshold(self):
        with pytest.raises(ValueError, match="error_threshold"):
            ChebyshevSpline(
                lambda x, _: abs(x[0]), 1, [[-1, 1]],
                n_nodes=[[None, 7]], knots=[[0.0]])

    def test_spline_verbose_banner_names_auto_n(self, capsys):
        sp = ChebyshevSpline(wavy2, 2, SQ, n_nodes=[None, None],
                             error_threshold=1e-4)
        sp.build(verbose=True)
        out = capsys.readouterr().out
        assert "auto-N" in out
        assert "error_threshold" in out

    def test_dense_verbose_narrates_auto_n_iterations(self, capsys):
        c = ChebyshevApproximation(wavy2, 2, SQ, error_threshold=1e-4)
        c.build(verbose=True)
        out = capsys.readouterr().out
        assert "[auto-N]" in out
