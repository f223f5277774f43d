"""Error-threshold auto-N construction surface.

Native coverage of the behavior classes the reference pins in its
error-threshold suite (reference tests/test_error_threshold.py): the
doubling loop's stopping rules, warning discipline, diagnostics text,
the static single-dim probe, and per-piece threshold builds on splines.
"""

import math
import warnings

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline


def smooth2(x, _):
    return x[0] ** 2 + 0.5 * x[1]


class TestDoublingLoopStops:
    def test_already_converged_runs_one_pass(self):
        # A linear function has a zero top Chebyshev coefficient on the
        # initial N=3 grid, so the loop stops after one evaluation pass.
        # (A quadratic would NOT stop: its x^2 energy lands exactly in
        # the top coefficient the estimator reads, forcing one doubling.)
        ap = ChebyshevApproximation(
            lambda x, _: 0.25 * x[0] + 0.5 * x[1] - 1.0, 2,
            [[-1, 1], [-1, 1]], error_threshold=1e-3)
        ap.build(verbose=False)
        assert ap.n_nodes == [3, 3]
        assert ap.n_evaluations == 9

    def test_top_coefficient_energy_forces_one_doubling(self):
        # Companion to the above: x^2 at N=3 puts its whole curvature
        # in the last coefficient, so the estimator demands N=6 even
        # though 3 nodes interpolate a quadratic exactly.
        ap = ChebyshevApproximation(
            lambda x, _: x[0] ** 2, 1, [[-1, 1]], error_threshold=1e-3)
        ap.build(verbose=False)
        assert ap.n_nodes == [6]

    def test_threshold_met_emits_no_warning(self):
        ap = ChebyshevApproximation(
            lambda x, _: math.sin(x[0]), 1, [[-1, 1]],
            error_threshold=1e-9, max_n=64)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            ap.build(verbose=False)
        assert ap.error_estimate() <= 1e-9

    def test_tighter_threshold_rebuild_grows_grid(self):
        ap = ChebyshevApproximation(
            lambda x, _: math.exp(3 * x[0]), 1, [[-1, 1]],
            error_threshold=1e-4)
        ap.build(verbose=False)
        first = list(ap.n_nodes)
        ap.error_threshold = 1e-12
        ap.build(verbose=False)
        assert ap.n_nodes[0] > first[0]
        assert ap.error_estimate() <= 1e-12

    def test_harder_dim_gets_more_nodes(self):
        # exp is parity-asymmetric, so the tail estimator sees it
        # honestly (an odd function like sin(8x) would exploit the
        # documented parity blind spot and stop at N=3).
        ap = ChebyshevApproximation(
            lambda x, _: math.exp(4 * x[0]) + x[1], 2,
            [[-1, 1], [-1, 1]], error_threshold=1e-8)
        ap.build(verbose=False)
        assert ap.n_nodes[0] > ap.n_nodes[1]

    def test_verbose_build_narrates_iterations(self, capsys):
        ap = ChebyshevApproximation(
            lambda x, _: math.exp(3 * x[0]), 1, [[-1, 1]],
            error_threshold=1e-10)
        ap.build(verbose=True)
        out = capsys.readouterr().out
        assert "auto-N" in out
        assert out.count("error=") >= 2  # at least one doubling happened


class TestDiagnosticsText:
    def test_unbuilt_auto_object_prints_placeholders(self):
        ap = ChebyshevApproximation(smooth2, 2, [[-1, 1], [-1, 1]],
                                    error_threshold=1e-6)
        s = str(ap)
        assert "ChebyshevApproximation" in s
        assert "not built" in s
        assert "auto" in s  # None entries shown as auto-resolved

    def test_built_auto_object_prints_resolved_ns(self):
        ap = ChebyshevApproximation(smooth2, 2, [[-1, 1], [-1, 1]],
                                    error_threshold=1e-6)
        ap.build(verbose=False)
        s = str(ap)
        assert str(ap.n_nodes[0]) in s


class TestOptimalN1Probe:
    def test_difficulty_orders_the_answer(self):
        easy = ChebyshevApproximation.get_optimal_n1(
            lambda x, _: x[0] ** 2, (-1, 1), 1e-8)
        hard = ChebyshevApproximation.get_optimal_n1(
            lambda x, _: math.exp(5 * x[0]), (-1, 1), 1e-8)
        assert hard > easy

    def test_cap_respected(self):
        n = ChebyshevApproximation.get_optimal_n1(
            lambda x, _: abs(x[0] - 0.3), (-1, 1), 1e-12, max_n=16)
        assert n <= 16


class TestSplineThresholdBuilds:
    def test_per_piece_resolution_around_a_kink(self):
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) ** 1.5, 1, [[-1, 1]],
            n_nodes=[None], knots=[[0.0]], error_threshold=1e-7)
        sp.build(verbose=False)
        assert sp.error_estimate() <= 1e-7
        for piece in sp._pieces:
            assert all(isinstance(n, int) for n in piece.n_nodes)
            assert piece.error_estimate() <= 1e-7

    def test_knotless_threshold_spline_matches_dense(self):
        dense = ChebyshevApproximation(
            smooth2, 2, [[-1, 1], [-1, 1]], error_threshold=1e-6)
        dense.build(verbose=False)
        sp = ChebyshevSpline(
            smooth2, 2, [[-1, 1], [-1, 1]], n_nodes=[None, None],
            knots=[[], []], error_threshold=1e-6)
        sp.build(verbose=False)
        assert len(sp._pieces) == 1
        assert sp._pieces[0].n_nodes == dense.n_nodes

    def test_unbuilt_auto_spline_reports_zero_evals(self):
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]), 1, [[-1, 1]],
            n_nodes=[None], knots=[[0.0]], error_threshold=1e-6)
        assert sp.total_build_evals == 0
        sp.build(verbose=False)
        assert sp.total_build_evals == sum(
            p.n_evaluations for p in sp._pieces)

    def test_explicit_n_bypasses_the_loop(self):
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]), 1, [[-1, 1]],
            n_nodes=[17], knots=[[0.0]])
        sp.build(verbose=False)
        for piece in sp._pieces:
            assert piece.n_nodes == [17]

    def test_spline_ctor_rejections(self):
        with pytest.raises(ValueError):
            ChebyshevSpline(smooth2, 2, [[-1, 1], [-1, 1]])  # no n, no thr
        with pytest.raises(ValueError):
            ChebyshevSpline(smooth2, 2, [[-1, 1], [-1, 1]],
                            n_nodes=[None, 5])  # None without threshold
        with pytest.raises(ValueError):
            ChebyshevSpline(
                lambda x, _: abs(x[0]), 1, [[-1, 1]], n_nodes=[None],
                knots=[[0.0]], error_threshold=1e-6, max_n=2)
