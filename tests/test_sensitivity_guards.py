"""Sobol analytic contracts, auto-knot heuristics, and NaN build guards.

Native coverage of the reference's adaptive-refinement suite (reference
tests/test_v020_adaptive_refinement.py): closed-form Sobol splits,
degenerate-variance handling, auto_knots caps and rejection paths, and
non-finite function guards at build.  Frame-threading guards live in
tests/test_tt_frame_algebra.py / tests/test_tt_dim_order.py.
"""

import math

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSpline,
    ChebyshevTT,
)


SQ = [[-1.0, 1.0], [-1.0, 1.0]]


def _sobol(fn, dims, dom, n=9):
    c = ChebyshevApproximation(fn, dims, dom, [n] * dims)
    c.build(verbose=False)
    return c.sobol_indices()


class TestSobolClosedForms:
    def test_constant_surface_has_zero_variance(self):
        s = _sobol(lambda x, _: 7.5, 2, SQ)
        assert s["variance"] == 0.0
        assert all(v == 0.0 for v in s["first_order"].values())
        assert all(v == 0.0 for v in s["total_order"].values())

    def test_univariate_linear_owns_everything(self):
        s = _sobol(lambda x, _: 3.0 * x[0] - 1.0, 1, [[-1, 1]])
        assert s["first_order"][0] == pytest.approx(1.0, abs=1e-12)
        assert s["variance"] > 0

    def test_weighted_additive_split_follows_the_squares(self):
        # f = 2*x0 + x1: variance shares are 4:1 under any product
        # measure with equal per-dim marginal variances.
        s = _sobol(lambda x, _: 2.0 * x[0] + x[1], 2, SQ)
        assert s["first_order"][0] == pytest.approx(0.8, abs=1e-10)
        assert s["first_order"][1] == pytest.approx(0.2, abs=1e-10)

    def test_pure_product_is_all_interaction(self):
        s = _sobol(lambda x, _: x[0] * x[1], 2, SQ)
        assert s["first_order"][0] == pytest.approx(0.0, abs=1e-10)
        assert s["first_order"][1] == pytest.approx(0.0, abs=1e-10)
        assert s["total_order"][0] == pytest.approx(1.0, abs=1e-10)
        assert s["total_order"][1] == pytest.approx(1.0, abs=1e-10)

    def test_result_keys_and_ordering_invariants(self):
        s = _sobol(lambda x, _: x[0] + 0.3 * x[0] * x[1], 2, SQ)
        assert set(s) == {"first_order", "total_order", "variance"}
        assert set(s["first_order"]) == {0, 1}
        for d in (0, 1):
            assert s["total_order"][d] >= s["first_order"][d] - 1e-12

    def test_three_term_mix_is_normalized(self):
        s = _sobol(lambda x, _: x[0] + 0.5 * x[1] + 0.25 * x[0] * x[1],
                   2, SQ)
        fo = s["first_order"]
        assert 0.0 < fo[0] < 1.0 and 0.0 < fo[1] < 1.0
        assert fo[0] + fo[1] < 1.0 + 1e-12  # interaction takes the rest
        assert fo[0] > fo[1]  # heavier coefficient, bigger share

    def test_spline_sobol_same_contract(self):
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) + 0.1 * x[1], 2, SQ,
            n_nodes=[9, 9], knots=[[0.0], []])
        sp.build(verbose=False)
        s = sp.sobol_indices()
        assert set(s) == {"first_order", "total_order", "variance"}
        assert s["first_order"][0] > s["first_order"][1]


class TestAutoKnotHeuristics:
    def test_two_kinks_both_found(self):
        def zigzag(x, _):
            return abs(x[0] + 0.5) + abs(x[0] - 0.4)

        sp = ChebyshevSpline.auto_knots(zigzag, 1, [[-1, 1]])
        ks = sp.knots[0]
        assert min(abs(k + 0.5) for k in ks) < 0.02
        assert min(abs(k - 0.4) for k in ks) < 0.02

    def test_per_dim_cap_is_respected(self):
        def comb(x, _):
            return sum(abs(x[0] - c) for c in
                       (-0.8, -0.5, -0.2, 0.1, 0.4, 0.7))

        sp = ChebyshevSpline.auto_knots(comb, 1, [[-1, 1]],
                                        max_knots_per_dim=2)
        assert len(sp.knots[0]) <= 2

    def test_nan_during_scan_is_a_clear_error(self):
        def holey(x, _):
            return x[0] if x[0] > 0 else float("nan")

        with pytest.raises(ValueError, match="non-finite"):
            ChebyshevSpline.auto_knots(holey, 1, [[-1.0, 1.0]])

    def test_resulting_spline_is_accurate_at_the_kink(self):
        sp = ChebyshevSpline.auto_knots(
            lambda x, _: abs(x[0] - 0.25), 1, [[-1, 1]])
        for x in (-0.6, 0.2, 0.25, 0.3, 0.9):
            assert sp.eval([x], [0]) == pytest.approx(
                abs(x - 0.25), abs=1e-5)


class TestNonFiniteBuildGuards:
    def test_dense_build_rejects_nan(self):
        def holey(x, _):
            return float("nan") if x[0] > 0 else 1.0

        c = ChebyshevApproximation(holey, 1, [[-1, 1]], [9])
        with pytest.raises(ValueError):
            c.build(verbose=False)

    def test_dense_build_rejects_inf(self):
        def spiky(x, _):
            return float("inf") if abs(x[0]) < 0.5 else 1.0

        c = ChebyshevApproximation(spiky, 1, [[-1, 1]], [9])
        with pytest.raises(ValueError):
            c.build(verbose=False)

    def test_tt_sobol_before_build_raises(self):
        tt = ChebyshevTT(lambda x, _: x[0] + x[1], 2, SQ, [5, 5],
                         max_rank=3)
        with pytest.raises(RuntimeError):
            tt.sobol_indices()


class TestTTSobolParity:
    def test_matches_dense_on_nonuniform_domain_after_reorder(self):
        dom = [[0.0, 2.0], [-1.0, 3.0]]

        def f(x, _):
            return x[0] ** 2 + 0.5 * x[1] + 0.2 * x[0] * x[1]

        dense = ChebyshevApproximation(f, 2, dom, [9, 9])
        dense.build(verbose=False)
        tt = ChebyshevTT(f, 2, dom, [9, 9], max_rank=4)
        tt.build(verbose=False)
        flipped = tt.reorder([1, 0])
        a, b = dense.sobol_indices(), flipped.sobol_indices()
        for d in (0, 1):
            assert b["first_order"][d] == pytest.approx(
                a["first_order"][d], abs=1e-8)
            assert b["total_order"][d] == pytest.approx(
                a["total_order"][d], abs=1e-8)


class TestInteractionGuards:
    def test_dense_pair_rejects_nonfinite(self):
        from pychebyshev_tpu.utils.sensitivity import (
            pair_interactions_from_coeffs,
        )
        bad = np.ones((5, 5))
        bad[2, 3] = np.nan
        with pytest.raises(ValueError, match="NaN or Inf"):
            pair_interactions_from_coeffs(bad, 2)

    def test_tt_pair_rejects_nonfinite(self):
        from pychebyshev_tpu.utils.sensitivity import tt_pair_interactions
        cores = [np.ones((1, 5, 2)), np.ones((2, 5, 1))]
        cores[1][0, 3, 0] = np.inf
        with pytest.raises(ValueError, match="NaN or Inf"):
            tt_pair_interactions(cores)

    def test_shared_partition_helper(self):
        from pychebyshev_tpu.utils.sensitivity import (
            partition_from_interactions,
        )
        inter = np.zeros((4, 4))
        inter[0, 3] = inter[3, 0] = 0.2
        assert partition_from_interactions(inter, 1e-8) == [
            [0, 3], [1], [2]]
