"""Edge hardening for the global-calculus subsystem (VERDICT r3 item 6).

Pins degenerate-input behavior of the certified search surfaces:
zero/negative tolerances, out-of-range ``fixed`` pins, roundoff-floor
tolerances, budget exhaustion honesty, and zero-free systems.
"""

import warnings

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, solve_system


@pytest.fixture(scope="module")
def bowl2():
    c = ChebyshevApproximation(
        lambda p, _: np.asarray(p)[:, 0] ** 2 + np.asarray(p)[:, 1] ** 2,
        2, [[-1, 1]] * 2, [7, 7], vectorized=True)
    c.build(verbose=False)
    return c


class TestToleranceEdges:
    def test_zero_tol_rejected(self, bowl2):
        with pytest.raises(ValueError, match="tol must be positive"):
            bowl2.minimize(tol=0.0)

    def test_negative_tol_rejected(self, bowl2):
        with pytest.raises(ValueError, match="tol must be positive"):
            bowl2.minimize(tol=-1e-9)

    def test_tol_below_roundoff_on_easy_function(self, bowl2):
        # A convex bowl certifies even at tol far below roundoff: the
        # monotonicity collapse pins it without splitting to the
        # width floor.
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            v, loc = bowl2.minimize(tol=1e-18)
        assert abs(v) < 1e-12
        assert np.abs(loc).max() < 1e-6


class TestFixedEdges:
    def test_fixed_out_of_domain(self, bowl2):
        with pytest.raises(ValueError, match="outside that dim's "
                                             "domain"):
            bowl2.minimize(tol=1e-9, fixed={0: 5.0})

    def test_fixed_bad_dim(self, bowl2):
        with pytest.raises(ValueError, match="out of range"):
            bowl2.minimize(tol=1e-9, fixed={7: 0.0})

    def test_fixed_valid_restricts(self, bowl2):
        v, loc = bowl2.minimize(tol=1e-9, fixed={0: 0.3})
        assert v == pytest.approx(0.09, abs=1e-8)
        assert loc[0] == pytest.approx(0.3, abs=1e-12)


class TestBudgetHonesty:
    def test_exhaustion_warns_with_gap(self):
        def hard(p, _):
            p = np.atleast_2d(np.asarray(p, float))
            return np.sin(20 * p[:, 0]) * np.cos(17 * p[:, 1])

        h = ChebyshevApproximation(hard, 2, [[-1, 1]] * 2, [41, 41],
                                   vectorized=True)
        h.build(verbose=False)
        with pytest.warns(RuntimeWarning, match="remaining bound gap"):
            v, _ = h.minimize(tol=1e-12, max_boxes=8)
        # The returned point is still an attained value.
        assert v <= 0.0

    def test_oscillatory_certifies_with_budget(self):
        # The anchored search (r4) certifies a 41x41 oscillatory
        # tensor at practical tolerance within a moderate budget.
        def hard(p, _):
            p = np.atleast_2d(np.asarray(p, float))
            return np.sin(20 * p[:, 0]) * np.cos(17 * p[:, 1])

        h = ChebyshevApproximation(hard, 2, [[-1, 1]] * 2, [41, 41],
                                   vectorized=True)
        h.build(verbose=False)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            v, loc = h.minimize(tol=1e-7, max_boxes=50000)
        assert v == pytest.approx(-1.0, abs=1e-6)


class TestSystemEdges:
    def test_zero_free_system_returns_empty(self):
        f1 = ChebyshevApproximation(
            lambda p, _: (np.asarray(p)[:, 0] ** 2
                          + np.asarray(p)[:, 1] ** 2 + 1.0),
            2, [[-1, 1]] * 2, [7, 7], vectorized=True)
        f1.build(verbose=False)
        f2 = ChebyshevApproximation(
            lambda p, _: np.asarray(p)[:, 0] - np.asarray(p)[:, 1],
            2, [[-1, 1]] * 2, [7, 7], vectorized=True)
        f2.build(verbose=False)
        assert len(solve_system([f1, f2])) == 0
