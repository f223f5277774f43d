"""Edge hardening for the fitting subsystem (VERDICT r3 item 6).

Pins the behavior of `utils/fitting.py` on the degenerate inputs a
production caller will eventually produce: duplicated sample points,
zero-weight-dominated samples, out-of-domain / over-order / bad-weight
derivative blocks, degenerate domains, and the rank-deficiency
surfacing added in round 4 (`min_norm` + warning).
"""

import warnings

import numpy as np
import pytest

from pychebyshev_tpu.utils import fitting

DOM2 = [[0.0, 1.0], [0.0, 1.0]]


@pytest.fixture()
def dup_samples():
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (13, 2))
    pts = np.concatenate([base, base])
    y = np.concatenate([base.sum(axis=1), base.sum(axis=1)])
    return base, pts, y


class TestDuplicatedPoints:
    def test_min_norm_surfaced(self, dup_samples):
        # 26 duplicated rows pass the informative-row gate for a
        # 25-value grid but span only 13 directions: the solve must
        # flag the silent min-norm fallback.
        _, pts, y = dup_samples
        with pytest.warns(UserWarning, match="rank-deficient"):
            _, diag = fitting.fit_dense_tensor(pts, y, DOM2, [5, 5])
        assert diag["min_norm"] is True
        assert diag["rank"] == 13

    def test_l2_resolves_duplicates_silently(self, dup_samples):
        _, pts, y = dup_samples
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            _, diag = fitting.fit_dense_tensor(pts, y, DOM2, [5, 5],
                                               l2=1e-8)
        assert diag["min_norm"] is False

    def test_duplicates_average_consistently(self, dup_samples):
        # Duplicated consistent observations must give the same fit as
        # the deduplicated set with doubled weights.
        base, pts, y = dup_samples
        # Determined grid (9 unknowns < 13 distinct rows) so the
        # comparison is not conditioned on the regularizer.
        t_dup, _ = fitting.fit_dense_tensor(pts, y, DOM2, [3, 3])
        t_w, _ = fitting.fit_dense_tensor(
            base, base.sum(axis=1), DOM2, [3, 3],
            sample_weight=np.full(13, 2.0))
        np.testing.assert_allclose(t_dup, t_w, rtol=1e-9, atol=1e-11)


class TestZeroWeights:
    def test_mostly_zero_weights_flagged(self, dup_samples):
        # Only 3 live rows for 25 unknowns: passes the (unweighted)
        # informative gate, must surface the min-norm solve.
        _, pts, y = dup_samples
        w = np.zeros(26)
        w[:3] = 1.0
        with pytest.warns(UserWarning, match="rank-deficient"):
            _, diag = fitting.fit_dense_tensor(pts, y, DOM2, [5, 5],
                                               sample_weight=w)
        assert diag["min_norm"] is True
        assert diag["rank"] == 3

    def test_all_zero_weights_rejected(self, dup_samples):
        _, pts, y = dup_samples
        with pytest.raises(ValueError, match="all zero"):
            fitting.fit_dense_tensor(pts, y, DOM2, [5, 5],
                                     sample_weight=np.zeros(26))


class TestDerivativeBlockEdges:
    def test_out_of_domain_block_points(self, dup_samples):
        _, pts, y = dup_samples
        dpts = np.array([[1.5, 0.5]])
        with pytest.raises(ValueError, match=r"derivative_data\[0\].*"
                                             r"outside domain"):
            fitting.fit_dense_tensor(
                pts, y, DOM2, [5, 5], l2=1e-8,
                derivative_data=[(dpts, (1, 0), np.array([1.0]))])

    def test_order_at_least_n_nodes(self, dup_samples):
        base, pts, y = dup_samples
        with pytest.raises(ValueError, match="orders\\[0\\]=6 >= "
                                             "n_nodes\\[0\\]=5"):
            fitting.fit_dense_tensor(
                pts, y, DOM2, [5, 5], l2=1e-8,
                derivative_data=[(base, (6, 0), base[:, 0])])

    def test_nonfinite_block_weight(self, dup_samples):
        base, pts, y = dup_samples
        for bad in (np.nan, np.inf, 0.0, -1.0):
            with pytest.raises(ValueError, match="weight must be "
                                                 "finite and > 0"):
                fitting.fit_dense_tensor(
                    pts, y, DOM2, [5, 5], l2=1e-8,
                    derivative_data=[(base, (1, 0), base[:, 0], bad)])

    def test_zero_order_duplicate_block_flagged(self, dup_samples):
        # A zero-order derivative block repeating the value samples
        # double-counts in the informative gate — the rank check must
        # still catch the fall-through (ADVICE r3 finding).
        base, _, _ = dup_samples
        y = base.sum(axis=1)
        with pytest.warns(UserWarning, match="rank-deficient"):
            _, diag = fitting.fit_dense_tensor(
                base, y, DOM2, [5, 5],
                derivative_data=[(base, (0, 0), y)])
        assert diag["min_norm"] is True


class TestDegenerateDomains:
    def test_zero_width_domain(self, dup_samples):
        _, pts, y = dup_samples
        with pytest.raises(ValueError, match="strictly less"):
            fitting.fit_dense_tensor(pts, y, [[0.0, 0.0], [0.0, 1.0]],
                                     [5, 5], l2=1e-8)

    def test_inverted_domain(self, dup_samples):
        _, pts, y = dup_samples
        with pytest.raises(ValueError, match="strictly less"):
            fitting.fit_dense_tensor(pts, y, [[1.0, 0.0], [0.0, 1.0]],
                                     [5, 5], l2=1e-8)
