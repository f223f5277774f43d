"""Round-5 anchoring: zero isolation + TT rank/degree anchors.

Pins the two new anchored searches against their pre-anchor semantics
(forced-anchor A/B on small inputs), the rigor direction of every new
bound (degree-crop tails, bounded TT-SVD rounding, eps widening of the
zero-exclusion test), and certificate validity against brute force.
"""

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevTT
from pychebyshev_tpu.models import tt_algorithms as tta
from pychebyshev_tpu.ops import subdivision as sd


def _grad_system(f, n, d):
    from pychebyshev_tpu.utils.globalcalc import (
        _grad_specs,
        dense_coeff_tensor,
    )
    c = ChebyshevApproximation(f, d, [[-1, 1]] * d, n_nodes=[n] * d,
                               vectorized=True)
    c.build(verbose=False)
    return [dense_coeff_tensor(c.differentiate(spec).tensor_values)
            for spec in _grad_specs(d)]


def bumpy(p, _=None):
    p = np.atleast_2d(np.asarray(p, float))
    return (np.cos(4 * p[:, 0]) * np.cos(3 * p[:, 1])
            + 0.2 * np.sin(2 * p[:, 2]) + 0.05 * p[:, 0] * p[:, 1])


class TestAnchoredIsolation:
    def test_forced_anchors_identical_boxes(self, monkeypatch):
        coeffs = _grad_system(bumpy, 21, 3)
        plain = sd.isolate_common_zeros(coeffs, delta=1e-3,
                                        max_boxes=200000)
        monkeypatch.setattr(sd, "_ANCHOR_MIN_SIZE", 1)
        anchored = sd.isolate_common_zeros(coeffs, delta=1e-3,
                                           max_boxes=200000)
        assert anchored.shape == plain.shape
        a = anchored[np.lexsort(anchored.T)]
        b = plain[np.lexsort(plain.T)]
        np.testing.assert_allclose(a, b, atol=1e-3)

    def test_known_zeros_survive_forced_anchoring(self, monkeypatch):
        # Common zeros of (x^2 + y^2 - 0.5, x - y): exactly two points
        # at +-(0.5, 0.5).  Anchor eps must never exclude them.
        monkeypatch.setattr(sd, "_ANCHOR_MIN_SIZE", 1)

        def f1(p, _=None):
            p = np.atleast_2d(np.asarray(p, float))
            return p[:, 0] ** 2 + p[:, 1] ** 2 - 0.5

        def f2(p, _=None):
            p = np.atleast_2d(np.asarray(p, float))
            return p[:, 0] - p[:, 1]

        from pychebyshev_tpu.utils.globalcalc import dense_coeff_tensor
        cs = []
        for f in (f1, f2):
            c = ChebyshevApproximation(f, 2, [[-1, 1]] * 2,
                                       n_nodes=[9, 9], vectorized=True)
            c.build(verbose=False)
            cs.append(dense_coeff_tensor(c.tensor_values))
        cands = sd.isolate_common_zeros(cs, delta=1e-4)
        roots = np.array([[0.5, 0.5], [-0.5, -0.5]])
        assert cands.shape[0] >= 2
        for r in roots:
            assert np.min(np.abs(cands - r).max(axis=1)) < 1e-3

    def test_no_zero_system_empty(self, monkeypatch):
        monkeypatch.setattr(sd, "_ANCHOR_MIN_SIZE", 1)

        def f1(p, _=None):
            p = np.atleast_2d(np.asarray(p, float))
            return p[:, 0] ** 2 + p[:, 1] ** 2 + 1.0

        from pychebyshev_tpu.utils.globalcalc import dense_coeff_tensor
        c = ChebyshevApproximation(f1, 2, [[-1, 1]] * 2,
                                   n_nodes=[7, 7], vectorized=True)
        c.build(verbose=False)
        t = dense_coeff_tensor(c.tensor_values)
        assert sd.isolate_common_zeros([t, t]).shape[0] == 0

    def test_critical_points_through_anchors(self, monkeypatch):
        # The production path (critical_points -> isolate) must return
        # the same stationary points with anchors forced on.
        monkeypatch.setattr(sd, "_ANCHOR_MIN_SIZE", 1)
        c = ChebyshevApproximation(bumpy, 3, [[-1, 1]] * 3,
                                   n_nodes=[17] * 3, vectorized=True)
        c.build(verbose=False)
        pts = c.critical_points(delta=1e-3)
        assert len(pts) > 0
        # Every returned point's gradient vanishes (polished).
        for cp in pts:
            g = [float(c.vectorized_eval(cp.point, spec))
                 for spec in ((1, 0, 0), (0, 1, 0), (0, 0, 1))]
            assert np.abs(g).max() < 1e-6


def _random_tt(rng, d=4, n=9, r=5):
    cores = []
    ranks = [1] + [r] * (d - 1) + [1]
    for k in range(d):
        c = rng.normal(size=(ranks[k], n, ranks[k + 1]))
        c[:, 3:, :] *= np.exp(-5.0 * np.arange(n - 3))[None, :, None]
        cores.append(c)
    return cores


class TestTTTruncationBounds:
    def test_degree_crop_bound_rigorous(self):
        rng = np.random.default_rng(5)
        cores = _random_tt(rng)
        cropped, dropped = sd._tt_degree_crop(cores, budget=1e-3)
        assert any(a.shape[1] < b.shape[1]
                   for a, b in zip(cropped, cores))
        ref = tta.tt_reconstruct(cores)
        # Pad cropped coefficients back and compare sup over the full
        # grid of Chebyshev sums via dense reconstruction.
        padded = [np.pad(c, ((0, 0), (0, cores[k].shape[1]
                                      - c.shape[1]), (0, 0)))
                  for k, c in enumerate(cropped)]
        diff = tta.tt_reconstruct(padded) - ref
        # sup_x |sum dc_k T_k(x)| <= sum |dc_k| <= dropped bound; the
        # coefficient l1 of the difference is itself <= the bound.
        assert np.abs(diff).sum() <= dropped + 1e-12

    def test_round_bounded_frobenius(self):
        rng = np.random.default_rng(6)
        cores = _random_tt(rng)
        rounded, frob = sd._tt_round_cores_bounded(cores, 1e-2)
        a = tta.tt_reconstruct(cores)
        b = tta.tt_reconstruct(rounded)
        assert np.sqrt(((a - b) ** 2).sum()) <= frob * (1 + 1e-9) + 1e-12
        assert frob <= 1e-2

    def test_round_bounded_zero_budget_exact(self):
        rng = np.random.default_rng(7)
        cores = _random_tt(rng)
        rounded, frob = sd._tt_round_cores_bounded(cores, 0.0)
        assert frob == 0.0
        np.testing.assert_allclose(tta.tt_reconstruct(rounded),
                                   tta.tt_reconstruct(cores),
                                   atol=1e-10)


class TestAnchoredTTMinimize:
    def _chain(self, d=3, n=13, rank=6):
        def f(pts, _=None):
            x = np.asarray(pts)
            return (np.cos(2.5 * x[..., 0]) * np.cos(2.0 * x[..., 1])
                    + 0.3 * np.sin(1.5 * x[..., 2])
                    + 0.05 * x.sum(axis=-1))

        tt = ChebyshevTT(f, d, [[-1, 1]] * d, [n] * d, max_rank=rank,
                         tolerance=1e-12, vectorized=True)
        tt.build(verbose=False)
        return [np.asarray(c, float) for c in tt._coeff_cores], f

    def test_forced_anchors_match_plain(self, monkeypatch):
        cores, f = self._chain()
        plain = sd.minimize_tt_cores(cores, tol=1e-9, max_boxes=100000)
        monkeypatch.setattr(sd, "_TT_ANCHOR_MIN_COST", 1)
        anch = sd.minimize_tt_cores(cores, tol=1e-9, max_boxes=100000)
        assert plain.certified and anch.certified
        assert abs(anch.value - plain.value) <= 2e-9
        assert np.allclose(anch.location, plain.location, atol=1e-4)

    def test_certificate_vs_brute_force(self, monkeypatch):
        monkeypatch.setattr(sd, "_TT_ANCHOR_MIN_COST", 1)
        cores, f = self._chain()
        res = sd.minimize_tt_cores(cores, tol=1e-8, max_boxes=100000)
        assert res.certified
        g = np.linspace(-1, 1, 61)
        pts = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                       axis=-1).reshape(-1, 3)
        brute = f(pts).min()
        assert res.value <= brute + 1e-5
        assert res.value - res.gap <= brute + 1e-8

    def test_anchor_eps_direction(self, monkeypatch):
        # Anchored cand_val must OVERESTIMATE an attained chain value:
        # the reported minimum can never undershoot the true TT minimum
        # by more than the gap.
        monkeypatch.setattr(sd, "_TT_ANCHOR_MIN_COST", 1)
        cores, f = self._chain()
        dense = tta.tt_reconstruct(cores)
        # Chebyshev sum on a coarse grid of the dense coefficients.
        res = sd.minimize_tt_cores(cores, tol=1e-8, max_boxes=100000)
        v = sd.eval_coeff_tensor_at(dense, res.location)
        assert res.value >= v - 1e-9

    def test_class_tt_minimize_still_works(self):
        cores, f = self._chain()
        tt = ChebyshevTT(f, 3, [[-1, 1]] * 3, [13] * 3, max_rank=6,
                         tolerance=1e-12, vectorized=True)
        tt.build(verbose=False)
        val, loc = tt.minimize(tol=1e-7)
        g = np.linspace(-1, 1, 61)
        pts = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                       axis=-1).reshape(-1, 3)
        assert val <= f(pts).min() + 1e-5


class TestAnchoredTTIsolation:
    @staticmethod
    def _tt_of(f, d=2, n=9, rank=4):
        tt = ChebyshevTT(f, d, [[-1, 1]] * d, [n] * d, max_rank=rank,
                         tolerance=1e-12, vectorized=True)
        tt.build(verbose=False)
        return [np.asarray(c, float) for c in tt._coeff_cores]

    def test_forced_anchors_match_plain(self, monkeypatch):
        c1 = self._tt_of(lambda p, _=None:
                         np.asarray(p)[..., 0] ** 2
                         + np.asarray(p)[..., 1] ** 2 - 0.5)
        c2 = self._tt_of(lambda p, _=None:
                         np.asarray(p)[..., 0] - np.asarray(p)[..., 1])
        plain = sd.isolate_common_zeros_tt([c1, c2], delta=1e-3)
        monkeypatch.setattr(sd, "_TT_ANCHOR_MIN_COST", 1)
        monkeypatch.setattr(sd, "_TT_ANCHOR_MAX_WIDTH", 2.0)
        anch = sd.isolate_common_zeros_tt([c1, c2], delta=1e-3)
        assert anch.shape == plain.shape
        a = anch[np.lexsort(anch.T)]
        b = plain[np.lexsort(plain.T)]
        np.testing.assert_allclose(a, b, atol=1e-3)
        # The two true common zeros at +-(0.5, 0.5) both survive.
        for r in (np.array([0.5, 0.5]), np.array([-0.5, -0.5])):
            assert np.min(np.abs(anch - r).max(axis=1)) < 1e-2

    def test_no_common_zero_empty(self, monkeypatch):
        monkeypatch.setattr(sd, "_TT_ANCHOR_MIN_COST", 1)
        monkeypatch.setattr(sd, "_TT_ANCHOR_MAX_WIDTH", 2.0)
        c1 = self._tt_of(lambda p, _=None:
                         np.asarray(p)[..., 0] ** 2
                         + np.asarray(p)[..., 1] ** 2 + 1.0)
        assert sd.isolate_common_zeros_tt([c1, c1]).shape[0] == 0
