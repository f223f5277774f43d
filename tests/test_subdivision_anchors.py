"""Hierarchical anchoring in the certified subdivision search (r4).

The anchored search re-truncates subtree polynomials into small local
roots with explicit rigorous error bounds.  These tests pin: result
equivalence with the pre-anchor semantics, certificate validity
against brute-force grids, the eps bookkeeping direction, and the
promotion plumbing (frames, width floor, split scaling).
"""

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.ops import subdivision as sd


def _cheb_tensor(f, n, d):
    """Coefficient tensor of f on [-1,1]^d via a dense build (the
    search's own convention — ``globalcalc.dense_coeff_tensor``)."""
    from pychebyshev_tpu.utils.globalcalc import dense_coeff_tensor
    c = ChebyshevApproximation(f, d, [[-1, 1]] * d, n_nodes=[n] * d,
                               vectorized=True)
    c.build(verbose=False)
    return dense_coeff_tensor(np.asarray(c.tensor_values)), c


def wavy(p, _=None):
    p = np.atleast_2d(np.asarray(p, float))
    return (np.sin(3 * p[:, 0]) * np.cos(2 * p[:, 1])
            + 0.3 * np.sin(2 * p[:, 2]) + 0.1 * p[:, 0] * p[:, 2])


class TestAnchoredSearch:
    def test_certificate_vs_brute_force(self):
        coeffs, c = _cheb_tensor(wavy, 17, 3)
        res = sd.minimize_coeff_tensor(coeffs, tol=1e-9,
                                       max_boxes=50000)
        assert res.certified
        # Brute-force reference on a fine grid.
        g = np.linspace(-1, 1, 41)
        pts = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                       axis=-1).reshape(-1, 3)
        brute = wavy(pts).min()
        assert res.value <= brute + 1e-6
        assert res.value - res.gap <= brute + 1e-9

    def test_anchors_created_on_large_tensor(self, monkeypatch):
        # Force anchoring on a small tensor by dropping the size gate,
        # then verify results match the un-anchored search exactly
        # (within the rigorous eps budget).
        coeffs, _ = _cheb_tensor(wavy, 17, 3)
        res_plain = sd.minimize_coeff_tensor(coeffs, tol=1e-9,
                                             max_boxes=50000)
        monkeypatch.setattr(sd, "_ANCHOR_MIN_SIZE", 1)
        monkeypatch.setattr(sd, "_JAX_STATS_MIN_SIZE", 10 ** 12)
        res_anch = sd.minimize_coeff_tensor(coeffs, tol=1e-9,
                                            max_boxes=50000)
        assert res_anch.certified
        assert abs(res_anch.value - res_plain.value) <= 2e-9
        assert np.allclose(res_anch.location, res_plain.location,
                           atol=1e-4)

    def test_eps_direction_keeps_value_attained(self, monkeypatch):
        # The reported value must be ATTAINED: it is re-evaluated
        # exactly at the returned location, so it must match the true
        # function there (up to interpolation error) — anchor eps must
        # never leak an unattainable (too-low) incumbent through.
        monkeypatch.setattr(sd, "_ANCHOR_MIN_SIZE", 1)
        coeffs, c = _cheb_tensor(wavy, 17, 3)
        res = sd.minimize_coeff_tensor(coeffs, tol=1e-7,
                                       max_boxes=50000)
        assert res.certified
        attained = float(wavy(np.array([res.location])))
        assert abs(res.value - attained) < 1e-6
        # And the certificate's lower bound holds against a fine grid.
        g = np.linspace(-1, 1, 81)
        pts = np.stack(np.meshgrid(g, g, g, indexing="ij"),
                       axis=-1).reshape(-1, 3)
        assert res.value - res.gap <= wavy(pts).min() + 1e-9

    def test_menu_ceil(self):
        assert sd._menu_ceil(4, 21) == 4
        assert sd._menu_ceil(10, 21) == 11
        assert sd._menu_ceil(22, 21) == 21
        assert sd._menu_ceil(200, 21) == 21

    def test_class_surface_still_certifies(self):
        def f(p, _=None):
            p = np.atleast_2d(np.asarray(p, float))
            return ((p[:, 0] - 0.3) ** 2 + (p[:, 1] + 0.2) ** 2
                    + 0.1 * np.sin(5 * p[:, 0]))

        c = ChebyshevApproximation(f, 2, [[-1, 1]] * 2,
                                   n_nodes=[21, 21], vectorized=True)
        c.build(verbose=False)
        val, loc = c.minimize(tol=1e-8)
        g = np.linspace(-1, 1, 301)
        pts = np.stack(np.meshgrid(g, g, indexing="ij"),
                       axis=-1).reshape(-1, 2)
        assert val <= f(pts).min() + 1e-6


class TestBatchedStats:
    def test_batched_matches_broadcast(self):
        rng = np.random.default_rng(0)
        coeffs = rng.normal(size=(7, 7, 7))
        coeffs[2:] *= 0.05
        boxes = np.stack([
            np.array([[-1.0, 0.0], [-0.5, 0.5], [0.0, 1.0]]),
            np.array([[-0.25, 0.25], [-1.0, -0.5], [0.5, 1.0]]),
        ])
        plain = sd._make_full_stats(coeffs)(boxes)
        batched = sd._make_batched_stats((7, 7, 7))(
            boxes, np.broadcast_to(coeffs, (2, 7, 7, 7)))
        for a, b in zip(plain, batched):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-12)

    def test_batched_jit_path_matches_numpy(self, monkeypatch):
        # Force the fused jit program (batched-coeffs variant) on a
        # small tensor and pin it against the numpy path.
        rng = np.random.default_rng(2)
        coeffs = rng.normal(size=(5, 5, 5))
        coeffs[2:] *= 0.01
        boxes = np.stack([
            np.array([[-1.0, 0.0], [0.0, 1.0], [-0.5, 0.5]]),
            np.array([[-0.25, 0.75], [-1.0, 1.0], [0.0, 0.5]]),
        ])
        stacked = np.stack([coeffs, coeffs * 0.5])
        ref = sd._make_batched_stats((5, 5, 5))(boxes, stacked)
        monkeypatch.setattr(sd, "_JAX_STATS_MIN_SIZE", 1)
        sd._make_batched_stats.cache_clear()
        jit_out = sd._make_batched_stats((5, 5, 5))(boxes, stacked)
        sd._make_batched_stats.cache_clear()
        for a, b in zip(ref, jit_out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-12, atol=1e-12)

    def test_batched_distinct_tensors(self):
        rng = np.random.default_rng(1)
        c1 = rng.normal(size=(6, 6))
        c2 = rng.normal(size=(6, 6))
        boxes = np.stack([np.array([[-0.5, 0.5], [-0.5, 0.5]])] * 2)
        b = sd._make_batched_stats((6, 6))(boxes, np.stack([c1, c2]))
        p1 = sd._make_full_stats(c1)(boxes[:1])
        p2 = sd._make_full_stats(c2)(boxes[1:])
        np.testing.assert_allclose(b[0][0], p1[0][0], atol=1e-12)
        np.testing.assert_allclose(b[0][1], p2[0][0], atol=1e-12)
