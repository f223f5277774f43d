"""Batched axis-aligned-box integration (``integrate_batch``) on all
four families.

Beyond-reference surface (the reference integrates one box per
``integrate(bounds=...)`` call — reference ``barycentric.py:2160-2275``).
Contract: exact agreement with the per-call ``integrate`` path, analytic
parity on closed-form boxes, zero-measure exactness, and the same
validation semantics as ``normalize_bounds``.
"""

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)


def _random_boxes(rng, domain, n):
    lo = np.stack([rng.uniform(a, b, n) for a, b in domain], axis=1)
    hi = np.stack([rng.uniform(a, b, n) for a, b in domain], axis=1)
    return np.stack([np.minimum(lo, hi), np.maximum(lo, hi)], axis=-1)


def _per_call(model, boxes):
    d = boxes.shape[1]
    return np.array([
        model.integrate(bounds=[tuple(boxes[b, k]) for k in range(d)])
        for b in range(boxes.shape[0])
    ])


DOM3 = [(-1.0, 2.0), (0.0, 1.5), (-2.0, 0.5)]


def _poly3(p, _=None):
    return np.sin(p[0]) + p[1] * p[2] + 0.3 * p[1] ** 2


@pytest.fixture(scope="module")
def dense3():
    ch = ChebyshevApproximation(_poly3, 3, DOM3, [9, 8, 7])
    ch.build(verbose=False)
    return ch


@pytest.fixture(scope="module")
def boxes3():
    return _random_boxes(np.random.default_rng(7), DOM3, 13)


class TestDense:
    def test_matches_per_call_integrate(self, dense3, boxes3):
        got = dense3.integrate_batch(boxes3)
        np.testing.assert_allclose(got, _per_call(dense3, boxes3),
                                   rtol=0, atol=1e-13)

    def test_full_domain_box_equals_integrate(self, dense3):
        box = np.array([[[a, b] for a, b in DOM3]])
        got = dense3.integrate_batch(box)
        assert got.shape == (1,)
        assert abs(got[0] - dense3.integrate()) < 1e-13

    def test_analytic_box(self):
        # f(x, y) = x * y over [a,b] x [c,d] = (b^2-a^2)(d^2-c^2)/4
        ch = ChebyshevApproximation(
            lambda p, _=None: p[0] * p[1], 2,
            [(-1.0, 1.0), (-1.0, 1.0)], [6, 6])
        ch.build(verbose=False)
        a, b, c, d = -0.4, 0.9, 0.1, 0.8
        got = ch.integrate_batch(np.array([[[a, b], [c, d]]]))[0]
        want = (b * b - a * a) * (d * d - c * c) / 4.0
        assert abs(got - want) < 1e-14

    def test_zero_measure_dim_is_exact_zero(self, dense3, boxes3):
        degenerate = boxes3.copy()
        degenerate[:, 1, 1] = degenerate[:, 1, 0]
        got = dense3.integrate_batch(degenerate)
        np.testing.assert_array_equal(got, np.zeros(len(got)))

    def test_empty_batch_returns_empty(self, dense3):
        out = dense3.integrate_batch(np.zeros((0, 3, 2)))
        assert out.shape == (0,)

    def test_1d_model(self):
        ch = ChebyshevApproximation(
            lambda p, _=None: p[0] ** 3, 1, [(-1.0, 2.0)], [7])
        ch.build(verbose=False)
        boxes = np.array([[[-0.5, 1.5]], [[0.0, 2.0]], [[1.0, 1.0]]])
        got = ch.integrate_batch(boxes)
        want = np.array([(1.5 ** 4 - 0.5 ** 4) / 4.0, 4.0, 0.0])
        np.testing.assert_allclose(got, want, atol=1e-13)

    def test_single_box_batch(self, dense3, boxes3):
        one = dense3.integrate_batch(boxes3[:1])
        assert one.shape == (1,)
        np.testing.assert_allclose(one, _per_call(dense3, boxes3[:1]),
                                   atol=1e-13)

    def test_large_batch_chunks(self, dense3):
        # Past the lax.map chunking threshold path (shape correctness).
        rng = np.random.default_rng(3)
        boxes = _random_boxes(rng, DOM3, 700)
        got = dense3.integrate_batch(boxes)
        assert got.shape == (700,)
        sample = [0, 123, 699]
        np.testing.assert_allclose(
            got[sample], _per_call(dense3, boxes[sample]), atol=1e-13)

    def test_additivity_split_box(self, dense3):
        # int over [lo, hi] = int over [lo, m] + int over [m, hi] in dim 0.
        full = np.array([[[-0.5, 1.5], [0.2, 1.0], [-1.0, 0.0]]])
        mid = 0.7
        left = full.copy()
        left[0, 0] = (-0.5, mid)
        right = full.copy()
        right[0, 0] = (mid, 1.5)
        stacked = np.concatenate([full, left, right])
        f, l, r = dense3.integrate_batch(stacked)
        assert abs(f - (l + r)) < 1e-13


class TestDenseValidation:
    def test_unbuilt_raises(self):
        ch = ChebyshevApproximation(_poly3, 3, DOM3, [5, 5, 5])
        with pytest.raises(RuntimeError, match="build"):
            ch.integrate_batch(np.zeros((1, 3, 2)))

    def test_wrong_shape_raises(self, dense3):
        with pytest.raises(ValueError, match="shape"):
            dense3.integrate_batch(np.zeros((4, 2)))
        with pytest.raises(ValueError, match="shape"):
            dense3.integrate_batch(np.zeros((4, 2, 2)))

    def test_inverted_bounds_raise(self, dense3, boxes3):
        bad = boxes3.copy()
        bad[2, 0] = (1.0, 0.5)
        with pytest.raises(ValueError, match="box 2, dim 0"):
            dense3.integrate_batch(bad)

    def test_out_of_domain_raises(self, dense3, boxes3):
        bad = boxes3.copy()
        bad[1, 2] = (-2.5, 0.0)
        with pytest.raises(ValueError, match="outside domain"):
            dense3.integrate_batch(bad)

    def test_non_finite_raises(self, dense3, boxes3):
        bad = boxes3.copy()
        bad[0, 0, 0] = np.nan
        with pytest.raises(ValueError, match="non-finite"):
            dense3.integrate_batch(bad)

    def test_domain_edge_slack_clamped(self, dense3):
        # 1e-15 representation noise at the edge is accepted and clamped.
        box = np.array([[[a - 1e-15, b + 1e-15] for a, b in DOM3]])
        got = dense3.integrate_batch(box)[0]
        assert abs(got - dense3.integrate()) < 1e-12


class TestTT:
    @pytest.fixture(scope="class")
    def tt3(self):
        tt = ChebyshevTT(_poly3, 3, DOM3, [9, 8, 7], max_rank=8)
        tt.build(verbose=False, seed=42)
        return tt

    def test_matches_per_call_integrate(self, tt3, boxes3):
        got = tt3.integrate_batch(boxes3)
        np.testing.assert_allclose(got, _per_call(tt3, boxes3), atol=1e-12)

    def test_matches_dense(self, tt3, dense3, boxes3):
        np.testing.assert_allclose(tt3.integrate_batch(boxes3),
                                   dense3.integrate_batch(boxes3),
                                   atol=1e-10)

    def test_reordered_user_frame(self, tt3, boxes3):
        # User-frame bounds give identical integrals after reorder.
        tt_r = tt3.reorder([2, 0, 1])
        np.testing.assert_allclose(tt_r.integrate_batch(boxes3),
                                   tt3.integrate_batch(boxes3), atol=1e-12)

    def test_zero_measure(self, tt3, boxes3):
        degenerate = boxes3.copy()
        degenerate[:, 0, 1] = degenerate[:, 0, 0]
        np.testing.assert_array_equal(
            tt3.integrate_batch(degenerate), np.zeros(len(boxes3)))

    def test_unbuilt_raises(self):
        tt = ChebyshevTT(_poly3, 3, DOM3, [5, 5, 5])
        with pytest.raises(RuntimeError):
            tt.integrate_batch(np.zeros((1, 3, 2)))

    def test_validation_user_frame_domain(self, tt3, boxes3):
        tt_r = tt3.reorder([2, 0, 1])
        bad = boxes3.copy()
        bad[0, 2] = (-2.5, 0.0)   # outside user dim 2's domain
        with pytest.raises(ValueError, match="dim 2"):
            tt_r.integrate_batch(bad)


class TestSlider:
    @pytest.fixture(scope="class")
    def slider3(self):
        sl = ChebyshevSlider(
            lambda p, _=None: np.sin(p[0]) + p[1] ** 2 + 0.5 * p[2],
            3, DOM3, [7, 7, 7], partition=[[0], [1, 2]],
            pivot_point=[0.0, 0.5, -0.5])
        sl.build(verbose=False)
        return sl

    def test_matches_per_call_integrate(self, slider3, boxes3):
        got = slider3.integrate_batch(boxes3)
        np.testing.assert_allclose(got, _per_call(slider3, boxes3),
                                   atol=1e-12)

    def test_matches_dense_on_additive(self, slider3, boxes3):
        dense = ChebyshevApproximation(
            lambda p, _=None: np.sin(p[0]) + p[1] ** 2 + 0.5 * p[2],
            3, DOM3, [7, 7, 7])
        dense.build(verbose=False)
        np.testing.assert_allclose(slider3.integrate_batch(boxes3),
                                   dense.integrate_batch(boxes3),
                                   atol=1e-10)

    def test_zero_measure(self, slider3, boxes3):
        degenerate = boxes3.copy()
        # Zero measure inside group 1 AND an off-group dim: both the
        # masked 0/0 branch and the vol=0 short circuit.
        degenerate[0, 1, 1] = degenerate[0, 1, 0]
        degenerate[1, 0, 1] = degenerate[1, 0, 0]
        got = slider3.integrate_batch(degenerate)
        assert got[0] == 0.0 and got[1] == 0.0
        assert np.isfinite(got).all()

    def test_unbuilt_raises(self):
        sl = ChebyshevSlider(
            lambda p, _=None: p[0] + p[1] + p[2], 3, DOM3, [5, 5, 5],
            partition=[[0], [1], [2]], pivot_point=[0.0, 0.5, -0.5])
        with pytest.raises(RuntimeError, match="build"):
            sl.integrate_batch(np.zeros((1, 3, 2)))


class TestSpline:
    SDOM = [(-1.0, 1.0), (0.0, 2.0)]

    @pytest.fixture(scope="class")
    def spline2(self):
        sp = ChebyshevSpline(
            lambda p, _=None: abs(p[0]) + p[1], 2, self.SDOM, [8, 8],
            knots=[[0.0], []])
        sp.build(verbose=False)
        return sp

    def test_matches_per_call_integrate(self, spline2):
        boxes = _random_boxes(np.random.default_rng(11), self.SDOM, 13)
        got = spline2.integrate_batch(boxes)
        np.testing.assert_allclose(got, _per_call(spline2, boxes),
                                   atol=1e-13)

    def test_box_straddles_knot_analytic(self, spline2):
        # int of |x| + y over [a,b] x [c,d] with a < 0 < b.
        a, b, c, d = -0.5, 0.75, 0.2, 1.7
        want = (0.5 * a * a + 0.5 * b * b) * (d - c) \
            + (b - a) * (d * d - c * c) / 2.0
        got = spline2.integrate_batch(np.array([[[a, b], [c, d]]]))[0]
        assert abs(got - want) < 1e-14

    def test_box_inside_one_piece(self, spline2):
        box = np.array([[[0.1, 0.9], [0.5, 1.5]]])
        got = spline2.integrate_batch(box)[0]
        want = spline2.integrate(bounds=[(0.1, 0.9), (0.5, 1.5)])
        assert abs(got - want) < 1e-14

    def test_zero_measure(self, spline2):
        box = np.array([[[0.3, 0.3], [0.5, 1.5]]])
        assert spline2.integrate_batch(box)[0] == 0.0

    def test_box_at_knot_boundary(self, spline2):
        # Bounds exactly at the knot: each side owns its half-box.
        left = np.array([[[-1.0, 0.0], [0.0, 2.0]]])
        right = np.array([[[0.0, 1.0], [0.0, 2.0]]])
        total = (spline2.integrate_batch(left)[0]
                 + spline2.integrate_batch(right)[0])
        assert abs(total - spline2.integrate()) < 1e-13

    def test_unbuilt_raises(self):
        sp = ChebyshevSpline(
            lambda p, _=None: abs(p[0]) + p[1], 2, self.SDOM, [6, 6],
            knots=[[0.0], []])
        with pytest.raises(RuntimeError, match="build"):
            sp.integrate_batch(np.zeros((1, 2, 2)))


class TestCrossFamily:
    def test_all_four_agree(self, dense3, boxes3):
        """Dense / TT / slider-of-additive / spline-of-smooth on one f."""
        def f_add(p, _=None):
            return np.sin(p[0]) + p[1] ** 2 + 0.5 * p[2]

        dense = ChebyshevApproximation(f_add, 3, DOM3, [9, 9, 9])
        dense.build(verbose=False)
        tt = ChebyshevTT(f_add, 3, DOM3, [9, 9, 9], max_rank=6,
                         tolerance=1e-12)
        tt.build(verbose=False, seed=1)
        slider = ChebyshevSlider(f_add, 3, DOM3, [9, 9, 9],
                                 partition=[[0], [1], [2]],
                                 pivot_point=[0.0, 0.5, -0.5])
        slider.build(verbose=False)
        spline = ChebyshevSpline(f_add, 3, DOM3, [9, 9, 9],
                                 knots=[[0.5], [], []])
        spline.build(verbose=False)

        base = dense.integrate_batch(boxes3)
        # Families build DIFFERENT approximants of f (9-node sin over a
        # width-3 domain interpolates at ~1e-8); compare at that level.
        for other in (tt, slider, spline):
            np.testing.assert_allclose(other.integrate_batch(boxes3),
                                       base, atol=1e-7)

    def test_f32_tier_all_families(self, dense3, boxes3):
        """dtype=jnp.float32 agrees with f64 at the f32 quadrature
        level (~1e-6 relative) on every family."""
        import jax.numpy as jnp

        f64 = dense3.integrate_batch(boxes3)
        scale = np.abs(f64).max()
        for model in (dense3,):
            f32 = model.integrate_batch(boxes3, dtype=jnp.float32)
            assert np.abs(f32 - f64).max() / scale < 1e-5
        tt = ChebyshevTT(_poly3, 3, DOM3, [9, 8, 7], max_rank=8,
                         tolerance=1e-12)
        tt.build(verbose=False, seed=11)
        assert np.abs(tt.integrate_batch(boxes3, dtype=jnp.float32)
                      - f64).max() / scale < 1e-4
        slider = ChebyshevSlider(
            lambda p, _=None: np.sin(p[0]) + p[1] ** 2 + 0.5 * p[2],
            3, DOM3, [7, 7, 7], partition=[[0], [1, 2]],
            pivot_point=[0.0, 0.5, -0.5])
        slider.build(verbose=False)
        s64 = slider.integrate_batch(boxes3)
        s32 = slider.integrate_batch(boxes3, dtype=jnp.float32)
        assert np.abs(s32 - s64).max() / max(np.abs(s64).max(), 1) < 1e-5
        spline = ChebyshevSpline(
            lambda p, _=None: abs(p[0]) + p[1] + p[2], 3, DOM3,
            [8, 8, 8], knots=[[0.5], [], []])
        spline.build(verbose=False)
        p64 = spline.integrate_batch(boxes3)
        p32 = spline.integrate_batch(boxes3, dtype=jnp.float32)
        assert np.abs(p32 - p64).max() / max(np.abs(p64).max(), 1) < 1e-5

    def test_dd_tier_near_f64(self, cheb_bs5d):
        rng = np.random.default_rng(9)
        dom = np.asarray(cheb_bs5d.domain, dtype=np.float64)
        lo = rng.uniform(dom[:, 0], dom[:, 1], (48, 5))
        hi = lo + (dom[:, 1] - lo) * rng.uniform(0, 1, (48, 5))
        boxes = np.stack([lo, hi], axis=-1)
        # Adversarial shapes: full-domain box + edge slivers + zero
        # measure (the digit planes' |q| <= 1 contract must hold).
        boxes[0] = dom
        boxes[1, :, 0] = dom[:, 0]
        boxes[1, :, 1] = dom[:, 0] + 1e-6 * (dom[:, 1] - dom[:, 0])
        boxes[2, 3, 1] = boxes[2, 3, 0]
        f64 = cheb_bs5d.integrate_batch(boxes)
        dd = cheb_bs5d.integrate_batch(boxes, dtype="dd")
        scale = max(1.0, np.abs(f64).max())
        assert np.abs(dd - f64).max() / scale < 1e-10
        assert dd[2] == 0.0

    def test_dd_falls_back_outside_budget(self):
        # 1-D grids are outside the digit plan; dtype='dd' must answer
        # through the f64 path (class eval_batch_dd contract).
        ch = ChebyshevApproximation(
            lambda p, _=None: p[0] ** 3, 1, [(-1.0, 2.0)], [7])
        ch.build(verbose=False)
        boxes = np.array([[[-0.5, 1.5]], [[0.0, 2.0]]])
        np.testing.assert_array_equal(
            ch.integrate_batch(boxes, dtype="dd"),
            ch.integrate_batch(boxes))

    def test_f32_zero_measure_still_exact(self, dense3, boxes3):
        import jax.numpy as jnp
        degenerate = boxes3.copy()
        degenerate[:, 0, 1] = degenerate[:, 0, 0]
        got = dense3.integrate_batch(degenerate, dtype=jnp.float32)
        np.testing.assert_array_equal(got, np.zeros(len(got)))

    def test_integrate_book_matches_per_model(self, dense3, boxes3):
        from pychebyshev_tpu.serving import integrate_book
        second = dense3 * 2.0
        third = dense3 + dense3
        out = integrate_book([dense3, second, third], boxes3)
        assert out.shape == (3, len(boxes3))
        base = dense3.integrate_batch(boxes3)
        np.testing.assert_allclose(out[0], base, atol=1e-13)
        np.testing.assert_allclose(out[1], 2.0 * base, atol=1e-12)
        np.testing.assert_allclose(out[2], 2.0 * base, atol=1e-12)

    def test_integrate_book_f32_tier(self, dense3, boxes3):
        import jax.numpy as jnp
        from pychebyshev_tpu.serving import integrate_book
        f64 = integrate_book([dense3], boxes3)
        f32 = integrate_book([dense3], boxes3, dtype=jnp.float32)
        assert np.abs(f32 - f64).max() / max(np.abs(f64).max(), 1) < 1e-5

    def test_integrate_book_validation(self, dense3, boxes3):
        from pychebyshev_tpu.serving import integrate_book
        with pytest.raises(ValueError, match="non-empty"):
            integrate_book([], boxes3)
        other = ChebyshevApproximation(_poly3, 3, DOM3, [5, 5, 5])
        other.build(verbose=False)
        with pytest.raises(ValueError, match="shares one grid"):
            integrate_book([dense3, other], boxes3)
        unbuilt = ChebyshevApproximation(_poly3, 3, DOM3, [9, 8, 7])
        with pytest.raises(RuntimeError, match="built"):
            integrate_book([unbuilt], boxes3)

    def test_bs5d_bucket_probabilities_shape(self, cheb_bs5d):
        rng = np.random.default_rng(5)
        dom = cheb_bs5d.domain
        boxes = _random_boxes(rng, dom, 32)
        got = cheb_bs5d.integrate_batch(boxes)
        assert got.shape == (32,)
        sample = [0, 31]
        np.testing.assert_allclose(
            got[sample], _per_call(cheb_bs5d, boxes[sample]),
            rtol=1e-12, atol=1e-10)
