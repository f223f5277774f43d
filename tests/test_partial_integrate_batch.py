"""Batched conditional expectations (``partial_integrate_batch``).

Beyond-reference surface: per scenario b, equals
``integrate(dims, bounds=bounds[b]).eval(points[b], orders)`` without
materializing B intermediate objects — mixed quadrature x barycentric
rows through the shared bilinear/chain kernels (``ops/integrate.py``).
"""

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)

DOM = [(-1.0, 2.0), (0.0, 1.5), (-2.0, 0.5)]
B = 9


def _f(p, _=None):
    return np.sin(p[0]) + p[1] * p[2] + 0.3 * p[1] ** 2


@pytest.fixture(scope="module")
def scen():
    rng = np.random.default_rng(3)
    lo = rng.uniform(-1.0, 1.0, B)
    boxes = np.stack([lo, lo + rng.uniform(0.05, 1.0, B)],
                     axis=-1)[:, None, :]            # (B, 1, 2), dim 0
    pts = np.stack([rng.uniform(0, 1.5, B),
                    rng.uniform(-2, 0.5, B)], axis=1)
    return boxes, pts


@pytest.fixture(scope="module")
def dense():
    ch = ChebyshevApproximation(_f, 3, DOM, [9, 8, 7])
    ch.build(verbose=False)
    return ch


def _per_call(model, dims, boxes, pts, orders=None):
    out = []
    for b in range(boxes.shape[0]):
        obj = model.integrate(
            dims=dims, bounds=[tuple(boxes[b, i])
                               for i in range(boxes.shape[1])])
        if orders is None:
            try:
                out.append(obj.eval(list(pts[b]),
                                    [0] * pts.shape[1]))
            except TypeError:
                out.append(obj.eval(list(pts[b])))
        else:
            out.append(obj.eval(list(pts[b]), list(orders)))
    return np.array(out)


class TestDense:
    def test_value_matches_per_call(self, dense, scen):
        boxes, pts = scen
        got = dense.partial_integrate_batch([0], boxes, pts)
        np.testing.assert_allclose(
            got, _per_call(dense, [0], boxes, pts), atol=1e-13)

    def test_derivative_matches_per_call(self, dense, scen):
        boxes, pts = scen
        got = dense.partial_integrate_batch([0], boxes, pts,
                                            derivative_order=[1, 0])
        np.testing.assert_allclose(
            got, _per_call(dense, [0], boxes, pts, orders=[1, 0]),
            atol=1e-12)

    def test_two_integrated_dims(self, dense, scen):
        rng = np.random.default_rng(5)
        b2 = np.stack([
            np.stack([rng.uniform(-1, 0.5, B),
                      rng.uniform(0.6, 2.0, B)], -1),
            np.stack([rng.uniform(0, 0.7, B),
                      rng.uniform(0.8, 1.5, B)], -1)], axis=1)
        p2 = rng.uniform(-2, 0.5, (B, 1))
        got = dense.partial_integrate_batch([0, 1], b2, p2)
        np.testing.assert_allclose(
            got, _per_call(dense, [0, 1], b2, p2), atol=1e-13)

    def test_all_dims_equals_integrate_batch(self, dense):
        rng = np.random.default_rng(7)
        lo = np.stack([rng.uniform(a, b, B) for a, b in DOM], 1)
        hi = lo + (np.array([b for _, b in DOM]) - lo) \
            * rng.uniform(0, 1, (B, 3))
        boxes = np.stack([lo, hi], axis=-1)
        got = dense.partial_integrate_batch([0, 1, 2], boxes,
                                            np.zeros((B, 0)))
        np.testing.assert_allclose(got, dense.integrate_batch(boxes),
                                   atol=1e-13)

    def test_analytic_conditional(self):
        # f = x*y: int_a^b x dx * y = (b^2-a^2)/2 * y.
        ch = ChebyshevApproximation(
            lambda p, _=None: p[0] * p[1], 2,
            [(-1.0, 1.0), (-1.0, 1.0)], [6, 6])
        ch.build(verbose=False)
        boxes = np.array([[[-0.2, 0.9]], [[0.0, 1.0]]])
        pts = np.array([[0.7], [-0.4]])
        got = ch.partial_integrate_batch([0], boxes, pts)
        want = (boxes[:, 0, 1] ** 2 - boxes[:, 0, 0] ** 2) / 2 \
            * pts[:, 0]
        np.testing.assert_allclose(got, want, atol=1e-14)

    def test_zero_measure_box_exact_zero(self, dense, scen):
        boxes, pts = scen
        degenerate = boxes.copy()
        degenerate[:, 0, 1] = degenerate[:, 0, 0]
        got = dense.partial_integrate_batch([0], degenerate, pts)
        np.testing.assert_array_equal(got, np.zeros(B))

    def test_f32_tier(self, dense, scen):
        import jax.numpy as jnp
        boxes, pts = scen
        f64 = dense.partial_integrate_batch([0], boxes, pts)
        f32 = dense.partial_integrate_batch([0], boxes, pts,
                                            dtype=jnp.float32)
        assert np.abs(f32 - f64).max() / max(np.abs(f64).max(), 1) < 1e-5

    def test_validation(self, dense, scen):
        boxes, pts = scen
        with pytest.raises(RuntimeError, match="build"):
            ChebyshevApproximation(_f, 3, DOM, [5, 5, 5]) \
                .partial_integrate_batch([0], boxes, pts)
        with pytest.raises(ValueError, match="at least one"):
            dense.partial_integrate_batch([], boxes, pts)
        with pytest.raises(ValueError, match="out of range"):
            dense.partial_integrate_batch([5], boxes, pts)
        with pytest.raises(ValueError, match="points must have shape"):
            dense.partial_integrate_batch([0], boxes, pts[:, :1])
        with pytest.raises(ValueError, match="one entry per remaining"):
            dense.partial_integrate_batch([0], boxes, pts,
                                          derivative_order=[1])
        with pytest.raises(ValueError, match="outside"):
            dense.partial_integrate_batch(
                [0], boxes, pts, derivative_order=[9, 0])


class TestTT:
    @pytest.fixture(scope="class")
    def tt(self):
        m = ChebyshevTT(_f, 3, DOM, [9, 8, 7], max_rank=8,
                        tolerance=1e-12)
        m.build(verbose=False, seed=2)
        return m

    def test_value_matches_per_call(self, tt, scen):
        boxes, pts = scen
        got = tt.partial_integrate_batch([0], boxes, pts)
        np.testing.assert_allclose(
            got, _per_call(tt, [0], boxes, pts), atol=1e-12)

    def test_reordered_user_frame(self, tt, scen):
        boxes, pts = scen
        tt_r = tt.reorder([2, 0, 1])
        np.testing.assert_allclose(
            tt_r.partial_integrate_batch([0], boxes, pts),
            tt.partial_integrate_batch([0], boxes, pts), atol=1e-12)

    def test_matches_dense(self, tt, dense, scen):
        boxes, pts = scen
        np.testing.assert_allclose(
            tt.partial_integrate_batch([0], boxes, pts),
            dense.partial_integrate_batch([0], boxes, pts), atol=1e-9)


class TestSlider:
    @pytest.fixture(scope="class")
    def slider(self):
        sl = ChebyshevSlider(
            lambda p, _=None: np.sin(p[0]) + p[1] ** 2
            + 0.5 * p[1] * p[2],
            3, DOM, [9, 8, 7], partition=[[0], [1, 2]],
            pivot_point=[0.0, 0.5, -0.5])
        sl.build(verbose=False)
        return sl

    def test_value_matches_per_call(self, slider, scen):
        boxes, pts = scen
        got = slider.partial_integrate_batch([0], boxes, pts)
        np.testing.assert_allclose(
            got, _per_call(slider, [0], boxes, pts), atol=1e-12)

    def test_derivative_routes_to_owning_slide(self, slider, scen):
        boxes, pts = scen
        got = slider.partial_integrate_batch([0], boxes, pts,
                                             derivative_order=[1, 0])
        np.testing.assert_allclose(
            got, _per_call(slider, [0], boxes, pts, orders=[1, 0]),
            atol=1e-12)

    def test_partial_group_integration(self, slider):
        rng = np.random.default_rng(11)
        b2 = np.stack([rng.uniform(0, 0.6, B),
                       rng.uniform(0.7, 1.5, B)], -1)[:, None, :]
        p2 = np.stack([rng.uniform(-1, 2, B),
                       rng.uniform(-2, 0.5, B)], 1)
        got = slider.partial_integrate_batch([1], b2, p2)
        np.testing.assert_allclose(
            got, _per_call(slider, [1], b2, p2), atol=1e-12)

    def test_cross_group_mixed_partial_is_zero(self, slider):
        rng = np.random.default_rng(13)
        b2 = np.stack([rng.uniform(0, 0.6, B),
                       rng.uniform(0.7, 1.5, B)], -1)[:, None, :]
        p2 = np.stack([rng.uniform(-1, 2, B),
                       rng.uniform(-2, 0.5, B)], 1)
        got = slider.partial_integrate_batch(
            [1], b2, p2, derivative_order=[1, 1])
        np.testing.assert_array_equal(got, np.zeros(B))


class TestSpline:
    @pytest.fixture(scope="class")
    def spline(self):
        sp = ChebyshevSpline(
            lambda p, _=None: abs(p[0]) + p[1] * p[2], 3, DOM,
            [9, 8, 7], knots=[[0.0], [], []])
        sp.build(verbose=False)
        return sp

    def test_integral_spans_knot(self, spline, scen):
        boxes, pts = scen
        got = spline.partial_integrate_batch([0], boxes, pts)
        np.testing.assert_allclose(
            got, _per_call(spline, [0], boxes, pts), atol=1e-12)

    def test_eval_dims_route_pieces(self, spline):
        rng = np.random.default_rng(17)
        b2 = np.stack([rng.uniform(0, 0.6, B),
                       rng.uniform(0.7, 1.5, B)], -1)[:, None, :]
        p2 = np.stack([rng.uniform(-1, 2, B),
                       rng.uniform(-2, 0.5, B)], 1)
        got = spline.partial_integrate_batch([1], b2, p2)
        np.testing.assert_allclose(
            got, _per_call(spline, [1], b2, p2), atol=1e-12)

    def test_derivative_on_routed_dim(self, spline):
        rng = np.random.default_rng(19)
        b2 = np.stack([rng.uniform(0, 0.6, B),
                       rng.uniform(0.7, 1.5, B)], -1)[:, None, :]
        # keep eval dim 0 away from the knot (one-sided semantics)
        p0 = np.where(rng.uniform(-1, 2, B) >= 0,
                      rng.uniform(0.1, 2, B), rng.uniform(-1, -0.1, B))
        p2 = np.stack([p0, rng.uniform(-2, 0.5, B)], 1)
        got = spline.partial_integrate_batch(
            [1], b2, p2, derivative_order=[1, 0])
        np.testing.assert_allclose(
            got, _per_call(spline, [1], b2, p2, orders=[1, 0]),
            atol=1e-12)


class TestCrossFamily:
    def test_all_four_agree(self, scen):
        boxes, pts = scen

        def f_add(p, _=None):
            return np.sin(p[0]) + p[1] ** 2 + 0.5 * p[2]

        dense = ChebyshevApproximation(f_add, 3, DOM, [9, 9, 9])
        dense.build(verbose=False)
        tt = ChebyshevTT(f_add, 3, DOM, [9, 9, 9], max_rank=6,
                         tolerance=1e-12)
        tt.build(verbose=False, seed=1)
        slider = ChebyshevSlider(f_add, 3, DOM, [9, 9, 9],
                                 partition=[[0], [1], [2]],
                                 pivot_point=[0.0, 0.5, -0.5])
        slider.build(verbose=False)
        spline = ChebyshevSpline(f_add, 3, DOM, [9, 9, 9],
                                 knots=[[0.5], [], []])
        spline.build(verbose=False)
        base = dense.partial_integrate_batch([0], boxes, pts)
        for other in (tt, slider, spline):
            np.testing.assert_allclose(
                other.partial_integrate_batch([0], boxes, pts), base,
                atol=1e-7)
