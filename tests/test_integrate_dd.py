"""dd tier for batched scenario calculus (round 5).

The near-f64 digit-GEMM machinery extended to the bucket-mass /
conditional-expectation workflow: mixed quadrature x barycentric rows
through the dense dd ladder (``ops.integrate.
partial_integrate_eval_batch_dd``), and moment rows through the grouped
TT dd chain (``tt_integrate_box_batch_dd`` /
``tt_partial_integrate_eval_batch_dd``).  Parity contract: <= 1e-11
scale-normalized deviation from the f64 paths on the 5-D benchmark
grids, on every family that routes here (dense, TT, spline, slider).
"""

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
)
from pychebyshev_tpu.ops import integrate as integrate_ops

DOMAIN = [[80.0, 120.0], [90.0, 110.0], [0.25, 2.0], [0.1, 0.5],
          [0.01, 0.05]]


def _bs(points, _data=None):
    from tests.conftest import bs_price_vectorized
    return bs_price_vectorized(points)


@pytest.fixture(scope="module")
def dense5d():
    c = ChebyshevApproximation(_bs, 5, DOMAIN, n_nodes=[11] * 5,
                               vectorized=True)
    c.build(verbose=False)
    return c


@pytest.fixture(scope="module")
def tt5d(dense5d):
    return dense5d.to_tt(tolerance=1e-13)


@pytest.fixture(scope="module")
def scenarios():
    rng = np.random.default_rng(17)
    B = 513                                  # odd: exercises padding
    lo = np.array([b[0] for b in DOMAIN])
    hi = np.array([b[1] for b in DOMAIN])
    a = lo + (hi - lo) * rng.uniform(0.0, 0.5, (B, 5))
    b = a + (hi - lo) * rng.uniform(0.05, 0.5, (B, 5))
    b = np.minimum(b, hi)
    boxes = np.stack([a, b], axis=-1)
    boxes[3, 1, 1] = boxes[3, 1, 0]          # one degenerate interval
    pts = lo + (hi - lo) * rng.uniform(0.05, 0.95, (B, 5))
    return boxes, pts


def _dev(a, b):
    return np.abs(np.asarray(a) - np.asarray(b)).max() \
        / max(np.abs(np.asarray(b)).max(), 1e-300)


class TestDensePartialDD:
    def test_value_parity(self, dense5d, scenarios):
        boxes, pts = scenarios
        sub = boxes[:, [0, 2], :]
        p = pts[:, [1, 3, 4]]
        ref = dense5d.partial_integrate_batch([0, 2], sub, p)
        got = dense5d.partial_integrate_batch([0, 2], sub, p,
                                              dtype="dd")
        assert _dev(got, ref) < 5e-11

    def test_derivative_parity(self, dense5d, scenarios):
        boxes, pts = scenarios
        sub = boxes[:, [0, 2], :]
        p = pts[:, [1, 3, 4]]
        ref = dense5d.partial_integrate_batch(
            [0, 2], sub, p, derivative_order=[1, 0, 2])
        got = dense5d.partial_integrate_batch(
            [0, 2], sub, p, derivative_order=[1, 0, 2], dtype="dd")
        assert _dev(got, ref) < 1e-10

    def test_all_dims_integrated(self, dense5d, scenarios):
        boxes, _ = scenarios
        ref = dense5d.integrate_batch(boxes)
        got = dense5d.partial_integrate_batch(
            [0, 1, 2, 3, 4], boxes, np.zeros((boxes.shape[0], 0)),
            dtype="dd")
        assert _dev(got, ref) < 5e-11

    def test_degenerate_box_is_exact_zero(self, dense5d):
        sub = np.array([[[90.0, 90.0], [0.5, 0.5]]])
        got = dense5d.partial_integrate_batch(
            [0, 2], sub, np.array([[100.0, 0.3, 0.03]]), dtype="dd")
        assert got[0] == 0.0

    def test_orders_on_int_dims_raise(self, dense5d, scenarios):
        boxes, pts = scenarios
        with pytest.raises(ValueError, match="integrated dims"):
            integrate_ops.partial_integrate_eval_batch_dd(
                dense5d.tensor_values, np.asarray(DOMAIN, float),
                dense5d.nodes, dense5d.weights, dense5d.diff_matrices,
                (0, 2), boxes[:4, [0, 2], :], pts[:4, [1, 3, 4]],
                orders=(1, 0, 0, 0, 0))

    def test_outside_budget_falls_back(self, scenarios):
        # 2-D grid with a huge right group is outside the digit plan;
        # the class path must silently serve f64.
        c = ChebyshevApproximation(
            lambda p, _=None: np.sin(p[..., 0]) + p[..., 1],
            2, [[0.0, 1.0], [0.0, 1.0]], n_nodes=[4, 17000],
            vectorized=True)
        c.build(verbose=False)
        sub = np.array([[[0.1, 0.6]]])
        ref = c.partial_integrate_batch([0], sub, np.array([[0.5]]))
        got = c.partial_integrate_batch([0], sub, np.array([[0.5]]),
                                        dtype="dd")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-12)


class TestTTIntegrateDD:
    def test_box_parity_groups(self, tt5d, scenarios):
        boxes, _ = scenarios
        ref = tt5d.integrate_batch(boxes)
        cores = tt5d._cores_on_device(np.float64)
        dom = np.asarray(DOMAIN, float)
        for groups in (None, "auto", (2, 2, 1), (3, 2)):
            got = integrate_ops.tt_integrate_box_batch_dd(
                cores, dom, boxes, groups=groups)
            assert _dev(got, ref) < 3e-11, groups

    def test_class_route(self, tt5d, scenarios):
        boxes, _ = scenarios
        ref = tt5d.integrate_batch(boxes)
        got = tt5d.integrate_batch(boxes, dtype="dd")
        assert _dev(got, ref) < 3e-11

    def test_partial_parity(self, tt5d, scenarios):
        boxes, pts = scenarios
        sub = boxes[:, [0, 2], :]
        p = pts[:, [1, 3, 4]]
        ref = tt5d.partial_integrate_batch([0, 2], sub, p)
        got = tt5d.partial_integrate_batch([0, 2], sub, p, dtype="dd")
        assert _dev(got, ref) < 3e-11

    def test_partial_parity_reordered(self, tt5d, scenarios):
        # The storage-frame mapping must hold under a dim reorder.
        boxes, pts = scenarios
        r = tt5d.reorder([2, 0, 4, 1, 3])
        sub = boxes[:, [0, 2], :]
        p = pts[:, [1, 3, 4]]
        ref = r.partial_integrate_batch([0, 2], sub, p)
        got = r.partial_integrate_batch([0, 2], sub, p, dtype="dd")
        assert _dev(got, ref) < 3e-11
        ref0 = tt5d.partial_integrate_batch([0, 2], sub, p)
        assert _dev(ref, ref0) < 1e-10

    def test_degenerate_box_zero(self, tt5d):
        boxes = np.array([[[90.0, 90.0], [95.0, 105.0], [0.5, 1.5],
                           [0.2, 0.4], [0.02, 0.04]]])
        got = tt5d.integrate_batch(boxes, dtype="dd")
        assert got[0] == 0.0

    def test_plane_cache_shared_with_eval(self, tt5d, scenarios):
        # Bucket masses and evals must hold ONE set of prepared core
        # planes: the integrate path hits the cache the eval path
        # warmed (CLAUDE.md: one home for the dd machinery).
        from pychebyshev_tpu.ops import tt_eval_dd as ttdd
        boxes, pts = scenarios
        tt5d.eval_batch_dd(pts[:8])          # warms the grouped cache
        before = len(ttdd._grouped_plane_cache)
        tt5d.integrate_batch(boxes[:8], dtype="dd")
        assert len(ttdd._grouped_plane_cache) == before

    def test_bad_groups_raise(self, tt5d, scenarios):
        boxes, _ = scenarios
        cores = tt5d._cores_on_device(np.float64)
        with pytest.raises(ValueError, match="groups"):
            integrate_ops.tt_integrate_box_batch_dd(
                cores, np.asarray(DOMAIN, float), boxes,
                groups=(2, 2))


class TestSplineSliderRouting:
    def test_spline_partial_dd(self, scenarios):
        sp = ChebyshevSpline(_bs, 5, DOMAIN, n_nodes=[7] * 5,
                             knots=[[100.0], [], [], [], []],
                             vectorized=True)
        sp.build(verbose=False)
        boxes, pts = scenarios
        sub = boxes[:64, [0, 2], :]
        p = pts[:64, [1, 3, 4]]
        ref = sp.partial_integrate_batch([0, 2], sub, p)
        got = sp.partial_integrate_batch([0, 2], sub, p, dtype="dd")
        assert _dev(got, ref) < 1e-10

    def test_slider_partial_dd(self, scenarios):
        sl = ChebyshevSlider(_bs, 5, DOMAIN, [7] * 5,
                             [[0, 1], [2], [3, 4]],
                             [100.0, 100.0, 1.0, 0.3, 0.03],
                             vectorized=True)
        sl.build(verbose=False)
        boxes, pts = scenarios
        sub = boxes[:64, [0, 2], :]
        p = pts[:64, [1, 3, 4]]
        ref = sl.partial_integrate_batch([0, 2], sub, p)
        got = sl.partial_integrate_batch([0, 2], sub, p, dtype="dd")
        assert _dev(got, ref) < 1e-10


class TestMeshDD:
    def test_tt_integrate_dd_dp_matches(self, tt5d, scenarios):
        from pychebyshev_tpu.parallel.sharding import (
            make_mesh,
            tt_integrate_box_batch_dd_dp,
        )
        boxes, _ = scenarios
        mesh = make_mesh(8)
        cores = tt5d._cores_on_device(np.float64)
        dom = np.asarray(DOMAIN, float)
        ref = integrate_ops.tt_integrate_box_batch_dd(
            cores, dom, boxes, groups="auto")
        got = tt_integrate_box_batch_dd_dp(cores, dom, boxes, mesh)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestBookDD:
    def test_integrate_book_dd_parity(self, dense5d, scenarios):
        from pychebyshev_tpu.serving import integrate_book
        boxes, _ = scenarios
        b2 = dense5d * 1.1
        ref = integrate_book([dense5d, b2], boxes[:128])
        got = integrate_book([dense5d, b2], boxes[:128], dtype="dd")
        assert got.shape == ref.shape == (2, 128)
        assert _dev(got, ref) < 5e-11

    def test_ops_level_models_dd(self, dense5d, scenarios):
        boxes, _ = scenarios
        ts = (dense5d.tensor_values, dense5d.tensor_values * 2.0)
        ref = np.asarray(integrate_ops.integrate_box_batch_models(
            ts, np.asarray(DOMAIN, float), boxes[:64]))
        got = np.asarray(integrate_ops.integrate_box_batch_models_dd(
            ts, np.asarray(DOMAIN, float), boxes[:64]))
        assert _dev(got, ref) < 5e-11
        with pytest.raises(ValueError, match="non-empty"):
            integrate_ops.integrate_box_batch_models_dd(
                (), np.asarray(DOMAIN, float), boxes[:4])
