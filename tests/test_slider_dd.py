"""Slider digit-GEMM tier (ops/slider_eval.py::slider_batch_dd).

The additive slider sum collapses into one concatenated-row digit-GEMM;
these tests pin its parity against the f64 additive path, the
derivative routing semantics, the plan budget, and the serving engine
integration.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from pychebyshev_tpu import ChebyshevSlider
from pychebyshev_tpu.ops.slider_eval import (
    slider_batch_dd,
    slider_dd_plan,
    slider_value_batch,
)
from pychebyshev_tpu.serving import BatchedEvaluator

D = 6
W = np.linspace(0.5, 1.5, D)


def basket(p, _=None):
    p = np.asarray(p, dtype=np.float64)
    return np.sum(W * np.sin(p), axis=1) + 0.25 * np.sum(p ** 2, axis=1)


@pytest.fixture(scope="module")
def slider6():
    # Mixed partition: one 2-dim group + singletons.
    sl = ChebyshevSlider(basket, D, [[-1, 1]] * D, [9] * D,
                         [[0, 1], [2], [3], [4], [5]], [0.0] * D,
                         vectorized=True)
    sl.build(verbose=False)
    return sl


@pytest.fixture(scope="module")
def pts6():
    return np.random.default_rng(0).uniform(-1, 1, (512, D))


def _slide_data(sl):
    return tuple((s.tensor_values,) + s._grid_tuples()
                 for s in sl.slides)


class TestOpsParity:
    def test_value_matches_f64_sum(self, slider6, pts6):
        data = _slide_data(slider6)
        groups = tuple(tuple(g) for g in slider6.partition)
        ref = np.asarray(slider_value_batch(
            data, slider6.pivot_value, groups, jnp.asarray(pts6)))
        got = np.asarray(slider_batch_dd(
            data, slider6.pivot_value, groups, pts6))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10

    def test_singleton_group_derivative(self, slider6, pts6):
        data = _slide_data(slider6)
        groups = tuple(tuple(g) for g in slider6.partition)
        o = [0, 0, 1, 0, 0, 0]
        ref = slider6.eval_batch(pts6, o)
        got = np.asarray(slider_batch_dd(
            data, slider6.pivot_value, groups, pts6, orders=o))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10

    def test_multi_dim_group_mixed_partial(self, slider6, pts6):
        data = _slide_data(slider6)
        groups = tuple(tuple(g) for g in slider6.partition)
        o = [1, 1, 0, 0, 0, 0]            # both dims of group [0, 1]
        ref = slider6.eval_batch(pts6, o)
        got = np.asarray(slider_batch_dd(
            data, slider6.pivot_value, groups, pts6, orders=o))
        scale = max(np.abs(ref).max(), 1e-3)
        assert np.abs(got - ref).max() / scale < 1e-9

    def test_cross_group_partial_is_exact_zero(self, slider6, pts6):
        data = _slide_data(slider6)
        groups = tuple(tuple(g) for g in slider6.partition)
        got = np.asarray(slider_batch_dd(
            data, slider6.pivot_value, groups, pts6,
            orders=[1, 0, 1, 0, 0, 0]))
        assert np.all(got == 0.0)


class TestPlan:
    def test_plan_ok_for_reference_shapes(self):
        assert slider_dd_plan([(9,)] * 10)["ok"]
        assert slider_dd_plan([(9, 9), (9,), (9,)])["ok"]

    def test_plan_rejects_wide_groups(self):
        assert not slider_dd_plan([(5, 5, 5, 5)])["ok"]

    def test_plan_rejects_huge_total_width(self):
        assert not slider_dd_plan([(1 << 12,)] * 16)["ok"]

    def test_ops_raises_outside_budget(self):
        data = ((np.zeros((5, 5, 5, 5)), (), (), ()),)
        with pytest.raises(ValueError, match="digit-GEMM budget"):
            slider_batch_dd(data, 0.0, ((0, 1, 2, 3),),
                            np.zeros((4, 4)))


class TestClassSurface:
    def test_matches_eval_batch(self, slider6, pts6):
        ref = slider6.eval_batch(pts6)
        got = slider6.eval_batch_dd(pts6)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10

    def test_fast_mode(self, slider6, pts6):
        ref = slider6.eval_batch(pts6)
        got = slider6.eval_batch_dd(pts6, mode="fast")
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-7

    def test_bad_mode_rejected(self, slider6, pts6):
        with pytest.raises(ValueError, match="mode"):
            slider6.eval_batch_dd(pts6, mode="warp")

    def test_unbuilt_raises(self):
        sl = ChebyshevSlider(basket, D, [[-1, 1]] * D, [9] * D,
                             [[i] for i in range(D)], [0.0] * D)
        with pytest.raises(RuntimeError, match="build"):
            sl.eval_batch_dd(np.zeros((2, D)))

    def test_wide_group_falls_back_to_f64(self, pts6):
        sl = ChebyshevSlider(basket, D, [[-1, 1]] * D, [5] * D,
                             [[0, 1, 2, 3], [4], [5]], [0.0] * D,
                             vectorized=True)
        sl.build(verbose=False)
        got = sl.eval_batch_dd(pts6)          # plan not ok -> f64 path
        ref = sl.eval_batch(pts6)
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)


class TestServing:
    def test_value_engine(self, slider6, pts6):
        eng = BatchedEvaluator(slider6, dtype="dd", bucket_sizes=(256,))
        got = eng(pts6)
        ref = slider6.eval_batch(pts6)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10

    def test_derivative_engine(self, slider6, pts6):
        eng = BatchedEvaluator(slider6, dtype="dd",
                               derivative_order=(0, 0, 0, 1, 0, 0),
                               bucket_sizes=(256,))
        got = eng(pts6)
        ref = slider6.eval_batch(pts6, [0, 0, 0, 1, 0, 0])
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10

    def test_cross_group_engine_serves_zeros(self, slider6, pts6):
        eng = BatchedEvaluator(slider6, dtype="dd",
                               derivative_order=(1, 0, 1, 0, 0, 0),
                               bucket_sizes=(256,))
        assert np.all(eng(pts6) == 0.0)

    def test_wide_group_slider_rejected(self):
        sl = ChebyshevSlider(basket, D, [[-1, 1]] * D, [5] * D,
                             [[0, 1, 2, 3], [4], [5]], [0.0] * D,
                             vectorized=True)
        sl.build(verbose=False)
        with pytest.raises(ValueError, match="digit-GEMM"):
            BatchedEvaluator(sl, dtype="dd")


class TestOutOfDomainFallback:
    """dd guarantees hold in-domain; out-of-domain batches fall back to
    the f64 path on every family (reference silent-extrapolation
    semantics preserved at full accuracy)."""

    def test_slider(self, slider6):
        pts = np.array([[1.4, 0.0, 0.0, 0.0, 0.0, 0.0],
                        [0.5, 0.0, 0.0, 0.0, 0.0, 0.0]])
        np.testing.assert_allclose(slider6.eval_batch_dd(pts),
                                   slider6.eval_batch(pts),
                                   rtol=0, atol=1e-12)

    @staticmethod
    def _f3(p, _=None):
        p = np.asarray(p, dtype=np.float64)
        return np.exp(-p[:, 0]) * np.sin(p.sum(axis=1))

    def test_tt(self):
        from pychebyshev_tpu import ChebyshevTT
        tt = ChebyshevTT(self._f3, 3, [[-1, 1]] * 3, [9] * 3, max_rank=5,
                         vectorized=True)
        tt.build(verbose=False)
        pts = np.array([[1.4, 0.0, 0.0], [0.5, 0.0, 0.0]])
        np.testing.assert_allclose(tt.eval_batch_dd(pts),
                                   tt.eval_batch(pts),
                                   rtol=0, atol=1e-12)

    def test_dense(self):
        from pychebyshev_tpu import ChebyshevApproximation
        c = ChebyshevApproximation(self._f3, 3, [[-1, 1]] * 3, [9] * 3,
                                   vectorized=True)
        c.build(verbose=False)
        pts = np.array([[1.4, 0.0, 0.0], [0.5, 0.0, 0.0]])
        np.testing.assert_allclose(
            np.asarray(c.eval_batch_dd(pts)),
            c.vectorized_eval_batch(pts, [0, 0, 0]),
            rtol=0, atol=1e-12)


class TestSplineClassDD:
    """ChebyshevSpline.eval_batch_dd: host routing + per-piece dense
    digit GEMMs (the fourth family's class-level dd surface)."""

    @pytest.fixture(scope="class")
    def spline3(self):
        from pychebyshev_tpu import ChebyshevSpline

        def kinked(p, _=None):
            p = np.asarray(p, dtype=np.float64)
            if p.ndim == 1:
                p = p[None, :]
            return (np.abs(p[:, 0]) * np.exp(0.2 * p[:, 1])
                    + np.sin(p[:, 2]))

        sp = ChebyshevSpline(kinked, 3, [[-1, 1]] * 3, [9, 9, 9],
                             [[0.0], [], []], vectorized=True)
        sp.build(verbose=False)
        return sp

    def test_matches_eval_batch(self, spline3):
        pts = np.random.default_rng(2).uniform(-1, 1, (400, 3))
        ref = spline3.eval_batch(pts, [0, 0, 0])
        got = spline3.eval_batch_dd(pts)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10

    def test_derivative(self, spline3):
        pts = np.random.default_rng(3).uniform(-1, 1, (200, 3))
        ref = spline3.eval_batch(pts, [0, 1, 0])
        got = spline3.eval_batch_dd(pts, [0, 1, 0])
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-9

    def test_kink_sides_route_correctly(self, spline3):
        pts = np.array([[-0.2, 0.1, 0.3], [0.2, 0.1, 0.3]])
        got = spline3.eval_batch_dd(pts, [1, 0, 0])
        assert got[0] < 0 < got[1]

    def test_bad_mode_and_unbuilt(self, spline3):
        with pytest.raises(ValueError, match="mode"):
            spline3.eval_batch_dd(np.zeros((2, 3)), mode="ultra")
        from pychebyshev_tpu import ChebyshevSpline
        sp = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]], [7],
                             [[0.0]])
        with pytest.raises(RuntimeError, match="build"):
            sp.eval_batch_dd(np.zeros((2, 1)))


class TestMultiSpecDD:
    """slider_multi_batch_dd: one row-plane build, per-spec ladders."""

    SPECS = ((0, 0, 0, 0, 0, 0),      # value
             (1, 0, 0, 0, 0, 0),      # group [0,1] partial
             (0, 0, 1, 0, 0, 0),      # singleton partial
             (0, 0, 0, 2, 0, 0),      # second derivative
             (0, 0, 1, 1, 0, 0))      # cross-group -> exact zero

    def test_report_matches_per_spec_dd(self, slider6, pts6):
        from pychebyshev_tpu.ops.slider_eval import slider_multi_batch_dd
        data = _slide_data(slider6)
        groups = tuple(tuple(g) for g in slider6.partition)
        got = np.asarray(slider_multi_batch_dd(
            data, slider6.pivot_value, groups, self.SPECS, pts6))
        assert got.shape == (len(pts6), len(self.SPECS))
        for k, spec in enumerate(self.SPECS):
            want = np.asarray(slider_batch_dd(
                data, slider6.pivot_value, groups, pts6,
                orders=spec))
            scale = max(np.abs(want).max(), 1e-3)
            assert np.abs(got[:, k] - want).max() / scale < 1e-11, spec

    def test_report_matches_f64_class_path(self, slider6, pts6):
        from pychebyshev_tpu.ops.slider_eval import slider_multi_batch_dd
        data = _slide_data(slider6)
        groups = tuple(tuple(g) for g in slider6.partition)
        got = np.asarray(slider_multi_batch_dd(
            data, slider6.pivot_value, groups, self.SPECS, pts6))
        for k, spec in enumerate(self.SPECS):
            want = slider6.eval_batch(pts6, list(spec))
            scale = max(np.abs(want).max(), 1e-3)
            assert np.abs(got[:, k] - want).max() / scale < 1e-9, spec

    def test_cross_group_column_is_exact_zero(self, slider6, pts6):
        from pychebyshev_tpu.ops.slider_eval import slider_multi_batch_dd
        data = _slide_data(slider6)
        groups = tuple(tuple(g) for g in slider6.partition)
        got = np.asarray(slider_multi_batch_dd(
            data, slider6.pivot_value, groups, self.SPECS, pts6))
        assert np.all(got[:, 4] == 0.0)

    def test_empty_specs(self, slider6, pts6):
        from pychebyshev_tpu.ops.slider_eval import slider_multi_batch_dd
        data = _slide_data(slider6)
        groups = tuple(tuple(g) for g in slider6.partition)
        got = np.asarray(slider_multi_batch_dd(
            data, slider6.pivot_value, groups, (), pts6))
        assert got.shape == (len(pts6), 0)

    def test_bad_spec_length_raises(self, slider6, pts6):
        from pychebyshev_tpu.ops.slider_eval import slider_multi_batch_dd
        data = _slide_data(slider6)
        groups = tuple(tuple(g) for g in slider6.partition)
        with pytest.raises(ValueError, match="length"):
            slider_multi_batch_dd(data, slider6.pivot_value, groups,
                                  ((0, 0),), pts6)


class TestMultiSpecEngineDD:
    """MultiSpecEvaluator(dtype='dd') on a slider: near-f64 Greek
    reports through the bucket ladder."""

    def test_report_matches_class_path(self, slider6, pts6):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        specs = [(0,) * D, (1, 0, 0, 0, 0, 0), (0, 0, 1, 0, 0, 0),
                 (0, 0, 1, 1, 0, 0)]
        eng = MultiSpecEvaluator(slider6, specs, dtype="dd",
                                 bucket_sizes=(128,))
        got = eng(pts6)
        assert got.shape == (len(pts6), len(specs))
        for m, s in enumerate(specs):
            want = slider6.eval_batch(pts6, list(s))
            scale = max(np.abs(want).max(), 1e-3)
            assert np.abs(got[:, m] - want).max() / scale < 1e-9, s

    def test_warmup_and_repeat_calls(self, slider6, pts6):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        specs = [(0,) * D, (0, 0, 0, 0, 1, 0)]
        eng = MultiSpecEvaluator(slider6, specs, dtype="dd",
                                 bucket_sizes=(64, 256))
        eng.warmup()
        a = eng(pts6[:40])
        b = eng(pts6[:40])
        np.testing.assert_array_equal(a, b)

    def test_over_budget_slider_rejected(self):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        sl = ChebyshevSlider(
            lambda p, _: np.sum(np.asarray(p) ** 2, axis=1),
            4, [[-1, 1]] * 4, [33] * 4, [[0, 1, 2, 3]], [0.0] * 4,
            vectorized=True)
        sl.build(verbose=False)
        with pytest.raises(ValueError, match="digit-GEMM"):
            MultiSpecEvaluator(sl, [(0, 0, 0, 0)], dtype="dd")
