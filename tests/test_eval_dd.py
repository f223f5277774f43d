"""Digit-GEMM near-f64 evaluation mode (``ops.eval_dd``).

The accuracy contract this mode exists for: deviation from the true
f64 path at most 1e-10 scale-normalized (the BASELINE north-star needs
f64-class answers at multi-M queries/s on f64-less TPU hardware).
"""

import numpy as np
import pytest

from conftest import BS_DOMAIN_5D, bs_price_vectorized

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.ops.eval_dd import dd_plan, eval_batch_dd, supports_dd


@pytest.fixture(scope="module")
def bs5():
    c = ChebyshevApproximation(bs_price_vectorized, 5, BS_DOMAIN_5D,
                               [11] * 5, vectorized=True)
    c.build(verbose=False)
    return c


@pytest.fixture(scope="module")
def pts5():
    rng = np.random.default_rng(11)
    lo = np.array([b[0] for b in BS_DOMAIN_5D])
    hi = np.array([b[1] for b in BS_DOMAIN_5D])
    return lo + (hi - lo) * rng.uniform(0.02, 0.98, size=(700, 5))


class TestAccuracy:
    def test_value_within_1e10_of_f64(self, bs5, pts5):
        f64 = np.asarray(bs5.vectorized_eval_batch(pts5, [0] * 5))
        nodes, weights, diffs = bs5._grid_tuples()
        dd = np.asarray(eval_batch_dd(bs5.tensor_values, nodes, weights,
                                      diffs, pts5))
        scale = np.abs(f64).max()
        assert np.abs(dd - f64).max() / scale < 1e-10

    def test_derivative_within_1e10(self, bs5, pts5):
        f64 = np.asarray(bs5.vectorized_eval_batch(pts5, [1, 0, 0, 0, 0]))
        nodes, weights, diffs = bs5._grid_tuples()
        dd = np.asarray(eval_batch_dd(bs5.tensor_values, nodes, weights,
                                      diffs, pts5, (1, 0, 0, 0, 0)))
        scale = np.abs(f64).max()
        assert np.abs(dd - f64).max() / scale < 1e-10

    def test_exact_node_point(self, bs5):
        # A query sitting exactly on grid nodes must reproduce the
        # nodal value (the f64 row build one-hots it).
        node_pt = np.array([[float(np.asarray(bs5.nodes[d])[3])
                             for d in range(5)]])
        f64 = np.asarray(bs5.vectorized_eval_batch(node_pt, [0] * 5))
        nodes, weights, diffs = bs5._grid_tuples()
        dd = np.asarray(eval_batch_dd(bs5.tensor_values, nodes, weights,
                                      diffs, node_pt))
        np.testing.assert_allclose(dd, f64, rtol=1e-12)

    def test_3d_grid(self):
        c = ChebyshevApproximation(
            lambda p, _: np.sin(p[:, 0]) * np.exp(p[:, 1]) + p[:, 2] ** 3,
            3, [[-1, 1], [0, 2], [-2, 2]], [9, 8, 7], vectorized=True)
        c.build(verbose=False)
        rng = np.random.default_rng(3)
        pts = np.column_stack([rng.uniform(-1, 1, 300),
                               rng.uniform(0, 2, 300),
                               rng.uniform(-2, 2, 300)])
        f64 = np.asarray(c.vectorized_eval_batch(pts, [0] * 3))
        nodes, weights, diffs = c._grid_tuples()
        dd = np.asarray(eval_batch_dd(c.tensor_values, nodes, weights,
                                      diffs, pts))
        assert np.abs(dd - f64).max() / np.abs(f64).max() < 1e-10


class TestPlanAndAPI:
    def test_plan_respects_exactness_bound(self):
        for shape in [(11,) * 5, (13,) * 5, (7,) * 4, (21, 21, 21)]:
            plan = dd_plan(shape)
            if not plan["ok"]:
                continue
            # MXU-exactness: K * 2^(b_r + b_t) must stay under 2^24.
            assert plan["n_right"] * 2 ** (plan["b_r"] + plan["b_t"]) \
                <= 2 ** 24
            assert plan["pairs"]

    def test_unsupported_shape_raises(self):
        import jax.numpy as jnp
        big = jnp.zeros((200, 200, 200))  # right group 40000 > budget
        if supports_dd(big.shape):
            pytest.skip("plan unexpectedly supports this")
        with pytest.raises(ValueError, match="digit-GEMM"):
            eval_batch_dd(big, (), (), (), np.zeros((4, 4)))

    def test_class_method(self, bs5, pts5):
        f64 = np.asarray(bs5.vectorized_eval_batch(pts5, [0] * 5))
        dd = np.asarray(bs5.eval_batch_dd(pts5))
        assert np.abs(dd - f64).max() / np.abs(f64).max() < 1e-10

    def test_class_method_fallback(self):
        # 2-D grid: n_right small, still supported -> should just work.
        c = ChebyshevApproximation(lambda p, _: p[:, 0] * p[:, 1], 2,
                                   [[-1, 1], [-1, 1]], [6, 6],
                                   vectorized=True)
        c.build(verbose=False)
        pts = np.random.default_rng(5).uniform(-1, 1, (50, 2))
        f64 = np.asarray(c.vectorized_eval_batch(pts, [0, 0]))
        dd = np.asarray(c.eval_batch_dd(pts))
        assert np.abs(dd - f64).max() < 1e-10


class TestCutoffModes:
    """The cutoff knob positions the accuracy-throughput frontier; the
    class exposes it as mode="accurate"|"fast"."""

    def test_fast_mode_fewer_pairs(self):
        from pychebyshev_tpu.ops import eval_dd
        full = eval_dd.dd_plan((11,) * 5)
        fast = eval_dd.dd_plan((11,) * 5, eval_dd.FAST_PAIR_CUTOFF)
        assert len(fast["pairs"]) < len(full["pairs"])

    def test_fast_mode_accuracy_ladder(self):
        import math
        from pychebyshev_tpu import ChebyshevApproximation
        cheb = ChebyshevApproximation(
            lambda x, _: math.sin(x[0]) * x[1] + math.exp(0.3 * x[2]),
            3, [[-1, 1]] * 3, [9, 9, 9])
        cheb.build(verbose=False)
        rng = np.random.default_rng(2)
        pts = rng.uniform(-1, 1, (512, 3))
        truth = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        scale = np.abs(truth).max()
        acc = np.asarray(cheb.eval_batch_dd(pts, mode="accurate"))
        fast = np.asarray(cheb.eval_batch_dd(pts, mode="fast"))
        dev_acc = np.abs(acc - truth).max() / scale
        dev_fast = np.abs(fast - truth).max() / scale
        assert dev_acc < 1e-9         # interp-mode slack; TPU ~1e-11
        assert dev_fast < 1e-6
        assert dev_acc <= dev_fast + 1e-15

    def test_bad_mode_raises(self):
        from pychebyshev_tpu import ChebyshevApproximation
        cheb = ChebyshevApproximation(lambda x, _: x[0], 3,
                                      [[-1, 1]] * 3, [5, 5, 5])
        cheb.build(verbose=False)
        with pytest.raises(ValueError, match="mode"):
            cheb.eval_batch_dd(np.zeros((4, 3)), mode="quick")


class TestPlanBoundaries:
    def test_1d_grid_is_unsupported_and_falls_back(self):
        """d=1 has no L|R split: supports_dd must say no, and the class
        path must fall back to f64 instead of crashing."""
        import math
        assert not supports_dd((21,))
        c = ChebyshevApproximation(lambda x, _: math.sin(x[0]), 1,
                                   [[-1, 1]], [21])
        c.build(verbose=False)
        pts = np.linspace(-0.9, 0.9, 64).reshape(-1, 1)
        out = np.asarray(c.eval_batch_dd(pts))  # falls back cleanly
        want = np.asarray(c.vectorized_eval_batch(pts, [0]))
        np.testing.assert_allclose(out, want, atol=1e-12)

    def test_wide_right_groups_are_rejected(self):
        """_WR_SCALE_LOG2's Lebesgue bound covers right groups of <= 3
        dims; bigger groups could break MXU exactness silently."""
        assert not supports_dd((11,) * 7)
        plan = dd_plan((11,) * 5)
        assert plan["ok"] and len((11,) * 5) - plan["s"] <= 3

    def test_plane_cache_ignores_mutable_numpy_tensors(self):
        """In-place mutation of a host tensor must not serve stale
        digit planes (identity-keyed caches need immutability)."""
        from pychebyshev_tpu.ops import eval_dd
        rng = np.random.default_rng(4)
        model = ChebyshevApproximation(
            lambda x, _: x[0] + x[1] * x[2], 3, [[-1, 1]] * 3,
            [9, 9, 9])
        model.build(verbose=False)
        g_nodes, g_weights, g_diffs = model._grid_tuples()
        nodes = tuple(np.asarray(a) for a in g_nodes)
        weights = tuple(np.asarray(a) for a in g_weights)
        diffs = tuple(np.asarray(a) for a in g_diffs)
        t = rng.standard_normal((9, 9, 9))
        pts = rng.uniform(-0.9, 0.9, (64, 3))
        first = np.asarray(eval_dd.eval_batch_dd(
            t, nodes, weights, diffs, pts))
        t *= 2.0
        second = np.asarray(eval_dd.eval_batch_dd(
            t, nodes, weights, diffs, pts))
        np.testing.assert_allclose(second, 2.0 * first, rtol=1e-9)


class TestDigitGemmMulti:
    """eval_batch_dd_multi: one shared row-plane build, per-spec GEMM
    ladders — the near-f64 Greek report."""

    @pytest.fixture(scope="class")
    def cheb3(self):
        import math
        from pychebyshev_tpu import ChebyshevApproximation
        c = ChebyshevApproximation(
            lambda x, _: math.sin(x[0]) * x[1] + math.exp(0.3 * x[2]),
            3, [[-1, 1]] * 3, [9, 9, 9])
        c.build(verbose=False)
        return c

    def test_matches_per_spec_dd(self, cheb3):
        from pychebyshev_tpu.ops.eval_dd import (
            eval_batch_dd,
            eval_batch_dd_multi,
        )
        nodes, weights, diffs = cheb3._grid_tuples()
        pts = np.random.default_rng(2).uniform(-1, 1, (300, 3))
        specs = ((0, 0, 0), (1, 0, 0), (0, 2, 0))
        multi = np.asarray(eval_batch_dd_multi(
            cheb3.tensor_values, nodes, weights, diffs, pts, specs))
        assert multi.shape == (300, 3)
        for m, s in enumerate(specs):
            single = np.asarray(eval_batch_dd(
                cheb3.tensor_values, nodes, weights, diffs, pts, s))
            np.testing.assert_array_equal(multi[:, m], single)

    def test_matches_f64_multi(self, cheb3):
        from pychebyshev_tpu.ops.eval_dd import eval_batch_dd_multi
        pts = np.random.default_rng(3).uniform(-1, 1, (200, 3))
        specs = ((0, 0, 0), (1, 0, 0), (0, 0, 1))
        got = np.asarray(eval_batch_dd_multi(
            cheb3.tensor_values, *cheb3._grid_tuples(), pts, specs))
        for m, s in enumerate(specs):
            want = cheb3.vectorized_eval_batch(pts, list(s))
            scale = np.abs(want).max()
            assert np.abs(got[:, m] - want).max() / scale < 1e-9

    def test_empty_specs(self, cheb3):
        from pychebyshev_tpu.ops.eval_dd import eval_batch_dd_multi
        out = np.asarray(eval_batch_dd_multi(
            cheb3.tensor_values, *cheb3._grid_tuples(),
            np.zeros((5, 3)), ()))
        assert out.shape == (5, 0)

    def test_spec_length_validated(self, cheb3):
        from pychebyshev_tpu.ops.eval_dd import eval_batch_dd_multi
        with pytest.raises(ValueError, match="length"):
            eval_batch_dd_multi(cheb3.tensor_values,
                                *cheb3._grid_tuples(),
                                np.zeros((5, 3)), ((0, 0),))

    def test_multispec_engine_dd(self, cheb3):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        specs = [(0, 0, 0), (1, 0, 0), (0, 1, 0)]
        eng = MultiSpecEvaluator(cheb3, specs, dtype="dd",
                                 bucket_sizes=(128,))
        pts = np.random.default_rng(5).uniform(-1, 1, (300, 3))
        got = eng(pts)
        assert got.shape == (300, 3)
        for m, s in enumerate(specs):
            want = cheb3.vectorized_eval_batch(pts, list(s))
            scale = np.abs(want).max()
            assert np.abs(got[:, m] - want).max() / scale < 1e-9

    def test_multispec_engine_dd_spline(self):
        """Flat-grid splines serve dd reports: host piece routing,
        per-piece dense dd_multi (one shared row build per bucket)."""
        from pychebyshev_tpu import ChebyshevSpline
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) ** 3 + np.sin(x[1]), 2,
            [[-1, 1], [-1, 1]], [9, 9], [[0.0], []])
        sp.build(verbose=False)
        specs = [(0, 0), (1, 0), (0, 1)]
        eng = MultiSpecEvaluator(sp, specs, dtype="dd",
                                 bucket_sizes=(64, 256))
        rng = np.random.default_rng(11)
        pts = rng.uniform(-0.95, 0.95, (333, 2))
        pts = pts[np.abs(pts[:, 0]) > 1e-3]       # off the kink knot
        got = eng(pts)
        assert got.shape == (len(pts), 3)
        for m, s in enumerate(specs):
            want = sp.vectorized_eval_batch(pts, list(s))
            scale = np.abs(want).max()
            assert np.abs(got[:, m] - want).max() / scale < 1e-9, s

    def test_multispec_engine_dd_spline_knot_guard(self):
        from pychebyshev_tpu import ChebyshevSpline
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) + x[1] ** 2, 2,
            [[-1, 1], [-1, 1]], [7, 7], [[0.0], []])
        sp.build(verbose=False)
        eng = MultiSpecEvaluator(sp, [(0, 0), (1, 0)], dtype="dd",
                                 bucket_sizes=(16,))
        with pytest.raises(ValueError, match="not defined"):
            eng(np.array([[0.0, 0.3], [0.5, 0.1]]))

    def test_multispec_engine_dd_rejects_nonflat_spline(self):
        from pychebyshev_tpu import ChebyshevSpline
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        sp = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]],
                             [[7, 9]], [[0.0]])
        sp.build(verbose=False)
        with pytest.raises(ValueError, match="flat"):
            MultiSpecEvaluator(sp, [(0,)], dtype="dd")


class TestDigitGemmBook:
    """eval_batch_dd_models + MultiModelEvaluator dtype='dd': a book of
    same-grid models at near-f64 accuracy, one shared row build."""

    @pytest.fixture(scope="class")
    def book(self):
        import math
        from pychebyshev_tpu import ChebyshevApproximation
        models = []
        for k in range(3):
            c = ChebyshevApproximation(
                lambda x, _, k=k: math.sin(x[0]) * (1 + 0.2 * k)
                + x[1] ** 2 + 0.1 * k * x[2],
                3, [[-1, 1]] * 3, [9, 9, 9])
            c.build(verbose=False)
            models.append(c)
        return models

    def test_ops_matches_per_model_dd(self, book):
        from pychebyshev_tpu.ops.eval_dd import (
            eval_batch_dd,
            eval_batch_dd_models,
        )
        nodes, weights, diffs = book[0]._grid_tuples()
        pts = np.random.default_rng(7).uniform(-1, 1, (200, 3))
        tensors = tuple(m.tensor_values for m in book)
        got = np.asarray(eval_batch_dd_models(
            tensors, nodes, weights, diffs, pts))
        assert got.shape == (3, 200)
        for i, m in enumerate(book):
            single = np.asarray(eval_batch_dd(
                m.tensor_values, *m._grid_tuples(), pts, (0, 0, 0)))
            np.testing.assert_array_equal(got[i], single)

    def test_engine_matches_f64(self, book):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        eng = MultiModelEvaluator(book, dtype="dd", bucket_sizes=(128,))
        pts = np.random.default_rng(8).uniform(-1, 1, (300, 3))
        got = eng(pts)
        for i, m in enumerate(book):
            want = m.vectorized_eval_batch(pts, [0, 0, 0])
            scale = np.abs(want).max()
            assert np.abs(got[i] - want).max() / scale < 1e-9

    def test_engine_derivative_spec(self, book):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        eng = MultiModelEvaluator(book, dtype="dd",
                                  derivative_order=[1, 0, 0],
                                  bucket_sizes=(128,))
        pts = np.random.default_rng(9).uniform(-1, 1, (150, 3))
        got = eng(pts)
        for i, m in enumerate(book):
            want = m.vectorized_eval_batch(pts, [1, 0, 0])
            scale = np.abs(want).max()
            assert np.abs(got[i] - want).max() / scale < 1e-8

    def test_tt_book_dd_now_served(self):
        """TT dd books are served (tt_eval_batch_dd_models); a TT whose
        chain is outside the digit plan budget is still rejected."""
        from pychebyshev_tpu import ChebyshevTT
        from pychebyshev_tpu.serving import MultiModelEvaluator
        tt = ChebyshevTT(
            lambda x, _: np.sin(x[0]) + x[1] ** 2, 2,
            [[-1, 1], [-1, 1]], [9, 9], max_rank=4)
        tt.build(verbose=False)
        eng = MultiModelEvaluator([tt], dtype="dd", bucket_sizes=(64,))
        pts = np.random.default_rng(23).uniform(-1, 1, (100, 2))
        got = eng(pts)
        want = tt.eval_batch(pts)
        assert np.max(np.abs(got[0] - want)) / np.max(
            np.abs(want)) < 1e-10

    def test_oversized_book_rejected(self, book):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        with pytest.raises(ValueError, match="at most"):
            MultiModelEvaluator(book * 6, dtype="dd")


class TestEngineOwnedPlanes:
    """Multi-spec dd engines prepare their digit planes at construction
    and never re-enter the bounded plane cache on calls (the round-3
    review caught pieces x specs working sets thrashing the LRU)."""

    def test_spline_multispec_dd_builds_no_planes_per_call(
            self, monkeypatch):
        from pychebyshev_tpu import ChebyshevSpline
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        from pychebyshev_tpu.ops import eval_dd

        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) ** 3 + np.sin(x[1]), 2,
            [[-1, 1], [-1, 1]], [9, 9], [[0.0], []])
        sp.build(verbose=False)
        specs = [(0, 0), (1, 0), (0, 1)]
        eng = MultiSpecEvaluator(sp, specs, dtype="dd",
                                 bucket_sizes=(64,))

        calls = []
        real = eval_dd._digit_planes_tensor
        monkeypatch.setattr(
            eval_dd, "_digit_planes_tensor",
            lambda *a, **k: calls.append(1) or real(*a, **k))
        pts = np.random.default_rng(0).uniform(-0.9, 0.9, (150, 2))
        pts[:, 0][np.abs(pts[:, 0]) < 1e-3] = 0.1
        eng(pts)
        eng(pts)
        assert calls == []          # planes were closed over at init

    def test_slider_multispec_dd_builds_no_planes_per_call(
            self, monkeypatch):
        from pychebyshev_tpu import ChebyshevSlider
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        from pychebyshev_tpu.ops import slider_eval

        D = 4
        sl = ChebyshevSlider(
            lambda p, _: np.sum(np.sin(np.asarray(p, float)), axis=1),
            D, [[-1, 1]] * D, [9] * D, [[i] for i in range(D)],
            [0.0] * D, vectorized=True)
        sl.build(verbose=False)
        # value + one delta per dim: D+1 specs, more than the old
        # 8-slot cache could hold alongside other entries.
        specs = [(0,) * D] + [tuple(1 if j == k else 0
                                    for j in range(D))
                              for k in range(D)]
        eng = MultiSpecEvaluator(sl, specs, dtype="dd",
                                 bucket_sizes=(64,))

        calls = []
        real = slider_eval._digit_planes_tensor
        monkeypatch.setattr(
            slider_eval, "_digit_planes_tensor",
            lambda *a, **k: calls.append(1) or real(*a, **k))
        pts = np.random.default_rng(1).uniform(-1, 1, (100, D))
        eng(pts)
        eng(pts)
        assert calls == []
