"""Concurrent evaluation safety.

The reference fixed a race where ``eval_multi`` temporarily mutated the
TT ``_dim_order`` (issue #19 / v0.20.1); the design contract here is
stronger: no eval path mutates shared state, so concurrent evaluation
from threads must produce bit-identical results to sequential calls.
"""

import concurrent.futures
import math

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevTT


def f3(x, _):
    return math.sin(x[0]) + math.cos(x[1]) * x[2]


@pytest.fixture(scope="module")
def reordered_tt():
    tt = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6)
    tt.build(verbose=False, seed=0)
    return tt.reorder([2, 0, 1])  # non-identity dim_order


class TestConcurrentEval:
    def test_tt_eval_multi_threads(self, reordered_tt):
        rng = np.random.default_rng(0)
        points = [list(rng.uniform(-1, 1, 3)) for _ in range(40)]
        orders = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
        sequential = [reordered_tt.eval_multi(pt, orders)
                      for pt in points]

        def work(pt):
            return reordered_tt.eval_multi(pt, orders)

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            concurrent_results = list(pool.map(work, points))

        for seq, conc in zip(sequential, concurrent_results):
            assert seq == conc  # bit-identical: no state was touched
        # dim_order untouched
        assert reordered_tt.dim_order == [2, 0, 1]

    def test_dense_eval_threads(self):
        cheb = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [9] * 3)
        cheb.build(verbose=False)
        rng = np.random.default_rng(1)
        points = [list(rng.uniform(-1, 1, 3)) for _ in range(60)]
        sequential = [cheb.vectorized_eval(pt, [1, 0, 0])
                      for pt in points]

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            concurrent_results = list(pool.map(
                lambda pt: cheb.vectorized_eval(pt, [1, 0, 0]), points))

        assert sequential == concurrent_results

    def test_mixed_batch_and_single_threads(self):
        cheb = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [9] * 3)
        cheb.build(verbose=False)
        rng = np.random.default_rng(2)
        batch = rng.uniform(-1, 1, size=(256, 3))
        expected_batch = cheb.vectorized_eval_batch(batch, [0, 0, 0])
        pt = [0.3, -0.2, 0.5]
        expected_single = cheb.vectorized_eval(pt, [0, 0, 0])

        def batch_work(_):
            return cheb.vectorized_eval_batch(batch, [0, 0, 0])

        def single_work(_):
            return cheb.vectorized_eval(pt, [0, 0, 0])

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
            batch_futs = [pool.submit(batch_work, i) for i in range(8)]
            single_futs = [pool.submit(single_work, i) for i in range(8)]
            for f in batch_futs:
                np.testing.assert_array_equal(f.result(), expected_batch)
            for f in single_futs:
                assert f.result() == expected_single


class TestServingConcurrency:
    def test_batched_evaluator_thread_safe(self):
        import math
        import threading

        import jax.numpy as jnp
        from pychebyshev_tpu import ChebyshevApproximation
        from pychebyshev_tpu.serving import BatchedEvaluator

        c = ChebyshevApproximation(
            lambda x, _: math.sin(x[0]) + x[1], 2, [[-1, 1]] * 2, [9, 9])
        c.build(verbose=False)
        engine = BatchedEvaluator(c, dtype=jnp.float64,
                                  bucket_sizes=(256,))
        engine.warmup()
        pts = np.random.default_rng(0).uniform(-1, 1, (500, 2))
        expected = engine(pts)

        results = [None] * 8
        errors = []

        def worker(i):
            try:
                results[i] = engine(pts)
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors
        for r in results:
            np.testing.assert_array_equal(r, expected)


class TestSplineSliderConcurrency:
    """The masked-spline and fused-slider paths build lazy caches keyed
    on array identity; concurrent first-use must be benign (worst case:
    two threads build the same immutable cache entry)."""

    def test_spline_masked_eval_threads(self):
        from pychebyshev_tpu import ChebyshevSpline
        sp = ChebyshevSpline(lambda x, _: abs(x[0]) + x[1], 2,
                             [[-1.0, 1.0], [0.0, 1.0]], [9, 7],
                             [[0.0], []])
        sp.build(verbose=False)
        rng = np.random.default_rng(0)
        pts = np.column_stack([rng.uniform(-1, 1, 256),
                               rng.uniform(0, 1, 256)])
        expected = sp.eval_batch(pts, [0, 0])

        def work(_):
            return sp.eval_batch(pts, [0, 0])

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            results = list(ex.map(work, range(16)))
        for r in results:
            np.testing.assert_array_equal(r, expected)

    def test_slider_fused_eval_threads(self):
        from pychebyshev_tpu import ChebyshevSlider
        sl = ChebyshevSlider(
            lambda x, _: math.sin(x[0]) + x[1] ** 2 + math.cos(x[2]),
            3, [[-1.0, 1.0]] * 3, [9, 9, 9], [[0], [1], [2]],
            [0.0, 0.0, 0.0])
        sl.build(verbose=False)
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1, 1, size=(256, 3))
        expected = sl.eval_batch(pts)

        def work(_):
            return sl.eval_batch(pts)

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            results = list(ex.map(work, range(16)))
        for r in results:
            np.testing.assert_array_equal(r, expected)


class TestCacheConcurrency:
    def test_tt_device_core_cache_under_threads(self, reordered_tt):
        """Racing eval_batch calls may duplicate an upload but must
        never corrupt results (worst case: two identical device copies)."""
        pts = np.random.default_rng(5).uniform(-0.9, 0.9, (256, 3))
        reordered_tt.__dict__.pop("_dev_cores", None)
        expected = reordered_tt.eval_batch(pts)
        reordered_tt.__dict__.pop("_dev_cores", None)

        def run(_):
            return reordered_tt.eval_batch(pts)

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            outs = list(ex.map(run, range(16)))
        for out in outs:
            np.testing.assert_array_equal(out, expected)

    def test_fused_operand_cache_under_threads(self):
        from pychebyshev_tpu.ops import pallas_eval
        c = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [8, 9, 7])
        c.build(verbose=False)
        pts = np.random.default_rng(6).uniform(-0.9, 0.9, (128, 3))
        pallas_eval.clear_fused_cache()
        expected = np.asarray(c.eval_batch_f32(pts, use_fused=True))

        def run(_):
            return np.asarray(c.eval_batch_f32(pts, use_fused=True))

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            outs = list(ex.map(run, range(16)))
        for out in outs:
            np.testing.assert_array_equal(out, expected)
        assert len(pallas_eval._mega_cache) <= pallas_eval._MEGA_CACHE_SLOTS
