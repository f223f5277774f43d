"""BatchedEvaluator: bucket padding, dtype modes, derivative specs."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevTT
from pychebyshev_tpu.serving import BatchedEvaluator


def f3(x, _):
    return math.sin(x[0]) + math.cos(x[1]) * x[2]


@pytest.fixture(scope="module")
def cheb():
    c = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [9] * 3)
    c.build(verbose=False)
    return c


@pytest.fixture(scope="module")
def tt():
    t = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6)
    t.build(verbose=False, seed=0)
    return t


@pytest.fixture(scope="module")
def pts():
    return np.random.default_rng(0).uniform(-1, 1, size=(777, 3))


class TestDense:
    def test_f64_matches_reference_path(self, cheb, pts):
        engine = BatchedEvaluator(cheb, dtype=jnp.float64,
                                  bucket_sizes=(256, 1024))
        engine.warmup()
        out = engine(pts)
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(out, expected, atol=1e-13)

    def test_f32_mode(self, cheb, pts):
        engine = BatchedEvaluator(cheb, dtype=jnp.float32,
                                  bucket_sizes=(256, 1024))
        out = engine(pts)
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(out, expected, atol=5e-5)

    def test_derivative_spec(self, cheb, pts):
        engine = BatchedEvaluator(cheb, dtype=jnp.float64,
                                  derivative_order=[1, 0, 0],
                                  bucket_sizes=(1024,))
        out = engine(pts)
        expected = cheb.vectorized_eval_batch(pts, [1, 0, 0])
        np.testing.assert_allclose(out, expected, atol=1e-12)

    def test_ragged_and_oversized_batches(self, cheb):
        engine = BatchedEvaluator(cheb, dtype=jnp.float64,
                                  bucket_sizes=(64, 256))
        rng = np.random.default_rng(1)
        for n in (1, 63, 64, 65, 255, 300, 1000):
            p = rng.uniform(-1, 1, size=(n, 3))
            out = engine(p)
            assert out.shape == (n,)
            expected = cheb.vectorized_eval_batch(p, [0, 0, 0])
            np.testing.assert_allclose(out, expected, atol=1e-13)

    def test_fused_mode(self, cheb, pts):
        engine = BatchedEvaluator(cheb, dtype=jnp.float32,
                                  bucket_sizes=(1024,), use_fused=True)
        out = engine(pts)
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(out, expected, atol=5e-5)

    def test_validation(self, cheb):
        with pytest.raises(ValueError):
            BatchedEvaluator(cheb, derivative_order=[1, 0])
        engine = BatchedEvaluator(cheb)
        with pytest.raises(ValueError):
            engine(np.zeros((5, 2)))
        unbuilt = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [5] * 3)
        with pytest.raises(RuntimeError):
            BatchedEvaluator(unbuilt)
        with pytest.raises(TypeError):
            BatchedEvaluator("nope")


class TestTT:
    def test_values(self, tt, pts):
        engine = BatchedEvaluator(tt, dtype=jnp.float64,
                                  bucket_sizes=(256, 1024))
        engine.warmup()
        out = engine(pts)
        expected = tt.eval_batch(pts)
        np.testing.assert_allclose(out, expected, atol=1e-13)

    def test_analytic_derivative_spec(self, tt, pts):
        engine = BatchedEvaluator(tt, dtype=jnp.float64,
                                  derivative_order=[1, 0, 0],
                                  bucket_sizes=(1024,))
        out = engine(pts)
        expected = tt.differentiate([1, 0, 0]).eval_batch(pts)
        np.testing.assert_allclose(out, expected, atol=1e-12)

    def test_reordered_storage(self, tt, pts):
        rt = tt.reorder([2, 0, 1])
        engine = BatchedEvaluator(rt, dtype=jnp.float64,
                                  bucket_sizes=(1024,))
        out = engine(pts)
        expected = tt.eval_batch(pts)
        np.testing.assert_allclose(out, expected, atol=1e-9)
