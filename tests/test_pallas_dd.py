"""Fused Pallas digit-GEMM backend (interpret mode on CPU).

The kernel must match the XLA digit-GEMM path's accuracy class
(~1e-11 scale-normalized deviation from the f64 path), including node
hits and derivative orders.  On TPU the same kernel compiles natively;
these tests exercise the interpret path, which shares all the numerics
except the platform-specific split/round implementations.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.ops import eval as eval_ops
from pychebyshev_tpu.ops.pallas_dd import (
    fused_eval_batch_dd,
    supports_fused_dd,
)

DOMAIN = [[80.0, 120.0], [90.0, 110.0], [0.25, 2.0], [0.1, 0.5],
          [0.01, 0.05]]


def bs_price(points, _=None):
    from scipy.stats import norm
    p = np.asarray(points, dtype=np.float64)
    s, k, t, sg, r = (p[:, i] for i in range(5))
    sq = np.sqrt(t)
    d1 = (np.log(s / k) + (r + 0.5 * sg ** 2) * t) / (sg * sq)
    d2 = d1 - sg * sq
    return s * norm.cdf(d1) - k * np.exp(-r * t) * norm.cdf(d2)


@pytest.fixture(scope="module")
def cheb():
    c = ChebyshevApproximation(bs_price, 5, DOMAIN, [11] * 5,
                               vectorized=True)
    c.build(verbose=False)
    return c


def f64_ref(cheb, pts, orders=(0,) * 5):
    nodes, weights, diffs = cheb._grid_tuples()
    return np.asarray(eval_ops.eval_batch(
        cheb.tensor_values, nodes, weights, diffs,
        jnp.asarray(pts), orders))


class TestFusedDd:
    def test_supports(self, cheb):
        assert supports_fused_dd((11,) * 5)
        assert not supports_fused_dd((5, 5))

    def test_accuracy_vs_f64(self, cheb):
        rng = np.random.default_rng(2)
        pts = np.stack([rng.uniform(lo, hi, 600) for lo, hi in DOMAIN],
                       axis=1)
        nodes, weights, diffs = cheb._grid_tuples()
        out = np.asarray(fused_eval_batch_dd(
            cheb.tensor_values, nodes, weights, diffs, pts, (0,) * 5,
            interpret=True))
        ref = f64_ref(cheb, pts)
        scale = np.abs(ref).max()
        assert np.abs(out - ref).max() / scale < 1e-10

    def test_node_hit(self, cheb):
        nodes, weights, diffs = cheb._grid_tuples()
        node_pt = [float(np.asarray(nodes[0])[4]), 100.0, 1.0, 0.2, 0.03]
        pts = np.asarray([node_pt] * 8)
        out = np.asarray(fused_eval_batch_dd(
            cheb.tensor_values, nodes, weights, diffs, pts, (0,) * 5,
            interpret=True))
        ref = f64_ref(cheb, pts)
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-10

    def test_derivative_orders(self, cheb):
        rng = np.random.default_rng(3)
        pts = np.stack([rng.uniform(lo, hi, 64) for lo, hi in DOMAIN],
                       axis=1)
        nodes, weights, diffs = cheb._grid_tuples()
        out = np.asarray(fused_eval_batch_dd(
            cheb.tensor_values, nodes, weights, diffs, pts,
            (1, 0, 0, 0, 0), interpret=True))
        ref = f64_ref(cheb, pts, (1, 0, 0, 0, 0))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-10

    def test_ragged_batch_padding(self, cheb):
        rng = np.random.default_rng(4)
        pts = np.stack([rng.uniform(lo, hi, 700) for lo, hi in DOMAIN],
                       axis=1)   # not a multiple of the block size
        nodes, weights, diffs = cheb._grid_tuples()
        out = np.asarray(fused_eval_batch_dd(
            cheb.tensor_values, nodes, weights, diffs, pts, (0,) * 5,
            interpret=True, block=512))
        assert out.shape == (700,)
        ref = f64_ref(cheb, pts)
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-10
