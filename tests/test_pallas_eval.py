"""Fused Pallas evaluation kernel (interpreter mode on CPU)."""

import math

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.ops.pallas_eval import fused_eval_batch, supports_fused


def f3(x, _):
    return math.sin(x[0]) + math.cos(x[1]) * x[2] + 0.2 * x[0] * x[2]


@pytest.fixture(scope="module")
def cheb():
    c = ChebyshevApproximation(f3, 3, [[-1, 1], [0, 2], [-3, 1]],
                               [8, 9, 7])
    c.build(verbose=False)
    return c


@pytest.fixture(scope="module")
def pts():
    rng = np.random.default_rng(0)
    return np.column_stack([rng.uniform(-1, 1, 700),
                            rng.uniform(0, 2, 700),
                            rng.uniform(-3, 1, 700)])


class TestFusedKernel:
    def test_matches_xla_values(self, cheb, pts):
        nodes, weights, diffs = cheb._grid_tuples()
        out = np.asarray(fused_eval_batch(
            cheb.tensor_values, nodes, weights, diffs, pts))
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        # Kernel arithmetic is manual bf16x3 (= XLA Precision.HIGH):
        # ~1e-4 worst-case on O(1) values, matching the XLA f32 path.
        np.testing.assert_allclose(out, expected, atol=2e-4)

    def test_matches_xla_derivatives(self, cheb, pts):
        nodes, weights, diffs = cheb._grid_tuples()
        out = np.asarray(fused_eval_batch(
            cheb.tensor_values, nodes, weights, diffs, pts, (0, 1, 0)))
        expected = cheb.vectorized_eval_batch(pts, [0, 1, 0])
        np.testing.assert_allclose(out, expected, atol=5e-4)

    def test_exact_node(self, cheb):
        nodes, weights, diffs = cheb._grid_tuples()
        node_pt = np.array([[float(np.asarray(cheb.nodes[0])[2]), 0.5,
                             -1.0]])
        out = np.asarray(fused_eval_batch(
            cheb.tensor_values, nodes, weights, diffs, node_pt))
        expected = cheb.vectorized_eval_batch(node_pt, [0, 0, 0])
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_non_multiple_batch_padding(self, cheb):
        nodes, weights, diffs = cheb._grid_tuples()
        pts = np.random.default_rng(1).uniform(-1, 1, size=(13, 3))
        pts[:, 1] = np.abs(pts[:, 1]) * 2
        pts[:, 2] = pts[:, 2] * 2 - 1
        out = np.asarray(fused_eval_batch(
            cheb.tensor_values, nodes, weights, diffs, pts))
        assert out.shape == (13,)
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(out, expected, atol=5e-5)

    def test_5d(self):
        from conftest import BS_DOMAIN_5D, bs_price_vectorized
        c = ChebyshevApproximation(bs_price_vectorized, 5, BS_DOMAIN_5D,
                                   [7] * 5, vectorized=True)
        c.build(verbose=False)
        rng = np.random.default_rng(2)
        lo = np.array([b[0] for b in BS_DOMAIN_5D])
        hi = np.array([b[1] for b in BS_DOMAIN_5D])
        pts = lo + (hi - lo) * rng.uniform(0.1, 0.9, size=(300, 5))
        nodes, weights, diffs = c._grid_tuples()
        out = np.asarray(fused_eval_batch(
            c.tensor_values, nodes, weights, diffs, pts))
        expected = c.vectorized_eval_batch(pts, [0] * 5)
        scale = np.abs(expected).max()
        # bf16x3 arithmetic: ~1e-5 scale-normalized (Precision.HIGH tier).
        np.testing.assert_allclose(out / scale, expected / scale,
                                   atol=3e-5)

    def test_supports_fused(self, cheb):
        import jax.numpy as jnp
        assert supports_fused((11, 11, 11, 11, 11), jnp.float32)
        assert not supports_fused((11, 11, 11, 11, 11), jnp.float64)
        assert not supports_fused((64, 64, 64, 64), jnp.float32)  # too big
        assert not supports_fused((11, 11), jnp.float32)  # too small

    def test_plan_selection(self):
        # One-level mega-dot up to 13^5; the two-level stream kernel
        # extends the envelope (15^5..21^5, 33^4, 9^6).
        from pychebyshev_tpu.ops.pallas_eval import _pick_plan
        assert _pick_plan((11,) * 5) == (2048, False)
        assert _pick_plan((13,) * 5) == (1024, False)
        for shp in [(15,) * 5, (17,) * 5, (19,) * 5, (21,) * 5,
                    (33,) * 4, (9,) * 6]:
            plan = _pick_plan(shp)
            assert plan is not None and plan[1], shp
        assert _pick_plan((64,) * 4) is None


def _raw_grid(shape, rng):
    from pychebyshev_tpu.ops.chebyshev import (
        barycentric_weights_np,
        differentiation_matrix_np,
        nodes_for_dim_np,
    )
    nodes = [nodes_for_dim_np(-1.0, 1.0, n) for n in shape]
    weights = [barycentric_weights_np(nd) for nd in nodes]
    diffs = [differentiation_matrix_np(nd, w)
             for nd, w in zip(nodes, weights)]
    return rng.standard_normal(shape), nodes, weights, diffs


class TestStreamKernel:
    """Two-level (streamed mega-operand) kernel beyond the one-level
    VMEM envelope, interpret mode."""

    def test_9pow6_matches_xla(self):
        import jax.numpy as jnp
        from pychebyshev_tpu.ops import eval as eval_ops
        from pychebyshev_tpu.ops.pallas_eval import _pick_plan
        assert _pick_plan((9,) * 6)[1]       # stream mode engaged
        rng = np.random.default_rng(3)
        tensor, nodes, weights, diffs = _raw_grid((9,) * 6, rng)
        pts = rng.uniform(-1, 1, (150, 6))
        pts[0] = [nodes[k][2] for k in range(6)]   # exact-node row
        ref = np.asarray(eval_ops.eval_batch(
            jnp.asarray(tensor), tuple(map(jnp.asarray, nodes)),
            tuple(map(jnp.asarray, weights)),
            tuple(map(jnp.asarray, diffs)), jnp.asarray(pts), (0,) * 6))
        out = np.asarray(fused_eval_batch(tensor, nodes, weights, diffs,
                                          pts))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out / scale, ref / scale, atol=1e-4)

    def test_stream_derivative(self):
        import jax.numpy as jnp
        from pychebyshev_tpu.ops import eval as eval_ops
        rng = np.random.default_rng(4)
        tensor, nodes, weights, diffs = _raw_grid((9,) * 6, rng)
        pts = rng.uniform(-1, 1, (64, 6))
        orders = (1, 0, 0, 0, 1, 0)
        ref = np.asarray(eval_ops.eval_batch(
            jnp.asarray(tensor), tuple(map(jnp.asarray, nodes)),
            tuple(map(jnp.asarray, weights)),
            tuple(map(jnp.asarray, diffs)), jnp.asarray(pts), orders))
        out = np.asarray(fused_eval_batch(tensor, nodes, weights, diffs,
                                          pts, orders))
        scale = np.abs(ref).max()
        np.testing.assert_allclose(out / scale, ref / scale, atol=1e-4)


class TestClassIntegration:
    def test_eval_batch_f32(self, cheb, pts):
        out = np.asarray(cheb.eval_batch_f32(pts))
        fused = np.asarray(cheb.eval_batch_f32(pts, use_fused=True))
        # Both paths carry independent bf16x3-tier error (~1e-4 worst).
        np.testing.assert_allclose(fused, out, atol=2e-4)
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(out, expected, atol=5e-5)

    def test_eval_batch_f32_derivative(self, cheb, pts):
        out = np.asarray(cheb.eval_batch_f32(pts, [1, 0, 0]))
        expected = cheb.vectorized_eval_batch(pts, [1, 0, 0])
        np.testing.assert_allclose(out, expected, atol=1e-3)

    def test_eval_batch_f32_fallback_2d(self):
        c = ChebyshevApproximation(lambda x, _: x[0] * x[1], 2,
                                   [[-1, 1], [-1, 1]], [5, 5])
        c.build(verbose=False)
        pts = np.random.default_rng(3).uniform(-1, 1, (50, 2))
        out = np.asarray(c.eval_batch_f32(pts))
        expected = c.vectorized_eval_batch(pts, [0, 0])
        np.testing.assert_allclose(out, expected, atol=1e-5)


class TestOperandCacheSoundness:
    def test_mutated_numpy_tensor_is_not_served_stale(self, cheb, pts):
        """Identity-keyed cache must not engage for mutable host arrays."""
        nodes, weights, diffs = cheb._grid_tuples()
        nodes_np = tuple(np.asarray(a) for a in nodes)
        weights_np = tuple(np.asarray(a) for a in weights)
        diffs_np = tuple(np.asarray(a) for a in diffs)
        t = np.asarray(cheb.tensor_values).copy()

        first = np.asarray(fused_eval_batch(
            t, nodes_np, weights_np, diffs_np, pts))
        t += 10.0  # in-place mutation, identity unchanged
        second = np.asarray(fused_eval_batch(
            t, nodes_np, weights_np, diffs_np, pts))
        # A constant shift of the value tensor shifts every eval by it.
        np.testing.assert_allclose(second, first + 10.0, atol=5e-3)

    def test_device_array_operands_do_cache(self, cheb, pts):
        from pychebyshev_tpu.ops import pallas_eval
        pallas_eval.clear_fused_cache()
        nodes, weights, diffs = cheb._grid_tuples()
        fused_eval_batch(cheb.tensor_values, nodes, weights, diffs, pts)
        assert len(pallas_eval._mega_cache) == 1
        fused_eval_batch(cheb.tensor_values, nodes, weights, diffs, pts)
        assert len(pallas_eval._mega_cache) == 1  # hit, not a new slot
        pallas_eval.clear_fused_cache()
        assert pallas_eval._mega_cache == []


class TestFlopModelRule:
    """The static padded-FLOP auto-dispatch rule, pinned against the
    measured ladder in docs/performance.md (CPU-evaluable: the model
    is pure arithmetic)."""

    def test_model_matches_geometry_11pow5(self):
        from pychebyshev_tpu.ops.pallas_eval import (
            _padded_flops_per_point,
        )
        fused, xla = _padded_flops_per_point((11,) * 5)
        assert fused == 2 * 3 * 128 * 11 * 128
        assert xla == 3 * 2 * 121 * 11 * 121

    def test_rule_reproduces_measured_ladder(self):
        from pychebyshev_tpu.ops.pallas_eval import (
            _FUSED_FLOP_MARGIN,
            _padded_flops_per_point,
            supports_fused,
        )
        # shapes the v5e sweep measured as fused wins / XLA wins
        wins = [(11,) * 5, (19,) * 5]
        losses = [(9,) * 5, (13,) * 5, (15,) * 5, (17,) * 5,
                  (33,) * 4, (9,) * 6]
        for shape in wins + losses:
            if not supports_fused(shape, "float32"):
                continue
            fused, xla = _padded_flops_per_point(shape)
            expected = shape in wins
            assert (fused <= _FUSED_FLOP_MARGIN * xla) == expected, shape

    def test_no_rp_group_branch(self):
        from pychebyshev_tpu.ops.pallas_eval import (
            _geometry,
            _padded_flops_per_point,
        )
        # find a supported small shape whose geometry has no rp group,
        # exercising the single-GEMV fused-FLOP branch
        for shape in [(5, 5, 5), (4, 4, 4), (3, 5, 7)]:
            geo = _geometry(tuple(shape))
            if not geo[2]:                      # rp_dims empty
                fused, _ = _padded_flops_per_point(tuple(shape))
                assert fused == 2 * geo[5] * geo[8]
                break
