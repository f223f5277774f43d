"""Hardware gates for the TPU-only paths (skipped off-TPU).

The CPU suite covers these kernels in interpret/fallback modes; this
file validates the real Mosaic/bf16 behavior on an actual chip:

    python -m pytest tests/test_tpu_hardware.py -q --no-header -p no:cacheprovider

(Do NOT force the CPU backend for this file — it skips itself there.)
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.ops import eval as eval_ops

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="requires TPU hardware")

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


@pytest.fixture(scope="module")
def check_points():
    rng = np.random.default_rng(7)
    return np.stack([rng.uniform(lo, hi, 2048) for lo, hi in DOMAIN],
                    axis=1)


def f64_ref(cheb, pts, orders=(0,) * 5):
    nodes, weights, diffs = cheb._grid_tuples()
    return np.asarray(eval_ops.eval_batch(
        cheb.tensor_values, nodes, weights, diffs, jnp.asarray(pts),
        orders))


class TestFusedPallasOnChip:
    def test_accuracy_vs_f64(self, cheb, check_points):
        from pychebyshev_tpu.ops.pallas_eval import fused_eval_batch
        nodes, weights, diffs = cheb._grid_tuples()
        ref = f64_ref(cheb, check_points)
        out = np.asarray(fused_eval_batch(
            cheb.tensor_values, nodes, weights, diffs,
            jnp.asarray(check_points, jnp.float32), (0,) * 5),
            dtype=np.float64)
        dev = np.abs(out - ref).max() / np.abs(ref).max()
        # in-kernel bf16x3: measured ~1.7e-5 scale-normalized
        assert dev < 1e-4

    def test_default_routing(self, cheb, check_points):
        out = np.asarray(cheb.eval_batch_f32(check_points),
                         dtype=np.float64)
        ref = f64_ref(cheb, check_points)
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4

    def test_stream_kernel_17pow5(self):
        # The two-level stream kernel (grid axis over the middle dim,
        # tmega blocked per slice) — 17^5 is past the one-level
        # envelope; verify it compiles under Mosaic and matches the
        # XLA f32 path on chip.
        from pychebyshev_tpu.ops.pallas_eval import (
            _pick_plan,
            fused_eval_batch,
        )
        assert _pick_plan((17,) * 5) == (2048, True)
        from pychebyshev_tpu.ops.chebyshev import (
            barycentric_weights_np,
            differentiation_matrix_np,
            nodes_for_dim_np,
        )
        rng = np.random.default_rng(11)
        nodes = [nodes_for_dim_np(-1.0, 1.0, 17) for _ in range(5)]
        weights = [barycentric_weights_np(nd) for nd in nodes]
        diffs = [differentiation_matrix_np(nd, w)
                 for nd, w in zip(nodes, weights)]
        tensor = rng.standard_normal((17,) * 5)
        pts = rng.uniform(-1, 1, (2048, 5))
        ref = np.asarray(eval_ops.eval_batch(
            jnp.asarray(tensor), tuple(map(jnp.asarray, nodes)),
            tuple(map(jnp.asarray, weights)),
            tuple(map(jnp.asarray, diffs)), jnp.asarray(pts),
            (0,) * 5))
        out = np.asarray(fused_eval_batch(
            tensor, nodes, weights, diffs,
            jnp.asarray(pts, jnp.float32)), dtype=np.float64)
        assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4


class TestDigitGemmOnChip:
    def test_xla_dd_accuracy(self, cheb, check_points):
        nodes, weights, diffs = cheb._grid_tuples()
        from pychebyshev_tpu.ops.eval_dd import eval_batch_dd
        ref = f64_ref(cheb, check_points)
        out = np.asarray(eval_batch_dd(
            cheb.tensor_values, nodes, weights, diffs,
            jnp.asarray(check_points), (0,) * 5))
        dev = np.abs(out - ref).max() / np.abs(ref).max()
        assert dev < 1e-10

    def test_mosaic_dd_matches_xla_dd(self, cheb, check_points):
        nodes, weights, diffs = cheb._grid_tuples()
        from pychebyshev_tpu.ops.eval_dd import eval_batch_dd
        from pychebyshev_tpu.ops.pallas_dd import fused_eval_batch_dd
        a = np.asarray(eval_batch_dd(
            cheb.tensor_values, nodes, weights, diffs,
            jnp.asarray(check_points[:512]), (0,) * 5))
        b = np.asarray(fused_eval_batch_dd(
            cheb.tensor_values, nodes, weights, diffs,
            check_points[:512], (0,) * 5, block=256))
        ref = f64_ref(cheb, check_points[:512])
        scale = np.abs(ref).max()
        assert np.abs(a - ref).max() / scale < 1e-10
        assert np.abs(b - ref).max() / scale < 1e-10


class TestPrecisionTiersOnChip:
    def test_f32_high_precision_matmuls(self, cheb, check_points):
        """The f32 XLA path must use bf16x3 (HIGH), not single-pass
        bf16: deviation from f64 stays ~1e-5, not ~1e-3."""
        nodes, weights, diffs = cheb._grid_tuples()
        t32 = cheb.tensor_values.astype(jnp.float32)
        g32 = tuple(tuple(a.astype(jnp.float32) for a in g)
                    for g in (nodes, weights, diffs))
        out = np.asarray(eval_ops.eval_batch(
            t32, g32[0], g32[1], g32[2],
            jnp.asarray(check_points, jnp.float32), (0,) * 5),
            dtype=np.float64)
        ref = f64_ref(cheb, check_points)
        dev = np.abs(out - ref).max() / np.abs(ref).max()
        assert dev < 3e-4, (
            f"f32 deviation {dev:.1e} suggests single-pass bf16 GEMMs")


class TestNarrowDomainRangeOnChip:
    def test_21_node_narrow_domain_finite(self):
        """Raw barycentric weights on a width-0.04 domain at n=21 exceed
        f32 range — and the TPU's emulated f64 has f32's RANGE, so
        without power-of-two weight normalization evaluation returns
        inf/NaN on device.  Regression gate for that normalization."""
        cheb = ChebyshevApproximation(bs_price, 5, DOMAIN, [21] * 5,
                                      vectorized=True)
        cheb.build(verbose=False)
        rng = np.random.default_rng(0)
        pts = np.stack([rng.uniform(lo, hi, 512) for lo, hi in DOMAIN],
                       axis=1)
        out = cheb.vectorized_eval_batch(pts, [0] * 5)
        assert np.isfinite(out).all()
        exact = bs_price(pts)
        keep = np.abs(exact) > 1.0
        rel = np.abs(out - exact)[keep] / np.abs(exact)[keep]
        assert rel.max() < 1e-6   # 21-node interpolation is ~1e-8


class TestServingTiersOnChip:
    def test_fused_default_engine_accuracy(self, cheb, check_points):
        from pychebyshev_tpu.serving import BatchedEvaluator
        eng = BatchedEvaluator(cheb, dtype=jnp.float32,
                               bucket_sizes=(4096,))
        assert eng._use_fused            # auto-resolved on TPU
        got = eng(check_points).astype(np.float64)
        want = np.asarray(cheb.eval_batch_device(
            jnp.asarray(check_points), (0,) * 5))
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 5e-5

    def test_dd_engine_near_f64_on_chip(self, cheb, check_points):
        from pychebyshev_tpu.serving import BatchedEvaluator
        eng = BatchedEvaluator(cheb, dtype="dd", bucket_sizes=(4096,))
        got = eng(check_points)
        want = np.asarray(cheb.eval_batch_device(
            jnp.asarray(check_points), (0,) * 5))
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-9

    def test_dd_fast_mode_ladder_on_chip(self, cheb, check_points):
        acc = np.asarray(cheb.eval_batch_dd(check_points,
                                            mode="accurate"))
        fast = np.asarray(cheb.eval_batch_dd(check_points, mode="fast"))
        want = np.asarray(cheb.eval_batch_device(
            jnp.asarray(check_points), (0,) * 5))
        scale = np.abs(want).max()
        dev_acc = np.abs(acc - want).max() / scale
        dev_fast = np.abs(fast - want).max() / scale
        assert dev_acc < 1e-9
        assert dev_fast < 1e-6


class TestRound3FixesOnChip:
    def test_fused_ragged_batches_share_padded_compiles(self, cheb,
                                                        check_points):
        # Pad/un-pad now lives outside the jitted pipeline: ragged Ns
        # must all evaluate correctly (and map to block-multiple
        # compiles rather than one compile per raw N).
        ref = f64_ref(cheb, check_points)
        for n in (100, 777, 1500, 2048):
            out = np.asarray(
                cheb.eval_batch_f32(check_points[:n], use_fused=True),
                dtype=np.float64)
            dev = np.abs(out - ref[:n]).max() / np.abs(ref).max()
            assert dev < 1e-4, (n, dev)

    def test_operand_cache_ignores_mutable_host_tensors(self, cheb,
                                                        check_points):
        from pychebyshev_tpu.ops.pallas_eval import fused_eval_batch
        nodes, weights, diffs = cheb._grid_tuples()
        nn = tuple(np.asarray(a) for a in nodes)
        ww = tuple(np.asarray(a) for a in weights)
        dd = tuple(np.asarray(a) for a in diffs)
        t = np.asarray(cheb.tensor_values).copy()
        pts = jnp.asarray(check_points[:512], jnp.float32)
        first = np.asarray(fused_eval_batch(t, nn, ww, dd, pts,
                                            (0,) * 5))
        t += 5.0
        second = np.asarray(fused_eval_batch(t, nn, ww, dd, pts,
                                             (0,) * 5))
        np.testing.assert_allclose(second, first + 5.0, atol=5e-2)

    def test_tt_device_core_cache_on_chip(self):
        from pychebyshev_tpu import ChebyshevTT
        tt = ChebyshevTT(lambda x, _: x[0] * x[1] + x[2], 3,
                         [[-1, 1]] * 3, [9, 9, 9], max_rank=4)
        tt.build(verbose=False)
        pts = np.random.default_rng(3).uniform(-0.9, 0.9, (1024, 3))
        a = tt.eval_batch(pts)
        b = tt.eval_batch(pts)  # served from cached device cores
        np.testing.assert_array_equal(a, b)
        want = pts[:, 0] * pts[:, 1] + pts[:, 2]
        np.testing.assert_allclose(a, want, atol=1e-6)


class TestTTDigitGemmOnChip:
    """The TT digit-GEMM chain's exactness claims under real TPU
    lowering: integer bf16 MXU products must accumulate exactly and the
    double-f32 rank chain must survive XLA's TPU passes (the CPU suite
    pins the same contract in the interpret path)."""

    def test_tt_dd_near_f64_on_chip(self):
        from pychebyshev_tpu import ChebyshevTT
        from pychebyshev_tpu.ops.tt_eval import tt_eval_batch
        from pychebyshev_tpu.ops.tt_eval_dd import tt_eval_batch_dd
        tt = ChebyshevTT(bs_price, 5, DOMAIN, [11] * 5, max_rank=12,
                         vectorized=True)
        tt.build(verbose=False, seed=1)
        cores = tuple(jnp.asarray(c) for c in tt._coeff_cores)
        dom = np.asarray(DOMAIN)
        pts = np.stack([np.random.default_rng(11).uniform(lo, hi, 2048)
                        for lo, hi in DOMAIN], axis=1)
        ref = np.asarray(tt_eval_batch(cores, dom, jnp.asarray(pts)))
        got = np.asarray(tt_eval_batch_dd(cores, dom, jnp.asarray(pts)))
        scale = np.abs(ref).max()
        assert np.abs(got - ref).max() / scale < 1e-11

    def test_tt_dd_fast_mode_on_chip(self):
        from pychebyshev_tpu import ChebyshevTT
        tt = ChebyshevTT(lambda x, _: np.exp(-x[:, 0]) *
                         np.sin(x.sum(axis=1)), 4, [[0, 1]] * 4,
                         [9] * 4, max_rank=8, vectorized=True)
        tt.build(verbose=False, seed=2)
        pts = np.random.default_rng(5).uniform(0.05, 0.95, (1024, 4))
        ref = tt.eval_batch(pts)
        fast = tt.eval_batch_dd(pts, mode="fast")
        scale = np.abs(ref).max()
        assert np.abs(fast - ref).max() / scale < 1e-8

    def test_grouped_supercore_chain_on_chip(self, cheb):
        # The round-4 north-star route under real Mosaic/XLA lowering:
        # exact-compression to_tt + grouped dd chain must stay inside
        # 1e-12 of the dense f64 path ON CHIP (the measured serving
        # config: 18.3M q/s @ 2.5e-13).
        tt = cheb.to_tt(tolerance=1e-13)
        pts = np.stack([np.random.default_rng(23).uniform(lo, hi, 2048)
                        for lo, hi in DOMAIN], axis=1)
        ref = np.asarray(cheb.vectorized_eval_batch(pts, [0] * 5))
        scale = np.abs(ref).max()
        grouped = tt.eval_batch_dd(pts, groups="auto")
        assert np.abs(grouped - ref).max() / scale < 1e-12
        per_dim = tt.eval_batch_dd(pts, groups=None)
        assert np.abs(grouped - per_dim).max() / scale < 1e-11


class TestSliderDigitGemmOnChip:
    def test_slider_dd_near_f64_on_chip(self):
        from pychebyshev_tpu import ChebyshevSlider
        D = 8
        w = np.linspace(0.5, 1.5, D)

        def basket(p, _=None):
            p = np.asarray(p, dtype=np.float64)
            return (np.sum(w * np.sin(p), axis=1)
                    + 0.25 * np.sum(p ** 2, axis=1))

        sl = ChebyshevSlider(basket, D, [[-1.0, 1.0]] * D, [9] * D,
                             [[i] for i in range(D)], [0.0] * D,
                             vectorized=True)
        sl.build(verbose=False)
        pts = np.random.default_rng(13).uniform(-1, 1, (2048, D))
        ref = sl.eval_batch(pts)
        got = sl.eval_batch_dd(pts)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-11


class TestMultiSpecDigitGemmOnChip:
    """Near-f64 Greek reports on real bf16 MXU hardware."""

    def test_slider_multispec_dd_on_chip(self):
        from pychebyshev_tpu import ChebyshevSlider
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        D = 6

        def basket(p, _=None):
            p = np.asarray(p, dtype=np.float64)
            return np.sum(np.sin(p), axis=1) + 0.2 * np.sum(p ** 2,
                                                            axis=1)

        sl = ChebyshevSlider(basket, D, [[-1.0, 1.0]] * D, [9] * D,
                             [[0, 1]] + [[i] for i in range(2, D)],
                             [0.0] * D, vectorized=True)
        sl.build(verbose=False)
        specs = [(0,) * D, (1, 0, 0, 0, 0, 0), (0, 0, 1, 0, 0, 0),
                 (0, 0, 1, 1, 0, 0)]
        eng = MultiSpecEvaluator(sl, specs, dtype="dd",
                                 bucket_sizes=(2048,))
        pts = np.random.default_rng(17).uniform(-1, 1, (2048, D))
        got = eng(pts)
        for m, s in enumerate(specs):
            want = sl.eval_batch(pts, list(s))
            scale = max(np.abs(want).max(), 1e-3)
            assert np.abs(got[:, m] - want).max() / scale < 1e-10, s

    def test_spline_multispec_dd_on_chip(self):
        from pychebyshev_tpu import ChebyshevSpline
        from pychebyshev_tpu.serving import MultiSpecEvaluator

        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) ** 3 + np.sin(x[1]),
            2, [[-1, 1], [-1, 1]], [11, 11], [[0.0], []])
        sp.build(verbose=False)
        specs = [(0, 0), (1, 0), (0, 1)]
        eng = MultiSpecEvaluator(sp, specs, dtype="dd",
                                 bucket_sizes=(1024,))
        rng = np.random.default_rng(19)
        pts = rng.uniform(-0.95, 0.95, (1500, 2))
        pts = pts[np.abs(pts[:, 0]) > 1e-2]
        got = eng(pts)
        for m, s in enumerate(specs):
            want = sp.vectorized_eval_batch(pts, list(s))
            scale = np.abs(want).max()
            assert np.abs(got[:, m] - want).max() / scale < 1e-10, s


class TestBatchedCalculusOnChip:
    """Session-8 surfaces: box-integration kernels + scenario calculus
    on the real chip (Mosaic-free — XLA contractions — but the arccos/
    cos moment rows and f64 GEMM chain deserve an on-silicon gate)."""

    def test_integrate_batch_parity_on_chip(self, cheb):
        rng = np.random.default_rng(23)
        dom = np.asarray(DOMAIN, dtype=np.float64)
        lo = rng.uniform(dom[:, 0], dom[:, 1], (16, 5))
        hi = lo + (dom[:, 1] - lo) * rng.uniform(0, 1, (16, 5))
        boxes = np.stack([lo, hi], axis=-1)
        boxes[0, 2, 1] = boxes[0, 2, 0]     # zero-measure dim
        got = cheb.integrate_batch(boxes)
        assert got[0] == 0.0
        want = np.array([
            cheb.integrate(bounds=[tuple(boxes[b, k]) for k in range(5)])
            for b in range(1, 4)
        ])
        scale = max(np.abs(want).max(), 1.0)
        assert np.abs(got[1:4] - want).max() / scale < 1e-12

    def test_integrate_dd_tier_on_chip(self, cheb):
        # The digit planes' MXU-exactness contract for QUADRATURE rows
        # (|w| <= 2, per-dim 2^-1 pre-scale) can only be proven on real
        # bf16 MXU dots — CPU f32 accumulation hides violations.
        rng = np.random.default_rng(31)
        dom = np.asarray(DOMAIN, dtype=np.float64)
        lo = rng.uniform(dom[:, 0], dom[:, 1], (32, 5))
        hi = lo + (dom[:, 1] - lo) * rng.uniform(0, 1, (32, 5))
        boxes = np.stack([lo, hi], axis=-1)
        boxes[0] = dom                       # full-domain box
        f64 = cheb.integrate_batch(boxes)
        dd = cheb.integrate_batch(boxes, dtype="dd")
        scale = max(1.0, np.abs(f64).max())
        assert np.abs(dd - f64).max() / scale < 1e-10

    def test_roots_batch_parity_on_chip(self, cheb):
        rng = np.random.default_rng(29)
        fixed = {1: rng.uniform(92.0, 108.0, 8),
                 2: rng.uniform(0.3, 1.9, 8),
                 3: rng.uniform(0.12, 0.48, 8),
                 4: 0.03}
        batch = cheb.roots_batch(dim=0, fixed=fixed)
        for b in (0, 7):
            per = cheb.roots(dim=0, fixed={d: (v[b] if np.ndim(v) else v)
                                           for d, v in fixed.items()})
            assert len(batch[b]) == len(per)
            if len(per):
                assert np.abs(batch[b] - per).max() < 1e-9
