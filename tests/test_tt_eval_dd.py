"""TT digit-GEMM serving tier (ops/tt_eval_dd.py).

Pins the accuracy contract of the near-f64 TT path against the f64
chain (the semantic definition), the cutoff knob, the class routing
(storage-frame discipline included), and the plan validation.
"""

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevTT
from pychebyshev_tpu.ops.tt_eval import tt_eval_batch
from pychebyshev_tpu.ops.tt_eval_dd import (
    FAST_PAIR_CUTOFF,
    tt_dd_plan,
    tt_eval_batch_dd,
    tt_supports_dd,
)


def _target(p, data=None):
    p = np.asarray(p, dtype=np.float64)
    if p.ndim == 1:
        p = p[None, :]
    return (np.exp(-p[:, 0]) * np.sin(p.sum(axis=1))
            + 0.1 * np.cos(3.0 * p[:, 2]))


@pytest.fixture(scope="module")
def tt5():
    tt = ChebyshevTT(_target, 5, [[0.0, 1.0]] * 5, [11] * 5,
                     max_rank=10, vectorized=True)
    tt.build(verbose=False)
    return tt


@pytest.fixture(scope="module")
def pts5():
    rng = np.random.default_rng(7)
    return rng.uniform(0.02, 0.98, (500, 5))


class TestOpsParity:
    def test_default_cutoff_is_f64_class(self, tt5, pts5):
        cores = tt5._coeff_cores
        dom = np.asarray(tt5.domain, dtype=np.float64)
        ref = np.asarray(tt_eval_batch(cores, dom, pts5))
        got = np.asarray(tt_eval_batch_dd(cores, dom, pts5))
        scale = np.max(np.abs(ref))
        assert np.max(np.abs(got - ref)) / scale < 1e-11

    def test_fast_cutoff_within_budget(self, tt5, pts5):
        cores = tt5._coeff_cores
        dom = np.asarray(tt5.domain, dtype=np.float64)
        ref = np.asarray(tt_eval_batch(cores, dom, pts5))
        got = np.asarray(tt_eval_batch_dd(cores, dom, pts5,
                                          cutoff=FAST_PAIR_CUTOFF))
        scale = np.max(np.abs(ref))
        dev = np.max(np.abs(got - ref)) / scale
        assert dev < 1e-8            # the mode="fast" contract
        assert dev > 1e-14           # and it really dropped pairs

    def test_single_node_dims_supported(self):
        # n_d == 1 cores (T_0-only stages) ride the same pipeline.
        tt = ChebyshevTT(_target, 3, [[0.0, 1.0]] * 3, [11, 2, 11],
                         max_rank=6, vectorized=True)
        tt.build(verbose=False)
        cores = tt._coeff_cores
        dom = np.asarray(tt.domain, dtype=np.float64)
        pts = np.random.default_rng(1).uniform(0.05, 0.95, (64, 3))
        ref = np.asarray(tt_eval_batch(cores, dom, pts))
        got = np.asarray(tt_eval_batch_dd(cores, dom, pts))
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-11


class TestPlanValidation:
    def test_plan_rejects_broken_bond_chain(self):
        assert not tt_dd_plan([(1, 5, 3), (2, 5, 1)])["ok"]

    def test_plan_rejects_open_boundary(self):
        assert not tt_dd_plan([(2, 5, 3), (3, 5, 1)])["ok"]
        assert not tt_dd_plan([(1, 5, 3), (3, 5, 2)])["ok"]

    def test_plan_rejects_huge_grids(self):
        assert not tt_supports_dd([(1, 1 << 20, 1)])

    def test_digit_width_shrinks_with_grid(self):
        assert tt_dd_plan([(1, 11, 1)])["b"] == 8
        assert tt_dd_plan([(1, 4096, 1)])["b"] == 4

    def test_eval_raises_outside_budget(self):
        with pytest.raises(ValueError, match="digit-GEMM budget"):
            tt_eval_batch_dd([np.zeros((1, 1 << 20, 1))],
                             [[0.0, 1.0]], np.zeros((4, 1)))


class TestClassRouting:
    def test_matches_eval_batch(self, tt5, pts5):
        ref = tt5.eval_batch(pts5)
        got = tt5.eval_batch_dd(pts5)
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-11

    def test_reordered_frame_parity(self, tt5, pts5):
        r = tt5.reorder([4, 3, 2, 1, 0])
        ref = tt5.eval_batch_dd(pts5)
        got = r.eval_batch_dd(pts5)
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-12)

    def test_fast_mode(self, tt5, pts5):
        ref = tt5.eval_batch(pts5)
        got = tt5.eval_batch_dd(pts5, mode="fast")
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-8

    def test_bad_mode_rejected(self, tt5, pts5):
        with pytest.raises(ValueError, match="mode"):
            tt5.eval_batch_dd(pts5, mode="extreme")

    def test_unbuilt_raises(self):
        t = ChebyshevTT(_target, 3, [[0.0, 1.0]] * 3, [9] * 3,
                        max_rank=4)
        with pytest.raises(RuntimeError, match="build"):
            t.eval_batch_dd(np.zeros((2, 3)))

    def test_algebra_derived_cores_not_served_stale(self, tt5, pts5):
        # The plane cache keys on core identity; a derived TT must get
        # its own planes, and the source must keep serving its values.
        before = tt5.eval_batch_dd(pts5)
        doubled = tt5 + tt5
        np.testing.assert_allclose(doubled.eval_batch_dd(pts5),
                                   2.0 * before, rtol=0, atol=1e-9)
        np.testing.assert_allclose(tt5.eval_batch_dd(pts5), before,
                                   rtol=0, atol=0)

    def test_analytic_derivative_rides_dd(self, tt5, pts5):
        d = tt5.differentiate([1, 0, 0, 0, 0])
        ref = d.eval_batch(pts5)
        got = d.eval_batch_dd(pts5)
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-10


def _target_b(p, data=None):
    p = np.asarray(p, dtype=np.float64)
    if p.ndim == 1:
        p = p[None, :]
    return np.cos(p[:, 0] * p[:, 1]) + 0.5 * np.sin(2.0 * p[:, 3])


@pytest.fixture(scope="module")
def tt5b():
    tt = ChebyshevTT(_target_b, 5, [[0.0, 1.0]] * 5, [11] * 5,
                     max_rank=8, vectorized=True)
    tt.build(verbose=False)
    return tt


class TestDigitGemmBook:
    """tt_eval_batch_dd_models: M same-grid TT models share the
    per-dim row planes; each adds only its ladders + rank chain."""

    def test_book_matches_per_model_dd(self, tt5, tt5b, pts5):
        from pychebyshev_tpu.ops.tt_eval_dd import tt_eval_batch_dd_models
        dom = np.asarray(tt5.domain, dtype=np.float64)
        models = (tuple(tt5._coeff_cores), tuple(tt5b._coeff_cores))
        got = np.asarray(tt_eval_batch_dd_models(models, dom, pts5))
        assert got.shape == (2, len(pts5))
        for m, cores in enumerate(models):
            want = np.asarray(tt_eval_batch_dd(cores, dom, pts5))
            scale = np.max(np.abs(want))
            assert np.max(np.abs(got[m] - want)) / scale < 1e-12

    def test_book_is_f64_class(self, tt5, tt5b, pts5):
        from pychebyshev_tpu.ops.tt_eval_dd import tt_eval_batch_dd_models
        dom = np.asarray(tt5.domain, dtype=np.float64)
        models = (tuple(tt5._coeff_cores), tuple(tt5b._coeff_cores))
        got = np.asarray(tt_eval_batch_dd_models(models, dom, pts5))
        for m, tt in enumerate((tt5, tt5b)):
            ref = np.asarray(tt_eval_batch(
                tt._coeff_cores, dom, pts5))
            scale = np.max(np.abs(ref))
            assert np.max(np.abs(got[m] - ref)) / scale < 1e-11

    def test_mismatched_grid_rejected(self, tt5, pts5):
        from pychebyshev_tpu.ops.tt_eval_dd import tt_eval_batch_dd_models
        tt9 = ChebyshevTT(_target_b, 5, [[0.0, 1.0]] * 5, [9] * 5,
                          max_rank=6, vectorized=True)
        tt9.build(verbose=False)
        dom = np.asarray(tt5.domain, dtype=np.float64)
        with pytest.raises(ValueError, match="one grid"):
            tt_eval_batch_dd_models(
                (tuple(tt5._coeff_cores), tuple(tt9._coeff_cores)),
                dom, pts5)

    def test_empty_book_rejected(self, pts5):
        from pychebyshev_tpu.ops.tt_eval_dd import tt_eval_batch_dd_models
        with pytest.raises(ValueError, match="non-empty"):
            tt_eval_batch_dd_models((), np.zeros((5, 2)), pts5)

    def test_multimodel_engine_dd_tt(self, tt5, tt5b, pts5):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        eng = MultiModelEvaluator([tt5, tt5b], dtype="dd",
                                  bucket_sizes=(256,))
        got = eng(pts5)
        assert got.shape == (2, len(pts5))
        for m, tt in enumerate((tt5, tt5b)):
            want = tt.eval_batch(pts5)
            scale = np.max(np.abs(want))
            assert np.max(np.abs(got[m] - want)) / scale < 1e-10

    def test_multimodel_engine_dd_tt_derivative_book(self, tt5, tt5b,
                                                     pts5):
        """Greek report: differentiate() models served as a dd book."""
        from pychebyshev_tpu.serving import MultiModelEvaluator
        eng = MultiModelEvaluator([tt5, tt5b],
                                  derivative_order=[1, 0, 0, 0, 0],
                                  dtype="dd", bucket_sizes=(256,))
        got = eng(pts5)
        for m, tt in enumerate((tt5, tt5b)):
            want = tt.differentiate([1, 0, 0, 0, 0]).eval_batch(pts5)
            scale = np.max(np.abs(want))
            assert np.max(np.abs(got[m] - want)) / scale < 1e-10
