"""Scalar-function composition on TT surrogates (Clenshaw in TT arithmetic).

``tt.compose(g)`` builds g(f) from an existing TT without re-sampling
f — Chebyshev expansion of g on f's range, evaluated with rounded
hadamard products.  Pins: agreement with pointwise g(f), consistency
with hadamard for polynomial g, rank discovery (exp of an additive f is
exactly rank 1), cap enforcement, and the validation surface.
"""

import math

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevTT


DOM = [[-1.0, 1.0], [0.0, 2.0], [-0.5, 0.5]]


def additive(x, _):
    return math.sin(x[0]) + 0.4 * x[1] + 0.2 * x[2]


@pytest.fixture(scope="module")
def base():
    tt = ChebyshevTT(additive, 3, DOM, [9, 9, 9], max_rank=5)
    tt.build(verbose=False)
    return tt


def _pts(n=200, seed=0):
    rng = np.random.default_rng(seed)
    lo = np.array([b[0] for b in DOM])
    hi = np.array([b[1] for b in DOM])
    return lo + (hi - lo) * rng.uniform(0.05, 0.95, (n, 3))


class TestComposeAccuracy:
    def test_exp_matches_pointwise_composition(self, base):
        # Pointwise accuracy is grid-limited: the node-wise Chebyshev
        # powers alias onto the shared 9-point grid, so the result is
        # the grid's interpolant of exp(f) (~8e-6 here).
        comp = base.compose(np.exp, degree=24, max_rank=16)
        pts = _pts()
        want = np.exp(base.eval_batch(pts))
        np.testing.assert_allclose(comp.eval_batch(pts), want,
                                   atol=3e-5)

    def test_matches_a_direct_build_of_the_composition(self, base):
        # The honest contract: compose == building g(f(x)) on the SAME
        # grid, to near-roundoff.
        comp = base.compose(np.exp, degree=24, max_rank=16)
        direct = ChebyshevTT(
            lambda x, _: math.exp(additive(x, None)), 3, DOM,
            [9, 9, 9], max_rank=16)
        direct.build(verbose=False)
        pts = _pts(150, seed=2)
        np.testing.assert_allclose(comp.eval_batch(pts),
                                   direct.eval_batch(pts), atol=1e-8)

    def test_exp_of_additive_is_rank_one(self, base):
        # exp(a+b+c) = exp(a)exp(b)exp(c): separable, so the rounded
        # composition should discover bond ranks of exactly 1.
        comp = base.compose(np.exp, degree=24, max_rank=16)
        assert max(comp.tt_ranks) == 1

    def test_polynomial_g_matches_hadamard_power(self, base):
        sq = base.compose(lambda v: v * v, degree=4, max_rank=12)
        had = base.hadamard(base, max_rank=12)
        pts = _pts(80, seed=3)
        np.testing.assert_allclose(sq.eval_batch(pts),
                                   had.eval_batch(pts), atol=1e-12)

    def test_explicit_range_overrides_sampling(self, base):
        comp = base.compose(np.tanh, degree=24, f_range=(-2.0, 2.0),
                            max_rank=12)
        pts = _pts(100, seed=5)
        want = np.tanh(base.eval_batch(pts))
        np.testing.assert_allclose(comp.eval_batch(pts), want,
                                   atol=5e-4)  # grid-limited (9 nodes)

    def test_nonseparable_argument(self):
        def coupled(x, _):
            return 0.5 * x[0] * x[1] + 0.3 * x[2]

        tt = ChebyshevTT(coupled, 3, DOM, [9, 9, 9], max_rank=5)
        tt.build(verbose=False)
        comp = tt.compose(np.exp, degree=20, max_rank=20)
        pts = _pts(150, seed=7)
        want = np.exp(tt.eval_batch(pts))
        np.testing.assert_allclose(comp.eval_batch(pts), want,
                                   rtol=1e-6, atol=1e-7)


class TestComposeContract:
    def test_rank_cap_is_enforced(self, base):
        comp = base.compose(np.exp, degree=16, max_rank=3)
        assert max(comp.tt_ranks) <= 3

    def test_degree_validation(self, base):
        with pytest.raises(ValueError, match="degree"):
            base.compose(np.exp, degree=0)

    def test_range_validation(self, base):
        with pytest.raises(ValueError, match="f_range"):
            base.compose(np.exp, f_range=(1.0, 1.0))

    def test_unbuilt_raises(self):
        tt = ChebyshevTT(additive, 3, DOM, [9, 9, 9], max_rank=5)
        with pytest.raises(RuntimeError):
            tt.compose(np.exp)

    def test_result_is_a_standalone_tt(self, base):
        comp = base.compose(np.exp, degree=16, max_rank=8)
        assert comp.function is None
        assert np.isfinite(comp.integrate())
        p = [0.3, 1.2, 0.1]
        assert comp.eval(p) == pytest.approx(
            math.exp(base.eval(p)), abs=1e-5)

    def test_composition_in_a_permuted_frame(self, base):
        perm = base.reorder([2, 0, 1])
        comp = perm.compose(np.exp, degree=20, max_rank=12)
        pts = _pts(60, seed=11)
        want = np.exp(base.eval_batch(pts))
        np.testing.assert_allclose(comp.eval_batch(pts), want,
                                   atol=3e-5)  # grid-limited


class TestDenseAndSplineCompose:
    def test_dense_compose_matches_direct_build(self):
        from pychebyshev_tpu import ChebyshevApproximation
        f = lambda x, _: math.sin(x[0]) + 0.4 * x[1]
        base = ChebyshevApproximation(f, 2, [[-1, 1], [0, 2]], [11, 11])
        base.build(verbose=False)
        comp = base.compose(np.exp)
        direct = ChebyshevApproximation(
            lambda x, _: math.exp(f(x, None)), 2, [[-1, 1], [0, 2]],
            [11, 11])
        direct.build(verbose=False)
        for p in ([0.3, 1.2], [-0.7, 0.4], [0.9, 1.9]):
            assert comp.eval(p, [0, 0]) == pytest.approx(
                direct.eval(p, [0, 0]), abs=1e-13)

    def test_dense_compose_shape_guard(self):
        from pychebyshev_tpu import ChebyshevApproximation
        base = ChebyshevApproximation(lambda x, _: x[0], 1, [[-1, 1]],
                                      [7])
        base.build(verbose=False)
        with pytest.raises(ValueError, match="elementwise"):
            base.compose(lambda v: np.sum(v))

    def test_spline_compose_is_per_piece(self):
        from pychebyshev_tpu import ChebyshevSpline
        sp = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]],
                             [11], [[0.0]])
        sp.build(verbose=False)
        comp = sp.compose(lambda v: v ** 2 + 1.0)
        for x in (-0.8, -0.2, 0.0, 0.5):
            assert comp.eval([x], [0]) == pytest.approx(
                x ** 2 + 1.0, abs=1e-11)  # |x|^2 = x^2, exactly representable

    def test_tt_and_dense_compose_agree(self, base):
        from pychebyshev_tpu import ChebyshevApproximation
        dense = ChebyshevApproximation(additive, 3, DOM, [9, 9, 9])
        dense.build(verbose=False)
        dcomp = dense.compose(np.exp)
        tcomp = base.compose(np.exp, degree=24, max_rank=16)
        pts = _pts(100, seed=13)
        got_t = tcomp.eval_batch(pts)
        got_d = np.array([dcomp.eval(list(p), [0, 0, 0]) for p in pts])
        np.testing.assert_allclose(got_t, got_d, atol=1e-7)


class TestReviewRegressions:
    def test_core_cache_survives_id_recycling(self, base):
        """Cache entries pin the keyed ndarrays, so allocator id reuse
        after repeated core replacement cannot serve stale cores."""
        work = base.clone()
        pts = _pts(40, seed=17)
        before = work.eval_batch(pts)
        # Two generations of pure replacement (the id-reuse window).
        work.orth_left(work.num_dimensions - 1)
        work.eval_batch(pts)
        work.orth_right(0)
        np.testing.assert_allclose(work.eval_batch(pts), before,
                                   atol=1e-10)
        # Scaling replaces cores again: results must track immediately.
        work *= 3.0
        np.testing.assert_allclose(work.eval_batch(pts), 3.0 * before,
                                   atol=1e-9)

    def test_log_outside_domain_is_a_clear_error(self):
        def positive(x, _):
            # min 0.001, max ~1.0: the 5% range pad crosses zero.
            return 0.001 + x[0] ** 2

        tt = ChebyshevTT(positive, 1, [[-1.0, 1.0]], [9], max_rank=3)
        tt.build(verbose=False)
        with pytest.raises(ValueError, match="f_range"):
            tt.compose(np.log, degree=16)
        # Explicit range inside g's domain works.
        safe = tt.compose(np.log, degree=24, f_range=(0.0005, 1.1))
        assert np.isfinite(safe.eval([0.5]))

    def test_intermediates_honor_a_tighter_cap(self, base):
        comp = base.compose(np.exp, degree=12, max_rank=2)
        assert max(comp.tt_ranks) <= 2
        assert comp.max_rank == 2

    def test_dense_compose_pins_the_dtype(self):
        from pychebyshev_tpu import ChebyshevApproximation
        import jax.numpy as jnp
        c = ChebyshevApproximation(lambda x, _: x[0], 1, [[-1, 1]], [7])
        c.build(verbose=False)
        comp = c.compose(lambda v: v > 0)  # bool-returning g
        assert comp.tensor_values.dtype == c.tensor_values.dtype
