"""Seeded randomized consistency across all four interpolant families.

Property-style sweep: random polynomial targets (exactly representable
by every family at sufficient N) over random domains must produce
matching values, derivatives, integrals, and transforms from
ChebyshevApproximation, ChebyshevSpline, ChebyshevSlider (additive
targets), and ChebyshevTT.  Complements the per-family suites with
cross-family agreement on randomized configurations.
"""

import math

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)


def _random_domain(rng, dims):
    lo = rng.uniform(-3.0, 1.0, dims)
    return [[float(l), float(l + rng.uniform(0.5, 3.0))] for l in lo]


def _random_poly2(rng):
    """Random 2-D polynomial of degree <= 3 per dim + its exact calculus."""
    c = rng.uniform(-2.0, 2.0, (4, 4))

    def f(x, _):
        return float(sum(c[i, j] * x[0] ** i * x[1] ** j
                         for i in range(4) for j in range(4)))

    def dfdx(x):
        return float(sum(i * c[i, j] * x[0] ** (i - 1) * x[1] ** j
                         for i in range(1, 4) for j in range(4)))

    def integral(dom):
        (a, b), (p, q) = dom
        return float(sum(
            c[i, j]
            * (b ** (i + 1) - a ** (i + 1)) / (i + 1)
            * (q ** (j + 1) - p ** (j + 1)) / (j + 1)
            for i in range(4) for j in range(4)))

    return f, dfdx, integral


@pytest.mark.parametrize("seed", [3, 17, 92])
class TestPolynomialAgreement:
    def test_all_families_reproduce_the_polynomial(self, seed):
        rng = np.random.default_rng(seed)
        dom = _random_domain(rng, 2)
        f, dfdx, integral = _random_poly2(rng)

        dense = ChebyshevApproximation(f, 2, dom, [7, 7])
        dense.build(verbose=False)
        mid0 = 0.5 * (dom[0][0] + dom[0][1])
        sp = ChebyshevSpline(f, 2, dom, [7, 7], knots=[[mid0], []])
        sp.build(verbose=False)
        tt = ChebyshevTT(f, 2, dom, [7, 7], max_rank=7)
        tt.build(verbose=False, seed=0)

        pts = np.column_stack([
            rng.uniform(dom[0][0], dom[0][1], 40),
            rng.uniform(dom[1][0], dom[1][1], 40)])
        want = np.array([f(p, None) for p in pts])
        scale = max(1.0, np.abs(want).max())

        got_d = np.asarray(dense.vectorized_eval_batch(pts, [0, 0]))
        got_s = np.asarray(sp.eval_batch(pts, [0, 0]))
        got_t = np.asarray(tt.eval_batch(pts))
        np.testing.assert_allclose(got_d / scale, want / scale,
                                   atol=1e-11)
        np.testing.assert_allclose(got_s / scale, want / scale,
                                   atol=1e-11)
        np.testing.assert_allclose(got_t / scale, want / scale,
                                   atol=1e-9)

    def test_first_derivatives_agree_with_closed_form(self, seed):
        rng = np.random.default_rng(seed)
        dom = _random_domain(rng, 2)
        f, dfdx, _ = _random_poly2(rng)

        dense = ChebyshevApproximation(f, 2, dom, [7, 7])
        dense.build(verbose=False)
        sp = ChebyshevSpline(
            f, 2, dom, [7, 7],
            knots=[[0.5 * (dom[0][0] + dom[0][1])], []])
        sp.build(verbose=False)

        p = [rng.uniform(dom[0][0] + 0.1, dom[0][1] - 0.1),
             rng.uniform(dom[1][0] + 0.1, dom[1][1] - 0.1)]
        want = dfdx(p)
        scale = max(1.0, abs(want))
        assert dense.eval(p, [1, 0]) / scale == pytest.approx(
            want / scale, abs=1e-10)
        assert sp.eval(p, [1, 0]) / scale == pytest.approx(
            want / scale, abs=1e-10)

    def test_integrals_match_the_antiderivative(self, seed):
        rng = np.random.default_rng(seed)
        dom = _random_domain(rng, 2)
        f, _, integral = _random_poly2(rng)
        want = integral(dom)
        scale = max(1.0, abs(want))

        dense = ChebyshevApproximation(f, 2, dom, [7, 7])
        dense.build(verbose=False)
        assert dense.integrate() / scale == pytest.approx(
            want / scale, abs=1e-11)

        tt = ChebyshevTT(f, 2, dom, [7, 7], max_rank=7)
        tt.build(verbose=False, seed=0)
        assert tt.integrate() / scale == pytest.approx(
            want / scale, abs=1e-9)

        sp = ChebyshevSpline(
            f, 2, dom, [7, 7],
            knots=[[], [0.5 * (dom[1][0] + dom[1][1])]])
        sp.build(verbose=False)
        assert sp.integrate() / scale == pytest.approx(
            want / scale, abs=1e-10)


@pytest.mark.parametrize("seed", [5, 41])
class TestAdditiveSliderAgreement:
    def test_slider_matches_dense_on_additive_targets(self, seed):
        rng = np.random.default_rng(seed)
        dims = 4
        dom = _random_domain(rng, dims)
        a = rng.uniform(-1.5, 1.5, dims)
        b = rng.uniform(-1.0, 1.0, dims)

        def f(x, _):
            return float(sum(a[d] * x[d] ** 2 + b[d] * x[d]
                             for d in range(dims)))

        pivot = [0.5 * (lo + hi) for lo, hi in dom]
        sl = ChebyshevSlider(f, dims, dom, [6] * dims,
                             partition=[[0, 1], [2], [3]],
                             pivot_point=pivot)
        sl.build(verbose=False)
        dense = ChebyshevApproximation(f, dims, dom, [6] * dims,
                                       vectorized=False)
        dense.build(verbose=False)

        pts = np.column_stack([
            rng.uniform(lo, hi, 25) for lo, hi in dom])
        got = np.asarray(sl.eval_batch(pts, [0] * dims))
        want = np.asarray(dense.vectorized_eval_batch(pts, [0] * dims))
        scale = max(1.0, np.abs(want).max())
        np.testing.assert_allclose(got / scale, want / scale, atol=1e-10)

        # Per-group derivative routing agrees too.
        spec = [0] * dims
        spec[2] = 1
        got_d = np.asarray(sl.eval_batch(pts, spec))
        want_d = np.asarray(dense.vectorized_eval_batch(pts, spec))
        dscale = max(1.0, np.abs(want_d).max())
        np.testing.assert_allclose(got_d / dscale, want_d / dscale,
                                   atol=1e-10)

    def test_slider_integral_matches_dense(self, seed):
        rng = np.random.default_rng(seed)
        dom = _random_domain(rng, 3)

        def f(x, _):
            return math.sin(x[0]) + x[1] ** 3 + 0.5 * x[2]

        pivot = [0.5 * (lo + hi) for lo, hi in dom]
        sl = ChebyshevSlider(f, 3, dom, [9] * 3,
                             partition=[[0], [1], [2]],
                             pivot_point=pivot)
        sl.build(verbose=False)
        dense = ChebyshevApproximation(f, 3, dom, [9] * 3)
        dense.build(verbose=False)
        scale = max(1.0, abs(dense.integrate()))
        assert sl.integrate() / scale == pytest.approx(
            dense.integrate() / scale, abs=1e-9)


@pytest.mark.parametrize("seed", [11, 73])
class TestTransformAgreement:
    def test_slice_of_each_family_matches_dense_slice(self, seed):
        rng = np.random.default_rng(seed)
        dom = _random_domain(rng, 3)

        def f(x, _):
            return (math.cos(x[0]) * (1 + 0.3 * x[1])
                    + 0.2 * x[2] ** 2)

        cut = rng.uniform(dom[1][0] + 0.1, dom[1][1] - 0.1)
        dense = ChebyshevApproximation(f, 3, dom, [8] * 3)
        dense.build(verbose=False)
        tt = ChebyshevTT(f, 3, dom, [8] * 3, max_rank=6)
        tt.build(verbose=False, seed=0)

        dthin = dense.slice((1, cut))
        tthin = tt.slice((1, cut))
        p = [rng.uniform(dom[0][0], dom[0][1]),
             rng.uniform(dom[2][0], dom[2][1])]
        assert tthin.eval(p) == pytest.approx(
            dthin.eval(p, [0, 0]), abs=1e-8)

    def test_extrude_of_each_family_is_constant_in_the_new_dim(self, seed):
        rng = np.random.default_rng(seed)
        dom = _random_domain(rng, 2)

        def f(x, _):
            return math.sin(x[0]) * x[1]

        dense = ChebyshevApproximation(f, 2, dom, [8, 8])
        dense.build(verbose=False)
        tt = ChebyshevTT(f, 2, dom, [8, 8], max_rank=5)
        tt.build(verbose=False, seed=0)

        new_dom = (-1.0, 4.0)
        dfat = dense.extrude((2, new_dom, 4))
        tfat = tt.extrude((2, new_dom, 4))
        p = [rng.uniform(dom[0][0], dom[0][1]),
             rng.uniform(dom[1][0], dom[1][1])]
        for t in (-0.5, 1.7, 3.9):
            assert dfat.eval(p + [t], [0, 0, 0]) == pytest.approx(
                dense.eval(p, [0, 0]), abs=1e-11)
            assert tfat.eval(p + [t]) == pytest.approx(
                tt.eval(p), abs=1e-9)


@pytest.mark.parametrize("seed", [5, 21])
class TestEvalPathAgreement:
    """Every dense eval path must agree on random polynomial targets:
    host single, host batch, device batch, dd, serving engine, and the
    multi-spec column (the reference's cross-path consistency property,
    randomized)."""

    def test_all_dense_paths_agree(self, seed):
        import jax.numpy as jnp

        from pychebyshev_tpu.serving import (
            BatchedEvaluator,
            MultiSpecEvaluator,
        )

        rng = np.random.default_rng(seed)
        dom = _random_domain(rng, 2)
        f, dfdx, _ = _random_poly2(rng)
        dense = ChebyshevApproximation(f, 2, dom, [7, 7])
        dense.build(verbose=False)

        lo = np.array([b[0] for b in dom])
        hi = np.array([b[1] for b in dom])
        pts = lo + (hi - lo) * rng.random((40, 2))

        single = np.array([dense.vectorized_eval(list(p), [0, 0])
                           for p in pts])
        host = np.asarray(dense.eval_batch_host(pts, [0, 0]))
        dev = np.asarray(dense.eval_batch_device(pts, [0, 0]))
        dd = np.asarray(dense.eval_batch_dd(pts))
        engine = BatchedEvaluator(dense, dtype=jnp.float64,
                                  bucket_sizes=(64,))(pts)
        multi = np.asarray(MultiSpecEvaluator(
            dense, [[0, 0], [1, 0]], dtype=jnp.float64,
            bucket_sizes=(64,))(pts))

        scale = max(1.0, np.abs(single).max())
        for other in (host, dev, dd, engine, multi[:, 0]):
            np.testing.assert_allclose(other / scale, single / scale,
                                       rtol=0, atol=1e-10)
        want_dx = np.array([dfdx(p) for p in pts])
        np.testing.assert_allclose(multi[:, 1] / scale, want_dx / scale,
                                   rtol=0, atol=1e-8)


@pytest.mark.parametrize("seed", [8, 44])
class TestRandomAlgebraChains:
    def test_dense_chain_matches_pointwise(self, seed):
        rng = np.random.default_rng(seed)
        dom = _random_domain(rng, 2)
        fa, _, _ = _random_poly2(rng)
        fb, _, _ = _random_poly2(rng)
        a = ChebyshevApproximation(fa, 2, dom, [6, 6])
        a.build(verbose=False)
        b = ChebyshevApproximation(fb, 2, dom, [6, 6])
        b.build(verbose=False)

        chain = (a * 2.0 - b) / 1.5 + a
        lo = np.array([bd[0] for bd in dom])
        hi = np.array([bd[1] for bd in dom])
        pts = lo + (hi - lo) * rng.random((15, 2))
        got = np.array([chain.vectorized_eval(list(p), [0, 0])
                        for p in pts])
        want = np.array([(2.0 * fa(p, None) - fb(p, None)) / 1.5
                         + fa(p, None) for p in pts])
        scale = max(1.0, np.abs(want).max())
        np.testing.assert_allclose(got / scale, want / scale,
                                   rtol=0, atol=1e-11)


@pytest.mark.parametrize("seed", [11, 37])
class TestRandomRoots:
    def test_every_family_finds_the_planted_root(self, seed):
        rng = np.random.default_rng(seed)
        lo = float(rng.uniform(-2.0, 0.0))
        hi = lo + float(rng.uniform(2.0, 4.0))
        root = float(rng.uniform(lo + 0.3, hi - 0.3))

        def f1(x, _=None):
            return (x[0] - root) * (1.0 + 0.25 * (x[0] - lo))

        dense = ChebyshevApproximation(f1, 1, [[lo, hi]], [9])
        dense.build(verbose=False)
        assert np.min(np.abs(dense.roots() - root)) < 1e-9

        mid = (lo + hi) / 2.0
        spline = ChebyshevSpline(f1, 1, [[lo, hi]], [7], [[mid]])
        spline.build(verbose=False)
        assert np.min(np.abs(spline.roots() - root)) < 1e-9

        tt = ChebyshevTT(
            lambda p, _=None: (np.asarray(p)[:, 0] - root)
            * (1.0 + 0.25 * (np.asarray(p)[:, 0] - lo)),
            1, [[lo, hi]], [9], max_rank=3, vectorized=True)
        tt.build(verbose=False, seed=0)
        assert np.min(np.abs(tt.roots() - root)) < 1e-8


@pytest.mark.parametrize("seed", [5, 23, 71])
class TestToTTConversionAgreement:
    """to_tt (dense and slider) under randomized targets/domains."""

    def test_dense_to_tt_reproduces_the_polynomial(self, seed):
        rng = np.random.default_rng(seed)
        dom = _random_domain(rng, 2)
        f, _, _ = _random_poly2(rng)
        dense = ChebyshevApproximation(f, 2, dom, [7, 7])
        dense.build(verbose=False)
        tt = dense.to_tt(tolerance=1e-13)
        pts = np.stack([rng.uniform(lo, hi, 50) for lo, hi in dom],
                       axis=1)
        want = np.asarray(dense.vectorized_eval_batch(pts, [0, 0]))
        got = np.asarray(tt.eval_batch(pts))
        scale = max(np.abs(want).max(), 1.0)
        assert np.abs(got - want).max() < 1e-10 * scale

    def test_slider_to_tt_roundtrip_random_partition(self, seed):
        rng = np.random.default_rng(seed)
        dims = int(rng.integers(3, 6))
        dom = _random_domain(rng, dims)
        perm = list(rng.permutation(dims))
        # Random contiguous cut of a random dim permutation.
        cut = int(rng.integers(1, dims))
        partition = [sorted(int(d) for d in perm[:cut]),
                     sorted(int(d) for d in perm[cut:])]
        coef = rng.uniform(-1.5, 1.5, dims)

        def f(points, _):
            p = np.asarray(points)
            g1 = np.prod(np.cos(p[:, partition[0]]), axis=1)
            g2 = (p[:, partition[1]] * coef[partition[1]]).sum(axis=1)
            return g1 + g2

        pivot = [float(0.5 * (lo + hi)) for lo, hi in dom]
        s = ChebyshevSlider(f, dims, dom, [7] * dims,
                            partition=partition, pivot_point=pivot,
                            vectorized=True)
        s.build(verbose=False)
        tt = s.to_tt()
        pts = np.stack([rng.uniform(lo, hi, 60) for lo, hi in dom],
                       axis=1)
        want = np.asarray(s.eval_batch(pts, [0] * dims))
        got = np.asarray(tt.eval_batch(pts))
        scale = max(np.abs(want).max(), 1.0)
        assert np.abs(got - want).max() < 1e-11 * scale
        # and the TT round-trips through the dense frame
        back = tt.to_dense()
        assert back.shape == tuple(7 for _ in range(dims))


@pytest.mark.parametrize("seed", [7, 23, 61])
class TestBatchedCalculusAgreement:
    """Randomized batched-calculus properties: integrate_batch against
    the closed-form antiderivative, partial_integrate_batch against the
    per-call composition, roots_batch against the per-call rootfinder —
    random polynomial targets, random domains, random boxes."""

    def test_integrate_batch_matches_antiderivative(self, seed):
        rng = np.random.default_rng(seed)
        dom = _random_domain(rng, 2)
        f, _, integral = _random_poly2(rng)
        dense = ChebyshevApproximation(f, 2, dom, [7, 7])
        dense.build(verbose=False)
        mid1 = 0.5 * (dom[1][0] + dom[1][1])
        sp = ChebyshevSpline(f, 2, dom, [7, 7], knots=[[], [mid1]])
        sp.build(verbose=False)
        tt = ChebyshevTT(f, 2, dom, [7, 7], max_rank=7,
                         tolerance=1e-12)
        tt.build(verbose=False, seed=0)

        n_boxes = 11
        lo = np.stack([rng.uniform(a, b, n_boxes) for a, b in dom], 1)
        hi = lo + ([b for _, b in dom] - lo) * rng.uniform(
            0, 1, (n_boxes, 2))
        boxes = np.stack([lo, hi], axis=-1)
        want = np.array([
            integral([tuple(boxes[b, 0]), tuple(boxes[b, 1])])
            for b in range(n_boxes)])
        scale = max(1.0, np.abs(want).max())
        for model, tol in ((dense, 1e-11), (sp, 1e-11), (tt, 1e-9)):
            got = model.integrate_batch(boxes)
            np.testing.assert_allclose(got / scale, want / scale,
                                       atol=tol)

    def test_partial_integrate_matches_per_call(self, seed):
        rng = np.random.default_rng(seed + 100)
        dom = _random_domain(rng, 2)
        f, _, _ = _random_poly2(rng)
        dense = ChebyshevApproximation(f, 2, dom, [7, 7])
        dense.build(verbose=False)
        n = 9
        lo = rng.uniform(dom[0][0], dom[0][1], n)
        hi = lo + (dom[0][1] - lo) * rng.uniform(0, 1, n)
        boxes = np.stack([lo, hi], axis=-1)[:, None, :]
        pts = rng.uniform(dom[1][0], dom[1][1], (n, 1))
        got = dense.partial_integrate_batch([0], boxes, pts)
        want = np.array([
            dense.integrate(dims=0, bounds=tuple(boxes[b, 0]))
            .vectorized_eval([pts[b, 0]], [0]) for b in range(n)])
        scale = max(1.0, np.abs(want).max())
        np.testing.assert_allclose(got / scale, want / scale,
                                   atol=1e-12)

    def test_roots_batch_matches_per_call(self, seed):
        rng = np.random.default_rng(seed + 200)
        dom = _random_domain(rng, 2)
        f, _, _ = _random_poly2(rng)
        dense = ChebyshevApproximation(f, 2, dom, [7, 7])
        dense.build(verbose=False)
        fx = rng.uniform(dom[1][0], dom[1][1], 8)
        batch = dense.roots_batch(dim=0, fixed={1: fx})
        for b in range(8):
            per = dense.roots(dim=0, fixed={1: float(fx[b])})
            # Bitwise parity holds at the roots_1d_batch level (same
            # slice values); the class paths resample vs slice, whose
            # values differ in the last ulp -> ~1e-14 on the roots.
            assert len(batch[b]) == len(per)
            np.testing.assert_allclose(batch[b], per, rtol=0,
                                       atol=1e-10)
