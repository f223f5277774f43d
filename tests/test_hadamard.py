"""Node-wise product surrogates (``hadamard``) on dense/spline/TT.

Beyond-reference capability: the reference rejects interpolant x
interpolant multiplication; ``hadamard`` provides the node-wise product
with the documented degree-doubling caveat.  Polynomial factors at
sufficient N make the product exactly representable, pinning exactness.
"""

import math

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSpline,
    ChebyshevTT,
)


SQ = [[-1.0, 1.0], [0.0, 2.0]]


def pa(x, _):
    return x[0] ** 2 + 0.5 * x[1]          # degree 2


def pb(x, _):
    return 1.0 + x[0] * x[1]               # degree 2


@pytest.fixture(scope="module")
def dense_pair():
    a = ChebyshevApproximation(pa, 2, SQ, [9, 9])
    b = ChebyshevApproximation(pb, 2, SQ, [9, 9])
    a.build(verbose=False)
    b.build(verbose=False)
    return a, b


def _probe(rng=None):
    rng = rng or np.random.default_rng(4)
    return np.column_stack([rng.uniform(-0.95, 0.95, 30),
                            rng.uniform(0.05, 1.95, 30)])


class TestDenseHadamard:
    def test_polynomial_product_is_exact(self, dense_pair):
        a, b = dense_pair
        prod = a.hadamard(b)
        for p in _probe():
            want = pa(p, None) * pb(p, None)
            assert prod.eval(list(p), [0, 0]) == pytest.approx(
                want, abs=1e-11)

    def test_product_rule_derivative(self, dense_pair):
        a, b = dense_pair
        prod = a.hadamard(b)
        p = [0.4, 1.2]
        want = (2 * p[0]) * pb(p, None) + pa(p, None) * p[1]
        assert prod.eval(p, [1, 0]) == pytest.approx(want, abs=1e-10)

    def test_result_is_functionless_and_estimable(self, dense_pair):
        a, b = dense_pair
        prod = a.hadamard(b)
        assert prod.function is None
        assert np.isfinite(prod.error_estimate())

    def test_cross_type_rejected(self, dense_pair):
        a, _ = dense_pair
        with pytest.raises(TypeError, match="hadamard"):
            a.hadamard(3.0)

    def test_mismatched_grid_rejected(self, dense_pair):
        a, _ = dense_pair
        other = ChebyshevApproximation(pb, 2, SQ, [7, 9])
        other.build(verbose=False)
        with pytest.raises(ValueError):
            a.hadamard(other)

    def test_star_operator_still_rejects_objects(self, dense_pair):
        a, b = dense_pair
        with pytest.raises(TypeError):
            a * b  # reference parity: only hadamard() multiplies


class TestSplineHadamard:
    def test_per_piece_product_with_a_kink_factor(self):
        ka = ChebyshevSpline(lambda x, _: abs(x[0]) + 0.1 * x[1], 2,
                             SQ, [9, 9], [[0.0], []])
        kb = ChebyshevSpline(lambda x, _: 1.0 + 0.5 * x[1], 2,
                             SQ, [9, 9], [[0.0], []])
        ka.build(verbose=False)
        kb.build(verbose=False)
        prod = ka.hadamard(kb)
        for p in _probe():
            want = (abs(p[0]) + 0.1 * p[1]) * (1.0 + 0.5 * p[1])
            assert prod.eval(list(p), [0, 0]) == pytest.approx(
                want, abs=1e-9)

    def test_knot_mismatch_rejected(self):
        ka = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]],
                             [9], [[0.0]])
        kb = ChebyshevSpline(lambda x, _: abs(x[0] - 0.3), 1, [[-1, 1]],
                             [9], [[0.3]])
        ka.build(verbose=False)
        kb.build(verbose=False)
        with pytest.raises(ValueError):
            ka.hadamard(kb)


class TestTTHadamard:
    @pytest.fixture(scope="class")
    def tt_pair(self):
        dom = [[-1, 1], [0, 2], [-0.5, 0.5]]
        a = ChebyshevTT(lambda x, _: math.sin(x[0]) + x[1], 3, dom,
                        [9] * 3, max_rank=5)
        b = ChebyshevTT(lambda x, _: 0.5 * x[2] + 0.3 * x[1], 3, dom,
                        [9] * 3, max_rank=5)
        a.build(verbose=False)
        b.build(verbose=False)
        return a, b

    def test_matches_the_dense_product(self, tt_pair):
        a, b = tt_pair
        prod = a.hadamard(b, max_rank=12)
        rng = np.random.default_rng(8)
        pts = np.column_stack([rng.uniform(-0.9, 0.9, 40),
                               rng.uniform(0.1, 1.9, 40),
                               rng.uniform(-0.45, 0.45, 40)])
        got = prod.eval_batch(pts)
        want = a.eval_batch(pts) * b.eval_batch(pts)
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_rank_cap_is_respected(self, tt_pair):
        a, b = tt_pair
        capped = a.hadamard(b, max_rank=3)
        assert max(capped.tt_ranks) <= 3

    def test_default_rank_is_the_pair_max(self, tt_pair):
        a, b = tt_pair
        prod = a.hadamard(b)
        assert prod.max_rank == max(a.max_rank, b.max_rank)

    def test_frame_mismatch_raises_the_reorder_hint(self, tt_pair):
        a, b = tt_pair
        with pytest.raises(ValueError, match="reorder"):
            a.hadamard(b.reorder([2, 0, 1]))

    def test_result_supports_downstream_calculus(self, tt_pair):
        a, b = tt_pair
        prod = a.hadamard(b, max_rank=12)
        assert np.isfinite(prod.integrate())
        thin = prod.slice((1, 1.0))
        assert thin.num_dimensions == 2
