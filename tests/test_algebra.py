"""Cross-class algebra: operator results vs pointwise arithmetic of the
operands, in-place variants, scalar ops, and compatibility errors —
repo-native coverage of the behaviors reference ``test_algebra.py``
(80 tests) pins."""

import math

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)

DOM2 = [[-1.0, 1.0], [0.0, 2.0]]


def dense(fn, n=(6, 5)):
    c = ChebyshevApproximation(fn, 2, DOM2, list(n))
    c.build(verbose=False)
    return c


@pytest.fixture(scope="module")
def pair():
    a = dense(lambda x, _: math.sin(x[0]) + x[1])
    b = dense(lambda x, _: math.cos(x[0]) * (1.0 + 0.5 * x[1]))
    return a, b


PTS = [[0.3, 0.7], [-0.9, 1.9], [0.0, 1.0], [0.99, 0.01]]


class TestDenseOperators:
    @pytest.mark.parametrize("op", ["add", "sub"])
    def test_pointwise(self, pair, op):
        a, b = pair
        combined = (a + b) if op == "add" else (a - b)
        for pt in PTS:
            va, vb = a.eval(pt, [0, 0]), b.eval(pt, [0, 0])
            want = va + vb if op == "add" else va - vb
            assert abs(combined.eval(pt, [0, 0]) - want) \
                < 1e-11 * max(1.0, abs(want))

    def test_scalar_ops(self, pair):
        # * and / are scalar-only (reference contract); object * object
        # returns NotImplemented.
        a, b = pair
        assert a.__mul__(b) is NotImplemented
        for pt in PTS:
            va = a.eval(pt, [0, 0])
            assert abs((a * 2.5).eval(pt, [0, 0]) - 2.5 * va) < 1e-12
            assert abs((2.5 * a).eval(pt, [0, 0]) - 2.5 * va) < 1e-12
            assert abs((a / 4.0).eval(pt, [0, 0]) - va / 4.0) < 1e-12
            assert abs((-a).eval(pt, [0, 0]) + va) < 1e-12

    def test_inplace_variant(self, pair):
        a, b = pair
        c = dense(lambda x, _: math.sin(x[0]) + x[1])
        before = c.eval(PTS[0], [0, 0])
        c += b
        assert abs(c.eval(PTS[0], [0, 0])
                   - (before + b.eval(PTS[0], [0, 0]))) < 1e-11
        # arrays themselves are immutable: objects that shared grid
        # arrays with c (fixture a has identical values) are unaffected
        assert abs(a.eval(PTS[0], [0, 0]) - before) < 1e-15

    def test_result_is_built_and_functionless(self, pair):
        a, b = pair
        c = a + b
        assert c.is_construction_finished()
        assert c.function is None

    def test_derivatives_of_sum(self, pair):
        a, b = pair
        c = a + b
        for pt in PTS:
            want = a.eval(pt, [1, 0]) + b.eval(pt, [1, 0])
            assert abs(c.eval(pt, [1, 0]) - want) < 1e-9

    def test_mismatched_grid_raises(self, pair):
        a, _ = pair
        other = dense(lambda x, _: x[0], n=(7, 5))
        with pytest.raises(ValueError):
            a + other

    def test_mismatched_domain_raises(self, pair):
        a, _ = pair
        other = ChebyshevApproximation(lambda x, _: x[0], 2,
                                       [[-2.0, 1.0], [0.0, 2.0]], [6, 5])
        other.build(verbose=False)
        with pytest.raises(ValueError):
            a + other

    def test_unbuilt_operand_raises(self, pair):
        a, _ = pair
        unbuilt = ChebyshevApproximation(lambda x, _: x[0], 2, DOM2,
                                         [6, 5])
        with pytest.raises((ValueError, RuntimeError)):
            a + unbuilt


class TestSplineAlgebra:
    @pytest.fixture(scope="class")
    def spair(self):
        mk = lambda fn: ChebyshevSpline(fn, 2, DOM2, [6, 5], [[0.0], []])
        a, b = mk(lambda x, _: abs(x[0]) + x[1]), \
            mk(lambda x, _: abs(x[0]) * 0.5 - x[1])
        a.build(verbose=False)
        b.build(verbose=False)
        return a, b

    def test_pointwise_sum(self, spair):
        a, b = spair
        c = a + b
        for pt in PTS:
            want = a.eval(pt, [0, 0]) + b.eval(pt, [0, 0])
            assert abs(c.eval(pt, [0, 0]) - want) < 1e-11

    def test_mismatched_knots_raise(self, spair):
        a, _ = spair
        other = ChebyshevSpline(lambda x, _: abs(x[0] - 0.5), 2, DOM2,
                                [6, 5], [[0.5], []])
        other.build(verbose=False)
        with pytest.raises(ValueError):
            a + other

    def test_scalar_scale(self, spair):
        a, _ = spair
        c = a * 3.0
        for pt in PTS:
            assert abs(c.eval(pt, [0, 0]) - 3.0 * a.eval(pt, [0, 0])) \
                < 1e-12


class TestTTAlgebra:
    @pytest.fixture(scope="class")
    def tpair(self):
        mk = lambda fn: ChebyshevTT(fn, 3, [[-1, 1]] * 3, [7] * 3,
                                    max_rank=5)
        a = mk(lambda x, _: math.sin(x[0]) * x[1] + x[2])
        b = mk(lambda x, _: x[0] * x[2] + 0.3)
        a.build(verbose=False, method="svd")
        b.build(verbose=False, method="svd")
        return a, b

    P3 = [[0.3, 0.7, -0.4], [-0.9, 0.9, 0.1], [0.0, 0.0, 0.0]]

    def test_add_block_diagonal_pointwise(self, tpair):
        a, b = tpair
        c = a + b
        for pt in self.P3:
            want = a.eval(pt) + b.eval(pt)
            assert abs(c.eval(pt) - want) < 1e-10

    def test_sub_and_scalar(self, tpair):
        a, b = tpair
        c = (a - b) * 2.0
        for pt in self.P3:
            want = 2.0 * (a.eval(pt) - b.eval(pt))
            assert abs(c.eval(pt) - want) < 1e-10

    def test_add_rounds_rank(self, tpair):
        a, _ = tpair
        # a + a == 2a exactly: block-diag doubles bonds, rounding must
        # recompress back to a's ranks (same TT up to scale).
        c = a + a
        assert max(c.tt_ranks) <= max(a.tt_ranks) + 1
        for pt in self.P3:
            assert abs(c.eval(pt) - 2 * a.eval(pt)) < 1e-10

    def test_mismatched_grid_raises(self, tpair):
        a, _ = tpair
        other = ChebyshevTT(lambda x, _: x[0], 3, [[-1, 1]] * 3,
                            [6] * 3, max_rank=3)
        other.build(verbose=False, method="svd")
        with pytest.raises(ValueError):
            a + other


class TestSliderAlgebra:
    @pytest.fixture(scope="class")
    def slpair(self):
        mk = lambda fn: ChebyshevSlider(
            fn, 3, [[-1, 1]] * 3, [7] * 3, [[0], [1, 2]],
            [0.0, 0.0, 0.0])
        a = mk(lambda x, _: math.sin(x[0]) + x[1] * x[2])
        b = mk(lambda x, _: x[0] ** 2 - 0.5 * x[1])
        a.build(verbose=False)
        b.build(verbose=False)
        return a, b

    P3 = [[0.3, 0.7, -0.4], [-0.9, 0.9, 0.1]]

    def test_pointwise_sum(self, slpair):
        a, b = slpair
        c = a + b
        for pt in self.P3:
            want = a.eval(pt, [0, 0, 0]) + b.eval(pt, [0, 0, 0])
            assert abs(c.eval(pt, [0, 0, 0]) - want) < 1e-11

    def test_partition_mismatch_raises(self, slpair):
        a, _ = slpair
        other = ChebyshevSlider(lambda x, _: x[0], 3, [[-1, 1]] * 3,
                                [7] * 3, [[0], [1], [2]],
                                [0.0, 0.0, 0.0])
        other.build(verbose=False)
        with pytest.raises(ValueError):
            a + other

    def test_pivot_mismatch_raises(self, slpair):
        a, _ = slpair
        other = ChebyshevSlider(lambda x, _: x[0], 3, [[-1, 1]] * 3,
                                [7] * 3, [[0], [1, 2]], [0.5, 0.0, 0.0])
        other.build(verbose=False)
        with pytest.raises(ValueError):
            a + other


class TestCrossClassAlgebraErrors:
    def test_dense_plus_tt_raises(self):
        a = dense(lambda x, _: x[0])
        tt = ChebyshevTT(lambda x, _: x[0] + x[1], 2, DOM2, [6, 5],
                         max_rank=3)
        tt.build(verbose=False, method="svd")
        with pytest.raises((TypeError, ValueError)):
            a + tt
