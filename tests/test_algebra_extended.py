"""Algebra depth: scalar-type coercion, identity laws, result
introspection/serialization, cross-family compatibility walls, the
portfolio workflow, and mixed domain syntax — the edge-case half of
reference ``test_algebra.py`` (reference/tests/test_algebra.py:460-745)
in repo-native form."""

import math
import pickle

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)

DOM = [[-1.0, 1.0], [0.0, 2.0]]


def build_dense(fn, n=(6, 5), domain=DOM):
    c = ChebyshevApproximation(fn, 2, domain, list(n))
    c.build(verbose=False)
    return c


@pytest.fixture(scope="module")
def base():
    return build_dense(lambda x, _: math.sin(x[0]) * (1.0 + x[1]))


class TestScalarCoercion:
    """Python ints, numpy scalars, and floats must all act as scalars."""

    def test_python_int(self, base):
        got = (base * 3).eval([0.4, 1.2], [0, 0])
        assert abs(got - 3.0 * base.eval([0.4, 1.2], [0, 0])) < 1e-12

    def test_numpy_scalar(self, base):
        w = np.float64(0.25)
        got = (w * base).eval([0.4, 1.2], [0, 0])
        assert abs(got - 0.25 * base.eval([0.4, 1.2], [0, 0])) < 1e-12

    def test_int_division(self, base):
        got = (base / 2).eval([-0.5, 0.3], [0, 0])
        assert abs(got - base.eval([-0.5, 0.3], [0, 0]) / 2.0) < 1e-12


class TestIdentityLaws:
    def test_times_zero_vanishes_everywhere(self, base):
        z = base * 0.0
        for pt in ([0.0, 1.0], [0.9, 1.9], [-1.0, 0.0]):
            assert z.eval(pt, [0, 0]) == 0.0

    def test_times_one_is_identity(self, base):
        one = base * 1.0
        for pt in ([0.3, 0.8], [-0.7, 1.5]):
            assert abs(one.eval(pt, [0, 0]) - base.eval(pt, [0, 0])) \
                < 1e-15

    def test_double_negation(self, base):
        back = -(-base)
        pt = [0.123, 1.456]
        assert abs(back.eval(pt, [0, 0]) - base.eval(pt, [0, 0])) < 1e-15

    def test_divide_by_one(self, base):
        same = base / 1.0
        pt = [0.6, 0.2]
        assert abs(same.eval(pt, [0, 0]) - base.eval(pt, [0, 0])) < 1e-15

    def test_sub_self_is_zero(self, base):
        z = base - base
        assert abs(z.eval([0.37, 1.11], [0, 0])) < 1e-14


class TestResultIntrospection:
    """Algebra results stay fully usable objects."""

    def test_repr_and_str_render(self, base):
        combo = base + 0.5 * base
        assert isinstance(repr(combo), str)
        text = str(combo)
        assert "Chebyshev" in text

    def test_error_estimate_available(self, base):
        combo = base + base
        est = combo.error_estimate()
        assert np.isfinite(est) and est >= 0.0

    def test_counters_reset(self, base):
        combo = base - base
        assert combo.build_time == 0.0
        assert combo.function is None

    def test_pickle_roundtrip(self, base, tmp_path):
        combo = 2.0 * base
        path = tmp_path / "combo.pkl"
        combo.save(path)
        back = ChebyshevApproximation.load(path)
        pt = [0.41, 0.9]
        assert abs(back.eval(pt, [0, 0]) - combo.eval(pt, [0, 0])) < 1e-15

    def test_pickle_bytes_roundtrip(self, base):
        combo = base + base
        back = pickle.loads(pickle.dumps(combo))
        pt = [-0.2, 1.7]
        assert abs(back.eval(pt, [0, 0]) - combo.eval(pt, [0, 0])) < 1e-15


class TestSplineSliderResults:
    @pytest.fixture(scope="class")
    def spline_pair(self):
        def mk(fn):
            s = ChebyshevSpline(fn, 2, DOM, [6, 5], [[0.0], []])
            s.build(verbose=False)
            return s
        return mk(lambda x, _: abs(x[0]) + x[1]), \
            mk(lambda x, _: abs(x[0]) * x[1])

    @pytest.fixture(scope="class")
    def slider_pair(self):
        def mk(fn):
            s = ChebyshevSlider(fn, 2, DOM, [6, 5], [[0], [1]],
                                [0.0, 1.0])
            s.build(verbose=False)
            return s
        return mk(lambda x, _: math.sin(x[0]) + x[1] ** 2), \
            mk(lambda x, _: math.cos(x[0]) - 0.5 * x[1])

    def test_spline_result_piece_count(self, spline_pair):
        a, b = spline_pair
        combo = a + b
        assert combo.num_pieces == a.num_pieces

    def test_spline_result_str(self, spline_pair):
        a, b = spline_pair
        assert isinstance(str(a - b), str)

    def test_spline_result_error_estimate(self, spline_pair):
        a, b = spline_pair
        assert np.isfinite((a + b).error_estimate())

    def test_spline_result_pickle(self, spline_pair, tmp_path):
        a, b = spline_pair
        combo = a + 0.5 * b
        path = tmp_path / "spline_combo.pkl"
        combo.save(path)
        back = ChebyshevSpline.load(path)
        pt = [0.33, 1.2]
        assert abs(back.eval(pt, [0, 0]) - combo.eval(pt, [0, 0])) < 1e-15

    def test_slider_scalar_scales_derivative(self, slider_pair):
        a, _ = slider_pair
        scaled = 3.0 * a
        pt = [0.4, 0.7]
        assert abs(scaled.eval(pt, [1, 0])
                   - 3.0 * a.eval(pt, [1, 0])) < 1e-11

    def test_slider_result_pivot_preserved(self, slider_pair):
        a, b = slider_pair
        combo = a + b
        assert np.allclose(np.asarray(combo.pivot_point),
                           np.asarray(a.pivot_point))

    def test_slider_result_str_and_pickle(self, slider_pair):
        a, b = slider_pair
        combo = a - b
        assert isinstance(str(combo), str)
        back = pickle.loads(pickle.dumps(combo))
        pt = [-0.3, 1.4]
        assert abs(back.eval(pt, [0, 0]) - combo.eval(pt, [0, 0])) < 1e-15


class TestCompatibilityWalls:
    def test_max_derivative_order_mismatch(self, base):
        other = ChebyshevApproximation(
            lambda x, _: x[0], 2, DOM, [6, 5], max_derivative_order=3)
        other.build(verbose=False)
        with pytest.raises(ValueError):
            base + other

    def test_unbuilt_spline_raises(self):
        a = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1.0, 1.0]],
                            [5], [[0.0]])
        a.build(verbose=False)
        b = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1.0, 1.0]],
                            [5], [[0.0]])
        with pytest.raises((ValueError, RuntimeError)):
            a + b

    def test_unbuilt_slider_raises(self):
        mk = lambda: ChebyshevSlider(lambda x, _: x[0] + x[1], 2, DOM,
                                     [5, 5], [[0], [1]], [0.0, 1.0])
        a = mk()
        a.build(verbose=False)
        with pytest.raises((ValueError, RuntimeError)):
            a + mk()

    def test_dense_plus_spline_rejected(self, base):
        s = ChebyshevSpline(lambda x, _: abs(x[0]) + x[1], 2, DOM,
                            [6, 5], [[0.0], []])
        s.build(verbose=False)
        with pytest.raises((TypeError, ValueError)):
            base + s

    def test_object_times_object_is_type_error(self, base):
        with pytest.raises(TypeError):
            base * base  # noqa: B015 — the operator call is the test

    def test_object_div_object_is_type_error(self, base):
        with pytest.raises(TypeError):
            base / base  # noqa: B015


class TestPortfolioWorkflow:
    """Linear-combination proxy pricing: algebra must be exact by
    linearity regardless of interpolation error."""

    WEIGHTS = (0.4, 0.3, 0.3)

    @pytest.fixture(scope="class")
    def legs(self):
        decay = lambda x: math.exp(-0.05 * x[1])
        fns = (
            lambda x, _: max(x[0] - 0.5, 0.0) * decay(x),
            lambda x, _: max(0.5 - x[0], 0.0) * decay(x),
            lambda x, _: abs(x[0] - 0.5) * decay(x),
        )
        dom = [[0.0, 1.0], [0.0, 1.0]]
        legs = []
        for fn in fns:
            c = ChebyshevApproximation(fn, 2, dom, [20, 12])
            c.build(verbose=False)
            legs.append(c)
        return legs

    @pytest.fixture(scope="class")
    def book(self, legs):
        w = self.WEIGHTS
        return w[0] * legs[0] + w[1] * legs[1] + w[2] * legs[2]

    PTS = [[0.7, 0.5], [0.3, 0.5], [0.8, 0.2], [0.2, 0.8], [0.6, 0.3]]

    def test_value_is_weighted_sum(self, legs, book):
        for pt in self.PTS:
            want = sum(w * leg.eval(pt, [0, 0])
                       for w, leg in zip(self.WEIGHTS, legs))
            assert abs(book.eval(pt, [0, 0]) - want) < 1e-14

    def test_batch_matches_single(self, book):
        pts = np.asarray(self.PTS)
        batch = np.asarray(book.vectorized_eval_batch(pts, [0, 0]))
        for i, pt in enumerate(self.PTS):
            assert abs(batch[i] - book.eval(pt, [0, 0])) < 1e-14

    def test_delta_is_weighted_sum(self, legs, book):
        # stay away from the x=0.5 payoff kink
        for pt in ([0.75, 0.5], [0.25, 0.5], [0.85, 0.2]):
            want = sum(w * leg.eval(pt, [1, 0])
                       for w, leg in zip(self.WEIGHTS, legs))
            assert abs(book.eval(pt, [1, 0]) - want) < 1e-10


class TestMixedDomainSyntax:
    """Tuple-of-tuples and list-of-lists domains are numerically equal
    and must interoperate (reference issue #22 contract)."""

    def test_dense_tuple_vs_list(self):
        a = ChebyshevApproximation(lambda x, _: x[0], 1, [(-1, 1)], [5])
        b = ChebyshevApproximation(lambda x, _: -x[0], 1, [[-1, 1]], [5])
        a.build(verbose=False)
        b.build(verbose=False)
        assert abs((a + b).eval([0.5], [0])) < 1e-12

    def test_slider_tuple_vs_list(self):
        mk = lambda fn, dom: ChebyshevSlider(fn, 1, dom, [5], [[0]],
                                             [0.0])
        a = mk(lambda x, _: x[0], [(-1, 1)])
        b = mk(lambda x, _: -x[0], [[-1, 1]])
        a.build(verbose=False)
        b.build(verbose=False)
        combo = a + 2.0 * b
        assert abs(combo.eval([0.3], [0]) + 0.3) < 1e-12

    def test_real_n_nodes_mismatch_still_walls(self):
        a = ChebyshevApproximation(lambda x, _: x[0], 1, [[-1, 1]], [5])
        b = ChebyshevApproximation(lambda x, _: x[0], 1, [[-1, 1]], [7])
        a.build(verbose=False)
        b.build(verbose=False)
        with pytest.raises(ValueError):
            a + b


class TestTTAlgebraDepth:
    @pytest.fixture(scope="class")
    def tt_pair(self):
        def mk(fn, seed):
            t = ChebyshevTT(fn, 2, DOM, [6, 5], max_rank=4)
            t.build(verbose=False, seed=seed)
            return t
        return mk(lambda x, _: math.sin(x[0]) + x[1], 11), \
            mk(lambda x, _: x[0] * x[1], 12)

    def test_scalar_identity_chain(self, tt_pair):
        a, _ = tt_pair
        same = (2.0 * a) / 2.0
        pt = [0.4, 1.3]
        assert abs(same.eval(pt) - a.eval(pt)) < 1e-10

    def test_result_pickle(self, tt_pair):
        a, b = tt_pair
        combo = a + b
        back = pickle.loads(pickle.dumps(combo))
        pt = [0.2, 0.9]
        assert abs(back.eval(pt) - combo.eval(pt)) < 1e-12

    def test_neg_then_add_cancels(self, tt_pair):
        a, _ = tt_pair
        z = a + (-a)
        assert abs(z.eval([0.6, 1.1])) < 1e-10
