"""Calculus completion: Slider and TT integration edge cases, cross-class
consistency with the dense interpolant."""

import math

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevTT,
)


def f3(x, _):
    return math.sin(x[0]) + math.exp(0.5 * x[1]) * math.cos(x[2])


def dense_f3():
    c = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [11] * 3)
    c.build(verbose=False)
    return c


class TestTTIntegration:
    @pytest.fixture(scope="class")
    def tt(self):
        t = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [11] * 3, max_rank=8)
        t.build(verbose=False, method="svd")
        return t

    @pytest.fixture(scope="class")
    def dense(self):
        return dense_f3()

    def test_full_matches_dense(self, tt, dense):
        assert abs(tt.integrate() - dense.integrate()) < 1e-9

    def test_leading_dim_partial(self, tt, dense):
        a = tt.integrate(dims=[0])
        b = dense.integrate(dims=[0])
        pt = [0.3, -0.4]
        assert abs(a.eval(pt) - b.vectorized_eval(pt, [0, 0])) < 1e-9

    def test_trailing_dim_partial(self, tt, dense):
        # pending matrix absorbed into the right rank of the last kept core
        a = tt.integrate(dims=[2])
        b = dense.integrate(dims=[2])
        pt = [0.1, 0.7]
        assert abs(a.eval(pt) - b.vectorized_eval(pt, [0, 0])) < 1e-9

    def test_consecutive_dims(self, tt, dense):
        a = tt.integrate(dims=[1, 2])
        b = dense.integrate(dims=[1, 2])
        assert abs(a.eval([0.25]) - b.vectorized_eval([0.25], [0])) < 1e-9

    def test_bounds_single_tuple(self, tt, dense):
        a = tt.integrate(dims=[1], bounds=(0.0, 0.5))
        b = dense.integrate(dims=[1], bounds=(0.0, 0.5))
        pt = [0.3, -0.2]
        assert abs(a.eval(pt) - b.vectorized_eval(pt, [0, 0])) < 1e-9

    def test_bounds_validation(self, tt):
        with pytest.raises(ValueError):
            tt.integrate(dims=[0], bounds=(-2.0, 0.5))
        with pytest.raises(ValueError):
            tt.integrate(dims=[0, 1], bounds=[(0.0, 0.5)])
        with pytest.raises(ValueError):
            tt.integrate(dims=[5])

    def test_integrate_then_eval_consistency(self, tt):
        # integrate out dim 1, then slice dim 1-free object matches
        # numerically integrating by quadrature sampling
        reduced = tt.integrate(dims=[1])
        xs = np.linspace(-1, 1, 201)
        vals = tt.eval_batch(np.column_stack([
            np.full_like(xs, 0.3), xs, np.full_like(xs, -0.4)]))
        trapz = np.trapezoid(vals, xs)
        assert abs(reduced.eval([0.3, -0.4]) - trapz) < 1e-4


class TestTTIntegrationReordered:
    def test_reordered_partial(self):
        tt = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [9] * 3, max_rank=8)
        tt.build(verbose=False, method="svd")
        rt = tt.reorder([2, 0, 1])
        dense = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [9] * 3)
        dense.build(verbose=False)
        # user-frame dims=[1]: storage position differs after reorder
        a = rt.integrate(dims=[1])
        b = dense.integrate(dims=[1])
        pt = [0.4, 0.6]
        assert abs(a.eval(pt) - b.vectorized_eval(pt, [0, 0])) < 1e-8

    def test_reordered_bounds(self):
        tt = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [9] * 3, max_rank=8)
        tt.build(verbose=False, method="svd")
        rt = tt.reorder([1, 2, 0])
        dense = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [9] * 3)
        dense.build(verbose=False)
        a = rt.integrate(dims=[0, 2], bounds=[(-0.5, 0.5), None])
        b = dense.integrate(dims=[0, 2], bounds=[(-0.5, 0.5), None])
        assert abs(a.eval([0.2]) - b.vectorized_eval([0.2], [0])) < 1e-8


class TestSliderIntegrationCompletion:
    @pytest.fixture(scope="class")
    def slider(self):
        s = ChebyshevSlider(f3, 3, [[-1, 1]] * 3, [11] * 3,
                            partition=[[0], [1, 2]],
                            pivot_point=[0.0, 0.0, 0.0])
        s.build(verbose=False)
        return s

    def test_full_matches_sliding_identity(self, slider):
        # slider approximates f as s0(x0) + s12(x1,x2) - pv; its integral
        # must match the analytic integral of that decomposition
        i_sin = 0.0  # int sin over [-1,1]
        i_exp_cos = ((math.exp(0.5) - math.exp(-0.5)) / 0.5
                     * 2.0 * math.sin(1.0))
        expected = i_sin * 4.0 + i_exp_cos * 2.0
        assert abs(slider.integrate() - expected) < 1e-9

    def test_partial_full_group(self, slider):
        # integrating dims [1, 2] fully absorbs the second slide
        reduced = slider.integrate(dims=[1, 2])
        assert reduced.num_dimensions == 1
        i_exp_cos = ((math.exp(0.5) - math.exp(-0.5)) / 0.5
                     * 2.0 * math.sin(1.0))
        got = reduced.eval([0.5], [0])
        expected = 4.0 * math.sin(0.5) + i_exp_cos
        assert abs(got - expected) < 1e-9

    def test_partial_within_group(self, slider):
        # integrating dim 1 only: partial intersection with group [1, 2]
        reduced = slider.integrate(dims=[1])
        assert reduced.num_dimensions == 2
        i_exp = (math.exp(0.5) - math.exp(-0.5)) / 0.5
        got = reduced.eval([0.5, 0.3], [0, 0])
        expected = 2.0 * math.sin(0.5) + i_exp * math.cos(0.3)
        assert abs(got - expected) < 1e-9

    def test_partial_with_bounds(self, slider):
        reduced = slider.integrate(dims=[0], bounds=[(0.0, 1.0)])
        assert reduced.num_dimensions == 2
        i_sin_01 = 1.0 - math.cos(1.0)
        got = reduced.eval([0.3, -0.2], [0, 0])
        expected = i_sin_01 + 1.0 * math.exp(0.15) * math.cos(-0.2)
        assert abs(got - expected) < 1e-9

    def test_derivative_after_partial(self, slider):
        reduced = slider.integrate(dims=[1])
        d = reduced.eval([0.5, 0.3], [1, 0])
        assert abs(d - 2.0 * math.cos(0.5)) < 1e-8

    def test_bounds_validation(self, slider):
        with pytest.raises(ValueError):
            slider.integrate(dims=[0], bounds=[(-3.0, 0.0)])
        with pytest.raises(ValueError):
            slider.integrate(dims=[7])


class TestSliderRoundTripThroughCalculus:
    def test_slice_then_integrate(self):
        # fully additive f so the singleton partition is exact
        def g(x, _):
            return math.sin(x[0]) + math.exp(0.5 * x[1]) + math.cos(x[2])

        s = ChebyshevSlider(g, 3, [[-1, 1]] * 3, [11] * 3,
                            partition=[[0], [1], [2]],
                            pivot_point=[0.1, 0.1, 0.1])
        s.build(verbose=False)
        sl = s.slice((2, 0.25))
        got = sl.integrate()
        i_exp = (math.exp(0.5) - math.exp(-0.5)) / 0.5
        # integral over (x0, x1) in [-1,1]^2 of g(x0, x1, 0.25)
        expected = 0.0 + 2.0 * i_exp + 4.0 * math.cos(0.25)
        assert abs(got - expected) < 1e-9

    def test_extrude_then_integrate(self):
        s = ChebyshevSlider(lambda x, _: math.sin(x[0]), 1, [[-1, 1]],
                            [9], partition=[[0]], pivot_point=[0.0])
        s.build(verbose=False)
        ext = s.extrude((1, (0.0, 2.0), 5))
        assert abs(ext.integrate() - 0.0) < 1e-12
        assert abs(ext.integrate(dims=[1]).eval([0.5], [0])
                   - 2.0 * math.sin(0.5)) < 1e-7


def _slider_add(n=9):
    """Additive 3-D function as a slider: exactly representable."""
    fn = (lambda x, _: math.sin(x[0]) + 0.5 * x[1] ** 3
          - math.cos(2 * x[2]))
    s = ChebyshevSlider(fn, 3, [[-1, 1]] * 3, [n] * 3,
                        [[0], [1], [2]], [0.0, 0.0, 0.0])
    s.build(verbose=False)
    return s, fn


class TestSliderRootsMinMax:
    """_to_1d_chebyshev resampling: every 1-D calculus answer must match
    a directly-built dense 1-D interpolant of the sliced function."""

    @pytest.fixture(scope="class")
    def slider(self):
        return _slider_add()[0]

    def test_multiple_roots(self):
        fn = lambda x, _: math.sin(3 * x[0]) + 0.0 * x[1]
        s = ChebyshevSlider(fn, 2, [[-2, 2], [-1, 1]], [16, 4],
                            [[0], [1]], [0.0, 0.0])
        s.build(verbose=False)
        roots = s.roots(dim=0, fixed={1: 0.3})
        expected = np.array([-math.pi / 3, 0.0, math.pi / 3])
        np.testing.assert_allclose(np.sort(roots), expected, atol=1e-7)

    def test_roots_match_dense_slice(self, slider):
        dense = ChebyshevApproximation(
            lambda x, _: math.sin(x[0]) + 0.5 * 0.4 ** 3
            - math.cos(2 * (-0.3)), 1, [[-1, 1]], [9])
        dense.build(verbose=False)
        got = slider.roots(dim=0, fixed={1: 0.4, 2: -0.3})
        want = dense.roots()
        assert len(got) == len(want)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_minimize_interior(self, slider):
        # d/dx0 sin = 0 at x0 = -pi/2 is outside [-1,1]; min at boundary
        val, loc = slider.minimize(dim=0, fixed={1: 0.0, 2: 0.0})
        assert abs(loc - (-1.0)) < 1e-7
        assert abs(val - (math.sin(-1.0) - math.cos(0.0))) < 1e-6

    def test_maximize_owning_dim2(self, slider):
        # -cos(2*x2) on [-1,1]: cos(2x) smallest at the boundary
        # |2x| = 2, so the max sits at x2 = +/-1 with value -cos(2).
        val, loc = slider.maximize(dim=2, fixed={0: 0.2, 1: 0.1})
        assert abs(abs(loc) - 1.0) < 1e-7
        expected = math.sin(0.2) + 0.5 * 0.1 ** 3 - math.cos(2.0)
        assert abs(val - expected) < 5e-6  # n=9 resample of cos(2x)

    def test_missing_fixed_raises(self, slider):
        with pytest.raises(ValueError):
            slider.roots(dim=0, fixed={1: 0.0})

    def test_fixed_out_of_domain_raises(self, slider):
        with pytest.raises(ValueError, match="outside"):
            slider.minimize(dim=0, fixed={1: 5.0, 2: 0.0})

    def test_dim_out_of_range_raises(self, slider):
        with pytest.raises(ValueError, match="out of range"):
            slider.maximize(dim=7, fixed={0: 0, 1: 0, 2: 0})

    def test_multidim_group_slice_path(self):
        # Group [1, 2] forces slicing THROUGH a multi-dim slide.
        fn = lambda x, _: x[0] ** 2 + x[1] * x[2]
        s = ChebyshevSlider(fn, 3, [[-1, 1]] * 3, [7] * 3,
                            [[0], [1, 2]], [0.0, 0.0, 0.0])
        s.build(verbose=False)
        roots = s.roots(dim=1, fixed={0: 0.5, 2: 0.5})
        # 0.25 + 0.5*x1 = 0 -> x1 = -0.5
        np.testing.assert_allclose(roots, [-0.5], atol=1e-8)


class TestTTRootsMinMax:
    @pytest.fixture(scope="class")
    def tt(self):
        t = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [11] * 3, max_rank=8)
        t.build(verbose=False, method="svd")
        return t

    def test_roots_match_dense(self, tt):
        dense = dense_f3()
        got = tt.roots(dim=0, fixed={1: 0.2, 2: 0.9})
        want = dense.roots(dim=0, fixed={1: 0.2, 2: 0.9})
        assert len(got) == len(want)
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_min_max_match_dense(self, tt):
        # dim 1 (exp factor): strictly monotonic, so the optimum
        # location is unique (dim 2's cosine ties at +/-1).
        dense = dense_f3()
        for mode in ("minimize", "maximize"):
            vt, lt = getattr(tt, mode)(dim=1, fixed={0: 0.1, 2: -0.6})
            vd, ld = getattr(dense, mode)(dim=1, fixed={0: 0.1, 2: -0.6})
            assert abs(vt - vd) < 1e-8 and abs(lt - ld) < 1e-7

    def test_reordered_frame_translation(self, tt):
        # User-frame dim indices must survive a storage reorder.
        r = tt.reorder([2, 0, 1])
        got = r.roots(dim=0, fixed={1: 0.2, 2: 0.9})
        want = tt.roots(dim=0, fixed={1: 0.2, 2: 0.9})
        np.testing.assert_allclose(got, want, atol=1e-8)

    def test_validation(self, tt):
        with pytest.raises(ValueError):
            tt.roots(dim=0)            # missing fixed
        with pytest.raises(ValueError, match="out of range"):
            tt.minimize(dim=3, fixed={0: 0, 1: 0, 2: 0})
        with pytest.raises(ValueError, match="outside"):
            tt.maximize(dim=0, fixed={1: 7.0, 2: 0.0})


class TestSliderIntegrateClassification:
    """Every (group x integrate-set) classification: none / partial /
    full, against numerically-integrated ground truth."""

    @pytest.fixture(scope="class")
    def slider(self):
        fn = lambda x, _: (x[0] ** 2 + math.sin(x[1]) * math.cos(x[2])
                           + 0.3 * x[3])
        s = ChebyshevSlider(fn, 4, [[-1, 1]] * 4, [8] * 4,
                            [[0], [1, 2], [3]], [0.0] * 4)
        s.build(verbose=False)
        return s

    def test_full_single_dim_group(self, slider):
        # integrate dim 0 fully: group [0] is 'full', others 'none'
        out = slider.integrate(dims=[0])
        # result is 3-D over (old dims 1,2,3)
        got = out.eval([0.5, 0.5, 0.5], [0, 0, 0])
        expect = 2.0 / 3.0 + 2.0 * (math.sin(0.5) * math.cos(0.5)
                                    + 0.3 * 0.5)
        assert abs(got - expect) < 1e-6  # n=8 interpolation of sin/cos

    def test_partial_multi_dim_group(self, slider):
        # integrate dim 1 only: group [1,2] is 'partial'
        out = slider.integrate(dims=[1])
        got = out.eval([0.4, 0.7, -0.2], [0, 0, 0])
        # int_-1^1 sin(y) dy = 0; surviving terms gain the factor 2
        expect = 2 * 0.4 ** 2 + 0.0 * math.cos(0.7) + 0.6 * (-0.2)
        assert abs(got - expect) < 1e-6

    def test_full_multi_dim_group(self, slider):
        out = slider.integrate(dims=[1, 2])
        got = out.eval([0.4, 0.6], [0, 0])
        expect = 4 * 0.4 ** 2 + 0.0 + 4 * 0.3 * 0.6
        # integrate over 2 dims multiplies surviving terms by 2*2 = 4
        assert abs(got - expect) < 1e-9

    def test_mixed_full_and_partial(self, slider):
        out = slider.integrate(dims=[0, 2])
        got = out.eval([0.1, 0.9], [0, 0])
        sin_int = 2 * math.sin(1.0)  # int_-1^1 cos(z) dz
        expect = 2.0 / 3.0 * 2 + 2 * (math.sin(0.1) * sin_int / 2) \
            + 2 * 2 * 0.3 * 0.9 / 2
        expect = (2.0 / 3.0) * 2 / 2 + math.sin(0.1) * sin_int \
            + 2 * 0.3 * 0.9
        # direct: int over x0 and x2 of f = (2/3)*2/2 ... compute
        # numerically instead:
        from scipy import integrate as si
        fn = lambda x0, x2: (x0 ** 2 + math.sin(0.1) * math.cos(x2)
                             + 0.3 * 0.9)
        num = si.dblquad(fn, -1, 1, -1, 1)[0]
        assert abs(got - num) < 1e-8

    def test_sub_bounds_on_group_member(self, slider):
        out = slider.integrate(dims=[1], bounds=[(0.0, 1.0)])
        got = out.eval([0.0, 0.5, 0.0], [0, 0, 0])
        expect = (1.0 - math.cos(1.0)) * math.cos(0.5)
        assert abs(got - expect) < 1e-6

    def test_bounds_validation(self, slider):
        with pytest.raises(ValueError, match="outside domain"):
            slider.integrate(dims=[0], bounds=[(-3.0, 0.0)])
        with pytest.raises(ValueError, match="bounds length"):
            slider.integrate(dims=[0, 1], bounds=[(0.0, 1.0)])
        with pytest.raises(ValueError, match="lo=.*> hi="):
            slider.integrate(dims=[0], bounds=[(0.5, -0.5)])


class TestCrossClassCalculusConsistency:
    """Dense, TT, and slider built from the same additive function must
    agree on every calculus answer."""

    @pytest.fixture(scope="class")
    def trio(self):
        fn = lambda x, _: math.sin(x[0]) + 0.5 * x[1] ** 3 \
            - math.cos(2 * x[2])
        dense = ChebyshevApproximation(fn, 3, [[-1, 1]] * 3, [9] * 3)
        dense.build(verbose=False)
        tt = ChebyshevTT(fn, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6)
        tt.build(verbose=False, method="svd")
        slider = _slider_add()[0]
        return dense, tt, slider

    def test_full_integral(self, trio):
        dense, tt, slider = trio
        want = dense.integrate()
        assert abs(tt.integrate() - want) < 1e-9
        assert abs(slider.integrate() - want) < 1e-9

    def test_roots_consistency(self, trio):
        dense, tt, slider = trio
        fixed = {1: 0.25, 2: -0.5}
        want = dense.roots(dim=0, fixed=fixed)
        for other in (tt, slider):
            got = other.roots(dim=0, fixed=fixed)
            assert len(got) == len(want)
            np.testing.assert_allclose(got, want, atol=1e-8)

    def test_minmax_consistency(self, trio):
        dense, tt, slider = trio
        fixed = {0: 0.3, 1: 0.3}
        vw, lw = dense.minimize(dim=2, fixed=fixed)
        for other in (tt, slider):
            vo, lo = other.minimize(dim=2, fixed=fixed)
            assert abs(vo - vw) < 1e-8 and abs(lo - lw) < 1e-7

    def test_partial_integral_then_eval(self, trio):
        dense, tt, _slider = trio
        pd = dense.integrate(dims=[1])
        pt = tt.integrate(dims=[1])
        for x in ([0.2, 0.8], [-0.9, -0.1]):
            assert abs(pd.eval(x, [0, 0]) - pt.eval(x)) < 1e-9


def test_normalize_bounds_rejects_short_dim_labels():
    from pychebyshev_tpu.utils.calculus import normalize_bounds
    with pytest.raises(ValueError, match="dim_labels length"):
        normalize_bounds([0, 1], [(0.0, 1.0), (0.0, 1.0)],
                         [[-1, 1], [-1, 1]], dim_labels=[7])


class TestTTIntegrateEdges:
    """Endpoint dims, metadata preservation, frame-correct errors,
    method coverage (reference calculus-completion edge parity)."""

    @pytest.fixture(scope="class")
    def tt(self):
        t = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [11] * 3, max_rank=8)
        t.build(verbose=False, method="svd")
        return t

    def test_against_scipy_nquad(self, tt):
        from scipy.integrate import nquad
        exact, _ = nquad(lambda a, b, c: f3([a, b, c], None),
                         [[-1, 1]] * 3)
        assert abs(tt.integrate() - exact) < 1e-8

    def test_endpoint_dim_left(self, tt):
        # ∫ f3 dx0 = [−cos]_{-1}^{1} + 2·exp(.5 x1)·cos(x2)
        #          = 0 + 2·exp(.5 x1)·cos(x2)  (sin integral is odd)
        r = tt.integrate(dims=[0])
        assert r.num_dimensions == 2
        expected = 2.0 * math.exp(0.5 * 0.3) * math.cos(-0.4)
        assert abs(r.eval([0.3, -0.4]) - expected) < 1e-8

    def test_endpoint_dim_right(self, tt):
        # ∫ f3 dx2 = 2·sin(x0) + exp(.5 x1)·(sin(1) − sin(−1))
        r = tt.integrate(dims=[2])
        assert r.num_dimensions == 2
        expected = 2.0 * math.sin(0.3) + math.exp(0.5 * -0.4) * (
            math.sin(1.0) - math.sin(-1.0))
        assert abs(r.eval([0.3, -0.4]) - expected) < 1e-8

    def test_descriptor_and_additional_data_preserved(self):
        t = ChebyshevTT(lambda x, d: x[0] + x[1] * d["k"], 2,
                        [[-1, 1]] * 2, [7] * 2, max_rank=4,
                        additional_data={"k": 2.0})
        t.build(verbose=False, method="svd")
        t.set_descriptor("book-A")
        r = t.integrate(dims=[0])
        assert r.get_descriptor() == "book-A"
        assert r.additional_data == {"k": 2.0}

    def test_dims_order_invariance(self, tt):
        a = tt.integrate(dims=[0, 2])
        b = tt.integrate(dims=[2, 0])
        assert abs(a.eval([0.25]) - b.eval([0.25])) < 1e-12

    def test_works_after_method_als(self):
        t = ChebyshevTT(lambda x, _: math.sin(x[0]) * math.cos(x[1]), 2,
                        [[0, math.pi], [-1, 1]], [11, 11], max_rank=6)
        t.build(verbose=False, method="als", seed=3)
        # ∫ sin over [0, pi] = 2; ∫ cos over [-1,1] = 2 sin(1)
        assert abs(t.integrate() - 2.0 * 2.0 * math.sin(1.0)) < 1e-6

    def test_partial_then_serialize_round_trip(self, tt, tmp_path):
        import pickle
        r = tt.integrate(dims=[1])
        p = tmp_path / "partial.pkl"
        r.save(str(p))
        with open(p, "rb") as fh:
            back = pickle.load(fh)
        pt = [0.2, 0.6]
        assert abs(back.eval(pt) - r.eval(pt)) < 1e-12

    def test_out_of_domain_bounds_error_names_user_dim(self, tt):
        r = tt.reorder([2, 0, 1])
        with pytest.raises(ValueError) as ei:
            r.integrate(dims=[1], bounds=[(-5.0, 5.0)])
        assert "1" in str(ei.value)


class TestSliderIntegrateEdges:
    def test_pivot_only_function(self):
        s = ChebyshevSlider(lambda x, _: 7.5, 2, [[-1, 1]] * 2, [5] * 2,
                            partition=[[0], [1]], pivot_point=[0.0, 0.0])
        s.build(verbose=False)
        assert abs(s.integrate() - 7.5 * 4.0) < 1e-10

    def test_5d_analytic(self):
        # f5 is additive across the partition, so the slider is exact
        # and the full integral decomposes into per-group closed forms
        # times the complementary volumes.
        def f5(x, _):
            return (math.sin(x[0]) * math.cos(x[1]) + x[2] ** 2
                    + math.exp(0.3 * x[3]) + x[4])

        s = ChebyshevSlider(f5, 5, [[-1, 1]] * 5, [9] * 5,
                            partition=[[0, 1], [2], [3], [4]],
                            pivot_point=[0.0] * 5)
        s.build(verbose=False)
        i_g0 = 0.0                                   # ∫∫ sin·cos: odd
        i_g1 = 2.0 / 3.0                             # ∫ x^2
        i_g2 = (math.exp(0.3) - math.exp(-0.3)) / 0.3
        i_g3 = 0.0                                   # ∫ x: odd
        expected = (i_g0 * 2.0 ** 3 + i_g1 * 2.0 ** 4
                    + i_g2 * 2.0 ** 4 + i_g3 * 2.0 ** 4)
        assert abs(s.integrate() - expected) < 1e-8

    def test_partial_disjoint_group_passes_through(self):
        s = ChebyshevSlider(lambda x, _: math.sin(x[0]) + x[1] ** 3, 2,
                            [[-1, 1]] * 2, [9] * 2,
                            partition=[[0], [1]], pivot_point=[0.0, 0.0])
        s.build(verbose=False)
        r = s.integrate(dims=[1])
        for t in (-0.5, 0.1, 0.7):
            # ∫ x1^3 over [-1,1] = 0, so only 2*sin(x0) survives
            expected = 2.0 * math.sin(t)
            # 9-node interpolation of sin carries ~2e-8 error
            assert abs(r.eval([t], [0]) - expected) < 1e-7

    def test_descriptor_preserved(self):
        s = ChebyshevSlider(lambda x, _: x[0] + x[1], 2, [[-1, 1]] * 2,
                            [5] * 2, partition=[[0], [1]],
                            pivot_point=[0.0, 0.0])
        s.build(verbose=False)
        s.set_descriptor("desk-7")
        assert s.integrate(dims=[0]).get_descriptor() == "desk-7"

    def test_unbuilt_raises(self):
        s = ChebyshevSlider(lambda x, _: x[0], 1, [[-1, 1]], [5],
                            partition=[[0]], pivot_point=[0.0])
        with pytest.raises(RuntimeError):
            s.integrate()

    def test_negative_dim_rejected(self):
        s = ChebyshevSlider(lambda x, _: x[0] + x[1], 2, [[-1, 1]] * 2,
                            [5] * 2, partition=[[0], [1]],
                            pivot_point=[0.0, 0.0])
        s.build(verbose=False)
        with pytest.raises(ValueError):
            s.integrate(dims=[-1])


class TestUnitVolumeNormalization:
    """∫ 1 over the domain = volume on every class (constant-preserving
    quadrature; reference cross-class invariant)."""

    def test_all_classes(self):
        domain = [[0.0, 2.0], [-1.0, 3.0]]
        vol = 2.0 * 4.0
        one = lambda x, _: 1.0
        dense = ChebyshevApproximation(one, 2, domain, [5, 5])
        dense.build(verbose=False)
        assert abs(dense.integrate() - vol) < 1e-12
        tt = ChebyshevTT(one, 2, domain, [5, 5], max_rank=3)
        tt.build(verbose=False, method="svd")
        assert abs(tt.integrate() - vol) < 1e-10
        sl = ChebyshevSlider(one, 2, domain, [5, 5],
                             partition=[[0], [1]],
                             pivot_point=[1.0, 0.0])
        sl.build(verbose=False)
        assert abs(sl.integrate() - vol) < 1e-10
        from pychebyshev_tpu import ChebyshevSpline
        sp = ChebyshevSpline(one, 2, domain, [5, 5], [[1.0], []])
        sp.build(verbose=False)
        assert abs(sp.integrate() - vol) < 1e-10


class TestTTMinMaxEdges:
    """Constant/endpoint/no-root edges + unbuilt guards for the TT and
    slider calculus entry points (reference
    tests/test_calculus_completion.py TT/Slider Minimize/Maximize
    constant, endpoint, and before-build rows)."""

    def test_constant_function(self):
        c = ChebyshevTT(lambda x, _: 3.0 + 0 * x[0], 1, [[-1, 1]], [5],
                        max_rank=2)
        c.build(verbose=False, method="svd")
        mn, _ = c.minimize(dim=0)
        mx, _ = c.maximize(dim=0)
        assert mn == pytest.approx(3.0, abs=1e-12)
        assert mx == pytest.approx(3.0, abs=1e-12)
        assert len(c.roots(dim=0)) == 0

    def test_endpoint_extrema(self):
        e = ChebyshevTT(lambda x, _: x[0], 1, [[-1, 1]], [5], max_rank=2)
        e.build(verbose=False, method="svd")
        mn, loc_mn = e.minimize(dim=0)
        mx, loc_mx = e.maximize(dim=0)
        assert (mn, loc_mn) == pytest.approx((-1.0, -1.0), abs=1e-10)
        assert (mx, loc_mx) == pytest.approx((1.0, 1.0), abs=1e-10)

    def test_unbuilt_tt_raises_everywhere(self):
        t = ChebyshevTT(lambda x, _: x[0], 1, [[-1, 1]], [7], max_rank=3)
        for method in ("roots", "minimize", "maximize"):
            with pytest.raises(RuntimeError, match="build"):
                getattr(t, method)(dim=0)

    def test_unbuilt_slider_raises_everywhere(self):
        s = ChebyshevSlider(lambda x, _: x[0] + x[1], 2, [[-1, 1]] * 2,
                            [7, 7], [[0], [1]], [0.0, 0.0])
        for method in ("roots", "minimize", "maximize"):
            with pytest.raises(RuntimeError, match="build"):
                getattr(s, method)(dim=0, fixed={1: 0.0})
