"""ChebyshevSlider: additive decomposition, derivative routing, closed-form
integration, extrude/slice pivot absorption, algebra, serialization."""

import math
import pickle

import numpy as np
import pytest

from pychebyshev_tpu import (ChebyshevApproximation, ChebyshevSlider,
                             ChebyshevTT)


def additive_3d(x, _):
    return math.sin(x[0]) + math.sin(x[1]) + math.sin(x[2])


def grouped_4d(x, _):
    # separable across the [0,1] | [2,3] partition (exact for the slider)
    return math.sin(x[0]) * math.cos(x[1]) + x[2] * math.exp(0.3 * x[3])


def basket_10d_vec(points, _):
    points = np.asarray(points)
    return np.sum(np.sin(points), axis=1) + 0.5 * np.sum(points ** 2,
                                                         axis=1)


@pytest.fixture(scope="module")
def slider_3d():
    s = ChebyshevSlider(additive_3d, 3, [[-1, 1]] * 3, [11] * 3,
                        partition=[[0], [1], [2]],
                        pivot_point=[0.0, 0.0, 0.0])
    s.build(verbose=False)
    return s


@pytest.fixture(scope="module")
def slider_4d():
    s = ChebyshevSlider(grouped_4d, 4, [[-1, 1]] * 4, [9] * 4,
                        partition=[[0, 1], [2, 3]],
                        pivot_point=[0.2, -0.1, 0.3, 0.0])
    s.build(verbose=False)
    return s


@pytest.fixture(scope="module")
def slider_10d():
    s = ChebyshevSlider(basket_10d_vec, 10, [[-1, 1]] * 10, [9] * 10,
                        partition=[[i] for i in range(10)],
                        pivot_point=[0.0] * 10, vectorized=True)
    s.build(verbose=False)
    return s


class TestAccuracy:
    def test_additive_exact(self, slider_3d):
        pt = [0.5, 0.3, 0.1]
        assert abs(slider_3d.eval(pt, [0, 0, 0])
                   - additive_3d(pt, None)) < 1e-10

    def test_grouped_exact_for_group_separable(self, slider_4d):
        pt = [0.4, -0.6, 0.8, 0.2]
        # f = g(x0,x1) + h(x2,x3) is exactly represented by the partition
        assert abs(slider_4d.eval(pt, [0, 0, 0, 0])
                   - grouped_4d(pt, None)) < 1e-7

    def test_10d_vectorized_build(self, slider_10d):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, size=(20, 10))
        vals = slider_10d.eval_batch(pts)
        exact = basket_10d_vec(pts, None)
        np.testing.assert_allclose(vals, exact, atol=1e-8)
        # build used sum of per-group grids, not the 9^10 product
        assert slider_10d.total_build_evals == 10 * 9

    def test_derivative_routes_to_owning_slide(self, slider_3d):
        pt = [0.5, 0.3, 0.1]
        d0 = slider_3d.eval(pt, [1, 0, 0])
        assert abs(d0 - math.cos(0.5)) < 1e-9
        d2 = slider_3d.eval(pt, [0, 0, 2])
        assert abs(d2 + math.sin(0.1)) < 1e-7

    def test_cross_group_mixed_partial_is_zero(self, slider_4d):
        assert slider_4d.eval([0.1, 0.2, 0.3, 0.4], [1, 0, 1, 0]) == 0.0

    def test_within_group_mixed_partial(self, slider_4d):
        pt = [0.4, -0.6, 0.0, 0.0]
        got = slider_4d.eval(pt, [1, 1, 0, 0])
        expected = math.cos(0.4) * (-math.sin(-0.6))
        assert abs(got - expected) < 1e-6

    def test_eval_batch_matches_single(self, slider_4d):
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1, 1, size=(15, 4))
        batch = slider_4d.eval_batch(pts)
        singles = [slider_4d.eval(list(p), [0, 0, 0, 0]) for p in pts]
        np.testing.assert_allclose(batch, singles, atol=1e-12)
        dbatch = slider_4d.eval_batch(pts, [1, 0, 0, 0])
        dsingles = [slider_4d.eval(list(p), [1, 0, 0, 0]) for p in pts]
        np.testing.assert_allclose(dbatch, dsingles, atol=1e-12)

    def test_eval_multi(self, slider_3d):
        pt = [0.2, 0.4, -0.3]
        out = slider_3d.eval_multi(pt, [[0, 0, 0], [1, 0, 0]])
        assert abs(out[0] - slider_3d.eval(pt, [0, 0, 0])) < 1e-14
        assert abs(out[1] - slider_3d.eval(pt, [1, 0, 0])) < 1e-14

    def test_derivative_id(self, slider_3d):
        did = slider_3d.get_derivative_id([1, 0, 0])
        assert slider_3d.eval([0.1, 0.2, 0.3], derivative_id=did) == \
            slider_3d.eval([0.1, 0.2, 0.3], [1, 0, 0])

    def test_partition_validation(self):
        with pytest.raises(ValueError, match="Partition"):
            ChebyshevSlider(additive_3d, 3, [[-1, 1]] * 3, [9] * 3,
                            partition=[[0], [1]], pivot_point=[0, 0, 0])
        with pytest.raises(ValueError, match="Partition"):
            ChebyshevSlider(additive_3d, 3, [[-1, 1]] * 3, [9] * 3,
                            partition=[[0], [1], [1, 2]],
                            pivot_point=[0, 0, 0])


class TestBatchMulti:
    """Fused batch x multi-spec path (vectorized_eval_batch_multi):
    one jitted dispatch for a whole Greek report."""

    def test_matches_per_spec_batches(self, slider_4d):
        rng = np.random.default_rng(11)
        pts = rng.uniform(-1, 1, size=(300, 4))
        orders_list = [[0, 0, 0, 0], [1, 0, 0, 0], [1, 1, 0, 0],
                       [0, 0, 2, 0], [0, 1, 0, 1]]  # last crosses groups
        out = slider_4d.vectorized_eval_batch_multi(pts, orders_list)
        assert out.shape == (300, 5)
        for j, orders in enumerate(orders_list):
            expected = slider_4d.eval_batch(pts, orders)
            np.testing.assert_allclose(out[:, j], expected, atol=1e-12)

    def test_cross_group_partial_exactly_zero(self, slider_4d):
        pts = np.random.default_rng(1).uniform(-1, 1, size=(16, 4))
        out = slider_4d.vectorized_eval_batch_multi(
            pts, [[1, 0, 1, 0]])
        np.testing.assert_array_equal(out, np.zeros((16, 1)))

    def test_matches_eval_multi_single_point(self, slider_3d):
        pt = [0.4, -0.2, 0.6]
        orders_list = [[0, 0, 0], [1, 0, 0], [0, 0, 2]]
        batch = slider_3d.vectorized_eval_batch_multi([pt], orders_list)
        single = slider_3d.eval_multi(pt, orders_list)
        np.testing.assert_allclose(batch[0], single, atol=1e-12)

    def test_value_only_report(self, slider_10d):
        pts = np.random.default_rng(2).uniform(-1, 1, size=(50, 10))
        out = slider_10d.vectorized_eval_batch_multi(pts, [[0] * 10])
        np.testing.assert_allclose(out[:, 0], slider_10d.eval_batch(pts),
                                   atol=1e-12)

    def test_validation(self, slider_3d):
        with pytest.raises(ValueError, match="does not match"):
            slider_3d.vectorized_eval_batch_multi(
                np.zeros((2, 3)), [[0, 0]])
        unbuilt = ChebyshevSlider(additive_3d, 3, [[-1, 1]] * 3, [7] * 3,
                                  partition=[[0], [1], [2]],
                                  pivot_point=[0.0, 0.0, 0.0])
        with pytest.raises(RuntimeError, match="build"):
            unbuilt.vectorized_eval_batch_multi(np.zeros((1, 3)), [[0] * 3])

    def test_alias(self, slider_3d):
        assert (slider_3d.eval_batch_multi
                == slider_3d.vectorized_eval_batch_multi)


class TestErrorEstimate:
    def test_sum_over_slides(self, slider_3d):
        per_slide = [s.error_estimate() for s in slider_3d.slides]
        assert abs(slider_3d.error_estimate() - sum(per_slide)) < 1e-15

    def test_unbuilt(self):
        s = ChebyshevSlider(additive_3d, 3, [[-1, 1]] * 3, [9] * 3,
                            partition=[[0], [1], [2]],
                            pivot_point=[0, 0, 0])
        with pytest.raises(RuntimeError):
            s.eval([0, 0, 0], [0, 0, 0])
        with pytest.raises(RuntimeError):
            s.error_estimate()
        with pytest.raises(RuntimeError):
            s.integrate()


class TestIntegration:
    def test_full_integration_additive(self, slider_3d):
        # int of sin over [-1,1]^3 = 0
        assert abs(slider_3d.integrate()) < 1e-12

    def test_full_integration_grouped(self, slider_4d):
        # integral over [-1,1]^4: sin*cos integrates to 0;
        # x2 * exp(0.3 x3): int x2 = 0 -> total 0... use sub-bounds instead
        got = slider_4d.integrate(
            dims=[0, 1, 2, 3],
            bounds=[(0.0, 1.0), None, (0.0, 1.0), None])
        # each additive term picks up the integrated widths of the
        # dims it does not depend on (x0: width 1, x1: width 2, ...)
        i_sin = 1.0 - math.cos(1.0)
        i_cos = 2.0 * math.sin(1.0)
        i_x2 = 0.5
        i_exp = (math.exp(0.3) - math.exp(-0.3)) / 0.3
        expected = (i_sin * i_cos) * (1.0 * 2.0) + (i_x2 * i_exp) * (1.0 * 2.0)
        assert abs(got - expected) < 1e-7

    def test_partial_integration(self, slider_4d):
        reduced = slider_4d.integrate(dims=[2, 3])
        assert isinstance(reduced, ChebyshevSlider)
        assert reduced.num_dimensions == 2
        pt = [0.4, -0.6]
        # int over (x2,x3) in [-1,1]^2 of f = 4*sin(x0)cos(x1) + 0
        expected = 4.0 * math.sin(0.4) * math.cos(-0.6)
        assert abs(reduced.eval(pt, [0, 0]) - expected) < 1e-7

    def test_partial_integration_within_group(self, slider_4d):
        reduced = slider_4d.integrate(dims=[1])
        assert reduced.num_dimensions == 3
        pt = [0.4, 0.8, 0.2]
        # int over x1 of f: sin(x0)*int cos + 2 * x2 exp(0.3 x3)
        expected = (math.sin(0.4) * 2.0 * math.sin(1.0)
                    + 2.0 * 0.8 * math.exp(0.3 * 0.2))
        assert abs(reduced.eval(pt, [0, 0, 0]) - expected) < 1e-7


class TestExtrudeSlice:
    def test_extrude(self, slider_3d):
        ext = slider_3d.extrude((1, (0.0, 5.0), 4))
        assert ext.num_dimensions == 4
        got = ext.eval([0.5, 3.3, 0.3, 0.1], [0, 0, 0, 0])
        assert abs(got - additive_3d([0.5, 0.3, 0.1], None)) < 1e-10

    def test_slice_single_dim_group_absorbs_pivot(self, slider_3d):
        sl = slider_3d.slice((1, 0.4))
        assert sl.num_dimensions == 2
        assert len(sl.partition) == 2
        got = sl.eval([0.5, 0.1], [0, 0])
        assert abs(got - additive_3d([0.5, 0.4, 0.1], None)) < 1e-10

    def test_slice_multi_dim_group(self, slider_4d):
        sl = slider_4d.slice((1, 0.5))
        assert sl.num_dimensions == 3
        got = sl.eval([0.4, 0.8, 0.2], [0, 0, 0])
        assert abs(got - grouped_4d([0.4, 0.5, 0.8, 0.2], None)) < 1e-7

    def test_slice_validation(self, slider_3d):
        with pytest.raises(ValueError):
            slider_3d.slice((0, 9.0))


class TestRootsOptimize:
    def test_roots(self, slider_3d):
        # sin(x0) + sin(0.5) + sin(-0.2) = 0
        roots = slider_3d.roots(dim=0, fixed={1: 0.5, 2: -0.2})
        expected = math.asin(-(math.sin(0.5) + math.sin(-0.2)))
        np.testing.assert_allclose(roots, [expected], atol=1e-8)

    def test_minimize_maximize(self, slider_3d):
        val, loc = slider_3d.maximize(dim=0, fixed={1: 0.0, 2: 0.0})
        assert abs(loc - 1.0) < 1e-8
        assert abs(val - math.sin(1.0)) < 1e-9
        val, loc = slider_3d.minimize(dim=0, fixed={1: 0.0, 2: 0.0})
        assert abs(loc + 1.0) < 1e-8


class TestAlgebra:
    def test_add_scalar(self, slider_3d):
        s2 = slider_3d + slider_3d
        pt = [0.3, -0.2, 0.6]
        assert abs(s2.eval(pt, [0, 0, 0])
                   - 2 * slider_3d.eval(pt, [0, 0, 0])) < 1e-11
        s3 = slider_3d * 2.5
        assert abs(s3.eval(pt, [0, 0, 0])
                   - 2.5 * slider_3d.eval(pt, [0, 0, 0])) < 1e-11
        s4 = slider_3d - slider_3d
        assert abs(s4.eval(pt, [0, 0, 0])) < 1e-12
        s5 = -slider_3d
        assert abs(s5.eval(pt, [0, 0, 0])
                   + slider_3d.eval(pt, [0, 0, 0])) < 1e-12

    def test_inplace(self):
        s = ChebyshevSlider(additive_3d, 3, [[-1, 1]] * 3, [9] * 3,
                            partition=[[0], [1], [2]],
                            pivot_point=[0.0, 0.0, 0.0])
        s.build(verbose=False)
        s *= 3.0
        pt = [0.3, -0.2, 0.6]
        assert abs(s.eval(pt, [0, 0, 0])
                   - 3 * additive_3d(pt, None)) < 1e-7

    def test_partition_mismatch(self, slider_3d):
        other = ChebyshevSlider(additive_3d, 3, [[-1, 1]] * 3, [11] * 3,
                                partition=[[0, 1], [2]],
                                pivot_point=[0.0, 0.0, 0.0])
        other.build(verbose=False)
        with pytest.raises(ValueError, match="Partition mismatch"):
            _ = slider_3d + other


class TestSerialization:
    def test_pickle_roundtrip(self, slider_4d, tmp_path):
        p = tmp_path / "sl.pkl"
        slider_4d.save(p)
        loaded = ChebyshevSlider.load(p)
        assert loaded.function is None
        pt = [0.1, 0.2, 0.3, 0.4]
        assert abs(loaded.eval(pt, [0] * 4)
                   - slider_4d.eval(pt, [0] * 4)) < 1e-14

    def test_load_wrong_type(self, tmp_path):
        p = tmp_path / "x.pkl"
        with open(p, "wb") as f:
            pickle.dump(42, f)
        with pytest.raises(TypeError):
            ChebyshevSlider.load(p)

    def test_unbuilt_save(self, tmp_path):
        s = ChebyshevSlider(additive_3d, 3, [[-1, 1]] * 3, [9] * 3,
                            partition=[[0], [1], [2]],
                            pivot_point=[0, 0, 0])
        with pytest.raises(RuntimeError):
            s.save(tmp_path / "x.pkl")

    def test_clone(self, slider_3d):
        c = slider_3d.clone()
        c *= 2.0
        pt = [0.3, 0.3, 0.3]
        assert abs(slider_3d.eval(pt, [0, 0, 0])
                   - additive_3d(pt, None)) < 1e-9


class TestErgonomics:
    def test_surface(self, slider_3d):
        assert slider_3d.is_construction_finished()
        assert slider_3d.get_constructor_type() == "ChebyshevSlider"
        assert slider_3d.get_used_ns() == [11, 11, 11]
        assert slider_3d.get_num_evaluation_points() == 33
        pts = slider_3d.get_evaluation_points()
        assert pts.shape == (33, 3)
        assert ChebyshevSlider.is_dimensionality_allowed(10)
        slider_3d.set_descriptor("slider test")
        assert slider_3d.get_descriptor() == "slider test"
        slider_3d.set_descriptor("")
        s = str(slider_3d)
        assert "ChebyshevSlider" in s and "Partition" in s


class TestSobol:
    def test_matches_dense_spectral(self):
        """Additive structure => slider Sobol must equal the dense
        spectral computation on the same function (cross-group
        interactions are exactly zero)."""
        f = lambda x, _: np.sin(x[0]) + x[1] ** 2 * x[2]
        dom = [[-1, 1]] * 3
        dense = ChebyshevApproximation(f, 3, dom, [9] * 3)
        dense.build(verbose=False)
        sl = ChebyshevSlider(f, 3, dom, [9] * 3, [[0], [1, 2]], [0.0] * 3)
        sl.build(verbose=False)
        ds, ss = dense.sobol_indices(), sl.sobol_indices()
        for key in ("first_order", "total_order"):
            for d in range(3):
                assert abs(ds[key][d] - ss[key][d]) < 1e-10
        assert abs(ds["variance"] - ss["variance"]) < 1e-9

    def test_uneven_partition_scaled_domains(self):
        f = lambda x, _: np.exp(x[0] * x[1]) + np.cos(x[2])
        dom = [[-1, 1], [0, 2], [-0.5, 0.5]]
        dense = ChebyshevApproximation(f, 3, dom, [11] * 3)
        dense.build(verbose=False)
        sl = ChebyshevSlider(f, 3, dom, [11] * 3, [[0, 1], [2]],
                             [0.0, 1.0, 0.0])
        sl.build(verbose=False)
        ds, ss = dense.sobol_indices(), sl.sobol_indices()
        for key in ("first_order", "total_order"):
            for d in range(3):
                assert abs(ds[key][d] - ss[key][d]) < 1e-9
        assert abs(ds["variance"] - ss["variance"]) \
            < 1e-8 * abs(ds["variance"])

    def test_requires_build(self):
        sl = ChebyshevSlider(lambda x, _: x[0], 2, [[-1, 1]] * 2,
                             [5] * 2, [[0], [1]], [0.0, 0.0])
        with pytest.raises(RuntimeError, match="build"):
            sl.sobol_indices()


class TestBatchValidation:
    def test_eval_batch_rejects_wrong_length_specs(self, slider_3d):
        pts = np.zeros((4, 3))
        with pytest.raises(ValueError, match="length"):
            slider_3d.eval_batch(pts, [0, 0, 0, 1])
        with pytest.raises(ValueError, match="length"):
            slider_3d.eval_batch(pts, [1])

    def test_eval_batch_accepts_derivative_id(self, slider_3d):
        d_id = slider_3d.get_derivative_id([1, 0, 0])
        pts = np.random.default_rng(0).uniform(-0.9, 0.9, (10, 3))
        via_id = np.asarray(slider_3d.eval_batch(pts, derivative_id=d_id))
        via_spec = np.asarray(slider_3d.eval_batch(pts, [1, 0, 0]))
        np.testing.assert_array_equal(via_id, via_spec)


class TestSliderToTT:
    """Exact TT form of the sliding sum (accumulator + pass-through)."""

    def test_basket_converts_to_rank_2(self, slider_10d):
        tt = slider_10d.to_tt()
        assert tt.tt_ranks == [1] + [2] * 9 + [1]
        rng = np.random.default_rng(11)
        pts = rng.uniform(-0.95, 0.95, (100, 10))
        want = np.asarray(slider_10d.eval_batch(pts, [0] * 10))
        got = np.asarray(tt.eval_batch(pts))
        assert np.abs(got - want).max() < 1e-11

    def test_grouped_partition_agreement(self, slider_4d):
        tt = slider_4d.to_tt()
        rng = np.random.default_rng(12)
        pts = rng.uniform(-0.95, 0.95, (100, 4))
        want = np.asarray(slider_4d.eval_batch(pts, [0] * 4))
        got = np.asarray(tt.eval_batch(pts))
        assert np.abs(got - want).max() < 1e-12
        # inter-group bond is the 2-channel accumulator
        assert tt.tt_ranks[2] == 2

    def test_noncontiguous_partition_dim_order(self):
        def f(x, _):
            return math.sin(x[0]) * math.cos(x[2]) + x[1] * x[3] ** 2

        s = ChebyshevSlider(f, 4, [[-1, 1]] * 4, [7] * 4,
                            partition=[[0, 2], [1, 3]],
                            pivot_point=[0.0] * 4)
        s.build(verbose=False)
        tt = s.to_tt()
        assert tt.dim_order == [0, 2, 1, 3]
        rng = np.random.default_rng(13)
        pts = rng.uniform(-0.9, 0.9, (64, 4))
        want = np.asarray(s.eval_batch(pts, [0] * 4))
        got = np.asarray(tt.eval_batch(pts))
        assert np.abs(got - want).max() < 1e-12

    def test_pivot_value_round_trip(self, slider_3d):
        tt = slider_3d.to_tt()
        z = slider_3d.pivot_point
        assert tt.eval(z) == pytest.approx(
            slider_3d.eval(z, [0, 0, 0]), abs=1e-13)

    def test_single_group_and_metadata(self):
        def f(x, _):
            return math.sin(x[0]) + x[1] ** 2

        s = ChebyshevSlider(f, 2, [[-1, 1]] * 2, [7] * 2,
                            partition=[[0, 1]], pivot_point=[0.0, 0.0])
        s.build(verbose=False)
        s.set_descriptor("one-group")
        tt = s.to_tt()
        assert tt.get_descriptor() == "one-group"
        assert tt.is_construction_finished()
        assert tt.eval([0.4, -0.3]) == pytest.approx(
            s.eval([0.4, -0.3], [0, 0]), abs=1e-12)

    def test_unbuilt_raises(self):
        s = ChebyshevSlider(additive_3d, 3, [[-1, 1]] * 3, [9] * 3,
                            partition=[[0], [1], [2]],
                            pivot_point=[0.0] * 3)
        with pytest.raises(RuntimeError, match="build"):
            s.to_tt()

    def test_rides_tt_algebra_and_dd(self, slider_3d):
        tt = slider_3d.to_tt()
        doubled = tt + tt
        pt = [0.2, -0.4, 0.6]
        assert doubled.eval(pt) == pytest.approx(
            2 * slider_3d.eval(pt, [0] * 3), abs=1e-11)
        rng = np.random.default_rng(14)
        pts = rng.uniform(-0.9, 0.9, (32, 3))
        got = np.asarray(tt.eval_batch_dd(pts))
        want = np.asarray(slider_3d.eval_batch(pts, [0] * 3))
        assert np.abs(got - want).max() < 1e-10

    def test_tt_sobol_matches_slider_sobol(self, slider_3d):
        tt = slider_3d.to_tt()
        a = slider_3d.sobol_indices()
        b = tt.sobol_indices()
        for d in range(3):
            assert b["first_order"][d] == pytest.approx(
                a["first_order"][d], abs=1e-9)

    def test_add_correction_needing_rank_growth(self, slider_3d):
        # Regression: to_tt's max_rank must leave rounding headroom —
        # a converted rank-2 TT plus a rank-1 product correction needs
        # bond rank 3; capping at the converted model's own ranks
        # silently truncated the sum (measured 1.6e-2 off).
        def prod3(x, _):
            return 0.1 * math.sin(x[0]) * math.cos(x[1]) * x[2]

        corr = ChebyshevTT(prod3, 3, [[-1, 1]] * 3, [11] * 3, max_rank=1)
        corr.build(verbose=False, seed=0)
        combo = slider_3d.to_tt() + corr
        rng = np.random.default_rng(15)
        pts = rng.uniform(-0.9, 0.9, (100, 3))
        want = (np.asarray(slider_3d.eval_batch(pts, [0] * 3))
                + np.asarray(corr.eval_batch(pts)))
        got = np.asarray(combo.eval_batch(pts))
        assert max(combo.tt_ranks) >= 3
        assert np.abs(got - want).max() < 1e-11

    def test_end_group_bonds_are_trimmed(self, slider_4d):
        # First/last multi-dim groups carry no dead acc/pass channel:
        # interior bonds are slide_rank + 1, not slide_rank + 2.
        tt = slider_4d.to_tt()
        slide_rank = 2  # each 2-D slide is a rank-2 function here
        assert tt.tt_ranks[1] == slide_rank + 1
        assert tt.tt_ranks[3] == slide_rank + 1

    def test_converted_tt_serves_through_dd_engine(self, slider_3d):
        from pychebyshev_tpu.serving import BatchedEvaluator
        eng = BatchedEvaluator(slider_3d.to_tt(), dtype="dd")
        rng = np.random.default_rng(16)
        pts = rng.uniform(-0.9, 0.9, (48, 3))
        want = np.asarray(slider_3d.eval_batch(pts, [0] * 3))
        np.testing.assert_allclose(eng(pts), want, atol=1e-10)


def test_ctor_rejects_empty_partition_group():
    with pytest.raises(ValueError, match="non-empty"):
        ChebyshevSlider(additive_3d, 3, [[-1, 1]] * 3, [9] * 3,
                        partition=[[0, 1, 2], []],
                        pivot_point=[0.0] * 3)


class TestSliderInteractionMatrix:
    def test_cross_group_exact_zero_within_group_detected(self,
                                                          slider_4d):
        m = slider_4d.interaction_matrix()
        # groups [[0,1],[2,3]]: cross-group entries identically zero
        assert m[0, 2] == 0.0 and m[1, 3] == 0.0
        # each slide is a genuinely 2-way function here
        assert m[0, 1] > 1e-6 and m[2, 3] > 1e-6

    def test_matches_converted_tt(self, slider_4d):
        tt = slider_4d.to_tt()
        np.testing.assert_allclose(tt.interaction_matrix(),
                                   slider_4d.interaction_matrix(),
                                   atol=1e-9)

    def test_unbuilt_raises(self):
        s = ChebyshevSlider(additive_3d, 3, [[-1, 1]] * 3, [9] * 3,
                            partition=[[0], [1], [2]],
                            pivot_point=[0.0] * 3)
        with pytest.raises(RuntimeError):
            s.interaction_matrix()
