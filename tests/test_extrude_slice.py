"""Extrude / slice consistency across all four families: results must
match interpolants built directly in the higher/lower dimension, exact
at nodes, with correct metadata — repo-native coverage of the behaviors
reference ``test_extrude_slice.py`` (63 tests) pins."""

import math

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)


def f2(x, _):
    return math.sin(x[0]) * math.exp(0.3 * x[1])


@pytest.fixture(scope="module")
def cheb2():
    c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [9, 8])
    c.build(verbose=False)
    return c


class TestDenseExtrude:
    def test_constant_along_new_dim(self, cheb2):
        ext = cheb2.extrude((2, (-3.0, 3.0), 5))
        assert ext.num_dimensions == 3
        assert ext.n_nodes == [9, 8, 5]
        base = cheb2.eval([0.4, 1.2], [0, 0])
        for z in (-2.9, 0.0, 1.7):
            assert abs(ext.eval([0.4, 1.2, z], [0, 0, 0]) - base) < 1e-13

    def test_extrude_front_position(self, cheb2):
        ext = cheb2.extrude((0, (0.0, 1.0), 4))
        assert ext.n_nodes == [4, 9, 8]
        assert abs(ext.eval([0.5, 0.4, 1.2], [0, 0, 0])
                   - cheb2.eval([0.4, 1.2], [0, 0])) < 1e-13

    def test_multiple_extrusions_sorted_application(self, cheb2):
        ext = cheb2.extrude([(3, (0.0, 1.0), 3), (0, (-1.0, 0.0), 4)])
        assert ext.num_dimensions == 4
        assert abs(ext.eval([-0.5, 0.4, 1.2, 0.5], [0] * 4)
                   - cheb2.eval([0.4, 1.2], [0, 0])) < 1e-13

    def test_derivative_along_new_dim_is_zero(self, cheb2):
        ext = cheb2.extrude((2, (-1.0, 1.0), 5))
        assert abs(ext.eval([0.4, 1.2, 0.3], [0, 0, 1])) < 1e-10

    def test_matches_direct_build(self, cheb2):
        f3 = lambda x, _: f2([x[0], x[1]], None)
        direct = ChebyshevApproximation(f3, 3,
                                        [[-1, 1], [0, 2], [5, 6]],
                                        [9, 8, 4])
        direct.build(verbose=False)
        ext = cheb2.extrude((2, (5.0, 6.0), 4))
        for pt in ([0.3, 0.5, 5.5], [-0.8, 1.9, 5.01]):
            assert abs(ext.eval(pt, [0, 0, 0])
                       - direct.eval(pt, [0, 0, 0])) < 1e-12


class TestDenseSlice:
    def test_matches_pointwise(self, cheb2):
        sl = cheb2.slice((1, 0.7))
        assert sl.num_dimensions == 1
        for x in (-0.9, 0.0, 0.8):
            assert abs(sl.eval([x], [0])
                       - cheb2.eval([x, 0.7], [0, 0])) < 1e-12

    def test_exact_at_node_value(self, cheb2):
        node = float(np.asarray(cheb2.nodes[1])[3])
        sl = cheb2.slice((1, node))
        tv = np.asarray(cheb2.tensor_values)
        np.testing.assert_allclose(np.asarray(sl.tensor_values),
                                   tv[:, 3], rtol=0, atol=0)

    def test_multi_slice_back_to_front(self):
        c = ChebyshevApproximation(
            lambda x, _: x[0] + 2 * x[1] + 4 * x[2], 3, [[-1, 1]] * 3,
            [5, 5, 5])
        c.build(verbose=False)
        sl = c.slice([(0, 0.5), (2, -0.25)])
        assert sl.num_dimensions == 1
        assert abs(sl.eval([0.3], [0]) - (0.5 + 0.6 - 1.0)) < 1e-12

    def test_slice_of_extrude_identity(self, cheb2):
        ext = cheb2.extrude((1, (0.0, 1.0), 6))
        back = ext.slice((1, 0.37))
        for pt in ([0.3, 0.5], [-0.8, 1.9]):
            assert abs(back.eval(pt, [0, 0])
                       - cheb2.eval(pt, [0, 0])) < 1e-12

    def test_out_of_domain_value_raises(self, cheb2):
        with pytest.raises(ValueError, match="outside"):
            cheb2.slice((1, 5.0))


class TestSplineExtrudeSlice:
    @pytest.fixture(scope="class")
    def spl(self):
        s = ChebyshevSpline(lambda x, _: abs(x[0]) + 0.2 * x[1], 2,
                            [[-1, 1], [0, 2]], [7, 6], [[0.0], []])
        s.build(verbose=False)
        return s

    def test_extrude_keeps_knots(self, spl):
        ext = spl.extrude((2, (0.0, 1.0), 4))
        assert ext.num_dimensions == 3
        assert ext.knots[0] == [0.0] and ext.knots[2] == []
        assert abs(ext.eval([-0.4, 1.0, 0.5], [0, 0, 0])
                   - spl.eval([-0.4, 1.0], [0, 0])) < 1e-13

    def test_slice_smooth_dim_keeps_pieces(self, spl):
        sl = spl.slice((1, 1.3))
        assert sl.num_dimensions == 1
        assert sl.knots[0] == [0.0]
        for x in (-0.8, -0.1, 0.4):
            assert abs(sl.eval([x], [0])
                       - spl.eval([x, 1.3], [0, 0])) < 1e-12

    def test_slice_kink_dim_selects_piece(self, spl):
        sl = spl.slice((0, -0.5))       # inside the left piece
        assert sl.num_dimensions == 1
        for y in (0.1, 1.0, 1.9):
            assert abs(sl.eval([y], [0])
                       - spl.eval([-0.5, y], [0, 0])) < 1e-12


class TestTTExtrudeSlice:
    @pytest.fixture(scope="class")
    def tt(self):
        t = ChebyshevTT(lambda x, _: math.sin(x[0]) * x[1] + x[2] ** 2,
                        3, [[-1, 1]] * 3, [8] * 3, max_rank=5)
        t.build(verbose=False, method="svd")
        return t

    def test_extrude_rank_preserving(self, tt):
        ext = tt.extrude((3, (0.0, 1.0), 4))
        assert ext.num_dimensions == 4
        base = tt.eval([0.3, -0.5, 0.8])
        for w in (0.1, 0.9):
            assert abs(ext.eval([0.3, -0.5, 0.8, w]) - base) < 1e-10

    def test_slice_matches_pointwise(self, tt):
        sl = tt.slice((1, 0.25))
        assert sl.num_dimensions == 2
        for pt in ([0.3, 0.8], [-0.9, -0.2]):
            assert abs(sl.eval(pt)
                       - tt.eval([pt[0], 0.25, pt[1]])) < 1e-10

    def test_slice_then_extrude_round_trip(self, tt):
        back = tt.slice((2, 0.5)).extrude((2, (-1.0, 1.0), 8))
        # the extruded dim is constant at the sliced value
        assert abs(back.eval([0.3, -0.5, 0.123])
                   - tt.eval([0.3, -0.5, 0.5])) < 1e-10


class TestSliderExtrudeSlice:
    @pytest.fixture(scope="class")
    def slider(self):
        s = ChebyshevSlider(
            lambda x, _: math.sin(x[0]) + x[1] * x[2], 3,
            [[-1, 1]] * 3, [7] * 3, [[0], [1, 2]], [0.0, 0.0, 0.0])
        s.build(verbose=False)
        return s

    def test_extrude_adds_constant_slide(self, slider):
        ext = slider.extrude((3, (0.0, 1.0), 4))
        assert ext.num_dimensions == 4
        base = slider.eval([0.3, 0.5, -0.2], [0, 0, 0])
        assert abs(ext.eval([0.3, 0.5, -0.2, 0.7], [0] * 4) - base) \
            < 1e-11

    def test_slice_single_dim_group_absorbs_into_pivot(self, slider):
        sl = slider.slice((0, 0.4))
        assert sl.num_dimensions == 2
        for pt in ([0.5, -0.2], [0.9, 0.9]):
            want = slider.eval([0.4, pt[0], pt[1]], [0, 0, 0])
            assert abs(sl.eval(pt, [0, 0]) - want) < 1e-11

    def test_slice_within_multi_dim_group(self, slider):
        sl = slider.slice((1, 0.6))
        assert sl.num_dimensions == 2
        for pt in ([0.5, -0.2], [-0.9, 0.9]):
            want = slider.eval([pt[0], 0.6, pt[1]], [0, 0, 0])
            assert abs(sl.eval(pt, [0, 0]) - want) < 1e-11


class TestCrossClassConsistency:
    def test_dense_tt_slider_extrude_agree(self):
        fn = lambda x, _: math.sin(x[0]) + 0.5 * x[1]
        dense = ChebyshevApproximation(fn, 2, [[-1, 1]] * 2, [7, 7])
        dense.build(verbose=False)
        tt = ChebyshevTT(fn, 2, [[-1, 1]] * 2, [7, 7], max_rank=4)
        tt.build(verbose=False, method="svd")
        de = dense.extrude((2, (0.0, 1.0), 4))
        te = tt.extrude((2, (0.0, 1.0), 4))
        for pt in ([0.3, -0.5, 0.5], [-0.9, 0.9, 0.01]):
            assert abs(de.eval(pt, [0, 0, 0]) - te.eval(pt)) < 1e-9
