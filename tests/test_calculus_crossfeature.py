"""Calculus x transform cross-features on slider and TT.

Native coverage for the reference behavior classes the shim-only run
exercised (reference ``test_calculus_completion.py:22-59, 60-96,
665-699, 937-1016, 1018-1049, 1222-1366``): the partition-intersect
classifier, the TT core quadrature contraction, the ``_to_1d_chebyshev``
re-sampling contract, and roots/min/max composed with extrude, slice,
algebra, reorder, auto-order, save/load, and non-uniform domains —
expressed against this repo's API, so the suite stands without
``/root/reference``.
"""

import numpy as np
import pytest

from pychebyshev_tpu import (ChebyshevApproximation, ChebyshevSlider,
                             ChebyshevTT)
from pychebyshev_tpu.ops.quadrature import fejer1_weights
from pychebyshev_tpu.utils.calculus import slider_partition_intersect


class TestPartitionIntersectClassifier:
    def test_disjoint_is_none(self):
        kind, kept = slider_partition_intersect([0, 1], [2, 3])
        assert kind == "none" and kept == [0, 1]

    def test_exact_cover_is_full(self):
        kind, kept = slider_partition_intersect([1, 2], [1, 2])
        assert kind == "full" and kept == []

    def test_group_inside_larger_set_is_full(self):
        kind, kept = slider_partition_intersect([1], [0, 1, 2])
        assert kind == "full" and kept == []

    def test_overlap_is_partial_and_preserves_order(self):
        kind, kept = slider_partition_intersect([3, 0, 2], [0])
        assert kind == "partial" and kept == [3, 2]

    def test_empty_integration_set_is_none(self):
        kind, kept = slider_partition_intersect([0, 1], [])
        assert kind == "none" and kept == [0, 1]


class TestTTCoreQuadrature:
    """Contracting one value core's node axis with Fejér-1 weights is
    the TT integral building block (reference _calculus.py:388-404)."""

    def test_rank_one_core_recovers_1d_integral(self):
        # f(x) = x^2 on [-1, 1]: integral 2/3.
        n = 9
        t = np.cos((2 * np.arange(n) + 1) * np.pi / (2 * n))
        core = (t ** 2)[None, :, None]  # (1, n, 1) value core
        w = fejer1_weights(n)
        out = np.einsum("rjs,j->rs", core, w)
        assert out.shape == (1, 1)
        assert out[0, 0] == pytest.approx(2.0 / 3.0, abs=1e-12)

    def test_higher_rank_core_contracts_per_slice(self):
        rng = np.random.default_rng(0)
        core = rng.standard_normal((3, 7, 4))
        w = fejer1_weights(7)
        out = np.einsum("rjs,j->rs", core, w)
        for r in range(3):
            for s in range(4):
                assert out[r, s] == pytest.approx(core[r, :, s] @ w)

    def test_single_node_core(self):
        core = np.full((2, 1, 2), 5.0)
        out = np.einsum("rjs,j->rs", core, fejer1_weights(1))
        # Fejér-1 with one node integrates constants exactly: w = 2.
        np.testing.assert_allclose(out, 10.0 * np.ones((2, 2)))


def _poly(p, data=None):
    p = np.asarray(p, dtype=np.float64)
    if p.ndim == 1:
        p = p[None, :]
    return (p[:, 0] - 0.25) * (p[:, 0] + 0.55) + 0.1 * p[:, 1]


@pytest.fixture(scope="module")
def slider3():
    def f(p, data=None):
        p = np.asarray(p, dtype=np.float64)
        if p.ndim == 1:
            p = p[None, :]
        return (p[:, 0] ** 2 - 0.25) + np.sin(p[:, 1] + p[:, 2])

    s = ChebyshevSlider(f, 3, [[-1.0, 1.0]] * 3, [9] * 3,
                        partition=[[0], [1, 2]],
                        pivot_point=[0.0, 0.0, 0.0], vectorized=True)
    s.build(verbose=False)
    return s


@pytest.fixture(scope="module")
def tt3():
    def f(p, data=None):
        p = np.asarray(p, dtype=np.float64)
        if p.ndim == 1:
            p = p[None, :]
        return (p[:, 0] ** 2 - 0.25) * np.exp(0.3 * p[:, 1]) + 0.0 * p[:, 2]

    t = ChebyshevTT(f, 3, [[-1.0, 1.0]] * 3, [9] * 3, max_rank=6,
                    vectorized=True)
    t.build(verbose=False, method="svd")
    return t


class TestTo1DResampling:
    """Slicing to 1-D then re-sampling onto a dense 1-D interpolant
    must reproduce the function and its grid metadata — the bridge
    every slider/TT roots/minimize/maximize call crosses."""

    def test_slider_roots_recover_function_zeros(self, slider3):
        roots = slider3.roots(dim=0, fixed=[(1, 0.2), (2, -0.1)])
        # f = x0^2 - 0.25 + sin(0.1): zeros of the 1-D slice
        target = np.sort(np.array([-1, 1]) * np.sqrt(0.25 - np.sin(0.1)))
        np.testing.assert_allclose(np.sort(roots), target, atol=1e-8)

    def test_slider_1d_bridge_preserves_grid(self, slider3):
        sliced = slider3.slice([(1, 0.2), (2, -0.1)])
        dense = slider3._to_1d_chebyshev(sliced)
        assert isinstance(dense, ChebyshevApproximation)
        assert dense.num_dimensions == 1
        assert list(dense.get_used_ns()) == [9]
        assert tuple(dense.domain[0]) == (-1.0, 1.0)

    def test_tt_1d_bridge_preserves_grid(self, tt3):
        sliced = tt3.slice([(1, 0.0), (2, 0.5)])
        dense = tt3._to_1d_chebyshev(sliced)
        assert dense.num_dimensions == 1
        assert list(dense.get_used_ns()) == [9]
        assert tuple(dense.domain[0]) == (-1.0, 1.0)

    def test_tt_bridge_values_match_eval(self, tt3):
        sliced = tt3.slice([(1, 0.0), (2, 0.5)])
        dense = tt3._to_1d_chebyshev(sliced)
        for x in (-0.8, -0.2, 0.3, 0.9):
            assert dense.vectorized_eval([x], [0]) == pytest.approx(
                tt3.eval([x, 0.0, 0.5]), abs=1e-10)


class TestSliderMinMaxEdges:
    def test_constant_function(self):
        s = ChebyshevSlider(lambda p, d=None: 3.25, 2, [[0.0, 1.0]] * 2,
                            [5, 5], partition=[[0], [1]],
                            pivot_point=[0.5, 0.5])
        s.build(verbose=False)
        vmin, _ = s.minimize(dim=0, fixed=[(1, 0.3)])
        vmax, _ = s.maximize(dim=0, fixed=[(1, 0.3)])
        assert vmin == pytest.approx(3.25, abs=1e-10)
        assert vmax == pytest.approx(3.25, abs=1e-10)

    def test_endpoint_extremum(self, slider3):
        # f restricted to x0 is x0^2 + const: max sits at the +-1 edge.
        vmax, loc = slider3.maximize(dim=0, fixed=[(1, 0.0), (2, 0.0)])
        assert abs(abs(loc) - 1.0) < 1e-8
        assert vmax == pytest.approx(1.0 - 0.25 + np.sin(0.0), abs=1e-8)

    def test_interior_minimum(self, slider3):
        vmin, loc = slider3.minimize(dim=0, fixed=[(1, 0.0), (2, 0.0)])
        assert loc == pytest.approx(0.0, abs=1e-6)
        assert vmin == pytest.approx(-0.25, abs=1e-8)


class TestSliderCalculusAfterTransforms:
    def test_roots_after_extrude(self, slider3):
        ext = slider3.extrude([(3, (0.0, 1.0), 4)])
        got = ext.roots(dim=0, fixed=[(1, 0.2), (2, -0.1), (3, 0.7)])
        want = slider3.roots(dim=0, fixed=[(1, 0.2), (2, -0.1)])
        np.testing.assert_allclose(np.sort(got), np.sort(want),
                                   atol=1e-9)

    def test_minimize_after_slice(self, slider3):
        sub = slider3.slice([(2, -0.1)])
        got = sub.minimize(dim=0, fixed=[(1, 0.2)])
        want = slider3.minimize(dim=0, fixed=[(1, 0.2), (2, -0.1)])
        assert got[0] == pytest.approx(want[0], abs=1e-9)
        assert got[1] == pytest.approx(want[1], abs=1e-6)

    def test_maximize_after_algebra(self, slider3):
        doubled = slider3 + slider3
        got = doubled.maximize(dim=0, fixed=[(1, 0.0), (2, 0.0)])
        want = slider3.maximize(dim=0, fixed=[(1, 0.0), (2, 0.0)])
        assert got[0] == pytest.approx(2.0 * want[0], abs=1e-8)

    def test_roots_survive_pickle_round_trip(self, slider3, tmp_path):
        import pickle
        clone = pickle.loads(pickle.dumps(slider3))
        got = clone.roots(dim=0, fixed=[(1, 0.2), (2, -0.1)])
        want = slider3.roots(dim=0, fixed=[(1, 0.2), (2, -0.1)])
        np.testing.assert_allclose(np.sort(got), np.sort(want),
                                   atol=1e-12)


class TestTTCalculusAfterTransforms:
    def test_roots_after_slice(self, tt3):
        sub = tt3.slice([(2, 0.5)])
        got = sub.roots(dim=0, fixed=[(1, 0.0)])
        np.testing.assert_allclose(np.sort(got), [-0.5, 0.5], atol=1e-8)

    def test_maximize_after_extrude(self, tt3):
        ext = tt3.extrude([(3, (0.0, 2.0), 4)])
        got = ext.maximize(dim=0, fixed=[(1, 0.0), (2, 0.0), (3, 1.5)])
        want = tt3.maximize(dim=0, fixed=[(1, 0.0), (2, 0.0)])
        assert got[0] == pytest.approx(want[0], abs=1e-8)

    def test_minimize_after_reorder(self, tt3):
        re = tt3.reorder([2, 0, 1])
        # User frame is preserved: dim 0 still means x0.
        got = re.minimize(dim=0, fixed=[(1, 0.0), (2, 0.0)])
        want = tt3.minimize(dim=0, fixed=[(1, 0.0), (2, 0.0)])
        assert got[0] == pytest.approx(want[0], abs=1e-8)
        assert got[1] == pytest.approx(want[1], abs=1e-6)

    def test_minimize_after_algebra(self, tt3):
        shifted = tt3 + tt3
        got = shifted.minimize(dim=0, fixed=[(1, 0.0), (2, 0.0)])
        want = tt3.minimize(dim=0, fixed=[(1, 0.0), (2, 0.0)])
        assert got[0] == pytest.approx(2.0 * want[0], abs=1e-7)

    def test_roots_after_with_auto_order(self):
        def f(p, data=None):
            p = np.asarray(p, dtype=np.float64)
            if p.ndim == 1:
                p = p[None, :]
            return (p[:, 0] - 0.25) * (p[:, 0] + 0.55) + 0.0 * p[:, 1]

        t = ChebyshevTT.with_auto_order(f, 2, [[-1.0, 1.0]] * 2, [9, 9],
                                        max_rank=5, vectorized=True)
        got = t.roots(dim=0, fixed=[(1, 0.3)])
        np.testing.assert_allclose(np.sort(got), [-0.55, 0.25],
                                   atol=1e-8)

    def test_roots_survive_pcb_free_save_load(self, tt3, tmp_path):
        path = str(tmp_path / "tt.pkl")
        tt3.save(path)
        clone = ChebyshevTT.load(path)
        got = clone.roots(dim=0, fixed=[(1, 0.0), (2, 0.5)])
        want = tt3.roots(dim=0, fixed=[(1, 0.0), (2, 0.5)])
        np.testing.assert_allclose(np.sort(got), np.sort(want),
                                   atol=1e-12)


class TestTTNonUniformDomainReordered:
    """Roots/min/max in the USER frame after reorder when every dim has
    a different domain — the frame-translation trap the reference pins
    (test_calculus_completion.py:1302-1366)."""

    @pytest.fixture(scope="class")
    def tt_wide(self):
        def f(p, data=None):
            p = np.asarray(p, dtype=np.float64)
            if p.ndim == 1:
                p = p[None, :]
            return (p[:, 0] - 3.0) * (p[:, 0] - 7.0) + 0.0 * (
                p[:, 1] + p[:, 2])

        t = ChebyshevTT(f, 3, [[2.0, 8.0], [-5.0, -1.0], [10.0, 20.0]],
                        [9] * 3, max_rank=5, vectorized=True)
        t.build(verbose=False, method="svd")
        return t.reorder([2, 0, 1])

    def test_roots_user_frame(self, tt_wide):
        got = tt_wide.roots(dim=0, fixed=[(1, -2.0), (2, 12.0)])
        np.testing.assert_allclose(np.sort(got), [3.0, 7.0], atol=1e-7)

    def test_minimize_user_frame(self, tt_wide):
        vmin, loc = tt_wide.minimize(dim=0, fixed=[(1, -2.0), (2, 12.0)])
        assert loc == pytest.approx(5.0, abs=1e-6)
        assert vmin == pytest.approx(-4.0, abs=1e-8)

    def test_maximize_user_frame(self, tt_wide):
        vmax, loc = tt_wide.maximize(dim=0, fixed=[(1, -2.0), (2, 12.0)])
        assert abs(loc - 2.0) < 1e-6 or abs(loc - 8.0) < 1e-6
        assert vmax == pytest.approx(5.0, abs=1e-7)

    def test_out_of_range_fixed_names_user_dim(self, tt_wide):
        with pytest.raises(ValueError):
            tt_wide.roots(dim=0, fixed=[(1, 0.0), (2, 12.0)])


class TestIntegrateAfterSVDBuild:
    def test_tt_svd_integrate_matches_dense(self, tt3):
        def f(p, data=None):
            p = np.asarray(p, dtype=np.float64)
            if p.ndim == 1:
                p = p[None, :]
            return (p[:, 0] ** 2 - 0.25) * np.exp(0.3 * p[:, 1]) + 0.0 * \
                p[:, 2]

        dense = ChebyshevApproximation(f, 3, [[-1.0, 1.0]] * 3, [9] * 3,
                                       vectorized=True)
        dense.build(verbose=False)
        assert tt3.integrate() == pytest.approx(dense.integrate(),
                                                rel=1e-9)
