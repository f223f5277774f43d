"""The nodes() -> external evaluation -> from_values() workflow.

Repo-native coverage of the behaviors the reference pins in
``tests/test_from_values.py`` (65 tests): grid metadata correctness,
bit-equality between an externally-filled interpolant and ``build()``,
full downstream surface (derivatives, calculus, algebra, serialization)
on from_values objects, and the error paths.
"""

import io
import math

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevSpline
from pychebyshev_tpu.utils import binary


def f2(x, _):
    return math.sin(x[0]) + x[1] ** 2


DOM2 = [[-1.0, 1.0], [0.0, 2.0]]


def built2(n=(7, 6)):
    cheb = ChebyshevApproximation(f2, 2, DOM2, list(n))
    cheb.build(verbose=False)
    return cheb


def external_fill(num_dimensions, domain, n_nodes, fn):
    """The HPC workflow: grid out, evaluate outside, values in."""
    info = ChebyshevApproximation.nodes(num_dimensions, domain, n_nodes)
    vals = np.array([fn(list(p), None) for p in info["full_grid"]])
    return ChebyshevApproximation.from_values(
        vals.reshape(info["shape"]), num_dimensions, domain, n_nodes)


class TestNodesMetadata:
    @pytest.mark.parametrize("ndim,n_nodes", [(1, [5]), (2, [4, 6]),
                                              (3, [3, 4, 5])])
    def test_keys_and_shapes(self, ndim, n_nodes):
        dom = [[-1.0 - d, 1.0 + d] for d in range(ndim)]
        info = ChebyshevApproximation.nodes(ndim, dom, n_nodes)
        assert set(info) == {"nodes_per_dim", "full_grid", "shape"}
        assert info["shape"] == tuple(n_nodes)
        assert info["full_grid"].shape == (int(np.prod(n_nodes)), ndim)
        for d in range(ndim):
            nd = info["nodes_per_dim"][d]
            assert len(nd) == n_nodes[d]
            assert (np.diff(nd) > 0).all()               # ascending
            assert nd[0] > dom[d][0] and nd[-1] < dom[d][1]  # Type-I: open

    def test_grid_is_c_order_cartesian(self):
        info = ChebyshevApproximation.nodes(2, DOM2, [3, 2])
        per = info["nodes_per_dim"]
        k = 0
        for i in range(3):
            for j in range(2):
                assert info["full_grid"][k, 0] == per[0][i]
                assert info["full_grid"][k, 1] == per[1][j]
                k += 1

    def test_matches_build_nodes(self):
        cheb = built2()
        info = ChebyshevApproximation.nodes(2, DOM2, cheb.n_nodes)
        for d in range(2):
            np.testing.assert_array_equal(info["nodes_per_dim"][d],
                                          np.asarray(cheb.nodes[d]))

    def test_length_mismatch_raises(self):
        with pytest.raises(ValueError, match="num_dimensions"):
            ChebyshevApproximation.nodes(2, DOM2, [5])
        with pytest.raises(ValueError, match="num_dimensions"):
            ChebyshevApproximation.nodes(2, [[-1, 1]], [5, 5])


class TestFromValuesBitEquality:
    """from_values on externally-computed grid values must be
    indistinguishable from build() — bit-level tensor equality and
    matching output on every downstream surface."""

    def test_tensor_bits_match_build(self):
        cheb = built2()
        fv = external_fill(2, DOM2, cheb.n_nodes, f2)
        np.testing.assert_array_equal(np.asarray(fv.tensor_values),
                                      np.asarray(cheb.tensor_values))

    @pytest.mark.parametrize("orders", [[0, 0], [1, 0], [0, 2], [1, 1]])
    def test_eval_and_derivatives_match(self, orders):
        cheb = built2()
        fv = external_fill(2, DOM2, cheb.n_nodes, f2)
        for pt in ([0.3, 0.7], [-0.9, 1.9], [0.0, 1.0]):
            assert fv.eval(pt, orders) == cheb.eval(pt, orders)

    def test_batch_and_multi_match(self):
        cheb = built2()
        fv = external_fill(2, DOM2, cheb.n_nodes, f2)
        rng = np.random.default_rng(5)
        pts = np.column_stack([rng.uniform(-1, 1, 50),
                               rng.uniform(0, 2, 50)])
        np.testing.assert_array_equal(
            fv.vectorized_eval_batch(pts, [0, 0]),
            cheb.vectorized_eval_batch(pts, [0, 0]))
        np.testing.assert_array_equal(
            fv.vectorized_eval_multi([0.4, 1.2], [[0, 0], [1, 0], [0, 1]]),
            cheb.vectorized_eval_multi([0.4, 1.2],
                                       [[0, 0], [1, 0], [0, 1]]))

    def test_calculus_surface(self):
        fv = external_fill(1, [[0.0, math.pi]], [14],
                           lambda x, _: math.sin(x[0]))
        assert abs(fv.integrate() - 2.0) < 1e-10
        mn, _loc = fv.minimize(dim=0)
        assert abs(mn - 0.0) < 1e-9
        mx, loc = fv.maximize(dim=0)
        assert abs(mx - 1.0) < 1e-9 and abs(loc - math.pi / 2) < 1e-6
        roots = external_fill(1, [[-1.0, 1.0]], [8],
                              lambda x, _: x[0] - 0.25).roots(dim=0)
        assert len(roots) == 1 and abs(roots[0] - 0.25) < 1e-10

    def test_algebra_with_built_object(self):
        cheb = built2()
        fv = external_fill(2, DOM2, cheb.n_nodes, f2)
        total = cheb + fv
        assert abs(total.eval([0.2, 0.9], [0, 0])
                   - 2 * cheb.eval([0.2, 0.9], [0, 0])) < 1e-13

    def test_error_estimate_and_sobol(self):
        cheb = built2()
        fv = external_fill(2, DOM2, cheb.n_nodes, f2)
        assert abs(fv.error_estimate() - cheb.error_estimate()) < 1e-14
        s_fv, s_b = fv.sobol_indices(), cheb.sobol_indices()
        for key in s_b["first_order"]:
            assert abs(s_fv["first_order"][key]
                       - s_b["first_order"][key]) < 1e-12

    def test_save_load_binary(self, tmp_path):
        fv = external_fill(2, DOM2, [5, 5], f2)
        p = tmp_path / "fv.pcb"
        fv.save(str(p), format="binary")
        loaded = ChebyshevApproximation.load(str(p))
        assert loaded.eval([0.1, 0.2], [0, 0]) == fv.eval([0.1, 0.2],
                                                          [0, 0])


class TestFromValuesErrors:
    def test_shape_mismatch(self):
        with pytest.raises(ValueError, match="shape"):
            ChebyshevApproximation.from_values(np.zeros((4, 4)), 2, DOM2,
                                               [5, 4])

    @pytest.mark.parametrize("bad", [np.nan, np.inf, -np.inf])
    def test_nonfinite_rejected(self, bad):
        vals = np.zeros((5, 4))
        vals[2, 1] = bad
        with pytest.raises(ValueError, match="NaN or Inf"):
            ChebyshevApproximation.from_values(vals, 2, DOM2, [5, 4])

    def test_inverted_domain(self):
        with pytest.raises(ValueError, match="strictly less"):
            ChebyshevApproximation.from_values(
                np.zeros((3,)), 1, [[1.0, -1.0]], [3])

    def test_build_after_from_values_raises(self):
        fv = external_fill(1, [[-1, 1]], [4], lambda x, _: x[0])
        with pytest.raises(RuntimeError, match="function|build"):
            fv.build(verbose=False)

    def test_single_node_dim(self):
        fv = ChebyshevApproximation.from_values(
            np.full((1, 3), 7.0), 2, DOM2, [1, 3])
        assert abs(fv.eval([0.5, 1.0], [0, 0]) - 7.0) < 1e-14


class TestSplineNodesFromValues:
    KNOTS = [[0.0], []]

    def _fill(self, fn=lambda x, _: abs(x[0]) + x[1]):
        info = ChebyshevSpline.nodes(2, DOM2, [5, 4], self.KNOTS)
        piece_values = [
            np.array([fn(list(p), None) for p in piece["full_grid"]])
            .reshape(piece["shape"])
            for piece in info["pieces"]
        ]
        return info, ChebyshevSpline.from_values(
            piece_values=piece_values, num_dimensions=2, domain=DOM2,
            n_nodes=[5, 4], knots=self.KNOTS)

    def test_nodes_piece_metadata(self):
        info = ChebyshevSpline.nodes(2, DOM2, [5, 4], self.KNOTS)
        assert info["num_pieces"] == 2
        assert info["piece_shape"] == (2, 1)
        assert [p["piece_index"] for p in info["pieces"]] == \
            [(0, 0), (1, 0)]                      # np.ndindex order
        assert info["pieces"][0]["sub_domain"][0] == (-1.0, 0.0)
        assert info["pieces"][1]["sub_domain"][0] == (0.0, 1.0)

    def test_eval_matches_build(self):
        _info, fv = self._fill()
        spl = ChebyshevSpline(lambda x, _: abs(x[0]) + x[1], 2, DOM2,
                              [5, 4], self.KNOTS)
        spl.build(verbose=False)
        for pt in ([-0.7, 0.3], [0.7, 1.9], [-0.01, 1.0], [0.01, 0.5]):
            assert fv.eval(pt, [0, 0]) == spl.eval(pt, [0, 0])

    def test_derivative_and_integrate(self):
        _info, fv = self._fill()
        assert abs(fv.eval([0.5, 1.0], [1, 0]) - 1.0) < 1e-10
        assert abs(fv.eval([-0.5, 1.0], [1, 0]) + 1.0) < 1e-10
        # int_{-1}^{1} |x| dx * int_0^2 dy + int dx * int y dy = 2 + 4
        assert abs(fv.integrate() - 6.0) < 1e-9

    def test_nested_n_nodes_rejected(self):
        with pytest.raises(NotImplementedError, match="flat"):
            ChebyshevSpline.nodes(1, [[-1, 1]], [[3, 4]], [[0.0]])

    def test_piece_count_mismatch_raises(self):
        with pytest.raises(ValueError):
            ChebyshevSpline.from_values(
                piece_values=[np.zeros((5, 4))], num_dimensions=2,
                domain=DOM2, n_nodes=[5, 4], knots=self.KNOTS)

    def test_piece_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            ChebyshevSpline.from_values(
                piece_values=[np.zeros((5, 4)), np.zeros((4, 5))],
                num_dimensions=2, domain=DOM2, n_nodes=[5, 4],
                knots=self.KNOTS)

    def test_save_load_round_trip(self, tmp_path):
        _info, fv = self._fill()
        p = tmp_path / "s.pcb"
        fv.save(str(p), format="binary")
        loaded = ChebyshevSpline.load(str(p))
        assert loaded.eval([0.3, 0.4], [0, 0]) == fv.eval([0.3, 0.4],
                                                          [0, 0])


class TestOddPointShapes:
    """The reference's single-point APIs read one coordinate per dim as
    ``point[d]`` and numpy broadcasting forgives odd input shapes
    (column vectors, trailing extra rows).  The upstream from_values
    suite leans on that, so the host row build must keep tolerating
    them (regression: the round-3 vectorized row build briefly broke
    column-vector inputs)."""

    def test_column_vector_point(self):
        fv = external_fill(1, [[-1, 1]], [15],
                           lambda x, _: math.sin(x[0]))
        # (3, 1) input: only point[0] is read, like the reference.
        out = fv.vectorized_eval_multi([[0.1], [0.5], [0.9]], [[0]])
        np.testing.assert_allclose(np.ravel(out)[0], math.sin(0.1),
                                   atol=1e-12)
        assert fv.vectorized_eval([[0.5]], [0]) == fv.vectorized_eval(
            [0.5], [0])

    def test_multi_spec_on_column_vector(self):
        fv = external_fill(1, [[-1, 1]], [15],
                           lambda x, _: math.sin(x[0]))
        out = np.ravel(fv.vectorized_eval_multi([[0.5]], [[0], [1]]))
        np.testing.assert_allclose(out, [math.sin(0.5), math.cos(0.5)],
                                   atol=1e-10)


class TestEdgeDomains:
    @pytest.mark.parametrize("domain", [[[-200.0, -100.0]],
                                        [[1e6, 2e6]],
                                        [[-1e-6, 1e-6]]])
    def test_odd_scales(self, domain):
        fn = lambda x, _: math.cos(x[0] / (domain[0][1] - domain[0][0]))
        fv = external_fill(1, domain, [9], fn)
        mid = 0.5 * (domain[0][0] + domain[0][1])
        assert abs(fv.eval([mid], [0]) - fn([mid], None)) < 1e-9

    def test_boundary_points(self):
        cheb = built2()
        fv = external_fill(2, DOM2, cheb.n_nodes, f2)
        for pt in ([-1.0, 0.0], [1.0, 2.0], [-1.0, 2.0]):
            assert fv.eval(pt, [0, 0]) == cheb.eval(pt, [0, 0])

    def test_4d(self):
        dom = [[-1.0, 1.0]] * 4
        fn = lambda x, _: x[0] + 2 * x[1] * x[2] - x[3] ** 2
        fv = external_fill(4, dom, [4, 4, 4, 4], fn)
        pt = [0.3, -0.2, 0.8, 0.5]
        assert abs(fv.eval(pt, [0, 0, 0, 0]) - fn(pt, None)) < 1e-12
