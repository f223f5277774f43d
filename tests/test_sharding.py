"""Multi-device sharding paths on the virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.parallel import sharding as sh


requires_8_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def f_vec(points, _):
    points = jnp.asarray(points)
    return jnp.sin(points[:, 0]) + jnp.cos(points[:, 1]) * points[:, 2]


DOMAIN = [[-1.0, 1.0], [0.0, 2.0], [-3.0, 1.0]]


@requires_8_devices
class TestShardedBuild:
    def test_build_matches_unsharded(self):
        mesh = sh.make_mesh(8)
        tensor = sh.build_tensor_sharded(f_vec, DOMAIN, [8, 8, 8], mesh)
        cheb = ChebyshevApproximation(
            lambda pts, d: np.asarray(f_vec(pts, d)), 3, DOMAIN,
            [8, 8, 8], vectorized=True)
        cheb.build(verbose=False)
        np.testing.assert_allclose(np.asarray(tensor),
                                   np.asarray(cheb.tensor_values),
                                   atol=1e-14)

    def test_sharded_vectorized_ctor_path(self):
        mesh = sh.make_mesh(8)
        wrapped = sh.sharded_vectorized(f_vec, mesh)
        cheb = ChebyshevApproximation(wrapped, 3, DOMAIN, [8, 8, 8],
                                      vectorized=True)
        cheb.build(verbose=False)
        pt = [0.3, 1.2, -1.5]
        expected = float(np.asarray(f_vec(np.asarray([pt]), None))[0])
        assert abs(cheb.vectorized_eval(pt, [0, 0, 0]) - expected) < 1e-8


@requires_8_devices
class TestShardedEval:
    @pytest.fixture(scope="class")
    def cheb(self):
        c = ChebyshevApproximation(
            lambda pts, d: np.asarray(f_vec(pts, d)), 3, DOMAIN,
            [8, 8, 8], vectorized=True)
        c.build(verbose=False)
        return c

    def test_eval_batch_dp(self, cheb):
        mesh = sh.make_mesh(8)
        rng = np.random.default_rng(0)
        lo = np.array([b[0] for b in DOMAIN])
        hi = np.array([b[1] for b in DOMAIN])
        pts = lo + (hi - lo) * rng.uniform(0, 1, size=(64, 3))
        nodes, weights, diffs = cheb._grid_tuples()
        out = sh.eval_batch_dp(cheb.tensor_values, nodes, weights, diffs,
                               pts, mesh, (0, 0, 0))
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)

    def test_integrate_box_batch_dp(self, cheb):
        mesh = sh.make_mesh(8)
        rng = np.random.default_rng(5)
        lo = np.array([b[0] for b in DOMAIN])
        hi = np.array([b[1] for b in DOMAIN])
        box_lo = lo + (hi - lo) * rng.uniform(0, 1, size=(13, 3))
        box_hi = box_lo + (hi - box_lo) * rng.uniform(0, 1, size=(13, 3))
        boxes = np.stack([box_lo, box_hi], axis=-1)  # odd B: pads
        out = sh.integrate_box_batch_dp(
            cheb.tensor_values, np.asarray(DOMAIN, dtype=np.float64),
            boxes, mesh)
        expected = cheb.integrate_batch(boxes)
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)

    def test_eval_batch_tp(self, cheb):
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        rng = np.random.default_rng(1)
        lo = np.array([b[0] for b in DOMAIN])
        hi = np.array([b[1] for b in DOMAIN])
        pts = lo + (hi - lo) * rng.uniform(0, 1, size=(32, 3))
        nodes, weights, diffs = cheb._grid_tuples()
        out = sh.eval_batch_tp(cheb.tensor_values, nodes, weights, diffs,
                               pts, mesh)
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)

    def test_eval_batch_tp_exact_node(self, cheb):
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        nodes, weights, diffs = cheb._grid_tuples()
        node_val = float(np.asarray(nodes[0])[3])
        pts = np.tile([[node_val, 1.0, -1.0]], (8, 1))
        out = sh.eval_batch_tp(cheb.tensor_values, nodes, weights, diffs,
                               pts, mesh)
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)

    def test_eval_batch_tp_derivative_orders(self, cheb):
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        nodes, weights, diffs = cheb._grid_tuples()
        pts = np.tile([[0.4, 1.1, -0.7]], (8, 1))
        out = sh.eval_batch_tp(cheb.tensor_values, nodes, weights, diffs,
                               pts, mesh, orders=(0, 1, 0))
        expected = cheb.vectorized_eval_batch(pts, [0, 1, 0])
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-11)

    @pytest.mark.parametrize("orders", [(1, 0, 0), (2, 0, 0), (1, 1, 0),
                                        (2, 0, 1)])
    def test_eval_batch_tp_sharded_axis_derivatives(self, cheb, orders):
        """Derivatives along the tensor-sharded axis match the dp path
        (distributed row @ D^k fold)."""
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        rng = np.random.default_rng(7)
        lo = np.array([b[0] for b in DOMAIN])
        hi = np.array([b[1] for b in DOMAIN])
        pts = lo + (hi - lo) * rng.uniform(0, 1, size=(32, 3))
        nodes, weights, diffs = cheb._grid_tuples()
        out = sh.eval_batch_tp(cheb.tensor_values, nodes, weights, diffs,
                               pts, mesh, orders=orders)
        expected = cheb.vectorized_eval_batch(pts, list(orders))
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10,
                                   atol=1e-10)

    def test_eval_batch_tp_sharded_axis_derivative_at_node(self, cheb):
        """Exact-node coordinate + sharded-axis derivative: the one-hot
        row folds through D^k to select the right derivative stencil."""
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        nodes, weights, diffs = cheb._grid_tuples()
        node_val = float(np.asarray(nodes[0])[5])
        pts = np.tile([[node_val, 0.9, -2.0]], (8, 1))
        out = sh.eval_batch_tp(cheb.tensor_values, nodes, weights, diffs,
                               pts, mesh, orders=(1, 0, 0))
        expected = cheb.vectorized_eval_batch(pts, [1, 0, 0])
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10,
                                   atol=1e-10)


@requires_8_devices
class TestUnevenShapes:
    """Non-divisible shapes pad transparently (round-3 hardening):
    grid axis 0 with zero-weight sentinel nodes over tp, batches with
    the first point over dp, grids over the build axis."""

    @pytest.fixture(scope="class")
    def cheb9(self):
        # 9 nodes on axis 0: not divisible by tp=4 or dp=8.
        c = ChebyshevApproximation(
            lambda pts, d: np.asarray(f_vec(pts, d)), 3, DOMAIN,
            [9, 8, 8], vectorized=True)
        c.build(verbose=False)
        return c

    def _pts(self, n, seed=11):
        rng = np.random.default_rng(seed)
        lo = np.array([b[0] for b in DOMAIN])
        hi = np.array([b[1] for b in DOMAIN])
        return lo + (hi - lo) * rng.uniform(0, 1, size=(n, 3))

    def test_dp_odd_batch(self, cheb9):
        mesh = sh.make_mesh(8)
        pts = self._pts(61)  # 61 % 8 != 0
        nodes, weights, diffs = cheb9._grid_tuples()
        out = sh.eval_batch_dp(cheb9.tensor_values, nodes, weights,
                               diffs, pts, mesh, (0, 0, 0))
        expected = cheb9.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)

    def test_tp_odd_grid_axis(self, cheb9):
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        pts = self._pts(32)
        nodes, weights, diffs = cheb9._grid_tuples()
        out = sh.eval_batch_tp(cheb9.tensor_values, nodes, weights,
                               diffs, pts, mesh)
        expected = cheb9.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-12)

    def test_tp_odd_grid_axis_and_batch_with_derivative(self, cheb9):
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        pts = self._pts(29)  # 29 % 2 != 0
        nodes, weights, diffs = cheb9._grid_tuples()
        out = sh.eval_batch_tp(cheb9.tensor_values, nodes, weights,
                               diffs, pts, mesh, orders=(1, 0, 0))
        expected = cheb9.vectorized_eval_batch(pts, [1, 0, 0])
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10,
                                   atol=1e-10)

    def test_tp_exact_node_with_padding(self, cheb9):
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        nodes, weights, diffs = cheb9._grid_tuples()
        node_val = float(np.asarray(nodes[0])[4])
        pts = np.tile([[node_val, 1.0, -1.0]], (6, 1))  # 6 % 2 == 0
        out = sh.eval_batch_tp(cheb9.tensor_values, nodes, weights,
                               diffs, pts, mesh, orders=(1, 0, 0))
        expected = cheb9.vectorized_eval_batch(pts, [1, 0, 0])
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-10,
                                   atol=1e-10)

    def test_sharded_build_odd_grid(self):
        mesh = sh.make_mesh(8)
        tensor = sh.build_tensor_sharded(f_vec, DOMAIN, [5, 7, 3], mesh)
        cheb = ChebyshevApproximation(
            lambda pts, d: np.asarray(f_vec(pts, d)), 3, DOMAIN,
            [5, 7, 3], vectorized=True)
        cheb.build(verbose=False)
        np.testing.assert_allclose(np.asarray(tensor),
                                   np.asarray(cheb.tensor_values),
                                   atol=1e-14)


@requires_8_devices
class TestDigitGemmDP:
    """Data-parallel dd: digit planes replicate, points shard, each
    device runs the exact-integer pipeline on its slice."""

    @pytest.fixture(scope="class")
    def mesh8(self):
        return sh.make_mesh(8)

    @pytest.fixture(scope="class")
    def cheb3d(self):
        c = ChebyshevApproximation(
            lambda pts, d: np.asarray(f_vec(pts, d)), 3, DOMAIN,
            [8, 8, 8], vectorized=True)
        c.build(verbose=False)
        return c

    @pytest.fixture(scope="class")
    def pts3d(self):
        rng = np.random.default_rng(5)
        lo = np.array([b[0] for b in DOMAIN])
        hi = np.array([b[1] for b in DOMAIN])
        return lo + (hi - lo) * rng.uniform(0.02, 0.98, (256, 3))

    def test_matches_single_device_dd(self, mesh8, cheb3d, pts3d):
        from pychebyshev_tpu.ops.eval_dd import eval_batch_dd
        from pychebyshev_tpu.parallel.sharding import eval_batch_dd_dp
        nodes, weights, diffs = cheb3d._grid_tuples()
        want = np.asarray(eval_batch_dd(
            cheb3d.tensor_values, nodes, weights, diffs, pts3d,
            (0, 0, 0)))
        got = np.asarray(eval_batch_dd_dp(
            cheb3d.tensor_values, nodes, weights, diffs, pts3d, mesh8))
        # Per-device programs fuse the f64 row build differently than
        # the single-device one — agreement is dd-class, not bitwise.
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)

    def test_uneven_batch_pads(self, mesh8, cheb3d, pts3d):
        from pychebyshev_tpu.parallel.sharding import eval_batch_dd_dp
        nodes, weights, diffs = cheb3d._grid_tuples()
        odd = pts3d[:101]          # not divisible by 8
        got = np.asarray(eval_batch_dd_dp(
            cheb3d.tensor_values, nodes, weights, diffs, odd, mesh8))
        want = cheb3d.vectorized_eval_batch(odd, [0, 0, 0])
        assert got.shape == (101,)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-10

    def test_derivative_orders(self, mesh8, cheb3d, pts3d):
        from pychebyshev_tpu.parallel.sharding import eval_batch_dd_dp
        nodes, weights, diffs = cheb3d._grid_tuples()
        got = np.asarray(eval_batch_dd_dp(
            cheb3d.tensor_values, nodes, weights, diffs, pts3d, mesh8,
            orders=(1, 0, 0)))
        want = cheb3d.vectorized_eval_batch(pts3d, [1, 0, 0])
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-9

    def test_unsupported_shape_raises(self, mesh8):
        from pychebyshev_tpu.parallel.sharding import eval_batch_dd_dp
        with pytest.raises(ValueError, match="digit-GEMM budget"):
            eval_batch_dd_dp(np.zeros(5), (), (), (),
                             np.zeros((8, 1)), mesh8)


@requires_8_devices
class TestFamilyDigitGemmDP:
    """slider/TT dd over the mesh: planes replicate, points shard."""

    @pytest.fixture(scope="class")
    def mesh8(self):
        return sh.make_mesh(8)

    def test_slider_dd_dp_matches_single_device(self, mesh8):
        from pychebyshev_tpu import ChebyshevSlider
        from pychebyshev_tpu.ops.slider_eval import slider_batch_dd
        D = 5
        sl = ChebyshevSlider(
            lambda p, _: np.sum(np.sin(np.asarray(p, float)), axis=1),
            D, [[-1, 1]] * D, [9] * D, [[0, 1]] + [[i] for i in
                                                   range(2, D)],
            [0.0] * D, vectorized=True)
        sl.build(verbose=False)
        data = tuple((s.tensor_values,) + s._grid_tuples()
                     for s in sl.slides)
        groups = tuple(tuple(g) for g in sl.partition)
        pts = np.random.default_rng(3).uniform(-1, 1, (205, D))
        want = np.asarray(slider_batch_dd(data, sl.pivot_value, groups,
                                          pts))
        got = np.asarray(sh.slider_batch_dd_dp(
            data, sl.pivot_value, groups, pts, mesh8))
        assert got.shape == (205,)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
        # derivative spec rides the same path
        o = [0, 0, 1, 0, 0]
        wd = np.asarray(slider_batch_dd(data, sl.pivot_value, groups,
                                        pts, orders=o))
        gd = np.asarray(sh.slider_batch_dd_dp(
            data, sl.pivot_value, groups, pts, mesh8, orders=o))
        np.testing.assert_allclose(gd, wd, rtol=0, atol=1e-12)

    def test_tt_dd_dp_matches_single_device(self, mesh8):
        from pychebyshev_tpu import ChebyshevTT
        from pychebyshev_tpu.ops.tt_eval_dd import tt_eval_batch_dd

        def f(p, _=None):
            p = np.atleast_2d(np.asarray(p, float))
            return np.exp(-p[:, 0]) * np.sin(p.sum(axis=1))

        tt = ChebyshevTT(f, 4, [[0.0, 1.0]] * 4, [9] * 4, max_rank=6,
                         vectorized=True)
        tt.build(verbose=False)
        dom = np.asarray(tt.domain, float)
        pts = np.random.default_rng(4).uniform(0.03, 0.97, (203, 4))
        want = np.asarray(tt_eval_batch_dd(tt._coeff_cores, dom, pts))
        got = np.asarray(sh.tt_eval_batch_dd_dp(
            tt._coeff_cores, dom, pts, mesh8))
        assert got.shape == (203,)
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-13)


@requires_8_devices
class TestDigitGemmTP:
    """Tensor-parallel dd: sharding the contraction over tp divides K
    per device, RAISING the MXU-exactness budget — grids the
    single-chip digit plan refuses become eligible."""

    def test_consistency_with_single_device_dd(self):
        from pychebyshev_tpu.ops.eval_dd import eval_batch_dd
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        c = ChebyshevApproximation(
            lambda pts, d: np.asarray(f_vec(pts, d)), 3, DOMAIN,
            [9, 9, 9], vectorized=True)
        c.build(verbose=False)
        nodes, weights, diffs = c._grid_tuples()
        rng = np.random.default_rng(7)
        lo = np.array([b[0] for b in DOMAIN])
        hi = np.array([b[1] for b in DOMAIN])
        pts = lo + (hi - lo) * rng.uniform(0.02, 0.98, (130, 3))
        want = np.asarray(eval_batch_dd(
            c.tensor_values, nodes, weights, diffs, pts))
        got = np.asarray(sh.eval_batch_dd_tp(
            c.tensor_values, nodes, weights, diffs, pts, mesh))
        assert got.shape == (130,)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-11

    def test_beyond_single_chip_budget(self):
        """(9, 16400): n_right > 2^14 — supports_dd says no, but 8-way
        tp brings k_local to 2050 (bits_budget 12 -> b_t = b_r = 6)."""
        from pychebyshev_tpu.ops.eval import eval_batch
        from pychebyshev_tpu.ops.eval_dd import supports_dd
        import jax.numpy as jnp

        shape = (9, 16400)
        assert not supports_dd(shape)
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(1, 8))
        assert sh.dd_tp_plan(shape, 8)["ok"]

        def cheb1(n):
            # closed-form Chebyshev-1 barycentric weights (the product
            # formula overflows f64 past a few hundred nodes; the
            # barycentric form is weight-scale-invariant)
            k = np.arange(n)
            x = np.cos((2 * k + 1) * np.pi / (2 * n))
            w = ((-1.0) ** k) * np.sin((2 * k + 1) * np.pi / (2 * n))
            order = np.argsort(x)
            return x[order], w[order]

        xs, ws = zip(*(cheb1(n) for n in shape))
        nodes = tuple(jnp.asarray(x) for x in xs)
        weights = tuple(jnp.asarray(w) for w in ws)
        gx, gy = np.meshgrid(np.asarray(nodes[0]), np.asarray(nodes[1]),
                             indexing="ij")
        tensor = jnp.asarray(np.sin(3 * gx) * np.cos(2 * gy)
                             + 0.5 * gx * gy)
        diffs = ((), ())          # value-only; no derivative passes

        rng = np.random.default_rng(8)
        pts = rng.uniform(-0.97, 0.97, (64, 2))
        want = np.asarray(eval_batch(tensor, nodes, weights,
                                     (None, None), jnp.asarray(pts),
                                     (0, 0)))
        got = np.asarray(sh.eval_batch_dd_tp(
            tensor, nodes, weights, diffs, pts, mesh))
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-11

    def test_derivative_orders_fold_on_host(self):
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        c = ChebyshevApproximation(
            lambda pts, d: np.asarray(f_vec(pts, d)), 3, DOMAIN,
            [9, 9, 9], vectorized=True)
        c.build(verbose=False)
        nodes, weights, diffs = c._grid_tuples()
        rng = np.random.default_rng(9)
        lo = np.array([b[0] for b in DOMAIN])
        hi = np.array([b[1] for b in DOMAIN])
        pts = lo + (hi - lo) * rng.uniform(0.02, 0.98, (96, 3))
        for o in [(1, 0, 0), (0, 0, 1)]:
            want = c.vectorized_eval_batch(pts, list(o))
            got = np.asarray(sh.eval_batch_dd_tp(
                c.tensor_values, nodes, weights, diffs, pts, mesh,
                orders=o))
            scale = max(np.abs(want).max(), 1e-3)
            assert np.abs(got - want).max() / scale < 1e-9, o

    def test_exact_node_points_one_hot_globally(self):
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        c = ChebyshevApproximation(
            lambda pts, d: np.asarray(f_vec(pts, d)), 3, DOMAIN,
            [9, 9, 9], vectorized=True)
        c.build(verbose=False)
        nodes, weights, diffs = c._grid_tuples()
        # points exactly on grid nodes of the SHARDED dim
        from pychebyshev_tpu.ops.eval import _split_index
        s = _split_index((9, 9, 9))
        node_vals = np.asarray(nodes[s])
        pts = np.column_stack([
            np.full(8, 0.5 * (DOMAIN[0][0] + DOMAIN[0][1])),
            np.full(8, 0.5 * (DOMAIN[1][0] + DOMAIN[1][1])),
            np.full(8, 0.5 * (DOMAIN[2][0] + DOMAIN[2][1]))])
        pts[:, s] = node_vals[:8]
        want = c.vectorized_eval_batch(pts, [0, 0, 0])
        got = np.asarray(sh.eval_batch_dd_tp(
            c.tensor_values, nodes, weights, diffs, pts, mesh))
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-11

    def test_rejects_wide_right_group(self):
        mesh = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        with pytest.raises(ValueError, match="tp digit-GEMM"):
            sh.eval_batch_dd_tp(np.zeros((3,) * 7), (), (), (),
                                np.zeros((8, 7)), mesh)
