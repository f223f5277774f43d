"""Device fit engines: f32/dd tiers, mesh sharding, layout variants.

Round-4 additions (VERDICT r3 item 2): ``engine="device-dd"`` — exact
digit-GEMM Gram accumulation — and ``mesh=`` data parallelism on the
dense, spline and slider fits.  The dd tier's integer psums make the
sharded accumulation bit-identical to the single-device one; that
exactness is pinned here.
"""

import warnings

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
)
from pychebyshev_tpu.ops.chebyshev import (
    barycentric_weights_np,
    nodes_for_dim_np,
)
from pychebyshev_tpu.parallel.sharding import make_mesh
from pychebyshev_tpu.utils import fitting

DOM3 = [[0.0, 2.0], [-1.0, 1.0], [0.0, 1.0]]


def f3(p):
    p = np.asarray(p)
    return np.sin(2 * p[:, 0]) * np.cos(p[:, 1]) + p[:, 2] ** 3


@pytest.fixture(scope="module")
def samples3():
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(a, b, 4000) for a, b in DOM3], axis=1)
    w = rng.uniform(0.5, 2.0, 4000)
    return pts, f3(pts) + rng.normal(0, 1e-3, 4000), w


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


def _host_gram(pts, y, sw, counts, domain):
    nodes = [nodes_for_dim_np(d[0], d[1], c)
             for d, c in zip(domain, counts)]
    weights = [barycentric_weights_np(nd) for nd in nodes]
    rows = fitting._khatri_rao([
        fitting.barycentric_rows_np(pts[:, k], nodes[k], weights[k])
        for k in range(len(counts))])
    rows = rows * sw[:, None]
    return nodes, weights, rows.T @ rows, rows.T @ (y * sw)


class TestDDGram:
    def test_dd_gram_f64_class(self, samples3):
        pts, y, w = samples3
        sw = np.sqrt(w)
        counts = [7, 7, 7]
        nodes, weights, ata_h, aty_h = _host_gram(pts, y, sw, counts,
                                                  DOM3)
        dim_design = fitting._DimDesign(nodes, weights)
        ata, aty = fitting._device_normal_accumulation_dd(
            [(pts, (0, 0, 0), y, sw)], nodes, weights, dim_design, 343)
        assert np.abs(ata - ata_h).max() / np.abs(ata_h).max() < 1e-11
        assert np.abs(aty - aty_h).max() / np.abs(aty_h).max() < 1e-11

    def test_dd_mesh_bit_identical(self, samples3, mesh8):
        pts, y, w = samples3
        sw = np.sqrt(w)
        counts = [7, 7, 7]
        nodes, weights, _, _ = _host_gram(pts, y, sw, counts, DOM3)
        dim_design = fitting._DimDesign(nodes, weights)
        blocks = [(pts, (0, 0, 0), y, sw)]
        a1, b1 = fitting._device_normal_accumulation_dd(
            blocks, nodes, weights, dim_design, 343)
        a2, b2 = fitting._device_normal_accumulation_dd(
            blocks, nodes, weights, dim_design, 343, mesh=mesh8)
        assert np.array_equal(a1, a2)
        assert np.array_equal(b1, b2)

    def test_f32_mesh_close_to_single(self, samples3, mesh8):
        pts, y, w = samples3
        sw = np.sqrt(w)
        counts = [7, 7, 7]
        nodes, weights, ata_h, _ = _host_gram(pts, y, sw, counts, DOM3)
        dim_design = fitting._DimDesign(nodes, weights)
        blocks = [(pts, (0, 0, 0), y, sw)]
        a1, _ = fitting._device_normal_accumulation(
            blocks, nodes, weights, dim_design, 343)
        a2, _ = fitting._device_normal_accumulation(
            blocks, nodes, weights, dim_design, 343, mesh=mesh8)
        scale = np.abs(ata_h).max()
        assert np.abs(a1 - ata_h).max() / scale < 1e-4
        assert np.abs(a2 - ata_h).max() / scale < 1e-4


class TestReviewR4Fixes:
    """Pins the round-4 review findings on the dd fit tier."""

    NARROW = [[0.0, 2.0], [-1.0, 1.0], [0.01, 0.05]]

    def test_derivative_block_digit_contract(self):
        # A derivative fold on a NARROW dim blows |D^o| column sums to
        # ~100s; the block's digit plan must scale for it (finding 1:
        # the Lebesgue-only scale gave a silently-wrong Gram, 2.6e-3
        # relative).
        rng = np.random.default_rng(0)
        pts = np.stack([rng.uniform(a, b, 4000)
                        for a, b in self.NARROW], axis=1)

        def f(p):
            return np.sin(p[:, 0]) * p[:, 1] + np.exp(40 * p[:, 2])

        y = f(pts)
        dpts = np.stack([rng.uniform(a, b, 300)
                         for a, b in self.NARROW], axis=1)
        dvals = 40 * np.exp(40 * dpts[:, 2])
        counts = [7, 7, 7]
        nodes = [nodes_for_dim_np(d[0], d[1], c)
                 for d, c in zip(self.NARROW, counts)]
        weights = [barycentric_weights_np(nd) for nd in nodes]
        dd = fitting._DimDesign(nodes, weights)
        rows_v = fitting._khatri_rao([
            fitting.barycentric_rows_np(pts[:, k], nodes[k],
                                        weights[k])
            for k in range(3)])
        rows_d = fitting._khatri_rao([
            dd.rows(dpts[:, k], k, (0, 0, 1)[k]) for k in range(3)])
        design = np.concatenate([rows_v, rows_d])
        yy = np.concatenate([y, dvals])
        ata_h, aty_h = design.T @ design, design.T @ yy
        blocks = [(pts, (0, 0, 0), y, np.ones(4000)),
                  (dpts, (0, 0, 1), dvals, np.ones(300))]
        ata, aty = fitting._device_normal_accumulation_dd(
            blocks, nodes, weights, dd, 343)
        assert np.abs(ata - ata_h).max() / np.abs(ata_h).max() < 1e-10
        assert np.abs(aty - aty_h).max() / np.abs(aty_h).max() < 1e-10

    def test_large_n_small_grid_fits(self):
        # Finding 2: the exact tier must take MORE chunks on large-N
        # small-grid fits, not error out of its own digit budget.
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 1, (40000, 2))
        y = pts[:, 0] ** 2 * pts[:, 1]      # degree-5-representable
        t, diag = fitting.fit_dense_tensor(
            pts, y, [[0, 1]] * 2, [6, 6], l2=1e-12,
            engine="device-dd")
        assert diag["rms"] < 1e-8

    def test_mesh_bit_identical_when_grid_cap_binds(self, mesh8):
        # Finding 6: the chunk must be mesh-independent even when the
        # (1<<24)//G cap (not the power-of-two bucket) decides it.
        rng = np.random.default_rng(2)
        pts = rng.uniform(0, 1, (30000, 3))
        y = np.sin(pts).sum(axis=1)
        kw = dict(l2=1e-9, engine="device-dd")
        t1, _ = fitting.fit_dense_tensor(pts, y, [[0, 1]] * 3,
                                         [9, 9, 9], **kw)
        t2, _ = fitting.fit_dense_tensor(pts, y, [[0, 1]] * 3,
                                         [9, 9, 9], mesh=mesh8, **kw)
        assert np.array_equal(t1, t2)


class TestDenseFitEngines:
    def test_dd_engine_close_to_host(self, samples3):
        pts, y, w = samples3
        kw = dict(l2=1e-8, sample_weight=w)
        t_h, _ = fitting.fit_dense_tensor(pts, y, DOM3, [7, 7, 7], **kw)
        t_dd, diag = fitting.fit_dense_tensor(
            pts, y, DOM3, [7, 7, 7], engine="device-dd", **kw)
        assert diag["engine"] == "device-dd"
        assert np.abs(t_dd - t_h).max() / np.abs(t_h).max() < 1e-7

    def test_dd_engine_mesh_bit_identical(self, samples3, mesh8):
        pts, y, w = samples3
        kw = dict(l2=1e-8, sample_weight=w)
        t1, _ = fitting.fit_dense_tensor(
            pts, y, DOM3, [7, 7, 7], engine="device-dd", **kw)
        t2, _ = fitting.fit_dense_tensor(
            pts, y, DOM3, [7, 7, 7], engine="device-dd", mesh=mesh8,
            **kw)
        assert np.array_equal(t1, t2)

    def test_dd_exact_recovery_l2_zero(self):
        # Grid samples exactly determine the tensor; the dd tier must
        # recover it to solve-conditioning accuracy, with NO f32-tier
        # steering warning.
        c = ChebyshevApproximation(
            lambda p, _=None: f3(p), 3, DOM3, n_nodes=[5, 5, 5],
            vectorized=True)
        c.build(verbose=False)
        grid = np.stack(np.meshgrid(*[np.asarray(nd)
                                      for nd in c.nodes],
                                    indexing="ij"), axis=-1)
        pts = grid.reshape(-1, 3)
        y = np.asarray(c.tensor_values).reshape(-1)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            t, diag = fitting.fit_dense_tensor(
                pts, y, DOM3, [5, 5, 5], engine="device-dd")
        assert np.abs(t - np.asarray(c.tensor_values)).max() < 1e-8

    def test_derivative_blocks_device_dd(self, samples3):
        pts, y, w = samples3
        rng = np.random.default_rng(5)
        dpts = np.stack([rng.uniform(a, b, 400) for a, b in DOM3],
                        axis=1)
        dvals = 2 * np.cos(2 * dpts[:, 0]) * np.cos(dpts[:, 1])
        blocks = [(dpts, (1, 0, 0), dvals, 1.0)]
        t_h, _ = fitting.fit_dense_tensor(
            pts, y, DOM3, [7, 7, 7], l2=1e-8, derivative_data=blocks)
        t_d, diag = fitting.fit_dense_tensor(
            pts, y, DOM3, [7, 7, 7], l2=1e-8, derivative_data=blocks,
            engine="device-dd")
        assert np.abs(t_d - t_h).max() / np.abs(t_h).max() < 1e-7
        assert "derivative_blocks" in diag

    def test_engine_validation(self, samples3, mesh8):
        pts, y, _ = samples3
        with pytest.raises(ValueError, match="engine"):
            fitting.fit_dense_tensor(pts, y, DOM3, [7, 7, 7],
                                     engine="gpu")
        with pytest.raises(ValueError, match="mesh"):
            fitting.fit_dense_tensor(pts, y, DOM3, [7, 7, 7],
                                     l2=1e-8, mesh=mesh8)

    def test_f32_l2_zero_warns(self, samples3):
        pts, y, _ = samples3
        with pytest.warns(UserWarning, match="f32 tier"):
            fitting.fit_dense_tensor(pts, y, DOM3, [5, 5, 5],
                                     engine="device")

    def test_class_surface_mesh(self, samples3, mesh8):
        pts, y, w = samples3
        m = ChebyshevApproximation.fit(
            pts, y, 3, DOM3, [7, 7, 7], l2=1e-8, sample_weight=w,
            engine="device-dd", mesh=mesh8)
        q = np.stack([np.random.default_rng(2).uniform(a + 0.05,
                                                       b - 0.05, 256)
                      for a, b in DOM3], axis=1)
        got = m.eval_batch(q, derivative_order=[0, 0, 0])
        assert np.abs(np.asarray(got) - f3(q)).max() < 0.05


class TestAdditiveFitEngines:
    DOM6 = [[0.0, 1.0]] * 6
    GROUPS = [[0, 1], [2, 3], [4, 5]]

    @staticmethod
    def f6(p):
        p = np.asarray(p)
        return (1.5 + np.sin(3 * p[:, 0]) * p[:, 1]
                + np.exp(p[:, 2] - p[:, 3])
                + p[:, 4] ** 2 * np.cos(p[:, 5]))

    @pytest.fixture(scope="class")
    def samples6(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 1, (4000, 6))
        return pts, self.f6(pts)

    def test_dd_predictions_match_host(self, samples6):
        pts, y = samples6
        s_h = ChebyshevSlider.fit(pts, y, 6, self.DOM6, [6] * 6,
                                  self.GROUPS, [0.5] * 6, l2=1e-9)
        s_d = ChebyshevSlider.fit(pts, y, 6, self.DOM6, [6] * 6,
                                  self.GROUPS, [0.5] * 6, l2=1e-9,
                                  engine="device-dd")
        q = np.random.default_rng(2).uniform(0.05, 0.95, (300, 6))
        # Raw thetas are gauge-sensitive; pivot-re-gauged PREDICTIONS
        # are the invariant quantity.
        assert np.abs(s_h.eval_batch(q) - s_d.eval_batch(q)).max() \
            < 1e-10

    def test_dd_mesh_bit_identical(self, samples6, mesh8):
        pts, y = samples6
        kw = dict(l2=1e-9, engine="device-dd")
        t1, c1, _ = fitting.fit_additive_tensors(
            pts, y, self.DOM6, [6] * 6, self.GROUPS, **kw)
        t2, c2, _ = fitting.fit_additive_tensors(
            pts, y, self.DOM6, [6] * 6, self.GROUPS, mesh=mesh8, **kw)
        assert c1 == c2
        assert all(np.array_equal(a, b) for a, b in zip(t1, t2))

    def test_derivative_block_device(self, samples6):
        pts, y = samples6
        rng = np.random.default_rng(3)
        dpts = rng.uniform(0, 1, (300, 6))
        dvals = 3 * np.cos(3 * dpts[:, 0]) * dpts[:, 1]
        db = [(dpts, (1, 0, 0, 0, 0, 0), dvals, 1.0)]
        s_h = ChebyshevSlider.fit(pts, y, 6, self.DOM6, [6] * 6,
                                  self.GROUPS, [0.5] * 6, l2=1e-9,
                                  derivative_data=db)
        s_d = ChebyshevSlider.fit(pts, y, 6, self.DOM6, [6] * 6,
                                  self.GROUPS, [0.5] * 6, l2=1e-9,
                                  derivative_data=db,
                                  engine="device-dd")
        q = rng.uniform(0.05, 0.95, (300, 6))
        assert np.abs(s_h.eval_batch(q) - s_d.eval_batch(q)).max() \
            < 1e-9

    def test_f32_engine_predictions(self, samples6):
        # The f32 additive device layout (_build_rows_f32 additive
        # branch) — noisy-data tier, ~1e-3-class predictions.
        pts, y = samples6
        s_h = ChebyshevSlider.fit(pts, y, 6, self.DOM6, [6] * 6,
                                  self.GROUPS, [0.5] * 6, l2=1e-6)
        s_d = ChebyshevSlider.fit(pts, y, 6, self.DOM6, [6] * 6,
                                  self.GROUPS, [0.5] * 6, l2=1e-6,
                                  engine="device")
        q = np.random.default_rng(7).uniform(0.05, 0.95, (300, 6))
        scale = np.abs(s_h.eval_batch(q)).max()
        assert np.abs(s_h.eval_batch(q) - s_d.eval_batch(q)).max() \
            / scale < 5e-3

    def test_f32_derivative_block_device(self, samples6):
        # Additive f32 layout with a differentiated (owner-masked)
        # block.
        pts, y = samples6
        rng = np.random.default_rng(8)
        dpts = rng.uniform(0, 1, (200, 6))
        dvals = 3 * np.cos(3 * dpts[:, 0]) * dpts[:, 1]
        db = [(dpts, (1, 0, 0, 0, 0, 0), dvals, 1.0)]
        t, c0, diag = fitting.fit_additive_tensors(
            pts, y, self.DOM6, [6] * 6, self.GROUPS, l2=1e-6,
            derivative_data=db, engine="device")
        assert diag["engine"] == "device"
        assert diag["rms"] < 0.05

    def test_engine_validation(self, samples6, mesh8):
        pts, y = samples6
        with pytest.raises(ValueError, match="engine"):
            fitting.fit_additive_tensors(pts, y, self.DOM6, [6] * 6,
                                         self.GROUPS, engine="tpu")
        with pytest.raises(ValueError, match="mesh"):
            fitting.fit_additive_tensors(pts, y, self.DOM6, [6] * 6,
                                         self.GROUPS, l2=1e-9,
                                         mesh=mesh8)


class TestSplineFitEngines:
    def test_spline_dd_matches_host(self, mesh8):
        rng = np.random.default_rng(4)
        dom = [[-1.0, 1.0], [0.0, 1.0]]
        knots = [[0.0], []]

        def f(p):
            p = np.asarray(p)
            return np.abs(p[:, 0]) * (1 + p[:, 1] ** 2)

        pts = np.stack([rng.uniform(-1, 1, 3000),
                        rng.uniform(0, 1, 3000)], axis=1)
        y = f(pts)
        s_h = ChebyshevSpline.fit(pts, y, 2, dom, [6, 6], knots,
                                  l2=1e-10)
        s_d = ChebyshevSpline.fit(pts, y, 2, dom, [6, 6], knots,
                                  l2=1e-10, engine="device-dd",
                                  mesh=mesh8)
        q = np.stack([rng.uniform(-0.95, 0.95, 200),
                      rng.uniform(0.05, 0.95, 200)], axis=1)
        a = s_h.eval_batch(q, derivative_order=[0, 0])
        b = s_d.eval_batch(q, derivative_order=[0, 0])
        assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-8
