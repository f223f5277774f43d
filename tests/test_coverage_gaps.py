"""Behavior pinned after a line-coverage audit (scripts/line_coverage.py).

Each class targets a path the suite never executed: in-place algebra
operators, the chunked lax.map big-batch runners, the C-kernel NumPy
fallback, masked-multi piece-group chunking, TT checkpoint corruption
branches, host barycentric compat helpers, and wide-dims __str__.
"""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)

DOM2 = [[0.0, 2.0], [-1.0, 1.0]]


def _f2(points, _=None):
    p = np.asarray(points)
    return np.sin(p[:, 0]) + 0.5 * p[:, 1] ** 2


def _g2(points, _=None):
    p = np.asarray(points)
    return np.cos(p[:, 0]) * (1.0 + 0.1 * p[:, 1])


def _dense(fn=_f2, n=(7, 6)):
    m = ChebyshevApproximation(fn, 2, DOM2, list(n), vectorized=True)
    m.build(verbose=False)
    return m


PTS = np.array([[0.3, -0.2], [1.7, 0.8], [1.0, 0.0]])


class TestInPlaceAlgebra:
    """__iadd__/__isub__/__imul__/__itruediv__/__neg__/__truediv__ on
    dense, spline, and slider (out-of-place results are the oracle)."""

    def _vals(self, m, d):
        return np.array([m.vectorized_eval(list(p), [0] * d) for p in PTS])

    def test_dense_inplace_matches_outofplace(self):
        a, b = _dense(), _dense(_g2)
        want_add = self._vals(a + b, 2)
        want_sub = self._vals(a - b, 2)
        m = _dense()
        m += b
        np.testing.assert_allclose(self._vals(m, 2), want_add, atol=1e-14)
        m = _dense()
        m -= b
        np.testing.assert_allclose(self._vals(m, 2), want_sub, atol=1e-14)
        m = _dense()
        m *= 2.5
        np.testing.assert_allclose(self._vals(m, 2),
                                   2.5 * self._vals(a, 2), atol=1e-14)
        m = _dense()
        m /= 4.0
        np.testing.assert_allclose(self._vals(m, 2),
                                   self._vals(a, 2) / 4.0, atol=1e-14)
        np.testing.assert_allclose(self._vals(-a, 2),
                                   -self._vals(a, 2), atol=1e-14)
        np.testing.assert_allclose(self._vals(a / 4.0, 2),
                                   self._vals(a, 2) / 4.0, atol=1e-14)

    def _spline(self, fn=_f2):
        s = ChebyshevSpline(fn, 2, DOM2, [5, 5], [[1.0], []],
                            vectorized=True)
        s.build(verbose=False)
        return s

    def test_spline_inplace_matches_outofplace(self):
        a, b = self._spline(), self._spline(_g2)
        want_add = self._vals(a + b, 2)
        s = self._spline()
        s += b
        np.testing.assert_allclose(self._vals(s, 2), want_add, atol=1e-14)
        s = self._spline()
        s -= b
        np.testing.assert_allclose(self._vals(s, 2),
                                   self._vals(a - b, 2), atol=1e-14)
        s = self._spline()
        s *= 3.0
        np.testing.assert_allclose(self._vals(s, 2),
                                   3.0 * self._vals(a, 2), atol=1e-14)
        s = self._spline()
        s /= 2.0
        np.testing.assert_allclose(self._vals(s, 2),
                                   self._vals(a, 2) / 2.0, atol=1e-14)
        np.testing.assert_allclose(self._vals(-a, 2),
                                   -self._vals(a, 2), atol=1e-14)
        np.testing.assert_allclose(self._vals(a / 2.0, 2),
                                   self._vals(a, 2) / 2.0, atol=1e-14)
        with pytest.raises(TypeError):
            s /= "x"

    def _slider(self, fn=_f2):
        sl = ChebyshevSlider(fn, 2, DOM2, [6, 6], [[0], [1]],
                             [1.0, 0.0], vectorized=True)
        sl.build(verbose=False)
        return sl

    def test_slider_inplace_matches_outofplace(self):
        a, b = self._slider(), self._slider(_g2)
        want_add = self._vals(a + b, 2)
        s = self._slider()
        s += b
        np.testing.assert_allclose(self._vals(s, 2), want_add, atol=1e-14)
        s = self._slider()
        s -= b
        np.testing.assert_allclose(self._vals(s, 2),
                                   self._vals(a - b, 2), atol=1e-14)
        s = self._slider()
        s *= 1.5
        np.testing.assert_allclose(self._vals(s, 2),
                                   1.5 * self._vals(a, 2), atol=1e-14)
        s = self._slider()
        s /= 2.0
        np.testing.assert_allclose(self._vals(s, 2),
                                   self._vals(a, 2) / 2.0, atol=1e-14)
        np.testing.assert_allclose(self._vals(-a, 2),
                                   -self._vals(a, 2), atol=1e-14)


class TestCheckCompatibleMatrix:
    def test_error_matrix(self):
        from pychebyshev_tpu.utils.algebra import check_compatible
        a = _dense()
        sp = ChebyshevSpline(_f2, 2, DOM2, [5, 5], [[1.0], []],
                             vectorized=True)
        with pytest.raises(TypeError, match="Cannot combine"):
            check_compatible(a, sp)
        unbuilt = ChebyshevApproximation(_f2, 2, DOM2, [7, 6])
        with pytest.raises(RuntimeError, match="Left operand"):
            check_compatible(unbuilt, a)
        with pytest.raises(RuntimeError, match="Right operand"):
            check_compatible(a, unbuilt)
        b3 = ChebyshevApproximation(
            lambda p, _=None: np.asarray(p)[:, 0],
            3, DOM2 + [[0.0, 1.0]], [3, 3, 3], vectorized=True)
        b3.build(verbose=False)
        with pytest.raises(ValueError, match="Dimension mismatch"):
            check_compatible(a, b3)
        bn = _dense(n=(6, 6))
        with pytest.raises(ValueError, match="Node count mismatch"):
            check_compatible(a, bn)
        bd = ChebyshevApproximation(_f2, 2, [[0.0, 2.0], [-1.0, 2.0]],
                                    [7, 6], vectorized=True)
        bd.build(verbose=False)
        with pytest.raises(ValueError, match="Domain mismatch"):
            check_compatible(a, bd)
        bm = ChebyshevApproximation(_f2, 2, DOM2, [7, 6],
                                    max_derivative_order=1,
                                    vectorized=True)
        bm.build(verbose=False)
        with pytest.raises(ValueError,
                           match="max_derivative_order mismatch"):
            check_compatible(a, bm)

    def test_tt_compat_aliases_smoke(self):
        from pychebyshev_tpu.utils.algebra import (
            _tt_add_cores,
            _tt_round_cores,
            _tt_swap_adjacent,
        )
        rng = np.random.default_rng(0)
        cores = [rng.random((1, 4, 2)), rng.random((2, 5, 1))]
        added = _tt_add_cores(cores, cores)
        assert added[0].shape == (1, 4, 4)
        rounded = _tt_round_cores(added, max_rank=4)
        assert rounded[0].shape[0] == 1
        swapped = _tt_swap_adjacent(cores, 0, max_rank=8)
        assert swapped[0].shape[1] == 5 and swapped[1].shape[1] == 4


class TestHostBarycentricCompat:
    def test_interpolate_and_derivative(self):
        from pychebyshev_tpu.ops.chebyshev import (
            barycentric_derivative_analytical,
            barycentric_interpolate,
            barycentric_weights_np,
            differentiation_matrix_np,
            nodes_for_dim_np,
        )
        nodes = nodes_for_dim_np(-1.0, 1.0, 9)
        w = barycentric_weights_np(nodes)
        vals = np.sin(2.0 * nodes)
        # generic point
        x = 0.3173
        got = barycentric_interpolate(x, nodes, vals, w)
        assert got == pytest.approx(np.sin(2.0 * x), abs=1e-5)
        # exact node short-circuits (and skip_check bypasses it)
        assert barycentric_interpolate(nodes[4], nodes, vals, w) == vals[4]
        near = nodes[4] + 1e-16
        assert barycentric_interpolate(
            near, nodes, vals, w) == pytest.approx(vals[4], abs=1e-12)
        D = differentiation_matrix_np(nodes, w)
        d1 = barycentric_derivative_analytical(x, nodes, vals, w, D, 1)
        assert d1 == pytest.approx(2.0 * np.cos(2.0 * x), abs=1e-4)
        d2 = barycentric_derivative_analytical(x, nodes, vals, w, D, 2)
        assert d2 == pytest.approx(-4.0 * np.sin(2.0 * x), abs=1e-3)
        with pytest.raises(ValueError, match="order 3"):
            barycentric_derivative_analytical(x, nodes, vals, w, D, 3)

    def test_calculus_compat_wrappers(self):
        from pychebyshev_tpu.ops.quadrature import fejer1_weights
        from pychebyshev_tpu.utils.calculus import (
            _compute_fejer1_weights,
            _compute_sub_interval_weights,
            _integrate_tt_along_dim,
        )
        np.testing.assert_allclose(_compute_fejer1_weights(9),
                                   np.asarray(fejer1_weights(9)))
        sub = _compute_sub_interval_weights(9, -0.5, 0.5)
        assert np.asarray(sub).shape == (9,)
        core = np.arange(24.0).reshape(2, 4, 3)
        wq = np.array([0.1, 0.2, 0.3, 0.4])
        np.testing.assert_allclose(
            _integrate_tt_along_dim(core, wq),
            np.einsum("rjs,j->rs", core, wq))

    def test_optimize_1d_validation(self):
        from pychebyshev_tpu.utils.calculus import validate_calculus_args
        m1 = ChebyshevApproximation(
            lambda p, _=None: np.sin(np.asarray(p)[:, 0]),
            1, [[0.0, 3.0]], [9], vectorized=True)
        m1.build(verbose=False)
        with pytest.raises(ValueError, match="dim must be 0 or omitted"):
            validate_calculus_args(1, 1, None, [[0.0, 3.0]])
        with pytest.raises(ValueError, match="fixed must be empty"):
            validate_calculus_args(1, None, {0: 1.0}, [[0.0, 3.0]])


class TestChunkedMaps:
    def test_scalar_and_matrix_map_match_direct(self):
        from pychebyshev_tpu.ops import eval as eval_ops
        pts = jnp.asarray(
            np.random.default_rng(1).random((1000, 3)))

        def fn(p):
            return jnp.sin(p).sum(axis=-1)

        direct = fn(pts)
        chunked = eval_ops.chunked_scalar_map(
            fn, pts, per_point=eval_ops._MAX_INTERMEDIATE_ELEMS // 300)
        np.testing.assert_allclose(np.asarray(chunked),
                                   np.asarray(direct), atol=1e-14)

        def fm(p):
            return jnp.stack([p.sum(axis=-1), p.prod(axis=-1)], axis=-1)

        direct_m = fm(pts)
        chunked_m = eval_ops.chunked_matrix_map(
            fm, pts, per_point=eval_ops._MAX_INTERMEDIATE_ELEMS // 300,
            n_cols=2)
        np.testing.assert_allclose(np.asarray(chunked_m),
                                   np.asarray(direct_m), atol=1e-14)

    def test_dense_batch_chunks_when_cap_small(self, monkeypatch):
        from pychebyshev_tpu.ops import eval as eval_ops
        m = _dense()
        pts = np.random.default_rng(2).random((777, 2)) * [2.0, 2.0] \
            + [0.0, -1.0]
        want = np.asarray(m.eval_batch_host(pts, [0, 0]))
        monkeypatch.setattr(eval_ops, "_MAX_INTERMEDIATE_ELEMS", 1 << 10)
        got = np.asarray(m.eval_batch_host(pts, [0, 0]))
        np.testing.assert_allclose(got, want, atol=1e-13)

    def test_dd_chunked_runner(self, monkeypatch):
        from pychebyshev_tpu.ops import eval_dd
        monkeypatch.setattr(eval_dd, "_CHUNK_ELEMS_TARGET", 1)
        # fresh grid shape => fresh lru_cache entry sees the tiny target
        m = _dense(n=(6, 5))
        pts = np.random.default_rng(3).random((700, 2)) * [2.0, 2.0] \
            + [0.0, -1.0]
        got = np.asarray(m.eval_batch_dd(pts))
        want = np.asarray(m.eval_batch_host(pts, [0, 0]))
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-10)


class TestMaskedMultiPieceGroups:
    def test_many_pieces_group_chunking(self):
        # 12 pieces x 2 specs -> group = 16 // 2 = 8 -> two group loops
        knots = list(np.linspace(0.25, 2.75, 11))

        def f(points, _=None):
            return np.abs(np.asarray(points)[:, 0] - 1.5)

        s = ChebyshevSpline(f, 1, [[0.0, 3.0]], [6], [knots],
                            vectorized=True)
        s.build(verbose=False)
        pts = np.random.default_rng(4).random((64, 1)) * 3.0
        out = np.asarray(s.vectorized_eval_batch_multi(
            pts, [[0], [1]]))
        want_v = np.array([s.vectorized_eval([x], [0]) for x in pts[:, 0]])
        want_d = np.array([s.vectorized_eval([x], [1]) for x in pts[:, 0]])
        np.testing.assert_allclose(out[:, 0], want_v, atol=1e-12)
        np.testing.assert_allclose(out[:, 1], want_d, atol=1e-10)


class TestTTCheckpointCorruption:
    def _save_tt(self, tmp_path):
        tt = ChebyshevTT(_f2, 2, DOM2, [5, 5], max_rank=3,
                         vectorized=True)
        tt.build(verbose=False, seed=0)
        path = tmp_path / "tt.npz"
        tt.save(path, format="npz")
        return path

    def _mutate(self, path, out, fn):
        with np.load(path, allow_pickle=False) as data:
            entries = {k: data[k] for k in data.files}
        fn(entries)
        with open(out, "wb") as f:
            np.savez(f, **entries)

    def test_core_count_mismatch(self, tmp_path):
        path = self._save_tt(tmp_path)
        bad = tmp_path / "bad1.npz"

        def drop_core(entries):
            meta = json.loads(str(entries["meta"]))
            meta["n_cores"] = 1
            meta["n_nodes"] = [5, 5]
            entries["meta"] = np.asarray(json.dumps(meta))

        self._mutate(path, bad, drop_core)
        with pytest.raises(ValueError, match="cores for"):
            ChebyshevTT.load(bad)

    def test_boundary_rank_broken(self, tmp_path):
        path = self._save_tt(tmp_path)
        bad = tmp_path / "bad2.npz"

        def widen(entries):
            c0 = entries["core_0"]
            entries["core_0"] = np.concatenate([c0, c0], axis=0)

        self._mutate(path, bad, widen)
        with pytest.raises(ValueError, match="boundary ranks"):
            ChebyshevTT.load(bad)

    def test_dim_order_not_permutation(self, tmp_path):
        path = self._save_tt(tmp_path)
        bad = tmp_path / "bad3.npz"

        def scramble(entries):
            meta = json.loads(str(entries["meta"]))
            meta["dim_order"] = [0, 0]
            entries["meta"] = np.asarray(json.dumps(meta))

        self._mutate(path, bad, scramble)
        with pytest.raises(ValueError, match="not a permutation"):
            ChebyshevTT.load(bad)


class TestCevalFallback:
    def test_try_build_compiles(self):
        from pychebyshev_tpu.utils import ceval
        so = ceval._try_build()
        assert so is None or so.endswith(ceval._SO_NAME)

    def test_numpy_fallback_matches_c_kernel(self, monkeypatch):
        from pychebyshev_tpu.utils import ceval
        m = _dense()
        pt = [0.7, 0.4]
        want = m.vectorized_eval(pt, [0, 0])
        want_d = m.vectorized_eval(pt, [1, 0])
        monkeypatch.setattr(ceval, "_LIB", None)
        monkeypatch.setattr(ceval, "_LIB_FAILED", True)
        fresh = _dense()
        assert fresh.vectorized_eval(pt, [0, 0]) == pytest.approx(
            want, abs=1e-13)
        assert fresh.vectorized_eval(pt, [1, 0]) == pytest.approx(
            want_d, abs=1e-12)
        # multi-spec and TT single-point fall back too
        multi = fresh.vectorized_eval_multi(pt, [[0, 0], [1, 0]])
        np.testing.assert_allclose(np.asarray(multi), [want, want_d],
                                   atol=1e-12)
        tt = ChebyshevTT(_f2, 2, DOM2, [5, 5], max_rank=3,
                         vectorized=True)
        tt.build(verbose=False, seed=0)
        got_tt = tt.eval(pt)
        assert np.isfinite(got_tt)


class TestWideDimsStr:
    def test_dense_seven_dims_str_truncates(self):
        def f7(points, _=None):
            return np.asarray(points).sum(axis=1)

        m = ChebyshevApproximation(f7, 7, [[0.0, 1.0]] * 7, [3] * 7,
                                   vectorized=True)
        m.build(verbose=False)
        s = str(m)
        assert "..." in s

    def test_build_book_verbose_prints(self, capsys):
        from pychebyshev_tpu.serving import build_book

        def book_fn(points, _=None):
            p = np.asarray(points)
            return np.column_stack([p[:, 0], p[:, 1]])

        build_book(book_fn, 2, DOM2, [4, 4], verbose=True)
        out = capsys.readouterr().out
        assert "2-model book" in out and "host" in out


class TestServingErrorMatrix:
    def test_unbuilt_interpolants_rejected(self):
        from pychebyshev_tpu.serving import BatchedEvaluator
        dense = ChebyshevApproximation(_f2, 2, DOM2, [7, 6])
        spline = ChebyshevSpline(_f2, 2, DOM2, [5, 5], [[1.0], []])
        slider = ChebyshevSlider(_f2, 2, DOM2, [6, 6], [[0], [1]],
                                 [1.0, 0.0])
        tt = ChebyshevTT(_f2, 2, DOM2, [5, 5], max_rank=3)
        for m in (dense, spline, slider, tt):
            with pytest.raises(RuntimeError):
                BatchedEvaluator(m, dtype=jnp.float64)

    def test_dd_spline_piece_cap(self):
        from pychebyshev_tpu.serving import BatchedEvaluator
        knots = list(np.linspace(0.1, 2.9, 17))   # 18 pieces > 16 slots

        def f(points, _=None):
            return np.abs(np.asarray(points)[:, 0] - 1.5)

        s = ChebyshevSpline(f, 1, [[0.0, 3.0]], [5], [knots],
                            vectorized=True)
        s.build(verbose=False)
        with pytest.raises(ValueError, match="at most"):
            BatchedEvaluator(s, dtype="dd")

    def test_dd_spline_heterogeneous_pieces_rejected(self):
        from pychebyshev_tpu.serving import BatchedEvaluator

        def f(points, _=None):
            return np.abs(np.asarray(points)[:, 0] - 1.0)

        s = ChebyshevSpline(f, 1, [[0.0, 3.0]], [[5, 7]], [[1.0]],
                            vectorized=True)
        s.build(verbose=False)
        with pytest.raises(ValueError, match="flat n_nodes"):
            BatchedEvaluator(s, dtype="dd")

    def test_batches_beyond_top_bucket_chunk(self):
        from pychebyshev_tpu.serving import (
            BatchedEvaluator,
            MultiModelEvaluator,
            MultiSpecEvaluator,
        )
        m = _dense()
        pts = np.random.default_rng(5).random((21, 2)) * [2.0, 2.0] \
            + [0.0, -1.0]
        want = np.asarray(m.eval_batch_host(pts, [0, 0]))

        eng = BatchedEvaluator(m, dtype=jnp.float64, bucket_sizes=(8,))
        np.testing.assert_allclose(eng(pts), want, atol=1e-12)

        mse = MultiSpecEvaluator(m, [[0, 0], [1, 0]],
                                 dtype=jnp.float64, bucket_sizes=(8,))
        np.testing.assert_allclose(mse(pts)[:, 0], want, atol=1e-12)

        book = MultiModelEvaluator([m, m], dtype=jnp.float64,
                                   bucket_sizes=(8,))
        out = book(pts)
        np.testing.assert_allclose(out[0], want, atol=1e-12)
        np.testing.assert_allclose(out[1], want, atol=1e-12)


class TestServingMeshBranches:
    def _mesh(self):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        return make_mesh(8)

    def test_spline_masked_engine_under_mesh(self):
        from pychebyshev_tpu.serving import BatchedEvaluator

        def f(points, _=None):
            return np.abs(np.asarray(points)[:, 0] - 1.5)

        s = ChebyshevSpline(f, 1, [[0.0, 3.0]], [6], [[1.5]],
                            vectorized=True)
        s.build(verbose=False)
        pts = np.random.default_rng(6).random((40, 1)) * 3.0
        plain = BatchedEvaluator(s, dtype=jnp.float64, bucket_sizes=(64,))
        meshed = BatchedEvaluator(s, dtype=jnp.float64, mesh=self._mesh(),
                                  bucket_sizes=(64,))
        np.testing.assert_allclose(meshed(pts), plain(pts), atol=1e-13)

    def test_single_group_slider_dd_report_under_mesh(self):
        # a whole-domain single-group slider has no pivot correction;
        # the dd report's value spec runs the bare slide over the mesh
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        sl = ChebyshevSlider(_f2, 2, DOM2, [6, 6], [[0, 1]],
                             [1.0, 0.0], vectorized=True)
        sl.build(verbose=False)
        pts = np.random.default_rng(7).random((32, 2)) * [2.0, 2.0] \
            + [0.0, -1.0]
        plain = MultiSpecEvaluator(sl, [[0, 0]], dtype="dd",
                                   bucket_sizes=(32,))
        meshed = MultiSpecEvaluator(sl, [[0, 0]], dtype="dd",
                                    mesh=self._mesh(), bucket_sizes=(32,))
        np.testing.assert_allclose(meshed(pts), plain(pts), atol=1e-10)


class TestSliderDdBudget:
    def _wide_slider(self):
        def f(points, _=None):
            p = np.asarray(points)
            return p[:, 0] * p[:, 1] + np.sin(p[:, 2]) + p[:, 3] ** 2

        sl = ChebyshevSlider(f, 4, [[0.0, 1.0]] * 4, [4] * 4,
                             [[0, 1, 2, 3]], [0.5] * 4, vectorized=True)
        sl.build(verbose=False)
        return sl

    def test_ops_level_raise_and_class_fallback(self):
        from pychebyshev_tpu.ops.slider_eval import (
            slider_batch_dd,
            slider_dd_plan,
        )
        sl = self._wide_slider()
        shapes = [np.shape(s.tensor_values) for s in sl.slides]
        assert not slider_dd_plan(shapes)["ok"]
        pts = np.random.default_rng(8).random((16, 4))
        slide_data = tuple(
            (s.tensor_values,) + s._grid_tuples() for s in sl.slides)
        with pytest.raises(ValueError, match="digit-GEMM budget"):
            slider_batch_dd(slide_data, sl.pivot_value,
                            (tuple(range(4)),), pts)
        # the class path falls back to f64 silently, at full accuracy
        got = sl.eval_batch_dd(pts)
        want = sl.eval_batch(pts)
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


class TestSensitivityGuards:
    def test_nonfinite_coeffs_rejected(self):
        from pychebyshev_tpu.utils.sensitivity import sobol_from_coeffs
        bad = np.ones((3, 3))
        bad[1, 1] = np.nan
        with pytest.raises(ValueError, match="NaN or Inf"):
            sobol_from_coeffs(bad, 2)

    def test_constant_function_sobol_all_zero(self):
        m = _dense(lambda p, _=None: np.full(np.asarray(p).shape[0], 3.7))
        out = m.sobol_indices()
        assert out["variance"] == pytest.approx(0.0, abs=1e-20)
        assert all(v == 0.0 for v in out["first_order"].values())
        assert all(v == 0.0 for v in out["total_order"].values())

    def test_compat_aliases(self):
        from pychebyshev_tpu.utils.sensitivity import (
            _compute_chebyshev_coefficients,
            _compute_sobol_from_coeffs,
            chebyshev_coefficient_tensor,
        )
        vals = np.random.default_rng(9).random((4, 5))
        np.testing.assert_allclose(
            np.asarray(_compute_chebyshev_coefficients(vals, 2)),
            np.asarray(chebyshev_coefficient_tensor(vals)))
        out = _compute_sobol_from_coeffs(
            np.asarray(chebyshev_coefficient_tensor(vals)), 2)
        assert set(out) >= {"first_order", "total_order", "variance"}


class TestSmallCompatAliases:
    def test_tt_eval_promotes_int_points(self):
        from pychebyshev_tpu.ops.tt_eval import tt_eval_batch
        tt = ChebyshevTT(_f2, 2, DOM2, [5, 5], max_rank=3,
                         vectorized=True)
        tt.build(verbose=False, seed=0)
        cores = tuple(jnp.asarray(c) for c in tt._coeff_cores)
        dom = np.asarray(DOM2, dtype=np.float64)
        ipts = np.array([[1, 0], [0, 0]], dtype=np.int64)
        got = np.asarray(tt_eval_batch(cores, dom, jnp.asarray(ipts)))
        want = np.asarray(tt_eval_batch(
            cores, dom, jnp.asarray(ipts, dtype=jnp.float64)))
        np.testing.assert_allclose(got, want, atol=1e-14)

    def test_extrude_slice_nodes_alias(self):
        from pychebyshev_tpu.ops.chebyshev import nodes_for_dim_np
        from pychebyshev_tpu.utils.extrude_slice import _make_nodes_for_dim
        np.testing.assert_allclose(_make_nodes_for_dim(0.0, 2.0, 7),
                                   nodes_for_dim_np(0.0, 2.0, 7))

    def test_dct3_matrix_device_constant(self):
        from pychebyshev_tpu.ops.dct import _dct3_matrix_np, dct3_matrix
        np.testing.assert_allclose(np.asarray(dct3_matrix(6)),
                                   _dct3_matrix_np(6))


class TestBinaryEdgeBranches:
    def test_write_spline_with_additional_data_rejected(self, tmp_path):
        def f(points, data=None):
            return np.abs(np.asarray(points)[:, 0] - 1.0)

        s = ChebyshevSpline(f, 1, [[0.0, 2.0]], [5], [[1.0]],
                            additional_data={"k": 1.0}, vectorized=True)
        s.build(verbose=False)
        with pytest.raises(NotImplementedError, match="additional_data"):
            s.save(tmp_path / "s.pcb", format="binary")

    def test_write_unbuilt_spline_rejected(self, tmp_path):
        s = ChebyshevSpline(lambda p, _=None: np.asarray(p)[:, 0],
                            1, [[0.0, 2.0]], [5], [[1.0]])
        with pytest.raises(RuntimeError, match="unbuilt"):
            s.save(tmp_path / "s.pcb", format="binary")

    def test_oversized_n_nodes_header_hits_safety_cap(self, tmp_path):
        m = _dense(n=(5, 4))
        path = tmp_path / "m.pcb"
        m.save(path, format="binary")
        raw = bytearray(path.read_bytes())
        # header(12) + u32 d(4) + f64 lo/hi (2*2*8) -> n_nodes at 48
        raw[48:56] = (0xFFFFFFFF).to_bytes(4, "little") * 2
        bad = tmp_path / "bad.pcb"
        bad.write_bytes(bytes(raw))
        with pytest.raises(ValueError, match="safety cap"):
            ChebyshevApproximation.load(bad)


class TestDdTpRefusalMessages:
    """The three distinct dd-budget refusal messages (a 1-D grid is
    outside the digit plan, single-chip and tp-sharded alike)."""

    def _mesh_tp(self):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        return make_mesh(8, ("dp", "tp"), shape=(4, 2))

    def _dense_1d(self):
        m = ChebyshevApproximation(
            lambda p, _=None: np.sin(np.asarray(p)[:, 0]),
            1, [[0.0, 3.0]], [8], vectorized=True)
        m.build(verbose=False)
        return m

    def test_no_mesh_suggests_tp(self):
        from pychebyshev_tpu.serving import BatchedEvaluator
        with pytest.raises(ValueError, match="pass a mesh with a 'tp'"):
            BatchedEvaluator(self._dense_1d(), dtype="dd")

    def test_tp_mesh_refused_does_not_suggest_tp(self):
        from pychebyshev_tpu.serving import BatchedEvaluator
        with pytest.raises(ValueError,
                           match="even tensor-parallel over tp=2"):
            BatchedEvaluator(self._dense_1d(), dtype="dd",
                             mesh=self._mesh_tp(), bucket_sizes=(32,))

    def test_non_dense_with_tp_mesh_names_dense_only(self):
        from pychebyshev_tpu.serving import BatchedEvaluator
        s = ChebyshevSpline(
            lambda p, _=None: np.abs(np.asarray(p)[:, 0] - 1.5),
            1, [[0.0, 3.0]], [6], [[1.5]], vectorized=True)
        s.build(verbose=False)
        with pytest.raises(ValueError, match="dense .* engines only"):
            BatchedEvaluator(s, dtype="dd", mesh=self._mesh_tp(),
                             bucket_sizes=(32,))


class TestMaxvolEdgeBranches:
    def test_wide_matrix_short_circuits(self):
        from pychebyshev_tpu.models.tt_algorithms import maxvol
        a = np.random.default_rng(10).random((3, 5))   # m <= r
        idx = maxvol(a)
        np.testing.assert_array_equal(np.sort(idx), np.arange(3))

    def test_effective_rank_of_zero_spectrum(self):
        from pychebyshev_tpu.models import tt_algorithms as tta
        import inspect
        fns = [f for n, f in vars(tta).items()
               if callable(f) and "rank" in n and not n.startswith("__")]
        # the helper guards s[0] <= 0 -> rank 1
        for f in fns:
            sig = inspect.signature(f)
            if list(sig.parameters)[:1] == ["s"]:
                assert f(np.array([]), 5) == 1
                assert f(np.array([0.0, 0.0]), 5) == 1
                break
        else:
            pytest.skip("rank helper not found by name")


class TestUnbuiltEntryPoints:
    def test_dense_batch_entry_points_raise(self):
        m = ChebyshevApproximation(_f2, 2, DOM2, [7, 6])
        pts = np.zeros((3, 2))
        for call in (lambda: m.eval_batch_device(pts),
                     lambda: m.eval_batch_f32(pts),
                     lambda: m.eval_batch_dd(pts),
                     lambda: m.eval_batch_host(pts, [0, 0]),
                     lambda: m.vectorized_eval_batch_multi(pts, [[0, 0]]),
                     lambda: m.vectorized_eval([0.5, 0.0], [0, 0])):
            with pytest.raises(RuntimeError):
                call()

    def test_npz_cross_class_load_rejected(self, tmp_path):
        tt = ChebyshevTT(_f2, 2, DOM2, [5, 5], max_rank=3,
                         vectorized=True)
        tt.build(verbose=False, seed=0)
        path = tmp_path / "tt.npz"
        tt.save(path, format="npz")
        with pytest.raises(TypeError, match="Expected a"):
            ChebyshevApproximation.load(path)
