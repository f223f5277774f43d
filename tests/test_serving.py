"""BatchedEvaluator: bucket padding, dtype modes, derivative specs."""

import math

import numpy as np
import pytest
import jax.numpy as jnp

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevTT
from pychebyshev_tpu.serving import BatchedEvaluator

from conftest import BS_DOMAIN_5D


def f3(x, _):
    return math.sin(x[0]) + math.cos(x[1]) * x[2]


@pytest.fixture(scope="module")
def cheb():
    c = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [9] * 3)
    c.build(verbose=False)
    return c


@pytest.fixture(scope="module")
def tt():
    t = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6)
    t.build(verbose=False, seed=0)
    return t


@pytest.fixture(scope="module")
def pts():
    return np.random.default_rng(0).uniform(-1, 1, size=(777, 3))


class TestDense:
    def test_f64_matches_reference_path(self, cheb, pts):
        engine = BatchedEvaluator(cheb, dtype=jnp.float64,
                                  bucket_sizes=(256, 1024))
        engine.warmup()
        out = engine(pts)
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(out, expected, atol=1e-13)

    def test_f32_mode(self, cheb, pts):
        engine = BatchedEvaluator(cheb, dtype=jnp.float32,
                                  bucket_sizes=(256, 1024))
        out = engine(pts)
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(out, expected, atol=5e-5)

    def test_derivative_spec(self, cheb, pts):
        engine = BatchedEvaluator(cheb, dtype=jnp.float64,
                                  derivative_order=[1, 0, 0],
                                  bucket_sizes=(1024,))
        out = engine(pts)
        expected = cheb.vectorized_eval_batch(pts, [1, 0, 0])
        np.testing.assert_allclose(out, expected, atol=1e-12)

    def test_ragged_and_oversized_batches(self, cheb):
        engine = BatchedEvaluator(cheb, dtype=jnp.float64,
                                  bucket_sizes=(64, 256))
        rng = np.random.default_rng(1)
        for n in (1, 63, 64, 65, 255, 300, 1000):
            p = rng.uniform(-1, 1, size=(n, 3))
            out = engine(p)
            assert out.shape == (n,)
            expected = cheb.vectorized_eval_batch(p, [0, 0, 0])
            np.testing.assert_allclose(out, expected, atol=1e-13)

    def test_fused_mode(self, cheb, pts):
        engine = BatchedEvaluator(cheb, dtype=jnp.float32,
                                  bucket_sizes=(1024,), use_fused=True)
        out = engine(pts)
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(out, expected, atol=5e-5)

    def test_validation(self, cheb):
        with pytest.raises(ValueError):
            BatchedEvaluator(cheb, derivative_order=[1, 0])
        engine = BatchedEvaluator(cheb)
        with pytest.raises(ValueError):
            engine(np.zeros((5, 2)))
        unbuilt = ChebyshevApproximation(f3, 3, [[-1, 1]] * 3, [5] * 3)
        with pytest.raises(RuntimeError):
            BatchedEvaluator(unbuilt)
        with pytest.raises(TypeError):
            BatchedEvaluator("nope")


class TestTT:
    def test_values(self, tt, pts):
        engine = BatchedEvaluator(tt, dtype=jnp.float64,
                                  bucket_sizes=(256, 1024))
        engine.warmup()
        out = engine(pts)
        expected = tt.eval_batch(pts)
        np.testing.assert_allclose(out, expected, atol=1e-13)

    def test_analytic_derivative_spec(self, tt, pts):
        engine = BatchedEvaluator(tt, dtype=jnp.float64,
                                  derivative_order=[1, 0, 0],
                                  bucket_sizes=(1024,))
        out = engine(pts)
        expected = tt.differentiate([1, 0, 0]).eval_batch(pts)
        np.testing.assert_allclose(out, expected, atol=1e-12)

    def test_reordered_storage(self, tt, pts):
        rt = tt.reorder([2, 0, 1])
        engine = BatchedEvaluator(rt, dtype=jnp.float64,
                                  bucket_sizes=(1024,))
        out = engine(pts)
        expected = tt.eval_batch(pts)
        np.testing.assert_allclose(out, expected, atol=1e-9)


class TestSpline:
    @pytest.fixture(scope="class")
    def spline(self):
        from pychebyshev_tpu import ChebyshevSpline

        def kinked(x, _):
            return abs(x[0] - 0.3) * (1.0 + 0.5 * x[1])

        sp = ChebyshevSpline(kinked, 2, [[-1, 1], [-1, 1]], [9, 9],
                             [[0.3], []])
        sp.build(verbose=False)
        return sp

    @pytest.fixture(scope="class")
    def pts2(self):
        return np.random.default_rng(7).uniform(-1, 1, size=(555, 2))

    def test_values_match_spline_batch(self, spline, pts2):
        engine = BatchedEvaluator(spline, dtype=jnp.float64,
                                  bucket_sizes=(128, 512))
        engine.warmup()
        out = engine(pts2)
        expected = spline.eval_batch(pts2, [0, 0])
        np.testing.assert_allclose(out, expected, atol=1e-13)

    def test_f32_mode(self, spline, pts2):
        engine = BatchedEvaluator(spline, dtype=jnp.float32,
                                  bucket_sizes=(1024,))
        out = engine(pts2)
        expected = spline.eval_batch(pts2, [0, 0])
        np.testing.assert_allclose(out, expected, atol=5e-5)

    def test_derivative_spec(self, spline, pts2):
        engine = BatchedEvaluator(spline, dtype=jnp.float64,
                                  derivative_order=[1, 0],
                                  bucket_sizes=(1024,))
        out = engine(pts2)
        expected = spline.eval_batch(pts2, [1, 0])
        np.testing.assert_allclose(out, expected, atol=1e-12)

    def test_derivative_sign_flips_at_kink(self, spline):
        engine = BatchedEvaluator(spline, dtype=jnp.float64,
                                  derivative_order=[1, 0],
                                  bucket_sizes=(128,))
        out = engine(np.array([[0.1, 0.0], [0.5, 0.0]]))
        assert out[0] < 0 < out[1]

    def test_knot_boundary_derivative_raises(self, spline):
        engine = BatchedEvaluator(spline, dtype=jnp.float64,
                                  derivative_order=[1, 0],
                                  bucket_sizes=(128,))
        with pytest.raises(ValueError, match="knot"):
            engine(np.array([[0.3, 0.0]]))

    def test_knot_boundary_value_ok(self, spline):
        engine = BatchedEvaluator(spline, dtype=jnp.float64,
                                  bucket_sizes=(128,))
        out = engine(np.array([[0.3, 0.25]]))
        assert abs(out[0] - spline.eval([0.3, 0.25], [0, 0])) < 1e-13

    def test_piece_group_sizes_irrelevant(self, spline):
        # all points in one piece; then all in the other
        left = np.column_stack([np.linspace(-0.9, 0.2, 300),
                                np.zeros(300)])
        right = np.column_stack([np.linspace(0.4, 0.9, 300),
                                 np.zeros(300)])
        engine = BatchedEvaluator(spline, bucket_sizes=(512,))
        for grp in (left, right):
            np.testing.assert_allclose(
                engine(grp), spline.eval_batch(grp, [0, 0]), atol=5e-5)


class TestSlider:
    @pytest.fixture(scope="class")
    def slider(self):
        from pychebyshev_tpu import ChebyshevSlider

        def f(x, _):
            return (math.sin(x[0]) * math.cos(x[1])
                    + math.exp(-x[2]) + 0.5 * x[3])

        sl = ChebyshevSlider(f, 4, [[-1, 1]] * 4, [9] * 4,
                             [[0, 1], [2], [3]], [0.0, 0.0, 0.0, 0.0])
        sl.build(verbose=False)
        return sl

    @pytest.fixture(scope="class")
    def pts4(self):
        return np.random.default_rng(11).uniform(-1, 1, size=(333, 4))

    def test_values_match_slider_batch(self, slider, pts4):
        engine = BatchedEvaluator(slider, dtype=jnp.float64,
                                  bucket_sizes=(128, 512))
        engine.warmup()
        np.testing.assert_allclose(engine(pts4),
                                   slider.eval_batch(pts4), atol=1e-13)

    def test_derivative_routes_to_owning_slide(self, slider, pts4):
        engine = BatchedEvaluator(slider, dtype=jnp.float64,
                                  derivative_order=[0, 0, 1, 0],
                                  bucket_sizes=(512,))
        np.testing.assert_allclose(
            engine(pts4), slider.eval_batch(pts4, [0, 0, 1, 0]),
            atol=1e-12)

    def test_in_group_mixed_partial(self, slider, pts4):
        engine = BatchedEvaluator(slider, dtype=jnp.float64,
                                  derivative_order=[1, 1, 0, 0],
                                  bucket_sizes=(512,))
        np.testing.assert_allclose(
            engine(pts4), slider.eval_batch(pts4, [1, 1, 0, 0]),
            atol=1e-12)

    def test_cross_group_partial_is_zero(self, slider, pts4):
        engine = BatchedEvaluator(slider, dtype=jnp.float64,
                                  derivative_order=[1, 0, 1, 0],
                                  bucket_sizes=(512,))
        assert np.all(engine(pts4) == 0.0)

    def test_f32_mode(self, slider, pts4):
        engine = BatchedEvaluator(slider, dtype=jnp.float32,
                                  bucket_sizes=(512,))
        np.testing.assert_allclose(engine(pts4),
                                   slider.eval_batch(pts4), atol=5e-6)


class TestSplineNestedNodes:
    def test_nested_n_nodes_pieces_compile_per_shape(self):
        from pychebyshev_tpu import ChebyshevSpline

        def kinked(x, _):
            return abs(x[0]) + 0.1 * x[0] ** 2

        # different node counts per piece -> distinct kernel shapes
        sp = ChebyshevSpline(kinked, 1, [[-1, 1]], [[7, 11]], [[0.0]])
        sp.build(verbose=False)
        engine = BatchedEvaluator(sp, dtype=jnp.float64,
                                  bucket_sizes=(128,))
        pts = np.linspace(-0.95, 0.95, 301).reshape(-1, 1)
        np.testing.assert_allclose(engine(pts),
                                   sp.eval_batch(pts, [0]), atol=1e-13)


class TestMultiModel:
    @pytest.fixture(scope="class")
    def book(self):
        models = []
        for kcoef in (0.5, 1.0, 2.0):
            c = ChebyshevApproximation(
                lambda x, _, k=kcoef: math.sin(k * x[0]) + k * x[1],
                2, [[-1, 1], [-1, 1]], [9, 9])
            c.build(verbose=False)
            models.append(c)
        return models

    def test_matches_individual_evals(self, book):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        engine = MultiModelEvaluator(book, dtype=jnp.float64,
                                     bucket_sizes=(256, 1024))
        engine.warmup()
        pts = np.random.default_rng(0).uniform(-1, 1, (777, 2))
        out = engine(pts)
        assert out.shape == (3, 777)
        for i, m in enumerate(book):
            np.testing.assert_allclose(
                out[i], m.vectorized_eval_batch(pts, [0, 0]), atol=1e-13)

    def test_derivative_spec(self, book):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        engine = MultiModelEvaluator(book, dtype=jnp.float64,
                                     derivative_order=[1, 0],
                                     bucket_sizes=(1024,))
        pts = np.random.default_rng(1).uniform(-1, 1, (100, 2))
        out = engine(pts)
        for i, m in enumerate(book):
            np.testing.assert_allclose(
                out[i], m.vectorized_eval_batch(pts, [1, 0]), atol=1e-12)

    def test_mismatched_grid_rejected(self, book):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        other = ChebyshevApproximation(
            lambda x, _: x[0], 2, [[-1, 1], [0, 2]], [9, 9])
        other.build(verbose=False)
        with pytest.raises(ValueError, match="shared grid"):
            MultiModelEvaluator(book + [other])
        other2 = ChebyshevApproximation(
            lambda x, _: x[0], 2, [[-1, 1], [-1, 1]], [9, 7])
        other2.build(verbose=False)
        with pytest.raises(ValueError, match="shared grid"):
            MultiModelEvaluator(book + [other2])

    def test_validation(self, book):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        with pytest.raises(ValueError, match="non-empty"):
            MultiModelEvaluator([])
        with pytest.raises(TypeError):
            MultiModelEvaluator(["nope"])
        engine = MultiModelEvaluator(book)
        with pytest.raises(ValueError, match="shape"):
            engine(np.zeros((5, 3)))


class TestMeshServing:
    def test_dp_sharded_engine_matches_single_device(self, cheb, pts):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(8, axis_names=("dp",))
        engine = BatchedEvaluator(cheb, dtype=jnp.float64,
                                  bucket_sizes=(256, 1024), mesh=mesh)
        engine.warmup()
        out = engine(pts)
        expected = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(out, expected, atol=1e-13)

    def test_tt_dp_sharded(self, tt, pts):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(4, axis_names=("dp",))
        engine = BatchedEvaluator(tt, dtype=jnp.float64,
                                  bucket_sizes=(256,), mesh=mesh)
        out = engine(pts)
        np.testing.assert_allclose(out, tt.eval_batch(pts), atol=1e-13)

    def test_indivisible_bucket_rejected(self, cheb):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(8, axis_names=("dp",))
        with pytest.raises(ValueError, match="divisible"):
            BatchedEvaluator(cheb, bucket_sizes=(100,), mesh=mesh)

    def test_dense_dd_dp_sharded(self, cheb, pts):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(8, axis_names=("dp",))
        engine = BatchedEvaluator(cheb, dtype="dd",
                                  bucket_sizes=(256,), mesh=mesh)
        out = engine(pts)
        want = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        scale = np.abs(want).max()
        assert np.abs(out - want).max() / scale < 1e-10

    def test_slider_dd_dp_sharded(self):
        from pychebyshev_tpu import ChebyshevSlider
        from pychebyshev_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(8, axis_names=("dp",))
        sl = ChebyshevSlider(
            lambda x, _: math.sin(x[0]) + x[1] ** 2 + 0.5 * x[2],
            3, [[-1, 1]] * 3, [9] * 3, [[0], [1], [2]], [0.0] * 3)
        sl.build(verbose=False)
        engine = BatchedEvaluator(sl, dtype="dd", bucket_sizes=(64,),
                                  mesh=mesh)
        pts = np.random.default_rng(9).uniform(-1, 1, (150, 3))
        got = engine(pts)
        want = sl.eval_batch(pts)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-11

    def test_fused_with_mesh_rejected(self, cheb):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(8, axis_names=("dp",))
        with pytest.raises(ValueError, match="mutually exclusive"):
            BatchedEvaluator(cheb, bucket_sizes=(256,), mesh=mesh,
                             use_fused=True)


class TestMultiModelTT:
    @pytest.fixture(scope="class")
    def tt_book(self):
        defs = [lambda x, _: math.sin(x[0]) + math.cos(x[1]) * x[2],
                lambda x, _: math.exp(-x[0]) * x[1] + x[2] ** 2,
                lambda x, _: x[0] * x[1] * x[2] + math.sin(x[2])]
        book = []
        for f in defs:
            t = ChebyshevTT(f, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6)
            t.build(verbose=False, seed=0)
            book.append(t)
        return book

    def test_matches_individual_tt_evals(self, tt_book):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        engine = MultiModelEvaluator(tt_book, dtype=jnp.float64,
                                     bucket_sizes=(256, 1024))
        engine.warmup()
        pts = np.random.default_rng(0).uniform(-1, 1, (555, 3))
        out = engine(pts)
        assert out.shape == (3, 555)
        for i, m in enumerate(tt_book):
            np.testing.assert_allclose(out[i], m.eval_batch(pts),
                                       atol=1e-12)

    def test_tt_analytic_derivative_book(self, tt_book):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        engine = MultiModelEvaluator(tt_book, dtype=jnp.float64,
                                     derivative_order=[1, 0, 0],
                                     bucket_sizes=(1024,))
        pts = np.random.default_rng(1).uniform(-1, 1, (100, 3))
        out = engine(pts)
        for i, m in enumerate(tt_book):
            expected = m.differentiate([1, 0, 0]).eval_batch(pts)
            np.testing.assert_allclose(out[i], expected, atol=1e-11)

    def test_mixed_kind_book_rejected(self, tt_book, cheb):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        with pytest.raises(TypeError, match="homogeneous"):
            MultiModelEvaluator([tt_book[0], cheb])

    def test_mismatched_dim_order_rejected(self, tt_book):
        from pychebyshev_tpu.serving import MultiModelEvaluator
        reordered = tt_book[1].reorder([2, 0, 1])
        with pytest.raises(ValueError, match="dim_order"):
            MultiModelEvaluator([tt_book[0], reordered])


class TestMultiModelMesh:
    def test_dp_sharded_book(self, cheb):
        import math
        from pychebyshev_tpu.serving import MultiModelEvaluator
        from pychebyshev_tpu.parallel.sharding import make_mesh
        models = []
        for k in (0.5, 2.0):
            c = ChebyshevApproximation(
                lambda x, _, kk=k: math.sin(kk * x[0]) + x[1] * x[2],
                3, [[-1, 1]] * 3, [9] * 3)
            c.build(verbose=False)
            models.append(c)
        mesh = make_mesh(8, axis_names=("dp",))
        engine = MultiModelEvaluator(models, dtype=jnp.float64,
                                     bucket_sizes=(256,), mesh=mesh)
        engine.warmup()
        pts = np.random.default_rng(0).uniform(-1, 1, (700, 3))
        out = engine(pts)
        for i, m in enumerate(models):
            np.testing.assert_allclose(
                out[i], m.vectorized_eval_batch(pts, [0, 0, 0]),
                atol=1e-13)


class TestMultiSpecEvaluator:
    def test_matches_per_spec_evals(self, cheb_bs5d):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        import jax.numpy as jnp
        specs = [[0] * 5, [1, 0, 0, 0, 0], [0, 0, 0, 1, 0],
                 [2, 0, 0, 0, 0]]
        engine = MultiSpecEvaluator(cheb_bs5d, specs, dtype=jnp.float64,
                                    bucket_sizes=(64, 256))
        engine.warmup()
        rng = np.random.default_rng(4)
        lo = np.array([b[0] for b in BS_DOMAIN_5D])
        hi = np.array([b[1] for b in BS_DOMAIN_5D])
        pts = lo + (hi - lo) * rng.uniform(0.05, 0.95, size=(77, 5))
        out = engine(pts)
        assert out.shape == (77, 4)
        for m, spec in enumerate(specs):
            expected = cheb_bs5d.vectorized_eval_batch(pts, list(spec))
            np.testing.assert_allclose(out[:, m], expected, rtol=1e-11,
                                       atol=1e-11)

    def test_validation(self, cheb_bs5d):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        with pytest.raises(ValueError):
            MultiSpecEvaluator(cheb_bs5d, [[0, 0]])   # wrong spec length


class TestMultiSpecSpline:
    @pytest.fixture(scope="class")
    def spline(self):
        from pychebyshev_tpu import ChebyshevSpline

        def kinked(x, _):
            return abs(x[0] - 0.3) * (1.0 + 0.5 * x[1])

        sp = ChebyshevSpline(kinked, 2, [[-1, 1], [-1, 1]], [9, 9],
                             [[0.3], []])
        sp.build(verbose=False)
        return sp

    def test_matches_class_batch_multi(self, spline):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        specs = [[0, 0], [1, 0], [0, 1], [1, 1]]
        engine = MultiSpecEvaluator(spline, specs, dtype=jnp.float64,
                                    bucket_sizes=(64, 256))
        engine.warmup()
        pts = np.random.default_rng(5).uniform(-1, 1, size=(177, 2))
        out = engine(pts)
        expected = spline.vectorized_eval_batch_multi(pts, specs)
        np.testing.assert_allclose(out, expected, rtol=0, atol=1e-11)

    def test_f32_mode(self, spline):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        specs = [[0, 0], [1, 0]]
        engine = MultiSpecEvaluator(spline, specs, dtype=jnp.float32,
                                    bucket_sizes=(256,))
        pts = np.random.default_rng(6).uniform(-1, 1, size=(100, 2))
        out = engine(pts)
        expected = spline.vectorized_eval_batch_multi(pts, specs)
        np.testing.assert_allclose(out, expected, rtol=2e-4, atol=2e-4)

    def test_knot_derivative_guard(self, spline):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        engine = MultiSpecEvaluator(spline, [[0, 0], [1, 0]],
                                    dtype=jnp.float64,
                                    bucket_sizes=(64,))
        pts = np.array([[0.3, 0.5]])
        with pytest.raises(ValueError, match="not defined"):
            engine(pts)
        # value-only specs at the knot are fine
        value_engine = MultiSpecEvaluator(spline, [[0, 0]],
                                          dtype=jnp.float64,
                                          bucket_sizes=(64,))
        out = value_engine(pts)
        assert abs(out[0, 0]) < 1.0

    def test_nested_rejected(self):
        from pychebyshev_tpu import ChebyshevSpline
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        sp = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]],
                             [[9, 7]], [[0.0]])
        sp.build(verbose=False)
        with pytest.raises(ValueError, match="flat n_nodes"):
            MultiSpecEvaluator(sp, [[0]])


class TestMultiSpecSlider:
    @pytest.fixture(scope="class")
    def slider(self):
        from pychebyshev_tpu import ChebyshevSlider

        def f(x, _):
            return (math.sin(x[0]) * math.cos(x[1])
                    + math.exp(-x[2]) + 0.5 * x[3])

        sl = ChebyshevSlider(f, 4, [[-1, 1]] * 4, [9] * 4,
                             [[0, 1], [2], [3]], [0.0, 0.0, 0.0, 0.0])
        sl.build(verbose=False)
        return sl

    def test_matches_class_batch_multi(self, slider):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        specs = [[0, 0, 0, 0], [1, 0, 0, 0], [1, 1, 0, 0],
                 [0, 0, 2, 0], [1, 0, 1, 0]]  # last crosses groups
        engine = MultiSpecEvaluator(slider, specs, dtype=jnp.float64,
                                    bucket_sizes=(64, 256))
        engine.warmup()
        pts = np.random.default_rng(8).uniform(-1, 1, size=(150, 4))
        out = engine(pts)
        expected = slider.vectorized_eval_batch_multi(pts, specs)
        np.testing.assert_allclose(out, expected, rtol=0, atol=1e-11)
        np.testing.assert_array_equal(out[:, 4], 0.0)

    def test_tt_rejected(self, tt):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        with pytest.raises(TypeError, match="differentiate"):
            MultiSpecEvaluator(tt, [[0, 0, 0]])


class TestSplineF32Routing:
    """f32 serving engines must route by f64: a point within f32 eps of
    a knot picks the correct side (ADVICE r2; O(1) derivative error
    otherwise)."""

    def test_knot_adjacent_derivative_routing(self):
        from pychebyshev_tpu import ChebyshevSpline
        k = 1.0 / 3.0
        spl = ChebyshevSpline(lambda x, _: abs(x[0] - k), 1, [[-1, 1]],
                              [12], [[k]])
        spl.build(verbose=False)
        eng = BatchedEvaluator(spl, dtype=jnp.float32,
                               derivative_order=(1,), bucket_sizes=(64,))
        pts = np.array([[k - 1e-12], [k + 1e-12], [k - 0.25], [k + 0.25]])
        got = eng(pts)
        want = np.array([spl.eval(list(p), [1]) for p in pts])
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)

    def test_f32_value_engine_accuracy(self):
        from pychebyshev_tpu import ChebyshevSpline
        spl = ChebyshevSpline(
            lambda x, _: abs(x[0]) + 0.3 * x[1] ** 2, 2,
            [[-1, 1], [-1, 1]], [8, 8], [[0.0], []])
        spl.build(verbose=False)
        eng = BatchedEvaluator(spl, dtype=jnp.float32, bucket_sizes=(256,))
        rng = np.random.default_rng(3)
        pts = rng.uniform(-1, 1, (200, 2))
        got = eng(pts)
        want = spl.eval_batch(pts, [0, 0])
        np.testing.assert_allclose(got, want, rtol=0, atol=5e-6)


class TestDigitGemmServing:
    """dtype='dd': near-f64 serving tier through the bucket engine."""

    @pytest.fixture(scope="class")
    def cheb3(self):
        from pychebyshev_tpu import ChebyshevApproximation
        import math
        c = ChebyshevApproximation(
            lambda x, _: math.sin(x[0]) * x[1] + math.exp(0.3 * x[2]),
            3, [[-1, 1]] * 3, [9, 9, 9])
        c.build(verbose=False)
        return c

    def test_matches_f64_path(self, cheb3):
        eng = BatchedEvaluator(cheb3, dtype="dd", bucket_sizes=(512,))
        rng = np.random.default_rng(4)
        pts = rng.uniform(-1, 1, (700, 3))   # exercises 2-bucket split
        got = eng(pts)
        want = cheb3.vectorized_eval_batch(pts, [0, 0, 0])
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-9

    def test_derivative_spec_hoisted(self, cheb3):
        eng = BatchedEvaluator(cheb3, dtype="dd",
                               derivative_order=(1, 0, 0),
                               bucket_sizes=(256,))
        rng = np.random.default_rng(5)
        pts = rng.uniform(-1, 1, (200, 3))
        got = eng(pts)
        want = cheb3.vectorized_eval_batch(pts, [1, 0, 0])
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-8

    def test_slider_dd_now_supported(self):
        # All four families carry the dd tier; the slider engine's
        # parity lives in tests/test_slider_dd.py.
        from pychebyshev_tpu import ChebyshevSlider
        sl = ChebyshevSlider(lambda x, _: x[0] + x[1], 2, [[-1, 1]] * 2,
                             [7, 7], [[0], [1]], [0.0, 0.0])
        sl.build(verbose=False)
        eng = BatchedEvaluator(sl, dtype="dd", bucket_sizes=(64,))
        pts = np.random.default_rng(1).uniform(-1, 1, (50, 2))
        np.testing.assert_allclose(eng(pts), sl.eval_batch(pts),
                                   rtol=0, atol=1e-11)

    def test_unsupported_grid_detected(self):
        # Grids whose right group exceeds the digit budget are refused
        # at the ops level (the engine surfaces the same ValueError).
        from pychebyshev_tpu.ops.eval_dd import supports_dd
        assert not supports_dd((4, 1 << 17))
        assert supports_dd((11, 11, 11, 11, 11))


class TestDigitGemmSplineServing:
    def test_spline_dd_matches_class_path(self):
        from pychebyshev_tpu import ChebyshevSpline
        import math
        spl = ChebyshevSpline(
            lambda x, _: abs(x[0]) * math.exp(0.2 * x[1]) + x[2],
            3, [[-1, 1]] * 3, [8, 8, 8], [[0.0], [], []])
        spl.build(verbose=False)
        eng = BatchedEvaluator(spl, dtype="dd", bucket_sizes=(256,))
        rng = np.random.default_rng(6)
        pts = rng.uniform(-1, 1, (600, 3))
        got = eng(pts)
        want = spl.eval_batch(pts, [0, 0, 0])
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-9

    def test_spline_dd_derivative(self):
        from pychebyshev_tpu import ChebyshevSpline
        spl = ChebyshevSpline(
            lambda x, _: abs(x[0]) + 0.3 * x[1] ** 3 + x[2],
            3, [[-1, 1]] * 3, [8, 8, 8], [[0.0], [], []])
        spl.build(verbose=False)
        eng = BatchedEvaluator(spl, dtype="dd",
                               derivative_order=(0, 1, 0),
                               bucket_sizes=(256,))
        rng = np.random.default_rng(8)
        pts = rng.uniform(-1, 1, (300, 3))
        got = eng(pts)
        want = spl.eval_batch(pts, [0, 1, 0])
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-8

    def test_nested_n_nodes_rejected(self):
        from pychebyshev_tpu import ChebyshevSpline
        spl = ChebyshevSpline(lambda x, _: abs(x[0]) + x[1] + x[2],
                              3, [[-1, 1]] * 3,
                              [[8, 9], [8], [8]], [[0.0], [], []])
        spl.build(verbose=False)
        with pytest.raises(ValueError, match="flat"):
            BatchedEvaluator(spl, dtype="dd")


class TestFusedAutoDefault:
    def test_auto_resolves_by_backend_and_shape(self, cheb):
        import jax
        from pychebyshev_tpu.ops.pallas_eval import prefer_fused
        eng = BatchedEvaluator(cheb, dtype=jnp.float32,
                               bucket_sizes=(64,))
        expected = (jax.default_backend() == "tpu"
                    and prefer_fused(tuple(cheb.n_nodes), jnp.float32))
        assert eng._use_fused == expected

    def test_auto_never_stays_tristate(self, cheb):
        eng = BatchedEvaluator(cheb, dtype=jnp.float32,
                               bucket_sizes=(64,))
        assert eng._use_fused in (True, False)

    def test_mesh_auto_stays_xla(self, cheb):
        import jax
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        from pychebyshev_tpu.parallel.sharding import make_mesh
        eng = BatchedEvaluator(cheb, dtype=jnp.float32,
                               bucket_sizes=(64,), mesh=make_mesh(2))
        assert eng._use_fused is False


def test_dd_spline_piece_cap_enforced():
    from pychebyshev_tpu import ChebyshevSpline
    knots = list(np.linspace(-1, 1, 19)[1:-1])  # 18 pieces > 16 slots
    spl = ChebyshevSpline(lambda x, _: abs(np.sin(3 * x[0])) + x[1],
                          2, [[-1, 1]] * 2, [6, 6], [knots, []])
    spl.build(verbose=False)
    with pytest.raises(ValueError, match="at most"):
        BatchedEvaluator(spl, dtype="dd")


class TestEmptySpecSurface:
    def test_all_families_return_n_by_zero(self):
        """Degenerate empty derivative_orders: uniform (N, 0) everywhere."""
        import math
        from pychebyshev_tpu import (ChebyshevApproximation,
                                     ChebyshevSlider, ChebyshevSpline)
        pts2 = np.random.default_rng(0).uniform(-0.9, 0.9, (5, 2))

        c = ChebyshevApproximation(lambda x, _: x[0] + x[1], 2,
                                   [[-1, 1]] * 2, [5, 5])
        c.build(verbose=False)
        assert np.asarray(
            c.vectorized_eval_batch_multi(pts2, [])).shape == (5, 0)

        sp = ChebyshevSpline(lambda x, _: abs(x[0]) + x[1], 2,
                             [[-1, 1]] * 2, [5, 5], [[0.0], []])
        sp.build(verbose=False)
        assert np.asarray(
            sp.vectorized_eval_batch_multi(pts2, [])).shape == (5, 0)

        sl = ChebyshevSlider(lambda x, _: x[0] ** 2 + x[1], 2,
                             [[-1, 1]] * 2, [5, 5],
                             partition=[[0], [1]],
                             pivot_point=[0.0, 0.0])
        sl.build(verbose=False)
        assert np.asarray(
            sl.vectorized_eval_batch_multi(pts2, [])).shape == (5, 0)


class TestMultiSpecHoisting:
    def test_dense_engine_matches_class_path_exactly_f64(self, cheb):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        pts = np.random.default_rng(3).uniform(-0.9, 0.9, (200, 3))
        specs = [[0, 0, 0], [1, 0, 0], [0, 2, 0], [1, 0, 1]]
        eng = MultiSpecEvaluator(cheb, specs, dtype=jnp.float64,
                                 bucket_sizes=(64, 256))
        got = np.asarray(eng(pts))
        want = np.asarray(cheb.vectorized_eval_batch_multi(pts, specs))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_spec_tensors_are_hoisted_at_construction(self, cheb):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        specs = [[0, 0, 0], [1, 0, 0]]
        eng = MultiSpecEvaluator(cheb, specs, bucket_sizes=(64,))
        assert len(eng._spec_tensors) == 2
        # Spec 0 is the undifferentiated tensor; spec 1 differs.
        t0, t1 = (np.asarray(t) for t in eng._spec_tensors)
        assert t0.shape == t1.shape
        assert not np.allclose(t0, t1)

    def test_mesh_bucket_divisibility_guard(self, cheb):
        import jax
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        if len(jax.devices()) < 2:
            pytest.skip("needs multiple devices")
        from pychebyshev_tpu.parallel.sharding import make_mesh
        with pytest.raises(ValueError, match="divisible"):
            MultiSpecEvaluator(cheb, [[0, 0, 0]], mesh=make_mesh(2),
                               bucket_sizes=(129,))


class TestDigitGemmTTServing:
    """dtype='dd' on a ChebyshevTT: the TT digit-GEMM tier through the
    bucket engine (ops/tt_eval_dd.py)."""

    def test_matches_f64_chain(self, tt, pts):
        eng = BatchedEvaluator(tt, dtype="dd", bucket_sizes=(512,))
        got = eng(pts)                       # 777 pts -> 2-bucket split
        want = tt.eval_batch(pts)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-11

    def test_derivative_spec_uses_analytic_tt(self, tt, pts):
        eng = BatchedEvaluator(tt, dtype="dd",
                               derivative_order=(1, 0, 0),
                               bucket_sizes=(256,))
        got = eng(pts[:200])
        want = tt.differentiate([1, 0, 0]).eval_batch(pts[:200])
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-10

    def test_dd_rejects_use_fused(self, tt):
        with pytest.raises(ValueError, match="use_fused"):
            BatchedEvaluator(tt, dtype="dd", use_fused=True)

    def test_dd_composes_with_mesh(self, tt, pts):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(8, axis_names=("dp",))
        eng = BatchedEvaluator(tt, dtype="dd", mesh=mesh,
                               bucket_sizes=(256,))
        got = eng(pts[:300])
        want = tt.eval_batch(pts[:300])
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-11

    def test_unbuilt_tt_rejected(self):
        t = ChebyshevTT(f3, 3, [[-1, 1]] * 3, [9] * 3, max_rank=4)
        with pytest.raises(RuntimeError, match="build"):
            BatchedEvaluator(t, dtype="dd")


class TestMeshMultiSpecDD:
    """MultiSpecEvaluator(dtype='dd', mesh=...): report runners
    replicate their plane working set and shard points over dp."""

    def test_dense_report_dp_sharded(self, cheb, pts):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        mesh = make_mesh(8, axis_names=("dp",))
        specs = [(0, 0, 0), (1, 0, 0), (0, 0, 2)]
        eng = MultiSpecEvaluator(cheb, specs, dtype="dd", mesh=mesh,
                                 bucket_sizes=(256,))
        got = eng(pts[:300])
        for m, s in enumerate(specs):
            want = cheb.vectorized_eval_batch(pts[:300], list(s))
            scale = np.abs(want).max()
            assert np.abs(got[:, m] - want).max() / scale < 1e-10, s

    def test_slider_report_dp_sharded(self):
        from pychebyshev_tpu import ChebyshevSlider
        from pychebyshev_tpu.parallel.sharding import make_mesh
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        mesh = make_mesh(8, axis_names=("dp",))
        sl = ChebyshevSlider(
            lambda x, _: math.sin(x[0]) + x[1] ** 2 + 0.5 * x[2],
            3, [[-1, 1]] * 3, [9] * 3, [[0], [1], [2]], [0.0] * 3)
        sl.build(verbose=False)
        specs = [(0, 0, 0), (0, 1, 0), (1, 0, 1)]
        eng = MultiSpecEvaluator(sl, specs, dtype="dd", mesh=mesh,
                                 bucket_sizes=(64,))
        pts3 = np.random.default_rng(12).uniform(-1, 1, (150, 3))
        got = eng(pts3)
        for m, s in enumerate(specs):
            want = sl.eval_batch(pts3, list(s))
            scale = max(np.abs(want).max(), 1e-3)
            assert np.abs(got[:, m] - want).max() / scale < 1e-10, s

    def test_spline_report_dp_sharded(self):
        from pychebyshev_tpu import ChebyshevSpline
        from pychebyshev_tpu.parallel.sharding import make_mesh
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        mesh = make_mesh(8, axis_names=("dp",))
        sp = ChebyshevSpline(
            lambda x, _: abs(x[0]) ** 3 + math.sin(x[1]), 2,
            [[-1, 1], [-1, 1]], [9, 9], [[0.0], []])
        sp.build(verbose=False)
        specs = [(0, 0), (1, 0)]
        eng = MultiSpecEvaluator(sp, specs, dtype="dd", mesh=mesh,
                                 bucket_sizes=(64,))
        rng = np.random.default_rng(13)
        pts2 = rng.uniform(-0.95, 0.95, (200, 2))
        pts2 = pts2[np.abs(pts2[:, 0]) > 1e-2]
        got = eng(pts2)
        for m, s in enumerate(specs):
            want = sp.vectorized_eval_batch(pts2, list(s))
            scale = np.abs(want).max()
            assert np.abs(got[:, m] - want).max() / scale < 1e-10, s



class TestBeyondBudgetDDEngine:
    """A grid the single-chip digit plan refuses serves through
    BatchedEvaluator(dtype='dd') when the mesh has a tp axis.

    The heavy numerical capability (a real (9, 16400) grid at < 1e-11)
    is pinned at ops level in tests/test_sharding.py::TestDigitGemmTP;
    here a monkeypatched supports_dd exercises the engine ROUTING
    cheaply on a small grid.
    """

    def test_tp_engine_routes_refused_grids_through_dd_tp(
            self, cheb, pts, monkeypatch):
        import pychebyshev_tpu.serving as serving_mod
        from pychebyshev_tpu.ops import eval_dd
        from pychebyshev_tpu.parallel.sharding import make_mesh

        # Pretend the single-chip plan refuses this grid; the tp plan
        # (which the patch does not touch) still accepts it.
        monkeypatch.setattr(eval_dd, "supports_dd", lambda *a: False)
        mesh = make_mesh(8, axis_names=("dp", "tp"), shape=(2, 4))
        eng = BatchedEvaluator(cheb, dtype="dd", mesh=mesh,
                               bucket_sizes=(64,))
        assert eng._dd_tp
        got = eng(pts[:150])
        want = cheb.vectorized_eval_batch(pts[:150], [0, 0, 0])
        scale = np.abs(want).max()
        assert np.abs(got - want).max() / scale < 1e-10

    def test_without_tp_axis_still_rejected(self, cheb, monkeypatch):
        from pychebyshev_tpu.ops import eval_dd
        from pychebyshev_tpu.parallel.sharding import make_mesh
        monkeypatch.setattr(eval_dd, "supports_dd", lambda *a: False)
        mesh = make_mesh(8, axis_names=("dp",))
        with pytest.raises(ValueError, match="tp"):
            BatchedEvaluator(cheb, dtype="dd", mesh=mesh,
                             bucket_sizes=(64,))


class TestDDOutOfDomainFallback:
    """dd engines mirror the class-path contract: a batch containing
    out-of-domain points falls back (whole call) to an f64 sibling —
    the digit planes' exactness bound holds in-domain only."""

    def test_batched_dense_falls_back(self, cheb):
        eng = BatchedEvaluator(cheb, dtype="dd", bucket_sizes=(64,))
        pts = np.random.default_rng(3).uniform(-1, 1, (40, 3))
        pts[7, 1] = 1.5                      # outside [-1, 1]
        got = eng(pts)
        want = cheb.vectorized_eval_batch(pts, [0, 0, 0])
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
        assert eng._dd_fallback is not None

    def test_batched_tt_reordered_frame_check(self, tt):
        # A reordered TT stores its domain in the storage frame; the
        # domain check must permute coordinates the same way.
        rt = tt.reorder([2, 0, 1])
        eng = BatchedEvaluator(rt, dtype="dd", bucket_sizes=(64,))
        pts = np.random.default_rng(4).uniform(-0.9, 0.9, (30, 3))
        got_in = eng(pts)                    # in-domain: dd path
        assert eng._dd_fallback is None
        pts2 = pts.copy()
        pts2[0, 2] = 1.4
        got_out = eng(pts2)
        want = tt.eval_batch(pts2)
        np.testing.assert_allclose(got_out, want, rtol=0, atol=1e-10)
        np.testing.assert_allclose(got_in, tt.eval_batch(pts),
                                   rtol=0, atol=1e-10)

    def test_multispec_falls_back(self, cheb):
        from pychebyshev_tpu.serving import MultiSpecEvaluator
        specs = [(0, 0, 0), (1, 0, 0)]
        eng = MultiSpecEvaluator(cheb, specs, dtype="dd",
                                 bucket_sizes=(64,))
        pts = np.random.default_rng(5).uniform(-1, 1, (25, 3))
        pts[3, 0] = -1.7
        got = eng(pts)
        for m, s in enumerate(specs):
            want = cheb.vectorized_eval_batch(pts, list(s))
            np.testing.assert_allclose(got[:, m], want, rtol=0,
                                       atol=1e-11)

    def test_book_falls_back(self, cheb):
        from pychebyshev_tpu import ChebyshevApproximation
        from pychebyshev_tpu.serving import MultiModelEvaluator
        c2 = ChebyshevApproximation(
            lambda x, _: f3(x, _) * 2.0, 3, [[-1, 1]] * 3, [9] * 3)
        c2.build(verbose=False)
        book = MultiModelEvaluator([cheb, c2], dtype="dd",
                                   bucket_sizes=(64,))
        pts = np.random.default_rng(6).uniform(-1, 1, (20, 3))
        pts[2, 2] = 2.0
        got = book(pts)
        for m, c in enumerate((cheb, c2)):
            want = c.vectorized_eval_batch(pts, [0, 0, 0])
            np.testing.assert_allclose(got[m], want, rtol=0, atol=1e-12)


class TestMeshDDBooks:
    """dd books compose with the mesh: planes replicate, points shard."""

    def test_dense_dd_book_dp_sharded(self, cheb, pts):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        from pychebyshev_tpu.serving import MultiModelEvaluator
        c2 = ChebyshevApproximation(
            lambda x, _: f3(x, _) * 1.5 + 0.2, 3, [[-1, 1]] * 3,
            [9] * 3)
        c2.build(verbose=False)
        mesh = make_mesh(8, axis_names=("dp",))
        book = MultiModelEvaluator([cheb, c2], dtype="dd", mesh=mesh,
                                   bucket_sizes=(256,))
        got = book(pts[:300])
        for m, c in enumerate((cheb, c2)):
            want = c.vectorized_eval_batch(pts[:300], [0, 0, 0])
            scale = np.abs(want).max()
            assert np.abs(got[m] - want).max() / scale < 1e-10

    def test_tt_dd_book_dp_sharded(self, tt, pts):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        from pychebyshev_tpu.serving import MultiModelEvaluator
        mesh = make_mesh(8, axis_names=("dp",))
        book = MultiModelEvaluator([tt], dtype="dd", mesh=mesh,
                                   bucket_sizes=(256,))
        got = book(pts[:300])
        want = tt.eval_batch(pts[:300])
        scale = np.abs(want).max()
        assert np.abs(got[0] - want).max() / scale < 1e-10

    def test_books_build_no_planes_per_call(self, cheb, monkeypatch):
        """Book engines prep planes at init (the engine-owned working
        set discipline, same as the multi-spec engines)."""
        from pychebyshev_tpu.serving import MultiModelEvaluator
        from pychebyshev_tpu.ops import eval_dd
        book = MultiModelEvaluator([cheb], dtype="dd",
                                   bucket_sizes=(64,))
        calls = []
        real = eval_dd._digit_planes_tensor
        monkeypatch.setattr(
            eval_dd, "_digit_planes_tensor",
            lambda *a, **k: calls.append(1) or real(*a, **k))
        p = np.random.default_rng(8).uniform(-1, 1, (50, 3))
        book(p)
        book(p)
        assert calls == []
