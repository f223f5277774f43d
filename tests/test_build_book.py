"""build_book: M same-grid dense models from one vectorized call.

The build-side counterpart of MultiModelEvaluator (no reference
counterpart; reference builds loop per model, barycentric.py:647-715).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.serving import MultiModelEvaluator, build_book

DOMAIN = [[0.5, 2.0], [-1.0, 1.0], [0.1, 0.9]]
N_NODES = [9, 8, 7]
COEFFS = np.array([0.7, 1.3, 2.1, -0.4])


def _model_value(points, c):
    x, y, z = points[:, 0], points[:, 1], points[:, 2]
    return np.sin(c * x) + c * y * y + np.exp(-c * z)


def _book_fn_np(points, _=None):
    points = np.asarray(points)
    return np.column_stack([_model_value(points, c) for c in COEFFS])


def _book_fn_jax(points, _=None):
    p = jnp.asarray(points)
    x, y, z = p[:, 0], p[:, 1], p[:, 2]
    cols = [jnp.sin(c * x) + c * y * y + jnp.exp(-c * z) for c in COEFFS]
    return jnp.stack(cols, axis=1)


def _single_fn(c):
    def f(points, _=None):
        return _model_value(np.asarray(points), c)
    return f


@pytest.fixture(scope="module")
def book():
    return build_book(_book_fn_np, 3, DOMAIN, N_NODES)


class TestBuildBook:
    def test_returns_built_models(self, book):
        assert len(book) == len(COEFFS)
        for m in book:
            assert isinstance(m, ChebyshevApproximation)
            assert m.is_construction_finished()
            assert m.n_evaluations == int(np.prod(N_NODES))
            assert m.build_time > 0.0

    def test_bit_equal_to_individual_builds(self, book):
        for m, c in zip(book, COEFFS):
            solo = ChebyshevApproximation(_single_fn(c), 3, DOMAIN,
                                          N_NODES, vectorized=True)
            solo.build(verbose=False)
            np.testing.assert_array_equal(
                np.asarray(m.tensor_values), np.asarray(solo.tensor_values))

    def test_models_share_grid_arrays(self, book):
        first = book[0]
        for m in book[1:]:
            for d in range(3):
                assert m.nodes[d] is first.nodes[d]
                assert m.weights[d] is first.weights[d]
                assert m.diff_matrices[d] is first.diff_matrices[d]

    def test_single_point_eval_matches_truth(self, book):
        pt = [1.2, 0.3, 0.5]
        for m, c in zip(book, COEFFS):
            truth = float(_model_value(np.asarray([pt]), c)[0])
            assert m.vectorized_eval(pt, [0, 0, 0]) == pytest.approx(truth, abs=1e-6)

    def test_device_oracle_builds_on_device(self):
        dev_book = build_book(_book_fn_jax, 3, DOMAIN, N_NODES)
        host_book = build_book(_book_fn_np, 3, DOMAIN, N_NODES)
        for dm, hm in zip(dev_book, host_book):
            np.testing.assert_allclose(
                np.asarray(dm.tensor_values),
                np.asarray(hm.tensor_values), rtol=0, atol=1e-13)

    def test_book_serves_through_multi_model_evaluator(self, book):
        engine = MultiModelEvaluator(book, dtype=jnp.float64,
                                     bucket_sizes=(64,))
        rng = np.random.default_rng(7)
        lo = np.array([b[0] for b in DOMAIN])
        hi = np.array([b[1] for b in DOMAIN])
        pts = lo + (hi - lo) * rng.random((40, 3))
        out = engine(pts)
        assert out.shape == (len(COEFFS), 40)
        for i, m in enumerate(book):
            expected = m.eval_batch_host(pts, [0, 0, 0])
            np.testing.assert_allclose(out[i], expected, rtol=0, atol=1e-12)

    def test_full_surface_works_on_book_members(self, book):
        m = book[1]
        est = m.error_estimate()
        assert np.isfinite(est)
        total = m.integrate()
        assert np.isfinite(total)
        sliced = m.slice([[0, 1.0]])
        assert sliced.num_dimensions == 2
        both = book[0] + book[1]
        pt = [1.0, 0.0, 0.4]
        assert both.vectorized_eval(pt, [0, 0, 0]) == pytest.approx(
            book[0].vectorized_eval(pt, [0, 0, 0]) + book[1].vectorized_eval(pt, [0, 0, 0]),
            abs=1e-12)

    def test_num_models_validated(self):
        with pytest.raises(ValueError, match="expected num_models"):
            build_book(_book_fn_np, 3, DOMAIN, N_NODES, num_models=7)
        ok = build_book(_book_fn_np, 3, DOMAIN, N_NODES,
                        num_models=len(COEFFS))
        assert len(ok) == len(COEFFS)

    def test_wrong_output_shape_rejected(self):
        def flat(points, _=None):
            return _model_value(np.asarray(points), 1.0)

        with pytest.raises(ValueError, match=r"\(G, M\)"):
            build_book(flat, 3, DOMAIN, N_NODES)

        def wrong_rows(points, _=None):
            return _book_fn_np(points)[:-1]

        with pytest.raises(ValueError, match=r"\(G, M\)"):
            build_book(wrong_rows, 3, DOMAIN, N_NODES)

    def test_nan_column_named(self):
        def poisoned(points, _=None):
            out = _book_fn_np(points)
            out[0, 2] = np.nan
            return out

        with pytest.raises(ValueError, match=r"column\(s\) \[2\]"):
            build_book(poisoned, 3, DOMAIN, N_NODES)

    def test_auto_n_rejected(self):
        with pytest.raises(ValueError, match="explicit positive int"):
            build_book(_book_fn_np, 3, DOMAIN, None)
        with pytest.raises(ValueError, match="explicit positive int"):
            build_book(_book_fn_np, 3, DOMAIN, [5, None, 4])

    def test_bad_num_models_rejected(self):
        with pytest.raises(ValueError, match="num_models must be >= 1"):
            build_book(_book_fn_np, 3, DOMAIN, N_NODES, num_models=0)

    def test_caller_mutation_cannot_corrupt_book(self):
        store = {}

        def capture(points, _=None):
            out = _book_fn_np(points)
            store["out"] = out
            return out

        book = build_book(capture, 3, DOMAIN, N_NODES)
        before = np.asarray(book[0].tensor_values).copy()
        store["out"][:] = -999.0
        np.testing.assert_array_equal(
            np.asarray(book[0].tensor_values), before)
        # host single-point cache must match the immutable tensor too
        pt = [1.2, 0.3, 0.5]
        truth = float(_model_value(np.asarray([pt]), COEFFS[0])[0])
        assert book[0].vectorized_eval(pt, [0, 0, 0]) == pytest.approx(truth, abs=1e-6)

    def test_pcb_round_trip_of_member(self, book, tmp_path):
        path = tmp_path / "member.pcb"
        book[2].save(path, format="binary")
        loaded = ChebyshevApproximation.load(path)
        pt = [0.8, -0.5, 0.7]
        assert loaded.vectorized_eval(pt, [0, 0, 0]) == pytest.approx(
            book[2].vectorized_eval(pt, [0, 0, 0]), abs=1e-14)


class TestBookCheckpoint:
    def test_round_trip(self, book, tmp_path):
        from pychebyshev_tpu.serving import load_book, save_book
        path = tmp_path / "book.npz"
        save_book(path, book)
        loaded = load_book(path)
        assert len(loaded) == len(book)
        for a, b in zip(loaded, book):
            np.testing.assert_array_equal(
                np.asarray(a.tensor_values), np.asarray(b.tensor_values))
            assert list(a.n_nodes) == list(b.n_nodes)
        # grid arrays shared across loaded members
        for m in loaded[1:]:
            assert m.nodes[0] is loaded[0].nodes[0]
            assert m.weights[0] is loaded[0].weights[0]
        # loaded book serves
        engine = MultiModelEvaluator(loaded, dtype=jnp.float64,
                                     bucket_sizes=(32,))
        pt = np.array([[1.2, 0.3, 0.5]])
        out = engine(pt)
        for i, m in enumerate(book):
            assert out[i, 0] == pytest.approx(
                m.vectorized_eval([1.2, 0.3, 0.5], [0, 0, 0]), abs=1e-12)

    def test_mixed_grid_rejected(self, book, tmp_path):
        from pychebyshev_tpu.serving import save_book
        other = ChebyshevApproximation(_single_fn(1.0), 3, DOMAIN,
                                       [4, 4, 4], vectorized=True)
        other.build(verbose=False)
        with pytest.raises(ValueError, match="shares one grid"):
            save_book(tmp_path / "x.npz", book + [other])

    def test_unbuilt_and_wrong_type_rejected(self, tmp_path):
        from pychebyshev_tpu.serving import save_book
        stub = ChebyshevApproximation(_single_fn(1.0), 3, DOMAIN, N_NODES)
        with pytest.raises(RuntimeError, match="unbuilt"):
            save_book(tmp_path / "x.npz", [stub])
        with pytest.raises(ValueError, match="non-empty"):
            save_book(tmp_path / "x.npz", [])
        with pytest.raises(TypeError, match="dense"):
            save_book(tmp_path / "x.npz", [object()])

    def test_single_model_npz_not_a_book(self, book, tmp_path):
        from pychebyshev_tpu.serving import load_book
        path = tmp_path / "single.npz"
        book[0].save(path, format="npz")
        with pytest.raises(ValueError, match="not a book checkpoint"):
            load_book(path)

    def test_corrupt_meta_rejected(self, book, tmp_path):
        from pychebyshev_tpu.serving import load_book, save_book
        import json
        path = tmp_path / "book.npz"
        save_book(path, book)
        with np.load(path, allow_pickle=False) as data:
            entries = {k: data[k] for k in data.files}
        meta = json.loads(str(entries["meta"]))
        meta["num_models"] = 99
        entries["meta"] = np.asarray(json.dumps(meta))
        bad = tmp_path / "bad.npz"
        with open(bad, "wb") as f:
            np.savez(f, **entries)
        with pytest.raises(ValueError, match="does not match"):
            load_book(bad)


class TestBuildBookMesh:
    def _mesh(self, n=8):
        from pychebyshev_tpu.parallel.sharding import make_mesh
        return make_mesh(n)

    def test_sharded_build_matches_unsharded(self):
        # G = 9*8*7 = 504 divides 8; also run a non-divisible grid.
        mesh = self._mesh()
        sharded = build_book(_book_fn_jax, 3, DOMAIN, N_NODES, mesh=mesh)
        plain = build_book(_book_fn_jax, 3, DOMAIN, N_NODES)
        for a, b in zip(sharded, plain):
            np.testing.assert_allclose(
                np.asarray(a.tensor_values),
                np.asarray(b.tensor_values), rtol=0, atol=1e-14)

    def test_sharded_uneven_grid(self):
        mesh = self._mesh()
        nn = [5, 7, 3]        # G = 105, not divisible by 8
        sharded = build_book(_book_fn_jax, 3, DOMAIN, nn, mesh=mesh)
        plain = build_book(_book_fn_jax, 3, DOMAIN, nn)
        for a, b in zip(sharded, plain):
            np.testing.assert_allclose(
                np.asarray(a.tensor_values),
                np.asarray(b.tensor_values), rtol=0, atol=1e-14)

    def test_numpy_oracle_with_mesh_raises_clearly(self):
        mesh = self._mesh()
        with pytest.raises(ValueError, match="JAX-traceable"):
            build_book(_book_fn_np, 3, DOMAIN, N_NODES, mesh=mesh)


def test_typed_helpers_accepted():
    from pychebyshev_tpu import Domain, Ns
    book = build_book(_book_fn_np, 3, Domain(DOMAIN), Ns(N_NODES))
    plain = build_book(_book_fn_np, 3, DOMAIN, N_NODES)
    for a, b in zip(book, plain):
        np.testing.assert_array_equal(
            np.asarray(a.tensor_values), np.asarray(b.tensor_values))
