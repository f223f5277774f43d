"""C host-eval fast path (cpp/hosteval.c via utils/ceval.py).

The C kernel fuses the single-point row build, derivative folds, and
GEMV chain into one call; these tests pin its parity against the NumPy
reference path (the semantic definition) and its fallback discipline.
Skipped wholesale when no C toolchain/library is available — the NumPy
path is the always-available implementation.
"""

import os
import threading

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.utils import ceval


requires_clib = pytest.mark.skipif(
    ceval._get_lib() is None, reason="C hosteval library unavailable")


def _bs_like(p, data=None):
    p = np.asarray(p, dtype=np.float64)
    if p.ndim == 1:
        p = p[None, :]
    return np.exp(-0.1 * p[:, 0]) * np.sin(p).sum(axis=1) + np.cos(
        p.prod(axis=1))


def _numpy_eval(model, point, orders):
    """Force the NumPy path regardless of the C library."""
    h = model._host_arrays()
    saved = h.pop("cpack", None)
    h["cpack"] = None
    try:
        return model._host_single_eval(point, orders)
    finally:
        if saved is None:
            h.pop("cpack", None)
        else:
            h["cpack"] = saved


@pytest.fixture(scope="module")
def model5():
    c = ChebyshevApproximation(_bs_like, 5, [[0.0, 1.0]] * 5, [11] * 5,
                               max_derivative_order=3, vectorized=True)
    c.build(verbose=False)
    return c


@pytest.fixture(scope="module")
def ragged3():
    c = ChebyshevApproximation(_bs_like, 3, [[-1.0, 2.0], [0.5, 3.0],
                                             [0.0, 1.0]], [7, 12, 5],
                               max_derivative_order=2, vectorized=True)
    c.build(verbose=False)
    return c


@requires_clib
class TestParity:
    def test_values_match_numpy_path(self, model5):
        rng = np.random.default_rng(7)
        for _ in range(25):
            pt = rng.uniform(0.02, 0.98, size=5)
            got = model5.vectorized_eval(pt, [0] * 5)
            want = _numpy_eval(model5, pt, (0,) * 5)
            assert got == pytest.approx(want, rel=1e-13, abs=1e-13)

    def test_derivatives_match_numpy_path(self, model5):
        rng = np.random.default_rng(11)
        specs = [(1, 0, 0, 0, 0), (2, 0, 0, 0, 0), (0, 1, 0, 1, 0),
                 (0, 0, 3, 0, 0), (1, 1, 1, 0, 0)]
        for spec in specs:
            pt = rng.uniform(0.05, 0.95, size=5)
            got = model5.vectorized_eval(pt, list(spec))
            want = _numpy_eval(model5, pt, spec)
            assert got == pytest.approx(want, rel=1e-10, abs=1e-10)

    def test_ragged_grid(self, ragged3):
        rng = np.random.default_rng(3)
        for _ in range(10):
            pt = np.array([rng.uniform(-0.9, 1.9), rng.uniform(0.6, 2.9),
                           rng.uniform(0.05, 0.95)])
            got = ragged3.vectorized_eval(pt, [0, 0, 0])
            want = _numpy_eval(ragged3, pt, (0, 0, 0))
            assert got == pytest.approx(want, rel=1e-13, abs=1e-13)
            gotd = ragged3.vectorized_eval(pt, [0, 2, 1])
            wantd = _numpy_eval(ragged3, pt, (0, 2, 1))
            assert gotd == pytest.approx(wantd, rel=1e-10, abs=1e-10)

    def test_exact_node_coincidence_is_exact(self, model5):
        pt = [float(np.asarray(model5.nodes[d])[d + 2]) for d in range(5)]
        got = model5.vectorized_eval(pt, [0] * 5)
        idx = tuple(d + 2 for d in range(5))
        want = float(np.asarray(model5.tensor_values)[idx])
        assert got == want  # bitwise: one-hot row selects the grid value

    def test_near_node_knife_edge(self, model5):
        # Just outside / inside the 1e-14 coincidence window.
        node = float(np.asarray(model5.nodes[0])[4])
        for eps in (5e-15, 2e-14, 1e-12, 1e-9):
            pt = np.array([node + eps, 0.3, 0.4, 0.5, 0.6])
            got = model5.vectorized_eval(pt, [0] * 5)
            want = _numpy_eval(model5, pt, (0,) * 5)
            assert got == pytest.approx(want, rel=1e-12, abs=1e-12)

    def test_multi_matches_numpy_path(self, model5):
        specs = [[0] * 5, [1, 0, 0, 0, 0], [2, 0, 0, 0, 0],
                 [0, 0, 1, 0, 0], [0, 0, 0, 1, 0], [0, 0, 0, 0, 1],
                 [1, 1, 0, 0, 0], [0, 0, 0, 0, 3]]
        pt = [0.31, 0.52, 0.73, 0.21, 0.94]
        got = model5.vectorized_eval_multi(pt, specs)
        h = model5._host_arrays()
        saved = h.pop("cpack")
        h["cpack"] = None
        try:
            want = model5.vectorized_eval_multi(pt, specs)
        finally:
            h["cpack"] = saved
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)

    def test_multi_agrees_with_single(self, model5):
        specs = [[0] * 5, [1, 0, 0, 0, 0], [0, 2, 0, 0, 0]]
        pt = [0.4, 0.6, 0.2, 0.8, 0.5]
        multi = model5.vectorized_eval_multi(pt, specs)
        singles = [model5.vectorized_eval(pt, s) for s in specs]
        np.testing.assert_allclose(multi, singles, rtol=1e-11, atol=1e-11)

    def test_multi_suffix_sharing_at_node(self, ragged3):
        # Exact-node coincidence inside a shared suffix.
        node = float(np.asarray(ragged3.nodes[2])[1])
        pt = np.array([0.1, 1.0, node])
        specs = [[0, 0, 0], [1, 0, 0], [0, 0, 1]]
        got = ragged3.vectorized_eval_multi(pt, specs)
        singles = [ragged3.vectorized_eval(pt, s) for s in specs]
        np.testing.assert_allclose(got, singles, rtol=1e-11, atol=1e-11)

    def test_odd_point_shapes(self, model5):
        pt = np.array([[0.3], [0.5], [0.7], [0.2], [0.9]])  # column vec
        got = model5.vectorized_eval(pt, [0] * 5)
        want = model5.vectorized_eval(pt.ravel(), [0] * 5)
        assert got == want


@requires_clib
class TestLifecycle:
    def test_pack_invalidates_with_tensor_rebind(self, model5):
        c = model5.clone()
        pt = [0.31, 0.52, 0.73, 0.21, 0.94]
        before = c.vectorized_eval(pt, [0] * 5)
        c += model5  # rebinds tensor_values -> host cache must refresh
        after = c.vectorized_eval(pt, [0] * 5)
        assert after == pytest.approx(2.0 * before, rel=1e-13)

    def test_threaded_eval_consistent(self, model5):
        rng = np.random.default_rng(5)
        pts = rng.uniform(0.05, 0.95, size=(64, 5))
        want = [_numpy_eval(model5, p, (0,) * 5) for p in pts]
        got = [None] * len(pts)
        errs = []

        def worker(lo, hi):
            try:
                for i in range(lo, hi):
                    got[i] = model5.vectorized_eval(pts[i], [0] * 5)
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=worker,
                                    args=(i * 16, (i + 1) * 16))
                   for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)

    def test_env_kill_switch(self, monkeypatch):
        # A fresh loader honors PYCHEBYSHEV_TPU_NO_CEVAL.
        monkeypatch.setattr(ceval, "_LIB", None)
        monkeypatch.setattr(ceval, "_LIB_FAILED", False)
        monkeypatch.setenv("PYCHEBYSHEV_TPU_NO_CEVAL", "1")
        assert ceval._get_lib() is None
        monkeypatch.setattr(ceval, "_LIB_FAILED", False)


class TestHostBatch:
    def test_matches_device_batch(self, model5):
        rng = np.random.default_rng(17)
        pts = rng.uniform(0.05, 0.95, size=(32, 5))
        host = model5.eval_batch_host(pts, [0] * 5)
        dev = model5.vectorized_eval_batch(pts, [0] * 5)
        np.testing.assert_allclose(host, dev, rtol=1e-11, atol=1e-12)

    def test_derivative_batch(self, model5):
        rng = np.random.default_rng(19)
        pts = rng.uniform(0.05, 0.95, size=(8, 5))
        host = model5.eval_batch_host(pts, [1, 0, 0, 0, 0])
        singles = [model5.vectorized_eval(p, [1, 0, 0, 0, 0])
                   for p in pts]
        np.testing.assert_allclose(host, singles, rtol=1e-12, atol=1e-12)

    def test_empty_batch(self, model5):
        out = model5.eval_batch_host(np.empty((0, 5)), [0] * 5)
        assert out.shape == (0,)

    def test_bad_shape_raises(self, model5):
        with pytest.raises(ValueError, match=r"\(N, 5\)"):
            model5.eval_batch_host(np.zeros((4, 3)), [0] * 5)

    def test_unbuilt_raises(self):
        c = ChebyshevApproximation(None, 2, [[0.0, 1.0]] * 2,
                                   [5, 5], defer_build=True)
        with pytest.raises(RuntimeError, match="build"):
            c.eval_batch_host(np.zeros((1, 2)), [0, 0])


def _tt_target(p, data=None):
    p = np.asarray(p, dtype=np.float64)
    if p.ndim == 1:
        p = p[None, :]
    return np.exp(-p[:, 0]) * np.sin(p.sum(axis=1))


@pytest.fixture(scope="module")
def tt5():
    from pychebyshev_tpu import ChebyshevTT
    tt = ChebyshevTT(_tt_target, 5, [[0.0, 1.0]] * 5, [11] * 5,
                     max_rank=8, vectorized=True)
    tt.build(verbose=False)
    return tt


def _tt_numpy_eval(tt, pt):
    """Force the NumPy chain by poisoning the pack cache."""
    saved = tt.__dict__.get("_host_cpack_cache")
    tt.__dict__["_host_cpack_cache"] = (tuple(tt._coeff_cores), None)
    try:
        return tt.eval(pt)
    finally:
        if saved is None:
            tt.__dict__.pop("_host_cpack_cache", None)
        else:
            tt.__dict__["_host_cpack_cache"] = saved


@requires_clib
class TestTTKernel:
    def test_values_match_numpy_chain(self, tt5):
        rng = np.random.default_rng(13)
        for _ in range(20):
            pt = rng.uniform(0.02, 0.98, size=5)
            got = tt5.eval(pt)
            want = _tt_numpy_eval(tt5, pt)
            assert got == pytest.approx(want, rel=1e-13, abs=1e-14)

    def test_fd_derivatives_ride_the_kernel(self, tt5):
        pt = [0.31, 0.52, 0.73, 0.21, 0.94]
        got = tt5.eval_multi(pt, [[0] * 5, [1, 0, 0, 0, 0]])
        saved = tt5.__dict__.pop("_host_cpack_cache", None)
        tt5.__dict__["_host_cpack_cache"] = (tuple(tt5._coeff_cores), None)
        try:
            want = tt5.eval_multi(pt, [[0] * 5, [1, 0, 0, 0, 0]])
        finally:
            tt5.__dict__.pop("_host_cpack_cache", None)
            if saved is not None:
                tt5.__dict__["_host_cpack_cache"] = saved
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_reordered_frame_parity(self, tt5):
        pt = [0.4, 0.6, 0.2, 0.8, 0.5]
        want = tt5.eval(pt)
        got = tt5.reorder([4, 3, 2, 1, 0]).eval(pt)
        assert got == pytest.approx(want, rel=1e-12)

    def test_algebra_invalidates_pack(self, tt5):
        pt = [0.3, 0.5, 0.7, 0.2, 0.9]
        before = tt5.eval(pt)
        doubled = tt5 + tt5
        assert doubled.eval(pt) == pytest.approx(2.0 * before, rel=1e-9)
        assert tt5.eval(pt) == pytest.approx(before, rel=1e-13)

    def test_pickle_round_trip_with_pack_cache(self, tt5):
        import pickle
        pt = [0.3, 0.5, 0.7, 0.2, 0.9]
        want = tt5.eval(pt)  # materializes the ctypes pack cache
        clone = pickle.loads(pickle.dumps(tt5))
        assert clone.eval(pt) == pytest.approx(want, rel=1e-13)

    def test_pack_rejects_broken_bond_chain(self):
        """The pack validates core shapes before handing pointers to C
        (a mismatched bond would make the kernel read out of bounds)."""
        lib = ceval._get_lib()
        rng = np.random.default_rng(0)
        good = [rng.normal(size=(1, 4, 3)), rng.normal(size=(3, 4, 1))]
        dom = np.array([[0.0, 1.0]] * 2)
        assert ceval._TTPack(lib, good, dom) is not None
        bad_bond = [rng.normal(size=(1, 4, 3)), rng.normal(size=(2, 4, 1))]
        with pytest.raises(ValueError, match="bond"):
            ceval._TTPack(lib, bad_bond, dom)
        with pytest.raises(ValueError, match="3-D"):
            ceval._TTPack(lib, [rng.normal(size=(4, 3))], dom[:1])


class TestFallback:
    def test_numpy_path_serves_without_clib(self, model5, monkeypatch):
        """With the C library force-disabled the public surface still
        answers (the NumPy fallback is the semantic definition)."""
        h = model5._host_arrays()
        monkeypatch.setitem(h, "cpack", None)
        pt = [0.3, 0.5, 0.7, 0.2, 0.9]
        v = model5.vectorized_eval(pt, [0] * 5)
        assert np.isfinite(v)

    def test_degenerate_orders_length_guard(self, model5):
        with pytest.raises(ValueError):
            model5.vectorized_eval([0.3, 0.5, 0.7, 0.2, 0.9], [0] * 4)


class TestBuildFallbackPaths:
    def test_try_build_compiles_fresh(self, monkeypatch, tmp_path):
        """The cc fallback really compiles hosteval.c into the cache dir."""
        import shutil
        import tempfile
        from pychebyshev_tpu.utils import ceval
        if ceval._source_path() is None or not any(
                shutil.which(cc) for cc in ("cc", "gcc", "clang")):
            pytest.skip("no C toolchain/source on this host")
        monkeypatch.setattr(tempfile, "gettempdir", lambda: str(tmp_path))
        out = ceval._try_build()
        assert out is not None and os.path.exists(out)
        # Second call hits the mtime-fresh cache branch.
        assert ceval._try_build() == out

    def test_try_build_without_source(self, monkeypatch):
        from pychebyshev_tpu.utils import ceval
        monkeypatch.setattr(ceval, "_source_path", lambda: None)
        assert ceval._try_build() is None

    def test_loader_marks_failed_when_nothing_found(self, monkeypatch):
        from pychebyshev_tpu.utils import ceval
        monkeypatch.setattr(ceval, "_LIB", None)
        monkeypatch.setattr(ceval, "_LIB_FAILED", False)
        monkeypatch.setattr(ceval, "_candidate_dirs", lambda: [])
        monkeypatch.setattr(ceval, "_try_build", lambda: None)
        monkeypatch.delenv("PYCHEBYSHEV_TPU_NO_CEVAL", raising=False)
        assert ceval._get_lib() is None
        assert ceval._LIB_FAILED
