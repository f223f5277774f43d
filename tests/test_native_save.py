"""Pickle-free .npz checkpointing across all four interpolant classes."""

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
    return math.sin(x[0]) + math.cos(x[1]) * x[0]


class TestApprox:
    def test_round_trip(self, tmp_path):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [9, 7])
        c.build(verbose=False)
        p = tmp_path / "a.npz"
        c.save(p, format="npz")
        loaded = ChebyshevApproximation.load(p)
        pt = [0.3, 1.2]
        assert loaded.vectorized_eval(pt, [0, 0]) == \
            c.vectorized_eval(pt, [0, 0])
        assert loaded.vectorized_eval(pt, [1, 0]) == \
            c.vectorized_eval(pt, [1, 0])

    def test_no_pickle_in_archive(self, tmp_path):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [5, 5])
        c.build(verbose=False)
        p = tmp_path / "a.npz"
        c.save(p, format="npz")
        # loads cleanly with pickle disabled
        with np.load(p, allow_pickle=False) as data:
            assert str(data["__kind__"]) == "approx"

    def test_unbuilt_raises(self, tmp_path):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [5, 5])
        with pytest.raises(RuntimeError):
            c.save(tmp_path / "a.npz", format="npz")

    def test_bad_format_name(self, tmp_path):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [5, 5])
        c.build(verbose=False)
        with pytest.raises(ValueError, match="npz"):
            c.save(tmp_path / "a.x", format="parquet")

    def test_wrong_class_load(self, tmp_path):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [5, 5])
        c.build(verbose=False)
        p = tmp_path / "a.npz"
        c.save(p, format="npz")
        with pytest.raises(TypeError, match="checkpoint"):
            ChebyshevTT.load(p)


class TestSpline:
    def test_round_trip(self, tmp_path):
        sp = ChebyshevSpline(lambda x, _: abs(x[0]) * (1 + x[1]), 2,
                             [[-1, 1], [-1, 1]], [7, 7], [[0.0], []])
        sp.build(verbose=False)
        p = tmp_path / "s.npz"
        sp.save(p, format="npz")
        loaded = ChebyshevSpline.load(p)
        pts = np.random.default_rng(0).uniform(-1, 1, (50, 2))
        np.testing.assert_array_equal(loaded.eval_batch(pts, [0, 0]),
                                      sp.eval_batch(pts, [0, 0]))

    def test_nested_rejected(self, tmp_path):
        sp = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]],
                             [[5, 9]], [[0.0]])
        sp.build(verbose=False)
        with pytest.raises(NotImplementedError, match="flat n_nodes"):
            sp.save(tmp_path / "s.npz", format="npz")


class TestTT:
    def test_round_trip_with_dim_order(self, tmp_path):
        def f(x, _):
            return math.sin(x[0]) + x[1] * math.cos(x[2])

        tt = ChebyshevTT(f, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6)
        tt.build(verbose=False, seed=0)
        tt = tt.reorder([2, 0, 1])  # nontrivial storage frame
        p = tmp_path / "t.npz"
        tt.save(p, format="npz")
        loaded = ChebyshevTT.load(p)
        pts = np.random.default_rng(1).uniform(-1, 1, (40, 3))
        np.testing.assert_array_equal(loaded.eval_batch(pts),
                                      tt.eval_batch(pts))
        assert loaded.tt_ranks == tt.tt_ranks
        assert loaded._dim_order == tt._dim_order
        assert loaded.total_build_evals == tt.total_build_evals

    def test_algebra_after_load(self, tmp_path):
        def f(x, _):
            return math.sin(x[0]) + math.cos(x[1])

        tt = ChebyshevTT(f, 2, [[-1, 1]] * 2, [9] * 2, max_rank=5)
        tt.build(verbose=False, seed=0)
        p = tmp_path / "t.npz"
        tt.save(p, format="npz")
        loaded = ChebyshevTT.load(p)
        both = loaded + tt
        assert abs(both.eval([0.2, -0.4]) - 2 * tt.eval([0.2, -0.4])) \
            < 1e-10


class TestSlider:
    def test_round_trip(self, tmp_path):
        def f(x, _):
            return math.sin(x[0]) * math.cos(x[1]) + math.exp(-x[2])

        sl = ChebyshevSlider(f, 3, [[-1, 1]] * 3, [9] * 3,
                             [[0, 1], [2]], [0.1, -0.2, 0.3])
        sl.build(verbose=False)
        p = tmp_path / "sl.npz"
        sl.save(p, format="npz")
        loaded = ChebyshevSlider.load(p)
        pts = np.random.default_rng(2).uniform(-1, 1, (30, 3))
        np.testing.assert_array_equal(loaded.eval_batch(pts),
                                      sl.eval_batch(pts))
        pt = [0.2, 0.5, -0.3]
        assert loaded.eval(pt, [0, 0, 1]) == sl.eval(pt, [0, 0, 1])


class TestSniffing:
    def test_pickle_and_npz_both_load(self, tmp_path):
        c = ChebyshevApproximation(f2, 2, [[-1, 1], [0, 2]], [5, 5])
        c.build(verbose=False)
        pk = tmp_path / "a.pkl"
        nz = tmp_path / "a.npz"
        c.save(pk)
        c.save(nz, format="npz")
        v = c.vectorized_eval([0.1, 1.0], [0, 0])
        assert ChebyshevApproximation.load(pk).vectorized_eval(
            [0.1, 1.0], [0, 0]) == v
        assert ChebyshevApproximation.load(nz).vectorized_eval(
            [0.1, 1.0], [0, 0]) == v

    def test_future_version_rejected(self, tmp_path):
        import json
        p = tmp_path / "v.npz"
        np.savez(p, __version__=np.asarray(99),
                 __kind__=np.asarray("approx"),
                 meta=np.asarray(json.dumps({})))
        with pytest.raises(ValueError, match="newer"):
            ChebyshevApproximation.load(p)


class TestEdgeCases:
    def test_1d_approx_round_trip(self, tmp_path):
        c = ChebyshevApproximation(lambda x, _: math.exp(x[0]), 1,
                                   [[-2, 1]], [13])
        c.build(verbose=False)
        p = tmp_path / "one.npz"
        c.save(p, format="npz")
        loaded = ChebyshevApproximation.load(p)
        assert loaded.vectorized_eval([0.4], [0]) == \
            c.vectorized_eval([0.4], [0])
        assert loaded.vectorized_eval([0.4], [1]) == \
            c.vectorized_eval([0.4], [1])

    def test_refined_tt_round_trip(self, tmp_path):
        def f(x, _):
            return math.sin(x[0]) * x[1]

        tt = ChebyshevTT(f, 2, [[-1, 1]] * 2, [9] * 2, max_rank=5)
        tt.build(verbose=False, seed=0, refine_sweeps=2,
                 refine_samples=50)
        p = tmp_path / "r.npz"
        tt.save(p, format="npz")
        loaded = ChebyshevTT.load(p)
        pts = np.random.default_rng(0).uniform(-1, 1, (20, 2))
        np.testing.assert_array_equal(loaded.eval_batch(pts),
                                      tt.eval_batch(pts))


class TestTTCheckpointValidation:
    """Corrupt TT .npz checkpoints fail at load with a clear error,
    like every other family's validating factory path."""

    @pytest.fixture()
    def saved(self, tmp_path):
        import math
        from pychebyshev_tpu import ChebyshevTT
        tt = ChebyshevTT(lambda x, _: math.sin(x[0]) + x[1], 2,
                         [[-1, 1], [0, 2]], [7, 7], max_rank=4)
        tt.build(verbose=False)
        path = tmp_path / "tt.npz"
        tt.save(str(path), format="npz")
        return tt, path

    def _tamper(self, path, tmp_path, **replacements):
        data = dict(np.load(path, allow_pickle=True))
        data.update(replacements)
        out = tmp_path / "bad.npz"
        np.savez(out, **data)
        return out

    def test_clean_roundtrip_still_works(self, saved):
        from pychebyshev_tpu.utils.native_save import read_npz
        tt, path = saved
        back = read_npz(path)
        assert back.eval([0.3, 1.2]) == pytest.approx(
            tt.eval([0.3, 1.2]), abs=1e-12)

    def test_broken_rank_chain_rejected(self, saved, tmp_path):
        from pychebyshev_tpu.utils.native_save import read_npz
        _, path = saved
        bad = self._tamper(path, tmp_path,
                           core_1=np.zeros((9, 7, 1)))  # r_l mismatch
        with pytest.raises(ValueError, match="rank chain|node axis"):
            read_npz(bad)

    def test_nonfinite_core_rejected(self, saved, tmp_path):
        from pychebyshev_tpu.utils.native_save import read_npz
        tt, path = saved
        poisoned = np.asarray(tt._coeff_cores[0]).copy()
        poisoned[0, 3, 0] = np.nan
        bad = self._tamper(path, tmp_path, core_0=poisoned)
        with pytest.raises(ValueError, match="NaN"):
            read_npz(bad)

    def test_wrong_node_axis_rejected(self, saved, tmp_path):
        from pychebyshev_tpu.utils.native_save import read_npz
        _, path = saved
        r = np.asarray(np.load(path, allow_pickle=True)["core_0"]).shape
        bad = self._tamper(path, tmp_path,
                           core_0=np.zeros((1, 5, r[2])))
        with pytest.raises(ValueError, match="node axis"):
            read_npz(bad)
