"""TT layout helpers, from_values metadata, and transform edge validation.

Native coverage of the reference's v0.18 TT-parity suite (reference
tests/test_v018_tt_parity.py): the static ``nodes`` layout, the
``from_values`` metadata contract, ``to_dense`` shape/value checks,
extrude/slice validation + descriptor threading, algebra metadata, and
cross-feature chains.  Numerical accuracy of the same methods lives in
tests/test_tensor_train.py.
"""

import math
import pickle

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevTT


def ridge(x, _):
    return math.sin(x[0]) * (1.0 + 0.5 * x[1]) + x[2] ** 2


DOM3 = [[-1.0, 1.0], [0.0, 2.0], [-0.5, 0.5]]
N3 = [7, 6, 5]


@pytest.fixture(scope="module")
def built():
    tt = ChebyshevTT(ridge, 3, DOM3, N3, max_rank=6)
    tt.build(verbose=False)
    return tt


def _dense_tensor():
    layout = ChebyshevTT.nodes(3, DOM3, N3)
    axes = layout["nodes_per_dim"]
    g0, g1, g2 = np.meshgrid(*axes, indexing="ij")
    return np.sin(g0) * (1.0 + 0.5 * g1) + g2 ** 2


class TestNodesLayout:
    def test_static_call_needs_no_instance(self):
        layout = ChebyshevTT.nodes(2, [[-1, 1], [0, 1]], [5, 4])
        assert set(layout) == {"nodes_per_dim"}

    def test_per_dim_counts_and_bounds(self):
        layout = ChebyshevTT.nodes(3, DOM3, N3)
        axes = layout["nodes_per_dim"]
        assert [len(a) for a in axes] == N3
        for a, (lo, hi) in zip(axes, DOM3):
            assert a.min() >= lo - 1e-12 and a.max() <= hi + 1e-12

    def test_matches_the_dense_family_grid(self):
        tt_axes = ChebyshevTT.nodes(2, [[-1, 1], [0, 2]],
                                    [7, 5])["nodes_per_dim"]
        dense = ChebyshevApproximation.nodes(2, [[-1, 1], [0, 2]], [7, 5])
        for a, b in zip(tt_axes, dense["nodes_per_dim"]):
            np.testing.assert_allclose(a, b, atol=1e-14)

    def test_length_mismatch_rejected(self):
        with pytest.raises(ValueError, match="length"):
            ChebyshevTT.nodes(3, DOM3, [7, 6])


class TestFromValuesMetadata:
    def test_constant_tensor_is_exact(self):
        tt = ChebyshevTT.from_values(
            np.full(tuple(N3), 4.25), 3, DOM3, N3)
        for p in ([0.3, 1.7, -0.2], [-0.9, 0.1, 0.45]):
            assert tt.eval(p) == pytest.approx(4.25, abs=1e-12)

    def test_shape_mismatch_rejected(self):
        with pytest.raises(ValueError, match="shape"):
            ChebyshevTT.from_values(np.zeros((7, 6, 4)), 3, DOM3, N3)

    def test_nonfinite_tensor_rejected(self):
        bad = np.zeros(tuple(N3))
        bad[2, 3, 1] = np.inf
        with pytest.raises(ValueError, match="finite"):
            ChebyshevTT.from_values(bad, 3, DOM3, N3)

    def test_rank_cap_is_enforced(self):
        tt = ChebyshevTT.from_values(_dense_tensor(), 3, DOM3, N3,
                                     max_rank=2)
        assert max(tt.tt_ranks) <= 2

    def test_descriptor_defaults_empty_and_threads(self):
        plain = ChebyshevTT.from_values(_dense_tensor(), 3, DOM3, N3)
        assert plain.get_descriptor() == ""
        tagged = ChebyshevTT.from_values(
            _dense_tensor(), 3, DOM3, N3, descriptor="ridge-tensor")
        assert tagged.get_descriptor() == "ridge-tensor"

    def test_additional_data_kwarg_is_stored(self):
        tt = ChebyshevTT.from_values(
            _dense_tensor(), 3, DOM3, N3, additional_data={"tag": 9})
        assert tt.additional_data == {"tag": 9}

    def test_no_function_bound_afterwards(self, built):
        tt = ChebyshevTT.from_values(_dense_tensor(), 3, DOM3, N3)
        assert tt.function is None
        p = [0.3, 1.2, 0.1]
        assert tt.eval(p) == pytest.approx(built.eval(p), abs=1e-6)


class TestToDenseContract:
    def test_shape_and_type(self, built):
        dense = built.to_dense()
        assert isinstance(dense, np.ndarray)
        assert dense.shape == tuple(N3)

    def test_values_agree_with_eval_at_grid_nodes(self, built):
        dense = built.to_dense()
        axes = ChebyshevTT.nodes(3, DOM3, N3)["nodes_per_dim"]
        for idx in [(0, 0, 0), (3, 2, 4), (6, 5, 0)]:
            p = [float(axes[d][idx[d]]) for d in range(3)]
            assert dense[idx] == pytest.approx(built.eval(p), abs=1e-9)

    def test_round_trips_through_from_values(self, built):
        again = ChebyshevTT.from_values(built.to_dense(), 3, DOM3, N3)
        for p in ([0.3, 1.2, 0.1], [-0.7, 0.4, -0.4]):
            assert again.eval(p) == pytest.approx(built.eval(p), abs=1e-8)


class TestTransformValidation:
    def test_extrude_position_out_of_range(self, built):
        for bad in (-1, 4):
            with pytest.raises(ValueError):
                built.extrude((bad, (-1.0, 1.0), 4))

    def test_extrude_keeps_the_descriptor(self, built):
        tagged = built.clone()
        tagged.set_descriptor("ridge")
        fat = tagged.extrude((3, (-1.0, 1.0), 4))
        assert fat.get_descriptor() == "ridge"

    def test_extrude_then_integrate_scales_by_new_width(self, built):
        fat = built.extrude((3, (-2.0, 2.0), 4))
        assert fat.integrate() == pytest.approx(
            4.0 * built.integrate(), rel=1e-9)

    def test_slice_keeps_the_descriptor(self, built):
        tagged = built.clone()
        tagged.set_descriptor("ridge")
        thin = tagged.slice((1, 0.75))
        assert thin.get_descriptor() == "ridge"

    def test_slice_value_outside_domain_rejected(self, built):
        with pytest.raises(ValueError):
            built.slice((1, 2.5))

    def test_slice_at_both_endpoints(self, built):
        for edge in (0.0, 2.0):
            thin = built.slice((1, edge))
            p = [0.3, 0.1]
            assert thin.eval(p) == pytest.approx(
                built.eval([p[0], edge, p[1]]), abs=1e-9)


class TestAlgebraMetadata:
    def test_sum_has_no_function(self, built):
        total = built + built
        assert total.function is None

    def test_chained_sums_respect_the_rank_cap(self, built):
        acc = built
        for _ in range(4):
            acc = acc + built
        assert max(acc.tt_ranks) <= built.max_rank
        p = [0.3, 1.2, 0.1]
        assert acc.eval(p) == pytest.approx(5.0 * built.eval(p), abs=1e-6)

    def test_domain_mismatch_rejected(self, built):
        other = ChebyshevTT(ridge, 3, [[-1, 1], [0, 2], [-0.6, 0.6]], N3,
                            max_rank=6)
        other.build(verbose=False)
        with pytest.raises(ValueError, match="domain"):
            built + other


class TestCrossFeatureChains:
    def test_algebra_then_integrate(self, built):
        assert (built + built).integrate() == pytest.approx(
            2.0 * built.integrate(), rel=1e-8)

    def test_clone_of_an_algebra_result(self, built):
        twin = (built * 3.0).clone()
        p = [0.5, 0.9, -0.3]
        assert twin.eval(p) == pytest.approx(3.0 * built.eval(p), abs=1e-9)

    def test_extrude_then_evaluation_points(self, built):
        fat = built.extrude((3, (-1.0, 1.0), 4))
        pts = np.asarray(fat.get_evaluation_points())
        assert pts.shape == (7 * 6 * 5 * 4, 4)

    def test_slice_then_to_dense(self, built):
        thin = built.slice((2, 0.0))
        assert thin.to_dense().shape == (7, 6)

    def test_pickle_of_an_algebra_result(self, built):
        half = built / 2.0
        back = pickle.loads(pickle.dumps(half))
        p = [0.4, 1.5, 0.2]
        assert back.eval(p) == pytest.approx(half.eval(p), abs=1e-12)


class TestDeviceCoreCache:
    def test_cache_hits_and_invalidate_on_core_replacement(self, built):
        work = built.clone()
        work.__dict__.pop("_dev_cores", None)
        a = work._cores_on_device(np.float64)
        b = work._cores_on_device(np.float64)
        assert all(x is y for x, y in zip(a, b))  # steady-state hit
        p = [0.3, 1.2, 0.1]
        before = work.eval(p)
        work.orth_left(work.num_dimensions - 1)  # replaces cores -> ids change
        c = work._cores_on_device(np.float64)
        assert any(x is not y for x, y in zip(b, c))
        assert work.eval(p) == pytest.approx(before, abs=1e-10)

    def test_eval_batch_after_orth_uses_fresh_cores(self, built):
        work = built.clone()
        pts = np.array([[0.3, 1.2, 0.1], [-0.5, 0.4, -0.3]])
        want = work.eval_batch(pts)
        work.orth_right(0)
        np.testing.assert_allclose(work.eval_batch(pts), want,
                                   atol=1e-10)

    def test_pickle_excludes_the_device_cache(self, built):
        work = built.clone()
        work.eval_batch(np.array([[0.3, 1.2, 0.1]]))
        assert "_dev_cores" in work.__dict__
        state = work.__getstate__()
        assert "_dev_cores" not in state
        back = pickle.loads(pickle.dumps(work))
        assert "_dev_cores" not in back.__dict__
        assert back.eval([0.3, 1.2, 0.1]) == pytest.approx(
            work.eval([0.3, 1.2, 0.1]), abs=1e-12)
