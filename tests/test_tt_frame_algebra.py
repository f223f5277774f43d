"""TT dim-order threading through swaps, algebra, and the points frame.

Native coverage of the reference's dim-threading suite (reference
tests/test_v0201_dim_threading.py): the adjacent-swap primitive, unary
and binary algebra under non-canonical storage orders, eval_multi
immutability, and get_evaluation_points frame round trips.  The broader
per-method frame invariance lives in tests/test_tt_dim_order.py.
"""

import math
import pickle

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevTT
from pychebyshev_tpu.models.tt_algorithms import tt_swap_adjacent


def trig3(x, _):
    return math.sin(x[0]) + 2.0 * x[1] * x[2] + 0.3 * math.cos(x[2])


DOM3 = [[-1.0, 1.0], [0.0, 2.0], [-0.5, 0.5]]


@pytest.fixture(scope="module")
def canonical():
    tt = ChebyshevTT(trig3, 3, DOM3, [7, 6, 5], max_rank=5)
    tt.build(verbose=False)
    return tt


@pytest.fixture(scope="module")
def permuted(canonical):
    return canonical.reorder([2, 0, 1])


def _probe_points():
    rng = np.random.default_rng(7)
    lo = np.array([b[0] for b in DOM3])
    hi = np.array([b[1] for b in DOM3])
    return lo + (hi - lo) * rng.uniform(0.05, 0.95, size=(6, 3))


class TestSwapPrimitive:
    def test_swap_keeps_the_represented_tensor(self, canonical):
        cores = [np.asarray(c) for c in canonical._coeff_cores]
        swapped = tt_swap_adjacent(cores, 0, max_rank=16)
        # Contract both chains to dense and compare with axes swapped.
        def dense(cs):
            out = cs[0]
            for c in cs[1:]:
                out = np.tensordot(out, c, axes=([-1], [0]))
            return out.squeeze(axis=(0, -1))
        np.testing.assert_allclose(
            dense(swapped), np.swapaxes(dense(cores), 0, 1), atol=1e-10)

    def test_swap_does_not_mutate_input(self, canonical):
        cores = [np.asarray(c).copy() for c in canonical._coeff_cores]
        before = [c.copy() for c in cores]
        tt_swap_adjacent(cores, 1, max_rank=16)
        for a, b in zip(cores, before):
            np.testing.assert_array_equal(a, b)

    @pytest.mark.parametrize("bad", [-1, 2, 5])
    def test_swap_index_bounds(self, canonical, bad):
        cores = [np.asarray(c) for c in canonical._coeff_cores]
        with pytest.raises(ValueError, match="out of range"):
            tt_swap_adjacent(cores, bad, max_rank=16)


class TestReorderIdentitySemantics:
    def test_same_order_returns_a_distinct_object(self, canonical):
        again = canonical.reorder([0, 1, 2])
        assert again is not canonical
        for p in _probe_points():
            assert again.eval(list(p)) == pytest.approx(
                canonical.eval(list(p)), abs=1e-12)

    def test_bad_permutations_rejected(self, canonical):
        for bad in ([0, 1], [0, 1, 1], [0, 1, 3]):
            with pytest.raises(ValueError):
                canonical.reorder(bad)


class TestUnaryAlgebraKeepsTheFrame:
    def test_negation(self, permuted):
        flipped = -permuted
        assert flipped.dim_order == permuted.dim_order
        p = list(_probe_points()[0])
        assert flipped.eval(p) == pytest.approx(
            -permuted.eval(p), abs=1e-12)

    def test_scalar_scaling_both_sides(self, permuted):
        assert (permuted * 2.0).dim_order == permuted.dim_order
        assert (3.0 * permuted).dim_order == permuted.dim_order
        assert (permuted / 2.0).dim_order == permuted.dim_order

    def test_inplace_scaling(self, canonical):
        work = canonical.reorder([1, 2, 0])
        frame = list(work.dim_order)
        work *= 1.5
        assert work.dim_order == frame
        work /= 1.5
        assert work.dim_order == frame
        p = list(_probe_points()[1])
        assert work.eval(p) == pytest.approx(
            canonical.eval(p), abs=1e-10)


class TestBinaryAlgebraFrameRules:
    def test_matching_noncanonical_frames_add(self, canonical, permuted):
        other = canonical.reorder([2, 0, 1])
        total = permuted + other
        p = list(_probe_points()[2])
        assert total.eval(p) == pytest.approx(
            2.0 * canonical.eval(p), abs=1e-10)

    def test_mismatched_frames_raise_with_reorder_hint(self, canonical,
                                                       permuted):
        with pytest.raises(ValueError, match="reorder"):
            canonical + permuted
        with pytest.raises(ValueError, match="reorder"):
            canonical - permuted

    def test_realignment_unblocks_the_sum(self, canonical, permuted):
        aligned = permuted.reorder([0, 1, 2])
        total = canonical + aligned
        p = list(_probe_points()[3])
        assert total.eval(p) == pytest.approx(
            2.0 * canonical.eval(p), abs=1e-10)


class TestEvalMultiFrameDiscipline:
    def test_multi_specs_match_under_permutation(self, canonical, permuted):
        p = list(_probe_points()[4])
        specs = [[0, 0, 0], [1, 0, 0], [0, 0, 2], [1, 1, 0]]
        for spec in specs:
            a = canonical.eval_multi(p, [spec])[0]
            b = permuted.eval_multi(p, [spec])[0]
            assert b == pytest.approx(a, rel=1e-6, abs=1e-8)

    def test_eval_multi_leaves_dim_order_alone(self, permuted):
        frame = list(permuted.dim_order)
        permuted.eval_multi(list(_probe_points()[5]),
                            [[0, 0, 0], [0, 1, 0]])
        assert permuted.dim_order == frame


class TestEvaluationPointsFrame:
    def test_columns_live_in_the_user_frame(self, permuted):
        pts = np.asarray(permuted.get_evaluation_points())
        assert pts.shape[1] == 3
        for d, (lo, hi) in enumerate(DOM3):
            col = pts[:, d]
            assert col.min() >= lo - 1e-12 and col.max() <= hi + 1e-12
            # Every user-frame column must span its own domain width.
            assert col.max() - col.min() > 0.5 * (hi - lo)

    def test_extrude_at_the_front_position(self, canonical):
        fat = canonical.extrude((0, (-2.0, 2.0), 4))
        p = list(_probe_points()[0])
        assert fat.eval([1.3] + p) == pytest.approx(
            canonical.eval(p), abs=1e-10)

    def test_pcb_format_refused_for_tt(self, canonical, tmp_path):
        with pytest.raises(ValueError, match="pickle"):
            canonical.save(tmp_path / "tt.pcb", format="pcb")


class TestMultiSpecValidationOrder:
    def test_short_spec_on_permuted_tt_raises_value_error(self, permuted):
        pts = _probe_points()[:3]
        with pytest.raises(ValueError, match="length"):
            permuted.vectorized_eval_batch_multi(pts, [[1, 0]])

    def test_empty_spec_list_returns_n_by_zero(self, permuted):
        out = permuted.vectorized_eval_batch_multi(_probe_points()[:4], [])
        assert np.asarray(out).shape == (4, 0)
