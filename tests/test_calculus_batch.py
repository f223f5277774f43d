"""Batched scenario calculus (`roots_batch` / `minimize_batch` /
`maximize_batch`) on all four families.

Beyond-reference surface (the reference solves one scenario per
``roots``/``minimize``/``maximize`` call — reference
``barycentric.py:2277-2427``).  Contract: per-row agreement with the
per-call path (roots exactly — the stacked colleague eigensolve runs
the same LAPACK routine per matrix; extremum VALUES exactly, locations
up to ties), plus analytic parity and validation semantics.
"""

import numpy as np
import pytest

from pychebyshev_tpu import (
    ChebyshevApproximation,
    ChebyshevSlider,
    ChebyshevSpline,
    ChebyshevTT,
)

DOM = [(-2.0, 2.0), (0.0, 1.0), (0.0, 1.0)]
B = 9


def _f(p, _=None):
    # Roots along dim 0 at +-sqrt(0.5 + 0.3 x1 + 0.2 x2).
    return p[0] ** 2 - (0.5 + 0.3 * p[1] + 0.2 * p[2])


@pytest.fixture(scope="module")
def scenarios():
    rng = np.random.default_rng(0)
    return rng.uniform(0, 1, B), rng.uniform(0, 1, B)


@pytest.fixture(scope="module")
def dense(scenarios):
    ch = ChebyshevApproximation(_f, 3, DOM, [9, 7, 7])
    ch.build(verbose=False)
    return ch


def _eval_at(model, x0, x1, x2):
    pts = np.array([[x0, x1, x2]])
    try:
        return float(np.asarray(model.eval_batch(pts, [0, 0, 0]))[0])
    except TypeError:
        return float(np.asarray(model.eval_batch(pts))[0])


def _check_family(model, fx1, fx2, tol=1e-9):
    batch_roots = model.roots_batch(dim=0, fixed={1: fx1, 2: fx2})
    assert len(batch_roots) == B
    for b in range(B):
        per = model.roots(dim=0, fixed={1: fx1[b], 2: fx2[b]})
        assert len(batch_roots[b]) == len(per)
        if len(per):
            assert np.abs(batch_roots[b] - per).max() < tol
    for mode in ("minimize", "maximize"):
        vals, locs = getattr(model, mode + "_batch")(
            dim=0, fixed={1: fx1, 2: fx2})
        assert vals.shape == (B,) and locs.shape == (B,)
        for b in range(B):
            per_val, _ = getattr(model, mode)(
                dim=0, fixed={1: fx1[b], 2: fx2[b]})
            assert abs(vals[b] - per_val) < tol
            # Ties can resolve to a different location; it must still
            # attain the extremum.
            assert abs(_eval_at(model, locs[b], fx1[b], fx2[b])
                       - vals[b]) < tol


class TestDense:
    def test_matches_per_call_and_analytic(self, dense, scenarios):
        fx1, fx2 = scenarios
        _check_family(dense, fx1, fx2)
        roots = dense.roots_batch(dim=0, fixed={1: fx1, 2: fx2})
        want = np.sqrt(0.5 + 0.3 * fx1 + 0.2 * fx2)
        for b in range(B):
            np.testing.assert_allclose(roots[b], [-want[b], want[b]],
                                       atol=1e-10)

    def test_scalar_fixed_broadcasts(self, dense, scenarios):
        fx1, _ = scenarios
        roots = dense.roots_batch(dim=0, fixed={1: fx1, 2: 0.25})
        per = [dense.roots(dim=0, fixed={1: v, 2: 0.25}) for v in fx1]
        for got, want in zip(roots, per):
            np.testing.assert_allclose(got, want, atol=1e-12)

    def test_all_scalars_is_batch_of_one(self, dense):
        roots = dense.roots_batch(dim=0, fixed={1: 0.5, 2: 0.5})
        assert len(roots) == 1
        np.testing.assert_allclose(
            roots[0], dense.roots(dim=0, fixed={1: 0.5, 2: 0.5}),
            atol=1e-12)

    def test_rootless_rows_are_empty(self):
        ch = ChebyshevApproximation(
            lambda p, _=None: p[0] ** 2 + 1.0 + p[1], 2,
            [(-1.0, 1.0), (0.0, 1.0)], [7, 5])
        ch.build(verbose=False)
        roots = ch.roots_batch(dim=0, fixed={1: np.array([0.0, 0.5])})
        assert all(r.size == 0 for r in roots)

    def test_mixed_root_counts_across_rows(self, dense):
        # One row with two roots, one row shifted to have none.
        shifted = ChebyshevApproximation(
            lambda p, _=None: p[0] ** 2 - (p[1] - 0.5), 2,
            [(-2.0, 2.0), (0.0, 1.0)], [9, 5])
        shifted.build(verbose=False)
        roots = shifted.roots_batch(
            dim=0, fixed={1: np.array([1.0, 0.0])})
        assert roots[0].size == 2 and roots[1].size == 0

    def test_endpoint_extrema(self, scenarios):
        fx1, fx2 = scenarios
        mono = ChebyshevApproximation(
            lambda p, _=None: p[0] + 0.1 * p[1] + 0.1 * p[2], 3, DOM,
            [7, 5, 5])
        mono.build(verbose=False)
        vals, locs = mono.minimize_batch(dim=0, fixed={1: fx1, 2: fx2})
        np.testing.assert_allclose(locs, -2.0, atol=1e-12)
        vals, locs = mono.maximize_batch(dim=0, fixed={1: fx1, 2: fx2})
        np.testing.assert_allclose(locs, 2.0, atol=1e-12)


class TestDenseValidation:
    def test_unbuilt_raises(self):
        ch = ChebyshevApproximation(_f, 3, DOM, [5, 5, 5])
        with pytest.raises(RuntimeError, match="build"):
            ch.roots_batch(dim=0, fixed={1: 0.5, 2: 0.5})

    def test_missing_fixed_dim_raises(self, dense):
        with pytest.raises(ValueError, match="pin every dim"):
            dense.roots_batch(dim=0, fixed={1: 0.5})

    def test_dim_required(self, dense):
        with pytest.raises(ValueError, match="dim is required"):
            dense.roots_batch(fixed={1: 0.5, 2: 0.5})

    def test_mismatched_batch_lengths_raise(self, dense):
        with pytest.raises(ValueError, match="batch length"):
            dense.roots_batch(dim=0, fixed={1: np.zeros(3) + 0.5,
                                            2: np.zeros(4) + 0.5})

    def test_out_of_domain_fixed_names_row(self, dense):
        bad = np.array([0.5, 0.5, 1.5])
        with pytest.raises(ValueError, match=r"fixed\[1\]\[2\]"):
            dense.roots_batch(dim=0, fixed={1: bad, 2: 0.5})

    def test_1d_model_points_at_per_call(self):
        ch = ChebyshevApproximation(
            lambda p, _=None: p[0] ** 2 - 0.5, 1, [(-1.0, 1.0)], [7])
        ch.build(verbose=False)
        with pytest.raises(ValueError, match="roots\\(\\)"):
            ch.roots_batch(dim=0)

    def test_2d_fixed_array_shape_raises(self, dense):
        with pytest.raises(ValueError, match="scalar or a 1-D"):
            dense.roots_batch(dim=0, fixed={1: np.zeros((2, 2)),
                                            2: 0.5})

    def test_empty_fixed_array_raises(self, dense):
        with pytest.raises(ValueError, match="empty"):
            dense.roots_batch(dim=0, fixed={1: np.zeros(0), 2: 0.5})

    def test_nan_fixed_raises(self, dense):
        bad = np.array([0.5, np.nan, 0.5])
        with pytest.raises(ValueError, match=r"fixed\[1\]\[1\]"):
            dense.roots_batch(dim=0, fixed={1: bad, 2: 0.5})

    def test_optimize_chunked_rows_match_direct(self, dense, monkeypatch):
        # Force the row-chunking path (chunk floor is 256) and compare
        # against the unchunked result.
        from pychebyshev_tpu.utils import calculus
        rng = np.random.default_rng(8)
        fx1 = rng.uniform(0, 1, 300)
        fx2 = rng.uniform(0, 1, 300)
        direct = dense.minimize_batch(dim=0, fixed={1: fx1, 2: fx2})
        monkeypatch.setattr(calculus, "_OPT_CHUNK_ELEMS", 1)
        chunked = dense.minimize_batch(dim=0, fixed={1: fx1, 2: fx2})
        np.testing.assert_array_equal(chunked[0], direct[0])
        np.testing.assert_array_equal(chunked[1], direct[1])


class TestTT:
    @pytest.fixture(scope="class")
    def tt(self):
        m = ChebyshevTT(_f, 3, DOM, [9, 7, 7], max_rank=8,
                        tolerance=1e-12)
        m.build(verbose=False, seed=2)
        return m

    def test_matches_per_call(self, tt, scenarios):
        _check_family(tt, *scenarios, tol=1e-7)

    def test_reordered_user_frame(self, tt, scenarios):
        fx1, fx2 = scenarios
        tt_r = tt.reorder([2, 0, 1])
        base = tt.roots_batch(dim=0, fixed={1: fx1, 2: fx2})
        got = tt_r.roots_batch(dim=0, fixed={1: fx1, 2: fx2})
        for g, w in zip(got, base):
            np.testing.assert_allclose(g, w, atol=1e-10)


class TestSlider:
    def test_matches_per_call(self, scenarios):
        sl = ChebyshevSlider(
            lambda p, _=None: p[0] ** 2 - 0.3 * p[1] - 0.2 * p[2] - 0.5,
            3, DOM, [9, 7, 7], partition=[[0], [1], [2]],
            pivot_point=[0.0, 0.5, 0.5])
        sl.build(verbose=False)
        _check_family(sl, *scenarios)


class TestSpline:
    @pytest.fixture(scope="class")
    def spline(self):
        sp = ChebyshevSpline(
            lambda p, _=None: abs(p[0]) - 0.3 * p[1] - 0.2 * p[2] - 0.2,
            3, DOM, [9, 7, 7], knots=[[0.0], [], []])
        sp.build(verbose=False)
        return sp

    def test_matches_per_call(self, spline, scenarios):
        _check_family(spline, *scenarios)

    def test_kink_minimum_located(self, spline, scenarios):
        fx1, fx2 = scenarios
        vals, locs = spline.minimize_batch(dim=0, fixed={1: fx1, 2: fx2})
        # |x| - c minimizes at the kink x = 0 for every scenario.
        np.testing.assert_allclose(locs, 0.0, atol=1e-9)
        np.testing.assert_allclose(
            vals, -0.3 * fx1 - 0.2 * fx2 - 0.2, atol=1e-9)

    def test_roots_span_knot(self, spline, scenarios):
        fx1, fx2 = scenarios
        roots = spline.roots_batch(dim=0, fixed={1: fx1, 2: fx2})
        want = 0.3 * fx1 + 0.2 * fx2 + 0.2
        for b in range(B):
            np.testing.assert_allclose(roots[b], [-want[b], want[b]],
                                       atol=1e-9)

    def test_nested_heterogeneous_grid(self, scenarios):
        # Per-piece n differs along dim 0: the interval resample uses
        # the max (exact for the lower-degree piece too).
        fx1, fx2 = scenarios
        sp = ChebyshevSpline(
            lambda p, _=None: abs(p[0]) - 0.3 * p[1] - 0.2 * p[2] - 0.2,
            3, DOM, [[9, 7], [7], [7]], knots=[[0.0], [], []])
        sp.build(verbose=False)
        roots = sp.roots_batch(dim=0, fixed={1: fx1, 2: fx2})
        want = 0.3 * fx1 + 0.2 * fx2 + 0.2
        for b in range(B):
            np.testing.assert_allclose(roots[b], [-want[b], want[b]],
                                       atol=1e-9)


class TestRoots1dBatchUnit:
    def test_identically_zero_row_has_no_roots(self):
        from pychebyshev_tpu.utils.calculus import roots_1d_batch
        values = np.zeros((2, 7))
        values[1] = np.linspace(-1, 1, 7)  # odd-ish: has a root
        out = roots_1d_batch(values, (-1.0, 1.0))
        assert out[0].size == 0
        assert out[1].size >= 1

    def test_matches_roots_1d_per_row(self):
        from pychebyshev_tpu.ops.chebyshev import nodes_for_dim_np
        from pychebyshev_tpu.utils.calculus import roots_1d, roots_1d_batch
        rng = np.random.default_rng(3)
        nodes = nodes_for_dim_np(-1.0, 1.0, 9)
        values = np.sin(3 * nodes)[None, :] * rng.uniform(
            0.5, 2.0, (16, 1)) + rng.normal(0, 0.1, (16, 9))
        batch = roots_1d_batch(values, (-1.0, 1.0))
        for row, got in zip(values, batch):
            # Bit-identical: per-row GEMV coefficients + the rotated
            # companion chebroots uses.
            np.testing.assert_array_equal(got, roots_1d(row, (-1.0, 1.0)))

    def test_double_root_count_matches_per_call(self):
        # A tangential zero's eigenvalue pair sits ON the imag
        # tolerance; an unrotated companion or a batched-GEMM
        # coefficient transform flips the root COUNT vs roots_1d.
        from pychebyshev_tpu.ops.chebyshev import nodes_for_dim_np
        from pychebyshev_tpu.utils.calculus import roots_1d, roots_1d_batch
        nodes = nodes_for_dim_np(-1.3, 2.7, 13)
        values = (nodes - 0.5) ** 2
        per = roots_1d(values, (-1.3, 2.7))
        got = roots_1d_batch(values[None], (-1.3, 2.7))[0]
        np.testing.assert_array_equal(got, per)

    def test_wrong_ndim_raises(self):
        from pychebyshev_tpu.utils.calculus import roots_1d_batch
        with pytest.raises(ValueError, match=r"\(B, n\)"):
            roots_1d_batch(np.zeros(5), (-1.0, 1.0))
