"""Numerical parity against the NumPy reference implementation.

These tests import the upstream PyChebyshev package (pure NumPy/SciPy)
when it is available on this machine and compare our results to ~1e-12.
They are skipped cleanly when the reference is absent — the rest of the
suite uses self-contained analytic oracles.
"""

import math
import os
import sys

import numpy as np
import pytest

_REF_SRC = "/root/reference/src"
if os.path.isdir(_REF_SRC) and _REF_SRC not in sys.path:
    sys.path.insert(0, _REF_SRC)

ref = pytest.importorskip("pychebyshev",
                          reason="reference implementation not available")

from pychebyshev_tpu import (  # noqa: E402
    ChebyshevApproximation,
    ChebyshevSpline,
    ChebyshevTT,
    ChebyshevSlider,
)


def f2d(x, _):
    return math.sin(2.0 * x[0]) * math.exp(0.3 * x[1]) + x[1] ** 2


def f3d(x, _):
    return math.sin(x[0]) + math.cos(x[1]) * x[2] + 0.1 * x[0] * x[2]


@pytest.fixture(scope="module")
def pair_2d():
    ours = ChebyshevApproximation(f2d, 2, [[-1, 1], [0, 2]], [9, 11])
    ours.build(verbose=False)
    theirs = ref.ChebyshevApproximation(f2d, 2, [[-1, 1], [0, 2]], [9, 11])
    theirs.build(verbose=False)
    return ours, theirs


class TestApproximationParity:
    def test_tensor_values_match(self, pair_2d):
        ours, theirs = pair_2d
        np.testing.assert_allclose(np.asarray(ours.tensor_values),
                                   theirs.tensor_values, atol=1e-13)
        for d in range(2):
            np.testing.assert_allclose(np.asarray(ours.nodes[d]),
                                       theirs.nodes[d], atol=1e-13)
            # Our weights are power-of-two normalized (deliberate
            # deviation: raw weights overflow the TPU's f32-range
            # emulated f64 on narrow domains with n >= ~20).  All
            # consumers are scale-invariant, so parity is up to one
            # exact power-of-two factor per dim.
            w_ours = np.asarray(ours.weights[d])
            w_ref = np.asarray(theirs.weights[d])
            # (the reference divides sequentially, we invert a product —
            #  last-ulp differences make the raw ratio inexact, so snap
            #  the scale to the nearest power of two first)
            scale = 2.0 ** np.round(np.log2(np.abs(w_ref[0] / w_ours[0])))
            scale *= np.sign(w_ref[0] / w_ours[0])
            np.testing.assert_allclose(w_ours * scale, w_ref, rtol=1e-11)
            np.testing.assert_allclose(np.asarray(ours.diff_matrices[d]),
                                       theirs.diff_matrices[d], rtol=1e-9,
                                       atol=1e-11)

    @pytest.mark.parametrize("orders", [[0, 0], [1, 0], [0, 1], [2, 0],
                                        [1, 1], [2, 2]])
    def test_eval_parity(self, pair_2d, orders):
        ours, theirs = pair_2d
        rng = np.random.default_rng(0)
        for _ in range(10):
            pt = [float(rng.uniform(-1, 1)), float(rng.uniform(0, 2))]
            a = ours.vectorized_eval(pt, orders)
            b = theirs.vectorized_eval(pt, orders)
            assert abs(a - b) < 1e-9 * max(1.0, abs(b))

    def test_eval_at_node_parity(self, pair_2d):
        ours, theirs = pair_2d
        # Node positions may differ by 1 ulp between the two node
        # constructions, so values agree to ~1e-13, not bit-exactly.
        pt = [float(theirs.nodes[0][3]), float(theirs.nodes[1][5])]
        assert abs(ours.vectorized_eval(pt, [0, 0])
                   - theirs.vectorized_eval(pt, [0, 0])) < 1e-13

    def test_error_estimate_parity(self, pair_2d):
        ours, theirs = pair_2d
        assert abs(ours.error_estimate()
                   - theirs.error_estimate()) < 1e-12

    def test_integrate_parity(self, pair_2d):
        ours, theirs = pair_2d
        assert abs(ours.integrate() - theirs.integrate()) < 1e-11
        a = ours.integrate(dims=0, bounds=(-0.5, 0.7))
        b = theirs.integrate(dims=0, bounds=(-0.5, 0.7))
        pt = [1.3]
        assert abs(a.vectorized_eval(pt, [0])
                   - b.vectorized_eval(pt, [0])) < 1e-11

    def test_sobol_parity(self, pair_2d):
        ours, theirs = pair_2d
        sa, sb = ours.sobol_indices(), theirs.sobol_indices()
        for d in range(2):
            assert abs(sa["first_order"][d] - sb["first_order"][d]) < 1e-10
            assert abs(sa["total_order"][d] - sb["total_order"][d]) < 1e-10
        assert abs(sa["variance"] - sb["variance"]) < 1e-10 * max(
            1.0, abs(sb["variance"]))

    def test_roots_minimize_parity(self):
        def g(x, _):
            return math.sin(3 * x[0]) + 0.3

        ours = ChebyshevApproximation(g, 1, [[-1, 1]], [21])
        ours.build(verbose=False)
        theirs = ref.ChebyshevApproximation(g, 1, [[-1, 1]], [21])
        theirs.build(verbose=False)
        np.testing.assert_allclose(ours.roots(), theirs.roots(),
                                   atol=1e-10)
        va, la = ours.minimize()
        vb, lb = theirs.minimize()
        assert abs(va - vb) < 1e-10 and abs(la - lb) < 1e-8

    def test_extrude_slice_parity(self, pair_2d):
        ours, theirs = pair_2d
        oa = ours.extrude((1, (0.0, 3.0), 5)).slice((2, 0.8))
        ob = theirs.extrude((1, (0.0, 3.0), 5)).slice((2, 0.8))
        pt = [0.4, 1.5]
        assert abs(oa.vectorized_eval(pt, [0, 0])
                   - ob.vectorized_eval(pt, [0, 0])) < 1e-11


class TestBinaryInterop:
    def test_ours_to_reference(self, pair_2d, tmp_path):
        """Files we write load in the reference library bit-compatibly."""
        ours, _ = pair_2d
        path = tmp_path / "ours.pcb"
        ours.save(path, format="binary")
        loaded = ref.ChebyshevApproximation.load(str(path))
        np.testing.assert_array_equal(loaded.tensor_values,
                                      np.asarray(ours.tensor_values))
        pt = [0.3, 1.1]
        assert abs(loaded.vectorized_eval(pt, [0, 0])
                   - ours.vectorized_eval(pt, [0, 0])) < 1e-12

    def test_reference_to_ours(self, pair_2d, tmp_path):
        """Files the reference writes load in our library."""
        _, theirs = pair_2d
        path = tmp_path / "theirs.pcb"
        theirs.save(str(path), format="binary")
        loaded = ChebyshevApproximation.load(path)
        np.testing.assert_array_equal(np.asarray(loaded.tensor_values),
                                      theirs.tensor_values)

    def test_spline_interop(self, tmp_path):
        sp = ChebyshevSpline(lambda x, _: abs(x[0]), 1, [[-1, 1]], [9],
                             [[0.0]])
        sp.build(verbose=False)
        path = tmp_path / "sp.pcb"
        sp.save(path, format="binary")
        loaded = ref.ChebyshevSpline.load(str(path))
        for x in [-0.6, 0.3, 0.9]:
            assert abs(loaded.eval([x], [0]) - sp.eval([x], [0])) < 1e-13

    def test_reference_fixtures_load(self):
        """The reference repo's committed fixtures load in our library."""
        fixtures = "/root/reference/tests/fixtures"
        if not os.path.isdir(fixtures):
            pytest.skip("reference fixtures not present")
        for name in os.listdir(fixtures):
            full = os.path.join(fixtures, name)
            if name.startswith("approx"):
                obj = ChebyshevApproximation.load(full)
                theirs = ref.ChebyshevApproximation.load(full)
                pt = [0.5 * (lo + hi) + 0.1 * (hi - lo)
                      for lo, hi in obj.domain]
                assert abs(obj.vectorized_eval(pt, [0] * obj.num_dimensions)
                           - theirs.vectorized_eval(
                               pt, [0] * obj.num_dimensions)) < 1e-12
            elif name.startswith("spline"):
                obj = ChebyshevSpline.load(full)
                theirs = ref.ChebyshevSpline.load(full)
                pt = [0.5 * (lo + hi) + 0.1 * (hi - lo)
                      for lo, hi in obj.domain]
                assert abs(obj.eval(pt, [0] * obj.num_dimensions)
                           - theirs.eval(
                               pt, [0] * obj.num_dimensions)) < 1e-12


class TestTTParity:
    def test_svd_build_parity(self):
        ours = ChebyshevTT(f3d, 3, [[-1, 1]] * 3, [9] * 3, max_rank=9)
        ours.build(verbose=False, method="svd")
        theirs = ref.ChebyshevTT(f3d, 3, [[-1, 1]] * 3, [9] * 3,
                                 max_rank=9)
        theirs.build(verbose=False, method="svd")
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1, 1, size=(20, 3))
        ours_v = ours.eval_batch(pts)
        theirs_v = theirs.eval_batch(pts)
        np.testing.assert_allclose(ours_v, theirs_v, atol=1e-10)

    def test_from_values_parity(self):
        rng = np.random.default_rng(5)
        # a low-rank tensor so TT-SVD is stable across LAPACK/impl
        a = rng.normal(size=(9, 1))
        b = rng.normal(size=(1, 9))
        tensor = (a @ b)[:, :, None] * rng.normal(size=9)[None, None, :]
        ours = ChebyshevTT.from_values(tensor, 3, [[-1, 1]] * 3, [9] * 3)
        theirs = ref.ChebyshevTT.from_values(tensor, 3, [[-1, 1]] * 3,
                                             [9] * 3)
        pts = rng.uniform(-1, 1, size=(20, 3))
        np.testing.assert_allclose(ours.eval_batch(pts),
                                   theirs.eval_batch(pts), atol=1e-10)

    def test_integrate_parity(self):
        ours = ChebyshevTT(f3d, 3, [[-1, 1]] * 3, [9] * 3, max_rank=9)
        ours.build(verbose=False, method="svd")
        theirs = ref.ChebyshevTT(f3d, 3, [[-1, 1]] * 3, [9] * 3,
                                 max_rank=9)
        theirs.build(verbose=False, method="svd")
        assert abs(ours.integrate() - theirs.integrate()) < 1e-10
        a = ours.integrate(dims=[1], bounds=[(-0.5, 0.5)])
        b = theirs.integrate(dims=[1], bounds=[(-0.5, 0.5)])
        pt = [0.3, -0.7]
        assert abs(a.eval(pt) - b.eval(pt)) < 1e-10


class TestSliderParity:
    def test_eval_and_integrate_parity(self):
        part = [[0, 1], [2]]
        pivot = [0.1, -0.2, 0.3]
        ours = ChebyshevSlider(f3d, 3, [[-1, 1]] * 3, [9] * 3, part, pivot)
        ours.build(verbose=False)
        theirs = ref.ChebyshevSlider(f3d, 3, [[-1, 1]] * 3, [9] * 3,
                                     part, pivot)
        theirs.build(verbose=False)
        rng = np.random.default_rng(2)
        for _ in range(10):
            pt = list(rng.uniform(-1, 1, 3))
            assert abs(ours.eval(pt, [0, 0, 0])
                       - theirs.eval(pt, [0, 0, 0])) < 1e-11
        assert abs(ours.eval([0.1, 0.2, 0.3], [1, 0, 0])
                   - theirs.eval([0.1, 0.2, 0.3], [1, 0, 0])) < 1e-10
        assert abs(ours.integrate() - theirs.integrate()) < 1e-10
        a = ours.integrate(dims=[2])
        b = theirs.integrate(dims=[2])
        pt = [0.4, -0.5]
        assert abs(a.eval(pt, [0, 0]) - b.eval(pt, [0, 0])) < 1e-10


class TestSplineParity:
    def test_eval_parity(self):
        def g(x, _):
            return abs(x[0] - 0.2) + math.cos(x[1])

        ours = ChebyshevSpline(g, 2, [[-1, 1], [-1, 1]], [9, 9],
                               [[0.2], []])
        ours.build(verbose=False)
        theirs = ref.ChebyshevSpline(g, 2, [[-1, 1], [-1, 1]], [9, 9],
                                     [[0.2], []])
        theirs.build(verbose=False)
        rng = np.random.default_rng(3)
        for _ in range(10):
            pt = list(rng.uniform(-1, 1, 2))
            assert abs(ours.eval(pt, [0, 0])
                       - theirs.eval(pt, [0, 0])) < 1e-11
        assert abs(ours.integrate() - theirs.integrate()) < 1e-11
        assert abs(ours.error_estimate()
                   - theirs.error_estimate()) < 1e-12


class TestTTSeededParity:
    """Same-seed TT-Cross builds agree with the reference digit for
    digit — the RNG draws, maxvol pivots, and SVD truncations line up
    exactly (verified independently on 5-D Black-Scholes: identical
    per-seed errors to 4+ significant digits across seeds 0/1/42)."""

    def test_same_seed_same_values(self):
        import math

        def f(x, _=None):
            return math.sin(x[0]) + x[1] * math.cos(x[2])

        ours = ChebyshevTT(f, 3, [[-1, 1]] * 3, [9] * 3, max_rank=6)
        ours.build(verbose=False, seed=7)
        theirs = ref.ChebyshevTT(f, 3, [[-1, 1]] * 3, [9] * 3,
                                 max_rank=6)
        theirs.build(verbose=False, seed=7)

        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (25, 3))
        for p in pts:
            assert abs(ours.eval(list(p)) - theirs.eval(list(p))) < 1e-12
        assert ours.tt_ranks == theirs.tt_ranks
        # Same eval-count regime (the stagnation early-stop saves evals
        # on stalling builds; on quickly-converging ones like this the
        # counts agree to within a test-point draw).
        assert abs(ours.total_build_evals
                   - theirs.total_build_evals) <= 0.1 * max(
            ours.total_build_evals, theirs.total_build_evals)
