"""TT storage-frame discipline: EVERY public surface must answer in the
user frame regardless of the internal dim order — the behavior class the
reference hardened in v0.20.1 (``test_v0201_dim_threading.py``) after a
mutation race.  Here each method on a reordered TT is checked against
the identity-ordered TT."""

import math
import pickle

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevTT


def fn(x, _):
    return (math.sin(x[0]) * (1 + x[1]) + 0.5 * x[1] * x[2]
            + math.exp(0.2 * x[2]))


DOM = [[-1.0, 1.0], [0.0, 2.0], [-0.5, 1.5]]
ORDERS = [[1, 2, 0], [2, 0, 1], [2, 1, 0]]


@pytest.fixture(scope="module")
def base():
    t = ChebyshevTT(fn, 3, DOM, [9, 8, 7], max_rank=8)
    t.build(verbose=False, method="svd")
    return t


@pytest.fixture(scope="module", params=ORDERS,
                ids=[str(o) for o in ORDERS])
def pair(request, base):
    return base, base.reorder(request.param)


P3 = [[0.3, 0.7, -0.2], [-0.9, 1.9, 1.4], [0.0, 1.0, 0.5]]


class TestFrameInvariance:
    def test_eval(self, pair):
        a, r = pair
        for pt in P3:
            assert abs(a.eval(pt) - r.eval(pt)) < 1e-10

    def test_eval_batch_and_multi(self, pair):
        a, r = pair
        pts = np.array(P3)
        np.testing.assert_allclose(a.eval_batch(pts), r.eval_batch(pts),
                                   atol=1e-10)
        specs = [[0, 0, 0], [1, 0, 0], [0, 1, 0]]
        np.testing.assert_allclose(a.eval_multi(P3[0], specs),
                                   r.eval_multi(P3[0], specs),
                                   atol=1e-7)

    def test_fd_derivatives(self, pair):
        a, r = pair
        specs = [[1, 0, 0], [0, 1, 0], [0, 0, 2], [1, 1, 0]]
        got_a = a.eval_multi(P3[0], specs)
        got_r = r.eval_multi(P3[0], specs)
        np.testing.assert_allclose(got_a, got_r, atol=1e-6)

    def test_integrate_full_and_partial(self, pair):
        a, r = pair
        assert abs(a.integrate() - r.integrate()) < 1e-10
        pa, pr = a.integrate(dims=[1]), r.integrate(dims=[1])
        for pt in ([0.3, -0.2], [-0.9, 1.4]):
            assert abs(pa.eval(pt) - pr.eval(pt)) < 1e-10

    def test_integrate_bounds(self, pair):
        a, r = pair
        ia = a.integrate(dims=[0, 2], bounds=[(-0.5, 0.5), None])
        ir = r.integrate(dims=[0, 2], bounds=[(-0.5, 0.5), None])
        for y in (0.1, 1.0, 1.9):
            assert abs(ia.eval([y]) - ir.eval([y])) < 1e-10

    def test_slice_user_frame_index(self, pair):
        a, r = pair
        sa, sr = a.slice((1, 0.7)), r.slice((1, 0.7))
        for pt in ([0.3, -0.2], [-0.9, 1.4]):
            assert abs(sa.eval(pt) - sr.eval(pt)) < 1e-10

    def test_extrude(self, pair):
        a, r = pair
        ea, er = a.extrude((3, (0.0, 1.0), 4)), \
            r.extrude((3, (0.0, 1.0), 4))
        pt = [0.3, 0.7, -0.2, 0.5]
        assert abs(ea.eval(pt) - er.eval(pt)) < 1e-10

    def test_sobol_keys(self, pair):
        a, r = pair
        sa, sr = a.sobol_indices(), r.sobol_indices()
        for key in sa["first_order"]:
            assert abs(sa["first_order"][key]
                       - sr["first_order"][key]) < 1e-9

    def test_error_estimate(self, pair):
        # the estimate reads coefficient tails in STORAGE frame; after
        # SVD swaps the cores differ, so only the magnitude is stable.
        a, r = pair
        ea, er = a.error_estimate(), r.error_estimate()
        assert er < 50 * ea and ea < 50 * er

    def test_to_dense_user_frame(self, pair):
        # to_dense() inverse-permutes to the USER frame regardless of
        # the storage order.
        a, r = pair
        da, dr = np.asarray(a.to_dense()), np.asarray(r.to_dense())
        assert da.shape == dr.shape == (9, 8, 7)
        np.testing.assert_allclose(da, dr, atol=1e-9)

    def test_roots_minimize(self, pair):
        a, r = pair
        fixed = {1: 0.5, 2: 0.25}
        ra, rr = a.roots(dim=0, fixed=fixed), r.roots(dim=0, fixed=fixed)
        assert len(ra) == len(rr)
        np.testing.assert_allclose(ra, rr, atol=1e-8)
        va, la = a.minimize(dim=2, fixed={0: 0.1, 1: 0.9})
        vr, lr = r.minimize(dim=2, fixed={0: 0.1, 1: 0.9})
        assert abs(va - vr) < 1e-8 and abs(la - lr) < 1e-7

    def test_inner_product(self, pair):
        # mixed storage frames are refused (storage-frame contraction
        # would silently mis-pair dims); after reordering back the
        # product matches <a, a>.
        a, r = pair
        with pytest.raises(ValueError):
            a.inner_product(r)
        back = r.reorder([0, 1, 2])
        assert abs(a.inner_product(back) - a.inner_product(a)) < 1e-6

    def test_algebra_mixed_frames_refused(self, pair):
        # adding TTs in different storage frames is refused; reorder
        # into a common frame first, then f + f == 2f.
        a, r = pair
        with pytest.raises(ValueError):
            a + r
        s = a + r.reorder([0, 1, 2])
        for pt in P3:
            assert abs(s.eval(pt) - 2 * a.eval(pt)) < 1e-8

    def test_pickle_round_trip_keeps_frame(self, pair):
        _, r = pair
        back = pickle.loads(pickle.dumps(r))
        for pt in P3:
            assert abs(back.eval(pt) - r.eval(pt)) < 1e-12
        assert back.dim_order == r.dim_order

    def test_storage_frame_metadata_is_permuted(self, pair):
        # n_nodes / get_used_ns / domain report the STORAGE frame; the
        # permutation is recorded in dim_order.
        a, r = pair
        order = r.dim_order
        assert r.get_used_ns() == [a.get_used_ns()[d] for d in order]
        assert [list(b) for b in r.domain] == \
            [list(a.domain[d]) for d in order]


class TestReorderMechanics:
    def test_reorder_identity_is_noop(self, base):
        same = base.reorder([0, 1, 2])
        for pt in P3:
            assert abs(same.eval(pt) - base.eval(pt)) < 1e-12

    def test_double_reorder_round_trip(self, base):
        # new_order is the absolute storage permutation, so reordering
        # back to the identity restores the canonical frame.
        back = base.reorder([2, 0, 1]).reorder([0, 1, 2])
        assert back.dim_order == [0, 1, 2]
        for pt in P3:
            assert abs(back.eval(pt) - base.eval(pt)) < 1e-8

    def test_invalid_permutation_raises(self, base):
        with pytest.raises(ValueError):
            base.reorder([0, 0, 1])
        with pytest.raises(ValueError):
            base.reorder([0, 1])
        with pytest.raises(ValueError):
            base.reorder([0, 1, 3])

    def test_with_auto_order_at_least_as_compact(self):
        # A function separable as (dim0, dim2) x dim1 benefits from
        # adjacency; the greedy-swap search must not produce a HIGHER
        # total rank than the canonical order (it optimizes rank).
        f = lambda x, _: math.sin(x[0] + x[2]) + x[1]
        given = ChebyshevTT(f, 3, [[-1, 1]] * 3, [8] * 3, max_rank=10)
        given.build(verbose=False, seed=0)
        auto = ChebyshevTT.with_auto_order(
            f, 3, [[-1, 1]] * 3, [8] * 3, max_rank=10)
        assert sum(auto.tt_ranks) <= sum(given.tt_ranks)
        pt = [0.3, 0.7, -0.2]
        assert abs(auto.eval(pt) - f(pt, None)) < 1e-4