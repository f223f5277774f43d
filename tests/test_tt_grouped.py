"""Grouped-supercore TT serving + per-bond trimming + ordered to_tt.

Covers the round-4 exact-compression serving levers:
- ``tt_merge_cores`` (exact supercore merge),
- ``tt_round_cores_ranks`` / ``tt_trim_cores`` (per-bond budgeting),
- ``ops.tt_eval_dd`` grouped digit-GEMM chain (``groups=``),
- ``to_tt(order=..., sup_target=...)``.
"""

import numpy as np
import pytest

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevTT
from pychebyshev_tpu.models import tt_algorithms as tta
from pychebyshev_tpu.ops import tt_eval_dd

DOMAIN = [[80.0, 120.0], [90.0, 110.0], [0.25, 2.0], [0.1, 0.5],
          [0.01, 0.05]]


def _bs(points, _data=None):
    from tests.conftest import bs_price_vectorized
    return bs_price_vectorized(points)


@pytest.fixture(scope="module")
def dense5d():
    c = ChebyshevApproximation(_bs, 5, DOMAIN, n_nodes=[11] * 5,
                               vectorized=True)
    c.build(verbose=False)
    return c


@pytest.fixture(scope="module")
def tt5d(dense5d):
    return dense5d.to_tt(tolerance=1e-13)


@pytest.fixture(scope="module")
def pts5d():
    rng = np.random.default_rng(11)
    lo = np.array([b[0] for b in DOMAIN])
    hi = np.array([b[1] for b in DOMAIN])
    return lo + (hi - lo) * rng.uniform(0.02, 0.98, size=(2048, 5))


class TestMergeCores:
    def test_merge_is_exact(self, tt5d):
        cores = [np.asarray(c) for c in tt5d._coeff_cores]
        for groups in ([2, 2, 1], [1, 2, 2], [5], [1, 1, 1, 1, 1],
                       [3, 2]):
            merged = tta.tt_merge_cores(cores, groups)
            assert len(merged) == len(groups)
            a = tta.tt_reconstruct(cores).reshape(-1)
            b = tta.tt_reconstruct(merged).reshape(-1)
            np.testing.assert_allclose(b, a, rtol=0, atol=1e-12)

    def test_merged_shapes(self, tt5d):
        cores = [np.asarray(c) for c in tt5d._coeff_cores]
        merged = tta.tt_merge_cores(cores, [2, 2, 1])
        r = tt5d.tt_ranks
        assert merged[0].shape == (1, 121, r[2])
        assert merged[1].shape == (r[2], 121, r[4])
        assert merged[2].shape == (r[4], 11, 1)

    def test_bad_groups_raise(self, tt5d):
        cores = [np.asarray(c) for c in tt5d._coeff_cores]
        with pytest.raises(ValueError, match="groups"):
            tta.tt_merge_cores(cores, [2, 2])
        with pytest.raises(ValueError, match="groups"):
            tta.tt_merge_cores(cores, [0, 3, 2])


class TestRoundCoresRanks:
    def test_ranks_respected(self, tt5d):
        cores = [np.asarray(c) for c in tt5d._coeff_cores]
        target = [r - 1 for r in tt5d.tt_ranks[1:-1]]
        out = tta.tt_round_cores_ranks(cores, target)
        got = [out[k].shape[2] for k in range(len(out) - 1)]
        assert got == target
        # Only trailing singular values dropped — the tensor survives
        # to the spectrum's tail size (loose: the 8->7 bond on this
        # chain carries ~1e-4-relative mass).
        a = tta.tt_reconstruct(cores)
        b = tta.tt_reconstruct(out)
        assert np.max(np.abs(a - b)) / np.max(np.abs(a)) < 1e-2

    def test_noop_ranks_exact(self, tt5d):
        cores = [np.asarray(c) for c in tt5d._coeff_cores]
        out = tta.tt_round_cores_ranks(cores, tt5d.tt_ranks[1:-1])
        a = tta.tt_reconstruct(cores)
        b = tta.tt_reconstruct(out)
        assert np.max(np.abs(a - b)) / np.max(np.abs(a)) < 1e-12

    def test_wrong_length_raises(self, tt5d):
        cores = [np.asarray(c) for c in tt5d._coeff_cores]
        with pytest.raises(ValueError, match="bond_ranks"):
            tta.tt_round_cores_ranks(cores, [3, 3])


class TestTrimCores:
    def test_sup_guarantee_measured(self, dense5d, tt5d):
        cores = [np.asarray(c) for c in tt5d._coeff_cores]
        # Trim in VALUE-core space against the value tensor.
        vals = [tta.coeff_core_to_value_core(c) for c in cores]
        ref = tta.tt_reconstruct(vals)
        trimmed, diag = tta.tt_trim_cores(vals, ref, 1e-10)
        dev = np.max(np.abs(tta.tt_reconstruct(trimmed) - ref)) \
            / np.max(np.abs(ref))
        assert dev <= 1e-10
        assert dev == pytest.approx(diag["grid_sup_dev"], rel=1e-6)
        assert diag["chain_flops"] <= diag["chain_flops_initial"]
        assert all(a <= b for a, b in zip(diag["bond_ranks"],
                                          diag["bond_ranks_initial"]))

    def test_loose_target_trims_more(self, tt5d):
        cores = [np.asarray(c) for c in tt5d._coeff_cores]
        ref = tta.tt_reconstruct(cores)
        _, tight = tta.tt_trim_cores(cores, ref, 1e-13)
        _, loose = tta.tt_trim_cores(cores, ref, 1e-8)
        assert loose["chain_flops"] <= tight["chain_flops"]

    def test_bad_target_raises(self, tt5d):
        cores = [np.asarray(c) for c in tt5d._coeff_cores]
        with pytest.raises(ValueError, match="sup_target"):
            tta.tt_trim_cores(cores, tta.tt_reconstruct(cores), 0.0)


class TestGroupedDD:
    def test_auto_groups_valid_partition(self, tt5d):
        shapes = tuple(tuple(int(x) for x in c.shape)
                       for c in tt5d._coeff_cores)
        groups = tt_eval_dd.tt_dd_auto_groups(shapes)
        assert sum(groups) == 5 and all(g >= 1 for g in groups)
        # On the compression-grade chain the planner must group (the
        # per-dim chain is the modeled-slowest option by a wide margin).
        assert groups != (1, 1, 1, 1, 1)

    def test_grouped_matches_f64_chain(self, tt5d, pts5d):
        ref = tt5d.eval_batch(pts5d)
        scale = np.abs(ref).max()
        for groups in (None, (2, 2, 1), (1, 2, 2), "auto"):
            got = tt5d.eval_batch_dd(pts5d, groups=groups)
            assert np.abs(got - ref).max() / scale < 5e-12, groups

    def test_grouped_matches_per_dim(self, tt5d, pts5d):
        a = tt5d.eval_batch_dd(pts5d, groups=None)
        b = tt5d.eval_batch_dd(pts5d, groups=(2, 2, 1))
        scale = np.abs(a).max()
        assert np.abs(a - b).max() / scale < 1e-11

    def test_explicit_groups_ops_level(self, tt5d, pts5d):
        cores = tt5d._cores_on_device(np.float64)
        dom = np.asarray(DOMAIN)
        ref = tt5d.eval_batch(pts5d)
        got = np.asarray(tt_eval_dd.tt_eval_batch_dd(
            cores, dom, pts5d, groups=(3, 2)))
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-10

    def test_bad_groups_raise(self, tt5d, pts5d):
        cores = tt5d._cores_on_device(np.float64)
        dom = np.asarray(DOMAIN)
        with pytest.raises(ValueError, match="groups"):
            tt_eval_dd.tt_eval_batch_dd(cores, dom, pts5d,
                                        groups=(2, 2))

    def test_dp_bad_groups_raise(self, tt5d, pts5d):
        from pychebyshev_tpu.parallel import sharding as sh
        mesh = sh.make_mesh(8)
        cores = tt5d._cores_on_device(np.float64)
        dom = np.asarray(DOMAIN)
        for bad in ((2, 2), (2, 0, 1, 1, 1)):
            with pytest.raises(ValueError, match="groups"):
                sh.tt_eval_batch_dd_dp(cores, dom, pts5d, mesh,
                                       groups=bad)

    def test_grouped_dp_matches(self, tt5d, pts5d):
        from pychebyshev_tpu.parallel import sharding as sh
        mesh = sh.make_mesh(8)
        cores = tt5d._cores_on_device(np.float64)
        dom = np.asarray(DOMAIN)
        want = np.asarray(tt_eval_dd.tt_eval_batch_dd(
            cores, dom, pts5d, groups="auto"))
        got = np.asarray(sh.tt_eval_batch_dd_dp(
            cores, dom, pts5d, mesh, groups="auto"))
        np.testing.assert_allclose(got, want, rtol=0,
                                   atol=1e-11 * np.abs(want).max())


class TestToTTOrderAndBudget:
    def test_order_auto_round_trips(self, dense5d, pts5d):
        tt = dense5d.to_tt(tolerance=1e-10, order="auto")
        assert sorted(tt.dim_order) == list(range(5))
        ref = dense5d.eval_batch(pts5d, derivative_order=[0] * 5)
        got = tt.eval_batch(pts5d)
        assert np.abs(got - np.asarray(ref)).max() \
            / np.abs(ref).max() < 1e-8

    def test_explicit_order(self, dense5d, pts5d):
        tt = dense5d.to_tt(tolerance=1e-10, order=[4, 3, 2, 1, 0])
        assert tt.dim_order == [4, 3, 2, 1, 0]
        ref = dense5d.eval_batch(pts5d, derivative_order=[0] * 5)
        got = tt.eval_batch(pts5d)
        assert np.abs(got - np.asarray(ref)).max() \
            / np.abs(ref).max() < 1e-8
        # Storage-frame metadata permuted consistently.
        assert tt.n_nodes == [11] * 5
        assert tt.domain[0] == list(DOMAIN[4])

    def test_bad_order_raises(self, dense5d):
        with pytest.raises(ValueError, match="permutation"):
            dense5d.to_tt(order=[0, 1, 2, 3, 3])

    def test_sup_target_diagnostics_and_serving(self, dense5d, pts5d):
        tt = dense5d.to_tt(tolerance=1e-13, sup_target=1e-9)
        diag = tt.compression_diagnostics
        assert diag["grid_sup_dev"] <= 1e-9
        assert diag["chain_flops"] <= diag["chain_flops_initial"]
        ref = dense5d.eval_batch(pts5d, derivative_order=[0] * 5)
        got = tt.eval_batch_dd(pts5d)
        # Lebesgue growth off-grid: allow one order over the grid
        # budget.
        assert np.abs(got - np.asarray(ref)).max() \
            / np.abs(ref).max() < 1e-8

    def test_sup_target_trims_ranks(self, dense5d):
        tight = dense5d.to_tt(tolerance=1e-13)
        loose = dense5d.to_tt(tolerance=1e-13, sup_target=1e-6)
        assert sum(loose.tt_ranks) < sum(tight.tt_ranks)


class TestGroupedF32Chain:
    def test_f32_grouped_matches_f64(self, tt5d, pts5d):
        from pychebyshev_tpu.ops.tt_eval import tt_eval_batch
        cores64 = tt5d._cores_on_device(np.float64)
        cores32 = tt5d._cores_on_device(np.float32)
        dom = np.asarray(DOMAIN)
        ref = np.asarray(tt_eval_batch(cores64, dom, pts5d))
        scale = np.abs(ref).max()
        got = np.asarray(tt_eval_batch(
            cores32, dom, pts5d.astype(np.float32), groups="auto"))
        assert np.abs(got - ref).max() / scale < 1e-5

    def test_f64_grouped_exact_transform(self, tt5d, pts5d):
        from pychebyshev_tpu.ops.tt_eval import tt_eval_batch
        cores64 = tt5d._cores_on_device(np.float64)
        dom = np.asarray(DOMAIN)
        a = np.asarray(tt_eval_batch(cores64, dom, pts5d))
        b = np.asarray(tt_eval_batch(cores64, dom, pts5d,
                                     groups=(2, 2, 1)))
        assert np.abs(a - b).max() / np.abs(a).max() < 1e-13

    def test_f32_bad_groups_raise(self, tt5d, pts5d):
        from pychebyshev_tpu.ops.tt_eval import tt_eval_batch
        cores = tt5d._cores_on_device(np.float64)
        with pytest.raises(ValueError, match="groups"):
            tt_eval_batch(cores, np.asarray(DOMAIN), pts5d,
                          groups=(2, 2))

    def test_f32_engine_accuracy(self, tt5d, pts5d):
        # The engine keeps the per-dim chain for f32 (grouping was
        # measured SLOWER there — docs/performance.md); accuracy
        # pinned either way.
        import jax.numpy as jnp
        from pychebyshev_tpu.serving import BatchedEvaluator
        eng = BatchedEvaluator(tt5d, dtype=jnp.float32)
        got = np.asarray(eng(pts5d))
        ref = tt5d.eval_batch(pts5d)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-5


class TestGroupedBook:
    def test_book_grouped_matches_per_dim(self, tt5d, pts5d):
        d1 = tt5d.differentiate([1, 0, 0, 0, 0])
        models = [tuple(m._cores_on_device(np.float64))
                  for m in (tt5d, d1)]
        dom = np.asarray(DOMAIN)
        a = np.asarray(tt_eval_dd.tt_eval_batch_dd_models(
            models, dom, pts5d, groups=None))
        b = np.asarray(tt_eval_dd.tt_eval_batch_dd_models(
            models, dom, pts5d, groups="auto"))
        for m in range(2):
            scale = np.abs(a[m]).max()
            assert np.abs(a[m] - b[m]).max() / scale < 1e-10

    def test_book_bad_groups_raise(self, tt5d, pts5d):
        models = [tuple(tt5d._cores_on_device(np.float64))]
        with pytest.raises(ValueError, match="groups"):
            tt_eval_dd.tt_eval_batch_dd_models(
                models, np.asarray(DOMAIN), pts5d, groups=(2, 2))


class TestGroupedEngineServing:
    def test_engine_dd_serves_grouped(self, tt5d, pts5d):
        from pychebyshev_tpu.serving import BatchedEvaluator
        eng = BatchedEvaluator(tt5d, dtype="dd")
        got = np.asarray(eng(pts5d))
        ref = tt5d.eval_batch(pts5d)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 5e-12


class TestAutoGroupsDP:
    """The O(d^2) planner DP must reproduce the 2^(d-1) enumeration
    exactly (cost model AND mask tie-break) wherever the enumeration is
    tractable, and keep planning past the enumeration's old d=12
    silent-fallback point."""

    @staticmethod
    def _random_chain(rng, d):
        ranks = [1] + [int(rng.integers(1, 9)) for _ in range(d - 1)] \
            + [1]
        dims = [int(rng.integers(2, 22)) for _ in range(d)]
        return tuple((ranks[k], dims[k], ranks[k + 1])
                     for k in range(d))

    def test_dp_equals_enumeration(self):
        rng = np.random.default_rng(7)
        for d in range(2, 13):
            for _ in range(4):
                shapes = self._random_chain(rng, d)
                dp = tt_eval_dd.tt_dd_auto_groups(shapes)
                ref = tt_eval_dd._enumerate_auto_groups(shapes, 44)
                assert dp == ref, (shapes, dp, ref)

    def test_dp_equals_enumeration_benchmark_chain(self, tt5d):
        shapes = tuple(tuple(int(x) for x in c.shape)
                       for c in tt5d._coeff_cores)
        assert tt_eval_dd.tt_dd_auto_groups(shapes) == \
            tt_eval_dd._enumerate_auto_groups(shapes, 44)

    def test_high_d_chains_group(self):
        # A 16-D rank-4 chain of 5-node dims: K=5 starves the MXU, so
        # the planner must merge — the old enumeration returned per-dim
        # for every d > 12 without a word.
        shapes = tuple((1 if k == 0 else 4, 5,
                        1 if k == 15 else 4) for k in range(16))
        groups = tt_eval_dd.tt_dd_auto_groups(shapes)
        assert sum(groups) == 16 and all(g >= 1 for g in groups)
        assert groups != (1,) * 16
        # Every merged width must stay inside the digit budget.
        merged = tt_eval_dd._merged_shapes(shapes, groups)
        assert tt_eval_dd.tt_dd_plan(merged)["ok"]

    def test_high_d_never_worse_than_per_dim(self):
        rng = np.random.default_rng(21)
        for d in (13, 17, 25):
            shapes = self._random_chain(rng, d)
            groups = tt_eval_dd.tt_dd_auto_groups(shapes)
            assert sum(groups) == d
            c_dp, _ = tt_eval_dd._score_partition(shapes, groups, 44)
            c_pd, _ = tt_eval_dd._score_partition(shapes, (1,) * d, 44)
            assert c_dp <= c_pd

    def test_cutoff_participates(self, tt5d):
        shapes = tuple(tuple(int(x) for x in c.shape)
                       for c in tt5d._coeff_cores)
        for cutoff in (36, 44):
            assert tt_eval_dd.tt_dd_auto_groups(shapes, cutoff) == \
                tt_eval_dd._enumerate_auto_groups(shapes, cutoff)
