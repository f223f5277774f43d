"""dp-sharded TT build oracle (VERDICT r3 item 3).

``ChebyshevTT.build(mesh=...)`` shards every oracle batch (cross
matrices, full-grid SVD/ALS targets, refinement samples) over the data
axis.  Sharded builds are bit-identical across mesh sizes (same traced
program per shard); vs the eager unsharded oracle, XLA fusion may move
values by ulps, so that comparison is allclose-level.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pychebyshev_tpu import ChebyshevTT
from pychebyshev_tpu.models.tt_algorithms import GridOracle
from pychebyshev_tpu.parallel.sharding import make_mesh

DOM4 = [[0.0, 2.0]] * 4


def f_jax(p, _=None):
    return jnp.sum(jnp.sin(p), axis=1) + jnp.prod(jnp.cos(p * 0.5),
                                                  axis=1)


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


class TestShardedOracleBuild:
    def test_cross_same_evals_and_close_cores(self, mesh8):
        a = ChebyshevTT(f_jax, 4, DOM4, [9] * 4, max_rank=6,
                        vectorized=True)
        a.build(verbose=False, seed=3)
        b = ChebyshevTT(f_jax, 4, DOM4, [9] * 4, max_rank=6,
                        vectorized=True)
        b.build(verbose=False, seed=3, mesh=mesh8)
        assert a.total_build_evals == b.total_build_evals
        assert a.tt_ranks == b.tt_ranks
        pts = np.random.default_rng(0).uniform(0.05, 1.95, (512, 4))
        va, vb = a.eval_batch(pts), b.eval_batch(pts)
        assert np.abs(va - vb).max() / np.abs(va).max() < 1e-10

    def test_bit_identical_across_mesh_sizes(self, mesh8):
        mesh2 = make_mesh(2)
        a = ChebyshevTT(f_jax, 4, DOM4, [9] * 4, max_rank=6,
                        vectorized=True)
        a.build(verbose=False, seed=3, mesh=mesh2)
        b = ChebyshevTT(f_jax, 4, DOM4, [9] * 4, max_rank=6,
                        vectorized=True)
        b.build(verbose=False, seed=3, mesh=mesh8)
        assert a.total_build_evals == b.total_build_evals
        assert all(np.array_equal(x, y) for x, y in
                   zip(a._coeff_cores, b._coeff_cores))

    def test_svd_method_sharded(self, mesh8):
        a = ChebyshevTT(f_jax, 4, DOM4, [5] * 4, max_rank=5,
                        vectorized=True)
        a.build(verbose=False, method="svd")
        b = ChebyshevTT(f_jax, 4, DOM4, [5] * 4, max_rank=5,
                        vectorized=True)
        b.build(verbose=False, method="svd", mesh=mesh8)
        pts = np.random.default_rng(1).uniform(0.05, 1.95, (256, 4))
        va, vb = a.eval_batch(pts), b.eval_batch(pts)
        assert np.abs(va - vb).max() / np.abs(va).max() < 1e-10

    def test_refine_sweeps_sharded(self, mesh8):
        tt = ChebyshevTT(f_jax, 4, DOM4, [7] * 4, max_rank=5,
                         vectorized=True)
        tt.build(verbose=False, seed=1, refine_sweeps=2,
                 refine_samples=100, mesh=mesh8)
        pts = np.random.default_rng(2).uniform(0.05, 1.95, (256, 4))
        ref = np.asarray(f_jax(jnp.asarray(pts)))
        got = tt.eval_batch(pts)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-3

    def test_run_completion_sharded(self, mesh8):
        tt = ChebyshevTT(f_jax, 4, DOM4, [6] * 4, max_rank=4,
                         vectorized=True)
        tt.build(verbose=False, seed=0)
        tt.run_completion(max_iter=3, mesh=mesh8)
        pts = np.random.default_rng(3).uniform(0.05, 1.95, (128, 4))
        ref = np.asarray(f_jax(jnp.asarray(pts)))
        got = tt.eval_batch(pts)
        assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-2

    def test_nonvectorized_rejected(self, mesh8):
        with pytest.raises(ValueError, match="vectorized"):
            GridOracle(lambda p, _: 0.0, [np.linspace(0, 1, 5)],
                       vectorized=False, mesh=mesh8)

    def test_uneven_batch_pads(self, mesh8):
        # 54 rows over an 8-device axis — the padded path.
        from pychebyshev_tpu.parallel.sharding import sharded_vectorized
        w = sharded_vectorized(f_jax, mesh8)
        pts = np.random.default_rng(4).uniform(0, 2, (54, 4))
        got = w(pts, None)
        want = np.asarray(jax_jit_ref(pts))
        np.testing.assert_array_equal(got, want)


def jax_jit_ref(pts):
    import jax
    return jax.jit(lambda p: f_jax(p, None))(jnp.asarray(pts))
