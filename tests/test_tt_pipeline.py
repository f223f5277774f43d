"""Pipeline-parallel TT evaluation (shard_map + ppermute ring)."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pychebyshev_tpu import ChebyshevTT
from pychebyshev_tpu.parallel.sharding import make_mesh
from pychebyshev_tpu.parallel.tt_pipeline import tt_eval_batch_pp
from pychebyshev_tpu.ops.tt_eval import tt_eval_batch


def f5(x, _):
    return (math.sin(x[0]) + math.cos(x[1]) * x[2]
            + math.exp(-x[3]) * x[4])


@pytest.fixture(scope="module")
def tt5():
    tt = ChebyshevTT(f5, 5, [[-1, 1]] * 5, [9] * 5, max_rank=8)
    tt.build(verbose=False, seed=0)
    return tt


@pytest.fixture(scope="module")
def reference(tt5):
    pts = np.random.default_rng(0).uniform(-1, 1, (1003, 5))
    cores = tuple(jnp.asarray(c) for c in tt5._coeff_cores)
    ref = tt_eval_batch(cores, np.asarray(tt5.domain, float),
                        jnp.asarray(pts))
    return pts, np.asarray(ref)


@pytest.mark.parametrize("n_stages", [2, 4, 8])
def test_matches_serial_chain(tt5, reference, n_stages):
    pts, ref = reference
    mesh = make_mesh(n_stages, axis_names=("pp",))
    out = tt_eval_batch_pp([jnp.asarray(c) for c in tt5._coeff_cores],
                           tt5.domain, pts, mesh)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-13)


def test_small_microbatch_more_steps(tt5, reference):
    pts, ref = reference
    mesh = make_mesh(4, axis_names=("pp",))
    out = tt_eval_batch_pp([jnp.asarray(c) for c in tt5._coeff_cores],
                           tt5.domain, pts, mesh, microbatch=64)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-13)


def test_single_point(tt5):
    mesh = make_mesh(4, axis_names=("pp",))
    pt = np.array([[0.3, -0.2, 0.5, 0.1, -0.7]])
    out = tt_eval_batch_pp([jnp.asarray(c) for c in tt5._coeff_cores],
                           tt5.domain, pt, mesh)
    assert abs(float(out[0]) - tt5.eval([0.3, -0.2, 0.5, 0.1, -0.7])) \
        < 1e-13


def test_pp_axis_in_larger_mesh(tt5, reference):
    # pp combined with an (unused here) dp axis in the same mesh
    pts, ref = reference
    mesh = make_mesh(8, axis_names=("dp", "pp"), shape=(2, 4))
    out = tt_eval_batch_pp([jnp.asarray(c) for c in tt5._coeff_cores],
                           tt5.domain, pts, mesh, axis="pp")
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-13)


def test_f32_cores(tt5, reference):
    pts, ref = reference
    mesh = make_mesh(4, axis_names=("pp",))
    cores32 = [jnp.asarray(c, jnp.float32) for c in tt5._coeff_cores]
    out = tt_eval_batch_pp(cores32, tt5.domain, pts, mesh)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out, np.float64), ref,
                               atol=5e-5)
