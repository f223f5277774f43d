"""Multi-chip patterns on a virtual 8-device mesh: dp / tp / pp serving.

Runs anywhere — forces an 8-virtual-device CPU mesh, the same way the
test suite validates sharding without hardware.  On a real TPU pod
slice, drop the XLA_FLAGS forcing and the same code rides ICI.

Run:  python examples/multi_chip.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
from scipy.stats import norm  # noqa: E402

from pychebyshev_tpu import ChebyshevApproximation, ChebyshevTT  # noqa: E402
from pychebyshev_tpu.parallel import sharding as sh  # noqa: E402
from pychebyshev_tpu.parallel.tt_pipeline import tt_eval_batch_pp  # noqa: E402
from pychebyshev_tpu.serving import BatchedEvaluator  # noqa: E402

DOMAIN = [[80.0, 120.0], [90.0, 110.0], [0.25, 2.0], [0.1, 0.5],
          [0.01, 0.05]]


def bs_price(points, _=None):
    points = np.asarray(points, dtype=np.float64)
    s, k, t, sigma, r = (points[:, i] for i in range(5))
    sqrt_t = np.sqrt(t)
    d1 = (np.log(s / k) + (r + 0.5 * sigma ** 2) * t) / (sigma * sqrt_t)
    d2 = d1 - sigma * sqrt_t
    return s * norm.cdf(d1) - k * np.exp(-r * t) * norm.cdf(d2)


def main():
    print(f"devices: {len(jax.devices())}")
    cheb = ChebyshevApproximation(bs_price, 5, DOMAIN, [8] * 5,
                                  vectorized=True)
    cheb.build(verbose=False)
    rng = np.random.default_rng(0)
    lo = np.array([b[0] for b in DOMAIN])
    hi = np.array([b[1] for b in DOMAIN])
    pts = lo + (hi - lo) * rng.uniform(0.02, 0.98, (4096, 5))
    exact = bs_price(pts)

    # --- dp: query batch sharded over 8 chips --------------------------
    mesh = sh.make_mesh(8, axis_names=("dp",))
    nodes, weights, diffs = cheb._grid_tuples()
    out_dp = np.asarray(sh.eval_batch_dp(
        cheb.tensor_values, nodes, weights, diffs, pts, mesh,
        (0,) * 5))
    print(f"dp eval:   max |err| vs analytic "
          f"{np.max(np.abs(out_dp - exact)):.2e}")

    # --- tp: the value tensor itself sharded over chips ----------------
    mesh2 = sh.make_mesh(8, axis_names=("dp", "tp"), shape=(4, 2))
    out_tp = np.asarray(sh.eval_batch_tp(
        cheb.tensor_values, nodes, weights, diffs, pts, mesh2))
    print(f"tp eval:   max |dp-tp| {np.max(np.abs(out_tp - out_dp)):.2e}")

    # --- pp: TT core chain staged around a ppermute ring ----------------
    tt = ChebyshevTT(bs_price, 5, DOMAIN, [8] * 5, max_rank=8,
                     vectorized=True)
    tt.build(verbose=False, seed=0)
    pp_mesh = sh.make_mesh(8, axis_names=("pp",))
    cores = tuple(jnp.asarray(c) for c in tt._coeff_cores)
    out_pp = np.asarray(tt_eval_batch_pp(cores, DOMAIN, pts, pp_mesh))
    serial = tt.eval_batch(pts)
    print(f"pp TT:     max |pp-serial| "
          f"{np.max(np.abs(out_pp - serial)):.2e} "
          f"({pp_mesh.shape['pp']} pipeline stages)")

    # --- mesh-aware serving engine --------------------------------------
    engine = BatchedEvaluator(cheb, dtype=jnp.float64,
                              bucket_sizes=(512, 4096), mesh=mesh)
    engine.warmup()
    out_engine = engine(pts)
    print(f"dp engine: max |engine-dp| "
          f"{np.max(np.abs(out_engine - out_dp)):.2e} "
          f"(precompiled buckets, sharded)")

    # --- near-f64 over the mesh ------------------------------------------
    # dp: digit planes replicate, points shard.
    out_dd = np.asarray(sh.eval_batch_dd_dp(
        cheb.tensor_values, nodes, weights, diffs, pts, mesh, (0,) * 5))
    f64_ref = cheb.vectorized_eval_batch(pts, [0] * 5)
    print(f"dd dp:     max |dd-f64| "
          f"{np.max(np.abs(out_dd - f64_ref)):.2e} (near-f64, sharded)")
    # tp: the exact contraction itself shards, which RAISES each
    # device's MXU-exactness budget — grids the single-chip digit plan
    # refuses (supports_dd False) become eligible (dd_tp_plan).
    out_ddtp = np.asarray(sh.eval_batch_dd_tp(
        cheb.tensor_values, nodes, weights, diffs, pts, mesh2))
    print(f"dd tp:     max |ddtp-f64| "
          f"{np.max(np.abs(out_ddtp - f64_ref)):.2e} "
          f"(contraction sharded over tp)")


if __name__ == "__main__":
    main()
