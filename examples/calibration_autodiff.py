"""Calibrating an interpolant to market quotes with jax.grad + optax.

The batched eval kernel is a pure jnp function, so the interpolant's
*parameters* (its nodal value tensor) are differentiable: given noisy
market quotes at scattered points, gradient descent recovers a value
tensor whose interpolant fits the quotes — a smile-surface calibration
loop running entirely on device.  The NumPy reference cannot express
this at all.

Run:  python examples/calibration_autodiff.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import pychebyshev_tpu  # noqa: F401  (x64 on)
import jax
import jax.numpy as jnp
import optax

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.ops import eval as eval_ops

DOMAIN = [[80.0, 120.0], [0.25, 2.0]]   # (strike, maturity) vol surface


def true_vol(points):
    """The 'market' smile the quotes come from (unknown to the model)."""
    p = np.asarray(points, dtype=np.float64)
    k, t = p[:, 0], p[:, 1]
    m = np.log(k / 100.0)
    return 0.2 + 0.3 * m ** 2 / (1 + t) + 0.02 * np.sqrt(t)


def main():
    # Start from a FLAT surface — calibration must discover the smile.
    flat = ChebyshevApproximation(
        lambda pts, _: np.full(len(np.asarray(pts)), 0.25), 2, DOMAIN,
        [13, 9], vectorized=True)
    flat.build(verbose=False)
    nodes, weights, diffs = flat._grid_tuples()
    orders = (0, 0)

    # Noisy market quotes at scattered (strike, maturity) points.
    rng = np.random.default_rng(0)
    quotes_x = np.column_stack([rng.uniform(82, 118, 400),
                                rng.uniform(0.3, 1.9, 400)])
    quotes_v = true_vol(quotes_x) + rng.normal(0, 2e-4, 400)
    qx = jnp.asarray(quotes_x)
    qv = jnp.asarray(quotes_v)

    def loss(tensor):
        fit = eval_ops.eval_batch(tensor, nodes, weights, diffs, qx,
                                  orders)
        # quote misfit + curvature penalty (2nd derivative along strike)
        curv = eval_ops.eval_batch(tensor, nodes, weights, diffs, qx,
                                   (2, 0))
        return (jnp.mean((fit - qv) ** 2)
                + 1e-9 * jnp.mean(curv ** 2))

    opt = optax.adam(2e-3)
    tensor = flat.tensor_values
    state = opt.init(tensor)
    grad_fn = jax.jit(jax.value_and_grad(loss))

    for step in range(400):
        val, g = grad_fn(tensor)
        updates, state = opt.update(g, state)
        tensor = optax.apply_updates(tensor, updates)
        if step % 100 == 0:
            print(f"step {step:4d}: loss {float(val):.3e}")

    calibrated = ChebyshevApproximation.from_values(
        np.asarray(tensor), 2, DOMAIN, [13, 9])

    test = np.column_stack([rng.uniform(85, 115, 1000),
                            rng.uniform(0.4, 1.8, 1000)])
    fit = calibrated.vectorized_eval_batch(test, [0, 0])
    err = np.abs(fit - true_vol(test))
    print(f"calibrated surface vs true smile (1000 holdout pts): "
          f"mean {err.mean():.2e}, max {err.max():.2e}")
    print(f"smile recovered: vol(90, 1.0) = "
          f"{calibrated.vectorized_eval([90.0, 1.0], [0, 0]):.4f} "
          f"(true {true_vol([[90.0, 1.0]])[0]:.4f}), started at 0.25")

    # The calibrated object is a first-class interpolant: greeks,
    # serialization, serving — everything applies.
    skew = calibrated.vectorized_eval([100.0, 1.0], [1, 0])
    print(f"calibrated skew d(vol)/dK at ATM: {skew:.5f}")


if __name__ == "__main__":
    main()
