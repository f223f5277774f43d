"""JAX-transform composability of the device eval paths.

The batched kernels are pure jnp functions, so grad/jacfwd/vmap/jit
compose with them — a capability the NumPy reference cannot offer.
These tests pin (a) AD gradients == analytic spectral derivatives, and
(b) the interpolant built from a traceable oracle is differentiable
end-to-end.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pychebyshev_tpu import ChebyshevApproximation
from pychebyshev_tpu.ops import eval as eval_ops

DOMAIN = [[-1.5, 1.5], [0.2, 2.0], [-1.0, 1.0]]


def f_np(points, _=None):
    p = np.asarray(points, dtype=np.float64)
    return np.sin(p[:, 0]) * np.exp(0.3 * p[:, 1]) + p[:, 2] ** 3


@pytest.fixture(scope="module")
def cheb():
    c = ChebyshevApproximation(f_np, 3, DOMAIN, [13, 13, 13],
                               vectorized=True)
    c.build(verbose=False)
    return c


class TestGradMatchesSpectral:
    def test_grad_equals_analytic_derivative(self, cheb):
        nodes, weights, diffs = cheb._grid_tuples()

        def value_at(pt):
            return eval_ops.eval_batch(cheb.tensor_values, nodes, weights,
                                       diffs, pt[None, :],
                                       (0, 0, 0))[0]

        pts = np.array([[0.3, 1.15, -0.4], [-0.9, 0.5, 0.8]])
        ad = jax.vmap(jax.grad(value_at))(jnp.asarray(pts))
        for d in range(3):
            orders = [0, 0, 0]
            orders[d] = 1
            spectral = cheb.vectorized_eval_batch(pts, orders)
            np.testing.assert_allclose(np.asarray(ad)[:, d], spectral,
                                       rtol=1e-8, atol=1e-10)

    def test_grad_zero_exactly_at_node(self, cheb):
        """Documented caveat: AT a grid node the branchless one-hot
        shortcut has zero AD derivative (measure-zero set).  Use the
        spectral derivative spec there — it folds D into the tensor and
        is exact everywhere, nodes included."""
        nodes, weights, diffs = cheb._grid_tuples()

        def value_at(pt):
            return eval_ops.eval_batch(cheb.tensor_values, nodes, weights,
                                       diffs, pt[None, :],
                                       (0, 0, 0))[0]

        node1 = float(np.asarray(cheb.nodes[1])[6])   # centre node
        pt = jnp.asarray([0.3, node1, -0.4])
        g = jax.grad(value_at)(pt)
        assert float(g[1]) == 0.0                      # AD blind spot
        spectral = cheb.vectorized_eval(
            [0.3, node1, -0.4], [0, 1, 0])             # spectral is not
        assert abs(spectral) > 1e-3

    def test_second_order_jacfwd(self, cheb):
        nodes, weights, diffs = cheb._grid_tuples()

        def value_at(pt):
            return eval_ops.eval_batch(cheb.tensor_values, nodes, weights,
                                       diffs, pt[None, :],
                                       (0, 0, 0))[0]

        pt = jnp.asarray([0.25, 0.9, 0.1])
        hess = jax.jacfwd(jax.grad(value_at))(pt)
        gamma = cheb.vectorized_eval(list(np.asarray(pt)), [2, 0, 0])
        cross = cheb.vectorized_eval(list(np.asarray(pt)), [1, 1, 0])
        assert abs(float(hess[0, 0]) - gamma) < 1e-7 * max(1, abs(gamma))
        assert abs(float(hess[0, 1]) - cross) < 1e-7 * max(1, abs(cross))

    def test_grad_wrt_tensor_values(self, cheb):
        """Differentiating through the *model parameters* (the value
        tensor) — the pattern for calibration/fitting loops."""
        nodes, weights, diffs = cheb._grid_tuples()
        pts = jnp.asarray([[0.3, 1.1, -0.4]])
        target = 1.2345

        def loss(tensor):
            out = eval_ops.eval_batch(tensor, nodes, weights, diffs,
                                      pts, (0, 0, 0))
            return jnp.sum((out - target) ** 2)

        g = jax.grad(loss)(cheb.tensor_values)
        assert g.shape == cheb.tensor_values.shape
        # gradient wrt nodal values == 2*(p(x)-t) * coefficient outer
        # product; check the directional derivative numerically
        direction = jnp.ones_like(g) / g.size
        eps = 1e-6
        num = (loss(cheb.tensor_values + eps * direction)
               - loss(cheb.tensor_values - eps * direction)) / (2 * eps)
        ad = jnp.vdot(g, direction)
        np.testing.assert_allclose(float(ad), float(num), rtol=1e-5)


class TestTTAutodiff:
    def test_grad_matches_analytic_tt_derivative(self):
        """jax.grad through the TT chain agrees with the analytic
        derivative TT (differentiate()) — both beyond-reference."""
        from pychebyshev_tpu import ChebyshevTT
        from pychebyshev_tpu.ops.tt_eval import tt_eval_batch

        tt = ChebyshevTT(f_np, 3, DOMAIN, [11] * 3, max_rank=8,
                         vectorized=True)
        tt.build(verbose=False, seed=0)
        cores = tuple(jnp.asarray(c) for c in tt._coeff_cores)
        dom = np.asarray(DOMAIN, dtype=np.float64)

        def value_at(pt):
            return tt_eval_batch(cores, dom, pt[None, :])[0]

        pts = np.array([[0.3, 1.1, -0.4], [-0.7, 0.6, 0.2]])
        ad = jax.vmap(jax.grad(value_at))(jnp.asarray(pts))
        for d in range(3):
            orders = [0, 0, 0]
            orders[d] = 1
            dtt = tt.differentiate(orders)
            dcores = tuple(jnp.asarray(c) for c in dtt._coeff_cores)
            analytic = np.asarray(tt_eval_batch(dcores, dom,
                                                jnp.asarray(pts)))
            np.testing.assert_allclose(np.asarray(ad)[:, d], analytic,
                                       rtol=1e-9, atol=1e-10)


class TestEndToEndTraceable:
    def test_build_and_eval_inside_jit(self):
        """A traceable oracle interpolant can live entirely inside one
        jitted function (build grid -> tensor -> query)."""
        from pychebyshev_tpu.ops.chebyshev import (
            barycentric_weights, differentiation_matrix, nodes_for_dim)

        n = 9
        nodes = tuple(nodes_for_dim(DOMAIN[d][0], DOMAIN[d][1], n)
                      for d in range(3))
        weights = tuple(barycentric_weights(nd) for nd in nodes)
        diffs = tuple(differentiation_matrix(nd, w)
                      for nd, w in zip(nodes, weights))

        def f_jnp(p):
            return jnp.sin(p[:, 0]) * jnp.exp(0.3 * p[:, 1]) + p[:, 2] ** 3

        @jax.jit
        def build_and_query(queries):
            g = jnp.stack(jnp.meshgrid(*nodes, indexing="ij"),
                          axis=-1).reshape(-1, 3)
            tensor = f_jnp(g).reshape(n, n, n)
            return eval_ops.eval_batch(tensor, nodes, weights, diffs,
                                       queries, (0, 0, 0))

        q = jnp.asarray([[0.3, 1.1, -0.4]])
        out = build_and_query(q)
        exact = f_np(np.asarray(q))
        np.testing.assert_allclose(np.asarray(out), exact, atol=1e-6)
