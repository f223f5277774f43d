"""Stage-0 kernel substrate: golden tests vs NumPy/SciPy conventions."""

import numpy as np
import pytest
from numpy.polynomial.chebyshev import chebpts1 as np_chebpts1
from scipy.fft import dct as scipy_dct

from pychebyshev_tpu.ops.chebyshev import (
    barycentric_weights,
    chebpts1,
    chebyshev_polynomial_matrix,
    differentiation_matrix,
    nodes_for_dim,
)
from pychebyshev_tpu.ops.dct import (
    coeff_matrix,
    coeffs_to_values,
    synthesis_matrix,
    values_to_coeffs,
)
from pychebyshev_tpu.ops.quadrature import fejer1_weights, sub_interval_weights
from pychebyshev_tpu.ops import eval as eval_ops


@pytest.mark.parametrize("n", [1, 2, 3, 5, 11, 33, 64])
def test_chebpts1_matches_numpy(n):
    ours = np.asarray(chebpts1(n))
    theirs = np_chebpts1(n)
    np.testing.assert_allclose(ours, theirs, atol=1e-15)
    assert np.all(np.diff(ours) > 0) or n == 1


def test_nodes_for_dim_scaling():
    nodes = np.asarray(nodes_for_dim(80.0, 120.0, 11))
    expected = np.sort(100.0 + 20.0 * np_chebpts1(11))
    np.testing.assert_allclose(nodes, expected, atol=1e-12)
    assert nodes[0] > 80.0 and nodes[-1] < 120.0


@pytest.mark.parametrize("n", [2, 5, 11, 21])
def test_barycentric_weights_vs_direct(n):
    nodes = np.sort(100.0 + 20.0 * np_chebpts1(n))
    # direct O(n^2) definition
    expected = np.ones(n)
    for i in range(n):
        for j in range(n):
            if j != i:
                expected[i] /= nodes[i] - nodes[j]
    ours = np.asarray(barycentric_weights(nodes))
    # weights are power-of-two normalized: ratios match the raw
    # definition exactly, and the scale is an exact power of two
    scale = ours[0] / expected[0]
    assert scale != 0 and (np.log2(abs(scale)) % 1.0) == 0.0
    np.testing.assert_allclose(ours, expected * scale, rtol=1e-12)
    assert 0.7 <= np.abs(ours).max() <= 1.42


def test_differentiation_matrix_derivative_accuracy():
    n = 24
    nodes = np.asarray(nodes_for_dim(-1.0, 2.0, n))
    w = barycentric_weights(nodes)
    d_mat = np.asarray(differentiation_matrix(nodes, w))
    # Row sums are zero (differentiating a constant gives 0)
    np.testing.assert_allclose(d_mat.sum(axis=1), 0.0, atol=1e-9)
    f = np.exp(nodes)
    df = d_mat @ f
    np.testing.assert_allclose(df, f, rtol=1e-9)


@pytest.mark.parametrize("n", [1, 2, 5, 11, 32])
def test_coeff_matrix_matches_scipy_dct_convention(n):
    rng = np.random.default_rng(0)
    values = rng.normal(size=n)
    # reference convention: reverse, DCT-II, /n, halve c0
    expected = scipy_dct(values[::-1], type=2) / n
    expected[0] /= 2
    ours = np.asarray(coeff_matrix(n)) @ values
    np.testing.assert_allclose(ours, expected, atol=1e-13)


@pytest.mark.parametrize("n", [1, 2, 5, 11, 32])
def test_synthesis_inverts_coeffs(n):
    m = np.asarray(coeff_matrix(n))
    s = np.asarray(synthesis_matrix(n))
    np.testing.assert_allclose(s @ m, np.eye(n), atol=1e-12)


def test_values_to_coeffs_axis():
    rng = np.random.default_rng(1)
    t = rng.normal(size=(4, 6, 5))
    for axis in range(3):
        ours = np.asarray(values_to_coeffs(t, axis=axis))
        n = t.shape[axis]
        expected = scipy_dct(np.flip(t, axis=axis), type=2, axis=axis) / n
        sl = [slice(None)] * 3
        sl[axis] = 0
        expected[tuple(sl)] /= 2
        np.testing.assert_allclose(ours, expected, atol=1e-13)
        back = np.asarray(coeffs_to_values(ours, axis=axis))
        np.testing.assert_allclose(back, t, atol=1e-12)


def test_chebyshev_polynomial_matrix():
    from numpy.polynomial.chebyshev import chebval
    x = np.linspace(-1, 1, 7)
    n = 9
    q = np.asarray(chebyshev_polynomial_matrix(x, n))
    expected = chebval(x, np.eye(n)).T
    np.testing.assert_allclose(q, expected, atol=1e-12)


# --- quadrature ---------------------------------------------------------


def test_fejer1_weights_integrate_polynomials():
    n = 12
    w = fejer1_weights(n)
    nodes = np.asarray(chebpts1(n))
    # exact for polynomials of degree < n
    for k in range(n):
        integral = np.sum(w * nodes ** k)
        exact = 0.0 if k % 2 == 1 else 2.0 / (k + 1)
        np.testing.assert_allclose(integral, exact, atol=1e-13)


def test_fejer1_matches_scipy_pipeline():
    n = 15
    moments = np.zeros(n)
    for k in range(0, n, 2):
        moments[k] = 2.0 / (1.0 - k * k)
    expected = (scipy_dct(moments, type=3) / n)[::-1]
    np.testing.assert_allclose(fejer1_weights(n), expected, atol=1e-14)


def test_sub_interval_weights_polynomial():
    n = 14
    t_lo, t_hi = -0.3, 0.8
    w = sub_interval_weights(n, t_lo, t_hi)
    nodes = np.asarray(chebpts1(n))
    for k in range(n):
        integral = np.sum(w * nodes ** k)
        exact = (t_hi ** (k + 1) - t_lo ** (k + 1)) / (k + 1)
        np.testing.assert_allclose(integral, exact, atol=1e-12)


def test_sub_interval_full_domain_equals_fejer():
    n = 9
    np.testing.assert_allclose(
        sub_interval_weights(n, -1.0, 1.0), fejer1_weights(n), atol=1e-12)


# --- eval kernels -------------------------------------------------------


def test_barycentric_coefficients_reproduce_polynomial():
    import jax.numpy as jnp
    n = 8
    nodes = nodes_for_dim(-2.0, 3.0, n)
    w = barycentric_weights(nodes)
    x = jnp.linspace(-2.0, 3.0, 17)
    c = eval_ops.barycentric_coefficients(x, nodes, w)
    # interpolation of a degree-(n-1) polynomial is exact
    values = np.asarray(nodes) ** 5 - 2 * np.asarray(nodes) + 1
    approx = np.asarray(c) @ values
    expected = np.asarray(x) ** 5 - 2 * np.asarray(x) + 1
    np.testing.assert_allclose(approx, expected, rtol=1e-11)


def test_barycentric_coefficients_exact_node_one_hot():
    import jax.numpy as jnp
    n = 8
    nodes = nodes_for_dim(0.0, 1.0, n)
    w = barycentric_weights(nodes)
    x = jnp.asarray([float(nodes[3])])
    c = np.asarray(eval_ops.barycentric_coefficients(x, nodes, w))
    expected = np.zeros(n)
    expected[3] = 1.0
    np.testing.assert_array_equal(c[0], expected)


def test_contract_dim_at_value_matches_take_at_node(cheb_sin3d):
    t = cheb_sin3d.tensor_values
    nodes = cheb_sin3d.nodes[1]
    out = np.asarray(eval_ops.contract_dim_at_value(
        t, 1, nodes, cheb_sin3d.weights[1], float(nodes[4])))
    np.testing.assert_array_equal(out, np.asarray(t)[:, 4, :])


class TestLargeNWeights:
    """barycentric_weights_np large-n path: the chunked frexp product
    (the naive product over/underflows past a few hundred nodes)."""

    def test_matches_analytic_chebyshev1_weights(self):
        from pychebyshev_tpu.ops.chebyshev import (
            barycentric_weights_np,
            nodes_for_dim_np,
        )
        n = 4096
        nodes = nodes_for_dim_np(-1.0, 1.0, n)
        w = barycentric_weights_np(nodes)
        # analytic Chebyshev-1 weights, reordered to ascending nodes
        k = np.arange(n)
        x_nat = np.cos((2 * k + 1) * np.pi / (2 * n))
        w_nat = ((-1.0) ** k) * np.sin((2 * k + 1) * np.pi / (2 * n))
        order = np.argsort(x_nat)
        w_ref = w_nat[order]
        ratio = w / w_ref
        assert np.abs(ratio / ratio[0] - 1.0).max() < 1e-9

    def test_continuity_with_small_n_path(self):
        from pychebyshev_tpu.ops.chebyshev import (
            barycentric_weights_np,
            nodes_for_dim_np,
        )
        # 512 runs the dense path, 513 the chunked one; both must give
        # the same weights for the same normalized problem (up to a
        # common power-of-two scale and f64 product roundoff).
        for n in (512, 513):
            nodes = nodes_for_dim_np(0.0, 2.0, n)
            w = barycentric_weights_np(nodes)
            assert np.isfinite(w).all()
            assert 0.5 <= np.abs(w).max() <= 2.0
            # alternating signs are a structural property
            assert np.all(np.sign(w[1:]) == -np.sign(w[:-1]))

    def test_degenerate_large_grid_rejected(self):
        from pychebyshev_tpu.ops.chebyshev import barycentric_weights_np
        nodes = np.linspace(-1, 1, 600)
        nodes[300] = nodes[301]
        with pytest.raises(ValueError, match="degenerate"):
            barycentric_weights_np(nodes)
