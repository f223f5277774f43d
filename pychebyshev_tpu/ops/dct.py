"""Chebyshev value <-> coefficient transforms as explicit cosine matmuls.

The reference implementation leans on ``scipy.fft.dct`` (types 2 and 3)
with a reverse-axis + divide-by-n + halve-c0 convention that appears in
five distinct subsystems (error estimation, TT core transforms both
directions, Sobol sensitivity, Fejer quadrature weights) — see reference
``barycentric.py:1249-1276``, ``tensor_train.py:997-1043``,
``_sensitivity.py:14-49``, ``_calculus.py:18-49``.

On TPU the node counts are tiny (n <= ~100), so an O(n^2) cosine-matrix
matmul on the MXU beats an FFT decomposition and — more importantly —
lets us bake the *entire* convention (axis reversal, 1/n scaling, c0
halving) into a single constant matrix per n.  One matrix, one matmul,
zero convention drift.

Matrices are cached per (kind, n) since n is a static shape parameter.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "coeff_matrix",
    "synthesis_matrix",
    "dct3_matrix",
    "values_to_coeffs",
    "coeffs_to_values",
]


@functools.lru_cache(maxsize=None)
def _coeff_matrix_np(n: int) -> np.ndarray:
    """Values-at-ascending-Type-I-nodes -> Chebyshev coefficients c_0..c_{n-1}.

    Encodes the reference convention (``barycentric.py:1249-1276``):
    reverse to descending node order, DCT-II, divide by n, halve c_0.
    Row k, applied to ascending values v_i:

        c_k = (2 - delta_{k0}) / n * sum_i v_i * cos(pi k (2(n-1-i)+1) / (2n))

    Built in float64 NumPy once per n (exact trig, no trace), then reused
    as a jit-constant.
    """
    k = np.arange(n, dtype=np.float64)[:, None]
    j = np.arange(n, dtype=np.float64)[None, :]  # descending-order index
    base = np.cos(np.pi * k * (2.0 * j + 1.0) / (2.0 * n))
    scale = np.full((n, 1), 2.0 / n)
    scale[0, 0] = 1.0 / n
    mat = scale * base
    # map from descending index j to ascending index i = n-1-j
    return np.ascontiguousarray(mat[:, ::-1])


@functools.lru_cache(maxsize=None)
def _synthesis_matrix_np(n: int) -> np.ndarray:
    """Chebyshev coefficients -> values at ascending Type-I nodes.

    ``S[i, k] = T_k(x_i)`` with ``x_i`` ascending Type-I points; the exact
    inverse of :func:`_coeff_matrix_np` (reference round-trips via IDCT,
    ``tensor_train.py:1019-1043``).  Uses the closed form
    ``T_k(x_i) = cos(k * theta_i)`` with ``theta_i = (2(n-1-i)+1)pi/(2n)``.
    """
    i = np.arange(n, dtype=np.float64)
    theta = (2.0 * (n - 1 - i) + 1.0) * np.pi / (2.0 * n)
    k = np.arange(n, dtype=np.float64)
    return np.ascontiguousarray(np.cos(theta[:, None] * k[None, :]))


@functools.lru_cache(maxsize=None)
def _dct3_matrix_np(n: int) -> np.ndarray:
    """Unnormalized SciPy DCT-III as a matrix (used by Fejer weights).

    ``y[j] = x[0] + 2 * sum_{k>=1} x[k] cos(pi k (2j+1) / (2n))``.
    """
    j = np.arange(n, dtype=np.float64)[:, None]
    k = np.arange(n, dtype=np.float64)[None, :]
    mat = 2.0 * np.cos(np.pi * k * (2.0 * j + 1.0) / (2.0 * n))
    mat[:, 0] = 1.0
    return np.ascontiguousarray(mat)


def coeff_matrix(n: int) -> jax.Array:
    """JAX constant: values (ascending nodes) -> Chebyshev coefficients."""
    return jnp.asarray(_coeff_matrix_np(n))


def synthesis_matrix(n: int) -> jax.Array:
    """JAX constant: Chebyshev coefficients -> values at ascending nodes."""
    return jnp.asarray(_synthesis_matrix_np(n))


def dct3_matrix(n: int) -> jax.Array:
    """JAX constant: unnormalized DCT-III matrix."""
    return jnp.asarray(_dct3_matrix_np(n))


def values_to_coeffs(values: jax.Array, axis: int = -1) -> jax.Array:
    """Chebyshev coefficients along ``axis`` from values at ascending nodes."""
    n = values.shape[axis]
    out = jnp.tensordot(values, coeff_matrix(n), axes=([axis], [1]))
    return jnp.moveaxis(out, -1, axis)


def coeffs_to_values(coeffs: jax.Array, axis: int = -1) -> jax.Array:
    """Values at ascending nodes from Chebyshev coefficients along ``axis``."""
    n = coeffs.shape[axis]
    out = jnp.tensordot(coeffs, synthesis_matrix(n), axes=([axis], [1]))
    return jnp.moveaxis(out, -1, axis)
