"""Chebyshev grid primitives: nodes, barycentric weights, differentiation.

Pure functions of static shapes, implemented in JAX so they trace and fuse
under ``jit``.  Numerical conventions follow the NumPy reference
implementation (for behavioral parity, not translation):

- Type-I Chebyshev points (``numpy.polynomial.chebyshev.chebpts1``),
  scaled to the physical domain and sorted ascending
  (reference ``_extrude_slice.py:66-70``).
- Barycentric weights ``w_i = 1 / prod_{j != i} (x_i - x_j)``
  (reference ``barycentric.py:30-49``).
- Spectral differentiation matrix after Berrut & Trefethen (2004) §9.3
  (reference ``barycentric.py:52-77``).

All of these are O(n) / O(n^2) with n <= ~100; they run at build time,
not in the query hot path, so clarity and exact convention parity win
over micro-optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "chebpts1",
    "nodes_for_dim",
    "barycentric_weights",
    "differentiation_matrix",
    "chebyshev_polynomial_matrix",
    "barycentric_interpolate",
    "barycentric_derivative_analytical",
    "compute_barycentric_weights",
    "compute_differentiation_matrix",
]


@functools.lru_cache(maxsize=None)
def _chebpts1_np(n: int):
    import numpy as np
    k = np.arange(n, dtype=np.float64)
    return -np.cos(np.pi * (2.0 * k + 1.0) / (2.0 * n))


def nodes_for_dim_np(lo, hi, n: int):
    """Host-side :func:`nodes_for_dim` (build-time metadata — computing
    these tiny arrays on host avoids a device compile per node count)."""
    import numpy as np
    return np.ascontiguousarray(
        0.5 * (lo + hi) + 0.5 * (hi - lo) * _chebpts1_np(n))


def barycentric_weights_np(nodes):
    """Host-side :func:`barycentric_weights`.

    Rejects degenerate node sets (coinciding nodes from a crafted or
    near-collapsed domain, f64 over/underflow of the weight products)
    with a ValueError instead of silently emitting inf/NaN weights —
    this is the load-time finiteness gate for ``from_values`` /
    ``read_approx`` / ``read_spline``.
    """
    import numpy as np
    nodes = np.asarray(nodes, dtype=np.float64)
    n = nodes.shape[0]
    if n <= 512:
        diff = nodes[:, None] - nodes[None, :]
        np.fill_diagonal(diff, 1.0)
        with np.errstate(divide="ignore", over="ignore",
                         invalid="ignore"):
            prod = np.prod(diff, axis=1)
            w = 1.0 / prod
        if np.isfinite(w).all() and not (w == 0.0).any():
            # Power-of-two normalization (see barycentric_weights):
            # exact, and keeps narrow-domain weights inside f32 range
            # for the device.
            return w * 2.0 ** -np.round(np.log2(np.abs(w).max()))
        # Non-finite here is EITHER a truly degenerate grid OR mere
        # f64 over/underflow of the product (narrow domains make every
        # diff tiny: (2/width)^(n-1) blows past f64 range well under
        # n = 512).  The chunked path below distinguishes the two.

    # Overflow-free path: the naive product over/underflows f64 past a
    # few hundred nodes (or far fewer on narrow domains).  Track a
    # (mantissa, binary exponent) pair with frexp renormalization per
    # 512-column chunk (512 mantissas in [0.5, 1) bottom out at 2^-512,
    # inside f64 range) — the same multiply sequence up to exact
    # power-of-two rescaling, so no log/exp accuracy loss.  Also the
    # load path for grids served by the tensor-parallel digit-GEMM tier
    # (node counts past the single-chip budget).
    mant = np.ones(n)
    expo = np.zeros(n, dtype=np.int64)
    for start in range(0, n, 512):
        stop = min(start + 512, n)
        d = nodes[:, None] - nodes[None, start:stop]
        idx = np.arange(start, stop)
        d[idx, idx - start] = 1.0
        m, e = np.frexp(d)
        mant *= np.prod(m, axis=1)
        expo += e.sum(axis=1, dtype=np.int64)
        mant, e2 = np.frexp(mant)
        expo += e2
    # mant == 0 marks a coinciding-node row (frexp(0) -> (0, 0)).
    if (mant == 0.0).any():
        raise ValueError(
            "degenerate Chebyshev grid: coinciding nodes (collapsed "
            "domain?) give non-finite barycentric weights"
        )
    w = np.ldexp(1.0 / mant, (-expo + expo.min()).astype(np.int64))
    if not np.isfinite(w).all() or (w == 0.0).any():
        raise ValueError(
            "degenerate Chebyshev grid: coinciding nodes (collapsed "
            "domain?) give non-finite barycentric weights"
        )
    return w * 2.0 ** -np.round(np.log2(np.abs(w).max()))


def differentiation_matrix_np(nodes, weights):
    """Host-side :func:`differentiation_matrix`."""
    import numpy as np
    nodes = np.asarray(nodes, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    c = nodes[:, None] - nodes[None, :]
    np.fill_diagonal(c, 1.0)
    d = weights[None, :] / (c * weights[:, None])
    np.fill_diagonal(d, 0.0)
    np.fill_diagonal(d, -np.sum(d, axis=1))
    return d


@functools.partial(jax.jit, static_argnums=0)
def chebpts1(n: int) -> jax.Array:
    """Type-I Chebyshev points on [-1, 1], ascending.

    ``x_k = -cos(pi * (2k + 1) / (2n))`` for ``k = 0..n-1`` — identical to
    ``numpy.polynomial.chebyshev.chebpts1(n)`` (which evaluates
    ``cos(linspace(-pi, 0, n) + pi/(2n))``) up to 1-ulp rounding.
    """
    k = jnp.arange(n, dtype=jnp.float64)
    return -jnp.cos(jnp.pi * (2.0 * k + 1.0) / (2.0 * n))


@functools.partial(jax.jit, static_argnums=2)
def nodes_for_dim(lo, hi, n: int) -> jax.Array:
    """Chebyshev Type-I nodes scaled to [lo, hi], ascending."""
    std = chebpts1(n)
    return 0.5 * (lo + hi) + 0.5 * (hi - lo) * std


@jax.jit
def barycentric_weights(nodes: jax.Array) -> jax.Array:
    """Barycentric weights, power-of-two normalized.

    The raw weights ``1 / prod_{j != i} (x_i - x_j)`` are scaled by
    ``2^-round(log2 max|w|)`` so max |w| lands in [0.7, 1.42].  Every
    consumer is scale-invariant — evaluation rows normalize by their
    sum, and the differentiation matrix uses weight RATIOS — and a
    power-of-two scale is floating-point-exact, so results are
    bit-identical to the raw-weight formulation.  The normalization
    matters on TPU: raw weights grow like ``(2/width)^(n-1)``, and a
    21-node grid on a width-0.04 domain reaches 4.8e38 — beyond f32
    range, and TPU's *emulated f64* is an (hi, lo) f32 pair with f32's
    RANGE, so raw weights overflow to inf on device (f64 included).
    (Production builds compute grid metadata through the host ``_np``
    variant and transfer; this traced version serves traceable-pipeline
    demos and tests, where the pre-scale product must itself fit the
    backend's range.)
    """
    n = nodes.shape[0]
    diff = nodes[:, None] - nodes[None, :]
    diff = jnp.where(jnp.eye(n, dtype=bool), 1.0, diff)
    w = 1.0 / jnp.prod(diff, axis=1)
    scale = jnp.exp2(-jnp.round(jnp.log2(jnp.max(jnp.abs(w)))))
    return w * scale


@jax.jit
def differentiation_matrix(nodes: jax.Array, weights: jax.Array) -> jax.Array:
    """Spectral differentiation matrix (Berrut & Trefethen 2004, §9.3).

    ``D[i, j] = (w_j / w_i) / (x_i - x_j)`` off-diagonal,
    ``D[i, i] = -sum_{j != i} D[i, j]`` (negative row sum).
    ``D @ f`` gives derivative values at the nodes.
    """
    n = nodes.shape[0]
    eye = jnp.eye(n, dtype=bool)
    c = nodes[:, None] - nodes[None, :]
    c = jnp.where(eye, 1.0, c)
    d = weights[None, :] / (c * weights[:, None])
    d = jnp.where(eye, 0.0, d)
    row_sum = jnp.sum(d, axis=1)
    return jnp.where(eye, -row_sum[:, None], d)


def barycentric_interpolate(x, nodes, values, weights,
                            skip_check: bool = False) -> float:
    """1-D barycentric evaluation at a scalar point (reference-surface
    convenience; the batched kernels in ``ops.eval`` are the hot path).

    ``skip_check=True`` skips the node-coincidence test (reference
    ``barycentric.py:80-106`` semantics).
    """
    from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL
    import numpy as np

    nodes = np.asarray(nodes, dtype=np.float64)
    values = np.asarray(values, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    if not skip_check:
        diffs = np.abs(nodes - x)
        if np.any(diffs < NODE_COINCIDENCE_TOL):
            return float(values[np.argmin(diffs)])
    w_over = weights / (x - nodes)
    return float(np.sum(w_over * values) / np.sum(w_over))


def barycentric_derivative_analytical(x, nodes, values, weights,
                                      diff_matrix, order: int = 1) -> float:
    """1-D analytic derivative via the spectral differentiation matrix
    (order 1 or 2; reference ``barycentric.py:109-146``)."""
    import numpy as np

    if order not in (1, 2):
        raise ValueError(
            f"Derivative order {order} not supported (use 1 or 2)"
        )
    diff_matrix = np.asarray(diff_matrix, dtype=np.float64)
    deriv_values = diff_matrix @ np.asarray(values, dtype=np.float64)
    if order == 2:
        deriv_values = diff_matrix @ deriv_values
    return barycentric_interpolate(x, nodes, deriv_values, weights)


# Reference-name aliases (drop-in for the NumPy implementation's
# module-level helpers).
compute_barycentric_weights = barycentric_weights
compute_differentiation_matrix = differentiation_matrix


@functools.partial(jax.jit, static_argnums=1)
def chebyshev_polynomial_matrix(x: jax.Array, n: int) -> jax.Array:
    """Matrix ``Q[m, k] = T_k(x[m])`` for ``k = 0..n-1`` (Chebyshev-Vandermonde).

    Computed by the three-term recurrence ``T_k = 2 x T_{k-1} - T_{k-2}``
    (matching ``numpy.polynomial.chebyshev.chebval`` evaluation of the
    identity coefficient matrix in the reference TT eval path,
    ``tensor_train.py:2257-2259``), unrolled statically — n is a small
    compile-time constant, so XLA fuses the whole recurrence.
    """
    x = jnp.asarray(x)
    cols = [jnp.ones_like(x)]
    if n > 1:
        cols.append(x)
    for _ in range(2, n):
        cols.append(2.0 * x * cols[-1] - cols[-2])
    return jnp.stack(cols, axis=-1)
