"""Batched dense-tensor barycentric evaluation — the query hot path.

TPU-first recast of the reference's per-point GEMV chain
(reference ``barycentric.py:885-1047``): instead of looping points in
Python, we build per-dimension *coefficient row vectors* for the whole
batch at once and contract the value tensor down one grid axis at a time:

    out[n] = sum_{i0..id} C0[n,i0] * ... * Cd[n,id] * T[i0,...,id]

- The first contraction is a single (N, n0) x (n0, rest) GEMM on the MXU.
- Each subsequent contraction is a batched reduction on the VPU.
- Derivative passes (spectral differentiation-matrix applications) are
  point-independent, so they are hoisted and applied to the tensor once
  per ``orders`` tuple — the same hoisting the reference does in
  ``vectorized_eval_batch`` (``barycentric.py:1023-1029``), but here the
  entire pipeline is one ``jit`` trace that XLA fuses.
- The exact-node coincidence branch (|x - node| < 1e-14 -> take the nodal
  value) is branchless: the coefficient vector degrades to a one-hot row,
  which reproduces the reference's index-select to the bit.

Shapes (N, n_d, orders) are static under jit; recompilation happens per
grid shape / orders tuple and is cached by JAX.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL

__all__ = [
    "barycentric_coefficients",
    "apply_derivative_passes",
    "eval_batch",
    "eval_multi",
    "contract_dim_at_value",
]


def barycentric_coefficients(x: jax.Array, nodes: jax.Array,
                             weights: jax.Array) -> jax.Array:
    """Normalized barycentric coefficient rows for a batch of coordinates.

    Parameters
    ----------
    x : (N,) coordinates in one dimension.
    nodes, weights : (n,) grid nodes and barycentric weights for that dim.

    Returns
    -------
    (N, n) array ``C`` with ``C[m] @ values == p(x[m])`` for any values
    vector.  Rows are ``(w_i/(x-x_i)) / sum_j w_j/(x-x_j)``, or a one-hot
    row when ``x`` coincides with a node within 1e-14.
    """
    diff = x[:, None] - nodes[None, :]
    exact = jnp.abs(diff) < NODE_COINCIDENCE_TOL
    has_exact = exact.any(axis=1)
    safe = jnp.where(exact, 1.0, diff)
    w_over_diff = weights[None, :] / safe
    interp = w_over_diff / jnp.sum(w_over_diff, axis=1, keepdims=True)
    one_hot = jax.nn.one_hot(jnp.argmax(exact, axis=1), nodes.shape[0],
                             dtype=interp.dtype)
    return jnp.where(has_exact[:, None], one_hot, interp)


def apply_derivative_passes(tensor: jax.Array,
                            diff_matrices: Sequence[jax.Array],
                            orders: Tuple[int, ...]) -> jax.Array:
    """Apply ``D_d^orders[d]`` along each axis d of the value tensor.

    Point-independent, so callers hoist this out of the per-point work
    (reference ``barycentric.py:951-990``).  ``orders`` is static; the
    loop unrolls at trace time into a short chain of GEMMs.
    """
    result = tensor
    for d, k in enumerate(orders):
        if k > 0:
            d_t = diff_matrices[d].T
            moved = jnp.moveaxis(result, d, -1)
            for _ in range(k):
                moved = moved @ d_t
            result = jnp.moveaxis(moved, -1, d)
    return result


def _contract(tensor: jax.Array, coeff_rows: Sequence[jax.Array]) -> jax.Array:
    """Contract value tensor with per-dim (N, n_d) coefficient rows -> (N,)."""
    # First dim: one real GEMM (N, n0) x (n0, prod(rest)).
    result = jnp.einsum("ni,i...->n...", coeff_rows[0], tensor)
    # Remaining dims: batched weighted reductions.
    for c in coeff_rows[1:]:
        result = jnp.einsum("nj,nj...->n...", c, result)
    return result


@functools.partial(jax.jit, static_argnames=("orders",))
def eval_batch(tensor: jax.Array,
               nodes: Tuple[jax.Array, ...],
               weights: Tuple[jax.Array, ...],
               diff_matrices: Tuple[jax.Array, ...],
               points: jax.Array,
               orders: Tuple[int, ...]) -> jax.Array:
    """Evaluate the interpolant (or a mixed partial) at a batch of points.

    Parameters
    ----------
    tensor : (n_0, ..., n_{d-1}) value tensor.
    nodes, weights, diff_matrices : per-dim grid data (tuples, ragged n_d).
    points : (N, d) query points.
    orders : static per-dim derivative orders.

    Returns
    -------
    (N,) results.
    """
    t = apply_derivative_passes(tensor, diff_matrices, orders)
    coeff_rows = [
        barycentric_coefficients(points[:, d], nodes[d], weights[d])
        for d in range(len(nodes))
    ]
    return _contract(t, coeff_rows)


@functools.partial(jax.jit, static_argnames=("orders_list",))
def eval_multi(tensor: jax.Array,
               nodes: Tuple[jax.Array, ...],
               weights: Tuple[jax.Array, ...],
               diff_matrices: Tuple[jax.Array, ...],
               point: jax.Array,
               orders_list: Tuple[Tuple[int, ...], ...]) -> jax.Array:
    """Evaluate several derivative specs at one point, sharing coefficients.

    The normalized barycentric rows depend only on the point, so they are
    computed once and reused across all ``orders_list`` entries (the
    reference's ``vectorized_eval_multi`` weight-sharing,
    ``barycentric.py:1049-1112``).  Returns shape ``(len(orders_list),)``.
    """
    coeff_rows = [
        barycentric_coefficients(point[d][None], nodes[d], weights[d])
        for d in range(len(nodes))
    ]
    results = []
    for orders in orders_list:
        t = apply_derivative_passes(tensor, diff_matrices, orders)
        results.append(_contract(t, coeff_rows)[0])
    return jnp.stack(results)


def contract_dim_at_value(tensor: jax.Array, axis: int, nodes: jax.Array,
                          weights: jax.Array, value) -> jax.Array:
    """Contract one tensor axis at a fixed coordinate (slice operation).

    Equivalent to the reference's ``_slice_tensor``
    (``_extrude_slice.py:79-92``): barycentric-normalized tensordot, with
    the exact-node case handled branchlessly by the one-hot coefficient
    row (identical result to ``np.take``).
    """
    row = barycentric_coefficients(jnp.asarray(value, dtype=tensor.dtype)[None],
                                   nodes, weights)[0]
    return jnp.tensordot(tensor, row, axes=([axis], [0]))
