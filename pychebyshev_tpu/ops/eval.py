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

import numpy as np
import jax
import jax.numpy as jnp

from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL

__all__ = [
    "barycentric_coefficients",
    "apply_derivative_passes",
    "eval_batch",
    "eval_batch_multi",
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


def chunked_scalar_map(fn, points, per_point: int):
    """Apply a scalar-output batch fn in HBM-bounded chunks.

    ``per_point`` estimates the widest per-point intermediate (in
    elements); chunks are sized so chunk*per_point stays under
    ``_MAX_INTERMEDIATE_ELEMS``.  Shared by the dense bilinear path and
    the TT chain so the cap/padding scheme cannot drift.
    """
    n = points.shape[0]
    chunk = max(256, _MAX_INTERMEDIATE_ELEMS // max(per_point, 1))
    if n <= chunk:
        return fn(points)
    pad = (-n) % chunk
    padded = jnp.pad(points, ((0, pad), (0, 0)))
    chunks = padded.reshape(-1, chunk, points.shape[1])
    out = jax.lax.map(fn, chunks)
    return out.reshape(-1)[:n]


def chunked_matrix_map(fn, points, per_point: int, n_cols: int):
    """``chunked_scalar_map`` for (N, n_cols)-output batch fns.

    Same chunk sizing and zero-pad/un-pad scheme (one definition, so
    the cap/padding convention cannot drift across the multi-spec and
    book runners).
    """
    n = points.shape[0]
    chunk = max(256, _MAX_INTERMEDIATE_ELEMS // max(per_point, 1))
    if n <= chunk:
        return fn(points)
    pad = (-n) % chunk
    padded = jnp.pad(points, ((0, pad), (0, 0)))
    chunks = padded.reshape(-1, chunk, points.shape[1])
    out = jax.lax.map(fn, chunks)
    return out.reshape(-1, n_cols)[:n]


def _gemm_precision(dtype):
    """Matmul precision tier by dtype.

    float32: HIGH (bf16x3 multi-pass) — ~4e-5 relative GEMM error,
    an order of magnitude below typical interpolation error, and ~20%
    faster than HIGHEST (f32-emulation, 6 passes) on the MXU.  The TPU
    default (single-pass bf16, ~1e-3 relative) is NOT acceptable: it
    exceeds interpolation error.  Other dtypes (the f64 parity path):
    HIGHEST, which on TPU means true software f64.
    """
    return (jax.lax.Precision.HIGH if dtype == jnp.float32
            else jax.lax.Precision.HIGHEST)


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
                moved = jnp.matmul(moved, d_t,
                                   precision=_gemm_precision(result.dtype))
            result = jnp.moveaxis(moved, -1, d)
    return result


def _khatri_rao(rows: Sequence[jax.Array]) -> jax.Array:
    """Row-wise Kronecker product: [(N, a), (N, b), ...] -> (N, a*b*...)."""
    out = rows[0]
    for r in rows[1:]:
        out = (out[:, :, None] * r[:, None, :]).reshape(
            out.shape[0], out.shape[1] * r.shape[1])
    return out


def _split_index(shape: Tuple[int, ...]) -> int:
    """Split grid dims into left/right groups for the bilinear contraction.

    Minimizes peak per-point traffic ~ 2 * prod(left) + prod(right):
    the left product appears twice ((N, nL) GEMM output + W_left), the
    right product once (the Khatri-Rao factor streamed into the GEMM).
    """
    d = len(shape)
    best_s, best_cost = 1, None
    for s in range(1, d):
        n_left = int(np.prod(shape[:s]))
        n_right = int(np.prod(shape[s:]))
        cost = 2 * n_left + n_right
        if best_cost is None or cost < best_cost:
            best_s, best_cost = s, cost
    return best_s


def _contract(tensor: jax.Array, coeff_rows: Sequence[jax.Array]) -> jax.Array:
    """Contract value tensor with per-dim (N, n_d) coefficient rows -> (N,).

    Factorized bilinear form: with dims split into groups L | R,

        out[n] = sum_{a in L, b in R} W_L[n, a] * T2[a, b] * W_R[n, b]
               = rowdot(W_L, W_R @ T2^T)

    where W_L / W_R are Khatri-Rao products of the per-dim coefficient
    rows.  One MXU GEMM per batch; the largest intermediate is
    (N, prod(right dims)) — e.g. (N, 1331) for an 11^5 grid instead of
    the (N, 11^4) chain intermediate a naive per-dim reduction produces.
    """
    d = tensor.ndim
    if d == 1:
        return jnp.einsum("ni,i->n", coeff_rows[0], tensor,
                          precision=_gemm_precision(tensor.dtype))
    s = _split_index(tensor.shape)
    n_left = int(np.prod(tensor.shape[:s]))
    n_right = int(np.prod(tensor.shape[s:]))
    w_left = _khatri_rao(coeff_rows[:s])          # (N, nL)
    w_right = _khatri_rao(coeff_rows[s:])         # (N, nR)
    t2 = tensor.reshape(n_left, n_right)
    y = jnp.matmul(w_right, t2.T,
                   precision=_gemm_precision(tensor.dtype))  # (N, nL) MXU
    return jnp.sum(w_left * y, axis=1)


# Batches larger than this many elements in the (N, n_right) intermediate
# are processed in fixed-size chunks via lax.map so HBM footprint stays
# bounded regardless of N.
_MAX_INTERMEDIATE_ELEMS = 1 << 23


def _contract_batched(tensors, coeff_fn, points: jax.Array) -> jax.Array:
    """Shared coefficient rows contracted against one or more tensors.

    ``tensors`` may be a single array (returns (N,)) or a sequence of
    same-shape arrays (returns (len(tensors), N) — the Khatri-Rao rows
    are built once per chunk and reused across tensors, so evaluating a
    price plus M Greeks costs one row build + M+1 GEMMs, not M+1 full
    passes).  Very large batches chunk via ``lax.map``.
    """
    single = not isinstance(tensors, (list, tuple))
    tensor_list = [tensors] if single else list(tensors)
    shape = tensor_list[0].shape
    n = points.shape[0]
    d = len(shape)
    if d == 1:
        per_point = shape[0]
    else:
        s = _split_index(shape)
        per_point = max(int(np.prod(shape[s:])),
                        2 * int(np.prod(shape[:s])))
    chunk = max(256, _MAX_INTERMEDIATE_ELEMS // max(per_point, 1))

    def _one(pts):
        rows = coeff_fn(pts)
        outs = [_contract(t, rows) for t in tensor_list]
        return outs[0] if single else jnp.stack(outs)

    if n <= chunk:
        return _one(points)
    pad = (-n) % chunk
    padded = jnp.pad(points, ((0, pad), (0, 0)))
    chunks = padded.reshape(-1, chunk, points.shape[1])
    out = jax.lax.map(_one, chunks)
    if single:
        return out.reshape(-1)[:n]
    # out: (num_chunks, M, chunk) -> (M, N)
    out = jnp.moveaxis(out, 1, 0).reshape(len(tensor_list), -1)
    return out[:, :n]


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

    def coeff_fn(pts):
        return [barycentric_coefficients(pts[:, d], nodes[d], weights[d])
                for d in range(len(nodes))]

    return _contract_batched(t, coeff_fn, points)


@functools.partial(jax.jit, static_argnames=("orders",))
def eval_batch_models(tensors: Tuple[jax.Array, ...],
                      nodes: Tuple[jax.Array, ...],
                      weights: Tuple[jax.Array, ...],
                      diff_matrices: Tuple[jax.Array, ...],
                      points: jax.Array,
                      orders: Tuple[int, ...]) -> jax.Array:
    """Evaluate M same-grid value tensors at N points -> (M, N).

    The book-of-models primitive: the per-point barycentric rows depend
    only on the grid, so M models sharing one grid cost one row build
    plus M GEMMs per chunk — far cheaper than M independent
    ``eval_batch`` calls.  Beyond the reference surface (which has no
    multi-model path); the natural fit is a portfolio of products
    approximated over a common market-state domain.
    """
    ts = [apply_derivative_passes(t, diff_matrices, orders)
          for t in tensors]

    def coeff_fn(pts):
        return [barycentric_coefficients(pts[:, d], nodes[d], weights[d])
                for d in range(len(nodes))]

    return _contract_batched(ts, coeff_fn, points)


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


@functools.partial(jax.jit, static_argnames=("orders_list",))
def eval_batch_multi(tensor: jax.Array,
                     nodes: Tuple[jax.Array, ...],
                     weights: Tuple[jax.Array, ...],
                     diff_matrices: Tuple[jax.Array, ...],
                     points: jax.Array,
                     orders_list: Tuple[Tuple[int, ...], ...]) -> jax.Array:
    """Batch x multi-derivative-spec evaluation -> (len(orders_list), N).

    The production Greeks primitive: derivative passes are hoisted once
    per spec (point-independent), and the per-point barycentric rows are
    built once per chunk and shared across all specs.
    """
    tensors = [apply_derivative_passes(tensor, diff_matrices, orders)
               for orders in orders_list]

    def coeff_fn(pts):
        return [barycentric_coefficients(pts[:, d], nodes[d], weights[d])
                for d in range(len(nodes))]

    return _contract_batched(tensors, coeff_fn, points)
