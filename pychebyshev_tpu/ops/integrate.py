"""Batched axis-aligned-box integration kernels (beyond reference).

The reference integrates ONE box per ``integrate(bounds=...)`` call
(reference ``barycentric.py:2160-2275``, ``tensor_train.py:1505-1702``);
these kernels integrate a BATCH of boxes in a single device dispatch by
swapping the eval kernels' per-point rows for per-box sub-interval
quadrature rows:

    dense:  out[b] = sum_idx T[idx] * prod_d w_d[b, idx_d]
            (w_d = sub-interval Fejer weights scaled by the dim measure)
    TT:     the rank chain of ``ops.tt_eval`` with the Chebyshev
            polynomial rows replaced by Chebyshev moment rows

Both reuse the factorized bilinear / chain machinery of ``ops.eval`` /
``ops.tt_eval`` verbatim — a batch of scenario-bucket integrals
(probabilities, expected exposures) runs at MXU GEMM rates instead of
one host-driven contraction per box.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pychebyshev_tpu.ops.eval import (
    _contract_batched,
    _gemm_precision,
    chunked_scalar_map,
)
from pychebyshev_tpu.ops.quadrature import (
    chebyshev_moment_matrix,
    sub_interval_weight_matrix,
)

__all__ = ["integrate_box_batch", "integrate_box_batch_models",
           "tt_integrate_box_batch"]


def _quadrature_coeff_fn(shape, lo, hi):
    """Per-box quadrature rows for a (d-dim) grid — the integrate
    analog of the barycentric ``coeff_fn`` the eval kernels use."""
    d = len(shape)

    def coeff_fn(bf):
        boxes = bf.reshape(bf.shape[0], d, 2)
        rows = []
        for dim in range(d):
            a, c = lo[dim], hi[dim]
            half = (c - a) * 0.5
            t_lo = 2.0 * (boxes[:, dim, 0] - a) / (c - a) - 1.0
            t_hi = 2.0 * (boxes[:, dim, 1] - a) / (c - a) - 1.0
            w = sub_interval_weight_matrix(
                shape[dim], t_lo, t_hi) * half
            # Zero-measure dims integrate to an EXACT 0: compare the raw
            # bounds — fused scaling can differ by an ulp between the lo
            # and hi columns, leaving ~1e-20 residue in the weights.
            degenerate = boxes[:, dim, 0] == boxes[:, dim, 1]
            rows.append(jnp.where(degenerate[:, None], 0.0, w))
        return rows

    return coeff_fn


@jax.jit
def _integrate_box_batch_impl(tensor, lo, hi, bounds_flat):
    return _contract_batched(
        tensor, _quadrature_coeff_fn(tensor.shape, lo, hi), bounds_flat)


@jax.jit
def _integrate_box_batch_models_impl(tensors, lo, hi, bounds_flat):
    return _contract_batched(
        list(tensors), _quadrature_coeff_fn(tensors[0].shape, lo, hi),
        bounds_flat)


def integrate_box_batch(tensor, domain, bounds,
                        dtype=jnp.float64) -> jax.Array:
    """Integrals of the dense interpolant over (B, d, 2) boxes -> (B,).

    Parameters
    ----------
    tensor : (n_0, ..., n_{d-1}) value tensor.
    domain : (d, 2) per-dim [lo, hi].
    bounds : (B, d, 2) per-box per-dim (lo, hi), inside the domain
        (callers validate via ``utils.calculus.normalize_bounds_batch``).
    dtype : f64 (default, the parity tier) or f32 — the throughput tier
        for f64-less TPUs: ~1e-7-relative quadrature rows + bf16x3
        GEMMs, two orders faster than software f64 at these shapes.
    """
    tensor = jnp.asarray(tensor, dtype=dtype)
    dom = jnp.asarray(domain, dtype=dtype)
    b = jnp.asarray(bounds, dtype=dtype)
    return _integrate_box_batch_impl(
        tensor, dom[:, 0], dom[:, 1],
        b.reshape(b.shape[0], 2 * tensor.ndim))


def integrate_box_batch_models(tensors, domain, bounds,
                               dtype=jnp.float64) -> jax.Array:
    """Box integrals of M same-grid value tensors -> (M, B).

    The book analog of :func:`integrate_box_batch`: the per-box
    quadrature rows build ONCE per chunk and contract against every
    tensor (one row build + M GEMMs, like ``eval_batch_models``) — a
    whole book's bucket masses in one dispatch.
    """
    ts = tuple(jnp.asarray(t, dtype=dtype) for t in tensors)
    dom = jnp.asarray(domain, dtype=dtype)
    b = jnp.asarray(bounds, dtype=dtype)
    return _integrate_box_batch_models_impl(
        ts, dom[:, 0], dom[:, 1],
        b.reshape(b.shape[0], 2 * ts[0].ndim))


def _tt_chain_moments(cores, lo, hi, bounds_flat):
    boxes = bounds_flat.reshape(bounds_flat.shape[0], len(cores), 2)
    row = jnp.ones((bounds_flat.shape[0], 1), dtype=bounds_flat.dtype)
    for d, core in enumerate(cores):
        a, c = lo[d], hi[d]
        half = (c - a) * 0.5
        t_lo = 2.0 * (boxes[:, d, 0] - a) / (c - a) - 1.0
        t_hi = 2.0 * (boxes[:, d, 1] - a) / (c - a) - 1.0
        m = chebyshev_moment_matrix(t_lo, t_hi, core.shape[1]) * half
        # Exact 0 for zero-measure dims (see integrate_box_batch).
        m = jnp.where((boxes[:, d, 0] == boxes[:, d, 1])[:, None], 0.0, m)
        r_l, n_d, r_r = core.shape
        interface = jnp.matmul(row, core.reshape(r_l, n_d * r_r),
                               precision=_gemm_precision(core.dtype))
        row = jnp.einsum("nj,njk->nk", m, interface.reshape(-1, n_d, r_r))
    return row[:, 0]


@jax.jit
def _tt_integrate_box_batch_impl(cores, lo, hi, bounds_flat):
    per_point = max(c.shape[1] * c.shape[2] for c in cores)
    return chunked_scalar_map(
        lambda bf: _tt_chain_moments(cores, lo, hi, bf),
        bounds_flat, per_point)


def tt_integrate_box_batch(coeff_cores, domain, bounds,
                           dtype=jnp.float64) -> jax.Array:
    """Integrals of a TT over (B, d, 2) boxes -> (B,).

    In coefficient space the box integral is the eval chain with the
    polynomial rows T_k(t) replaced by their sub-interval moments
    (``ops.quadrature.chebyshev_moment_matrix``) — mathematically the
    same bilinear form the Fejer-weight value-core contraction computes,
    but batched over boxes in one dispatch.

    Parameters
    ----------
    coeff_cores : sequence of (r_{k-1}, n_k, r_k) arrays (storage frame).
    domain : (d, 2) per-dim [lo, hi] (storage frame).
    bounds : (B, d, 2) boxes (storage frame).
    dtype : f64 (default) or f32 (throughput tier, ~1e-7 relative).
    """
    cores = tuple(jnp.asarray(c, dtype=dtype) for c in coeff_cores)
    dom = jnp.asarray(domain, dtype=dtype)
    b = jnp.asarray(bounds, dtype=dtype)
    return _tt_integrate_box_batch_impl(
        cores, dom[:, 0], dom[:, 1],
        b.reshape(b.shape[0], 2 * len(cores)))
