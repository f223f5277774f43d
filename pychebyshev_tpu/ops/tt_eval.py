"""Batched tensor-train evaluation — the TT query hot path.

TPU-first recast of the reference TT eval chain
(``tensor_train.py:2217-2265``).  For a batch of N points the running
interface row ``(N, r)`` is contracted dimension by dimension:

    a[n, j, k] = sum_i row[n, i] * core[i, j, k]     (MXU GEMM)
    row[n, k]  = sum_j Q[n, j] * a[n, j, k]          (VPU reduction)

with Q the Chebyshev polynomial values from the statically-unrolled
three-term recurrence.  Contracting the *row* before Q keeps the peak
intermediate at (N, n_k, r_k) — linear in the bond rank — instead of the
(N, r, r) blow-up a Q-first ordering produces at high ranks.  Very large
batches are processed in fixed-size chunks via ``lax.map`` so HBM
footprint stays bounded for any N.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pychebyshev_tpu.ops.chebyshev import chebyshev_polynomial_matrix
from pychebyshev_tpu.ops.eval import _gemm_precision

__all__ = ["tt_eval_batch"]


def _chain(cores, lo, hi, points):
    row = jnp.ones((points.shape[0], 1), dtype=points.dtype)
    for d, core in enumerate(cores):
        scaled = 2.0 * (points[:, d] - lo[d]) / (hi[d] - lo[d]) - 1.0
        q = chebyshev_polynomial_matrix(scaled, core.shape[1])  # (N, n_d)
        r_l, n_d, r_r = core.shape
        a = jnp.matmul(row, core.reshape(r_l, n_d * r_r),
                       precision=_gemm_precision(core.dtype))  # MXU GEMM
        a = a.reshape(-1, n_d, r_r)
        row = jnp.einsum("nj,njk->nk", q, a)                    # VPU
    return row[:, 0]


@jax.jit
def _tt_eval_batch_impl(cores: Tuple[jax.Array, ...], lo: jax.Array,
                        hi: jax.Array, points: jax.Array) -> jax.Array:
    from pychebyshev_tpu.ops.eval import chunked_scalar_map
    per_point = max(c.shape[1] * c.shape[2] for c in cores)
    return chunked_scalar_map(lambda p: _chain(cores, lo, hi, p),
                              points, per_point)


def tt_eval_batch(coeff_cores, domain, points) -> jax.Array:
    """Evaluate a TT (Chebyshev coefficient cores) at (N, d) points.

    Parameters
    ----------
    coeff_cores : sequence of (r_{k-1}, n_k, r_k) arrays (storage frame).
    domain : (d, 2) array of per-dim [lo, hi] (storage frame).
    points : (N, d) query points (storage frame).
    """
    points = jnp.asarray(points)
    if points.dtype not in (jnp.float32, jnp.float64):
        points = points.astype(jnp.float64)
    # Compute in the WIDEST of the two dtypes: f32 query points must
    # not silently downcast f64 cores (the parity default) to the
    # ~1e-6 f32 tier — the f32 fast path requires f32 cores AND points.
    dtype = jnp.promote_types(points.dtype, jnp.asarray(
        coeff_cores[0]).dtype)
    if dtype not in (jnp.float32, jnp.float64):
        dtype = jnp.float64
    points = points.astype(dtype)
    domain = jnp.asarray(domain, dtype=dtype)
    cores = tuple(jnp.asarray(c, dtype=dtype) for c in coeff_cores)
    return _tt_eval_batch_impl(cores, domain[:, 0], domain[:, 1], points)
