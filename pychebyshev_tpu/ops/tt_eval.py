"""Batched tensor-train evaluation — the TT query hot path.

TPU-first recast of the reference TT eval chain
(``tensor_train.py:2217-2265``): for a batch of N points, each dimension
contributes one real GEMM ``Q @ core`` on the MXU (Q holds Chebyshev
polynomial values via the statically-unrolled three-term recurrence),
followed by a batched (1, r) x (r, r) chain contraction.  The whole chain
is a single jit so XLA fuses scaling, recurrence, and contractions;
recompilation is keyed on the (static) core shapes and batch size.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pychebyshev_tpu.ops.chebyshev import chebyshev_polynomial_matrix

__all__ = ["tt_eval_batch"]


@jax.jit
def _tt_eval_batch_impl(cores: Tuple[jax.Array, ...], lo: jax.Array,
                        hi: jax.Array, points: jax.Array) -> jax.Array:
    result = jnp.ones((points.shape[0], 1, 1), dtype=points.dtype)
    for d, core in enumerate(cores):
        scaled = 2.0 * (points[:, d] - lo[d]) / (hi[d] - lo[d]) - 1.0
        q = chebyshev_polynomial_matrix(scaled, core.shape[1])  # (N, n_d)
        v = jnp.einsum("nj,ijk->nik", q, core)                  # GEMM
        result = jnp.einsum("nij,njk->nik", result, v)          # batched chain
    return result[:, 0, 0]


def tt_eval_batch(coeff_cores, domain, points) -> jax.Array:
    """Evaluate a TT (Chebyshev coefficient cores) at (N, d) points.

    Parameters
    ----------
    coeff_cores : sequence of (r_{k-1}, n_k, r_k) arrays (storage frame).
    domain : (d, 2) array of per-dim [lo, hi] (storage frame).
    points : (N, d) query points (storage frame).
    """
    domain = jnp.asarray(domain, dtype=jnp.float64)
    points = jnp.asarray(points, dtype=jnp.float64)
    cores = tuple(jnp.asarray(c, dtype=jnp.float64) for c in coeff_cores)
    return _tt_eval_batch_impl(cores, domain[:, 0], domain[:, 1], points)
