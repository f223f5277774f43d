"""Fejer-1 quadrature weights for Type-I Chebyshev grids.

Follows Waldvogel (2006): weights = DCT-III of the Chebyshev moments,
divided by n; reference convention returns them in ascending node order
(reference ``_calculus.py:18-49`` full-domain and ``:76-133``
sub-interval variants).

Both weight constructors are host-side NumPy: they produce tiny O(n)
constants consumed by tensor contractions, and n is a static shape, so
there is nothing to trace.  The contraction itself (``integrate``) runs
in JAX.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from pychebyshev_tpu.ops.dct import _dct3_matrix_np

__all__ = [
    "fejer1_weights",
    "sub_interval_weights",
    "chebyshev_moment_matrix",
    "sub_interval_weight_matrix",
]


@functools.lru_cache(maxsize=None)
def fejer1_weights(n: int) -> np.ndarray:
    """Fejer-1 weights on [-1, 1] for n Type-I nodes, ascending order.

    ``sum(w * f(nodes)) ~= integral_{-1}^{1} f``.
    """
    # Chebyshev moments: I_k = 2/(1-k^2) for even k, 0 for odd k.
    k = np.arange(n, dtype=np.float64)
    even = k % 2 == 0
    moments = np.zeros(n)
    moments[even] = 2.0 / (1.0 - k[even] * k[even])
    weights_desc = _dct3_matrix_np(n) @ moments / n
    return np.ascontiguousarray(weights_desc[::-1])


def sub_interval_weights(n: int, t_lo: float, t_hi: float) -> np.ndarray:
    """Quadrature weights for a sub-interval [t_lo, t_hi] of [-1, 1].

    Replaces the full-domain Chebyshev moments with sub-interval moments
    ``I_k = integral_{t_lo}^{t_hi} T_k(t) dt`` computed from the Chebyshev
    antiderivative identity, then applies the same DCT-III pipeline.
    Ascending node order.
    """
    # T_k(t) at the two endpoints for k = 0..n via the closed form
    # T_k(t) = cos(k arccos t) (valid since |t| <= 1).
    ks = np.arange(n + 1, dtype=np.float64)
    T_lo = np.cos(ks * np.arccos(np.clip(t_lo, -1.0, 1.0)))
    T_hi = np.cos(ks * np.arccos(np.clip(t_hi, -1.0, 1.0)))

    moments = np.zeros(n)
    moments[0] = t_hi - t_lo
    if n > 1:
        moments[1] = (t_hi * t_hi - t_lo * t_lo) / 2.0
    for k in range(2, n):
        moments[k] = 0.5 * (
            (T_hi[k + 1] - T_lo[k + 1]) / (k + 1)
            - (T_hi[k - 1] - T_lo[k - 1]) / (k - 1)
        )

    weights_desc = _dct3_matrix_np(n) @ moments / n
    return np.ascontiguousarray(weights_desc[::-1])


def chebyshev_moment_matrix(t_lo, t_hi, n: int):
    """Batched sub-interval Chebyshev moments — the traced counterpart of
    the scalar loop in :func:`sub_interval_weights`.

    For endpoint vectors ``t_lo``/``t_hi`` of shape (B,) returns the
    (B, n) matrix ``M[b, k] = integral_{t_lo[b]}^{t_hi[b]} T_k(t) dt``
    via the Chebyshev antiderivative identity.  Endpoints are clipped to
    [-1, 1] only for the ``arccos`` evaluation, matching the host
    version's behavior at domain-edge representation noise.
    """
    t_lo = jnp.asarray(t_lo)
    t_hi = jnp.asarray(t_hi)
    cols = [(t_hi - t_lo)[:, None]]
    if n > 1:
        cols.append(((t_hi * t_hi - t_lo * t_lo) * 0.5)[:, None])
    if n > 2:
        ks = jnp.arange(n + 1, dtype=t_lo.dtype)
        th_lo = jnp.arccos(jnp.clip(t_lo, -1.0, 1.0))[:, None]
        th_hi = jnp.arccos(jnp.clip(t_hi, -1.0, 1.0))[:, None]
        dT = jnp.cos(ks[None, :] * th_hi) - jnp.cos(ks[None, :] * th_lo)
        kk = np.arange(2, n)
        cols.append(0.5 * (dT[:, kk + 1] / (kk + 1)
                           - dT[:, kk - 1] / (kk - 1)))
    return jnp.concatenate(cols, axis=1)


def sub_interval_weight_matrix(n: int, t_lo, t_hi):
    """Batched :func:`sub_interval_weights`: (B, n), ascending node order.

    ``sum(W[b] * f(nodes)) ~= integral_{t_lo[b]}^{t_hi[b]} f`` for the
    interpolant through n Type-I nodes.  Traced (bounds are data); the
    DCT-III matrix is a static constant folded into the compiled program.
    """
    from pychebyshev_tpu.ops.eval import _gemm_precision

    moments = chebyshev_moment_matrix(t_lo, t_hi, n)
    dct3 = jnp.asarray(_dct3_matrix_np(n), dtype=moments.dtype)
    # Explicit precision: at f32 the TPU-default single-pass-bf16 matmul
    # (~1e-3 relative) would silently break the documented ~1e-7 tier.
    return jnp.matmul(moments, dct3.T,
                      precision=_gemm_precision(moments.dtype))[:, ::-1] / n
