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

import numpy as np

from pychebyshev_tpu.ops.dct import _dct3_matrix_np

__all__ = ["fejer1_weights", "sub_interval_weights"]


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
