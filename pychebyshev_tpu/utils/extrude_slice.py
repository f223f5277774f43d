"""Extrusion / slicing parameter validation and tensor kernels.

Parity target: reference ``_extrude_slice.py:9-92`` (dense helpers).
TT-core variants live in ``models.tensor_train``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "normalize_extrusion_params",
    "normalize_slicing_params",
    "extrude_tensor",
]


def normalize_extrusion_params(params, ndim):
    """Validate extrusion params; return list sorted ascending by dim_index.

    Accepts a single ``(dim_idx, (lo, hi), n)`` tuple or a list of them.
    """
    if (isinstance(params, tuple) and len(params) == 3
            and isinstance(params[0], (int, np.integer))):
        params = [params]
    params = [tuple(p) for p in params]

    new_ndim = ndim + len(params)
    seen = set()
    for dim_idx, bounds, n in params:
        if not isinstance(dim_idx, (int, np.integer)):
            raise TypeError(
                f"dim_index must be int, got {type(dim_idx).__name__}"
            )
        if dim_idx < 0 or dim_idx >= new_ndim:
            raise ValueError(
                f"dim_index {dim_idx} out of range [0, {new_ndim - 1}]"
            )
        if dim_idx in seen:
            raise ValueError(f"Duplicate dim_index {dim_idx}")
        seen.add(dim_idx)
        lo, hi = bounds
        if lo >= hi:
            raise ValueError(
                f"Domain bounds must satisfy lo < hi, got [{lo}, {hi}]"
            )
        if not isinstance(n, (int, np.integer)) or n < 2:
            raise ValueError(f"n_nodes must be int >= 2, got {n}")

    return sorted(params, key=lambda p: p[0])


def normalize_slicing_params(params, ndim):
    """Validate slicing params; return list sorted *descending* by dim_index
    (so axes can be removed back-to-front without index shifts).

    Accepts a single ``(dim_idx, value)`` tuple or a list of them.
    """
    if (isinstance(params, tuple) and len(params) == 2
            and isinstance(params[0], (int, np.integer))):
        params = [params]
    params = [tuple(p) for p in params]

    if len(params) >= ndim:
        raise ValueError(
            f"Cannot slice all {ndim} dimensions (would produce 0D result)"
        )

    seen = set()
    for dim_idx, _value in params:
        if not isinstance(dim_idx, (int, np.integer)):
            raise TypeError(
                f"dim_index must be int, got {type(dim_idx).__name__}"
            )
        if dim_idx < 0 or dim_idx >= ndim:
            raise ValueError(
                f"dim_index {dim_idx} out of range [0, {ndim - 1}]"
            )
        if dim_idx in seen:
            raise ValueError(f"Duplicate dim_index {dim_idx}")
        seen.add(dim_idx)

    return sorted(params, key=lambda p: p[0], reverse=True)


def extrude_tensor(tensor, axis, n_new):
    """Insert a new axis of size ``n_new`` replicating values (constant dim)."""
    return jnp.repeat(jnp.expand_dims(tensor, axis=axis), n_new, axis=axis)


def _make_nodes_for_dim(lo, hi, n):
    """Reference-name compat alias: host Chebyshev nodes on [lo, hi]."""
    from pychebyshev_tpu.ops.chebyshev import nodes_for_dim_np
    return nodes_for_dim_np(lo, hi, int(n))


_normalize_extrusion_params = normalize_extrusion_params
_normalize_slicing_params = normalize_slicing_params
_extrude_tensor = extrude_tensor
