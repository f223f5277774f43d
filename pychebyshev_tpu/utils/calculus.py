"""Calculus helpers: rootfinding, 1-D optimization, bounds validation.

Design split: these are *cold-path* analysis routines over tiny 1-D
coefficient vectors (n <= ~100).  The colleague-matrix eigenproblem
(Good 1961) is a general nonsymmetric eig, which XLA:TPU does not
support, so rootfinding deliberately runs on the host in NumPy; the
surrounding evaluation (derivative values, candidate evaluation) uses
the shared JAX kernels.  Parity target: reference ``_calculus.py``.
"""

from __future__ import annotations

import numpy as np

from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL

__all__ = [
    "normalize_bounds",
    "normalize_bounds_batch",
    "roots_1d",
    "optimize_1d",
    "validate_calculus_args",
    "slider_partition_intersect",
]


def normalize_bounds(dims, bounds, domain, dim_labels=None):
    """Normalize/validate ``integrate(bounds=...)``.

    Returns one ``(lo, hi)`` or ``None`` (= full domain) per entry of
    *dims*.  Raises ValueError on out-of-domain bounds, lo > hi, or
    length mismatch.  ``dim_labels`` overrides indices in error messages
    (callers with storage-frame dims pass user-frame labels).
    """
    if bounds is None:
        return [None] * len(dims)

    # A bare (lo, hi) pair is shorthand for a one-dim spec.
    if (isinstance(bounds, tuple) and len(bounds) == 2
            and not isinstance(bounds[0], (list, tuple))):
        bounds = [bounds]

    if len(bounds) != len(dims):
        raise ValueError(
            f"bounds length {len(bounds)} does not match the "
            f"{len(dims)} integrated dims"
        )

    labels = dims if dim_labels is None else dim_labels
    if len(labels) != len(dims):
        raise ValueError(
            f"dim_labels length {len(labels)} != dims length {len(dims)}"
        )

    def _one(spec, d, label):
        if spec is None:
            return None
        lo, hi = spec
        if hi < lo:
            raise ValueError(
                f"invalid sub-interval for dim {label}: lo={lo} > hi={hi}"
            )
        full_lo, full_hi = domain[d]
        # 1e-14 slack absorbs representation noise at the domain edges.
        if lo < full_lo - 1e-14 or hi > full_hi + 1e-14:
            raise ValueError(
                f"dim {label}: bounds ({lo}, {hi}) extend outside domain "
                f"[{full_lo}, {full_hi}]"
            )
        return (max(lo, full_lo), min(hi, full_hi))

    return [_one(spec, d, label)
            for spec, d, label in zip(bounds, dims, labels)]


def normalize_bounds_batch(bounds, domain) -> np.ndarray:
    """Validate a (B, d, 2) batch of axis-aligned boxes against *domain*.

    The batched counterpart of :func:`normalize_bounds` for the
    ``integrate_batch`` surface: every box must satisfy lo <= hi per dim
    and lie inside the domain (same 1e-14 representation slack).  Returns
    a float64 array clamped to the domain; degenerate (zero-measure)
    dims are allowed and integrate to exactly zero.
    """
    arr = np.asarray(bounds, dtype=np.float64)
    d = len(domain)
    if arr.ndim != 3 or arr.shape[1] != d or arr.shape[2] != 2:
        raise ValueError(
            f"bounds must have shape (B, {d}, 2) — one (lo, hi) pair per "
            f"dim per box; got {arr.shape}")
    if not np.isfinite(arr).all():
        raise ValueError("bounds contain non-finite values")
    lo, hi = arr[..., 0], arr[..., 1]
    inverted = hi < lo
    if inverted.any():
        b, dd = np.argwhere(inverted)[0]
        raise ValueError(
            f"invalid sub-interval for box {b}, dim {dd}: "
            f"lo={lo[b, dd]} > hi={hi[b, dd]}")
    dom = np.asarray(domain, dtype=np.float64)
    outside = (lo < dom[None, :, 0] - 1e-14) | (hi > dom[None, :, 1] + 1e-14)
    if outside.any():
        b, dd = np.argwhere(outside)[0]
        raise ValueError(
            f"box {b}, dim {dd}: bounds ({lo[b, dd]}, {hi[b, dd]}) extend "
            f"outside domain [{dom[dd, 0]}, {dom[dd, 1]}]")
    lo = np.maximum(lo, dom[None, :, 0])
    hi = np.maximum(np.minimum(hi, dom[None, :, 1]), lo)
    return np.stack([lo, hi], axis=-1)


def roots_1d(values, domain) -> np.ndarray:
    """All real roots of a 1-D interpolant (values at ascending Type-I nodes).

    Chebyshev coefficients -> colleague-matrix roots
    (``numpy.polynomial.chebyshev.chebroots``) -> filter real roots in
    [-1, 1] -> map to the physical domain -> sort + dedupe.
    """
    from numpy.polynomial.chebyshev import chebroots

    from pychebyshev_tpu.ops.dct import _coeff_matrix_np

    values = np.asarray(values, dtype=np.float64)
    candidates = np.atleast_1d(
        chebroots(_coeff_matrix_np(values.size) @ values)
    )

    # Vectorized filter: nearly-real eigenvalues landing in [-1, 1]
    # (with tol slack on both tests), snapped onto the interval.
    tol = 1e-10
    keep = ((np.abs(candidates.imag) < tol)
            & (candidates.real >= -1.0 - tol)
            & (candidates.real <= 1.0 + tol))
    t = np.clip(candidates.real[keep], -1.0, 1.0)
    if t.size == 0:
        return np.array([], dtype=float)

    a, b = domain
    xs = np.sort((a + b + (b - a) * t) / 2.0)
    # The colleague matrix can report one root twice; collapse
    # neighbours closer than a domain-scaled tolerance.
    survivors = np.ones(xs.size, dtype=bool)
    survivors[1:] = np.diff(xs) > 1e-10 * (abs(b - a) + 1.0)
    return xs[survivors]


def optimize_1d(values, nodes, bary_weights, diff_matrix, domain,
                mode: str = "min"):
    """Min or max of a 1-D interpolant via derivative roots + endpoints.

    Returns ``(value, location)``.
    """
    values = np.asarray(values, dtype=np.float64)
    nodes = np.asarray(nodes, dtype=np.float64)
    bary_weights = np.asarray(bary_weights, dtype=np.float64)
    diff_matrix = np.asarray(diff_matrix, dtype=np.float64)

    deriv_values = diff_matrix @ values
    critical = roots_1d(deriv_values, domain)

    a, b = domain
    candidates = np.concatenate([[a], critical, [b]]).astype(np.float64)

    # Vectorized barycentric evaluation at all candidates (host, tiny).
    diff = candidates[:, None] - nodes[None, :]
    exact = np.abs(diff) < NODE_COINCIDENCE_TOL
    has_exact = exact.any(axis=1)
    safe = np.where(exact, 1.0, diff)
    w_over_diff = bary_weights[None, :] / safe
    vals = (w_over_diff * values[None, :]).sum(axis=1) / w_over_diff.sum(axis=1)
    if has_exact.any():
        vals = np.where(has_exact, values[exact.argmax(axis=1)], vals)

    idx = int(np.argmin(vals) if mode == "min" else np.argmax(vals))
    return float(vals[idx]), float(candidates[idx])


def validate_calculus_args(ndim, dim, fixed, domain):
    """Validate roots/minimize/maximize args.

    Returns ``(dim, slice_params)`` where slice_params fixes every other
    dimension.
    """
    fixed = dict(fixed) if fixed else {}

    if ndim == 1:
        if dim not in (None, 0):
            raise ValueError(
                f"a 1-D interpolant has only dim 0 (dim must be 0 or "
                f"omitted); got dim={dim}")
        if fixed:
            raise ValueError(
                "fixed must be empty on a 1-D interpolant — there are "
                "no other dims to pin")
        return 0, []

    if dim is None:
        raise ValueError(
            "dim is required on a multi-dimensional interpolant")
    if not 0 <= dim < ndim:
        raise ValueError(f"dim {dim} out of range [0, {ndim - 1}]")

    required = set(range(ndim)) - {dim}
    if set(fixed) != required:
        raise ValueError(
            f"fixed must pin every dim except {dim}; "
            f"missing {required - set(fixed)}"
        )

    out_of_domain = [(d, v) for d, v in fixed.items()
                     if not domain[d][0] <= v <= domain[d][1]]
    if out_of_domain:
        d, v = out_of_domain[0]
        raise ValueError(
            f"fixed[{d}] = {v} lies outside that dim's domain "
            f"[{domain[d][0]}, {domain[d][1]}]"
        )
    return dim, list(fixed.items())


def slider_partition_intersect(group_dims, integrate_dims):
    """Classify a slider group vs an integration set.

    Returns ``(kind, kept)`` with kind in {"full", "partial", "none"} and
    ``kept`` the group dims not being integrated.
    """
    group_set = set(group_dims)
    overlap = group_set & set(integrate_dims)
    if not overlap:
        return "none", list(group_dims)
    if overlap == group_set:
        return "full", []
    return "partial", [d for d in group_dims if d not in overlap]


# ----------------------------------------------------------------------
# Reference-name compat aliases (`from pychebyshev._calculus import ...`)
# ----------------------------------------------------------------------

def _integrate_tt_along_dim(core, weights):
    """Contract a (r_l, n, r_r) TT core's node axis with quadrature
    weights -> (r_l, r_r)."""
    import numpy as _np
    return _np.einsum("rjs,j->rs", core, weights)


def _compute_fejer1_weights(n):
    from pychebyshev_tpu.ops.quadrature import fejer1_weights
    return fejer1_weights(n)


def _compute_sub_interval_weights(n, t_lo, t_hi):
    from pychebyshev_tpu.ops.quadrature import sub_interval_weights
    return sub_interval_weights(n, t_lo, t_hi)


_slider_partition_intersect = slider_partition_intersect
_normalize_bounds = normalize_bounds
_roots_1d = roots_1d
_optimize_1d = optimize_1d
_validate_calculus_args = validate_calculus_args
