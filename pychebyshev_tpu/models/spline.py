"""ChebyshevSpline — piecewise Chebyshev interpolation at user knots.

Placeholder module: full implementation lands in the spline stage.
"""

from __future__ import annotations

__all__ = ["ChebyshevSpline", "is_nested_n_nodes"]


def is_nested_n_nodes(n_nodes) -> bool:
    """True if n_nodes is the nested per-piece List[List[int]] form."""
    return n_nodes is not None and any(
        isinstance(x, (list, tuple)) for x in n_nodes
    )


class ChebyshevSpline:
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("ChebyshevSpline: implementation pending")
