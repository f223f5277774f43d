"""Compatibility checks for interpolant arithmetic.

Parity target: reference ``_algebra.py:8-58`` (scalar predicate and
cross-object compatibility validation).  TT-specific core algebra lives
in ``models.tensor_train``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["is_scalar", "check_compatible"]


def is_scalar(value) -> bool:
    """True if *value* is a plain numeric scalar (int, float, numpy scalar)."""
    return isinstance(value, (int, float, np.integer, np.floating))


def check_compatible(a, b) -> None:
    """Validate that two interpolants can be combined arithmetically.

    Requires: same concrete type, both built, identical num_dimensions,
    n_nodes, domain (allclose) and max_derivative_order.
    """
    if type(a) is not type(b):
        raise TypeError(
            f"Cannot combine {type(a).__name__} with {type(b).__name__}; "
            f"operands must be the same type."
        )

    a_built = (getattr(a, "tensor_values", None) is not None) or getattr(a, "_built", False)
    b_built = (getattr(b, "tensor_values", None) is not None) or getattr(b, "_built", False)
    if not a_built:
        raise RuntimeError("Left operand is not built. Call build() first.")
    if not b_built:
        raise RuntimeError("Right operand is not built. Call build() first.")

    if a.num_dimensions != b.num_dimensions:
        raise ValueError(
            f"Dimension mismatch: {a.num_dimensions} vs {b.num_dimensions}"
        )
    if not np.array_equal(np.asarray(a.n_nodes, dtype=int),
                          np.asarray(b.n_nodes, dtype=int)):
        raise ValueError(f"Node count mismatch: {a.n_nodes} vs {b.n_nodes}")
    if not np.allclose(np.asarray(a.domain, dtype=float),
                       np.asarray(b.domain, dtype=float)):
        raise ValueError(f"Domain mismatch: {a.domain} vs {b.domain}")
    if a.max_derivative_order != b.max_derivative_order:
        raise ValueError(
            f"max_derivative_order mismatch: "
            f"{a.max_derivative_order} vs {b.max_derivative_order}"
        )


# Reference-name compat aliases (`from pychebyshev._algebra import ...`)
def _tt_add_cores(cores_a, cores_b):
    from pychebyshev_tpu.models.tt_algorithms import tt_add_cores
    return tt_add_cores(cores_a, cores_b)


def _tt_round_cores(cores, max_rank, tolerance=1e-12):
    from pychebyshev_tpu.models.tt_algorithms import tt_round_cores
    return tt_round_cores(cores, max_rank, tolerance)


def _tt_swap_adjacent(cores, i, max_rank, tolerance=1e-12):
    from pychebyshev_tpu.models.tt_algorithms import tt_swap_adjacent
    return tt_swap_adjacent(cores, i, max_rank, tolerance)


_is_scalar = is_scalar
_check_compatible = check_compatible
