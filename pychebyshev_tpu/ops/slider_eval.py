"""Fused batched evaluation of a slider's additive sum.

A slider value query is ``pivot + sum_i (s_i(x_{G_i}) - pivot)``; the
per-slide batched kernels are independent, so evaluating them as S
separate device calls costs S dispatches (and S host round-trips on a
relayed TPU).  This entry point closes over every slide's grid data and
computes the whole sum in ONE jitted program — XLA schedules the
per-slide chains back to back (or overlapping) in a single dispatch.

Slides have heterogeneous shapes (group sizes and node counts differ),
so this is a single compiled program over a tuple pytree, not a vmap.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pychebyshev_tpu.ops import eval as eval_ops

__all__ = ["slider_value_batch"]


@functools.partial(jax.jit, static_argnames=("groups",))
def slider_value_batch(slide_data, pivot_value,
                       groups: Tuple[Tuple[int, ...], ...],
                       points) -> jax.Array:
    """Sum of all slides' batched values in one dispatch.

    Parameters
    ----------
    slide_data : tuple of (tensor, nodes, weights, diffs) per slide
        (the per-slide grid pytrees; shapes are compile-time constants).
    pivot_value : traced scalar f(z).
    groups : static per-slide global dim indices.
    points : (N, d) query points.
    """
    pts = jnp.asarray(points)   # caller's dtype governs (f64 library
    total = None                # path, f32 serving engines)
    for (tensor, nodes, weights, diffs), group in zip(slide_data, groups):
        sub = pts[:, list(group)]
        vals = eval_ops.eval_batch(tensor, nodes, weights, diffs, sub,
                                   (0,) * len(group))
        total = vals if total is None else total + vals
    return total - (len(groups) - 1) * pivot_value
