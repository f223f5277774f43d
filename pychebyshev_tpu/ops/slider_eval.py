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

__all__ = ["slider_value_batch", "slider_multi_batch"]


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


@functools.partial(jax.jit, static_argnames=("groups", "spec_plan"))
def slider_multi_batch(slide_data, pivot_value,
                       groups: Tuple[Tuple[int, ...], ...],
                       spec_plan: Tuple, points) -> jax.Array:
    """Batch x multi-derivative-spec slider evaluation -> (S, N).

    A Greek set on a slider decomposes per spec: the value spec is the
    additive sum over all slides (Eq 7.5); a derivative spec confined
    to one group is that slide's batched derivative; a spec crossing
    groups is exactly zero.  Running them as S separate calls costs S
    dispatches — this computes the whole report in ONE jitted program,
    evaluating the all-slides value sum at most once and one extra
    per-slide kernel per derivative spec.

    Parameters
    ----------
    slide_data : tuple of (tensor, nodes, weights, diffs) per slide.
    pivot_value : traced scalar f(z).
    groups : static per-slide global dim indices.
    spec_plan : static per-spec routing, one of
        ``("value",)`` — additive sum of all slides;
        ``("slide", idx, sub_orders)`` — owning slide's derivative;
        ``("zero",)`` — cross-group mixed partial (identically 0).
    points : (N, d) query points.
    """
    pts = jnp.asarray(points)
    value_sum = None
    rows = []
    for plan in spec_plan:
        if plan[0] == "value":
            if value_sum is None:
                value_sum = slider_value_batch(slide_data, pivot_value,
                                               groups, pts)
            rows.append(value_sum)
        elif plan[0] == "slide":
            _, idx, sub_orders = plan
            tensor, nodes, weights, diffs = slide_data[idx]
            sub = pts[:, list(groups[idx])]
            rows.append(eval_ops.eval_batch(tensor, nodes, weights,
                                            diffs, sub, sub_orders))
        else:
            rows.append(jnp.zeros(pts.shape[0], dtype=pts.dtype))
    return jnp.stack(rows)
