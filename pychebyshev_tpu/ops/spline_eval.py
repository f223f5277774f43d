"""Fused device evaluation for flat-``n_nodes`` splines.

The reference (and the host path here) routes each query to its piece
and runs one batched evaluation per occupied piece — on a remote TPU
that is one dispatch per piece plus host-side index bookkeeping, and
spline throughput craters to ~0.3M queries/s while the dense kernel
does 60M+.

This path instead evaluates **every piece for every point in one
dispatch** and selects by the routing index:

- piece routing runs on the HOST in full f64 (``np.searchsorted`` per
  dim over the knots — the reference's own routing rule,
  ``spline.py:414-445``), so an f32 serving engine can never
  mis-route a point that sits within f32 eps of a knot;
- the per-piece grids (nodes / weights / differentiation matrices) are
  stacked once into (P, n) / (P, n, n) arrays;
- ``vmap`` over the piece axis runs the same fused dense kernel the
  single-tensor path uses, in groups of ``MASKED_GROUP`` pieces so the
  transient (G, N) buffers stay bounded for large piece counts;
- ``take_along_axis`` + masked accumulation picks each point's piece.

Work is P x one dense evaluation in ONE dispatch, vs 1x the work in P
dispatches for the host-routed path.  On the relayed TPU each dispatch
costs ~1-2 ms, so masking wins while P x (batch work) is below
~P_crossover dispatch overheads; measured at the 1M-point bucket the
masked path stays ahead of host routing up to ``MASKED_MAX_PIECES``
pieces (see docs/performance.md).  The host path remains for nested
``n_nodes`` and beyond the crossover.

Results are numerically identical to the routed path: every point's
value comes from the same per-piece kernel either way.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pychebyshev_tpu.ops import eval as eval_ops

__all__ = ["masked_eval_batch", "masked_eval_batch_multi",
           "route_piece_indices", "piece_strides",
           "MASKED_MAX_PIECES", "MASKED_GROUP", "stack_pieces"]

# Crossovers vs the host-routed per-piece path (dispatch-bound, ~1M q/s
# flat on the relayed TPU).  Measured on the 12^2-nodes/piece 2-D
# benchmark (scripts/sweep_spline_crossover.py, chained protocol):
#   f32 masked: 69M (P=2) / 35M (P=16) / 17.6M (P=32) / 8.8M (P=64)
#   f64 masked: 7.9M (P=2) / 1.34M (P=16) / 0.95M (P=32) / 0.48M (P=64)
# so software-f64 masking crosses the routed path near P=32 while f32
# masking still leads ~9x at P=64.
MASKED_MAX_PIECES = 64       # f32 serving tier
MASKED_MAX_PIECES_F64 = 32   # class path / f64 engines
# Pieces evaluated per unrolled vmap group inside the single dispatch.
MASKED_GROUP = 16


def stack_pieces(pieces, dtype=None):
    """Stack per-piece grid data: (P, *grid) tensor + per-dim (P, n)
    nodes/weights and (P, n, n) differentiation matrices."""
    cast = (lambda a: jnp.asarray(a)) if dtype is None else (
        lambda a: jnp.asarray(a, dtype))
    tensors = jnp.stack([cast(p.tensor_values) for p in pieces])
    d = pieces[0].num_dimensions
    nodes = tuple(jnp.stack([cast(p.nodes[k]) for p in pieces])
                  for k in range(d))
    weights = tuple(jnp.stack([cast(p.weights[k]) for p in pieces])
                    for k in range(d))
    diffs = tuple(jnp.stack([cast(p.diff_matrices[k]) for p in pieces])
                  for k in range(d))
    return tensors, nodes, weights, diffs


def piece_strides(knot_counts: Sequence[int]) -> Tuple[int, ...]:
    """C-order ravel strides of the piece grid with ``k_d + 1`` pieces
    per dim."""
    shape = [k + 1 for k in knot_counts]
    return tuple(int(np.prod(shape[d + 1:], dtype=np.int64))
                 for d in range(len(shape)))


def route_piece_indices(knots, strides: Sequence[int], points) -> np.ndarray:
    """Host-side f64 piece routing: flat C-order piece index per point.

    ``side='right'`` matches the reference's ``_find_piece``; points at
    a knot belong to the right piece, points outside the domain clamp
    to the boundary pieces naturally (searchsorted saturates).
    """
    pts = np.asarray(points, dtype=np.float64)
    flat = np.zeros(pts.shape[0], dtype=np.int32)
    for d, kn in enumerate(knots):
        kn = np.asarray(kn, dtype=np.float64)
        if kn.size:
            cell = np.searchsorted(kn, pts[:, d], side="right")
            flat += cell.astype(np.int32) * np.int32(strides[d])
    return flat


@functools.partial(jax.jit, static_argnames=("orders",))
def masked_eval_batch(tensors, nodes, weights, diffs, flat, points,
                      orders: Tuple[int, ...]) -> jax.Array:
    """All-pieces evaluation + routing selection, one dispatch.

    Parameters
    ----------
    tensors : (P, n_0, ..., n_{d-1}) stacked piece values (any float
        dtype; sets the evaluation dtype).
    nodes/weights : per-dim tuples of (P, n_k) stacked grids.
    diffs : per-dim tuple of (P, n_k, n_k) differentiation matrices.
    flat : (N,) int32 flat piece index per point (host-routed in f64,
        :func:`route_piece_indices`).
    points : (N, d) queries (cast to the tensor dtype on device).
    orders : static per-dim derivative orders.
    """
    pts = jnp.asarray(points, dtype=tensors.dtype)
    flat = jnp.asarray(flat, dtype=jnp.int32)
    n_pieces = tensors.shape[0]

    def one_piece(tensor, nds, ws, ds):
        return eval_ops.eval_batch(tensor, nds, ws, ds, pts, orders)

    vm = jax.vmap(one_piece)
    if n_pieces <= MASKED_GROUP:
        per_piece = vm(tensors, nodes, weights, diffs)
        return jnp.take_along_axis(per_piece, flat[None, :], axis=0)[0]

    # Group-chunked accumulation: bounded (G, N) transients, still one
    # compiled dispatch (the Python loop unrolls under jit).
    acc = jnp.zeros(pts.shape[0], dtype=tensors.dtype)
    for lo in range(0, n_pieces, MASKED_GROUP):
        hi = min(lo + MASKED_GROUP, n_pieces)
        sub = vm(tensors[lo:hi],
                 tuple(a[lo:hi] for a in nodes),
                 tuple(a[lo:hi] for a in weights),
                 tuple(a[lo:hi] for a in diffs))
        sel = jnp.clip(flat - lo, 0, hi - lo - 1)
        vals = jnp.take_along_axis(sub, sel[None, :], axis=0)[0]
        acc = jnp.where((flat >= lo) & (flat < hi), vals, acc)
    return acc


@functools.partial(jax.jit, static_argnames=("orders_list",))
def masked_eval_batch_multi(tensors, nodes, weights, diffs, flat, points,
                            orders_list: Tuple[Tuple[int, ...], ...]
                            ) -> jax.Array:
    """All pieces x all derivative specs in one dispatch -> (S, N).

    The spline Greek-set primitive: each piece builds its barycentric
    rows once per chunk and shares them across every derivative spec
    (``ops.eval.eval_batch_multi`` under a piece vmap), and on-device
    routing selects each point's piece for all specs at once.  S specs
    over P pieces cost P row builds + P*S GEMMs in ONE dispatch — vs
    S dispatches (each P x work) for spec-at-a-time masked serving.

    Knot semantics match :func:`masked_eval_batch`: a point sitting on
    a knot takes the right piece's one-sided derivative (the batched
    paths never raise; single-point ``eval`` is where the guard lives).
    """
    pts = jnp.asarray(points, dtype=tensors.dtype)
    flat = jnp.asarray(flat, dtype=jnp.int32)
    n_pieces = tensors.shape[0]

    def one_piece(tensor, nds, ws, ds):
        return eval_ops.eval_batch_multi(tensor, nds, ws, ds, pts,
                                         orders_list)      # (S, N)

    vm = jax.vmap(one_piece)
    # The (G, S, N) transient budget matches masked_eval_batch's
    # (G_base, N) budget: shrink the piece group by the spec count.
    group = max(1, MASKED_GROUP // max(1, len(orders_list)))
    if n_pieces <= group:
        per_piece = vm(tensors, nodes, weights, diffs)      # (P, S, N)
        return jnp.take_along_axis(per_piece, flat[None, None, :],
                                   axis=0)[0]

    acc = jnp.zeros((len(orders_list), pts.shape[0]), dtype=tensors.dtype)
    for lo in range(0, n_pieces, group):
        hi = min(lo + group, n_pieces)
        sub = vm(tensors[lo:hi],
                 tuple(a[lo:hi] for a in nodes),
                 tuple(a[lo:hi] for a in weights),
                 tuple(a[lo:hi] for a in diffs))            # (g, S, N)
        sel = jnp.clip(flat - lo, 0, hi - lo - 1)
        vals = jnp.take_along_axis(sub, sel[None, None, :], axis=0)[0]
        acc = jnp.where(((flat >= lo) & (flat < hi))[None, :], vals, acc)
    return acc
