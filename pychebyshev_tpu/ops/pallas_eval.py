"""Fused Pallas kernel for batched dense barycentric evaluation (f32).

The XLA path (``ops.eval``) materializes the Khatri-Rao factor
``W_R (N, prod(right dims))`` in HBM between the row build and the GEMM
— ~12 KB of HBM traffic per query point on an 11^5 grid, which bounds
throughput at the memory bandwidth.  This kernel keeps the whole
pipeline per batch tile in VMEM:

    per-dim barycentric rows  ->  Khatri-Rao via one-hot *selection
    matmuls* (no reshapes/gathers — Mosaic-friendly)  ->  one MXU GEMM
    against the reshaped tensor  ->  row-wise dot

HBM traffic drops to the points in and values out (~24 B/point); the
kernel becomes MXU-bound.

Scope: float32, value tensors that fit VMEM alongside the tile
intermediates (~<= 2 MB, i.e. grids to ~11^5-13^5), derivative passes
pre-applied to the tensor by the caller.  f64 falls back to the XLA path
(software f64 makes a kernel pointless there).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL
from pychebyshev_tpu.ops.eval import _split_index, apply_derivative_passes

__all__ = ["fused_eval_batch", "supports_fused"]

# Points per tile.  1024 is the smallest block that satisfies the XLA
# 1-D output tiling on TPU (f32 tile = 1024) and fits VMEM comfortably;
# larger blocks exceeded VMEM on v5e for the 11^5 benchmark shape.
_BLOCK = 1024


def _selection_matrix(n_pad: int, n_d: int, group_shape: Sequence[int],
                      pos: int) -> np.ndarray:
    """One-hot expansion matrix E (n_pad, prod(group_shape)).

    ``E[i, m] = 1`` iff digit ``pos`` of the C-order multi-index ``m``
    (over ``group_shape``) equals ``i``.  Rows ``i >= n_d`` stay zero, so
    lane padding of the coefficient rows contributes nothing.
    """
    total = int(np.prod(group_shape))
    e = np.zeros((n_pad, total), dtype=np.float32)
    digits = np.unravel_index(np.arange(total), group_shape)[pos]
    e[digits, np.arange(total)] = 1.0
    return e


@functools.lru_cache(maxsize=None)
def _build_kernel(shape: Tuple[int, ...], block: int, interpret: bool):
    """Compile a fused evaluator specialized to a grid shape.

    Contraction structure (dims split L | m | R' at the traffic-optimal
    split point): per tile,

        W_L  = kron of left-dim rows        (selection matmuls, K <= n_max)
        W_R' = kron of rows right of m      (selection matmuls)
        Y    = sum_i  C_m[:, i] * (W_R' @ T_i)   (n_m GEMMs, K = nR')
        out  = rowsum(W_L * Y)

    Looping the middle dim instead of expanding a full (B, nR) Khatri-Rao
    factor keeps every MXU operand at K <= max(n_max, nR') — no padded
    128-lane expansion matmuls — and all intermediates in VMEM.
    """
    d = len(shape)
    s = _split_index(shape)
    left_shape = shape[:s]
    n_mid = shape[s]
    rp_shape = shape[s + 1:]
    n_left = int(np.prod(left_shape)) if left_shape else 1
    n_rp = int(np.prod(rp_shape)) if rp_shape else 1
    n_max = max(shape)
    hi = jax.lax.Precision.HIGHEST

    e_left = [_selection_matrix(n_max, shape[k], left_shape, k)
              for k in range(s)]
    e_rp = [_selection_matrix(n_max, shape[s + 1 + k], rp_shape, k)
            for k in range(len(rp_shape))]

    def kernel(points_ref, nodes_ref, weights_ref, valid_ref, t3_ref,
               *rest):
        e_refs = rest[:len(e_left) + len(e_rp)]
        out_ref = rest[len(e_left) + len(e_rp)]
        pts = points_ref[:]  # (block, d)

        rows = []
        for dim in range(d):
            x = pts[:, dim][:, None]                    # (B, 1)
            nd_row = nodes_ref[dim][None, :]            # (1, n_max)
            w_row = weights_ref[dim][None, :]
            v_row = valid_ref[dim][None, :]             # 1.0 where real
            diff = x - nd_row
            # Float (0/1) masks throughout: Mosaic's boolean reductions
            # lower poorly, so has_exact is a float max-reduction.
            tol = jnp.float32(NODE_COINCIDENCE_TOL)
            exact_f = jnp.where(jnp.abs(diff) < tol, v_row, 0.0)
            safe = jnp.where((exact_f > 0) | (v_row == 0), 1.0, diff)
            w_over = jnp.where((v_row > 0) & (exact_f == 0),
                               w_row / safe, 0.0)
            denom = jnp.sum(w_over, axis=1, keepdims=True)
            has_exact = jnp.max(exact_f, axis=1, keepdims=True)
            interp = w_over / jnp.where(has_exact > 0, 1.0, denom)
            rows.append(jnp.where(has_exact > 0, exact_f, interp))

        def kr(row_list, e_list):
            if not row_list:
                return None
            acc = None
            for row, e in zip(row_list, e_list):
                term = jnp.dot(row, e[:], precision=hi,
                               preferred_element_type=jnp.float32)
                acc = term if acc is None else acc * term
            return acc

        w_left = kr(rows[:s], e_refs[:len(e_left)])       # (B, nL) | None
        w_rp = kr(rows[s + 1:], e_refs[len(e_left):])     # (B, nRp) | None
        c_mid = rows[s]                                   # (B, n_max)

        y = None
        for i in range(n_mid):
            t_i = t3_ref[i]                               # (nRp, nL)
            if w_rp is None:
                contrib = c_mid[:, i][:, None] * t_i      # (B=?, no)
                contrib = jnp.broadcast_to(t_i[0][None, :],
                                           (block, n_left)) \
                    * c_mid[:, i][:, None]
            else:
                contrib = c_mid[:, i][:, None] * jax.lax.dot_general(
                    w_rp, t_i,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=hi, preferred_element_type=jnp.float32)
            y = contrib if y is None else y + contrib     # (B, nL)

        if w_left is None:
            out_ref[:] = y[:, 0]
        else:
            out_ref[:] = jnp.sum(w_left * y, axis=1)

    def run(points_padded, nodes_pad, weights_pad, valid, t3):
        n_padded = points_padded.shape[0]
        grid = (n_padded // block,)
        const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const_spec,  # nodes
            const_spec,  # weights
            const_spec,  # valid
            const_spec,  # t3
        ] + [const_spec] * (len(e_left) + len(e_rp))
        out_spec = pl.BlockSpec((block,), lambda i: (i,),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_padded,), jnp.float32),
            interpret=interpret,
        )(points_padded, nodes_pad, weights_pad, valid, t3,
          *[jnp.asarray(e) for e in (e_left + e_rp)])

    return jax.jit(run), (s, n_left, n_mid, n_rp, n_max)


def supports_fused(shape: Sequence[int], dtype) -> bool:
    """Whether the fused kernel covers this configuration."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if len(shape) < 3:
        return False
    total = int(np.prod(shape))
    return total * 4 <= 2 * 1024 * 1024  # tensor fits VMEM comfortably


def fused_eval_batch(tensor, nodes, weights, diff_matrices, points,
                     orders: Tuple[int, ...] = None, *,
                     block: int = _BLOCK,
                     interpret: bool = None) -> jax.Array:
    """Fused f32 batched evaluation (drop-in for ``ops.eval.eval_batch``).

    ``interpret=None`` auto-selects interpreter mode off-TPU (for CPU
    tests); derivative passes apply to the tensor up front.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    shape = tuple(int(n) for n in tensor.shape)
    d = len(shape)
    if orders is None:
        orders = (0,) * d

    tensor = jnp.asarray(tensor, jnp.float32)
    if any(o > 0 for o in orders):
        diffs32 = tuple(jnp.asarray(m, jnp.float32)
                        for m in diff_matrices)
        tensor = apply_derivative_passes(tensor, diffs32, tuple(orders))

    run, (s, n_left, n_mid, n_rp, n_max) = _build_kernel(
        shape, block, bool(interpret))

    nodes_pad = np.zeros((d, n_max), dtype=np.float32)
    weights_pad = np.zeros((d, n_max), dtype=np.float32)
    valid = np.zeros((d, n_max), dtype=np.float32)
    for k in range(d):
        nodes_pad[k, :shape[k]] = np.asarray(nodes[k], dtype=np.float32)
        weights_pad[k, :shape[k]] = np.asarray(weights[k],
                                               dtype=np.float32)
        valid[k, :shape[k]] = 1.0

    # (n_mid, nRp, nL): slice i is the (nRp, nL) operand of the i-th
    # middle-dim GEMM.
    t3 = jnp.transpose(tensor.reshape(n_left, n_mid, n_rp), (1, 2, 0))

    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    pad = (-n) % block
    padded = jnp.pad(points, ((0, pad), (0, 0)))

    # The kernel is pure f32; with global x64 on, index arithmetic would
    # otherwise trace as i64, which Mosaic rejects.
    with jax.enable_x64(False):
        out = run(padded, jnp.asarray(nodes_pad),
                  jnp.asarray(weights_pad), jnp.asarray(valid), t3)
    return out[:n]
