"""Fused Pallas kernel for batched dense barycentric evaluation (f32).

The XLA path (``ops.eval``) materializes the Khatri-Rao factor
``W_R (N, prod(right dims))`` in HBM between the row build and the GEMM
— ~12 KB of HBM traffic per query point on an 11^5 grid, which bounds
throughput at memory bandwidth.  This kernel keeps the whole pipeline
per batch tile in VMEM and packs the per-dim work to use the hardware:

- **Lane-packed rows**: all dims' nodes/weights concatenate into one
  (1, W) vector (W = sum n_d), so the barycentric row build is a single
  chain of VPU ops on one (B, W) array instead of d lane-padded ones.
  Per-dim reductions (denominators, exact-hit flags) are block-sum
  *selection matmuls* against a (W, d) 0/1 matrix — no reshapes,
  gathers, or boolean reductions (all Mosaic-hostile).
- **Khatri-Rao via selection matmuls** for the small side groups, and a
  **middle-dim loop** ``Y += C_m[:, i] * (W_R' @ T_i)`` so every MXU
  operand keeps K <= max(W, prod(R')) — no padded expansion GEMMs.
- HIGHEST precision on every matmul touching data: Mosaic lowers only
  DEFAULT (single-pass bf16, too coarse) and HIGHEST (true f32) dot
  precisions — the bf16x3 ``HIGH`` tier the XLA path uses is
  unsupported in-kernel, which is why the XLA path currently leads
  this kernel ~20% on the benchmark shape despite the extra HBM
  traffic.  Kept opt-in for grids where that traffic dominates.

Scope: float32, value tensors that fit VMEM alongside tile
intermediates (grids to ~11^5-13^5); derivative passes are pre-applied
to the tensor.  f64 falls back to the XLA path (f64 is software on TPU).
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


def _block_selection(shape: Sequence[int], group: Sequence[int],
                     group_shape: Sequence[int], pos: int,
                     offsets: Sequence[int]) -> np.ndarray:
    """E (W, prod(group_shape)) mapping packed-row lanes to a Khatri-Rao
    group column: ``E[offsets[dim] + i, m] = 1`` iff digit ``pos`` of the
    C-order multi-index ``m`` equals ``i`` for ``dim = group[pos]``."""
    w = sum(shape)
    total = int(np.prod(group_shape))
    e = np.zeros((w, total), dtype=np.float32)
    dim = group[pos]
    digits = np.unravel_index(np.arange(total), group_shape)[pos]
    e[offsets[dim] + digits, np.arange(total)] = 1.0
    return e


@functools.lru_cache(maxsize=None)
def _build_kernel(shape: Tuple[int, ...], block: int, interpret: bool):
    """Compile a fused evaluator specialized to a grid shape."""
    d = len(shape)
    s = _split_index(shape)
    left_dims = list(range(s))
    mid = s
    rp_dims = list(range(s + 1, d))
    left_shape = shape[:s]
    n_mid = shape[mid]
    rp_shape = shape[s + 1:]
    n_left = int(np.prod(left_shape)) if left_shape else 1
    n_rp = int(np.prod(rp_shape)) if rp_shape else 1
    offsets = np.concatenate([[0], np.cumsum(shape)]).astype(int)
    w_total = int(offsets[-1])
    mid_off = int(offsets[mid])
    hi = jax.lax.Precision.HIGHEST

    # Packed constants.
    # s_x (d, W): X = pts @ s_x broadcasts each point coord over its
    # dim's lane block; s_x.T block-sums a (B, W) array per dim.
    s_x = np.zeros((d, w_total), dtype=np.float32)
    for dim in range(d):
        s_x[dim, offsets[dim]:offsets[dim + 1]] = 1.0

    e_left = [_block_selection(shape, left_dims, left_shape, k, offsets)
              for k in range(len(left_dims))]
    e_rp = [_block_selection(shape, rp_dims, rp_shape, k, offsets)
            for k in range(len(rp_dims))]
    n_groups = len(e_left) + len(e_rp)

    def kernel(points_ref, nodes_ref, weights_ref, valid_ref, sx_ref,
               t3_ref, *rest):
        e_refs = rest[:n_groups]
        out_ref = rest[n_groups]
        pts = points_ref[:]                          # (B, d)
        sx = sx_ref[:]                               # (d, W)

        # Broadcast coords over lane blocks: one GEMM, exact under
        # HIGHEST (selection matrix is 0/1).
        x_cat = jnp.dot(pts, sx, precision=hi,
                        preferred_element_type=jnp.float32)  # (B, W)

        nd = nodes_ref[:]                            # (1, W)
        wt = weights_ref[:]
        vd = valid_ref[:]                            # 1.0 on real lanes

        diff = x_cat - nd
        tol = jnp.float32(NODE_COINCIDENCE_TOL)
        exact_f = jnp.where(jnp.abs(diff) < tol, vd, 0.0)
        safe = jnp.where((exact_f > 0) | (vd == 0), 1.0, diff)
        w_over = jnp.where((vd > 0) & (exact_f == 0), wt / safe, 0.0)

        # Per-dim block sums -> broadcast back over the blocks.
        sums = jnp.dot(w_over, sx.T, precision=hi,
                       preferred_element_type=jnp.float32)   # (B, d)
        hits = jnp.dot(exact_f, sx.T, precision=hi,
                       preferred_element_type=jnp.float32)   # (B, d)
        denom_cat = jnp.dot(sums, sx, precision=hi,
                            preferred_element_type=jnp.float32)
        hit_cat = jnp.dot(hits, sx, precision=hi,
                          preferred_element_type=jnp.float32)

        rows = jnp.where(
            hit_cat > 0, exact_f,
            w_over / jnp.where(hit_cat > 0, 1.0, denom_cat))  # (B, W)

        def kr(e_list):
            acc = None
            for e_ref in e_list:
                term = jnp.dot(rows, e_ref[:], precision=hi,
                               preferred_element_type=jnp.float32)
                acc = term if acc is None else acc * term
            return acc

        w_left = kr(e_refs[:len(e_left)])            # (B, nL) | None
        w_rp = kr(e_refs[len(e_left):])              # (B, nRp) | None

        y = None
        for i in range(n_mid):
            c_i = rows[:, mid_off + i][:, None]      # (B, 1)
            if w_rp is None:
                contrib = c_i * jnp.broadcast_to(
                    t3_ref[i][0][None, :], (block, n_left))
            else:
                contrib = c_i * jax.lax.dot_general(
                    w_rp, t3_ref[i],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    precision=hi, preferred_element_type=jnp.float32)
            y = contrib if y is None else y + contrib  # (B, nL)

        if w_left is None:
            out_ref[:] = y[:, 0]
        else:
            out_ref[:] = jnp.sum(w_left * y, axis=1)

    def run(points_padded, nodes_cat, weights_cat, valid_cat, sx, t3):
        n_padded = points_padded.shape[0]
        grid = (n_padded // block,)
        const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const_spec,  # nodes_cat
            const_spec,  # weights_cat
            const_spec,  # valid_cat
            const_spec,  # s_x
            const_spec,  # t3
        ] + [const_spec] * n_groups
        out_spec = pl.BlockSpec((block,), lambda i: (i,),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_padded,), jnp.float32),
            interpret=interpret,
        )(points_padded, nodes_cat, weights_cat, valid_cat, sx, t3,
          *[jnp.asarray(e) for e in (e_left + e_rp)])

    meta = (s, n_left, n_mid, n_rp, offsets, w_total)
    return jax.jit(run), np.asarray(s_x), meta


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

    run, s_x, (s, n_left, n_mid, n_rp, offsets, w_total) = _build_kernel(
        shape, block, bool(interpret))

    nodes_cat = np.zeros((1, w_total), dtype=np.float32)
    weights_cat = np.zeros((1, w_total), dtype=np.float32)
    valid_cat = np.zeros((1, w_total), dtype=np.float32)
    for k in range(d):
        lo, hi_off = offsets[k], offsets[k + 1]
        nodes_cat[0, lo:hi_off] = np.asarray(nodes[k], dtype=np.float32)
        weights_cat[0, lo:hi_off] = np.asarray(weights[k],
                                               dtype=np.float32)
        valid_cat[0, lo:hi_off] = 1.0

    # (n_mid, nRp, nL): slice i is the GEMM operand of mid index i.
    t3 = jnp.transpose(tensor.reshape(n_left, n_mid, n_rp), (1, 2, 0))

    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    pad = (-n) % block
    padded = jnp.pad(points, ((0, pad), (0, 0)))

    # The kernel is pure f32; with global x64 on, index arithmetic would
    # otherwise trace as i64, which Mosaic rejects.
    with jax.enable_x64(False):
        out = run(padded, jnp.asarray(nodes_cat),
                  jnp.asarray(weights_cat), jnp.asarray(valid_cat),
                  jnp.asarray(s_x), t3)
    return out[:n]
