"""Fused Pallas kernel for batched dense barycentric evaluation (f32).

The XLA path (``ops.eval``) materializes the Khatri-Rao factor
``W_R (N, prod(right dims))`` in HBM between the row build and the GEMM
— ~12 KB of HBM traffic per query point on an 11^5 grid, which bounds
throughput at memory bandwidth.  This kernel streams 6 bytes/point/dim
(pre-split coordinates) and keeps the entire pipeline — row build,
Khatri-Rao, tensor contraction — in VMEM.

Design notes (v4; the round-1 kernel lost to the XLA path ~2.5x):

1. **Mosaic exposes only DEFAULT/HIGHEST dot precisions**, so the
   round-1 kernel paid 6 bf16 MXU passes per f32 GEMM while XLA paid 3
   via ``Precision.HIGH``.  All dots here are *single-pass bf16* with
   manually split operands:

   - 0/1 selection/broadcast matmuls are **exact** when the data side
     is split into bf16 components that the f32 accumulator re-sums
     (3 splits reconstruct all 24 f32 mantissa bits);
   - the value-tensor contraction uses the 3-product bf16x3 scheme
     ``hi@hi + lo@hi + hi@lo`` (= ``Precision.HIGH`` arithmetic,
     ~1e-5 relative — an order below f32 interpolation error).

2. **One mega-dot per tile**: ``[rp_hi | rp_lo | rp_hi] @
   [T_hi; T_hi; T_lo]`` over all middle-dim slices at once — the full
   tensor contraction as a single (B, 3*padRp) x (3*padRp, n_mid*padL)
   MXU dispatch, with 128-aligned column blocks so the per-mid slices
   and Khatri-Rao factors slice out without relayouts.

3. **The row build lives in-kernel** on (B, W) VMEM tiles: an XLA
   prologue pays lane-padded (N, n_d) elementwise chains plus concat
   relayouts plus an HBM round-trip (measured ~9.6 ms/1M pts — half
   the budget).  Exact-node coincidence uses the clamp trick:
   ``safe = where(|x-node| < tol, tol, x-node)`` makes the row
   converge to the one-hot limit with O(tol) error — invisible in f32
   — with no boolean reductions (Mosaic-hostile) and no extra passes.

Numerical trap worth remembering: ``x.astype(bf16).astype(f32)`` is
NOT a safe Dekker split under jit on TPU — XLA's excess-precision pass
folds the convert pair into an identity, zeroing the residual
(measured 7.6e-3 vs 1.5e-5 reconstruction error).  XLA-side splits use
``lax.reduce_precision``; Mosaic applies no such folding, so in-kernel
splits may use plain converts.

Scope: float32, >=3 dims, grids whose working set fits VMEM (see
``supports_fused``); derivative passes are pre-applied to the tensor.
f64 falls back to the XLA path (f64 is software on TPU).  Reference
hot path being replaced: ``barycentric.py:885-949``.
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

__all__ = ["fused_eval_batch", "supports_fused", "prefer_fused"]

# Points per tile: the f32 1-D output tile on TPU is 1024 (so blocks
# are multiples of it); 2048 is fastest where the (B, n_mid*padL)
# mega-dot result still fits VMEM, 1024 covers larger grids.  Raising
# the scoped-VMEM limit (CompilerParams(vmem_limit_bytes=...)) lets
# 4096/8192 compile too, but both measured SLOWER than 2048 on the
# 11^5 benchmark (93.8/88.6 vs 106.8M q/s) — bigger tiles spill.
_BLOCK_CANDIDATES = (2048, 1024)

_LANE = 128


def _rup(n: int, m: int = _LANE) -> int:
    return -(-n // m) * m


def _selection_matrix(shape: Sequence[int], group: Sequence[int],
                      group_shape: Sequence[int], pos: int,
                      offsets: Sequence[int]) -> np.ndarray:
    """0/1 matrix (W, prod(group_shape)) mapping packed-row lanes to a
    Khatri-Rao group column: entry ``[offsets[dim] + i, m]`` is 1 iff
    digit ``pos`` of the C-order multi-index ``m`` equals ``i`` for
    ``dim = group[pos]``."""
    w = sum(shape)
    total = int(np.prod(group_shape))
    e = np.zeros((w, total), dtype=np.float32)
    dim = group[pos]
    digits = np.unravel_index(np.arange(total), group_shape)[pos]
    e[offsets[dim] + digits, np.arange(total)] = 1.0
    return e


def _round_to_bf16_in_f32(x: jax.Array) -> jax.Array:
    """Round f32 to bf16 precision while STAYING f32 (optimizer-opaque;
    see the module docstring for why ``astype`` chains are unsafe under
    jit on TPU)."""
    return jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)


def _split2_bf16(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """hi/lo bf16 split of f32 (captures the top 16 mantissa bits).
    XLA-side (jit-safe)."""
    hi32 = _round_to_bf16_in_f32(x)
    lo32 = _round_to_bf16_in_f32(x - hi32)
    return hi32.astype(jnp.bfloat16), lo32.astype(jnp.bfloat16)


def _split3_bf16(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Three-way bf16 split of f32 — the components sum back to the
    f32 value exactly (3x8 mantissa bits >= f32's 24).  XLA-side."""
    hi32 = _round_to_bf16_in_f32(x)
    r = x - hi32
    mid32 = _round_to_bf16_in_f32(r)
    lo32 = _round_to_bf16_in_f32(r - mid32)
    return (hi32.astype(jnp.bfloat16), mid32.astype(jnp.bfloat16),
            lo32.astype(jnp.bfloat16))


def _ksplit2(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """In-kernel hi/lo bf16 split (Mosaic does not fold the converts)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _ksplit3(x: jax.Array):
    """In-kernel three-way bf16 split (exact f32 reconstruction)."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo



def _pick_ksplits(interpret: bool):
    """In-kernel bf16 split fns, selected by execution mode.

    Mosaic compiles the plain astype splits faithfully, but under
    ``interpret=True`` the kernel body runs as ordinary XLA, whose
    excess-precision pass FOLDS astype round trips (zeroing the lo/mid
    components — the trap in the module docstring).  Interpret mode
    therefore uses the reduce_precision-based splits."""
    if interpret:
        return _split2_bf16, _split3_bf16
    return _ksplit2, _ksplit3

def _geometry(shape: Tuple[int, ...]):
    """Static block geometry shared by the kernel builder and callers."""
    d = len(shape)
    s = _split_index(shape)
    left_dims = tuple(range(s))
    rp_dims = tuple(range(s + 1, d))
    left_shape = shape[:s]
    rp_shape = shape[s + 1:]
    n_mid = shape[s]
    n_left = int(np.prod(left_shape)) if left_shape else 1
    n_rp = int(np.prod(rp_shape)) if rp_shape else 1
    pad_l = _rup(n_left)
    pad_rp = _rup(n_rp)
    offsets = np.concatenate([[0], np.cumsum(shape)]).astype(int)
    w_total = int(offsets[-1])
    return (s, left_dims, rp_dims, left_shape, rp_shape, n_mid, n_left,
            n_rp, pad_l, pad_rp, offsets, w_total)


@functools.lru_cache(maxsize=None)
def _build_kernel(shape: Tuple[int, ...], block: int, interpret: bool,
                  stream: bool = False):
    """Compile a fused evaluator specialized to a grid shape.

    ``stream=True`` builds the two-level variant: the grid gains a
    second (middle-dim) axis, the tensor mega-operand is blocked one
    middle slice per step, and the output accumulates across steps —
    the (B, n_mid*padL) mega-dot transient never exists, extending the
    envelope past 13^5 (17^5/19^5 stream; the one-level kernel's
    VMEM budget tops out near 13^5).
    """
    if stream:
        return _build_stream_kernel(shape, block, interpret)
    (s, left_dims, rp_dims, left_shape, rp_shape, n_mid, n_left, n_rp,
     pad_l, pad_rp, offsets, w_total) = _geometry(shape)
    mid_off = int(offsets[s])
    d = len(shape)
    n_lb = len(left_dims)
    n_rb = len(rp_dims)

    # Broadcast matrix: coordinate d -> its dim's lane block, stacked
    # x3 so one bf16 dot against 3-way-split points reconstructs the
    # exact f32 coordinates.
    sx = np.zeros((d, w_total), dtype=np.float32)
    for dim in range(d):
        sx[dim, offsets[dim]:offsets[dim + 1]] = 1.0
    sx3 = np.vstack([sx] * 3).astype(jnp.bfloat16)      # (3d, W)
    # Per-dim block-sum (W, d) and its broadcast-back (d, W), consumed
    # with 2-/3-way-split data operands respectively.
    sxt2 = np.vstack([sx.T] * 2).astype(jnp.bfloat16)   # (2W, d)

    # Merged Khatri-Rao selection matrix: one 128-aligned column block
    # per group dim (zero pad columns -> zero factor lanes downstream),
    # stacked x2: the rows are split hi/lo in-kernel, and 16 row bits
    # put the factor error at ~2^-17 — the Precision.HIGH tier.
    blocks = []
    for k in range(n_lb):
        e = _selection_matrix(shape, left_dims, left_shape, k, offsets)
        blocks.append(np.pad(e, ((0, 0), (0, pad_l - n_left))))
    for k in range(n_rb):
        e = _selection_matrix(shape, rp_dims, rp_shape, k, offsets)
        blocks.append(np.pad(e, ((0, 0), (0, pad_rp - n_rp))))
    e_cat = np.concatenate(blocks, axis=1)
    e_cat2 = np.vstack([e_cat] * 2).astype(jnp.bfloat16)  # (2W, kE)
    l_off = 0
    r_off = n_lb * pad_l

    tol = np.float32(NODE_COINCIDENCE_TOL)
    ks2, ks3 = _pick_ksplits(interpret)

    def kernel(pts3_ref, nodes_ref, weights_ref, tmega_ref, sx3_ref,
               sxt2_ref, ecat2_ref, out_ref):
        # --- Row build (all dims lane-packed, VPU + tiny exact dots) --
        x_cat = jnp.dot(pts3_ref[:], sx3_ref[:],
                        preferred_element_type=jnp.float32)   # (B, W)
        diff = x_cat - nodes_ref[:]
        # Clamp trick: as |diff| -> 0 the normalized row converges to
        # the one-hot exact-node answer; clamping at tol keeps the
        # division finite and lands within O(tol) of it — far below
        # f32 resolution.  No booleans leave the VPU.
        safe = jnp.where(jnp.abs(diff) < tol, tol, diff)
        w_over = weights_ref[:] / safe                        # (B, W)
        wh, wl = ks2(w_over)
        sums = (jnp.dot(jnp.concatenate([wh, wl], axis=1), sxt2_ref[:],
                        preferred_element_type=jnp.float32))  # (B, d)
        rinv = 1.0 / sums
        r3 = jnp.concatenate(ks3(rinv), axis=1)          # (B, 3d)
        rinv_cat = jnp.dot(r3, sx3_ref[:],
                           preferred_element_type=jnp.float32)
        rows = w_over * rinv_cat                              # (B, W) f32

        # --- Khatri-Rao group factors: one merged selection dot ------
        rh, rl = ks2(rows)
        kr = jnp.dot(jnp.concatenate([rh, rl], axis=1), ecat2_ref[:],
                     preferred_element_type=jnp.float32)      # (B, kE)

        def factor(base, width, count):
            acc = None
            for j in range(count):
                t = kr[:, base + j * width: base + (j + 1) * width]
                acc = t if acc is None else acc * t
            return acc

        w_left = factor(l_off, pad_l, n_lb)                   # (B, padL)
        w_rp = factor(r_off, pad_rp, n_rb)                    # | None

        c = rows[:, mid_off:mid_off + n_mid]                  # (B, n_mid)

        # --- Value-tensor contraction: one mega-dot -------------------
        if w_rp is None:
            t_rows = tmega_ref[:]                    # (n_mid, padL) f32
            y = None
            for i in range(n_mid):
                contrib = c[:, i:i + 1] * t_rows[i][None, :]
                y = contrib if y is None else y + contrib
        else:
            rp_hi, rp_lo = ks2(w_rp)
            a_cat = jnp.concatenate([rp_hi, rp_lo, rp_hi], axis=1)
            z = jnp.dot(a_cat, tmega_ref[:],
                        preferred_element_type=jnp.float32)
            y = None
            for i in range(n_mid):
                contrib = c[:, i:i + 1] * z[:, i * pad_l:(i + 1) * pad_l]
                y = contrib if y is None else y + contrib

        out_ref[:] = jnp.sum(w_left * y, axis=1)

    def run(pts3, nodes_cat, weights_cat, tmega):
        n_padded = pts3.shape[0]
        grid = (n_padded // block,)
        const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((block, 3 * d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const_spec,  # nodes_cat (1, W)
            const_spec,  # weights_cat (1, W)
            const_spec,  # tmega
            const_spec,  # sx3
            const_spec,  # sxt2
            const_spec,  # e_cat2
        ]
        out_spec = pl.BlockSpec((block,), lambda i: (i,),
                                memory_space=pltpu.VMEM)
        kwargs = {}
        if not interpret:
            # Same scoped-VMEM lift as the stream kernel: the 16 MB
            # default rejects shapes whose actual stack allocation
            # lands just above it (11^4 needs 16.09 MB) even though
            # the _pick_plan estimate gate admits them.
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_padded,), jnp.float32),
            interpret=interpret,
            **kwargs,
        )(pts3, nodes_cat, weights_cat, tmega, jnp.asarray(sx3),
          jnp.asarray(sxt2), jnp.asarray(e_cat2))

    return jax.jit(run)


@functools.lru_cache(maxsize=None)
def _build_stream_kernel(shape: Tuple[int, ...], block: int,
                         interpret: bool):
    """Two-level fused evaluator: grid (tiles, n_mid), tmega streamed.

    Step (i, 0) runs the full row build (identical arithmetic to the
    one-level kernel) and stashes the split right-prime factor, the
    left factor, and the middle-dim rows in VMEM scratch; every step
    (i, j) then contracts ONE middle slice of the tensor operand —
    ``z_j = a_cat @ tmega[:, j]`` — and accumulates
    ``c_j * sum(w_left * z_j)`` into the output block, which Pallas
    keeps resident across the inner axis.  The middle row ``c_j`` is
    selected with a streamed one-hot row (no dynamic lane slicing,
    which Mosaic lowers poorly).
    """
    (s, left_dims, rp_dims, left_shape, rp_shape, n_mid, n_left, n_rp,
     pad_l, pad_rp, offsets, w_total) = _geometry(shape)
    mid_off = int(offsets[s])
    d = len(shape)
    n_lb = len(left_dims)
    n_rb = len(rp_dims)
    if n_rb == 0:
        raise ValueError("stream kernel requires a right-prime group")
    pad_m = _rup(n_mid)

    sx = np.zeros((d, w_total), dtype=np.float32)
    for dim in range(d):
        sx[dim, offsets[dim]:offsets[dim + 1]] = 1.0
    sx3 = np.vstack([sx] * 3).astype(jnp.bfloat16)
    sxt2 = np.vstack([sx.T] * 2).astype(jnp.bfloat16)

    blocks = []
    for k in range(n_lb):
        e = _selection_matrix(shape, left_dims, left_shape, k, offsets)
        blocks.append(np.pad(e, ((0, 0), (0, pad_l - n_left))))
    for k in range(n_rb):
        e = _selection_matrix(shape, rp_dims, rp_shape, k, offsets)
        blocks.append(np.pad(e, ((0, 0), (0, pad_rp - n_rp))))
    e_cat = np.concatenate(blocks, axis=1)
    e_cat2 = np.vstack([e_cat] * 2).astype(jnp.bfloat16)
    l_off = 0
    r_off = n_lb * pad_l

    # One-hot middle-row selector, streamed one row per inner step.
    # Kept 3-D (n_mid, 1, pad_m) so the block's last two dims equal
    # the array's (Mosaic rejects a (1, pad_m) block of a 2-D array:
    # sublane block size 1 is neither 8-divisible nor the full dim).
    sel = np.eye(n_mid, pad_m, dtype=np.float32)[:, None, :]

    tol = np.float32(NODE_COINCIDENCE_TOL)
    ks2, ks3 = _pick_ksplits(interpret)

    def kernel(pts3_ref, nodes_ref, weights_ref, tmega_ref, sel_ref,
               sx3_ref, sxt2_ref, ecat2_ref, out_ref,
               acat_ref, wleft_ref, c_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _prologue():
            x_cat = jnp.dot(pts3_ref[:], sx3_ref[:],
                            preferred_element_type=jnp.float32)
            diff = x_cat - nodes_ref[:]
            safe = jnp.where(jnp.abs(diff) < tol, tol, diff)
            w_over = weights_ref[:] / safe
            wh, wl = ks2(w_over)
            sums = jnp.dot(jnp.concatenate([wh, wl], axis=1),
                           sxt2_ref[:],
                           preferred_element_type=jnp.float32)
            rinv = 1.0 / sums
            r3 = jnp.concatenate(ks3(rinv), axis=1)
            rinv_cat = jnp.dot(r3, sx3_ref[:],
                               preferred_element_type=jnp.float32)
            rows = w_over * rinv_cat

            rh, rl = ks2(rows)
            kr = jnp.dot(jnp.concatenate([rh, rl], axis=1),
                         ecat2_ref[:],
                         preferred_element_type=jnp.float32)

            def factor(base, width, count):
                acc = None
                for k in range(count):
                    t = kr[:, base + k * width: base + (k + 1) * width]
                    acc = t if acc is None else acc * t
                return acc

            wleft_ref[:] = factor(l_off, pad_l, n_lb)
            rp_hi, rp_lo = ks2(factor(r_off, pad_rp, n_rb))
            acat_ref[:] = jnp.concatenate([rp_hi, rp_lo, rp_hi], axis=1)
            c_ref[:] = jnp.pad(rows[:, mid_off:mid_off + n_mid],
                               ((0, 0), (0, pad_m - n_mid)))
            out_ref[:] = jnp.zeros((block,), jnp.float32)

        z = jnp.dot(acat_ref[:], tmega_ref[:],
                    preferred_element_type=jnp.float32)   # (B, padL)
        s_j = jnp.sum(wleft_ref[:] * z, axis=1)           # (B,)
        c_j = jnp.sum(c_ref[:] * sel_ref[0], axis=1)      # (B,)
        out_ref[:] = out_ref[:] + c_j * s_j

    def run(pts3, nodes_cat, weights_cat, tmega):
        n_padded = pts3.shape[0]
        grid = (n_padded // block, n_mid)
        const_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((block, 3 * d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            const_spec,  # nodes_cat (1, W)
            const_spec,  # weights_cat (1, W)
            pl.BlockSpec((3 * pad_rp, pad_l), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),  # tmega mid slice
            pl.BlockSpec((1, 1, pad_m), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),  # one-hot selector
            const_spec,  # sx3
            const_spec,  # sxt2
            const_spec,  # e_cat2
        ]
        out_spec = pl.BlockSpec((block,), lambda i, j: (i,),
                                memory_space=pltpu.VMEM)
        kwargs = {}
        if not interpret:
            # The 16 MB scoped-VMEM default rejects block 2048 at 17^5
            # by ~1 MB; the v5e VMEM is far larger, and _pick_plan's
            # 30 MB estimate gate bounds the real footprint.
            kwargs["compiler_params"] = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((n_padded,), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((block, 3 * pad_rp), jnp.bfloat16),
                pltpu.VMEM((block, pad_l), jnp.float32),
                pltpu.VMEM((block, pad_m), jnp.float32),
            ],
            interpret=interpret,
            **kwargs,
        )(pts3, nodes_cat, weights_cat, tmega, jnp.asarray(sel),
          jnp.asarray(sx3), jnp.asarray(sxt2), jnp.asarray(e_cat2))

    return jax.jit(run)


def _vmem_estimate(shape: Tuple[int, ...], block: int) -> int:
    """Rough VMEM bytes for one tile of the kernel.

    A gate, not a spec: calibrated against v5e compile outcomes
    (11^5 at block 2048 -> ~24 MB, compiles; 13^5 at 1024 -> ~26 MB,
    compiles; 11^5 at 4096 -> ~47 MB, Mosaic rejects).
    """
    (_, _, rp_dims, _, _, n_mid, _, _, pad_l, pad_rp, _,
     w_total) = _geometry(shape)
    b = block
    w_pad = _rup(w_total)
    est = 4 * b * w_pad * 4                      # row-build live tiles
    est += b * (len(shape) - 1) * pad_l * 4      # kr blocks upper bound
    est += 3 * _rup(pad_rp) * n_mid * pad_l * 2  # tmega
    if rp_dims:
        est += b * 3 * pad_rp * 2                # a_cat
        est += b * n_mid * pad_l * 4             # z
    est += 2 * b * pad_l * 4                     # y, w_left*y
    return est


def _vmem_estimate_stream(shape: Tuple[int, ...], block: int) -> int:
    """Rough VMEM bytes for one tile of the two-level stream kernel:
    prologue transients + persistent scratch + one tmega slice."""
    (_, _, rp_dims, _, _, n_mid, _, _, pad_l, pad_rp, _,
     w_total) = _geometry(shape)
    if not rp_dims:
        return 1 << 62          # no rp group: stream mode undefined
    b = block
    w_pad = _rup(w_total)
    pad_m = _rup(n_mid)
    est = 4 * b * w_pad * 4                       # row-build live tiles
    est += b * (len(shape) - 1) * max(pad_l, pad_rp) * 4  # kr blocks
    est += b * 3 * pad_rp * 2                     # a_cat scratch
    est += b * pad_l * 4                          # w_left scratch
    est += b * pad_m * 4                          # c scratch
    est += 3 * pad_rp * pad_l * 2                 # tmega slice
    est += b * pad_l * 4                          # z
    return est


_VMEM_CAP = 30 * 1024 * 1024


def _pick_plan(shape: Tuple[int, ...]):
    """(block, stream?) for this grid, or None if neither mode fits.

    The one-level mega-dot kernel wins when it fits (fewer, larger MXU
    dispatches); the stream kernel extends the envelope (17^5/19^5)
    by never materializing the (B, n_mid*padL) transient.
    """
    for b in _BLOCK_CANDIDATES:
        if _vmem_estimate(shape, b) <= _VMEM_CAP:
            return b, False
    for b in _BLOCK_CANDIDATES:
        if _vmem_estimate_stream(shape, b) <= _VMEM_CAP:
            return b, True
    return None


def supports_fused(shape: Sequence[int], dtype) -> bool:
    """Whether the fused kernel covers this configuration."""
    if jnp.dtype(dtype) != jnp.float32:
        return False
    if len(shape) < 3:
        return False
    return _pick_plan(tuple(int(n) for n in shape)) is not None


# Measured fusion margin: the in-kernel row build + absent HBM
# intermediates buy the fused kernel ~20% of slack in padded MXU work
# before the XLA bilinear path overtakes it.  Calibrated against the
# scripts/sweep_stream_kernel.py ladder on v5e: the kernel wins at
# FLOP ratios 1.11 (11^5) and 1.13 (19^5) and loses at 1.3 (15^5),
# 1.77 (17^5), 2.3 (13^5), 2.5 (9^5), 4.1 (33^4, where the measured
# 4.2x slowdown matches the model almost exactly).
_FUSED_FLOP_MARGIN = 1.2


def _padded_flops_per_point(shape: Tuple[int, ...]) -> Tuple[int, int]:
    """(fused, xla) MXU FLOPs per query point for this grid.

    fused: the mega-dot is (B, 3*padRp) @ (3*padRp, n_mid*padL) —
    lane padding to 128 and the bf16x3 row stack are real arithmetic.
    xla: the bilinear form's GEMM is (B, nR) @ (nR, nL) at
    Precision.HIGH (3 bf16 passes), unpadded dims (XLA tiles the MXU
    without materializing 128-lane pads as work at these sizes).
    """
    (s, _, rp_dims, _, _, n_mid, n_left, n_rp, pad_l, pad_rp, _,
     _) = _geometry(shape)
    if rp_dims:
        fused = 2 * 3 * pad_rp * n_mid * pad_l
    else:
        fused = 2 * n_mid * pad_l
    xla = 3 * 2 * n_left * (n_mid * n_rp)
    return fused, xla


def prefer_fused(shape: Sequence[int], dtype) -> bool:
    """Whether the fused kernel is expected to BEAT the XLA f32 path.

    ``supports_fused`` answers "can it run"; this answers "should the
    auto-dispatch route here".  The decision is a static padded-FLOP
    model comparison (see ``_padded_flops_per_point``): the kernel's
    lane-padding economics only pay off when the grid's group products
    land near multiples of 128 — e.g. 11^5 / 19^5 win, while 9^5,
    13^5..17^5, 33^4 all measure faster through XLA.  Forcing
    ``use_fused=True`` at a call site still bypasses this."""
    if not supports_fused(shape, dtype):
        return False
    fused, xla = _padded_flops_per_point(tuple(int(n) for n in shape))
    return fused <= _FUSED_FLOP_MARGIN * xla


@functools.partial(jax.jit, static_argnames=("shape",))
def _tensor_mega(tensor32: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    """Value tensor -> the kernel's stacked bf16 mega operand.

    Layout (rp group present): rows are [T_hi; T_hi; T_lo] over the
    padded right-prime index, columns are n_mid blocks of the padded
    left index — so ``[rp_hi | rp_lo | rp_hi] @ tmega`` performs
    bf16x3 for every middle slice in one MXU dispatch.
    """
    (s, _, rp_dims, _, _, n_mid, n_left, n_rp, pad_l, pad_rp, _,
     _) = _geometry(shape)
    t3 = jnp.transpose(tensor32.reshape(n_left, n_mid, n_rp), (1, 2, 0))
    if not rp_dims:
        # (n_mid, padL) f32 row vectors.
        return jnp.pad(t3[:, 0, :], ((0, 0), (0, pad_l - n_left)))
    t3 = jnp.pad(t3, ((0, 0), (0, pad_rp - n_rp), (0, pad_l - n_left)))
    hi, lo = _split2_bf16(t3)                        # (n_mid, padRp, padL)

    def cols(x):
        return jnp.transpose(x, (1, 0, 2)).reshape(pad_rp, n_mid * pad_l)

    return jnp.concatenate([cols(hi), cols(hi), cols(lo)], axis=0)


@functools.lru_cache(maxsize=None)
def _full_pipeline(shape: Tuple[int, ...], block: int, interpret: bool,
                   stream: bool):
    """One jitted call over a block-padded batch: 3-way point split ->
    kernel.  Keeping split+kernel in a single dispatch matters on hosts
    where each dispatch carries RPC cost (the separate eager split/
    slice steps measured ~3 ms of fixed per-call overhead on the
    tunneled bench host); it also lets XLA fuse the split into the
    kernel's operand stream.  The pad/un-pad stays OUTSIDE the jit so
    the compile cache keys on the padded (block-multiple) size — a
    ragged-batch workload otherwise recompiles the whole Pallas program
    for every distinct raw N."""
    run = _build_kernel(shape, block, interpret, stream)

    def full(padded32, nodes_cat, weights_cat, tmega):
        hi, mid, lo = _split3_bf16(padded32)
        pts3 = jnp.concatenate([hi, mid, lo], axis=1)
        return run(pts3, nodes_cat, weights_cat, tmega)

    return jax.jit(full)


# Small strong-reference LRU of packed kernel operands, mirroring the
# digit-GEMM plane cache (ops/eval_dd.py).  Keyed on the identities of
# the caller's tensor / nodes / weights arrays plus the derivative
# orders (and the diff-matrix identities when orders > 0 — the same
# tensor evaluated under two grids must not reuse the other grid's
# pre-differentiated pack).  The class path and the serving engines
# pass stable device arrays, so steady-state calls skip the astype /
# derivative / transpose / pad repacking — a dozen eager dispatches per
# call otherwise.  Identity keying is only sound for IMMUTABLE arrays:
# a host numpy tensor can be mutated in place without changing
# identity, so only jax.Array operands participate in the cache (numpy
# callers repack every call, the pre-cache behavior).  Strong refs keep
# identity keying sound (no id reuse); bounded slots cap the pinned
# HBM; ``clear_fused_cache()`` releases everything explicitly.
_MEGA_CACHE_SLOTS = 16
_mega_cache: list = []


def clear_fused_cache() -> None:
    """Drop all cached packed operands (releases the pinned tensors)."""
    _mega_cache.clear()


def _cacheable_operands(tensor, nodes, weights, diffs) -> bool:
    """True when every keyed operand is an immutable device array."""
    arrays = [tensor, *nodes, *weights, *diffs]
    return all(isinstance(a, jax.Array) for a in arrays)


def _packed_operands(tensor, nodes, weights, diff_matrices,
                     orders: Tuple[int, ...], shape: Tuple[int, ...]):
    """(tmega, nodes_cat, weights_cat) device operands, LRU-cached."""
    diffs_key = (tuple(diff_matrices) if any(o > 0 for o in orders)
                 else ())
    nodes_key = tuple(nodes)
    weights_key = tuple(weights)
    cacheable = _cacheable_operands(tensor, nodes_key, weights_key,
                                    diffs_key)
    if cacheable:
        for i, entry in enumerate(_mega_cache):
            (e_tensor, e_orders, e_diffs, e_nodes, e_weights,
             packed) = entry
            if (e_tensor is tensor and e_orders == orders
                    and len(e_diffs) == len(diffs_key)
                    and all(a is b for a, b in zip(e_diffs, diffs_key))
                    and all(a is b for a, b in zip(e_nodes, nodes_key))
                    and all(a is b
                            for a, b in zip(e_weights, weights_key))):
                _mega_cache.insert(0, _mega_cache.pop(i))
                return packed

    tensor32 = jnp.asarray(tensor, jnp.float32)
    if any(o > 0 for o in orders):
        diffs32 = tuple(jnp.asarray(m, jnp.float32)
                        for m in diff_matrices)
        tensor32 = apply_derivative_passes(tensor32, diffs32,
                                           tuple(orders))

    w_total = int(sum(shape))
    nodes_cat = np.zeros((1, w_total), dtype=np.float32)
    weights_cat = np.zeros((1, w_total), dtype=np.float32)
    off = 0
    for k, nk in enumerate(shape):
        nodes_cat[0, off:off + nk] = np.asarray(nodes[k],
                                                dtype=np.float32)
        weights_cat[0, off:off + nk] = np.asarray(weights[k],
                                                  dtype=np.float32)
        off += nk
    with jax.enable_x64(False):
        packed = (_tensor_mega(tensor32, shape),
                  jnp.asarray(nodes_cat), jnp.asarray(weights_cat))
    if cacheable:
        _mega_cache.insert(0, (tensor, orders, diffs_key, nodes_key,
                               weights_key, packed))
        del _mega_cache[_MEGA_CACHE_SLOTS:]
    return packed


def fused_eval_batch(tensor, nodes, weights, diff_matrices, points,
                     orders: Tuple[int, ...] = None, *,
                     block: int = None,
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
    if block is None:
        plan = _pick_plan(shape)
        if plan is None:
            raise ValueError(
                f"grid shape {shape} exceeds the fused kernel's VMEM "
                f"budget; use ops.eval.eval_batch"
            )
        block, stream = plan
    else:
        stream = _vmem_estimate(shape, block) > _VMEM_CAP

    full = _full_pipeline(shape, block, bool(interpret), stream)
    tmega, nodes_cat, weights_cat = _packed_operands(
        tensor, nodes, weights, diff_matrices, tuple(orders), shape)

    points = jnp.asarray(points, jnp.float32)
    n = points.shape[0]
    pad = (-n) % block
    # The kernel is pure f32/bf16; with global x64 on, index arithmetic
    # would otherwise trace as i64, which Mosaic rejects.
    with jax.enable_x64(False):
        if pad:
            points = jnp.pad(points, ((0, pad), (0, 0)))
        out = full(points, nodes_cat, weights_cat, tmega)
        return out[:n] if pad else out
