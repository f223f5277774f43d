"""Fused Pallas digit-GEMM kernel (experimental alternative backend).

A Mosaic implementation of the ``ops.eval_dd`` pipeline that keeps the
wide intermediates in VMEM per tile:

1. Normalized per-dim rows arrive as exact (hi, lo) f32 pairs (built in
   XLA f64 — narrow work; exact per-dim sums need true f64).
2. Khatri-Rao group factors expand through exact 0/1 selection dots
   (3-way bf16 component tiers reconstruct f32 exactly) and multiply
   with error-free two_prod transforms (double-f32).
3. The right-group pair quantizes into signed bf16 digit planes
   in-kernel (round-to-even via the 1.5*2^23 bias trick), each plane
   consumed immediately by its grouped MXU dot — every product is an
   integer below 2^24, so f32 accumulation is exact.
4. Scaled per-pair outputs combine with branch-free TwoSum into a
   (hi, comp) f32 pair, the left-group dd factor multiplies in, and
   the kernel emits both f32 words; the caller's only f64 work is the
   final cast-add-reduce over the small left group.

**Measured outcome (v5e, 11^5, 1M points, chained-timing protocol,
with tensor-plane caching):** accuracy matches the XLA digit-GEMM path
exactly (1.67e-11 scale-normalized deviation from true f64) and
throughput is at parity — ~6.8M queries/s (blocks 256 and 512) vs
~7.0M for the XLA path.  The MXU dot floor for the 31 digit-pair GEMMs
(~11 MFLOP/point) dominates both backends, so keeping the pipeline in
VMEM buys nothing further on this shape.  Kept as a correct, tested
alternative backend and as the committed record of the experiment; the
XLA path stays the default (``ChebyshevApproximation.eval_batch_dd``).

Hard-won Mosaic notes encoded here: wrap ``pallas_call`` in
``jax.enable_x64(False)`` (index maps otherwise trace i64);
``(x + 1.5*2^23) - 1.5*2^23`` rounds correctly under Mosaic but is
folded by plain XLA (interpret mode uses ``jnp.round``); in-kernel
``astype`` bf16 splits are faithful under Mosaic but folded by XLA
(interpret mode uses ``lax.reduce_precision``);
``CompilerParams(vmem_limit_bytes=...)`` lifts the 16 MB scoped-VMEM
default when tiles carry large constants.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pychebyshev_tpu.ops.eval import _split_index, apply_derivative_passes
from pychebyshev_tpu.ops.eval_dd import (
    _WR_SCALE_LOG2,
    _digit_planes_tensor,
    _two_prod,
    dd_plan,
    supports_dd,
)

__all__ = ["fused_eval_batch_dd", "supports_fused_dd"]

_LANE = 128
_RND = np.float32(1.5 * 2 ** 23)    # round-to-nearest-even bias trick


def _rup(n: int, m: int = _LANE) -> int:
    return -(-n // m) * m


# --- in-kernel double-f32 primitives (plain f32 ops; Mosaic folds no
# converts, but these use none anyway) ---------------------------------------


def _two_sum(a, b):
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _fast_two_sum(a, b):
    # requires |a| >= |b|
    s = a + b
    return s, b - (s - a)


def _dd_mul(ahi, alo, bhi, blo):
    # _two_prod is shared with the XLA backend (ops.eval_dd) so the
    # error-free-transform arithmetic cannot drift between the two.
    p, e = _two_prod(ahi, bhi)
    e = e + (ahi * blo + alo * bhi)
    return _fast_two_sum(p, e)


def _make_round_int(interpret: bool):
    """Round-to-nearest-even for |x| < 2^22, branch-free.

    The 1.5*2^23 bias trick relies on strict f32 rounding of the add;
    plain XLA (interpret mode) may fold the add/sub pair or keep excess
    precision, leaving non-integer planes that the bf16 GEMM then
    silently rounds — use the real rounding op there.  Mosaic compiles
    the bias trick faithfully and cheaply.
    """
    if interpret:
        return jnp.round
    return lambda x: (x + _RND) - _RND


def _make_ksplit3(interpret: bool):
    """Exact 3-way bf16 split of f32.

    Mosaic compiles the plain astype chain faithfully; under interpret
    mode the kernel runs as ordinary XLA, whose excess-precision pass
    folds astype round-trips (zeroing the residuals), so that path
    rounds through ``lax.reduce_precision`` instead.
    """
    if not interpret:
        def _ksplit3(x):
            hi = x.astype(jnp.bfloat16)
            r = x - hi.astype(jnp.float32)
            mid = r.astype(jnp.bfloat16)
            lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            return hi, mid, lo
    else:
        def _rb(x):
            return jax.lax.reduce_precision(x, exponent_bits=8,
                                            mantissa_bits=7)

        def _ksplit3(x):
            hi = _rb(x)
            r = x - hi
            mid = _rb(r)
            lo = _rb(r - mid)
            return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
                    lo.astype(jnp.bfloat16))
    return _ksplit3


# --- static geometry ---------------------------------------------------------


def _selection(shape, group, group_shape, pos, offsets, pad_to):
    """0/1 (W, pad_to) matrix: packed-lane -> Khatri-Rao column for
    digit ``pos`` of the C-order multi-index over ``group_shape``."""
    w = sum(shape)
    total = int(np.prod(group_shape))
    e = np.zeros((w, pad_to), dtype=np.float32)
    dim = group[pos]
    digits = np.unravel_index(np.arange(total), group_shape)[pos]
    e[offsets[dim] + digits, np.arange(total)] = 1.0
    return e


@functools.lru_cache(maxsize=None)
def _build_kernel(shape: Tuple[int, ...], block: int, interpret: bool):
    plan = dd_plan(shape)
    s = plan["s"]
    b_r, b_t = plan["b_r"], plan["b_t"]
    js_by_i = plan["js_by_i"]
    n_left, n_right = plan["n_left"], plan["n_right"]
    pad_l, pad_r = _rup(n_left), _rup(n_right)
    p_r = len([js for js in js_by_i if js])
    d = len(shape)
    left_dims = tuple(range(s))
    right_dims = tuple(range(s, d))
    left_shape, right_shape = shape[:s], shape[s:]
    offsets = np.concatenate([[0], np.cumsum(shape)]).astype(int)
    w_total = int(offsets[-1])
    wr_scale_inv = np.float32(2.0 ** -_WR_SCALE_LOG2)
    base_r = np.float32(2.0 ** b_r)
    i_fold = 24 // b_r - 1

    # Static operands -----------------------------------------------------
    # selection matrices per group-dim position (W, pad): stacked x3 so
    # dots against 3-way-split data reconstruct f32 exactly.
    def sel3(group, gshape, pos, pad_to):
        e = _selection(shape, group, gshape, pos, offsets, pad_to)
        return np.vstack([e] * 3).astype(jnp.bfloat16)   # (3W, pad)

    left_sels = tuple(sel3(left_dims, left_shape, k, pad_l)
                      for k in range(len(left_dims)))
    right_sels = tuple(sel3(right_dims, right_shape, k, pad_r)
                       for k in range(len(right_dims)))

    _ksplit3 = _make_ksplit3(interpret)
    _round_int = _make_round_int(interpret)

    def kernel(rowh_ref, rowl_ref, *rest):
        sels = rest[:len(left_sels) + len(right_sels)]
        tcats = rest[len(sels):len(sels) + p_r]
        ohi_ref, olo_ref = rest[len(sels) + p_r:]

        # Normalized per-dim rows arrive as lane-packed (B, W) dd pairs
        # (built in XLA f64 — cheap at (N, W) width; exact sums need it).
        rowh = rowh_ref[:]
        rowl = rowl_ref[:]

        def expand(vec_hi, vec_lo, sel):
            # (B, W) pair -> (B, cols(sel)) pair, exactly, via 3-way
            # bf16 component dots against a 0/1 selection matrix
            h1, h2, h3 = _ksplit3(vec_hi)
            hcat = jnp.concatenate([h1, h2, h3], axis=1)
            hi = jnp.dot(hcat, sel, preferred_element_type=jnp.float32)
            l1, l2, l3 = _ksplit3(vec_lo)
            lcat = jnp.concatenate([l1, l2, l3], axis=1)
            lo = jnp.dot(lcat, sel, preferred_element_type=jnp.float32)
            return hi, lo

        # --- Khatri-Rao group factors in dd ---------------------------
        def kr(sel_refs, scale):
            fh = fl = None
            for k, sel_ref in enumerate(sel_refs):
                gh, gl = expand(rowh, rowl, sel_ref[:])
                if k == 0:
                    fh, fl = gh * scale, gl * scale   # exact: 2^-k
                else:
                    fh, fl = _dd_mul(fh, fl, gh, gl)
            return fh, fl

        n_ls = len(left_sels)
        wlh, wll = kr(sels[:n_ls], np.float32(1.0))        # (B, padL)
        wrh, wrl = kr(sels[n_ls:], wr_scale_inv)           # (B, padR)

        # --- digit planes, each consumed by its GEMM immediately ------
        # (one plane live at a time keeps the tile's VMEM footprint to
        #  the wr pair + one bf16 plane + the running combine pair)
        acc = None
        comp = None
        tcat_idx = -1
        r = wrh
        for i in range(p_r):
            scaled = r * base_r
            p = _round_int(scaled)
            r = scaled - p
            if i == i_fold:
                r = r + wrl * np.float32(2.0 ** (b_r * (i_fold + 1)))
            js = js_by_i[i]
            if not js:
                continue
            tcat_idx += 1
            g_all = jnp.dot(p.astype(jnp.bfloat16), tcats[tcat_idx][:],
                            preferred_element_type=jnp.float32)
            for k, j in enumerate(js):
                g = g_all[:, k * pad_l:(k + 1) * pad_l]
                v = b_r * (i + 1) + b_t * (j + 1)
                term = g * np.float32(2.0 ** -v)
                if acc is None:
                    acc = term
                    comp = jnp.zeros_like(term)
                else:
                    acc, err = _two_sum(acc, term)
                    comp = comp + err

        # --- dd left contraction, pair output -------------------------
        yh, yl = _dd_mul(acc, comp, wlh, wll)
        ohi_ref[:] = yh
        olo_ref[:] = yl

    def run(rowh, rowl, tcats):
        n_padded = rowh.shape[0]
        grid = (n_padded // block,)
        const = pl.BlockSpec(memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((block, w_total), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, w_total), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + [const] * (len(left_sels) + len(right_sels) + p_r)
        out_spec = pl.BlockSpec((block, pad_l), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        ohi, olo = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((n_padded, pad_l),
                                            jnp.float32),) * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(rowh, rowl,
          *[jnp.asarray(e) for e in left_sels + right_sels], *tcats)
        return ohi, olo

    return jax.jit(run), plan


def supports_fused_dd(shape: Sequence[int]) -> bool:
    shape = tuple(int(n) for n in shape)
    return len(shape) >= 3 and supports_dd(shape)


# Bounded strong-reference LRU of prepared (128-aligned) tensor planes,
# keyed by the caller's tensor object + orders (see ops.eval_dd).
_PLANE_CACHE_SLOTS = 4
_plane_cache: list = []


def _tensor_planes_padded(tensor, diff_matrices, orders, plan):
    """(t_scale, per-row-plane concatenated bf16 planes with 128-aligned
    column blocks), cached — avoids a per-call tensor readback."""
    # diff_matrices join the key identity-wise (same tensor under two
    # grids with orders>0 must not share pre-differentiated planes).
    # Identity keying requires immutable operands: only jax.Array
    # tensors/diffs participate (in-place numpy mutation keeps the id).
    diffs_key = tuple(diff_matrices) if any(o > 0 for o in orders) else ()
    cacheable = all(isinstance(a, jax.Array)
                    for a in (tensor, *diffs_key))
    if cacheable:
        for i, entry in enumerate(_plane_cache):
            if (entry[0] is tensor and entry[1] == orders
                    and len(entry[2]) == len(diffs_key)
                    and all(a is b for a, b in zip(entry[2], diffs_key))):
                _plane_cache.insert(0, _plane_cache.pop(i))  # true LRU
                return entry[3], entry[4]

    n_left, n_right = plan["n_left"], plan["n_right"]
    b_t = plan["b_t"]
    p_t_used = 1 + max(j for _, j in plan["pairs"])
    pad_l, pad_r = _rup(n_left), _rup(n_right)

    t64 = jnp.asarray(tensor, jnp.float64)
    if any(o > 0 for o in orders):
        t64 = apply_derivative_passes(
            t64, tuple(jnp.asarray(m, jnp.float64)
                       for m in diff_matrices), orders)
    t_host = np.asarray(t64, np.float64).reshape(n_left, n_right)
    t_max = float(np.abs(t_host).max()) or 1.0
    t_scale = 2.0 ** np.ceil(np.log2(t_max))
    planes_host = _digit_planes_tensor(t_host.T / t_scale, b_t, p_t_used)
    tcats = []
    for js in plan["js_by_i"]:
        if not js:
            continue
        blocks = [np.pad(planes_host[j],
                         ((0, pad_r - n_right), (0, pad_l - n_left)))
                  for j in js]
        tcats.append(jnp.asarray(np.concatenate(blocks, axis=1),
                                 jnp.bfloat16))
    tcats = tuple(tcats)

    if cacheable:
        _plane_cache.insert(0, (tensor, orders, diffs_key, t_scale,
                                tcats))
        del _plane_cache[_PLANE_CACHE_SLOTS:]
    return t_scale, tcats


@functools.partial(jax.jit, static_argnames=("d",))
def _rows_pair(pts, nodes, weights, d: int):
    """Normalized barycentric rows for every dim, lane-packed and split
    into an exact (hi, lo) f32 pair — the kernel's per-point stream."""
    from pychebyshev_tpu.ops.eval import barycentric_coefficients
    rows = jnp.concatenate(
        [barycentric_coefficients(pts[:, k], nodes[k], weights[k])
         for k in range(d)], axis=1)                       # (N, W) f64
    hi = rows.astype(jnp.float32)
    lo = (rows - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def fused_eval_batch_dd(tensor, nodes, weights, diff_matrices, points,
                        orders: Tuple[int, ...] = None, *,
                        block: int = 512,
                        interpret: bool = None) -> jax.Array:
    """Near-f64 batched evaluation through the fused Pallas pipeline.

    Same contract as ``ops.eval_dd.eval_batch_dd``; returns f64.
    """
    shape = tuple(int(n) for n in tensor.shape)
    d = len(shape)
    if orders is None:
        orders = (0,) * d
    if not supports_fused_dd(shape):
        raise ValueError(f"grid shape {shape} outside the fused digit-GEMM "
                         f"envelope")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    run, plan = _build_kernel(shape, int(block), bool(interpret))
    n_left = plan["n_left"]
    t_scale, tcats = _tensor_planes_padded(tensor, diff_matrices,
                                           tuple(orders), plan)

    # Normalized per-dim rows in XLA f64 — narrow (N, W) work, and the
    # per-dim sums stay exact.  The kernel takes them as dd pairs.
    pts = jnp.asarray(points, jnp.float64)
    n = pts.shape[0]
    pad_n = (-n) % block
    # edge-mode padding repeats the last real point (always in-domain;
    # no device readback for a pad constant); pad outputs are discarded
    pts = jnp.pad(pts, ((0, pad_n), (0, 0)), mode="edge")
    rowh, rowl = _rows_pair(
        pts, tuple(jnp.asarray(a, jnp.float64) for a in nodes),
        tuple(jnp.asarray(a, jnp.float64) for a in weights), d)

    # The kernel is pure f32/bf16; with global x64 on, index arithmetic
    # would otherwise trace as i64, which Mosaic rejects.
    with jax.enable_x64(False):
        yhi, ylo = run(rowh, rowl, tcats)
    y64 = yhi[:n, :n_left].astype(jnp.float64) \
        + ylo[:n, :n_left].astype(jnp.float64)
    scale = np.float64(2.0 ** _WR_SCALE_LOG2) * t_scale
    return jnp.sum(y64, axis=1) * scale
