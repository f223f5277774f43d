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

__all__ = ["slider_value_batch", "slider_multi_batch",
           "slider_batch_dd", "slider_multi_batch_dd",
           "slider_dd_multi_runner", "slider_dd_plan"]


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


# --------------------------------------------------------------------------
# Near-f64 slider serving: the digit-GEMM additive sum.
#
# The slider value is ``sum_G s_G(x_G) - (S-1) * pivot`` — a SINGLE dot
# product once every slide's barycentric row block is concatenated:
# out[n] = rows[n, :] @ concat(slide tensors) with rows (N, K),
# K = sum of slide grid sizes (~90 for a 10-D all-singleton slider).
# That one contraction gets the ops.eval_dd treatment: double-f32 row
# blocks, signed bf16 digit planes, exact integer MXU products,
# branch-free TwoSum recombination.  A derivative spec keeps the same
# kernel with only the owning slide active (cross-group partials are
# identically zero, reference slider semantics).
# --------------------------------------------------------------------------

import numpy as np

from pychebyshev_tpu.ops.eval import (
    apply_derivative_passes,
    barycentric_coefficients,
    chunked_scalar_map,
)
from pychebyshev_tpu.ops.eval_dd import (
    _WR_SCALE_LOG2,
    _digit_planes_pair,
    _digit_planes_tensor,
    _khatri_rao_dd,
    _split_f64,
    pair_schedule,
)
from pychebyshev_tpu.ops import eval_dd as _eval_dd


def slider_dd_plan(active_shapes, cutoff: int = None) -> dict:
    """Static digit plan for the concatenated-slide contraction.

    MXU exactness needs ``K * 2^(b_r + b_t) < 2^24`` with K the TOTAL
    concatenated width; the Lebesgue row bound behind ``_WR_SCALE_LOG2``
    covers per-slide groups of <= 3 dims (reference sliders are 1-3).
    """
    if cutoff is None:
        cutoff = _eval_dd._PAIR_CUTOFF
    shapes = [tuple(int(x) for x in s) for s in active_shapes]
    if not shapes or any(len(s) > 3 for s in shapes):
        return {"ok": False}
    k_total = int(sum(np.prod(s) for s in shapes))
    bits_budget = 24 - int(np.ceil(np.log2(k_total)))
    b_t = min(6, bits_budget - 6)
    b_r = min(7, bits_budget - b_t)
    if b_t < 4:
        return {"ok": False}
    pairs, js_by_i = pair_schedule(b_r, b_t, cutoff)
    return {"ok": True, "k_total": k_total, "b_r": b_r, "b_t": b_t,
            "pairs": pairs, "js_by_i": js_by_i, "cutoff": int(cutoff)}


def _dd_row_planes(grids, groups, active, pts, b_r, p_r):
    """Concatenated row digit planes for the active slides.

    Per-slide barycentric rows in f64 (narrow), Khatri-Rao'd in
    double-f32 within each group, concatenated across slides.
    """
    wr_scale = np.float64(2.0 ** _WR_SCALE_LOG2)
    his, los = [], []
    for k, idx in enumerate(active):
        nodes, weights = grids[k]
        group = groups[idx]
        rows = [barycentric_coefficients(pts[:, g], nodes[j],
                                         weights[j])
                for j, g in enumerate(group)]
        pairs = [_split_f64(rows[0] * (1.0 / wr_scale))] + \
            [_split_f64(r) for r in rows[1:]]
        qhi, qlo = _khatri_rao_dd(pairs)
        his.append(qhi)
        los.append(qlo)
    qhi = his[0] if len(active) == 1 else jnp.concatenate(his, axis=1)
    qlo = los[0] if len(active) == 1 else jnp.concatenate(los, axis=1)
    return _digit_planes_pair(qhi, qlo, b_r, p_r)


def _dd_ladder(r_planes, tensor_planes, js_by_i, b_r, b_t):
    """Exact digit GEMM ladder (width-1 columns): the shared
    ``eval_dd.dd_gemm_ladder``."""
    return _eval_dd.dd_gemm_ladder(r_planes, tensor_planes, js_by_i,
                                   b_r, b_t, 1)


@functools.lru_cache(maxsize=None)
def _compiled_slider_dd(shapes: Tuple[Tuple[int, ...], ...],
                        groups: Tuple[Tuple[int, ...], ...],
                        active: Tuple[int, ...], with_pivot: bool,
                        cutoff: int):
    plan = slider_dd_plan([shapes[i] for i in active], cutoff)
    b_r = plan["b_r"]
    js_by_i = plan["js_by_i"]
    p_r = 1 + max(i for i, _ in plan["pairs"])
    wr_scale = np.float64(2.0 ** _WR_SCALE_LOG2)
    n_active = len(active)

    def _one(tensor_planes, t_scale, grids, pivot, pts):
        r_planes = _dd_row_planes(grids, groups, active, pts, b_r, p_r)
        acc, comp = _dd_ladder(r_planes, tensor_planes, js_by_i, b_r,
                               plan["b_t"])
        y = (acc.astype(jnp.float64) + comp.astype(jnp.float64)) \
            * (wr_scale * t_scale)
        out = y[:, 0]
        if with_pivot:
            out = out - (n_active - 1) * pivot
        return out

    @jax.jit
    def run(tensor_planes, t_scale, grids, pivot, points):
        return chunked_scalar_map(
            lambda p: _one(tensor_planes, t_scale, grids, pivot, p),
            points, plan["k_total"] * (p_r + 2))

    return run, plan


# Identity-keyed cache of the concatenated block vector's digit planes
# (sound for immutable jax-array slide tensors only; numpy rebuilt).
# Slider plane vectors are KB-scale (the whole concatenation is ~90
# floats x ~20 planes on the 10-D basket), so the working set can be
# generous: a value + per-dim-delta report on a 10-D slider holds 11
# entries, a multi-engine process a few of those.
_slider_plane_cache: list = []
_SLIDER_CACHE_SLOTS = 64


def _slider_planes(slide_data, blocks, plan):
    """Concatenated tensor digit planes for a block spec, cached.

    ``blocks`` is a tuple of ``(idx, kind, sub_orders)`` per included
    slide, kind in ``'raw'`` (the slide tensor), ``'deriv'`` (its
    D^k-folded tensor), or ``'zero'`` (a same-size zero block — used by
    the multi-spec path so every spec contracts against the SAME
    full-width row planes; zero planes contract to exact zeros on the
    integer MXU).  The ONE plane builder for the single-spec and
    multi-spec slider dd paths.
    """
    tensors = tuple(slide_data[idx][0] for idx, _, _ in blocks)
    key_ok = all(isinstance(t, jax.Array) for t in tensors)
    plan_key = (plan["cutoff"], plan["b_t"], blocks)
    if key_ok:
        for i, entry in enumerate(_slider_plane_cache):
            if (entry[1] == plan_key and len(entry[0]) == len(tensors)
                    and all(a is b for a, b in zip(entry[0], tensors))):
                _slider_plane_cache.insert(
                    0, _slider_plane_cache.pop(i))
                return entry[2], entry[3]

    parts = []
    for idx, kind, sub_orders in blocks:
        tensor, nodes, weights, diffs = slide_data[idx]
        if kind == "zero":
            parts.append(np.zeros(int(np.prod(np.shape(tensor)))))
            continue
        t64 = jnp.asarray(tensor, jnp.float64)
        if kind == "deriv" and any(o > 0 for o in sub_orders):
            t64 = apply_derivative_passes(
                t64, tuple(jnp.asarray(m, jnp.float64) for m in diffs),
                sub_orders)
        parts.append(np.asarray(t64, dtype=np.float64).ravel())
    vec = np.concatenate(parts)
    t_max = float(np.abs(vec).max()) or 1.0
    t_scale = 2.0 ** np.ceil(np.log2(t_max))
    p_t_used = 1 + max(j for _, j in plan["pairs"])
    planes_host = _digit_planes_tensor(vec[:, None] / t_scale,
                                       plan["b_t"], p_t_used)
    tensor_planes = tuple(
        jnp.asarray(np.concatenate([planes_host[j] for j in js],
                                   axis=1), jnp.bfloat16)
        if js else jnp.zeros((plan["k_total"], 0), jnp.bfloat16)
        for js in plan["js_by_i"])

    if key_ok:
        _slider_plane_cache.insert(0, (tensors, plan_key, t_scale,
                                       tensor_planes))
        del _slider_plane_cache[_SLIDER_CACHE_SLOTS:]
    return t_scale, tensor_planes


def slider_batch_dd(slide_data, pivot_value, groups, points,
                    orders=None, cutoff: int = None) -> jax.Array:
    """f64-class batched slider evaluation via one digit-GEMM.

    ``orders`` (per GLOBAL dim) routes like the f64 path: all-zero =
    the additive value sum; orders confined to one group = that slide's
    derivative (no pivot term); cross-group orders = exact zeros.
    Raises ValueError when the plan is outside the digit budget
    (callers fall back to ``slider_value_batch``).
    """
    groups = tuple(tuple(int(d) for d in g) for g in groups)
    n_dims = sum(len(g) for g in groups)
    if orders is None:
        orders = (0,) * n_dims
    orders = tuple(int(o) for o in orders)
    pts = jnp.asarray(points, jnp.float64)

    owning = {gi for gi, g in enumerate(groups)
              if any(orders[d] > 0 for d in g)}
    if len(owning) > 1:
        return jnp.zeros(pts.shape[0], jnp.float64)
    if owning:
        active = (owning.pop(),)
        with_pivot = False
    else:
        active = tuple(range(len(groups)))
        with_pivot = True

    shapes = tuple(tuple(int(x) for x in np.shape(sd[0]))
                   for sd in slide_data)
    plan = slider_dd_plan([shapes[i] for i in active], cutoff)
    if not plan["ok"]:
        raise ValueError(
            f"slider slide shapes {[shapes[i] for i in active]} outside "
            f"the digit-GEMM budget; use slider_value_batch")
    run, plan = _compiled_slider_dd(shapes, groups, active, with_pivot,
                                    plan["cutoff"])
    blocks = []
    for i in active:
        sub = tuple(orders[d] for d in groups[i])
        blocks.append((i, "deriv", sub) if any(o > 0 for o in sub)
                      else (i, "raw", ()))
    t_scale, tensor_planes = _slider_planes(slide_data, tuple(blocks),
                                            plan)
    grids = tuple(
        (tuple(jnp.asarray(a, jnp.float64) for a in slide_data[i][1]),
         tuple(jnp.asarray(a, jnp.float64) for a in slide_data[i][2]))
        for i in active)
    return run(tensor_planes, jnp.asarray(t_scale, jnp.float64), grids,
               jnp.asarray(pivot_value, jnp.float64), pts)


# --------------------------------------------------------------------------
# Near-f64 slider Greek reports: one shared row-plane build, per-spec
# tensor plane vectors.
#
# Every spec's contraction runs against the SAME full-width concatenated
# row block (all slides): the value spec pairs it with the raw slide
# tensors, a derivative spec pairs it with a vector that is zero
# everywhere except the owning slide's D^k-folded block (zero digit
# planes contract to exact zeros on the integer MXU, so sharing the row
# planes costs no accuracy), and a cross-group spec is an exact-zero
# column without touching the device.  M specs therefore cost one
# double-f32 row build plus M GEMM ladders, not M full dispatches.
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _compiled_slider_dd_multi(shapes: Tuple[Tuple[int, ...], ...],
                              groups: Tuple[Tuple[int, ...], ...],
                              spec_kinds: Tuple[str, ...], cutoff: int):
    plan = slider_dd_plan(list(shapes), cutoff)
    b_r, b_t = plan["b_r"], plan["b_t"]
    js_by_i = plan["js_by_i"]
    p_r = 1 + max(i for i, _ in plan["pairs"])
    wr_scale = np.float64(2.0 ** _WR_SCALE_LOG2)
    n_slides = len(shapes)
    active = tuple(range(n_slides))

    def _one(spec_planes, spec_scales, grids, pivot, pts):
        r_planes = _dd_row_planes(grids, groups, active, pts, b_r, p_r)
        cols, g = [], 0
        for kind in spec_kinds:
            if kind == "zero":
                cols.append(jnp.zeros(pts.shape[0], jnp.float64))
                continue
            acc, comp = _dd_ladder(r_planes, spec_planes[g], js_by_i,
                                   b_r, b_t)
            y = (acc.astype(jnp.float64) + comp.astype(jnp.float64)) \
                * (wr_scale * spec_scales[g])
            col = y[:, 0]
            if kind == "value":
                col = col - (n_slides - 1) * pivot
            cols.append(col)
            g += 1
        return jnp.stack(cols, axis=1)

    per_point = plan["k_total"] * (p_r + 2)

    @jax.jit
    def run_multi(spec_planes, spec_scales, grids, pivot, points):
        return eval_ops.chunked_matrix_map(
            lambda p: _one(spec_planes, spec_scales, grids, pivot, p),
            points, per_point, len(spec_kinds))

    return run_multi, plan


def slider_multi_batch_dd(slide_data, pivot_value, groups, specs,
                          points, cutoff: int = None) -> jax.Array:
    """Batch x multi-spec digit-GEMM slider evaluation -> (N, S).

    The near-f64 analog of ``slider_multi_batch``: a whole Greek
    report at ~1e-12 deviation in ONE dispatch.  All specs share one
    double-f32 row-plane build over the full slide concatenation; each
    value/derivative spec adds only its exact GEMM ladder, and
    cross-group mixed partials are exact zeros (reference slider
    semantics, reference slider.py Eq 7.5 derivative routing).
    """
    runner = slider_dd_multi_runner(slide_data, pivot_value, groups,
                                    specs, cutoff)
    return runner(points)


def slider_dd_multi_runner(slide_data, pivot_value, groups, specs,
                           cutoff: int = None, mesh=None,
                           data_axis: str = "dp"):
    """Prepare-once form of :func:`slider_multi_batch_dd`.

    Returns a ``points -> (N, len(specs))`` callable that closes over
    the prepared per-spec plane vectors, so a serving engine holds its
    whole working set for the engine's lifetime instead of re-entering
    the bounded plane cache on every call.  With ``mesh``, plane
    vectors replicate and points shard over ``data_axis``.
    """
    groups = tuple(tuple(int(d) for d in g) for g in groups)
    n_dims = sum(len(g) for g in groups)
    specs = tuple(tuple(int(o) for o in s) for s in specs)
    for s in specs:
        if len(s) != n_dims:
            raise ValueError(f"spec {s} length != num dims {n_dims}")
    if not specs:
        return lambda points: jnp.zeros(
            (np.shape(points)[0], 0), jnp.float64)

    shapes = tuple(tuple(int(x) for x in np.shape(sd[0]))
                   for sd in slide_data)
    plan = slider_dd_plan(list(shapes), cutoff)
    if not plan["ok"]:
        raise ValueError(
            f"slider slide shapes {list(shapes)} outside the "
            f"digit-GEMM budget; use slider_multi_batch")

    all_slides = tuple(range(len(groups)))
    kinds, spec_blocks = [], []
    for s in specs:
        owning = sorted({gi for gi, g in enumerate(groups)
                         if any(s[d] > 0 for d in g)})
        if len(owning) > 1:
            kinds.append("zero")
        elif owning:
            idx = owning[0]
            kinds.append("slide")
            sub = tuple(s[d] for d in groups[idx])
            spec_blocks.append(tuple(
                (i, "deriv", sub) if i == idx else (i, "zero", ())
                for i in all_slides))
        else:
            kinds.append("value")
            spec_blocks.append(tuple((i, "raw", ())
                                     for i in all_slides))

    run_multi, plan = _compiled_slider_dd_multi(shapes, groups,
                                                tuple(kinds),
                                                plan["cutoff"])
    scales, planes = [], []
    for blocks in spec_blocks:
        t_scale, tp = _slider_planes(slide_data, blocks, plan)
        scales.append(jnp.asarray(t_scale, jnp.float64))
        planes.append(tp)
    scales, planes = tuple(scales), tuple(planes)
    grids = tuple(
        (tuple(jnp.asarray(a, jnp.float64) for a in sd[1]),
         tuple(jnp.asarray(a, jnp.float64) for a in sd[2]))
        for sd in slide_data)
    pivot = jnp.asarray(pivot_value, jnp.float64)

    if mesh is not None:
        from pychebyshev_tpu.parallel.sharding import (
            _dp_points,
            _dp_run_matrix,
            _replicated,
        )
        planes, scales, grids, pivot = _replicated(
            (planes, scales, grids, pivot), mesh)
        fn = _dp_run_matrix(run_multi, 4, mesh, data_axis)

        def runner(points):
            pts, n, pad = _dp_points(points, mesh, data_axis)
            out = fn(planes, scales, grids, pivot, pts)
            return out[:n] if pad else out

        return runner

    def runner(points):
        return run_multi(planes, scales, grids, pivot,
                         jnp.asarray(points, jnp.float64))

    return runner
