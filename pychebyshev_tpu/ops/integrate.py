"""Batched axis-aligned-box integration kernels (beyond reference).

The reference integrates ONE box per ``integrate(bounds=...)`` call
(reference ``barycentric.py:2160-2275``, ``tensor_train.py:1505-1702``);
these kernels integrate a BATCH of boxes in a single device dispatch by
swapping the eval kernels' per-point rows for per-box sub-interval
quadrature rows:

    dense:  out[b] = sum_idx T[idx] * prod_d w_d[b, idx_d]
            (w_d = sub-interval Fejer weights scaled by the dim measure)
    TT:     the rank chain of ``ops.tt_eval`` with the Chebyshev
            polynomial rows replaced by Chebyshev moment rows

Both reuse the factorized bilinear / chain machinery of ``ops.eval`` /
``ops.tt_eval`` verbatim — a batch of scenario-bucket integrals
(probabilities, expected exposures) runs at MXU GEMM rates instead of
one host-driven contraction per box.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from pychebyshev_tpu.ops.eval import (
    _contract_batched,
    _gemm_precision,
    apply_derivative_passes,
    barycentric_coefficients,
    chunked_scalar_map,
)
from pychebyshev_tpu.ops.quadrature import (
    chebyshev_moment_matrix,
    sub_interval_weight_matrix,
)

__all__ = ["integrate_box_batch", "integrate_box_batch_dd",
           "integrate_box_batch_models",
           "integrate_box_batch_models_dd",
           "partial_integrate_eval_batch",
           "partial_integrate_eval_batch_dd",
           "tt_integrate_box_batch", "tt_integrate_box_batch_dd",
           "tt_partial_integrate_eval_batch",
           "tt_partial_integrate_eval_batch_dd"]


def _quadrature_coeff_fn(shape, lo, hi):
    """Per-box quadrature rows for a (d-dim) grid — the integrate
    analog of the barycentric ``coeff_fn`` the eval kernels use."""
    d = len(shape)

    def coeff_fn(bf):
        boxes = bf.reshape(bf.shape[0], d, 2)
        return [_quadrature_row(shape[dim], lo[dim], hi[dim],
                                boxes[:, dim, 0], boxes[:, dim, 1])
                for dim in range(d)]

    return coeff_fn


@jax.jit
def _integrate_box_batch_impl(tensor, lo, hi, bounds_flat):
    return _contract_batched(
        tensor, _quadrature_coeff_fn(tensor.shape, lo, hi), bounds_flat)


@jax.jit
def _integrate_box_batch_models_impl(tensors, lo, hi, bounds_flat):
    return _contract_batched(
        list(tensors), _quadrature_coeff_fn(tensors[0].shape, lo, hi),
        bounds_flat)


def integrate_box_batch(tensor, domain, bounds,
                        dtype=jnp.float64) -> jax.Array:
    """Integrals of the dense interpolant over (B, d, 2) boxes -> (B,).

    Parameters
    ----------
    tensor : (n_0, ..., n_{d-1}) value tensor.
    domain : (d, 2) per-dim [lo, hi].
    bounds : (B, d, 2) per-box per-dim (lo, hi), inside the domain
        (callers validate via ``utils.calculus.normalize_bounds_batch``).
    dtype : f64 (default, the parity tier) or f32 — the throughput tier
        for f64-less TPUs: ~1e-5-relative integrals (bf16x3
        GEMM-limited; measured 1.3e-5 on chip), ~94x the software-f64
        tier at these shapes.
    """
    tensor = jnp.asarray(tensor, dtype=dtype)
    dom = jnp.asarray(domain, dtype=dtype)
    b = jnp.asarray(bounds, dtype=dtype)
    return _integrate_box_batch_impl(
        tensor, dom[:, 0], dom[:, 1],
        b.reshape(b.shape[0], 2 * tensor.ndim))


def integrate_box_batch_models(tensors, domain, bounds,
                               dtype=jnp.float64) -> jax.Array:
    """Box integrals of M same-grid value tensors -> (M, B).

    The book analog of :func:`integrate_box_batch`: the per-box
    quadrature rows build ONCE per chunk and contract against every
    tensor (one row build + M GEMMs, like ``eval_batch_models``) — a
    whole book's bucket masses in one dispatch.
    """
    ts = tuple(jnp.asarray(t, dtype=dtype) for t in tensors)
    dom = jnp.asarray(domain, dtype=dtype)
    b = jnp.asarray(bounds, dtype=dtype)
    return _integrate_box_batch_models_impl(
        ts, dom[:, 0], dom[:, 1],
        b.reshape(b.shape[0], 2 * ts[0].ndim))


def _scaled_interval_row(matrix_fn, n, a, c, b_lo, b_hi):
    """(B, n) sub-interval rows for one dim: affine-scale the bounds to
    [-1, 1], build rows with ``matrix_fn``, scale by the dim measure,
    and zero degenerate intervals EXACTLY.

    The degenerate mask compares the RAW bounds: fused scaling can round
    the lo and hi columns an ulp apart, leaving ~1e-20 residue in rows
    of a zero-measure interval that must integrate to an exact 0.  One
    helper for both the dense (Fejer weights, value space) and TT
    (Chebyshev moments, coefficient space) paths so the scaling and the
    mask cannot drift.
    """
    half = (c - a) * 0.5
    t_lo = 2.0 * (b_lo - a) / (c - a) - 1.0
    t_hi = 2.0 * (b_hi - a) / (c - a) - 1.0
    rows = matrix_fn(t_lo, t_hi, n) * half
    return jnp.where((b_lo == b_hi)[:, None], 0.0, rows)


def _quadrature_row(n, a, c, b_lo, b_hi):
    """Dense-path (B, n) sub-interval Fejer weight rows (value space)."""
    return _scaled_interval_row(
        lambda lo_t, hi_t, m: sub_interval_weight_matrix(m, lo_t, hi_t),
        n, a, c, b_lo, b_hi)


@functools.partial(jax.jit, static_argnames=("int_dims", "orders"))
def _partial_integrate_eval_impl(tensor, nodes, weights, diff_matrices,
                                 lo, hi, packed, int_dims, orders):
    d = tensor.ndim
    t = apply_derivative_passes(tensor, diff_matrices, orders)
    n_int = len(int_dims)
    int_pos = {dim: i for i, dim in enumerate(int_dims)}
    eval_pos = {dim: i for i, dim in
                enumerate(k for k in range(d) if k not in int_pos)}

    def coeff_fn(pk):
        boxes = pk[:, :2 * n_int].reshape(pk.shape[0], n_int, 2)
        pts = pk[:, 2 * n_int:]
        rows = []
        for dim in range(d):
            if dim in int_pos:
                i = int_pos[dim]
                rows.append(_quadrature_row(
                    tensor.shape[dim], lo[dim], hi[dim],
                    boxes[:, i, 0], boxes[:, i, 1]))
            else:
                rows.append(barycentric_coefficients(
                    pts[:, eval_pos[dim]], nodes[dim], weights[dim]))
        return rows

    return _contract_batched(t, coeff_fn, packed)


def partial_integrate_eval_batch(tensor, domain, nodes, weights,
                                 diff_matrices, int_dims, bounds, points,
                                 orders=None,
                                 dtype=jnp.float64) -> jax.Array:
    """Conditional expectations in one dispatch: integrate over the
    ``int_dims`` boxes, evaluate at the remaining dims' coordinates.

        out[b] = (d^|orders| / dx^orders)
                 int_{bounds[b]} f(x_S, points[b]) dx_S

    Mixed per-dim rows through the same bilinear contraction as
    ``eval_batch``: quadrature rows for integrated dims, (optionally
    derivative-folded) barycentric rows for the rest — the batched
    analog of ``integrate(dims, bounds).vectorized_eval(point, orders)``
    without materializing B intermediate objects.

    Parameters
    ----------
    tensor : (n_0, ..., n_{d-1}) value tensor.
    domain : (d, 2); nodes/weights/diff_matrices : per-dim grid data.
    int_dims : static sorted tuple of integrated dims.
    bounds : (B, |int_dims|, 2) per-scenario boxes (int_dims order).
    points : (B, d - |int_dims|) remaining-dim coordinates (ascending
        remaining-dim order).
    orders : per-TENSOR-dim derivative orders (zeros on int_dims), or
        None.
    """
    d = tensor.ndim
    int_dims = tuple(int(k) for k in int_dims)
    orders = tuple(int(o) for o in (orders or (0,) * d))
    tensor = jnp.asarray(tensor, dtype=dtype)
    dom = jnp.asarray(domain, dtype=dtype)
    nodes = tuple(jnp.asarray(n, dtype=dtype) for n in nodes)
    weights = tuple(jnp.asarray(w, dtype=dtype) for w in weights)
    diffs = tuple(jnp.asarray(m, dtype=dtype) for m in diff_matrices)
    b = jnp.asarray(bounds, dtype=dtype).reshape(-1, 2 * len(int_dims))
    p = jnp.asarray(points, dtype=dtype).reshape(b.shape[0],
                                                 d - len(int_dims))
    packed = jnp.concatenate([b, p], axis=1)
    return _partial_integrate_eval_impl(
        tensor, nodes, weights, diffs, dom[:, 0], dom[:, 1], packed,
        int_dims, orders)


@functools.lru_cache(maxsize=None)
def _compiled_partial_dd(shape: tuple, int_dims: tuple, cutoff):
    """Jitted mixed quadrature x barycentric digit-GEMM kernel for one
    (grid shape, integrated-dims) plan.

    The dense dd bilinear form (``ops.eval_dd._compiled``) with
    per-dim row builders swapped by role: integrated dims get
    sub-interval Fejer weight rows (f64 — one DCT-III matmul per dim,
    cheap), evaluated dims get barycentric rows; derivative orders fold
    into the cached tensor planes like ``eval_batch_dd``.  The shared
    2^-5 right-group pre-scale stays valid for ANY dim mix: quadrature
    row entries satisfy |w_i| <= 2 < 2.6 (sub-interval moments are
    bounded by the measure <= 2 and the DCT-III's 1/n cancels the
    k-sum), so a <= 3-dim right-group product stays under
    2.6^3 < 2^5 — the same Lebesgue budget the eval plan uses.
    """
    from pychebyshev_tpu.ops import eval_dd
    from pychebyshev_tpu.ops.eval import _khatri_rao

    plan = eval_dd.dd_plan(shape, cutoff)
    s = plan["s"]
    n_left, n_right = plan["n_left"], plan["n_right"]
    b_r, b_t = plan["b_r"], plan["b_t"]
    js_by_i = plan["js_by_i"]
    p_r = 1 + max(i for i, _ in plan["pairs"])
    n_dims = len(shape)
    n_int = len(int_dims)
    int_pos = {dim: i for i, dim in enumerate(int_dims)}
    eval_pos = {dim: i for i, dim in
                enumerate(k for k in range(n_dims) if k not in int_pos)}
    wr_scale = np.float64(2.0 ** eval_dd._WR_SCALE_LOG2)
    chunk = max(512, _DD_CHUNK_ELEMS_TARGET // max(n_right, 1))

    def _rows(packed, lo, hi, nodes, weights):
        boxes = packed[:, :2 * n_int].reshape(-1, n_int, 2)
        pts = packed[:, 2 * n_int:]
        rows = []
        for dim in range(n_dims):
            if dim in int_pos:
                i = int_pos[dim]
                a, c = lo[dim], hi[dim]
                t_lo = 2.0 * (boxes[:, i, 0] - a) / (c - a) - 1.0
                t_hi = 2.0 * (boxes[:, i, 1] - a) / (c - a) - 1.0
                w = sub_interval_weight_matrix(shape[dim], t_lo, t_hi)
                degenerate = boxes[:, i, 0] == boxes[:, i, 1]
                rows.append(jnp.where(degenerate[:, None], 0.0, w))
            else:
                rows.append(barycentric_coefficients(
                    pts[:, eval_pos[dim]], nodes[dim], weights[dim]))
        return rows

    def _one(tensor_planes, t_scale, lo, hi, halfs_masked, nodes,
             weights, packed):
        rows = _rows(packed, lo, hi, nodes, weights)
        # Left group stays f64 (narrow); its integrated dims' physical
        # measures fold in here (evaluated dims contribute 1).
        w_left = _khatri_rao(rows[:s]) * jnp.prod(halfs_masked[:s])
        scaled_first = rows[s] * (1.0 / wr_scale)
        right_pairs = [eval_dd._split_f64(scaled_first)] + \
            [eval_dd._split_f64(r) for r in rows[s + 1:]]
        qhi, qlo = eval_dd._khatri_rao_dd(right_pairs)
        r_planes = eval_dd._digit_planes_pair(qhi, qlo, b_r, p_r)
        acc, comp = eval_dd.dd_gemm_ladder(r_planes, tensor_planes,
                                           js_by_i, b_r, b_t, n_left)
        right_scale = (wr_scale * t_scale
                       * jnp.prod(halfs_masked[s:]))
        y = (acc.astype(jnp.float64) + comp.astype(jnp.float64)) \
            * right_scale
        return jnp.sum(w_left * y, axis=1)

    @jax.jit
    def run(tensor_planes, t_scale, lo, hi, halfs_masked, nodes,
            weights, packed):
        n = packed.shape[0]
        if n <= chunk:
            return _one(tensor_planes, t_scale, lo, hi, halfs_masked,
                        nodes, weights, packed)
        pad = (-n) % chunk
        padded = jnp.pad(packed, ((0, pad), (0, 0)))
        chunks = padded.reshape(-1, chunk, packed.shape[1])
        out = jax.lax.map(
            lambda p: _one(tensor_planes, t_scale, lo, hi, halfs_masked,
                           nodes, weights, p), chunks)
        return out.reshape(-1)[:n]

    return run, plan


def partial_integrate_eval_batch_dd(tensor, domain, nodes, weights,
                                    diff_matrices, int_dims, bounds,
                                    points, orders=None,
                                    cutoff: int = None) -> jax.Array:
    """Near-f64 batched conditional expectations via exact digit GEMMs.

    The dd tier of :func:`partial_integrate_eval_batch` — same
    signature and semantics, ~1e-12-class (scale-normalized) deviation
    from the f64 path at a large multiple of the software-f64 rate:
    mixed per-dim rows (sub-interval Fejer weights on ``int_dims``,
    barycentric rows elsewhere) run through the shared exact digit-GEMM
    ladder against the same cached (optionally derivative-folded)
    tensor planes ``eval_batch_dd`` uses.  This makes the
    bucket-mass / conditional-expectation workflow — the reference's
    production scenario calculus (reference ``barycentric.py:2160-2275``
    one box at a time) — servable at the dd tier instead of dropping to
    software f64 the moment a box appears.  Raises for grids outside
    the digit-plan budget (callers fall back to f64).
    """
    from pychebyshev_tpu.ops import eval_dd

    shape = tuple(int(n) for n in tensor.shape)
    d = len(shape)
    int_dims = tuple(int(k) for k in int_dims)
    orders = tuple(int(o) for o in (orders or (0,) * d))
    if any(orders[k] > 0 for k in int_dims):
        raise ValueError(
            f"derivative orders {orders} nonzero on integrated dims "
            f"{int_dims}")
    if not eval_dd.supports_dd(shape):
        raise ValueError(
            f"grid shape {shape} outside digit-GEMM budget; "
            f"use partial_integrate_eval_batch")
    run, plan = _compiled_partial_dd(shape, int_dims, cutoff)
    t_scale, tensor_planes = eval_dd._tensor_planes(
        tensor, tuple(diff_matrices), orders, plan)
    dom = jnp.asarray(domain, dtype=jnp.float64)
    halfs = (dom[:, 1] - dom[:, 0]) * 0.5
    mask = jnp.asarray([1.0 if k in set(int_dims) else 0.0
                        for k in range(d)], jnp.float64)
    halfs_masked = halfs * mask + (1.0 - mask)
    b = jnp.asarray(bounds, dtype=jnp.float64).reshape(
        -1, 2 * len(int_dims))
    p = jnp.asarray(points, dtype=jnp.float64).reshape(
        b.shape[0], d - len(int_dims))
    packed = jnp.concatenate([b, p], axis=1)
    nodes64 = tuple(jnp.asarray(nodes[k], jnp.float64) for k in range(d))
    weights64 = tuple(jnp.asarray(weights[k], jnp.float64)
                      for k in range(d))
    return run(tensor_planes, jnp.asarray(t_scale, jnp.float64),
               dom[:, 0], dom[:, 1], halfs_masked, nodes64, weights64,
               packed)


def _moment_row(n, a, c, b_lo, b_hi):
    """TT-path (B, n) Chebyshev moment rows (coefficient space)."""
    return _scaled_interval_row(chebyshev_moment_matrix,
                                n, a, c, b_lo, b_hi)


def _tt_chain_rows(cores, row_fns, packed):
    """The tt_eval interface chain with arbitrary per-dim row builders.

    ``row_fns[d](packed)`` -> that dim's (B, n_d) rows (moment rows for
    integrated dims, polynomial rows for evaluated dims).
    """
    row = jnp.ones((packed.shape[0], 1), dtype=packed.dtype)
    for d, core in enumerate(cores):
        q = row_fns[d](packed)
        r_l, n_d, r_r = core.shape
        interface = jnp.matmul(row, core.reshape(r_l, n_d * r_r),
                               precision=_gemm_precision(core.dtype))
        row = jnp.einsum("nj,njk->nk", q, interface.reshape(-1, n_d, r_r))
    return row[:, 0]


# --- near-f64 digit-GEMM tier -----------------------------------------------
# Box integration through the dense dd machinery: the right-group
# Khatri-Rao runs over QUADRATURE rows instead of barycentric rows.
# Exactness bound: sub-interval Fejer weights satisfy |w_i| <= 2
# rigorously (|moments_k| <= measure <= 2, DCT-III entries <= 1, the
# 1/n cancels the k-sum), so a per-dim 2^-1 pre-scale keeps the
# right-group product inside the digit planes' |q| <= 1 contract; the
# 2^{right dims} and the physical measures (c-a)/2 fold back into the
# final f64 scale (powers of two and a scalar multiply — exact).
# Tensor digit planes are shared with eval_batch_dd via the same
# _tensor_planes cache (CLAUDE.md: one home for the dd machinery).

_DD_CHUNK_ELEMS_TARGET = 1 << 21


@functools.lru_cache(maxsize=None)
def _compiled_integrate_dd(shape: tuple, cutoff):
    from pychebyshev_tpu.ops import eval_dd
    from pychebyshev_tpu.ops.eval import _khatri_rao

    plan = eval_dd.dd_plan(shape, cutoff)
    s = plan["s"]
    n_left, n_right = plan["n_left"], plan["n_right"]
    b_r, b_t = plan["b_r"], plan["b_t"]
    js_by_i = plan["js_by_i"]
    p_r = 1 + max(i for i, _ in plan["pairs"])
    n_dims = len(shape)
    n_right_dims = n_dims - s
    chunk = max(512, _DD_CHUNK_ELEMS_TARGET // max(n_right, 1))

    def _t_rows(bflat, lo, hi):
        """Per-dim (N, n_d) t-domain quadrature rows, f64, unscaled by
        the physical measure (folded into w_left / the final scale)."""
        boxes = bflat.reshape(bflat.shape[0], n_dims, 2)
        rows = []
        for dim in range(n_dims):
            a, c = lo[dim], hi[dim]
            t_lo = 2.0 * (boxes[:, dim, 0] - a) / (c - a) - 1.0
            t_hi = 2.0 * (boxes[:, dim, 1] - a) / (c - a) - 1.0
            w = sub_interval_weight_matrix(shape[dim], t_lo, t_hi)
            degenerate = boxes[:, dim, 0] == boxes[:, dim, 1]
            rows.append(jnp.where(degenerate[:, None], 0.0, w))
        return rows

    def _row_planes(bflat, lo, hi, halfs):
        rows = _t_rows(bflat, lo, hi)
        # Left group stays f64 (narrow): fold its physical measures in.
        w_left = _khatri_rao(rows[:s]) * jnp.prod(halfs[:s])
        # Right group: 2^-1 per dim keeps |q| <= 1 for the digit planes.
        right_pairs = [eval_dd._split_f64(r * 0.5) for r in rows[s:]]
        qhi, qlo = eval_dd._khatri_rao_dd(right_pairs)
        return w_left, eval_dd._digit_planes_pair(qhi, qlo, b_r, p_r)

    def _model_value(w_left, r_planes, tensor_planes, t_scale, halfs):
        acc, comp = eval_dd.dd_gemm_ladder(r_planes, tensor_planes,
                                           js_by_i, b_r, b_t, n_left)
        right_scale = (t_scale * (2.0 ** n_right_dims)
                       * jnp.prod(halfs[s:]))
        y = (acc.astype(jnp.float64) + comp.astype(jnp.float64)) \
            * right_scale
        return jnp.sum(w_left * y, axis=1)

    def _one(tensor_planes, t_scale, lo, hi, halfs, bflat):
        w_left, r_planes = _row_planes(bflat, lo, hi, halfs)
        return _model_value(w_left, r_planes, tensor_planes, t_scale,
                            halfs)

    def _one_multi(models_planes, models_scales, lo, hi, halfs, bflat):
        # M models share ONE quadrature row-plane build (the dominant
        # per-box cost); each adds only its exact GEMM ladder — the
        # bucket-mass analog of eval_dd's book primitive.
        w_left, r_planes = _row_planes(bflat, lo, hi, halfs)
        return jnp.stack(
            [_model_value(w_left, r_planes, tp, ts, halfs)
             for tp, ts in zip(models_planes, models_scales)], axis=1)

    @jax.jit
    def run(tensor_planes, t_scale, lo, hi, halfs, bflat):
        n = bflat.shape[0]
        if n <= chunk:
            return _one(tensor_planes, t_scale, lo, hi, halfs, bflat)
        pad = (-n) % chunk
        padded = jnp.pad(bflat, ((0, pad), (0, 0)))
        chunks = padded.reshape(-1, chunk, bflat.shape[1])
        out = jax.lax.map(
            lambda b: _one(tensor_planes, t_scale, lo, hi, halfs, b),
            chunks)
        return out.reshape(-1)[:n]

    @jax.jit
    def run_multi(models_planes, models_scales, lo, hi, halfs, bflat):
        n = bflat.shape[0]
        m = len(models_planes)
        if n <= chunk:
            return _one_multi(models_planes, models_scales, lo, hi,
                              halfs, bflat)
        pad = (-n) % chunk
        padded = jnp.pad(bflat, ((0, pad), (0, 0)))
        chunks = padded.reshape(-1, chunk, bflat.shape[1])
        out = jax.lax.map(
            lambda b: _one_multi(models_planes, models_scales, lo, hi,
                                 halfs, b), chunks)
        return out.reshape(-1, m)[:n]

    return run, run_multi, plan


def integrate_box_batch_dd(tensor, domain, bounds,
                           cutoff: int = None) -> jax.Array:
    """Near-f64 batched box integration via exact integer digit GEMMs.

    The quadrature analog of ``ops.eval_dd.eval_batch_dd``: rows are
    sub-interval Fejer weights built in f64 (cheap — one (B, n) x (n, n)
    DCT-III matmul per dim), the wide right-group Khatri-Rao runs in
    double-f32, and the contraction is the shared exact digit-GEMM
    ladder against the same cached tensor planes eval_batch_dd uses.
    ~1e-12-class (scale-normalized) deviation from the f64 path at a
    large multiple of the software-f64 integration rate.  Raises for
    grids outside the digit-plan budget (callers fall back to f64).
    """
    from pychebyshev_tpu.ops import eval_dd

    shape = tuple(int(n) for n in tensor.shape)
    if not eval_dd.supports_dd(shape):
        raise ValueError(
            f"grid shape {shape} outside digit-GEMM budget; "
            f"use integrate_box_batch")
    run, _, plan = _compiled_integrate_dd(shape, cutoff)
    t_scale, tensor_planes = eval_dd._tensor_planes(
        tensor, (), (0,) * len(shape), plan)
    dom = jnp.asarray(domain, dtype=jnp.float64)
    halfs = (dom[:, 1] - dom[:, 0]) * 0.5
    b = jnp.asarray(bounds, dtype=jnp.float64)
    return run(tensor_planes, jnp.asarray(t_scale, jnp.float64),
               dom[:, 0], dom[:, 1], halfs,
               b.reshape(b.shape[0], 2 * len(shape)))


def integrate_box_batch_models_dd(tensors, domain, bounds,
                                  cutoff: int = None) -> jax.Array:
    """Near-f64 book bucket masses -> (M, B) via exact digit GEMMs.

    The dd tier of :func:`integrate_box_batch_models`: M same-grid
    value tensors share ONE per-chunk quadrature row-plane build (the
    dominant per-box cost); each model adds only its exact GEMM ladder
    against its own cached tensor planes — a whole portfolio's bucket
    masses at ~1e-12-class deviation in one dispatch.
    """
    from pychebyshev_tpu.ops import eval_dd

    tensors = tuple(tensors)
    if not tensors:
        raise ValueError("tensors must be a non-empty sequence")
    shape = tuple(int(n) for n in tensors[0].shape)
    if any(tuple(int(n) for n in t.shape) != shape for t in tensors):
        raise ValueError("all tensors must share one grid shape")
    if not eval_dd.supports_dd(shape):
        raise ValueError(
            f"grid shape {shape} outside digit-GEMM budget; "
            f"use integrate_box_batch_models")
    _, run_multi, plan = _compiled_integrate_dd(shape, cutoff)
    scales, planes = [], []
    for t in tensors:
        t_scale, tensor_planes = eval_dd._tensor_planes(
            t, (), (0,) * len(shape), plan)
        scales.append(jnp.asarray(t_scale, jnp.float64))
        planes.append(tensor_planes)
    dom = jnp.asarray(domain, dtype=jnp.float64)
    halfs = (dom[:, 1] - dom[:, 0]) * 0.5
    b = jnp.asarray(bounds, dtype=jnp.float64)
    out = run_multi(tuple(planes), tuple(scales), dom[:, 0],
                    dom[:, 1], halfs,
                    b.reshape(b.shape[0], 2 * len(shape)))
    return out.T


def _tt_chain_moments(cores, lo, hi, bounds_flat):
    row_fns = [
        (lambda pk, d=d, core=core: _moment_row(
            core.shape[1], lo[d], hi[d],
            pk[:, 2 * d], pk[:, 2 * d + 1]))
        for d, core in enumerate(cores)
    ]
    return _tt_chain_rows(cores, row_fns, bounds_flat)


@jax.jit
def _tt_integrate_box_batch_impl(cores, lo, hi, bounds_flat):
    per_point = max(c.shape[1] * c.shape[2] for c in cores)
    return chunked_scalar_map(
        lambda bf: _tt_chain_moments(cores, lo, hi, bf),
        bounds_flat, per_point)


def tt_integrate_box_batch(coeff_cores, domain, bounds,
                           dtype=jnp.float64) -> jax.Array:
    """Integrals of a TT over (B, d, 2) boxes -> (B,).

    In coefficient space the box integral is the eval chain with the
    polynomial rows T_k(t) replaced by their sub-interval moments
    (``ops.quadrature.chebyshev_moment_matrix``) — mathematically the
    same bilinear form the Fejer-weight value-core contraction computes,
    but batched over boxes in one dispatch.

    Parameters
    ----------
    coeff_cores : sequence of (r_{k-1}, n_k, r_k) arrays (storage frame).
    domain : (d, 2) per-dim [lo, hi] (storage frame).
    bounds : (B, d, 2) boxes (storage frame).
    dtype : f64 (default) or f32 (throughput tier, ~1e-7 relative).
    """
    cores = tuple(jnp.asarray(c, dtype=dtype) for c in coeff_cores)
    dom = jnp.asarray(domain, dtype=dtype)
    b = jnp.asarray(bounds, dtype=dtype)
    return _tt_integrate_box_batch_impl(
        cores, dom[:, 0], dom[:, 1],
        b.reshape(b.shape[0], 2 * len(cores)))


# --- near-f64 TT digit-GEMM tier --------------------------------------------
# Box integration and conditional expectations through the (grouped)
# TT digit-GEMM chain of ops.tt_eval_dd: the per-dim Chebyshev
# polynomial rows are replaced by sub-interval MOMENT rows built in
# double-f32 from the same T_k/2 recurrence the eval chain uses (the
# antiderivative identity needs only differences of T values, integer
# reciprocals as (hi, lo) constant pairs, and exact power-of-two
# scalings), so the rows never touch software f64.  |m_k| <= measure
# <= 2, so the eval chain's 2^-1 per-dim pre-scale and group back-
# scales apply unchanged, and the prepared core digit planes are THE
# SAME planes the eval chain caches — a serving engine answering evals
# and bucket masses holds one set.  Physical measures fold into one
# exact f64 scalar at the end.


def _dd_moment_pairs(t_lo, t_hi, n: int):
    """Half-scaled sub-interval Chebyshev moment rows ``m_k / 2`` in
    double-f32: (qhi, qlo) of shape (N, n) with
    ``m_k = integral_{t_lo}^{t_hi} T_k(t) dt`` (t-domain), accurate to
    ~2^-45 absolute — inside the digit-plane budget.  The degenerate
    (t_lo == t_hi) mask is the caller's job."""
    from pychebyshev_tpu.ops.eval_dd import (
        _dd_mul,
        _split_f64,
    )
    from pychebyshev_tpu.ops.tt_eval_dd import _dd_add, _dd_recurrence

    lhi, llo = _split_f64(t_lo)
    hhi, hlo = _split_f64(t_hi)
    half = np.float32(0.5)
    # (t_hi - t_lo)/2 and (t_hi + t_lo)/2 as dd pairs.
    dhi, dlo = _dd_add(hhi * half, hlo * half, -(lhi * half),
                       -(llo * half))
    cols_hi = [dhi]
    cols_lo = [dlo]
    if n > 1:
        shi, slo = _dd_add(hhi * half, hlo * half, lhi * half,
                           llo * half)
        m1hi, m1lo = _dd_mul(dhi, dlo, shi, slo)   # (t_hi^2-t_lo^2)/4
        cols_hi.append(m1hi)
        cols_lo.append(m1lo)
    if n > 2:
        # T_k/2 at both endpoints for k <= n, then the antiderivative
        # identity column-wise: m_k/2 = 0.5*(dTh_{k+1}/(k+1)
        # - dTh_{k-1}/(k-1)) with dTh_k = (T_k(hi) - T_k(lo))/2.
        thhi, thlo = _dd_recurrence(hhi, hlo, n + 1)
        tlhi, tllo = _dd_recurrence(lhi, llo, n + 1)
        dthi, dtlo = _dd_add(thhi, thlo, -tlhi, -tllo)
        ks = np.arange(2, n)
        rp = 1.0 / (ks + 1.0)
        rm = 1.0 / (ks - 1.0)
        rphi = rp.astype(np.float32)
        rplo = (rp - rphi).astype(np.float32)
        rmhi = rm.astype(np.float32)
        rmlo = (rm - rmhi).astype(np.float32)
        phi, plo = _dd_mul(dthi[:, ks + 1], dtlo[:, ks + 1],
                           jnp.asarray(rphi)[None, :],
                           jnp.asarray(rplo)[None, :])
        mhi, mlo = _dd_mul(dthi[:, ks - 1], dtlo[:, ks - 1],
                           jnp.asarray(rmhi)[None, :],
                           jnp.asarray(rmlo)[None, :])
        khi, klo = _dd_add(phi, plo, -mhi, -mlo)
        cols_hi.append(khi * half)                 # exact halving
        cols_lo.append(klo * half)
    qhi = jnp.concatenate(
        [c[:, None] if c.ndim == 1 else c for c in cols_hi], axis=1)
    qlo = jnp.concatenate(
        [c[:, None] if c.ndim == 1 else c for c in cols_lo], axis=1)
    return qhi, qlo


def _resolve_tt_dd_groups(shapes, groups, cutoff):
    """Shared groups resolution for the TT dd integration kernels —
    mirrors ``ops.tt_eval_dd.tt_eval_batch_dd`` exactly (auto planner,
    per-dim for None, validation + merged-budget check)."""
    from pychebyshev_tpu.ops.tt_eval_dd import (
        _merged_shapes,
        tt_dd_auto_groups,
        tt_dd_plan,
    )

    plan = tt_dd_plan(shapes, cutoff)
    if not plan["ok"]:
        raise ValueError(
            f"TT core shapes {shapes} outside the digit-GEMM budget; "
            f"use the f64 path")
    if groups == "auto":
        groups = tt_dd_auto_groups(shapes, plan["cutoff"])
    if groups is None:
        groups = (1,) * len(shapes)
    groups = tuple(int(g) for g in groups)
    if any(g < 1 for g in groups) or sum(groups) != len(shapes):
        raise ValueError(
            f"groups {groups} must be positive and sum to the "
            f"number of cores ({len(shapes)})")
    gplan = tt_dd_plan(_merged_shapes(shapes, groups), plan["cutoff"])
    if not gplan["ok"]:
        raise ValueError(
            f"grouped shapes outside the digit-GEMM budget; loosen "
            f"groups={groups}")
    return groups, gplan


def _tt_dd_planes(coeff_cores, groups, gplan):
    """Prepared core digit planes — the SAME caches the eval chain
    uses (``ops.tt_eval_dd._core_planes`` / ``_grouped_core_planes``),
    so engines serving evals and integrals share one working set."""
    from pychebyshev_tpu.ops import tt_eval_dd as ttdd

    cores = tuple(coeff_cores)
    if groups == (1,) * len(cores):
        return ttdd._core_planes(cores, gplan)
    return ttdd._grouped_core_planes(cores, groups, gplan)


@functools.lru_cache(maxsize=None)
def _compiled_tt_integrate_dd(shapes: tuple, groups: tuple, cutoff):
    """Jitted grouped moment-row digit-GEMM chain for one plan."""
    from pychebyshev_tpu.ops import tt_eval_dd as ttdd
    from pychebyshev_tpu.ops.eval_dd import (
        _digit_planes_pair,
        _khatri_rao_dd,
    )

    merged = ttdd._merged_shapes(shapes, groups)
    plan = ttdd.tt_dd_plan(merged, cutoff)
    b = plan["b"]
    js_by_i = plan["js_by_i"]
    p_r = 1 + max(i for i, _ in plan["pairs"])
    dims_n = ttdd.grid_dims(shapes)
    group_slices = []
    i = 0
    for g in groups:
        group_slices.append((i, i + g))
        i += g
    q_backs = tuple(ttdd._Q_SCALE_LOG2 * g for g in groups)

    def _one(core_planes, core_scales, lo, hi, measure, bflat):
        boxes = bflat.reshape(-1, len(dims_n), 2)
        pairs_by_dim = []
        for d, n_d in enumerate(dims_n):
            a, c = lo[d], hi[d]
            t_lo = 2.0 * (boxes[:, d, 0] - a) / (c - a) - 1.0
            t_hi = 2.0 * (boxes[:, d, 1] - a) / (c - a) - 1.0
            qhi, qlo = _dd_moment_pairs(t_lo, t_hi, n_d)
            degenerate = (boxes[:, d, 0] == boxes[:, d, 1])[:, None]
            pairs_by_dim.append((jnp.where(degenerate, 0.0, qhi),
                                 jnp.where(degenerate, 0.0, qlo)))
        r_planes = []
        for a2, z in group_slices:
            ghi, glo = _khatri_rao_dd(pairs_by_dim[a2:z])
            r_planes.append(_digit_planes_pair(ghi, glo, b, p_r))
        out = ttdd._chain_model(merged, r_planes, core_planes,
                                core_scales, js_by_i, b, q_backs)
        return out * measure

    @jax.jit
    def run(core_planes, core_scales, lo, hi, measure, bflat):
        per_point = max(
            (1 + max(len(js) for js in js_by_i)) * r_l * r_r + 2 * w
            for r_l, w, r_r in merged)
        return chunked_scalar_map(
            lambda bf: _one(core_planes, core_scales, lo, hi, measure,
                            bf), bflat, per_point * p_r)

    return run, plan


def tt_integrate_box_batch_dd(coeff_cores, domain, bounds,
                              cutoff: int = None,
                              groups="auto") -> jax.Array:
    """Near-f64 batched TT box integration via exact digit GEMMs.

    The dd tier of :func:`tt_integrate_box_batch` (reference analog of
    the contraction: ``_calculus.py:388-404``, one box per call): the
    (grouped supercore) rank chain of ``ops.tt_eval_dd`` runs with
    double-f32 sub-interval moment rows instead of polynomial rows,
    against the SAME cached core digit planes the eval chain prepares.
    ~1e-12-class (scale-normalized) deviation from the f64 path at a
    large multiple of the software-f64 rate.  ``groups`` as in
    ``tt_eval_batch_dd`` (``"auto"`` default — the calibrated planner).
    """
    shapes = tuple(tuple(int(x) for x in np.shape(c))
                   for c in coeff_cores)
    groups, gplan = _resolve_tt_dd_groups(shapes, groups, cutoff)
    run, gplan = _compiled_tt_integrate_dd(shapes, groups,
                                           gplan["cutoff"])
    scales, planes = _tt_dd_planes(coeff_cores, groups, gplan)
    dom = np.asarray(domain, dtype=np.float64)
    measure = float(np.prod((dom[:, 1] - dom[:, 0]) * 0.5))
    bns = jnp.asarray(bounds, dtype=jnp.float64)
    return run(planes, scales, jnp.asarray(dom[:, 0]),
               jnp.asarray(dom[:, 1]),
               jnp.asarray(measure, jnp.float64),
               bns.reshape(bns.shape[0], 2 * len(shapes)))


@functools.lru_cache(maxsize=None)
def _compiled_tt_partial_dd(shapes: tuple, groups: tuple,
                            int_dims: tuple, cutoff):
    """Jitted mixed moment x polynomial digit-GEMM chain: moment-row
    pairs on ``int_dims`` (per-scenario boxes), eval-chain recurrence
    pairs elsewhere (per-scenario coordinates) — both at the same 2^-1
    per-dim pre-scale, so the group back-scales are unchanged."""
    from pychebyshev_tpu.ops import tt_eval_dd as ttdd
    from pychebyshev_tpu.ops.eval_dd import (
        _digit_planes_pair,
        _khatri_rao_dd,
        _split_f64,
    )

    merged = ttdd._merged_shapes(shapes, groups)
    plan = ttdd.tt_dd_plan(merged, cutoff)
    b = plan["b"]
    js_by_i = plan["js_by_i"]
    p_r = 1 + max(i for i, _ in plan["pairs"])
    dims_n = ttdd.grid_dims(shapes)
    n_int = len(int_dims)
    int_pos = {dim: i for i, dim in enumerate(int_dims)}
    eval_pos = {dim: i for i, dim in
                enumerate(k for k in range(len(dims_n))
                          if k not in int_pos)}
    group_slices = []
    i = 0
    for g in groups:
        group_slices.append((i, i + g))
        i += g
    q_backs = tuple(ttdd._Q_SCALE_LOG2 * g for g in groups)

    def _one(core_planes, core_scales, lo, hi, measure, packed):
        boxes = packed[:, :2 * n_int].reshape(-1, n_int, 2)
        pts = packed[:, 2 * n_int:]
        pairs_by_dim = []
        for d, n_d in enumerate(dims_n):
            a, c = lo[d], hi[d]
            if d in int_pos:
                j = int_pos[d]
                t_lo = 2.0 * (boxes[:, j, 0] - a) / (c - a) - 1.0
                t_hi = 2.0 * (boxes[:, j, 1] - a) / (c - a) - 1.0
                qhi, qlo = _dd_moment_pairs(t_lo, t_hi, n_d)
                degenerate = (boxes[:, j, 0] == boxes[:, j, 1])[:, None]
                pairs_by_dim.append((jnp.where(degenerate, 0.0, qhi),
                                     jnp.where(degenerate, 0.0, qlo)))
            else:
                x = (2.0 * (pts[:, eval_pos[d]] - a) / (c - a) - 1.0)
                xhi, xlo = _split_f64(x)
                pairs_by_dim.append(
                    ttdd._dd_recurrence(xhi, xlo, n_d))
        r_planes = []
        for a2, z in group_slices:
            ghi, glo = _khatri_rao_dd(pairs_by_dim[a2:z])
            r_planes.append(_digit_planes_pair(ghi, glo, b, p_r))
        out = ttdd._chain_model(merged, r_planes, core_planes,
                                core_scales, js_by_i, b, q_backs)
        return out * measure

    @jax.jit
    def run(core_planes, core_scales, lo, hi, measure, packed):
        per_point = max(
            (1 + max(len(js) for js in js_by_i)) * r_l * r_r + 2 * w
            for r_l, w, r_r in merged)
        return chunked_scalar_map(
            lambda pk: _one(core_planes, core_scales, lo, hi, measure,
                            pk), packed, per_point * p_r)

    return run, plan


def tt_partial_integrate_eval_batch_dd(coeff_cores, domain, int_dims,
                                       bounds, points,
                                       cutoff: int = None,
                                       groups="auto") -> jax.Array:
    """Near-f64 TT conditional expectations via exact digit GEMMs.

    The dd tier of :func:`tt_partial_integrate_eval_batch` (storage
    frame, value only): the grouped rank chain runs with double-f32
    moment rows on ``int_dims`` and the eval chain's Chebyshev
    recurrence rows elsewhere, against the shared cached core planes.
    ~1e-12-class deviation from the f64 path.
    """
    shapes = tuple(tuple(int(x) for x in np.shape(c))
                   for c in coeff_cores)
    int_dims = tuple(int(k) for k in int_dims)
    groups, gplan = _resolve_tt_dd_groups(shapes, groups, cutoff)
    run, gplan = _compiled_tt_partial_dd(shapes, groups, int_dims,
                                         gplan["cutoff"])
    scales, planes = _tt_dd_planes(coeff_cores, groups, gplan)
    dom = np.asarray(domain, dtype=np.float64)
    halfs = (dom[:, 1] - dom[:, 0]) * 0.5
    measure = float(np.prod(halfs[list(int_dims)]))
    b = jnp.asarray(bounds, dtype=jnp.float64).reshape(
        -1, 2 * len(int_dims))
    p = jnp.asarray(points, dtype=jnp.float64).reshape(
        b.shape[0], len(shapes) - len(int_dims))
    packed = jnp.concatenate([b, p], axis=1)
    return run(planes, scales, jnp.asarray(dom[:, 0]),
               jnp.asarray(dom[:, 1]),
               jnp.asarray(measure, jnp.float64), packed)


@functools.partial(jax.jit, static_argnames=("int_dims",))
def _tt_partial_integrate_eval_impl(cores, lo, hi, packed, int_dims):
    from pychebyshev_tpu.ops.chebyshev import chebyshev_polynomial_matrix

    d = len(cores)
    n_int = len(int_dims)
    int_pos = {dim: i for i, dim in enumerate(int_dims)}
    eval_pos = {dim: i for i, dim in
                enumerate(k for k in range(d) if k not in int_pos)}

    def row_fn(dim):
        core_n = cores[dim].shape[1]
        if dim in int_pos:
            i = int_pos[dim]

            def fn(pk):
                return _moment_row(core_n, lo[dim], hi[dim],
                                   pk[:, 2 * i], pk[:, 2 * i + 1])
        else:
            j = 2 * n_int + eval_pos[dim]

            def fn(pk):
                scaled = (2.0 * (pk[:, j] - lo[dim])
                          / (hi[dim] - lo[dim]) - 1.0)
                return chebyshev_polynomial_matrix(scaled, core_n)
        return fn

    row_fns = [row_fn(dim) for dim in range(d)]
    per_point = max(c.shape[1] * c.shape[2] for c in cores)
    return chunked_scalar_map(
        lambda pk: _tt_chain_rows(cores, row_fns, pk), packed, per_point)


def tt_partial_integrate_eval_batch(coeff_cores, domain, int_dims,
                                    bounds, points,
                                    dtype=jnp.float64) -> jax.Array:
    """TT conditional expectations in one dispatch (storage frame).

    The rank chain with moment rows on ``int_dims`` (per-scenario boxes)
    and Chebyshev polynomial rows on the remaining dims (per-scenario
    coordinates) — the TT analog of
    :func:`partial_integrate_eval_batch` (value only; TT has no analytic
    per-dim derivative folding here).
    """
    cores = tuple(jnp.asarray(c, dtype=dtype) for c in coeff_cores)
    dom = jnp.asarray(domain, dtype=dtype)
    int_dims = tuple(int(k) for k in int_dims)
    b = jnp.asarray(bounds, dtype=dtype).reshape(-1, 2 * len(int_dims))
    p = jnp.asarray(points, dtype=dtype).reshape(
        b.shape[0], len(cores) - len(int_dims))
    packed = jnp.concatenate([b, p], axis=1)
    return _tt_partial_integrate_eval_impl(
        cores, dom[:, 0], dom[:, 1], packed, int_dims)
