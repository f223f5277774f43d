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
           "partial_integrate_eval_batch", "tt_integrate_box_batch",
           "tt_partial_integrate_eval_batch"]


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

    def _one(tensor_planes, t_scale, lo, hi, halfs, bflat):
        rows = _t_rows(bflat, lo, hi)
        # Left group stays f64 (narrow): fold its physical measures in.
        left_scale = jnp.prod(halfs[:s])
        w_left = _khatri_rao(rows[:s]) * left_scale
        # Right group: 2^-1 per dim keeps |q| <= 1 for the digit planes.
        right_pairs = [eval_dd._split_f64(r * 0.5) for r in rows[s:]]
        qhi, qlo = eval_dd._khatri_rao_dd(right_pairs)
        r_planes = eval_dd._digit_planes_pair(qhi, qlo, b_r, p_r)
        acc, comp = eval_dd.dd_gemm_ladder(r_planes, tensor_planes,
                                           js_by_i, b_r, b_t, n_left)
        right_scale = (t_scale * (2.0 ** n_right_dims)
                       * jnp.prod(halfs[s:]))
        y = (acc.astype(jnp.float64) + comp.astype(jnp.float64)) \
            * right_scale
        return jnp.sum(w_left * y, axis=1)

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

    return run, plan


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
    run, plan = _compiled_integrate_dd(shape, cutoff)
    t_scale, tensor_planes = eval_dd._tensor_planes(
        tensor, (), (0,) * len(shape), plan)
    dom = jnp.asarray(domain, dtype=jnp.float64)
    halfs = (dom[:, 1] - dom[:, 0]) * 0.5
    b = jnp.asarray(bounds, dtype=jnp.float64)
    return run(tensor_planes, jnp.asarray(t_scale, jnp.float64),
               dom[:, 0], dom[:, 1], halfs,
               b.reshape(b.shape[0], 2 * len(shape)))


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
