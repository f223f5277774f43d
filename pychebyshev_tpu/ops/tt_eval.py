"""Batched tensor-train evaluation — the TT query hot path.

TPU-first recast of the reference TT eval chain
(``tensor_train.py:2217-2265``).  For a batch of N points the running
interface row ``(N, r)`` is contracted dimension by dimension:

    a[n, j, k] = sum_i row[n, i] * core[i, j, k]     (MXU GEMM)
    row[n, k]  = sum_j Q[n, j] * a[n, j, k]          (VPU reduction)

with Q the Chebyshev polynomial values from the statically-unrolled
three-term recurrence.  Contracting the *row* before Q keeps the peak
intermediate at (N, n_k, r_k) — linear in the bond rank — instead of the
(N, r, r) blow-up a Q-first ordering produces at high ranks.  Very large
batches are processed in fixed-size chunks via ``lax.map`` so HBM
footprint stays bounded for any N.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pychebyshev_tpu.ops.chebyshev import chebyshev_polynomial_matrix
from pychebyshev_tpu.ops.eval import _gemm_precision

__all__ = ["tt_eval_batch"]


def _chain(cores, lo, hi, points):
    row = jnp.ones((points.shape[0], 1), dtype=points.dtype)
    for d, core in enumerate(cores):
        scaled = 2.0 * (points[:, d] - lo[d]) / (hi[d] - lo[d]) - 1.0
        q = chebyshev_polynomial_matrix(scaled, core.shape[1])  # (N, n_d)
        r_l, n_d, r_r = core.shape
        a = jnp.matmul(row, core.reshape(r_l, n_d * r_r),
                       precision=_gemm_precision(core.dtype))  # MXU GEMM
        a = a.reshape(-1, n_d, r_r)
        row = jnp.einsum("nj,njk->nk", q, a)                    # VPU
    return row[:, 0]


@jax.jit
def _tt_eval_batch_impl(cores: Tuple[jax.Array, ...], lo: jax.Array,
                        hi: jax.Array, points: jax.Array) -> jax.Array:
    from pychebyshev_tpu.ops.eval import chunked_scalar_map
    per_point = max(c.shape[1] * c.shape[2] for c in cores)
    return chunked_scalar_map(lambda p: _chain(cores, lo, hi, p),
                              points, per_point)


def _chain_grouped(cores_merged, dims_n, group_slices, lo, hi, points):
    """The grouped supercore chain (f32/f64): per-dim Chebyshev rows,
    Khatri-Rao per group, GEMMs contract over the group width.

    Same transform as the dd grouped chain (ops/tt_eval_dd): on
    compression-grade rank chains the per-dim GEMMs' K = n_d (~11)
    wastes most of each MXU tile; merging adjacent cores EXACTLY
    (models.tt_algorithms.tt_merge_cores) makes K the group width.
    """
    qs = []
    for d, n_d in enumerate(dims_n):
        scaled = 2.0 * (points[:, d] - lo[d]) / (hi[d] - lo[d]) - 1.0
        qs.append(chebyshev_polynomial_matrix(scaled, n_d))
    row = jnp.ones((points.shape[0], 1), dtype=points.dtype)
    for g, (a, z) in enumerate(group_slices):
        q = qs[a]
        for k in range(a + 1, z):
            n = q.shape[0]
            q = (q[:, :, None] * qs[k][:, None, :]).reshape(n, -1)
        core = cores_merged[g]
        r_l, w, r_r = core.shape
        out = jnp.matmul(row, core.reshape(r_l, w * r_r),
                         precision=_gemm_precision(core.dtype))
        row = jnp.einsum("nj,njk->nk", q,
                         out.reshape(-1, w, r_r))
    return row[:, 0]


@functools.partial(jax.jit, static_argnums=(1, 2))
def _tt_eval_batch_grouped_impl(cores_merged, dims_n, group_slices,
                                lo, hi, points):
    from pychebyshev_tpu.ops.eval import chunked_scalar_map
    per_point = max(c.shape[1] * c.shape[2] for c in cores_merged)
    return chunked_scalar_map(
        lambda p: _chain_grouped(cores_merged, dims_n, group_slices,
                                 lo, hi, p),
        points, per_point)


# Merged-core device cache, identity-keyed on the original core tuple
# (merged arrays are ephemeral host temporaries).
_merged_cache: list = []
_MERGED_CACHE_SLOTS = 16


def _merged_cores_device(cores, groups, dtype):
    import numpy as np
    key = (tuple(groups), jnp.dtype(dtype).name)
    cacheable = all(isinstance(c, jax.Array) for c in cores)
    if cacheable:
        for i, entry in enumerate(_merged_cache):
            if (entry[1] == key and len(entry[0]) == len(cores)
                    and all(a is b for a, b in zip(entry[0], cores))):
                _merged_cache.insert(0, _merged_cache.pop(i))
                return entry[2]
    from pychebyshev_tpu.models.tt_algorithms import tt_merge_cores
    merged = tuple(jnp.asarray(c, dtype=dtype)
                   for c in tt_merge_cores(
                       [np.asarray(c, dtype=np.float64)
                        for c in cores], list(groups)))
    if cacheable:
        _merged_cache.insert(0, (tuple(cores), key, merged))
        del _merged_cache[_MERGED_CACHE_SLOTS:]
    return merged


def tt_eval_batch(coeff_cores, domain, points, groups=None) -> jax.Array:
    """Evaluate a TT (Chebyshev coefficient cores) at (N, d) points.

    Parameters
    ----------
    coeff_cores : sequence of (r_{k-1}, n_k, r_k) arrays (storage frame).
    domain : (d, 2) array of per-dim [lo, hi] (storage frame).
    points : (N, d) query points (storage frame).
    groups : ``None`` (per-dim chain), ``"auto"`` (grouped supercore
        chain when the dd planner's cost model predicts a win — the
        MXU-utilization structure is the same), or an explicit tuple
        of contiguous group sizes.  Exact transform; results agree to
        dtype-level rounding.
    """
    import numpy as np
    points = jnp.asarray(points)
    if points.dtype not in (jnp.float32, jnp.float64):
        points = points.astype(jnp.float64)
    # Compute in the WIDEST of the two dtypes: f32 query points must
    # not silently downcast f64 cores (the parity default) to the
    # ~1e-6 f32 tier — the f32 fast path requires f32 cores AND points.
    dtype = jnp.promote_types(points.dtype, jnp.asarray(
        coeff_cores[0]).dtype)
    if dtype not in (jnp.float32, jnp.float64):
        dtype = jnp.float64
    points = points.astype(dtype)
    domain = jnp.asarray(domain, dtype=dtype)
    shapes = tuple(tuple(int(x) for x in np.shape(c))
                   for c in coeff_cores)
    if groups == "auto":
        from pychebyshev_tpu.ops.tt_eval_dd import tt_dd_auto_groups
        groups = tt_dd_auto_groups(shapes)
    if groups is not None and tuple(groups) != (1,) * len(shapes):
        groups = tuple(int(g) for g in groups)
        if any(g < 1 for g in groups) or sum(groups) != len(shapes):
            raise ValueError(
                f"groups {groups} must be positive and sum to the "
                f"number of cores ({len(shapes)})")
        merged = _merged_cores_device(tuple(coeff_cores), groups,
                                      dtype)
        dims_n = tuple(s[1] for s in shapes)
        group_slices = []
        i = 0
        for g in groups:
            group_slices.append((i, i + g))
            i += g
        return _tt_eval_batch_grouped_impl(
            merged, dims_n, tuple(group_slices), domain[:, 0],
            domain[:, 1], points)
    cores = tuple(jnp.asarray(c, dtype=dtype) for c in coeff_cores)
    return _tt_eval_batch_impl(cores, domain[:, 0], domain[:, 1], points)
