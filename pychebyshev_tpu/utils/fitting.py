"""Least-squares construction of dense interpolants from scattered data.

Beyond-reference capability: the reference can only construct models
from exact nodal evaluations (``build()`` samples the Chebyshev grid;
``from_values`` ingests a precomputed grid tensor — reference
``barycentric.py`` construction paths).  Production surfaces are often
known only at scattered, possibly noisy sample points (Monte-Carlo
prices, PDE solver output on its own mesh, market quotes), where the
grid is unreachable.

The dense model is *linear* in its nodal-value tensor: with per-dim
barycentric coefficient rows ``r_k(x)`` (the same rows the batched
eval kernel builds — ``ops/eval.py::barycentric_coefficients``),

    f_T(x) = < r_1(x) (x) ... (x) r_d(x) , T >

so fitting T to samples ``(x_j, y_j)`` is ordinary (optionally
Tikhonov-regularized, optionally weighted) linear least squares with
the Khatri-Rao design matrix ``A[j] = kron_k r_k(x_j)``.  This module
solves the normal equations with chunked accumulation (never
materializes A beyond one chunk) — the result is a standard
``ChebyshevApproximation`` that serves through every existing tier.

Sizing: the normal matrix is (G, G) with ``G = prod(n_nodes)``;
accumulation costs ``N * G**2`` flops.  Practical for G up to a few
thousand (e.g. 3-D 15^3 = 3,375).  For higher dimensions, fit a
moderate dense grid and compress (``to_tt``), or fit group-wise and
assemble a slider.

Conditioning note: normal equations square the design's condition
number.  Barycentric rows are bounded and Chebyshev-node bases are
well-conditioned, so with samples spread over the domain and either
``N >> G`` or a small ``l2``, this is benign; for rank-deficient
sampling the ``l2 = 0`` path falls back to a pseudoinverse solve
(``rcond`` exposed).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL
from pychebyshev_tpu.ops.chebyshev import (
    barycentric_weights_np,
    nodes_for_dim_np,
)
# The ONE row-wise Kronecker definition (pure broadcasting — works on
# NumPy inputs unchanged); the fitted tensor's reshape depends on its
# C-order index convention, so fitting must share it with the eval
# kernel rather than keep a second copy.
from pychebyshev_tpu.ops.eval import _khatri_rao

__all__ = ["barycentric_rows_np", "fit_dense_tensor",
           "fit_additive_tensors", "fit_tt_cores"]

# Normal-matrix cap: 4096**2 f64 = 128 MB.
_MAX_GRID_POINTS = 4096
# Target elements per design chunk (chunk_rows * G): ~268 MB f64.
_CHUNK_ELEMS = 1 << 25


def barycentric_rows_np(x: np.ndarray, nodes: np.ndarray,
                        weights: np.ndarray) -> np.ndarray:
    """Host mirror of ``ops.eval.barycentric_coefficients``.

    (N,) coordinates -> (N, n) normalized coefficient rows; exact node
    hits (within ``NODE_COINCIDENCE_TOL``) degrade to one-hot rows.
    """
    x = np.asarray(x, dtype=np.float64)
    diff = x[:, None] - nodes[None, :]
    exact = np.abs(diff) < NODE_COINCIDENCE_TOL
    has_exact = exact.any(axis=1)
    safe = np.where(exact, 1.0, diff)
    w_over_diff = weights[None, :] / safe
    rows = w_over_diff / w_over_diff.sum(axis=1, keepdims=True)
    if has_exact.any():
        hot = np.zeros_like(rows)
        hot[np.arange(x.shape[0]), exact.argmax(axis=1)] = 1.0
        rows = np.where(has_exact[:, None], hot, rows)
    return rows


def fit_dense_tensor(
    points: np.ndarray,
    values: np.ndarray,
    domain: Sequence[Sequence[float]],
    n_nodes: Sequence[int],
    *,
    l2: float = 0.0,
    sample_weight: Optional[np.ndarray] = None,
    rcond: Optional[float] = None,
) -> Tuple[np.ndarray, dict]:
    """Solve the scattered-data least-squares fit for a dense grid.

    Parameters
    ----------
    points : (N, d) sample coordinates, finite, inside ``domain``.
    values : (N,) sample values, finite.
    domain : d pairs (lo, hi).
    n_nodes : d positive ints (explicit; no auto-N).
    l2 : Tikhonov penalty ``l2 * ||T||^2`` on the nodal values.
        Required (> 0) when N < prod(n_nodes).
    sample_weight : optional (N,) non-negative per-sample weights
        (weighted SSE ``sum w_j (f(x_j) - y_j)^2``).
    rcond : cutoff for the pseudoinverse solve used when ``l2 == 0``
        (forwarded to ``np.linalg.lstsq``).

    Returns
    -------
    (tensor, diagnostics): the (n_1, ..., n_d) nodal-value tensor and a
    dict with ``rms`` (weighted training rms over all samples),
    ``max_abs_residual`` (unweighted |residual| max, excluding
    zero-weight samples), ``n_samples``, ``grid_points``, ``l2``,
    ``rank`` (None for the Cholesky path).
    """
    points = np.asarray(points, dtype=np.float64)
    values = np.asarray(values, dtype=np.float64)
    d = len(n_nodes)
    if len(domain) != d:
        raise ValueError(
            f"len(domain)={len(domain)} must equal len(n_nodes)={d}")
    if points.ndim != 2 or points.shape[1] != d:
        raise ValueError(
            f"points must be (N, {d}), got {points.shape}")
    n_samples = points.shape[0]
    if values.shape != (n_samples,):
        raise ValueError(
            f"values must be ({n_samples},), got {values.shape}")
    if n_samples == 0:
        raise ValueError("need at least one sample")
    if not np.isfinite(points).all():
        raise ValueError("points contain NaN or Inf")
    if not np.isfinite(values).all():
        raise ValueError("values contain NaN or Inf")
    l2 = float(l2)
    if l2 < 0.0 or not np.isfinite(l2):
        raise ValueError(f"l2 must be finite and >= 0, got {l2}")

    counts: List[int] = []
    for k, n in enumerate(n_nodes):
        if not isinstance(n, (int, np.integer)) or n < 1:
            raise ValueError(
                f"n_nodes[{k}] must be a positive int, got {n!r}")
        counts.append(int(n))
    grid_points = int(np.prod(counts))
    if grid_points > _MAX_GRID_POINTS:
        raise ValueError(
            f"prod(n_nodes)={grid_points} exceeds the fit solver cap "
            f"({_MAX_GRID_POINTS}); fit a coarser grid (then refine "
            f"with to_tt/spline composition) — the normal matrix is "
            f"dense (G, G)"
        )
    for k in range(d):
        lo, hi = float(domain[k][0]), float(domain[k][1])
        if not (lo < hi):
            raise ValueError(
                f"domain[{k}]: lo={lo} must be strictly less than "
                f"hi={hi}")
        col = points[:, k]
        if col.min() < lo - 1e-12 or col.max() > hi + 1e-12:
            raise ValueError(
                f"points[:, {k}] outside domain [{lo}, {hi}] — "
                f"fitting does not extrapolate; clip or widen the "
                f"domain"
            )
    if sample_weight is not None:
        sample_weight = np.asarray(sample_weight, dtype=np.float64)
        if sample_weight.shape != (n_samples,):
            raise ValueError(
                f"sample_weight must be ({n_samples},), got "
                f"{sample_weight.shape}")
        if not np.isfinite(sample_weight).all() or (
                sample_weight < 0).any():
            raise ValueError(
                "sample_weight must be finite and non-negative")
        if not (sample_weight > 0).any():
            raise ValueError("sample_weight must not be all zero")
    if l2 == 0.0 and n_samples < grid_points:
        raise ValueError(
            f"underdetermined fit: {n_samples} samples < "
            f"{grid_points} grid values; pass l2 > 0 or add samples"
        )

    nodes = [nodes_for_dim_np(float(domain[k][0]), float(domain[k][1]),
                              counts[k]) for k in range(d)]
    weights = [barycentric_weights_np(nd) for nd in nodes]

    ata = np.zeros((grid_points, grid_points))
    aty = np.zeros(grid_points)
    chunk = max(1024, _CHUNK_ELEMS // max(grid_points, 1))

    def _design_chunk(sl):
        return _khatri_rao([
            barycentric_rows_np(points[sl, k], nodes[k], weights[k])
            for k in range(d)
        ])

    for start in range(0, n_samples, chunk):
        sl = slice(start, min(start + chunk, n_samples))
        rows = _design_chunk(sl)
        y = values[sl]
        if sample_weight is not None:
            sw = np.sqrt(sample_weight[sl])
            rows = rows * sw[:, None]
            y = y * sw
        ata += rows.T @ rows
        aty += rows.T @ y

    rank = None
    if l2 > 0.0:
        solve_mat = ata + l2 * np.eye(grid_points)
        try:
            flat = np.linalg.solve(solve_mat, aty)
        except np.linalg.LinAlgError:
            flat, _, rank, _ = np.linalg.lstsq(solve_mat, aty,
                                               rcond=rcond)
    else:
        flat, _, rank, _ = np.linalg.lstsq(ata, aty, rcond=rcond)

    # Training residuals: one exact chunked re-pass over ALL samples
    # (O(N*G) — negligible next to the O(N*G^2) accumulation, and it
    # avoids the catastrophic cancellation of the t'AtAt - 2t'Aty + yty
    # quadratic form on near-exact fits).  max_abs_residual is the
    # unweighted |residual|, excluding zero-weight samples (they do not
    # participate in the fit); sse/rms are weighted.
    sse = 0.0
    max_abs = 0.0
    for start in range(0, n_samples, chunk):
        sl = slice(start, min(start + chunk, n_samples))
        res = _design_chunk(sl) @ flat - values[sl]
        if sample_weight is not None:
            sw = sample_weight[sl]
            sse += float(np.sum(sw * res * res))
            live = sw > 0
            if live.any():
                max_abs = max(max_abs, float(np.max(np.abs(res[live]))))
        else:
            sse += float(np.sum(res * res))
            max_abs = max(max_abs, float(np.max(np.abs(res))))
    w_total = (float(np.sum(sample_weight)) if sample_weight is not None
               else float(n_samples))
    diagnostics = {
        "rms": float(np.sqrt(sse / w_total)) if w_total > 0 else 0.0,
        "sse": sse,
        "n_samples": n_samples,
        "grid_points": grid_points,
        "l2": l2,
        "rank": None if rank is None else int(rank),
        "max_abs_residual": max_abs,
    }
    return flat.reshape(tuple(counts)), diagnostics


def fit_additive_tensors(
    points: np.ndarray,
    values: np.ndarray,
    domain: Sequence[Sequence[float]],
    n_nodes: Sequence[int],
    groups: Sequence[Sequence[int]],
    *,
    l2: float = 0.0,
    sample_weight: Optional[np.ndarray] = None,
    rcond: Optional[float] = None,
) -> Tuple[List[np.ndarray], float, dict]:
    """Scattered-data least squares for an ADDITIVE (slider) model.

    Fits ``f(x) ~ c0 + sum_i h_i(x_{G_i})`` where each ``h_i`` is a
    dense Chebyshev interpolant over its group's dims — jointly linear
    in (c0, all nodal tensors), so the whole high-dimensional additive
    fit is ONE small solve: the design is ``[1 | A_1 | ... | A_k]``
    with per-group Khatri-Rao blocks, ``P = 1 + sum_i prod(n[G_i])``
    columns (e.g. five 2-dim groups of 7 nodes in 10-D: 246 columns —
    where a dense 10-D fit is impossible).  The additive decomposition
    carries k inherent constant redundancies (a constant moves freely
    between blocks and the intercept); the ``l2 = 0`` path resolves
    them with the pseudoinverse's minimum-norm solution and callers
    re-gauge (``ChebyshevSlider.fit`` pins every slide to the pivot).

    Returns ``(tensors, c0, diagnostics)`` — one (n[g] ...) tensor per
    group, the intercept, and the same diagnostics dict as
    ``fit_dense_tensor`` (plus ``columns``); residual semantics match
    it (weighted rms over all samples; unweighted max excluding
    zero-weight samples).
    """
    points = np.asarray(points, dtype=np.float64)
    values = np.asarray(values, dtype=np.float64)
    d = len(n_nodes)
    if len(domain) != d:
        raise ValueError(
            f"len(domain)={len(domain)} must equal len(n_nodes)={d}")
    if points.ndim != 2 or points.shape[1] != d:
        raise ValueError(f"points must be (N, {d}), got {points.shape}")
    n_samples = points.shape[0]
    if values.shape != (n_samples,):
        raise ValueError(
            f"values must be ({n_samples},), got {values.shape}")
    if n_samples == 0:
        raise ValueError("need at least one sample")
    if not np.isfinite(points).all():
        raise ValueError("points contain NaN or Inf")
    if not np.isfinite(values).all():
        raise ValueError("values contain NaN or Inf")
    l2 = float(l2)
    if l2 < 0.0 or not np.isfinite(l2):
        raise ValueError(f"l2 must be finite and >= 0, got {l2}")
    if any(len(g) == 0 for g in groups):
        raise ValueError("groups must be non-empty")
    flat_dims = sorted(dim for g in groups for dim in g)
    if flat_dims != list(range(d)):
        raise ValueError(
            f"groups must cover dims 0..{d - 1} exactly once, got "
            f"{flat_dims}")

    counts: List[int] = []
    for k, n in enumerate(n_nodes):
        if not isinstance(n, (int, np.integer)) or n < 1:
            raise ValueError(
                f"n_nodes[{k}] must be a positive int, got {n!r}")
        counts.append(int(n))
    group_sizes = [int(np.prod([counts[dim] for dim in g]))
                   for g in groups]
    columns = 1 + int(np.sum(group_sizes))
    if columns > _MAX_GRID_POINTS:
        raise ValueError(
            f"additive design has {columns} columns, exceeding the fit "
            f"solver cap ({_MAX_GRID_POINTS}); reduce group node counts"
        )
    for k in range(d):
        lo, hi = float(domain[k][0]), float(domain[k][1])
        if not (lo < hi):
            raise ValueError(
                f"domain[{k}]: lo={lo} must be strictly less than "
                f"hi={hi}")
        col = points[:, k]
        if col.min() < lo - 1e-12 or col.max() > hi + 1e-12:
            raise ValueError(
                f"points[:, {k}] outside domain [{lo}, {hi}] — "
                f"fitting does not extrapolate; clip or widen the "
                f"domain"
            )
    if sample_weight is not None:
        sample_weight = np.asarray(sample_weight, dtype=np.float64)
        if sample_weight.shape != (n_samples,):
            raise ValueError(
                f"sample_weight must be ({n_samples},), got "
                f"{sample_weight.shape}")
        if not np.isfinite(sample_weight).all() or (
                sample_weight < 0).any():
            raise ValueError(
                "sample_weight must be finite and non-negative")
        if not (sample_weight > 0).any():
            raise ValueError("sample_weight must not be all zero")
    # Effective dof excludes the k constant redundancies.
    dof = columns - len(groups)
    if l2 == 0.0 and n_samples < dof:
        raise ValueError(
            f"underdetermined fit: {n_samples} samples < {dof} "
            f"effective unknowns; pass l2 > 0 or add samples"
        )

    nodes = [nodes_for_dim_np(float(domain[k][0]), float(domain[k][1]),
                              counts[k]) for k in range(d)]
    weights = [barycentric_weights_np(nd) for nd in nodes]

    def _design_chunk(sl):
        n_rows = points[sl].shape[0]
        blocks = [np.ones((n_rows, 1))]
        for g in groups:
            blocks.append(_khatri_rao([
                barycentric_rows_np(points[sl, dim], nodes[dim],
                                    weights[dim]) for dim in g
            ]))
        return np.concatenate(blocks, axis=1)

    ata = np.zeros((columns, columns))
    aty = np.zeros(columns)
    chunk = max(1024, _CHUNK_ELEMS // max(columns, 1))
    for start in range(0, n_samples, chunk):
        sl = slice(start, min(start + chunk, n_samples))
        rows = _design_chunk(sl)
        y = values[sl]
        if sample_weight is not None:
            sw = np.sqrt(sample_weight[sl])
            rows = rows * sw[:, None]
            y = y * sw
        ata += rows.T @ rows
        aty += rows.T @ y

    rank = None
    if l2 > 0.0:
        reg = np.full(columns, l2)
        reg[0] = 0.0  # never penalize the intercept
        solve_mat = ata + np.diag(reg)
        try:
            theta = np.linalg.solve(solve_mat, aty)
        except np.linalg.LinAlgError:
            theta, _, rank, _ = np.linalg.lstsq(solve_mat, aty,
                                                rcond=rcond)
    else:
        theta, _, rank, _ = np.linalg.lstsq(ata, aty, rcond=rcond)

    sse = 0.0
    max_abs = 0.0
    for start in range(0, n_samples, chunk):
        sl = slice(start, min(start + chunk, n_samples))
        res = _design_chunk(sl) @ theta - values[sl]
        if sample_weight is not None:
            sw = sample_weight[sl]
            sse += float(np.sum(sw * res * res))
            live = sw > 0
            if live.any():
                max_abs = max(max_abs, float(np.max(np.abs(res[live]))))
        else:
            sse += float(np.sum(res * res))
            max_abs = max(max_abs, float(np.max(np.abs(res))))
    w_total = (float(np.sum(sample_weight)) if sample_weight is not None
               else float(n_samples))

    c0 = float(theta[0])
    tensors, offset = [], 1
    for g, size in zip(groups, group_sizes):
        shape = tuple(counts[dim] for dim in g)
        tensors.append(theta[offset:offset + size].reshape(shape))
        offset += size
    diagnostics = {
        "rms": float(np.sqrt(sse / w_total)) if w_total > 0 else 0.0,
        "sse": sse,
        "n_samples": n_samples,
        "columns": columns,
        "l2": l2,
        "rank": None if rank is None else int(rank),
        "max_abs_residual": max_abs,
    }
    return tensors, c0, diagnostics


def fit_tt_cores(
    points: np.ndarray,
    values: np.ndarray,
    domain: Sequence[Sequence[float]],
    n_nodes: Sequence[int],
    *,
    max_rank: int = 5,
    l2: float = 1e-10,
    sweeps: int = 10,
    seed: int = 0,
    sample_weight: Optional[np.ndarray] = None,
) -> Tuple[List[np.ndarray], dict]:
    """Scattered-data TT completion via alternating least squares.

    Fits a tensor-train of VALUE cores to arbitrary in-domain samples:
    holding all cores but one fixed, the model is linear in that core
    (design row ``kron(L_j, r_k(x_j), R_j)`` with per-sample left/right
    interface vectors), so each ALS step is a small regularized solve;
    sweeps run left-to-right with QR re-orthogonalization after every
    core (interfaces stay well-conditioned, the standard TT-ALS
    discipline — cf. the grid-based ``tt_algorithms.tt_als``).

    Unlike the dense/additive fits this objective is NONCONVEX (the TT
    manifold): convergence is to a local optimum dependent on the
    random init (``seed``).  Low-rank-representable targets recover
    reliably; check ``diagnostics['rms']`` (per-sweep history in
    ``diagnostics['sweep_rms']``) against the noise level and re-seed
    or raise ``max_rank`` when it plateaus high.

    Returns ``(value_cores, diagnostics)`` — cores are
    ``(r_{k-1}, n_k, r_k)`` value-space tensors (convert with
    ``tt_algorithms.value_core_to_coeff_core``).
    """
    points = np.asarray(points, dtype=np.float64)
    values = np.asarray(values, dtype=np.float64)
    d = len(n_nodes)
    if d < 2:
        raise ValueError("TT fit needs at least 2 dimensions")
    if len(domain) != d:
        raise ValueError(
            f"len(domain)={len(domain)} must equal len(n_nodes)={d}")
    if points.ndim != 2 or points.shape[1] != d:
        raise ValueError(f"points must be (N, {d}), got {points.shape}")
    n_samples = points.shape[0]
    if values.shape != (n_samples,):
        raise ValueError(
            f"values must be ({n_samples},), got {values.shape}")
    if n_samples == 0:
        raise ValueError("need at least one sample")
    if not np.isfinite(points).all():
        raise ValueError("points contain NaN or Inf")
    if not np.isfinite(values).all():
        raise ValueError("values contain NaN or Inf")
    l2 = float(l2)
    if l2 < 0.0 or not np.isfinite(l2):
        raise ValueError(f"l2 must be finite and >= 0, got {l2}")
    if not isinstance(max_rank, (int, np.integer)) or max_rank < 1:
        raise ValueError(f"max_rank must be a positive int, got "
                         f"{max_rank!r}")
    if not isinstance(sweeps, (int, np.integer)) or sweeps < 1:
        raise ValueError(f"sweeps must be a positive int, got {sweeps!r}")
    counts: List[int] = []
    for k, n in enumerate(n_nodes):
        if not isinstance(n, (int, np.integer)) or n < 1:
            raise ValueError(
                f"n_nodes[{k}] must be a positive int, got {n!r}")
        counts.append(int(n))
    for k in range(d):
        lo, hi = float(domain[k][0]), float(domain[k][1])
        if not (lo < hi):
            raise ValueError(
                f"domain[{k}]: lo={lo} must be strictly less than "
                f"hi={hi}")
        col = points[:, k]
        if col.min() < lo - 1e-12 or col.max() > hi + 1e-12:
            raise ValueError(
                f"points[:, {k}] outside domain [{lo}, {hi}] — "
                f"fitting does not extrapolate; clip or widen the "
                f"domain"
            )
    if sample_weight is not None:
        sample_weight = np.asarray(sample_weight, dtype=np.float64)
        if sample_weight.shape != (n_samples,):
            raise ValueError(
                f"sample_weight must be ({n_samples},), got "
                f"{sample_weight.shape}")
        if not np.isfinite(sample_weight).all() or (
                sample_weight < 0).any():
            raise ValueError(
                "sample_weight must be finite and non-negative")
        if not (sample_weight > 0).any():
            raise ValueError("sample_weight must not be all zero")

    # Valid TT ranks: clamp against both boundary products.
    ranks = [1] + [int(max_rank)] * (d - 1) + [1]
    for k in range(1, d):
        ranks[k] = min(ranks[k], ranks[k - 1] * counts[k - 1])
    for k in range(d - 1, 0, -1):
        ranks[k] = min(ranks[k], ranks[k + 1] * counts[k])
    max_core = max(ranks[k] * counts[k] * ranks[k + 1] for k in range(d))
    if l2 == 0.0 and n_samples < max_core:
        raise ValueError(
            f"underdetermined fit: {n_samples} samples < {max_core} "
            f"unknowns in the largest core; pass l2 > 0 or add samples"
        )

    nodes = [nodes_for_dim_np(float(domain[k][0]), float(domain[k][1]),
                              counts[k]) for k in range(d)]
    weights = [barycentric_weights_np(nd) for nd in nodes]
    # Per-dim barycentric rows, computed once: d arrays (N, n_k).
    rows = [barycentric_rows_np(points[:, k], nodes[k], weights[k])
            for k in range(d)]
    sqrt_w = (np.sqrt(sample_weight) if sample_weight is not None
              else None)
    w_total = (float(np.sum(sample_weight)) if sample_weight is not None
               else float(n_samples))

    from pychebyshev_tpu.models.tt_algorithms import orth_right_core

    rng = np.random.default_rng(seed)
    scale = (np.std(values) or 1.0) ** (1.0 / d)
    cores = [rng.standard_normal((ranks[k], counts[k], ranks[k + 1]))
             * scale / np.sqrt(ranks[k] * ranks[k + 1])
             for k in range(d)]
    # Right-orthogonalize 2..d so the first solve sees conditioned
    # interfaces.
    for k in range(d - 1, 0, -1):
        cores[k - 1], cores[k] = orth_right_core(cores[k - 1], cores[k])

    def _interface_step(interface, core, rows_k, side):
        """Advance a per-sample interface through one core."""
        m = np.einsum("ni,aib->nab", rows_k, core)
        if side == "left":
            return np.einsum("na,nab->nb", interface, m)
        return np.einsum("nab,nb->na", m, interface)

    sweep_rms: List[float] = []
    for sweep in range(int(sweeps)):
        # Right interfaces for every position, from the current cores.
        right = [None] * (d + 1)
        right[d] = np.ones((n_samples, 1))
        for k in range(d - 1, 0, -1):
            right[k] = _interface_step(right[k + 1], cores[k], rows[k],
                                       "right")
        left = np.ones((n_samples, 1))
        preds = None
        for k in range(d):
            r0, nk, r1 = ranks[k], counts[k], ranks[k + 1]
            p_cols = r0 * nk * r1
            chunk = max(1024, _CHUNK_ELEMS // max(p_cols, 1))

            def _design_chunk(sl):
                return np.einsum(
                    "na,ni,nb->naib", left[sl], rows[k][sl],
                    right[k + 1][sl]).reshape(-1, p_cols)

            ata = np.zeros((p_cols, p_cols))
            aty = np.zeros(p_cols)
            for start in range(0, n_samples, chunk):
                sl = slice(start, min(start + chunk, n_samples))
                dchunk = _design_chunk(sl)
                y = values[sl]
                if sqrt_w is not None:
                    dchunk = dchunk * sqrt_w[sl, None]
                    y = y * sqrt_w[sl]
                ata += dchunk.T @ dchunk
                aty += dchunk.T @ y
            if l2 > 0.0:
                ata = ata + l2 * np.eye(p_cols)
            try:
                sol = np.linalg.solve(ata, aty)
            except np.linalg.LinAlgError:
                sol, _, _, _ = np.linalg.lstsq(ata, aty, rcond=None)
            cores[k] = sol.reshape(r0, nk, r1)
            if k < d - 1:
                # Left-orthogonalize and advance the left interface.
                rm, nm, r1m = cores[k].shape
                q, rr = np.linalg.qr(cores[k].reshape(rm * nm, r1m))
                cores[k] = q.reshape(rm, nm, q.shape[1])
                cores[k + 1] = np.einsum("ij,jpk->ipk", rr,
                                         cores[k + 1])
                ranks[k + 1] = cores[k].shape[2]
                left = _interface_step(left, cores[k], rows[k], "left")
            else:
                preds = np.empty(n_samples)
                for start in range(0, n_samples, chunk):
                    sl = slice(start, min(start + chunk, n_samples))
                    preds[sl] = _design_chunk(sl) @ sol
        res = preds - values
        if sample_weight is not None:
            sse = float(np.sum(sample_weight * res * res))
        else:
            sse = float(np.sum(res * res))
        sweep_rms.append(float(np.sqrt(sse / w_total)))
        if sweep > 0 and sweep_rms[-2] - sweep_rms[-1] < (
                1e-4 * max(sweep_rms[-2], 1e-300)):
            break

    if sample_weight is not None:
        live = sample_weight > 0
        max_abs = float(np.max(np.abs(res[live]))) if live.any() else 0.0
    else:
        max_abs = float(np.max(np.abs(res)))
    diagnostics = {
        "rms": sweep_rms[-1],
        "sse": sse,
        "sweep_rms": sweep_rms,
        "n_samples": n_samples,
        "tt_ranks": list(ranks),
        "l2": l2,
        "seed": int(seed),
        "max_abs_residual": max_abs,
    }
    return cores, diagnostics
