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

import functools
import warnings
from typing import List, Optional, Sequence, Tuple

import numpy as np

from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL
from pychebyshev_tpu.ops.chebyshev import (
    barycentric_weights_np,
    differentiation_matrix_np,
    nodes_for_dim_np,
)
# The ONE row-wise Kronecker definition (pure broadcasting — works on
# NumPy inputs unchanged); the fitted tensor's reshape depends on its
# C-order index convention, so fitting must share it with the eval
# kernel rather than keep a second copy.
from pychebyshev_tpu.ops.eval import _khatri_rao

__all__ = ["barycentric_rows_np", "fit_dense_tensor",
           "fit_additive_tensors", "fit_tt_cores",
           "normalize_derivative_data"]

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


def normalize_derivative_data(derivative_data, d: int,
                              domain: Sequence[Sequence[float]],
                              n_nodes: Sequence[int]):
    """Validate derivative-observation blocks for the fitters.

    ``derivative_data`` is a sequence of blocks, each
    ``(points, orders, values)`` or ``(points, orders, values, weight)``:
    derivative observations ``d^{|orders|} f / dx^orders (points_j) =
    values_j``, all sharing one ``orders`` multi-index per block (the
    differential-machine-learning shape: AAD pathwise Greeks observed
    alongside prices).  ``weight`` (default 1.0, must be > 0) scales the
    block's squared residuals in the objective — use it to balance the
    derivative scale against the values (a common choice is
    ``var(values) / var(block values)``).

    Returns a list of ``(points (Nb, d) f64, orders tuple, values (Nb,)
    f64, weight float)`` tuples.  Model derivatives of order
    ``>= n_nodes[k]`` are identically zero (degree ``n_k - 1``
    polynomials), so such blocks are rejected rather than silently
    fitting constants against zero rows.
    """
    if derivative_data is None:
        return []
    blocks = []
    for bi, block in enumerate(derivative_data):
        if len(block) not in (3, 4):
            raise ValueError(
                f"derivative_data[{bi}] must be (points, orders, values)"
                f" or (points, orders, values, weight), got "
                f"{len(block)} elements")
        pts = np.asarray(block[0], dtype=np.float64)
        vals = np.asarray(block[2], dtype=np.float64)
        weight = float(block[3]) if len(block) == 4 else 1.0
        orders_raw = block[1]
        if len(orders_raw) != d:
            raise ValueError(
                f"derivative_data[{bi}]: orders must have length {d}, "
                f"got {len(orders_raw)}")
        orders = []
        for k, o in enumerate(orders_raw):
            if not isinstance(o, (int, np.integer)) or o < 0:
                raise ValueError(
                    f"derivative_data[{bi}]: orders[{k}] must be a "
                    f"non-negative int, got {o!r}")
            if int(o) >= int(n_nodes[k]):
                raise ValueError(
                    f"derivative_data[{bi}]: orders[{k}]={int(o)} >= "
                    f"n_nodes[{k}]={int(n_nodes[k])} — a degree-"
                    f"{int(n_nodes[k]) - 1} model's derivative of that "
                    f"order is identically zero; raise n_nodes[{k}] or "
                    f"drop the block")
            orders.append(int(o))
        if pts.ndim != 2 or pts.shape[1] != d:
            raise ValueError(
                f"derivative_data[{bi}]: points must be (N, {d}), got "
                f"{pts.shape}")
        nb = pts.shape[0]
        if nb == 0:
            raise ValueError(
                f"derivative_data[{bi}]: needs at least one sample")
        if vals.shape != (nb,):
            raise ValueError(
                f"derivative_data[{bi}]: values must be ({nb},), got "
                f"{vals.shape}")
        if not np.isfinite(pts).all():
            raise ValueError(
                f"derivative_data[{bi}]: points contain NaN or Inf")
        if not np.isfinite(vals).all():
            raise ValueError(
                f"derivative_data[{bi}]: values contain NaN or Inf")
        if not np.isfinite(weight) or weight <= 0.0:
            raise ValueError(
                f"derivative_data[{bi}]: weight must be finite and "
                f"> 0, got {weight}")
        for k in range(d):
            lo, hi = float(domain[k][0]), float(domain[k][1])
            col = pts[:, k]
            if col.min() < lo - 1e-12 or col.max() > hi + 1e-12:
                raise ValueError(
                    f"derivative_data[{bi}]: points[:, {k}] outside "
                    f"domain [{lo}, {hi}] — fitting does not "
                    f"extrapolate")
        blocks.append((pts, tuple(orders), vals, weight))
    return blocks


class _DimDesign:
    """Per-dim design-row factory with cached D^order folds.

    A derivative observation's design row along dim ``k`` is the plain
    barycentric coefficient row folded through the spectral
    differentiation matrix: ``r_k(x) @ D_k^{o_k}`` (the row form of the
    eval kernel's tensor-side ``apply_derivative_passes`` — same D, same
    one-sided node-hit semantics via the one-hot rows).
    """

    def __init__(self, nodes, weights):
        self.nodes = nodes
        self.weights = weights
        self._pows = {}

    def _dpow(self, k: int, order: int):
        base = self._pows.get((k, 1))
        if base is None:
            base = differentiation_matrix_np(self.nodes[k],
                                             self.weights[k])
            self._pows[(k, 1)] = base
        key = (k, order)
        if key not in self._pows:
            self._pows[key] = np.linalg.matrix_power(base, order)
        return self._pows[key]

    def rows(self, x: np.ndarray, k: int, order: int = 0) -> np.ndarray:
        r = barycentric_rows_np(x, self.nodes[k], self.weights[k])
        if order:
            r = r @ self._dpow(k, order)
        return r


def _capped_block_rows(blocks, counts):
    """Informative-row cap for derivative blocks (determinedness).

    ``D^o`` along dim k annihilates the degree-<o polynomial subspace,
    so a block's design rows span at most ``prod_k (n_k - o_k)``
    directions no matter how many observations it holds; counting its
    raw row count toward the ``l2 == 0`` determinedness check would
    let a rank-deficient system through to a silent min-norm solve.
    ``counts`` may be a sub-selection (the additive fitter passes one
    group's dims with the matching order slice).
    """
    total = 0
    for pts, orders, _, _ in blocks:
        span = int(np.prod([c - o for c, o in zip(counts, orders)]))
        total += min(pts.shape[0], span)
    return total


# The exact tier's digit budget (2 * C * 2^(2b) < 2^24 with b >= 4)
# caps the contracted chunk at 2^15 rows; larger fits just take more
# chunks (review r4 finding: erroring here broke exactly the large-N
# workloads the tier exists for).
_DD_MAX_CHUNK = 1 << 15


def _fit_chunk_size(grid_points, blocks, cap=None):
    """Accumulation chunk: amortize dispatches, cap at the data size.

    Bigger chunks than the host path: each step is one dispatch (and,
    over a relayed chip, one RTT), so amortize aggressively — (C, G)
    f32 intermediates at ~64 MB are comfortable in HBM.  Cap at the
    largest block's row count rounded to a power-of-two bucket: a
    small fit must not pad to the full-amortization chunk (~70x wasted
    GEMM work on a 3k-sample fit otherwise), and the bucketing keeps
    the number of distinct compiled shapes bounded.

    The chunk is deliberately MESH-INDEPENDENT: the sharded runs pad
    each chunk's arrays up to the data-axis multiple (zero rows are
    exact in both tiers) while keeping the same chunk BOUNDARIES, so
    the dd tier's cross-chunk accumulation order — and hence its
    bit-identical-under-sharding guarantee — does not depend on the
    mesh size.
    """
    chunk = int(max(256, (1 << 24) // max(grid_points, 1)))
    max_rows = max(pts.shape[0] for pts, _, _, _ in blocks)
    bucket = 1 << int(np.ceil(np.log2(max(max_rows, 256))))
    chunk = min(chunk, bucket)
    if cap is not None:
        chunk = min(chunk, int(cap))
    return chunk


def _chunk_arrays(pts, vals, sqrt_scale, start, end, alloc, d):
    p_c = np.zeros((alloc, d), dtype=np.float64)
    y_c = np.zeros(alloc, dtype=np.float64)
    s_c = np.zeros(alloc, dtype=np.float64)
    p_c[:end - start] = pts[start:end]
    y_c[:end - start] = vals[start:end]
    s_c[:end - start] = sqrt_scale[start:end]
    return p_c, y_c, s_c


def _chunk_alloc(chunk, mesh, data_axis):
    """Row allocation for one chunk: the chunk itself, padded up to a
    data-axis multiple when sharded (padding rows are zero-weight)."""
    if mesh is None:
        return chunk
    return chunk + (-chunk) % int(mesh.shape[data_axis])


def _layout_for_block(groups=None, owner=None):
    """Static design-layout key for the device steps.

    ``("dense",)`` — one Khatri-Rao block over all dims (the dense
    fit).  ``("additive", groups, owner)`` — the slider design
    ``[1 | A_1 | ... | A_k]``; ``owner`` is ``None`` for value-like
    rows or the owning group's index for differentiated blocks (zero
    intercept + zero non-owner columns, mirroring the host
    ``_block_chunk_fn``).
    """
    if groups is None:
        return ("dense",)
    return ("additive", tuple(tuple(int(x) for x in g) for g in groups),
            owner)


def _build_rows_f32(pts, nodes, weights, dpows, layout, prec):
    import jax.numpy as jnp

    def dim_rows(k):
        from pychebyshev_tpu.ops.eval import barycentric_coefficients
        return jnp.matmul(
            barycentric_coefficients(pts[:, k], nodes[k], weights[k]),
            dpows[k], precision=prec)

    if layout[0] == "dense":
        return _khatri_rao([dim_rows(k) for k in range(pts.shape[1])])
    _, groups, owner = layout
    n_rows = pts.shape[0]
    one = (jnp.ones if owner is None else jnp.zeros)
    cols = [one((n_rows, 1), pts.dtype)]
    for gi, g in enumerate(groups):
        if owner is not None and gi != owner:
            size = int(np.prod([dpows[k].shape[1] for k in g]))
            cols.append(jnp.zeros((n_rows, size), pts.dtype))
        else:
            cols.append(_khatri_rao([dim_rows(k) for k in g]))
    return jnp.concatenate(cols, axis=1)


def _build_rows_dd(pts, nodes, weights, dpows, layout):
    """Double-f32 design rows -> (hi, lo) of (C, P)."""
    import jax
    import jax.numpy as jnp
    from pychebyshev_tpu.ops.eval import barycentric_coefficients
    from pychebyshev_tpu.ops.eval_dd import _khatri_rao_dd, _split_f64

    def dim_pair(k):
        rows64 = jnp.matmul(
            barycentric_coefficients(pts[:, k], nodes[k], weights[k]),
            dpows[k], precision=jax.lax.Precision.HIGHEST)
        return _split_f64(rows64)

    if layout[0] == "dense":
        return _khatri_rao_dd([dim_pair(k)
                               for k in range(pts.shape[1])])
    _, groups, owner = layout
    n_rows = pts.shape[0]
    his = [(jnp.ones if owner is None else jnp.zeros)(
        (n_rows, 1), jnp.float32)]
    los = [jnp.zeros((n_rows, 1), jnp.float32)]
    for gi, g in enumerate(groups):
        if owner is not None and gi != owner:
            size = int(np.prod([dpows[k].shape[1] for k in g]))
            his.append(jnp.zeros((n_rows, size), jnp.float32))
            los.append(jnp.zeros((n_rows, size), jnp.float32))
        else:
            gh, gl = _khatri_rao_dd([dim_pair(k) for k in g])
            his.append(gh)
            los.append(gl)
    return jnp.concatenate(his, axis=1), jnp.concatenate(los, axis=1)


def _device_normal_accumulation(blocks, nodes, weights, dim_design,
                                grid_points, mesh=None,
                                data_axis: str = "dp", layouts=None):
    """Accumulate the normal equations on the accelerator (f32 tier).

    ``blocks`` is a list of ``(points, orders, values, sqrt_row_scale)``
    where ``sqrt_row_scale`` is the per-row sqrt-weight vector (ones
    when unweighted).  Rows are built with the device row kernel
    (``ops.eval.barycentric_coefficients``) in float32 and contracted
    onto ``A^T A`` / ``A^T y`` with bf16x3 MXU GEMMs — the same
    precision tier as the f32 eval path (~1e-4-class normal-matrix
    entries, far below Monte-Carlo noise in the huge-``N`` regime this
    serves).  Each distinct ``orders`` tuple compiles one
    fixed-chunk-shape step, and the last chunk pads with zero-weight
    rows.

    ``mesh``: sample-block data parallelism — each chunk's rows shard
    over ``data_axis``, every device builds and contracts its slice,
    and a ``psum`` assembles the global Gram/rhs (the Gram is a plain
    sum over samples, so dp composes exactly; reference analog being
    beaten: the process-pool build parallelism, ``_parallel.py:36-75``).

    Host-side reference: the exact-f64 accumulation loops in
    :func:`fit_dense_tensor`; this is its throughput tier, not a
    replacement (TPU-first recast of a construction path the reference
    package does not have — cf. reference ``barycentric.py`` grid-only
    construction).
    """
    import jax.numpy as jnp

    d = len(nodes)
    nodes_f32 = tuple(jnp.asarray(nd, dtype=jnp.float32)
                      for nd in nodes)
    weights_f32 = tuple(jnp.asarray(w, dtype=jnp.float32)
                        for w in weights)
    chunk = _fit_chunk_size(grid_points, blocks)
    alloc = _chunk_alloc(chunk, mesh, data_axis)
    if layouts is None:
        layouts = [("dense",)] * len(blocks)

    ata = jnp.zeros((grid_points, grid_points), dtype=jnp.float32)
    aty = jnp.zeros(grid_points, dtype=jnp.float32)
    for (pts, orders, vals, sqrt_scale), layout in zip(blocks, layouts):
        step = _get_device_step(mesh, data_axis, layout)
        # Always-fold dpow (identity at order 0) keeps ONE jitted
        # program per shape signature — grid constants travel as
        # arguments, so JAX's jit cache hits across fit() calls.
        dpows = tuple(
            jnp.asarray(
                np.eye(nodes[k].shape[0]) if orders[k] == 0
                else dim_design._dpow(k, orders[k]),
                dtype=jnp.float32)
            for k in range(d)
        )
        n = pts.shape[0]
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            p_c, y_c, s_c = _chunk_arrays(pts, vals, sqrt_scale,
                                          start, end, alloc, d)
            ata, aty = step(ata, aty,
                            jnp.asarray(p_c, jnp.float32),
                            jnp.asarray(y_c, jnp.float32),
                            jnp.asarray(s_c, jnp.float32),
                            nodes_f32, weights_f32, dpows)
    return (np.asarray(ata, dtype=np.float64),
            np.asarray(aty, dtype=np.float64))


@functools.lru_cache(maxsize=None)
def _get_device_step(mesh=None, data_axis: str = "dp",
                     layout=("dense",)):
    """Jitted f32 accumulation step, optionally shard_mapped over dp.

    Signature: ``(ata, aty, pts (C, d), y (C,), sw (C,), nodes tuple,
    weights tuple, dpows tuple) -> (ata, aty)``.  One compiled program
    per shape signature.  With a mesh, rows shard over ``data_axis``
    and the per-device partial Gram/rhs ``psum`` into the replicated
    accumulators.  ``layout`` selects the design row build
    (:func:`_layout_for_block`).
    """
    import jax
    import jax.numpy as jnp

    from pychebyshev_tpu.ops.eval import _gemm_precision

    prec = _gemm_precision(jnp.float32)

    def step(ata, aty, pts, y, sw, nodes, weights, dpows):
        rows = _build_rows_f32(pts, nodes, weights, dpows, layout,
                               prec) * sw[:, None]
        d_ata = jnp.matmul(rows.T, rows, precision=prec)
        d_aty = jnp.matmul(rows.T, y * sw, precision=prec)
        if mesh is not None:
            d_ata = jax.lax.psum(d_ata, data_axis)
            d_aty = jax.lax.psum(d_aty, data_axis)
        return ata + d_ata, aty + d_aty

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1))
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(data_axis, None), P(data_axis),
                  P(data_axis), P(), P(), P()),
        out_specs=(P(), P()),
    ), donate_argnums=(0, 1))


# --------------------------------------------------------------------------
# Exact (f64-class) device accumulation: the digit-GEMM fit tier.
#
# The f32 tier rounds every A^T A partial at 2^-24 — fine under
# Monte-Carlo noise, ~1e-4-class for exact-recovery fits.  This tier
# applies the repo's Ozaki digit decomposition (ops/eval_dd.py) to the
# Gram accumulation itself: design rows are built in double-f32
# (f64-split per-dim rows, dd Khatri-Rao — the eval_dd row machinery),
# quantized into signed integer digit planes, and every plane-pair
# GEMM P_i^T P_j accumulates integers exactly on the MXU
# (``C * 2^(2b+1) < 2^24`` enforced through the digit width).  The
# per-scale integer matrices recombine with TwoSum ladders into
# double-f32 accumulators, so the assembled normal equations carry
# ~2^-45-class relative error — f64-class — at MXU rates.
#
# Sharding: per-scale plane-GEMM outputs are integers whose GLOBAL sum
# respects the same 2^24 budget as the unsharded chunk, so the psum is
# EXACT and the mesh path is bit-identical to the single-device one.
# --------------------------------------------------------------------------


def _dd_fit_plan(chunk: int, row_bound: float):
    """Digit widths for the exact Gram accumulation of one block.

    ``b``: plane bits such that a symmetrized pair GEMM over the
    global chunk stays exact (``2 * C * 2^(2b) < 2^24``).  ``s_log2``:
    power-of-two row pre-scale covering ``row_bound`` — a rigorous
    bound on the block's design-row entries INCLUDING derivative
    folds: the Khatri-Rao Lebesgue growth per dim times each folded
    ``|D^o|`` column sum times the largest sqrt-weight (review r4
    finding: the old Lebesgue-only scale silently broke the digit
    contract for derivative blocks).  ``p``/``cutoff``: plane count /
    pair cutoff sized so quantization sits ~48 bits below the
    pre-scale unit.
    """
    bits = 23 - int(np.ceil(np.log2(max(chunk, 2))))
    b = bits // 2
    if b < 4:
        return {"ok": False}
    s_log2 = max(0, int(np.ceil(np.log2(max(row_bound, 1.0)))))
    # Dropped-pair residual ~ C * 2^-cutoff is the binding error term;
    # 58 + s lands the assembled Gram ~1e-13-class relative (measured;
    # 48 + s measured 4e-11 on the 3-D test problem).
    cutoff = 58 + s_log2
    p = min(int(np.ceil(cutoff / b)), 24)
    return {"ok": True, "b": b, "p": p, "cutoff": cutoff,
            "s_log2": s_log2}


def _block_row_bound(orders, dim_design, counts, max_sw, layout):
    """Rigorous sup bound on one block's design-row entries.

    Per dim: the barycentric row is bounded by the Lebesgue-style
    factor ~2.8 (the eval_dd bound); a derivative fold multiplies by
    ``max_j sum_i |D^o_{ij}|`` (|y_j| = |sum_i r_i D_ij| <=
    max|r| * colsum_j).  Khatri-Rao multiplies the per-dim bounds; for
    the additive layout each COLUMN belongs to one group (or the
    intercept, bounded by 1), so the max over groups bounds every
    entry.
    """
    d = len(counts)
    per_dim = np.empty(d)
    for k in range(d):
        leb = 2.0 ** 1.5
        if orders[k] > 0:
            dmat = dim_design._dpow(k, orders[k])
            leb *= float(np.abs(dmat).sum(axis=0).max())
        per_dim[k] = leb
    if layout[0] == "dense":
        bound = float(np.prod(per_dim))
    else:
        _, groups, owner = layout
        bound = 1.0
        for gi, g in enumerate(groups):
            if owner is not None and gi != owner:
                continue
            bound = max(bound, float(np.prod([per_dim[k] for k in g])))
    return bound * max(max_sw, 1.0)


@functools.lru_cache(maxsize=None)
def _get_device_step_dd(b: int, p: int, cutoff: int, s_log2: int,
                        mesh=None, data_axis: str = "dp",
                        layout=("dense",)):
    """Jitted exact digit-GEMM accumulation step (dd fit tier).

    Signature: ``(ah, al, bh, bl, pts, y, sw, y_scale, nodes, weights,
    dpows) -> (ah, al, bh, bl)`` with (hi, lo) double-f32 accumulator
    pairs for A^T A and A^T y.  ``y_scale`` must be a power of two
    (division is exact).  With a mesh, the per-scale integer GEMM
    outputs psum EXACTLY (see module comment), making the sharded
    accumulation bit-identical to the single-device one.  ``layout``
    selects the design row build (:func:`_layout_for_block`).
    """
    import jax
    import jax.numpy as jnp

    from pychebyshev_tpu.ops.eval_dd import (
        _digit_planes_pair,
        _dd_mul,
        _split_f64,
    )
    from pychebyshev_tpu.ops.tt_eval_dd import _dd_add

    pre = np.float64(2.0 ** -s_log2)

    def _ladder(by_scale):
        acc = comp = None
        for v in sorted(by_scale):
            term = by_scale[v] * np.float32(2.0 ** -v)
            if acc is None:
                acc, comp = term, jnp.zeros_like(term)
            else:
                snew = acc + term
                bv = snew - acc
                err = (acc - (snew - bv)) + (term - bv)
                acc, comp = snew, comp + err
        return acc, comp

    def step(ah, al, bh, bl, pts, y, sw, y_scale, nodes, weights,
             dpows):
        rh, rl = _build_rows_dd(pts, nodes, weights, dpows, layout)
        swh, swl = _split_f64(sw * pre)              # exact pow2 fold
        rh, rl = _dd_mul(rh, rl, swh[:, None], swl[:, None])
        planes = _digit_planes_pair(rh, rl, b, p)
        yh, yl = _split_f64((y * sw) / y_scale)
        y_planes = _digit_planes_pair(yh[:, None], yl[:, None], b, p)

        by_scale = {}
        by_scale_y = {}
        for i in range(p):
            for j in range(i, p):
                v = b * (i + j + 2)
                if v > cutoff:
                    continue
                m = jnp.dot(planes[i].T, planes[j],
                            preferred_element_type=jnp.float32)
                t = m + m.T if j > i else m
                by_scale[v] = (t if v not in by_scale
                               else by_scale[v] + t)
        for i in range(p):
            for j in range(p):
                v = b * (i + j + 2)
                if v > cutoff:
                    continue
                g = jnp.dot(planes[i].T, y_planes[j],
                            preferred_element_type=jnp.float32)[:, 0]
                by_scale_y[v] = (g if v not in by_scale_y
                                 else by_scale_y[v] + g)
        if mesh is not None:
            by_scale = {v: jax.lax.psum(m, data_axis)
                        for v, m in by_scale.items()}
            by_scale_y = {v: jax.lax.psum(g, data_axis)
                          for v, g in by_scale_y.items()}
        gh, gl = _ladder(by_scale)
        gyh, gyl = _ladder(by_scale_y)
        ah, al = _dd_add(ah, al, gh, gl)
        bh, bl = _dd_add(bh, bl, gyh, gyl)
        return ah, al, bh, bl

    if mesh is None:
        return jax.jit(step, donate_argnums=(0, 1, 2, 3))
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    return jax.jit(shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(data_axis, None),
                  P(data_axis), P(data_axis), P(), P(), P(), P()),
        out_specs=(P(), P(), P(), P()),
    ), donate_argnums=(0, 1, 2, 3))


def _device_normal_accumulation_dd(blocks, nodes, weights, dim_design,
                                   grid_points, mesh=None,
                                   data_axis: str = "dp",
                                   layouts=None):
    """Exact (f64-class) device Gram accumulation — see module comment.

    Same contract as :func:`_device_normal_accumulation`; returns
    f64 ``(ata, aty)`` deviating ~1e-13-class relative from the host
    f64 loops (measured in tests/test_fit_device.py) instead of the
    f32 tier's ~1e-4.
    """
    import jax.numpy as jnp

    d = len(nodes)
    counts = [int(nd.shape[0]) for nd in nodes]
    chunk = _fit_chunk_size(grid_points, blocks, cap=_DD_MAX_CHUNK)
    alloc = _chunk_alloc(chunk, mesh, data_axis)
    plan0 = _dd_fit_plan(chunk, 1.0)
    if not plan0["ok"]:
        raise ValueError(
            f"fit chunk {chunk} leaves no digit budget for the exact "
            f"device tier; use engine='device' or 'host'")
    if layouts is None:
        layouts = [("dense",)] * len(blocks)

    nodes64 = tuple(jnp.asarray(nd, jnp.float64) for nd in nodes)
    weights64 = tuple(jnp.asarray(w, jnp.float64) for w in weights)
    ata = np.zeros((grid_points, grid_points))
    aty = np.zeros(grid_points)
    # Each block gets its OWN digit plan (the pre-scale must cover its
    # derivative folds' |D^o| column sums) and its own accumulator
    # pair, descaled to f64 before the cross-block sum — blocks with
    # wildly different row magnitudes never share a quantization unit.
    for (pts, orders, vals, sqrt_scale), layout in zip(blocks, layouts):
        max_sw = float(np.max(sqrt_scale)) if sqrt_scale.size else 1.0
        bound = _block_row_bound(orders, dim_design, counts, max_sw,
                                 layout)
        # Digit widths key on the NONZERO row count (the chunk): mesh
        # padding rows are exact zeros in every integer sum, so the
        # plan — and the accumulation — stay mesh-independent.
        plan = _dd_fit_plan(chunk, bound)
        if not plan["ok"]:
            raise ValueError(
                f"fit chunk {chunk} leaves no digit budget for the "
                f"exact device tier; use engine='device' or 'host'")
        max_y = (float(np.max(np.abs(vals * sqrt_scale)))
                 if vals.size else 0.0) or 1.0
        y_scale = np.float64(2.0 ** np.ceil(np.log2(max_y)))
        step = _get_device_step_dd(plan["b"], plan["p"],
                                   plan["cutoff"], plan["s_log2"],
                                   mesh, data_axis, layout)
        dpows = tuple(
            jnp.asarray(
                np.eye(nodes[k].shape[0]) if orders[k] == 0
                else dim_design._dpow(k, orders[k]),
                dtype=jnp.float64)
            for k in range(d)
        )
        ah = jnp.zeros((grid_points, grid_points), dtype=jnp.float32)
        al = jnp.zeros_like(ah)
        bh = jnp.zeros(grid_points, dtype=jnp.float32)
        bl = jnp.zeros_like(bh)
        n = pts.shape[0]
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            p_c, y_c, s_c = _chunk_arrays(pts, vals, sqrt_scale,
                                          start, end, alloc, d)
            ah, al, bh, bl = step(
                ah, al, bh, bl, jnp.asarray(p_c), jnp.asarray(y_c),
                jnp.asarray(s_c), jnp.asarray(y_scale), nodes64,
                weights64, dpows)
        back = np.float64(2.0 ** (2 * plan["s_log2"]))
        ata += (np.asarray(ah, dtype=np.float64)
                + np.asarray(al, dtype=np.float64)) * back
        aty += ((np.asarray(bh, dtype=np.float64)
                 + np.asarray(bl, dtype=np.float64))
                * np.float64(2.0 ** plan["s_log2"]) * float(y_scale))
    return ata, aty


def _block_residual_stats(design_chunk_fn, sol, pts, vals, chunk):
    """Chunked unweighted residual stats for one derivative block."""
    sse = 0.0
    max_abs = 0.0
    nb = pts.shape[0]
    for start in range(0, nb, chunk):
        sl = slice(start, min(start + chunk, nb))
        res = design_chunk_fn(sl) @ sol - vals[sl]
        sse += float(np.sum(res * res))
        max_abs = max(max_abs, float(np.max(np.abs(res))))
    return sse, max_abs


def fit_dense_tensor(
    points: np.ndarray,
    values: np.ndarray,
    domain: Sequence[Sequence[float]],
    n_nodes: Sequence[int],
    *,
    l2: float = 0.0,
    sample_weight: Optional[np.ndarray] = None,
    rcond: Optional[float] = None,
    derivative_data=None,
    engine: str = "host",
    mesh=None,
    data_axis: str = "dp",
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
    derivative_data : optional derivative-observation blocks
        ``[(points_b, orders_b, values_b[, weight_b]), ...]`` (see
        :func:`normalize_derivative_data`) — gradient-enhanced fitting:
        each block adds rows ``kron_k (r_k(x) @ D_k^{o_k})`` to the
        same linear system, so AAD/pathwise Greeks tighten the fit at
        no structural cost.  Block rows count toward the
        determinedness requirement.

    Returns
    -------
    (tensor, diagnostics): the (n_1, ..., n_d) nodal-value tensor and a
    dict with ``rms`` (weighted training rms over the VALUE samples),
    ``max_abs_residual`` (unweighted |residual| max, excluding
    zero-weight samples), ``n_samples``, ``grid_points``, ``l2``,
    ``rank`` (None for the Cholesky path).  With derivative blocks:
    ``derivative_blocks`` (per-block unweighted ``rms`` /
    ``max_abs_residual`` / ``orders`` / ``weight`` / ``n_samples``) and
    ``objective_sse`` (the full weighted objective).

    ``engine="device"`` accumulates the normal equations on the
    accelerator in the f32 tier (:func:`_device_normal_accumulation`)
    — the MXU turns the ``N * G**2`` accumulation from the dominant
    cost into seconds for millions of samples; use it for huge noisy
    datasets, where its ~1e-4-class normal-matrix rounding sits far
    below the sampling noise.  ``engine="device-dd"`` accumulates
    through the exact digit-GEMM tier
    (:func:`_device_normal_accumulation_dd`): f64-class normal
    equations (~1e-13 relative vs the host loops) at MXU rates — the
    device engine for exact-recovery and tight-noise fits.  The
    default ``"host"`` engine stays exact f64.  Residual diagnostics
    are computed on host in f64 for every engine.

    ``mesh``: data-parallel accumulation for the device engines —
    sample chunks shard over ``data_axis``, partial Gram/rhs psum.
    The f32 tier changes only summation order; the dd tier's integer
    psums are exact, so its sharded result is bit-identical to the
    single-device one.
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
    if engine not in ("host", "device", "device-dd"):
        raise ValueError(
            f"engine must be 'host', 'device' or 'device-dd', got "
            f"{engine!r}")
    if mesh is not None and engine == "host":
        raise ValueError(
            "mesh= requires a device engine ('device' or "
            "'device-dd'); the host engine is single-process f64")
    if engine == "device" and l2 == 0.0:
        # Exactly-determined systems squared through an f32-tier A^T A
        # (cond ~ squared) can lose most of the recovered accuracy;
        # the host engine is the exact-recovery path (docstring).
        warnings.warn(
            "engine='device' accumulates the normal equations in the "
            "f32 tier; an exact-recovery (l2=0) fit should use "
            "engine='host' (f64) unless sampling noise dominates.",
            UserWarning, stacklevel=3)

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
    blocks = normalize_derivative_data(derivative_data, d, domain, counts)
    informative = (min(n_samples, grid_points)
                   + _capped_block_rows(blocks, counts))
    if l2 == 0.0 and informative < grid_points:
        raise ValueError(
            f"underdetermined fit: {informative} informative rows "
            f"(value samples + derivative observations capped at their "
            f"D^o rank) < {grid_points} grid values; pass l2 > 0 or "
            f"add samples"
        )

    nodes = [nodes_for_dim_np(float(domain[k][0]), float(domain[k][1]),
                              counts[k]) for k in range(d)]
    weights = [barycentric_weights_np(nd) for nd in nodes]
    dim_design = _DimDesign(nodes, weights)

    chunk = max(1024, _CHUNK_ELEMS // max(grid_points, 1))

    def _block_chunk_fn(pts, orders=(0,) * d):
        def fn(sl):
            return _khatri_rao([
                dim_design.rows(pts[sl, k], k, orders[k])
                for k in range(d)
            ])
        return fn

    # The value design is the all-zero-orders special case.
    _design_chunk = _block_chunk_fn(points)

    if engine in ("device", "device-dd"):
        ones = (np.sqrt(sample_weight) if sample_weight is not None
                else np.ones(n_samples))
        spec = [(points, (0,) * d, values, ones)]
        spec += [(pts, orders, vals,
                  np.full(pts.shape[0], np.sqrt(weight)))
                 for pts, orders, vals, weight in blocks]
        accumulate = (_device_normal_accumulation_dd
                      if engine == "device-dd"
                      else _device_normal_accumulation)
        ata, aty = accumulate(spec, nodes, weights, dim_design,
                              grid_points, mesh=mesh,
                              data_axis=data_axis)
    else:
        ata = np.zeros((grid_points, grid_points))
        aty = np.zeros(grid_points)
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
        for pts, orders, vals, weight in blocks:
            block_fn = _block_chunk_fn(pts, orders)
            for start in range(0, pts.shape[0], chunk):
                sl = slice(start, min(start + chunk, pts.shape[0]))
                rows = block_fn(sl) * np.sqrt(weight)
                ata += rows.T @ rows
                aty += rows.T @ (vals[sl] * np.sqrt(weight))

    rank = None
    min_norm = False
    if l2 > 0.0:
        solve_mat = ata + l2 * np.eye(grid_points)
        try:
            flat = np.linalg.solve(solve_mat, aty)
        except np.linalg.LinAlgError:
            flat, _, rank, _ = np.linalg.lstsq(solve_mat, aty,
                                               rcond=rcond)
    else:
        flat, _, rank, _ = np.linalg.lstsq(ata, aty, rcond=rcond)
        # The informative-row gate above is a rank UPPER bound only:
        # duplicated points (or a zero-order derivative block repeating
        # the value samples) double-count, pass the gate, and land
        # here rank-deficient — in which case lstsq silently returned
        # the min-norm solution.  Surface it.
        if rank is not None and rank < grid_points:
            min_norm = True
            warnings.warn(
                f"fit is rank-deficient ({rank} < {grid_points} grid "
                f"values) despite passing the informative-row check "
                f"(e.g. duplicated sample points); the solution is the "
                f"minimum-norm one. Pass l2 > 0 or deduplicate "
                f"samples.", UserWarning, stacklevel=3)

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
        "engine": engine,
        "min_norm": min_norm,
    }
    if blocks:
        block_diags = []
        objective_sse = sse
        for pts, orders, vals, weight in blocks:
            b_sse, b_max = _block_residual_stats(
                _block_chunk_fn(pts, orders), flat, pts, vals, chunk)
            objective_sse += weight * b_sse
            block_diags.append({
                "orders": list(orders),
                "n_samples": int(pts.shape[0]),
                "weight": weight,
                "rms": float(np.sqrt(b_sse / pts.shape[0])),
                "max_abs_residual": b_max,
            })
        diagnostics["derivative_blocks"] = block_diags
        diagnostics["objective_sse"] = objective_sse
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
    derivative_data=None,
    engine: str = "host",
    mesh=None,
    data_axis: str = "dp",
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

    ``derivative_data`` blocks (see :func:`normalize_derivative_data`)
    must differentiate dims of at most ONE group: the additive model's
    cross-group mixed partials are identically zero (the same exact-zero
    rule the slider eval router applies), so such observations carry no
    information about the unknowns and are rejected.  A block owning
    group ``G_i`` contributes rows that are zero outside ``G_i``'s
    columns (and zero in the intercept column for any differentiated
    block).

    ``engine`` / ``mesh`` / ``data_axis``: as in
    :func:`fit_dense_tensor` — the additive design accumulates on the
    accelerator through the same f32 or exact-dd step machinery (the
    concatenated ``[1 | A_i]`` layout is a static step variant),
    optionally dp-sharded with psum'd partials.
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
    deriv_blocks = normalize_derivative_data(derivative_data, d, domain,
                                             counts)
    dim_to_group = {}
    for gi, g in enumerate(groups):
        for dim in g:
            dim_to_group[dim] = gi
    block_owner: List[Optional[int]] = []
    for bi, (_, orders, _, _) in enumerate(deriv_blocks):
        owner_set = {dim_to_group[k] for k, o in enumerate(orders) if o}
        if len(owner_set) > 1:
            raise ValueError(
                f"derivative_data[{bi}]: orders differentiate dims in "
                f"{len(owner_set)} groups — the additive model's "
                f"cross-group mixed partials are identically zero, so "
                f"the observation is uninformative; split it into "
                f"single-group blocks")
        block_owner.append(owner_set.pop() if owner_set else None)

    # Effective dof excludes the k constant redundancies.
    dof = columns - len(groups)
    # Determinedness (l2 == 0): differentiated blocks inform ONLY the
    # owner group's columns, and at most prod_{dim in g}(n_dim - o_dim)
    # directions there (D^o annihilates low degrees); undifferentiated
    # blocks act as additional value rows.  Both a global and a
    # per-group necessary condition are enforced — raw row totals would
    # let a structurally rank-deficient system through to a silent
    # min-norm solve (e.g. one starved group).
    value_like = n_samples + sum(
        pts.shape[0] for (pts, _, _, _), owner
        in zip(deriv_blocks, block_owner) if owner is None)
    owned_caps = [0] * len(groups)
    for (pts, orders, _, _), owner in zip(deriv_blocks, block_owner):
        if owner is not None:
            span = int(np.prod([counts[dim] - orders[dim]
                                for dim in groups[owner]]))
            owned_caps[owner] += min(pts.shape[0], span)
    if l2 == 0.0:
        informative = min(value_like, dof) + sum(owned_caps)
        if informative < dof:
            raise ValueError(
                f"underdetermined fit: {informative} informative rows "
                f"(value-like samples + derivative observations capped "
                f"at their D^o rank) < {dof} effective unknowns; pass "
                f"l2 > 0 or add samples"
            )
        for gi, size in enumerate(group_sizes):
            have = value_like + owned_caps[gi]
            if have < size - 1:
                raise ValueError(
                    f"underdetermined fit: group {gi} "
                    f"(dims {list(groups[gi])}) is informed by only "
                    f"{have} rows for its {size} nodal values; "
                    f"derivative observations for other groups cannot "
                    f"constrain it — pass l2 > 0 or add samples"
                )

    nodes = [nodes_for_dim_np(float(domain[k][0]), float(domain[k][1]),
                              counts[k]) for k in range(d)]
    weights = [barycentric_weights_np(nd) for nd in nodes]
    dim_design = _DimDesign(nodes, weights)

    def _block_chunk_fn(pts, orders=(0,) * d, owner=None):
        # owner None: ordinary additive row (the value design and
        # undifferentiated blocks).  Differentiated blocks zero the
        # intercept and every non-owner group's columns.
        def fn(sl):
            n_rows = pts[sl].shape[0]
            cols = [np.ones((n_rows, 1)) if owner is None
                    else np.zeros((n_rows, 1))]
            for gi, g in enumerate(groups):
                if owner is not None and gi != owner:
                    cols.append(np.zeros((n_rows, group_sizes[gi])))
                else:
                    cols.append(_khatri_rao([
                        dim_design.rows(pts[sl, dim], dim, orders[dim])
                        for dim in g
                    ]))
            return np.concatenate(cols, axis=1)
        return fn

    _design_chunk = _block_chunk_fn(points)

    if engine not in ("host", "device", "device-dd"):
        raise ValueError(
            f"engine must be 'host', 'device' or 'device-dd', got "
            f"{engine!r}")
    if mesh is not None and engine == "host":
        raise ValueError(
            "mesh= requires a device engine ('device' or "
            "'device-dd'); the host engine is single-process f64")
    chunk = max(1024, _CHUNK_ELEMS // max(columns, 1))
    if engine in ("device", "device-dd"):
        ones = (np.sqrt(sample_weight) if sample_weight is not None
                else np.ones(n_samples))
        spec = [(points, (0,) * d, values, ones)]
        layouts = [_layout_for_block(groups, None)]
        for (pts, orders, vals, weight), owner in zip(deriv_blocks,
                                                      block_owner):
            spec.append((pts, orders, vals,
                         np.full(pts.shape[0], np.sqrt(weight))))
            layouts.append(_layout_for_block(groups, owner))
        accumulate = (_device_normal_accumulation_dd
                      if engine == "device-dd"
                      else _device_normal_accumulation)
        ata, aty = accumulate(spec, nodes, weights, dim_design,
                              columns, mesh=mesh, data_axis=data_axis,
                              layouts=layouts)
    else:
        ata = np.zeros((columns, columns))
        aty = np.zeros(columns)
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
        for (pts, orders, vals, weight), owner in zip(deriv_blocks,
                                                      block_owner):
            block_fn = _block_chunk_fn(pts, orders, owner)
            for start in range(0, pts.shape[0], chunk):
                sl = slice(start, min(start + chunk, pts.shape[0]))
                rows = block_fn(sl) * np.sqrt(weight)
                ata += rows.T @ rows
                aty += rows.T @ (vals[sl] * np.sqrt(weight))

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
        "engine": engine,
    }
    if deriv_blocks:
        block_diags = []
        objective_sse = sse
        for (pts, orders, vals, weight), owner in zip(deriv_blocks,
                                                      block_owner):
            b_sse, b_max = _block_residual_stats(
                _block_chunk_fn(pts, orders, owner), theta, pts, vals,
                chunk)
            objective_sse += weight * b_sse
            block_diags.append({
                "orders": list(orders),
                "n_samples": int(pts.shape[0]),
                "weight": weight,
                "rms": float(np.sqrt(b_sse / pts.shape[0])),
                "max_abs_residual": b_max,
            })
        diagnostics["derivative_blocks"] = block_diags
        diagnostics["objective_sse"] = objective_sse
    return tensors, c0, diagnostics


# --------------------------------------------------------------------------
# TT-ALS device machinery (round 5).
#
# Profiled at N = 5e5 x 3 sweeps (host, 5-D rank-5 n=7): the per-core
# design-row einsum + Gram accumulation take ~75% of wall time and the
# interface chains another ~21%; the "tiny" core solves are 0.02 s.
# The engine="device" path keeps the f32 per-dim design rows and both
# interface chains RESIDENT on the accelerator, materializes each
# chunk's (C, r*n*r) design only on device, and assembles A^T A / A^T y
# with bf16x3 MXU GEMMs — the same precision story as the dense
# fit engine (noise-dominated huge-N fits; exact-recovery fits stay on
# the host engine).  Core solves/QR remain host f64 (tiny).  With
# ``mesh``, rows and interfaces shard over the data axis and the
# per-device Gram partials psum (the Gram is a plain sample sum, so dp
# composes exactly).
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _tt_device_fns(mesh=None, data_axis: str = "dp"):
    """Jitted device kernels for the TT-ALS sweep: interface advance,
    chunked Gram accumulation, and the final-core prediction."""
    import jax
    import jax.numpy as jnp

    from pychebyshev_tpu.ops.eval import _gemm_precision

    prec = _gemm_precision(jnp.float32)

    def iface_right(interface, rows_k, core):
        m = jnp.einsum("ni,aib->nab", rows_k, core, precision=prec)
        return jnp.einsum("nab,nb->na", m, interface, precision=prec)

    def iface_left(interface, rows_k, core):
        m = jnp.einsum("ni,aib->nab", rows_k, core, precision=prec)
        return jnp.einsum("na,nab->nb", interface, m, precision=prec)

    def gram_step(ata, aty, left, rows_k, right, y, sw):
        design = jnp.einsum("na,ni,nb->naib", left, rows_k, right,
                            precision=prec)
        design = design.reshape(design.shape[0], -1) * sw[:, None]
        d_ata = jnp.matmul(design.T, design, precision=prec)
        d_aty = jnp.matmul(design.T, y * sw, precision=prec)
        if mesh is not None:
            d_ata = jax.lax.psum(d_ata, data_axis)
            d_aty = jax.lax.psum(d_aty, data_axis)
        return ata + d_ata, aty + d_aty

    def sse(left, rows_k, core, right, y, sw):
        m = jnp.einsum("ni,aib->nab", rows_k, core, precision=prec)
        u = jnp.einsum("na,nab->nb", left, m, precision=prec)
        preds = jnp.einsum("nb,nb->n", u, right, precision=prec)
        r = ((preds - y) * sw).astype(jnp.float64)
        out = jnp.sum(r * r)
        if mesh is not None:
            out = jax.lax.psum(out, data_axis)
        return out

    if mesh is None:
        return {
            "iface_right": jax.jit(iface_right),
            "iface_left": jax.jit(iface_left),
            "gram_step": jax.jit(gram_step, donate_argnums=(0, 1)),
            "sse": jax.jit(sse),
        }
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    dp = P(data_axis, None)
    return {
        "iface_right": jax.jit(shard_map(
            iface_right, mesh=mesh, in_specs=(dp, dp, P()),
            out_specs=dp)),
        "iface_left": jax.jit(shard_map(
            iface_left, mesh=mesh, in_specs=(dp, dp, P()),
            out_specs=dp)),
        "gram_step": jax.jit(shard_map(
            gram_step, mesh=mesh,
            in_specs=(P(), P(), dp, dp, dp, P(data_axis), P(data_axis)),
            out_specs=(P(), P())), donate_argnums=(0, 1)),
        "sse": jax.jit(shard_map(
            sse, mesh=mesh,
            in_specs=(dp, dp, P(), dp, P(data_axis), P(data_axis)),
            out_specs=P())),
    }


def _tt_als_sweeps_device(rows, y_all, sqrt_w, cores, ranks, counts,
                          l2, sweeps, mesh, data_axis, w_total):
    """The ALS sweep loop with device-resident rows/interfaces/Grams.

    Same iteration structure and early-stop criterion as the host loop
    in :func:`fit_tt_cores`; returns (cores, ranks, sweep_rms) with
    cores as host f64 arrays (solves and QR run on host)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    fns = _tt_device_fns(mesh, data_axis)
    d = len(rows)
    n = rows[0].shape[0]
    pad = (-n) % mesh.shape[data_axis] if mesh is not None else 0

    def put(a, spec):
        a = jnp.asarray(a, jnp.float32)
        if mesh is None:
            return a
        return jax.device_put(a, NamedSharding(mesh, spec))

    rows_dev = [put(np.pad(r, ((0, pad), (0, 0))), P(data_axis, None))
                for r in rows]
    y_dev = put(np.pad(y_all, (0, pad)), P(data_axis))
    sw_host = (sqrt_w if sqrt_w is not None else np.ones(n))
    # Zero weights kill the padded rows exactly.
    sw_dev = put(np.pad(sw_host, (0, pad)), P(data_axis))
    ones_dev = put(np.ones((n + pad, 1)), P(data_axis, None))

    def core_dev(k):
        return put(cores[k], P())

    chunk = max(8192, (1 << 23) // max(
        max(ranks[k] * counts[k] * ranks[k + 1] for k in range(d)), 1))

    sweep_rms: List[float] = []
    for sweep in range(int(sweeps)):
        right = [None] * (d + 1)
        right[d] = ones_dev
        for k in range(d - 1, 0, -1):
            right[k] = fns["iface_right"](right[k + 1], rows_dev[k],
                                          core_dev(k))
        left = ones_dev
        for k in range(d):
            r0, nk, r1 = ranks[k], counts[k], ranks[k + 1]
            p_cols = r0 * nk * r1
            ata = jnp.zeros((p_cols, p_cols), jnp.float32)
            aty = jnp.zeros(p_cols, jnp.float32)
            if mesh is None:
                for start in range(0, n + pad, chunk):
                    sl = slice(start, min(start + chunk, n + pad))
                    ata, aty = fns["gram_step"](
                        ata, aty, left[sl], rows_dev[k][sl],
                        right[k + 1][sl], y_dev[sl], sw_dev[sl])
            else:
                ata, aty = fns["gram_step"](ata, aty, left,
                                            rows_dev[k], right[k + 1],
                                            y_dev, sw_dev)
            ata64 = np.asarray(ata, np.float64)
            aty64 = np.asarray(aty, np.float64)
            if l2 > 0.0:
                ata64 = ata64 + l2 * np.eye(p_cols)
            try:
                sol = np.linalg.solve(ata64, aty64)
            except np.linalg.LinAlgError:
                sol, _, _, _ = np.linalg.lstsq(ata64, aty64, rcond=None)
            cores[k] = sol.reshape(r0, nk, r1)
            if k < d - 1:
                rm, nm, r1m = cores[k].shape
                q, rr = np.linalg.qr(cores[k].reshape(rm * nm, r1m))
                cores[k] = q.reshape(rm, nm, q.shape[1])
                cores[k + 1] = np.einsum("ij,jpk->ipk", rr,
                                         cores[k + 1])
                ranks[k + 1] = cores[k].shape[2]
                left = fns["iface_left"](left, rows_dev[k],
                                         core_dev(k))
        sse = float(fns["sse"](left, rows_dev[d - 1], core_dev(d - 1),
                               right[d], y_dev, sw_dev))
        sweep_rms.append(float(np.sqrt(sse / w_total)))
        if sweep > 0 and sweep_rms[-2] - sweep_rms[-1] < (
                1e-4 * max(sweep_rms[-2], 1e-300)):
            break
    return cores, ranks, sweep_rms


def _tt_chain_preds(rows, cores) -> np.ndarray:
    """Host-f64 per-row predictions of a value-core chain (one
    interface pass; used for the device engine's exact diagnostics)."""
    u = np.ones((rows[0].shape[0], 1))
    for k, core in enumerate(cores):
        m = np.einsum("ni,aib->nab", rows[k], core)
        u = np.einsum("na,nab->nb", u, m)
    return u[:, 0]


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
    derivative_data=None,
    engine: str = "host",
    mesh=None,
    data_axis: str = "dp",
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

    ``derivative_data`` blocks (see :func:`normalize_derivative_data`)
    compose freely with the TT structure: a derivative observation's
    per-dim design row is the barycentric row folded through
    ``D_k^{o_k}``, so the blocks simply STACK onto the sample set (per-
    row weights carry the block weights) and every ALS core solve sees
    them as additional rows.  ``sweep_rms`` then tracks the full
    weighted objective; the returned ``rms`` / ``max_abs_residual``
    stay value-block-only with per-block stats in
    ``derivative_blocks``.

    ``engine="device"`` runs the sweep's dominant terms — the per-core
    design-row materialization, the Gram GEMMs, and both interface
    chains — on the accelerator in f32 (bf16x3 GEMMs), with solves/QR
    on host; profiled at N=5e5 those terms are ~96% of host wall time
    (the "tiny solves" are 0.02 s).  Same accuracy caveat as the dense
    device engine: for noise-dominated huge-N fits; exact-recovery
    fits stay on ``"host"``.  ``mesh=`` shards rows and interfaces
    over ``data_axis`` with exact Gram psums.  Residual diagnostics
    are host f64 for every engine.
    """
    if engine not in ("host", "device"):
        raise ValueError(
            f"engine must be 'host' or 'device', got {engine!r}")
    if mesh is not None and engine == "host":
        raise ValueError(
            "mesh= requires engine='device'; the host engine is "
            "single-process f64")
    if engine == "device" and l2 == 0.0:
        warnings.warn(
            "engine='device' accumulates the normal equations in the "
            "f32 tier (~1e-4-class Gram entries); prefer "
            "engine='host' (f64) unless sampling noise dominates.",
            RuntimeWarning, stacklevel=2)
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

    deriv_blocks = normalize_derivative_data(derivative_data, d, domain,
                                             counts)

    # Valid TT ranks: clamp against both boundary products.
    ranks = [1] + [int(max_rank)] * (d - 1) + [1]
    for k in range(1, d):
        ranks[k] = min(ranks[k], ranks[k - 1] * counts[k - 1])
    for k in range(d - 1, 0, -1):
        ranks[k] = min(ranks[k], ranks[k + 1] * counts[k])
    max_core = max(ranks[k] * counts[k] * ranks[k + 1] for k in range(d))
    n_rows_total = n_samples + sum(b[0].shape[0] for b in deriv_blocks)
    informative = n_samples + _capped_block_rows(deriv_blocks, counts)
    if l2 == 0.0 and informative < max_core:
        raise ValueError(
            f"underdetermined fit: {informative} informative rows "
            f"(value samples + derivative observations capped at their "
            f"D^o rank) < {max_core} unknowns in the largest core; "
            f"pass l2 > 0 or add samples"
        )

    nodes = [nodes_for_dim_np(float(domain[k][0]), float(domain[k][1]),
                              counts[k]) for k in range(d)]
    weights = [barycentric_weights_np(nd) for nd in nodes]
    dim_design = _DimDesign(nodes, weights)
    # Per-dim design rows for the value samples and every derivative
    # block, STACKED: d arrays (N_total, n_k).  Blocks differ from
    # value rows only by the folded D^o — the ALS below is oblivious.
    rows = [
        np.concatenate(
            [dim_design.rows(points[:, k], k)]
            + [dim_design.rows(pts[:, k], k, orders[k])
               for pts, orders, _, _ in deriv_blocks], axis=0)
        for k in range(d)
    ]
    y_all = np.concatenate(
        [values] + [vals for _, _, vals, _ in deriv_blocks])
    if sample_weight is not None or deriv_blocks:
        w_all = np.concatenate(
            [sample_weight if sample_weight is not None
             else np.ones(n_samples)]
            + [np.full(pts.shape[0], weight)
               for pts, _, _, weight in deriv_blocks])
    else:
        w_all = None
    sqrt_w = np.sqrt(w_all) if w_all is not None else None
    w_total = (float(np.sum(w_all)) if w_all is not None
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
    if engine == "device":
        cores, ranks, sweep_rms = _tt_als_sweeps_device(
            rows, y_all, sqrt_w, cores, ranks, counts, l2, sweeps,
            mesh, data_axis, w_total)
        # Exact f64 residual diagnostics for every engine (the
        # dense fitters' convention): one host chain pass.
        res = _tt_chain_preds(rows, cores) - y_all
    else:
        for sweep in range(int(sweeps)):
            # Right interfaces for every position, from the current cores.
            right = [None] * (d + 1)
            right[d] = np.ones((n_rows_total, 1))
            for k in range(d - 1, 0, -1):
                right[k] = _interface_step(right[k + 1], cores[k], rows[k],
                                           "right")
            left = np.ones((n_rows_total, 1))
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
                for start in range(0, n_rows_total, chunk):
                    sl = slice(start, min(start + chunk, n_rows_total))
                    dchunk = _design_chunk(sl)
                    y = y_all[sl]
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
                    preds = np.empty(n_rows_total)
                    for start in range(0, n_rows_total, chunk):
                        sl = slice(start, min(start + chunk, n_rows_total))
                        preds[sl] = _design_chunk(sl) @ sol
            res = preds - y_all
            if w_all is not None:
                sse = float(np.sum(w_all * res * res))
            else:
                sse = float(np.sum(res * res))
            sweep_rms.append(float(np.sqrt(sse / w_total)))
            if sweep > 0 and sweep_rms[-2] - sweep_rms[-1] < (
                    1e-4 * max(sweep_rms[-2], 1e-300)):
                break

    # Headline residuals are VALUE-block-only (matching the dense
    # fitter); per-block stats follow.  ``res`` holds the last sweep's
    # residuals over all stacked rows.
    val_res = res[:n_samples]
    if sample_weight is not None:
        live = sample_weight > 0
        val_max = (float(np.max(np.abs(val_res[live]))) if live.any()
                   else 0.0)
        val_sse = float(np.sum(sample_weight * val_res * val_res))
        val_w = float(np.sum(sample_weight))
    else:
        val_max = float(np.max(np.abs(val_res)))
        val_sse = float(np.sum(val_res * val_res))
        val_w = float(n_samples)
    diagnostics = {
        "rms": (float(np.sqrt(val_sse / val_w)) if val_w > 0 else 0.0),
        "sse": val_sse,
        "sweep_rms": sweep_rms,
        "n_samples": n_samples,
        "tt_ranks": list(ranks),
        "l2": l2,
        "seed": int(seed),
        "max_abs_residual": val_max,
    }
    if deriv_blocks:
        block_diags = []
        offset = n_samples
        objective_sse = val_sse
        for pts, orders, vals, weight in deriv_blocks:
            nb = pts.shape[0]
            b_res = res[offset:offset + nb]
            offset += nb
            b_sse = float(np.sum(b_res * b_res))
            objective_sse += weight * b_sse
            block_diags.append({
                "orders": list(orders),
                "n_samples": int(nb),
                "weight": weight,
                "rms": float(np.sqrt(b_sse / nb)),
                "max_abs_residual": float(np.max(np.abs(b_res))),
            })
        diagnostics["derivative_blocks"] = block_diags
        diagnostics["objective_sse"] = objective_sse
    return cores, diagnostics
