"""Serving-grade batched query engine.

Production query streams have ragged batch sizes; jit recompiles per
shape.  :class:`BatchedEvaluator` snapshots an interpolant's arrays at a
chosen dtype, compiles a small ladder of fixed bucket sizes up front,
and answers any batch by padding to the next bucket — so a serving loop
never recompiles and never leaves the device hot path.

Covers all four interpolant families: dense
:class:`ChebyshevApproximation` (value or fixed derivative spec; XLA or
fused-Pallas kernel, plus ``dtype="dd"`` for the near-f64 digit-GEMM
tier — ~1e-11 deviation at ~14x software-f64 throughput),
:class:`ChebyshevSpline` (host f64 piece routing +
one shared compiled kernel when ``n_nodes`` is flat),
:class:`ChebyshevSlider` (per-slide kernels summed; derivative specs
route to the owning slide, cross-group partials short-circuit to zero),
and :class:`ChebyshevTT` (analytic-derivative TT swapped in for
derivative specs; ``dtype="dd"`` serves the TT digit-GEMM tier —
~1e-13-class deviation at ~100x the software-f64 TT rate).

Example
-------
>>> engine = BatchedEvaluator(cheb, dtype=jnp.float32)
>>> engine.warmup()                  # compile all buckets once
>>> values = engine(points)          # any N; no recompiles
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["BatchedEvaluator", "MultiModelEvaluator",
           "MultiSpecEvaluator", "build_book", "integrate_book",
           "save_book", "load_book"]

_DEFAULT_BUCKETS = (1 << 10, 1 << 14, 1 << 17, 1 << 20)


class BatchedEvaluator:
    """Precompiled, bucket-padded batch evaluation of an interpolant.

    Parameters
    ----------
    interpolant : any of the four interpolant classes (built).
    dtype : jnp.float32 (throughput), jnp.float64 (parity), or the
        string ``"dd"`` (digit-GEMM near-f64 on all four families —
        f64-class accuracy at ~14x the software-f64 dense rate, ~35x
        the slider rate, ~100x the TT rate; out-of-domain batches fall
        back to an f64 sibling engine).
    derivative_order : fixed per-dim derivative spec; None = values.
        Dense/spline hoist the spectral passes; TT swaps in the
        analytic derivative TT; slider routes to the owning slide.
    bucket_sizes : ascending compile sizes; batches beyond the largest
        are processed in largest-bucket chunks.
    use_fused : route dense f32 through the fused Pallas kernel.
        ``None`` (default) = auto: on a TPU backend the engine asks
        ``pallas_eval.prefer_fused`` whether the kernel's padded-FLOP
        model beats the XLA path for this grid shape (same rule as
        ``eval_batch_f32``); off-TPU, under a mesh, or for dd engines
        the auto answer is always False.  ``True`` forces the kernel
        on any supported shape.
    """

    def __init__(self, interpolant, dtype=jnp.float32,
                 derivative_order: Optional[Sequence[int]] = None,
                 bucket_sizes: Tuple[int, ...] = _DEFAULT_BUCKETS,
                 use_fused: bool = None, mesh=None,
                 data_axis: str = "dp"):
        from pychebyshev_tpu.models.approximation import (
            ChebyshevApproximation,
        )
        from pychebyshev_tpu.models.slider import ChebyshevSlider
        from pychebyshev_tpu.models.spline import ChebyshevSpline
        from pychebyshev_tpu.models.tensor_train import ChebyshevTT

        if not isinstance(interpolant, (ChebyshevApproximation,
                                        ChebyshevSlider, ChebyshevSpline,
                                        ChebyshevTT)):
            raise TypeError(
                f"BatchedEvaluator supports ChebyshevApproximation, "
                f"ChebyshevSpline, ChebyshevSlider, and ChebyshevTT, got "
                f"{type(interpolant).__name__}"
            )
        # dtype="dd" = the near-f64 digit-GEMM tier (dense, flat
        # spline, TT): f64-class accuracy without software f64.
        self._dd = (isinstance(dtype, str) and dtype == "dd")
        if self._dd:
            from pychebyshev_tpu.ops.eval_dd import supports_dd
            if isinstance(interpolant, ChebyshevApproximation):
                if interpolant.tensor_values is None:
                    raise RuntimeError("interpolant is not built")
                shape = tuple(interpolant.tensor_values.shape)
            elif isinstance(interpolant, ChebyshevSpline):
                if not interpolant._built:
                    raise RuntimeError("interpolant is not built")
                # .shape alone — np.asarray would pull every piece's
                # full tensor over the (slow) device link just to read
                # its shape.
                shapes = {tuple(p.tensor_values.shape)
                          for p in interpolant._pieces}
                if len(shapes) != 1:
                    raise ValueError(
                        "dtype='dd' spline serving requires flat "
                        "n_nodes (all pieces on one grid shape)"
                    )
                from pychebyshev_tpu.ops import eval_dd as _dd_mod
                if len(interpolant._pieces) > _dd_mod._PLANE_CACHE_SLOTS:
                    raise ValueError(
                        f"dtype='dd' spline serving supports at most "
                        f"{_dd_mod._PLANE_CACHE_SLOTS} pieces (the digit-"
                        f"plane cache working set); this spline has "
                        f"{len(interpolant._pieces)} — serve at "
                        f"dtype=jnp.float64 instead"
                    )
                shape = next(iter(shapes))
            elif isinstance(interpolant, ChebyshevTT):
                interpolant._check_built()
                from pychebyshev_tpu.ops.tt_eval_dd import tt_supports_dd
                core_shapes = [np.shape(c)
                               for c in interpolant._coeff_cores]
                if not tt_supports_dd(core_shapes):
                    raise ValueError(
                        f"TT core shapes {core_shapes} are outside the "
                        f"digit-GEMM plan budget; serve at "
                        f"dtype=jnp.float64 instead"
                    )
                shape = None
            elif isinstance(interpolant, ChebyshevSlider):
                if not interpolant._built:
                    raise RuntimeError("interpolant is not built")
                from pychebyshev_tpu.ops.slider_eval import slider_dd_plan
                slide_shapes = [np.shape(s.tensor_values)
                                for s in interpolant.slides]
                if not slider_dd_plan(slide_shapes)["ok"]:
                    raise ValueError(
                        f"slider slide shapes {slide_shapes} are outside "
                        f"the digit-GEMM plan budget; serve at "
                        f"dtype=jnp.float64 instead"
                    )
                shape = None
            else:
                raise TypeError(
                    "dtype='dd' (digit-GEMM serving) supports "
                    "ChebyshevApproximation, flat-grid ChebyshevSpline, "
                    "ChebyshevTT, and ChebyshevSlider"
                )
            self._dd_tp = False
            if shape is not None and not supports_dd(shape):
                # Beyond the single-chip digit budget: a mesh with a
                # "tp" axis can still serve it — sharding the exact
                # contraction raises the per-device budget
                # (parallel.sharding.eval_batch_dd_tp).
                tp_ok = False
                if (mesh is not None and "tp" in mesh.axis_names
                        and isinstance(interpolant,
                                       ChebyshevApproximation)):
                    from pychebyshev_tpu.parallel.sharding import (
                        dd_tp_plan,
                    )
                    tp_ok = dd_tp_plan(shape,
                                       mesh.shape["tp"])["ok"]
                if not tp_ok:
                    has_tp = (mesh is not None
                              and "tp" in mesh.axis_names)
                    if has_tp and not isinstance(
                            interpolant, ChebyshevApproximation):
                        raise ValueError(
                            f"grid shape {shape} is outside the "
                            f"digit-GEMM plan budget, and the "
                            f"tensor-parallel dd route serves dense "
                            f"ChebyshevApproximation engines only; "
                            f"serve at dtype=jnp.float64 instead"
                        )
                    if has_tp:
                        # The user DID pass a tp mesh; don't tell them
                        # to pass one — the sharded plan refuses too.
                        raise ValueError(
                            f"grid shape {shape} is outside the "
                            f"digit-GEMM plan budget even tensor-"
                            f"parallel over tp={mesh.shape['tp']} "
                            f"(the sharded plan refuses this shape); "
                            f"serve at dtype=jnp.float64 instead"
                        )
                    raise ValueError(
                        f"grid shape {shape} is outside the digit-GEMM "
                        f"plan budget; serve at dtype=jnp.float64, or "
                        f"(dense engines) pass a mesh with a 'tp' axis "
                        f"— tensor-parallel digit-GEMM raises the "
                        f"per-device budget"
                    )
                self._dd_tp = True
            if use_fused:
                raise ValueError(
                    "dtype='dd' is plain XLA; it does not compose with "
                    "use_fused"
                )
            # mesh + dd composes: the dd kernels are pure per-point
            # work over replicated digit planes, so the engine serves
            # dp-sharded near-f64 buckets (parallel.sharding.*_dd_dp).
            # Out-of-domain batches mirror the class-path contract (the
            # digit planes' exactness bound holds in-domain only): the
            # whole call falls back to a lazily-built f64 sibling
            # engine, keeping reference silent-extrapolation semantics
            # at full accuracy.
            self._dd_domain = np.asarray(interpolant.domain,
                                         dtype=np.float64)
            self._dd_fallback = None
            self._dd_fallback_ctor = lambda: BatchedEvaluator(
                interpolant, dtype=jnp.float64,
                derivative_order=derivative_order,
                bucket_sizes=bucket_sizes, mesh=mesh,
                data_axis=data_axis)
            dtype = jnp.float64
        self.dtype = jnp.dtype(dtype)
        self.bucket_sizes = tuple(sorted(int(b) for b in bucket_sizes))
        self.num_dimensions = interpolant.num_dimensions
        if use_fused is None and not (jax.default_backend() == "tpu"
                                      and mesh is None and not self._dd):
            # auto never engages off-TPU, under a mesh, or for dd
            # engines; on TPU the remaining None resolves per grid
            # shape in the dense branch below (pallas_eval.prefer_fused
            # — the kernel wins only where its padded-FLOP model beats
            # the XLA path) and to False for the other families.
            use_fused = False
        self._use_fused = use_fused
        self._mesh = mesh
        self._data_axis = data_axis
        if mesh is not None:
            axis_size = mesh.shape[data_axis]
            for b in self.bucket_sizes:
                if b % axis_size != 0:
                    raise ValueError(
                        f"bucket size {b} is not divisible by mesh axis "
                        f"{data_axis!r} (size {axis_size}); pick bucket "
                        f"sizes that shard evenly"
                    )
            if use_fused:
                raise ValueError(
                    "use_fused and mesh are mutually exclusive (the "
                    "Pallas kernel is single-device)"
                )

        if isinstance(interpolant, ChebyshevApproximation):
            if interpolant.tensor_values is None:
                raise RuntimeError("interpolant is not built")
            self._kind = "dense"
            orders = self._validated_orders(derivative_order)
            nodes, weights, diffs = interpolant._grid_tuples()
            from pychebyshev_tpu.ops.eval import apply_derivative_passes
            tensor = jnp.asarray(interpolant.tensor_values, self.dtype)
            self._nodes = tuple(jnp.asarray(a, self.dtype) for a in nodes)
            self._weights = tuple(jnp.asarray(a, self.dtype)
                                  for a in weights)
            self._diffs = tuple(jnp.asarray(a, self.dtype) for a in diffs)
            # Hoist derivative passes once: the engine serves ONE spec.
            self._tensor = apply_derivative_passes(tensor, self._diffs,
                                                   orders)
            self._orders = (0,) * self.num_dimensions
            if self._use_fused is None:
                from pychebyshev_tpu.ops.pallas_eval import prefer_fused
                self._use_fused = (self.dtype == jnp.float32
                                   and prefer_fused(self._tensor.shape,
                                                    self.dtype))
        elif isinstance(interpolant, ChebyshevSpline):
            if not interpolant._built:
                raise RuntimeError("interpolant is not built")
            self._kind = "spline"
            orders = self._validated_orders(derivative_order)
            self._spline_orders = orders
            self._knots = [np.asarray(k, dtype=np.float64)
                           for k in interpolant.knots]
            self._pshape = tuple(interpolant._shape)
            from pychebyshev_tpu.ops.eval import apply_derivative_passes
            self._piece_arrays = []
            for piece in interpolant._pieces:
                nodes, weights, diffs = piece._grid_tuples()
                diffs = tuple(jnp.asarray(a, self.dtype) for a in diffs)
                tensor = apply_derivative_passes(
                    jnp.asarray(piece.tensor_values, self.dtype), diffs,
                    orders)
                self._piece_arrays.append((
                    tensor,
                    tuple(jnp.asarray(a, self.dtype) for a in nodes),
                    tuple(jnp.asarray(a, self.dtype) for a in weights),
                    diffs,
                ))
            self._orders = (0,) * self.num_dimensions
            # Uniform piece shapes (flat n_nodes) + small piece count:
            # serve through the fused masked path (one dispatch/bucket).
            # The dd tier instead host-routes each occupied piece
            # through the digit-GEMM kernel (plane cache per piece).
            from pychebyshev_tpu.ops.spline_eval import (
                MASKED_MAX_PIECES,
                MASKED_MAX_PIECES_F64,
            )
            max_pieces = (MASKED_MAX_PIECES if self.dtype == jnp.float32
                          else MASKED_MAX_PIECES_F64)
            shapes = {p[0].shape for p in self._piece_arrays}
            self._spline_stacked = None
            if (not self._dd and len(shapes) == 1
                    and len(self._piece_arrays) <= max_pieces):
                self._spline_stacked = (
                    jnp.stack([p[0] for p in self._piece_arrays]),
                    tuple(jnp.stack([p[1][k] for p in self._piece_arrays])
                          for k in range(self.num_dimensions)),
                    tuple(jnp.stack([p[2][k] for p in self._piece_arrays])
                          for k in range(self.num_dimensions)),
                    tuple(jnp.stack([p[3][k] for p in self._piece_arrays])
                          for k in range(self.num_dimensions)),
                )
                # Routing stays host-side in f64 (route_piece_indices):
                # an f32 engine must never mis-route a point sitting
                # within f32 eps of a knot.
                from pychebyshev_tpu.ops.spline_eval import piece_strides
                self._strides = piece_strides(
                    [len(k) for k in self._knots])
        elif isinstance(interpolant, ChebyshevSlider):
            if not interpolant._built:
                raise RuntimeError("interpolant is not built")
            self._kind = "slider"
            orders = self._validated_orders(derivative_order)
            from pychebyshev_tpu.ops.eval import apply_derivative_passes

            def _snapshot(slide, sub_orders):
                nodes, weights, diffs = slide._grid_tuples()
                diffs = tuple(jnp.asarray(a, self.dtype) for a in diffs)
                tensor = apply_derivative_passes(
                    jnp.asarray(slide.tensor_values, self.dtype), diffs,
                    tuple(sub_orders))
                return (tensor,
                        tuple(jnp.asarray(a, self.dtype) for a in nodes),
                        tuple(jnp.asarray(a, self.dtype) for a in weights),
                        diffs)

            active = {interpolant._dim_to_slide[d]
                      for d, o in enumerate(orders) if o > 0}
            if len(active) > 1:
                # Cross-group mixed partials of an additive model are
                # identically zero: serve without touching the device.
                self._slider_mode = "zero"
            elif len(active) == 1:
                idx = active.pop()
                group = list(interpolant.partition[idx])
                self._slider_mode = "derivative"
                self._slider_groups = [np.asarray(group, dtype=np.intp)]
                self._slide_arrays = [
                    _snapshot(interpolant.slides[idx],
                              [orders[d] for d in group])]
            else:
                self._slider_mode = "value"
                self._slider_groups = [
                    np.asarray(g, dtype=np.intp)
                    for g in interpolant.partition]
                self._slide_arrays = [
                    _snapshot(s, [0] * len(g))
                    for s, g in zip(interpolant.slides,
                                    interpolant.partition)]
                self._pivot_value = float(interpolant.pivot_value)
            self._orders = None  # per-slide zero orders set in _run
        else:
            interpolant._check_built()
            if derivative_order is not None and any(
                    o != 0 for o in derivative_order):
                # Analytic derivative TT evaluates at full speed.
                interpolant = interpolant.differentiate(derivative_order)
            self._kind = "tt"
            self._cores = tuple(jnp.asarray(c, self.dtype)
                                for c in interpolant._coeff_cores)
            self._domain = np.asarray(interpolant.domain,
                                      dtype=np.float64)
            self._dim_order = list(interpolant._dim_order)

        if self._use_fused is None:
            # Only the dense branch resolves the TPU auto case per
            # shape; every other family has no fused kernel.
            self._use_fused = False

    # ------------------------------------------------------------------

    def _validated_orders(self, derivative_order):
        orders = tuple(int(o) for o in (
            derivative_order or [0] * self.num_dimensions))
        if len(orders) != self.num_dimensions:
            raise ValueError(
                f"derivative_order length {len(orders)} does not "
                f"match num_dimensions {self.num_dimensions}"
            )
        return orders

    def _run(self, points: jax.Array) -> jax.Array:
        if self._kind == "dense":
            if self._dd:
                if getattr(self, "_dd_tp", False):
                    from pychebyshev_tpu.parallel.sharding import (
                        eval_batch_dd_tp,
                    )
                    return eval_batch_dd_tp(
                        self._tensor, self._nodes, self._weights,
                        self._diffs, points, self._mesh, self._orders,
                        dp_axis=self._data_axis)
                if self._mesh is not None:
                    from pychebyshev_tpu.parallel.sharding import (
                        eval_batch_dd_dp,
                    )
                    return eval_batch_dd_dp(
                        self._tensor, self._nodes, self._weights,
                        self._diffs, points, self._mesh, self._orders,
                        axis_name=self._data_axis)
                from pychebyshev_tpu.ops.eval_dd import eval_batch_dd
                return eval_batch_dd(self._tensor, self._nodes,
                                     self._weights, self._diffs, points,
                                     self._orders)
            if self._use_fused and self.dtype == jnp.float32:
                from pychebyshev_tpu.ops.pallas_eval import (
                    fused_eval_batch,
                    supports_fused,
                )
                if supports_fused(self._tensor.shape, self.dtype):
                    return fused_eval_batch(
                        self._tensor, self._nodes, self._weights,
                        self._diffs, points, self._orders)
            from pychebyshev_tpu.ops.eval import eval_batch
            return eval_batch(self._tensor, self._nodes, self._weights,
                              self._diffs, points, self._orders)
        if self._kind == "spline":
            if getattr(self, "_spline_stacked", None) is not None:
                flat = np.zeros(points.shape[0], dtype=np.int32)
                if self._mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec
                    flat = jax.device_put(flat, NamedSharding(
                        self._mesh, PartitionSpec(self._data_axis)))
                return self._run_spline_masked(points, flat)
            return self._run_piece(points, 0)
        if self._kind == "slider":
            return self._run_slider(points)
        if self._dd:
            if self._mesh is not None:
                from pychebyshev_tpu.parallel.sharding import (
                    tt_eval_batch_dd_dp,
                )
                return tt_eval_batch_dd_dp(self._cores, self._domain,
                                           points, self._mesh,
                                           axis_name=self._data_axis)
            from pychebyshev_tpu.ops.tt_eval_dd import tt_eval_batch_dd
            return tt_eval_batch_dd(self._cores, self._domain, points,
                                    groups="auto")
        from pychebyshev_tpu.ops.tt_eval import tt_eval_batch
        # Per-dim chain for BOTH f32 and f64: grouping was measured
        # SLOWER for the f32 tier (110M -> 60M q/s on the compression
        # chain — the f32 chain is fusion/HBM-bound and the Khatri-Rao
        # row materialization adds traffic; docs/performance.md), so
        # the grouped transform stays a dd-tier win.
        return tt_eval_batch(self._cores, self._domain, points)

    def _run_slider(self, points: jax.Array) -> jax.Array:
        from pychebyshev_tpu.ops.eval import eval_batch
        if self._slider_mode == "zero":
            return jnp.zeros(points.shape[0], self.dtype)
        if self._slider_mode == "derivative":
            tensor, nodes, weights, diffs = self._slide_arrays[0]
            group = self._slider_groups[0]
            if self._dd:
                # One-slide digit-GEMM; the snapshot tensor already
                # carries the derivative passes, and a single active
                # slide has no pivot correction term.
                if self._mesh is not None:
                    from pychebyshev_tpu.parallel.sharding import (
                        slider_batch_dd_dp,
                    )
                    return slider_batch_dd_dp(
                        (self._slide_arrays[0],), 0.0,
                        (tuple(range(len(group))),), points[:, group],
                        self._mesh, axis_name=self._data_axis)
                from pychebyshev_tpu.ops.slider_eval import (
                    slider_batch_dd,
                )
                return slider_batch_dd(
                    (self._slide_arrays[0],), 0.0,
                    (tuple(range(len(group))),), points[:, group])
            return eval_batch(tensor, nodes, weights, diffs,
                              points[:, group], (0,) * len(group))
        groups = tuple(tuple(int(d) for d in g)
                       for g in self._slider_groups)
        if self._dd:
            if self._mesh is not None:
                from pychebyshev_tpu.parallel.sharding import (
                    slider_batch_dd_dp,
                )
                return slider_batch_dd_dp(
                    tuple(self._slide_arrays), self._pivot_value,
                    groups, points, self._mesh,
                    axis_name=self._data_axis)
            from pychebyshev_tpu.ops.slider_eval import slider_batch_dd
            return slider_batch_dd(
                tuple(self._slide_arrays), self._pivot_value, groups,
                points)
        from pychebyshev_tpu.ops.slider_eval import slider_value_batch
        return slider_value_batch(
            tuple(self._slide_arrays),
            jnp.asarray(self._pivot_value, self.dtype), groups, points)

    def _run_piece(self, points: jax.Array, piece_idx: int) -> jax.Array:
        """One padded bucket through one spline piece's dense kernel.

        With flat ``n_nodes`` every piece shares array shapes, so all
        pieces reuse the same compiled executable per bucket size.
        """
        tensor, nodes, weights, diffs = self._piece_arrays[piece_idx]
        if self._dd:
            if self._mesh is not None:
                from pychebyshev_tpu.parallel.sharding import (
                    eval_batch_dd_dp,
                )
                return eval_batch_dd_dp(
                    tensor, nodes, weights, diffs, points, self._mesh,
                    self._orders, axis_name=self._data_axis)
            from pychebyshev_tpu.ops.eval_dd import eval_batch_dd
            return eval_batch_dd(tensor, nodes, weights, diffs, points,
                                 self._orders)
        from pychebyshev_tpu.ops.eval import eval_batch
        return eval_batch(tensor, nodes, weights, diffs, points,
                          self._orders)

    def _route_pieces(self, points: np.ndarray) -> np.ndarray:
        """Flat piece index per point — the ONE routing rule
        (``spline_eval.route_piece_indices``), shared with the masked
        path so the two serving modes can never route differently."""
        from pychebyshev_tpu.ops.spline_eval import (
            piece_strides,
            route_piece_indices,
        )
        strides = piece_strides([len(k) for k in self._knots])
        return route_piece_indices(self._knots, strides, points)

    def _check_knot_boundary_batch(self, points: np.ndarray) -> None:
        from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL
        for d, order in enumerate(self._spline_orders):
            if order > 0 and len(self._knots[d]) > 0:
                dist = np.abs(points[:, d][:, None]
                              - self._knots[d][None, :])
                if np.any(dist < NODE_COINCIDENCE_TOL):
                    i, k = np.argwhere(dist < NODE_COINCIDENCE_TOL)[0]
                    raise ValueError(
                        f"Derivative w.r.t. dimension {d} is not defined "
                        f"at knot x[{d}]={self._knots[d][k]} "
                        f"(point {i}). The left and right derivatives "
                        f"may differ at this point."
                    )

    def _run_spline_masked(self, points: jax.Array,
                           flat: np.ndarray) -> jax.Array:
        """One dispatch per bucket: all pieces evaluated, host-routed
        (f64) indices select (``ops.spline_eval``); pieces' derivative
        passes were hoisted at engine construction."""
        from pychebyshev_tpu.ops.spline_eval import masked_eval_batch
        tensors, nodes, weights, diffs = self._spline_stacked
        return masked_eval_batch(tensors, nodes, weights, diffs,
                                 flat, points, self._orders)

    def _route_chunk(self, chunk: np.ndarray) -> tuple:
        """Host f64 piece routing for one padded chunk (spline masked).
        Under a mesh the indices are sharded like the points so the
        selection gather stays local to each shard."""
        from pychebyshev_tpu.ops.spline_eval import route_piece_indices
        flat = route_piece_indices(self._knots, self._strides, chunk)
        if self._mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            flat = jax.device_put(flat, NamedSharding(
                self._mesh, PartitionSpec(self._data_axis)))
        return (flat,)

    def _bucketed(self, points: np.ndarray, runner,
                  host_aux=None, out_cols: int = None) -> np.ndarray:
        """Feed ``points`` through ``runner`` in padded compiled buckets
        (the one bucket/pad/place loop every serving path shares).
        ``host_aux(chunk)``, when given, contributes extra per-chunk
        runner args computed host-side from the padded f64 chunk.
        ``out_cols`` switches to a multi-column (N, out_cols) output for
        runners returning (out_cols, bucket) — the multi-spec shape."""
        n = points.shape[0]
        out = (np.empty(n, dtype=self.dtype) if out_cols is None
               else np.empty((n, out_cols), dtype=self.dtype))
        max_bucket = self.bucket_sizes[-1]
        start = 0
        while start < n:
            stop = min(start + max_bucket, n)
            chunk = points[start:stop]
            bucket = self._bucket_for(stop - start)
            if chunk.shape[0] < bucket:
                # pad with the first row (always a valid in-domain point)
                pad = np.broadcast_to(chunk[0], (bucket - chunk.shape[0],
                                                 self.num_dimensions))
                chunk = np.concatenate([chunk, pad], axis=0)
            aux = () if host_aux is None else host_aux(chunk)
            result = runner(self._place(jnp.asarray(chunk, self.dtype)),
                            *aux)
            arr = np.asarray(result)
            out[start:stop] = (arr[:stop - start] if out_cols is None
                               else arr.T[:stop - start])
            start = stop
        return out

    def _call_spline(self, points: np.ndarray) -> np.ndarray:
        self._check_knot_boundary_batch(points)
        if getattr(self, "_spline_stacked", None) is not None:
            return self._bucketed(points, self._run_spline_masked,
                                  host_aux=self._route_chunk)
        flat = self._route_pieces(points)
        out = np.empty(points.shape[0], dtype=self.dtype)
        for piece_idx in np.unique(flat):
            sel = np.flatnonzero(flat == piece_idx)
            out[sel] = self._bucketed(
                points[sel],
                lambda p, i=int(piece_idx): self._run_piece(p, i))
        return out

    def _place(self, chunk: jax.Array) -> jax.Array:
        """Shard a bucket over the data axis when a mesh is set.

        The grid arrays are small and replicate implicitly; sharded
        query points make XLA partition every kernel in the engine
        across the mesh (dp serving — one engine, many chips).
        """
        if self._mesh is None:
            return chunk
        from jax.sharding import NamedSharding, PartitionSpec
        return jax.device_put(chunk, NamedSharding(
            self._mesh, PartitionSpec(self._data_axis, None)))

    def _bucket_for(self, n: int) -> int:
        for b in self.bucket_sizes:
            if n <= b:
                return b
        return self.bucket_sizes[-1]

    def warmup(self) -> None:
        """Compile every bucket size up front."""
        for b in self.bucket_sizes:
            pts = jnp.zeros((b, self.num_dimensions), self.dtype) + 0.5
            if self._kind == "tt":
                # keep warmup points inside the domain
                lo = self._domain[:, 0]
                hi = self._domain[:, 1]
                pts = jnp.asarray(
                    (lo + 0.5 * (hi - lo))[None, :].repeat(b, axis=0),
                    self.dtype)
            jax.block_until_ready(self._run(self._place(pts)))

    def _dd_out_of_domain(self, points: np.ndarray) -> bool:
        dom = self._dd_domain
        return bool(np.any(points < dom[:, 0])
                    or np.any(points > dom[:, 1]))

    def __call__(self, points) -> np.ndarray:
        """Evaluate at (N, d) points; pads N to a compiled bucket."""
        points = np.asarray(points)
        n = points.shape[0]
        if points.ndim != 2 or points.shape[1] != self.num_dimensions:
            raise ValueError(
                f"points must have shape (N, {self.num_dimensions}); "
                f"got {points.shape}"
            )
        if self._dd:
            # TT domains are stored in the STORAGE frame; check the
            # correspondingly-permuted coordinates (the fallback engine
            # receives the original user-frame points).
            chk = points
            if self._kind == "tt" and self._dim_order != list(
                    range(self.num_dimensions)):
                chk = points[:, self._dim_order]
            if self._dd_out_of_domain(np.asarray(chk,
                                                 dtype=np.float64)):
                if self._dd_fallback is None:
                    self._dd_fallback = self._dd_fallback_ctor()
                return self._dd_fallback(points)
        if self._kind == "spline":
            return self._call_spline(np.asarray(points, dtype=np.float64))
        if self._kind == "tt" and self._dim_order != list(
                range(self.num_dimensions)):
            points = points[:, self._dim_order]
        return self._bucketed(points, self._run)


class MultiSpecEvaluator:
    """One interpolant, MANY derivative specs per call.

    The production risk-report engine: ``engine(points)`` returns an
    (N, M) array — e.g. price plus five Greeks — from ONE device
    dispatch per bucket.

    - **Dense**: per-point barycentric rows are built once per bucket
      and shared across all specs (``ops.eval.eval_batch_multi``): M
      specs cost one row build + M GEMMs, not M full evaluations — and
      1/M-th the dispatches of M single-spec engines.
    - **Spline** (flat grid, small piece count): every piece x every
      spec in one fused program (``ops.spline_eval.
      masked_eval_batch_multi``) with host-side f64 piece routing.
      Derivative specs at a knot raise, matching the single-spec
      engine's guard.
    - **Slider**: the additive value sum runs at most once per bucket
      plus one owning-slide kernel per derivative spec
      (``ops.slider_eval.slider_multi_batch``); cross-group mixed
      partials are served as exact zeros without touching the device.
    - **TT**: rejected — its derivatives are finite differences, whose
      h ~ 1e-4·range stencils lose most significant digits below f64;
      use ``differentiate()`` per spec + ``MultiModelEvaluator``.

    ``dtype="dd"`` serves the report at near-f64 accuracy (~1e-11)
    through the digit-GEMM tier: dense and slider reports share ONE
    double-f32 row-plane build per bucket (each spec adds only its
    exact GEMM ladder — ``ops.eval_dd.eval_batch_dd_multi`` /
    ``ops.slider_eval.slider_multi_batch_dd``); flat-grid splines route
    per piece on host and run each occupied piece's whole spec set
    through the dense primitive.
    """

    def __init__(self, interpolant, specs, dtype=jnp.float32,
                 bucket_sizes: Tuple[int, ...] = _DEFAULT_BUCKETS,
                 mesh=None, data_axis: str = "dp"):
        from pychebyshev_tpu.models.approximation import (
            ChebyshevApproximation,
        )
        from pychebyshev_tpu.models.slider import ChebyshevSlider
        from pychebyshev_tpu.models.spline import ChebyshevSpline
        if not isinstance(interpolant, (ChebyshevApproximation,
                                        ChebyshevSpline,
                                        ChebyshevSlider)):
            raise TypeError(
                "MultiSpecEvaluator serves ChebyshevApproximation, "
                "ChebyshevSpline, and ChebyshevSlider objects (TT "
                "models: differentiate() per spec + MultiModelEvaluator)"
            )
        # dtype="dd": the near-f64 digit-GEMM report (dense, flat
        # spline, slider) — shared row-plane builds, per-spec exact
        # GEMM ladders.
        self._dd = (isinstance(dtype, str) and dtype == "dd")
        if self._dd:
            if isinstance(interpolant, ChebyshevApproximation):
                if interpolant.tensor_values is None:
                    raise RuntimeError("interpolant is not built")
                from pychebyshev_tpu.ops.eval_dd import supports_dd
                shape = tuple(interpolant.tensor_values.shape)
                if not supports_dd(shape):
                    raise ValueError(
                        f"grid shape {shape} is outside the digit-GEMM "
                        f"plan budget; serve at dtype=jnp.float64 "
                        f"instead"
                    )
            elif isinstance(interpolant, ChebyshevSlider):
                if not interpolant._built:
                    raise RuntimeError("interpolant is not built")
                from pychebyshev_tpu.ops.slider_eval import slider_dd_plan
                slide_shapes = [np.shape(s.tensor_values)
                                for s in interpolant.slides]
                if not slider_dd_plan(slide_shapes)["ok"]:
                    raise ValueError(
                        f"slider slide shapes {slide_shapes} are outside "
                        f"the digit-GEMM plan budget; serve at "
                        f"dtype=jnp.float64 instead"
                    )
            elif isinstance(interpolant, ChebyshevSpline):
                # Uniform piece grids within the plan budget; the piece
                # cap below bounds the pieces x specs plane sets this
                # engine's runners pin in device memory (they OWN their
                # planes — unlike BatchedEvaluator's global cache).
                if not interpolant._built:
                    raise RuntimeError("interpolant is not built")
                from pychebyshev_tpu.ops import eval_dd as _dd_mod
                shapes = {tuple(p.tensor_values.shape)
                          for p in interpolant._pieces}
                if len(shapes) != 1:
                    raise ValueError(
                        "dtype='dd' spline serving requires flat "
                        "n_nodes (all pieces on one grid shape)"
                    )
                if len(interpolant._pieces) > _dd_mod._PLANE_CACHE_SLOTS:
                    # Unlike BatchedEvaluator (whose per-piece calls
                    # share the bounded global plane cache), this
                    # engine's runners OWN their planes — the cap here
                    # bounds the pieces x specs plane sets the engine
                    # pins in device memory for its lifetime.
                    raise ValueError(
                        f"dtype='dd' multi-spec spline serving supports "
                        f"at most {_dd_mod._PLANE_CACHE_SLOTS} pieces "
                        f"(each piece pins one plane set per spec in "
                        f"device memory); this spline has "
                        f"{len(interpolant._pieces)} — serve at "
                        f"dtype=jnp.float64 instead"
                    )
                shape = next(iter(shapes))
                if not _dd_mod.supports_dd(shape):
                    raise ValueError(
                        f"grid shape {shape} is outside the digit-GEMM "
                        f"plan budget; serve at dtype=jnp.float64 "
                        f"instead"
                    )
            else:
                raise TypeError(
                    "dtype='dd' multi-spec serving supports "
                    "ChebyshevApproximation, flat-grid ChebyshevSpline, "
                    "and ChebyshevSlider"
                )
            # mesh composes: the dd report runners replicate their
            # plane working set and shard points over the data axis.
            # Out-of-domain batches fall back to an f64 sibling engine
            # (the class-path contract; exactness bound is in-domain).
            self._dd_domain = np.asarray(interpolant.domain,
                                         dtype=np.float64)
            self._dd_fallback = None
            self._dd_fallback_ctor = lambda: MultiSpecEvaluator(
                interpolant, specs, dtype=jnp.float64,
                bucket_sizes=bucket_sizes, mesh=mesh,
                data_axis=data_axis)
            dtype = jnp.float64
        self.dtype = jnp.dtype(dtype)
        self.bucket_sizes = tuple(sorted(int(b) for b in bucket_sizes))
        self.num_dimensions = interpolant.num_dimensions
        self._mesh = mesh
        self._data_axis = data_axis
        self.specs = tuple(tuple(int(o) for o in s) for s in specs)
        for s in self.specs:
            if len(s) != self.num_dimensions:
                raise ValueError(
                    f"spec {s} length != num_dimensions "
                    f"{self.num_dimensions}"
                )
        if mesh is not None:
            axis_size = mesh.shape[data_axis]
            for b in self.bucket_sizes:
                if b % axis_size != 0:
                    raise ValueError(
                        f"bucket size {b} is not divisible by mesh axis "
                        f"{data_axis!r} (size {axis_size}); pick bucket "
                        f"sizes that shard evenly"
                    )
        if isinstance(interpolant, ChebyshevApproximation):
            if interpolant.tensor_values is None:
                raise RuntimeError("interpolant is not built")
            self._kind = "dense"
            nodes, weights, diffs = interpolant._grid_tuples()
            self._nodes = tuple(jnp.asarray(a, self.dtype) for a in nodes)
            self._weights = tuple(jnp.asarray(a, self.dtype)
                                  for a in weights)
            self._diffs = tuple(jnp.asarray(a, self.dtype) for a in diffs)
            tensor = jnp.asarray(interpolant.tensor_values, self.dtype)
            # Hoist every spec's derivative passes ONCE: the engine then
            # serves M pre-differentiated same-grid tensors through the
            # book primitive (one row build + M GEMMs per bucket),
            # instead of re-running the D^k chains inside every
            # dispatch.
            from pychebyshev_tpu.ops.eval import apply_derivative_passes
            if self._dd:
                # Prepare every spec's digit planes NOW and close over
                # them: the engine owns its whole working set for its
                # lifetime instead of leaning on the bounded global
                # plane cache (which an M-spec engine could thrash).
                from pychebyshev_tpu.ops.eval_dd import dd_multi_runner
                self._dd_runner = dd_multi_runner(
                    tensor, self._nodes, self._weights, self._diffs,
                    self.specs, mesh=self._mesh,
                    data_axis=self._data_axis)
                self._spec_tensors = ()
            else:
                self._spec_tensors = tuple(
                    apply_derivative_passes(tensor, self._diffs, s)
                    for s in self.specs)
        elif isinstance(interpolant, ChebyshevSpline):
            if not interpolant._built:
                raise RuntimeError("interpolant is not built")
            from pychebyshev_tpu.ops.spline_eval import (
                MASKED_MAX_PIECES,
                MASKED_MAX_PIECES_F64,
                piece_strides,
            )
            if self._dd:
                # Host-routed per-piece reports: each occupied piece
                # serves the whole spec set through the dense dd multi
                # primitive (one shared row build per piece bucket).
                # Every piece's per-spec planes are prepared NOW and
                # closed over, so the engine's pieces x specs working
                # set never cycles through the bounded plane cache.
                from pychebyshev_tpu.ops.eval_dd import dd_multi_runner
                self._kind = "spline"
                self._knots = [np.asarray(k, dtype=np.float64)
                               for k in interpolant.knots]
                self._strides = piece_strides(
                    [len(k) for k in self._knots])
                self._spline_stacked = None
                runners = []
                for piece in interpolant._pieces:
                    nodes, weights, diffs = (
                        tuple(jnp.asarray(a, jnp.float64) for a in grp)
                        for grp in piece._grid_tuples())
                    runners.append(dd_multi_runner(
                        jnp.asarray(piece.tensor_values, jnp.float64),
                        nodes, weights, diffs, self.specs,
                        mesh=self._mesh, data_axis=self._data_axis))
                self._piece_dd_runners = tuple(runners)
                self._guard_dims = sorted({
                    d for s in self.specs
                    for d, o in enumerate(s) if o > 0})
                return
            max_pieces = (MASKED_MAX_PIECES if self.dtype == jnp.float32
                          else MASKED_MAX_PIECES_F64)
            if (not interpolant._pieces_stackable()
                    or len(interpolant._pieces) > max_pieces):
                raise ValueError(
                    f"multi-spec spline serving needs uniform piece "
                    f"grids (flat n_nodes, homogeneous auto-N) and at "
                    f"most {max_pieces} pieces at this dtype; route "
                    f"other splines through the class path "
                    f"(vectorized_eval_batch_multi)"
                )
            self._kind = "spline"
            self._knots = [np.asarray(k, dtype=np.float64)
                           for k in interpolant.knots]
            self._strides = piece_strides([len(k) for k in self._knots])
            stacked, _ = interpolant._masked_arrays()
            tensors, nodes, weights, diffs = stacked
            self._spline_stacked = (
                jnp.asarray(tensors, self.dtype),
                tuple(jnp.asarray(a, self.dtype) for a in nodes),
                tuple(jnp.asarray(a, self.dtype) for a in weights),
                tuple(jnp.asarray(a, self.dtype) for a in diffs),
            )
            # Union of dims any spec differentiates: the knot-boundary
            # guard below mirrors the single-spec engine.
            self._guard_dims = sorted({
                d for s in self.specs for d, o in enumerate(s) if o > 0})
        else:
            if not interpolant._built:
                raise RuntimeError("interpolant is not built")
            self._kind = "slider"
            self._slider_groups = tuple(
                tuple(int(d) for d in g) for g in interpolant.partition)
            self._pivot_value = float(interpolant.pivot_value)
            plan = interpolant._multi_spec_plans(self.specs)
            self._slider_plan = tuple(plan)
            self._slide_arrays = tuple(
                (jnp.asarray(s.tensor_values, self.dtype),)
                + tuple(tuple(jnp.asarray(a, self.dtype) for a in grp)
                        for grp in s._grid_tuples())
                for s in interpolant.slides)
            if self._dd:
                # Prepare every spec's plane vector now (engine-owned
                # working set, same rationale as the dense branch).
                from pychebyshev_tpu.ops.slider_eval import (
                    slider_dd_multi_runner,
                )
                self._dd_runner = slider_dd_multi_runner(
                    self._slide_arrays, self._pivot_value,
                    self._slider_groups, self.specs, mesh=self._mesh,
                    data_axis=self._data_axis)

    def _run(self, points: jax.Array, *aux) -> jax.Array:
        if self._kind == "dense":
            if self._dd:
                # (N, M) -> the runner contract's (M, N).
                return self._dd_runner(points).T
            from pychebyshev_tpu.ops.eval import eval_batch_models
            return eval_batch_models(
                self._spec_tensors, self._nodes, self._weights,
                self._diffs, points, (0,) * self.num_dimensions)
        if self._kind == "spline":
            from pychebyshev_tpu.ops.spline_eval import (
                masked_eval_batch_multi,
            )
            tensors, nodes, weights, diffs = self._spline_stacked
            (flat,) = aux
            return masked_eval_batch_multi(tensors, nodes, weights,
                                           diffs, flat, points,
                                           self.specs)
        if self._dd:
            # (N, M) -> the runner contract's (M, N).
            return self._dd_runner(points).T
        from pychebyshev_tpu.ops.slider_eval import slider_multi_batch
        return slider_multi_batch(
            self._slide_arrays, jnp.asarray(self._pivot_value, self.dtype),
            self._slider_groups, self._slider_plan, points)

    # reuse BatchedEvaluator's bucket/routing machinery
    _place = BatchedEvaluator._place
    _bucket_for = BatchedEvaluator._bucket_for
    _route_chunk = BatchedEvaluator._route_chunk
    _bucketed = BatchedEvaluator._bucketed

    def _check_knots(self, points: np.ndarray) -> None:
        from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL
        for d in self._guard_dims:
            if len(self._knots[d]) == 0:
                continue
            dist = np.abs(points[:, d][:, None] - self._knots[d][None, :])
            if np.any(dist < NODE_COINCIDENCE_TOL):
                i, k = np.argwhere(dist < NODE_COINCIDENCE_TOL)[0]
                raise ValueError(
                    f"Derivative w.r.t. dimension {d} is not defined "
                    f"at knot x[{d}]={self._knots[d][k]} (point {i}). "
                    f"The left and right derivatives may differ at "
                    f"this point."
                )

    def _call_spline_dd(self, points: np.ndarray) -> np.ndarray:
        """Host-routed per-piece dd reports: each occupied piece runs
        the whole spec set through the dense digit-GEMM multi primitive
        (flat grids share one compiled executable per bucket size)."""
        from pychebyshev_tpu.ops.spline_eval import route_piece_indices
        flat = route_piece_indices(self._knots, self._strides, points)
        out = np.empty((points.shape[0], len(self.specs)),
                       dtype=self.dtype)
        for piece_idx in np.unique(flat):
            sel = np.flatnonzero(flat == piece_idx)
            runner = self._piece_dd_runners[int(piece_idx)]
            out[sel] = self._bucketed(
                points[sel],
                lambda p, r=runner: r(p).T,
                out_cols=len(self.specs))
        return out

    def warmup(self) -> None:
        for b in self.bucket_sizes:
            pts = jnp.zeros((b, self.num_dimensions), self.dtype) + 0.5
            if self._kind == "spline" and self._dd:
                jax.block_until_ready(self._piece_dd_runners[0](pts))
                continue
            aux = ()
            if self._kind == "spline":
                aux = self._route_chunk(np.full(
                    (b, self.num_dimensions), 0.5))
            jax.block_until_ready(self._run(self._place(pts), *aux))

    def __call__(self, points) -> np.ndarray:
        """(N, d) points -> (N, len(specs)) values."""
        points = np.asarray(points)
        n = points.shape[0]
        if points.ndim != 2 or points.shape[1] != self.num_dimensions:
            raise ValueError(
                f"points must have shape (N, {self.num_dimensions}); "
                f"got {points.shape}"
            )
        if self._dd and BatchedEvaluator._dd_out_of_domain(
                self, np.asarray(points, dtype=np.float64)):
            if self._dd_fallback is None:
                self._dd_fallback = self._dd_fallback_ctor()
            return self._dd_fallback(points)
        host_aux = None
        if self._kind == "spline":
            points = np.asarray(points, dtype=np.float64)
            self._check_knots(points)
            if self._dd:
                return self._call_spline_dd(points)
            host_aux = self._route_chunk
        return self._bucketed(points, self._run, host_aux=host_aux,
                              out_cols=len(self.specs))


class MultiModelEvaluator:
    """One query batch against a *book* of same-grid interpolants.

    M dense interpolants sharing one grid (identical ``domain`` and
    ``n_nodes``) evaluate at N points for the cost of one barycentric
    row build plus M GEMMs per chunk (``ops.eval.eval_batch_models``) —
    the per-point row work amortizes across the whole book.  Beyond the
    reference surface; the natural fit is a portfolio of products
    approximated over a common market-state domain.

    TT books stack rank-padded cores and run one vmapped chain
    (derivative specs swap in each model's analytic-derivative TT).
    Every model pays the book-wide max-rank chain cost — split a book
    with one high-rank outlier into rank-homogeneous sub-books.

    Same bucket-padding discipline as :class:`BatchedEvaluator`; one
    fixed derivative spec, hoisted per model at construction.

    Example
    -------
    >>> book = MultiModelEvaluator(models, dtype=jnp.float32)
    >>> book.warmup()
    >>> values = book(points)        # (M, N)
    """

    def __init__(self, interpolants, dtype=jnp.float32,
                 derivative_order: Optional[Sequence[int]] = None,
                 bucket_sizes: Tuple[int, ...] = _DEFAULT_BUCKETS,
                 mesh=None, data_axis: str = "dp"):
        from pychebyshev_tpu.models.approximation import (
            ChebyshevApproximation,
        )
        from pychebyshev_tpu.models.tensor_train import ChebyshevTT

        interpolants = list(interpolants)
        if not interpolants:
            raise ValueError("interpolants must be a non-empty sequence")
        kinds = {type(m) for m in interpolants}
        if len(kinds) > 1 or kinds - {ChebyshevApproximation,
                                      ChebyshevTT}:
            raise TypeError(
                f"MultiModelEvaluator supports a homogeneous book of "
                f"ChebyshevApproximation or ChebyshevTT models, got "
                f"{sorted(t.__name__ for t in kinds)}"
            )
        first = interpolants[0]
        self._kind = ("tt" if isinstance(first, ChebyshevTT)
                      else "dense")
        # dtype="dd": the near-f64 book (dense + TT) — shared row-plane
        # builds per bucket, per-model exact GEMM ladders.
        self._dd = (isinstance(dtype, str) and dtype == "dd")
        if self._dd:
            from pychebyshev_tpu.ops import eval_dd as _dd_mod
            from pychebyshev_tpu.ops import tt_eval_dd as _tt_dd_mod
            # Each family's planes live in its OWN bounded cache; the
            # book must fit the cache it will actually use.
            slots = (_tt_dd_mod._PLANE_CACHE_SLOTS
                     if self._kind == "tt"
                     else _dd_mod._PLANE_CACHE_SLOTS)
            if len(interpolants) > slots:
                raise ValueError(
                    f"dtype='dd' books hold at most {slots} models "
                    f"(the digit-plane cache working set); this book "
                    f"has {len(interpolants)}"
                )
            if self._kind == "tt":
                from pychebyshev_tpu.ops.tt_eval_dd import tt_supports_dd
                for i, m in enumerate(interpolants):
                    m._check_built()
                    core_shapes = [np.shape(c) for c in m._coeff_cores]
                    if not tt_supports_dd(core_shapes):
                        raise ValueError(
                            f"interpolants[{i}] TT core shapes "
                            f"{core_shapes} are outside the digit-GEMM "
                            f"plan budget; serve at dtype=jnp.float64 "
                            f"instead"
                        )
            elif first.tensor_values is not None and \
                    not _dd_mod.supports_dd(
                        tuple(first.tensor_values.shape)):
                raise ValueError(
                    f"grid shape {tuple(first.tensor_values.shape)} is "
                    f"outside the digit-GEMM plan budget"
                )
            # mesh composes: the book runners replicate their plane
            # working set and shard points over the data axis.
            # Out-of-domain batches fall back to an f64 sibling book
            # (the class-path contract; exactness bound is in-domain).
            _book = list(interpolants)
            self._dd_domain = np.asarray(first.domain,
                                         dtype=np.float64)
            self._dd_fallback = None
            self._dd_fallback_ctor = lambda: MultiModelEvaluator(
                _book, dtype=jnp.float64,
                derivative_order=derivative_order,
                bucket_sizes=bucket_sizes)
            dtype = jnp.float64
        for m in interpolants:
            if self._kind == "tt":
                m._check_built()
            elif m.tensor_values is None:
                raise RuntimeError("all interpolants must be built")
        for i, m in enumerate(interpolants[1:], start=1):
            if (list(m.n_nodes) != list(first.n_nodes)
                    or [list(b) for b in m.domain]
                    != [list(b) for b in first.domain]):
                raise ValueError(
                    f"interpolants[{i}] grid (n_nodes/domain) differs "
                    f"from interpolants[0]; multi-model evaluation "
                    f"requires one shared grid"
                )

        self.dtype = jnp.dtype(dtype)
        self.bucket_sizes = tuple(sorted(int(b) for b in bucket_sizes))
        self.num_dimensions = first.num_dimensions
        self.num_models = len(interpolants)
        self._mesh = mesh
        self._data_axis = data_axis
        if mesh is not None:
            axis_size = mesh.shape[data_axis]
            for b in self.bucket_sizes:
                if b % axis_size != 0:
                    raise ValueError(
                        f"bucket size {b} is not divisible by mesh axis "
                        f"{data_axis!r} (size {axis_size}); pick bucket "
                        f"sizes that shard evenly"
                    )
        orders = tuple(int(o) for o in (
            derivative_order or [0] * self.num_dimensions))
        if len(orders) != self.num_dimensions:
            raise ValueError(
                f"derivative_order length {len(orders)} does not match "
                f"num_dimensions {self.num_dimensions}"
            )

        if self._kind == "tt":
            if any(list(m._dim_order) != list(first._dim_order)
                   for m in interpolants):
                raise ValueError(
                    "all TT models must share one dim_order; reorder() "
                    "them to a common storage frame first"
                )
            if any(o != 0 for o in orders):
                # Analytic derivative TTs evaluate at full speed.
                interpolants = [m.differentiate(list(orders))
                                for m in interpolants]
            if self._dd:
                # Per-model core tuples (stable jax arrays keep the
                # digit-plane cache identity-keyed); the book runner
                # preps every model's planes NOW and shares the
                # per-dim row-plane build across models per call.
                from pychebyshev_tpu.ops.tt_eval_dd import (
                    tt_dd_book_runner,
                )
                self._tt_dd_cores = tuple(
                    tuple(jnp.asarray(c, jnp.float64)
                          for c in m._coeff_cores)
                    for m in interpolants)
                self._tt_domain = np.asarray(first.domain,
                                             dtype=np.float64)
                self._dim_order = list(first._dim_order)
                self._dd_book_runner = tt_dd_book_runner(
                    self._tt_dd_cores, self._tt_domain, mesh=mesh,
                    data_axis=data_axis)
                return
            # Zero-pad every bond to the book-wide max rank and stack:
            # one (M, r, n, r) array per dim, vmapped through the chain.
            d = self.num_dimensions
            r_max = [1] * (d + 1)
            for m in interpolants:
                for k, c in enumerate(m._coeff_cores):
                    r_max[k] = max(r_max[k], c.shape[0])
                    r_max[k + 1] = max(r_max[k + 1], c.shape[2])
            stacked = []
            for k in range(d):
                n_k = first.n_nodes[k]
                block = np.zeros(
                    (self.num_models, r_max[k], n_k, r_max[k + 1]),
                    dtype=np.dtype(self.dtype))
                for i, m in enumerate(interpolants):
                    c = np.asarray(m._coeff_cores[k])
                    block[i, :c.shape[0], :, :c.shape[2]] = c
                stacked.append(jnp.asarray(block))
            self._tt_cores = tuple(stacked)
            self._tt_domain = np.asarray(first.domain, dtype=np.float64)
            self._dim_order = list(first._dim_order)
            return

        from pychebyshev_tpu.ops.eval import apply_derivative_passes
        nodes, weights, diffs = first._grid_tuples()
        self._nodes = tuple(jnp.asarray(a, self.dtype) for a in nodes)
        self._weights = tuple(jnp.asarray(a, self.dtype)
                              for a in weights)
        self._diffs = tuple(jnp.asarray(a, self.dtype) for a in diffs)
        if self._dd:
            # Every model's digit planes (derivative passes folded)
            # prep NOW and close over — the engine owns its working set.
            from pychebyshev_tpu.ops.eval_dd import dd_models_runner
            self._tensors = tuple(
                jnp.asarray(m.tensor_values, self.dtype)
                for m in interpolants)
            self._orders = orders
            self._dd_book_runner = dd_models_runner(
                self._tensors, self._nodes, self._weights, self._diffs,
                orders, mesh=mesh, data_axis=data_axis)
        else:
            self._tensors = tuple(
                apply_derivative_passes(
                    jnp.asarray(m.tensor_values, self.dtype),
                    self._diffs, orders)
                for m in interpolants)
            self._orders = (0,) * self.num_dimensions

    def _run(self, points: jax.Array) -> jax.Array:
        if self._kind == "tt":
            if self._dd:
                return self._dd_book_runner(points)
            from pychebyshev_tpu.ops.tt_eval import tt_eval_batch
            return jax.vmap(
                lambda *cores: tt_eval_batch(cores, self._tt_domain,
                                             points)
            )(*self._tt_cores)
        if self._dd:
            return self._dd_book_runner(points)
        from pychebyshev_tpu.ops.eval import eval_batch_models
        return eval_batch_models(self._tensors, self._nodes,
                                 self._weights, self._diffs, points,
                                 self._orders)

    def _bucket_for(self, n: int) -> int:
        for b in self.bucket_sizes:
            if n <= b:
                return b
        return self.bucket_sizes[-1]

    def warmup(self) -> None:
        """Compile every bucket size up front."""
        for b in self.bucket_sizes:
            pts = jnp.zeros((b, self.num_dimensions), self.dtype) + 0.5
            jax.block_until_ready(self._run(
                BatchedEvaluator._place(self, pts)))

    def __call__(self, points) -> np.ndarray:
        """Evaluate every model at (N, d) points -> (M, N)."""
        points = np.asarray(points)
        n = points.shape[0]
        if points.ndim != 2 or points.shape[1] != self.num_dimensions:
            raise ValueError(
                f"points must have shape (N, {self.num_dimensions}); "
                f"got {points.shape}"
            )
        if self._kind == "tt" and self._dim_order != list(
                range(self.num_dimensions)):
            points = points[:, self._dim_order]
        if self._dd and BatchedEvaluator._dd_out_of_domain(
                self, np.asarray(points, dtype=np.float64)):
            # points are already in the storage frame here; the f64
            # sibling book permutes for itself, so hand it the
            # user-frame order back.
            if self._dd_fallback is None:
                self._dd_fallback = self._dd_fallback_ctor()
            back = points
            if self._kind == "tt" and self._dim_order != list(
                    range(self.num_dimensions)):
                inv = np.argsort(np.asarray(self._dim_order))
                back = points[:, inv]
            return self._dd_fallback(back)
        max_bucket = self.bucket_sizes[-1]
        out = np.empty((self.num_models, n), dtype=self.dtype)
        start = 0
        while start < n:
            stop = min(start + max_bucket, n)
            chunk = points[start:stop]
            bucket = self._bucket_for(stop - start)
            if chunk.shape[0] < bucket:
                pad = np.broadcast_to(chunk[0], (bucket - chunk.shape[0],
                                                 self.num_dimensions))
                chunk = np.concatenate([chunk, pad], axis=0)
            result = self._run(
                BatchedEvaluator._place(self, jnp.asarray(chunk,
                                                          self.dtype)))
            out[:, start:stop] = np.asarray(result)[:, :stop - start]
            start = stop
        return out


def build_book(function, num_dimensions, domain, n_nodes, *,
               additional_data=None, num_models=None,
               max_derivative_order: int = 2, verbose: bool = False,
               mesh=None, data_axis: str = "dp"):
    """Build M same-grid dense interpolants from ONE vectorized call.

    The build-side counterpart of :class:`MultiModelEvaluator`: a
    portfolio book of M products priced over one shared market-state
    grid evaluates every (grid point, model) pair in a single batched
    call to *function*, instead of M sequential ``build()`` loops.  On
    a TPU backend with a JAX-traceable *function* the whole book builds
    in one device dispatch and the M tensors never leave the device.
    (The reference has no book concept; each model would re-enumerate
    the grid and re-dispatch — ``barycentric.py:647-715`` per model.)

    Parameters
    ----------
    function : callable ``f(points, additional_data) -> (G, M)`` —
        *vectorized over both grid points and models*: ``points`` is the
        full ``(G, num_dimensions)`` Chebyshev grid in C order and the
        return carries one column per model.  NumPy in -> host build;
        JAX array out -> the book's tensors stay device-resident.
    num_dimensions, domain, n_nodes : as in
        :class:`~pychebyshev_tpu.ChebyshevApproximation`; ``n_nodes``
        must be explicit positive ints (auto-N applies to one model's
        error, not a book's).
    num_models : optional expected M — validates the function's output
        width up front.
    max_derivative_order : forwarded to every model.
    mesh : optional ``jax.sharding.Mesh`` — shard the grid rows over
        ``data_axis`` so the one oracle call runs data-parallel across
        the mesh (requires a JAX-traceable *function*; uneven grid
        sizes pad with the first grid point and drop the tail).  The
        gathered tensors are replicated device arrays.

    Returns
    -------
    list[ChebyshevApproximation] — M fully-built models SHARING one set
    of node/weight/differentiation arrays (immutable, so sharing is
    free).  Each model reports the book's wall time as its
    ``build_time`` and the shared grid size G as ``n_evaluations``.

    Example
    -------
    >>> book = build_book(price_matrix, 5, domain, [11] * 5)
    >>> engine = MultiModelEvaluator(book, dtype=jnp.float32)
    """
    import time as _time

    from pychebyshev_tpu.models.approximation import (
        ChebyshevApproximation,
        _unwrap_typed,
    )

    # Accept the Domain / Ns typed helpers like every class ctor does.
    domain, n_nodes, _ = _unwrap_typed(domain, n_nodes, None)
    if n_nodes is None or any(
        not isinstance(n, (int, np.integer)) or n <= 0
        for n in list(n_nodes)
    ):
        raise ValueError(
            "build_book requires explicit positive int n_nodes; "
            "error-threshold auto-N calibrates one model's error and "
            "does not extend to a shared book grid"
        )
    if num_models is not None and int(num_models) < 1:
        raise ValueError(f"num_models must be >= 1, got {num_models}")

    start = _time.time()
    # The template owns the grid arrays every model will share (and
    # runs the full ctor validation on domain / n_nodes).
    template = ChebyshevApproximation(
        None, num_dimensions, domain, n_nodes,
        max_derivative_order=max_derivative_order, defer_build=True)
    grid = ChebyshevApproximation.nodes(num_dimensions, domain, n_nodes)
    points = grid["full_grid"]
    shape = grid["shape"]
    n_grid = int(points.shape[0])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        axis = mesh.shape[data_axis]
        pad = -n_grid % axis
        grid_dev = jnp.asarray(points, dtype=jnp.float64)
        if pad:
            # Grid size rarely divides the mesh axis; replicate the
            # first grid point into the tail and drop it after.
            grid_dev = jnp.concatenate(
                [grid_dev,
                 jnp.broadcast_to(grid_dev[:1], (pad, grid_dev.shape[1]))])
        grid_dev = jax.device_put(
            grid_dev, NamedSharding(mesh, PartitionSpec(data_axis, None)))
        try:
            values = jax.jit(
                lambda p: function(p, additional_data))(grid_dev)
        except jax.errors.TracerArrayConversionError as exc:
            raise ValueError(
                "build_book(mesh=...) requires a JAX-traceable book "
                "function (the sharded grid is evaluated under jit); "
                "drop mesh= for host/NumPy oracles"
            ) from exc
        if values.ndim == 2 and int(values.shape[0]) == n_grid + pad:
            # Gather, then drop the padded tail; any other row count
            # falls through to the (G, M) shape validation below.
            values = jax.device_put(
                values, NamedSharding(mesh, PartitionSpec()))[:n_grid]
    else:
        values = function(points, additional_data)
    on_host = isinstance(values, np.ndarray)
    values = (np.asarray(values, dtype=np.float64) if on_host
              else jnp.asarray(values, dtype=jnp.float64))
    if values.ndim != 2 or int(values.shape[0]) != n_grid:
        raise ValueError(
            f"book function must return shape (G, M) = ({n_grid}, "
            f"num_models); got {tuple(values.shape)}"
        )
    n_models = int(values.shape[1])
    if num_models is not None and n_models != int(num_models):
        raise ValueError(
            f"book function returned {n_models} model columns, "
            f"expected num_models={int(num_models)}"
        )

    col_finite = (np.isfinite(values).all(axis=0) if on_host
                  else np.asarray(jnp.isfinite(values).all(axis=0)))
    if not col_finite.all():
        bad = np.nonzero(~col_finite)[0].tolist()
        raise ValueError(
            f"book function returned non-finite values in model "
            f"column(s) {bad}; build cannot proceed with NaN/Inf in "
            f"tensor_values"
        )

    # (G, M) -> (M, *shape): one transpose+reshape, on device when the
    # oracle returned a device array (no host round trip per model).
    stacked = values.T.reshape((n_models,) + tuple(shape))
    elapsed = _time.time() - start

    models = []
    for m in range(n_models):
        model = ChebyshevApproximation._from_grid(template, stacked[m])
        model.max_derivative_order = max_derivative_order
        model.build_time = elapsed
        model.n_evaluations = n_grid
        models.append(model)
    if verbose:
        where = "host" if on_host else "device"
        print(f"Built a {n_models}-model book in {elapsed:.3f}s "
              f"({n_grid:,} grid points x {n_models} models, one "
              f"{where} call)")
    return models


def integrate_book(models, bounds, dtype=None) -> np.ndarray:
    """Box integrals of a same-grid dense book -> (M, B) in ONE dispatch.

    The book analog of :meth:`ChebyshevApproximation.integrate_batch`:
    the per-box sub-interval quadrature rows build once per chunk and
    contract against every model's tensor
    (``ops.integrate.integrate_box_batch_models``) — a whole portfolio's
    bucket masses / expected exposures for the cost of one row build
    plus M GEMMs.

    Parameters
    ----------
    models : sequence of built same-grid ``ChebyshevApproximation``.
    bounds : (B, d, 2) boxes inside the shared domain.
    dtype : None (f64 parity), ``jnp.float32`` (throughput tier), or
        ``"dd"`` — the near-f64 digit-GEMM tier (shared quadrature row
        planes, one exact GEMM ladder per model; falls back to f64
        outside the digit budget).
    """
    from pychebyshev_tpu.models.approximation import (
        ChebyshevApproximation,
    )
    from pychebyshev_tpu.ops.integrate import (
        integrate_box_batch_models,
        integrate_box_batch_models_dd,
    )
    from pychebyshev_tpu.utils.calculus import normalize_bounds_batch

    models = list(models)
    if not models:
        raise ValueError("models must be a non-empty sequence")
    first = models[0]
    for i, m in enumerate(models):
        if not isinstance(m, ChebyshevApproximation):
            raise TypeError(
                f"models[{i}] is {type(m).__name__}; integrate_book "
                f"takes a dense book")
        if m.tensor_values is None:
            raise RuntimeError("all models must be built")
        if i and (list(m.n_nodes) != list(first.n_nodes)
                  or [list(b) for b in m.domain]
                  != [list(b) for b in first.domain]):
            raise ValueError(
                f"models[{i}] grid (n_nodes/domain) differs from "
                f"models[0]; a book shares one grid")
    arr = normalize_bounds_batch(bounds, first.domain)
    if isinstance(dtype, str) and dtype == "dd":
        from pychebyshev_tpu.ops.eval_dd import supports_dd
        if supports_dd(tuple(int(n) for n in first.n_nodes)):
            out = integrate_box_batch_models_dd(
                tuple(m.tensor_values for m in models),
                np.asarray(first.domain, dtype=np.float64), arr)
            return np.asarray(out)
        dtype = None    # documented fallback outside the budget
    out = integrate_box_batch_models(
        tuple(m.tensor_values for m in models),
        np.asarray(first.domain, dtype=np.float64), arr,
        dtype=(jnp.float64 if dtype is None else dtype))
    return np.asarray(out)


def save_book(path, models) -> None:
    """Checkpoint a same-grid dense book to ONE pickle-free ``.npz``.

    Stores the shared grid once and stacks the M tensors into a single
    array; :func:`load_book` reconstructs M grid-sharing models.  See
    :func:`~pychebyshev_tpu.utils.native_save.write_book_npz`.
    """
    from pychebyshev_tpu.utils.native_save import write_book_npz
    write_book_npz(path, models)


def load_book(path):
    """Load a dense book saved by :func:`save_book` (grid-sharing
    models, validated through ``from_values``)."""
    from pychebyshev_tpu.utils.native_save import read_book_npz
    return read_book_npz(path)
