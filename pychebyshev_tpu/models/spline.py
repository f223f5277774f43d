"""ChebyshevSpline: piecewise Chebyshev interpolation at user knots.

API-parity target: reference ``spline.py`` (class ``ChebyshevSpline``,
2226 lines).  Partitions the domain at interior knots into a Cartesian
product of pieces, each an independent
:class:`~pychebyshev_tpu.models.approximation.ChebyshevApproximation`,
restoring spectral convergence across kinks/discontinuities
(Ruiz & Zeron 2021, §3.8).

TPU notes: each piece's tensors live on device; ``eval_batch`` routes
points to pieces with a vectorized ``searchsorted`` and issues one fused
batched kernel per *occupied* piece, so large batches still run as a
handful of device calls.  Piece routing itself is host logic (tiny,
shape-determining).
"""

from __future__ import annotations

import itertools
import os
import pickle
import time
import warnings
from typing import List, Tuple

import numpy as np

from pychebyshev_tpu.models.approximation import ChebyshevApproximation
from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL

__all__ = ["ChebyshevSpline", "is_nested_n_nodes"]


def route_points_to_pieces(knots, piece_shape, points) -> np.ndarray:
    """Flat C-order piece index per point — THE routing convention.

    One definition shared by ``eval_batch`` routing and ``fit`` so the
    point-to-piece convention (``searchsorted side='right'`` — a point
    on a knot belongs to the right piece — clipped at the edges)
    cannot drift between fitting and evaluation.
    """
    n = points.shape[0]
    d = len(piece_shape)
    multi_indices = np.zeros((n, d), dtype=int)
    for dim in range(d):
        if len(knots[dim]) > 0:
            multi_indices[:, dim] = np.searchsorted(
                knots[dim], points[:, dim], side="right")
            np.clip(multi_indices[:, dim], 0, piece_shape[dim] - 1,
                    out=multi_indices[:, dim])
    return np.ravel_multi_index(multi_indices.T, piece_shape)


def is_nested_n_nodes(n_nodes) -> bool:
    """True if n_nodes is in nested (per-sub-interval) form."""
    return n_nodes is not None and any(
        isinstance(x, (list, tuple)) for x in n_nodes
    )


class ChebyshevSpline:
    """Piecewise Chebyshev interpolation with user-specified knots.

    Parameters mirror the reference ctor (``spline.py:106-267``):
    flat or nested (per-piece) ``n_nodes``, per-dim ``knots``, auto-N via
    ``error_threshold``, ``defer_build``.  The extra ``vectorized`` kwarg
    is forwarded to each piece for single-call TPU builds.
    """

    def __init__(self, function, num_dimensions, domain, n_nodes=None,
                 knots=None, max_derivative_order=2, error_threshold=None,
                 max_n=64, additional_data=None, *, defer_build=False,
                 n_workers=None, vectorized=False):
        from pychebyshev_tpu import Domain, Ns
        from pychebyshev_tpu.utils.parallel_build import normalize_n_workers

        if isinstance(domain, Domain):
            domain = list(domain.bounds)
        if isinstance(n_nodes, Ns):
            n_nodes = list(n_nodes.counts)

        self.function = function
        self.num_dimensions = num_dimensions
        self.domain = [list(b) for b in domain]
        self.error_threshold = error_threshold
        if max_n < 3:
            raise ValueError(
                f"max_n must be at least 3 (the initial N of the doubling "
                f"loop), got max_n={max_n}. For a grid smaller than 3 per "
                f"dimension, pass n_nodes explicitly instead of using "
                f"error-threshold auto-calibration."
            )
        self.max_n = max_n
        self.n_workers = normalize_n_workers(n_workers)
        self.vectorized = bool(vectorized)

        # Normalize n_nodes (None entries = auto).
        if n_nodes is None:
            if error_threshold is None:
                raise ValueError(
                    "Must provide either n_nodes (explicit) or "
                    "error_threshold (auto-N). Got neither."
                )
            n_nodes = [None] * num_dimensions
        else:
            n_nodes = list(n_nodes)
            if any(n is None for n in n_nodes) and error_threshold is None:
                raise ValueError(
                    "None entries in n_nodes require error_threshold to be "
                    "set (auto-N mode)."
                )

        self._n_nodes_nested = is_nested_n_nodes(n_nodes)
        if self._n_nodes_nested:
            if not all(isinstance(x, (list, tuple)) for x in n_nodes):
                raise ValueError(
                    "n_nodes must be fully nested (all dims as lists) when "
                    "any dim is nested; got mixed form"
                )

        self.n_nodes = n_nodes
        if knots is None:
            knots = [[] for _ in range(num_dimensions)]
        self.knots = [list(k) for k in knots]
        self.max_derivative_order = max_derivative_order
        self.additional_data = additional_data
        self._derivative_id_registry: dict = {}
        self._derivative_id_to_orders: list = []
        self.descriptor: str = ""

        # Validate knots: strictly inside domain, sorted.
        for d in range(num_dimensions):
            lo, hi = domain[d]
            for k in self.knots[d]:
                if not (lo < k < hi):
                    raise ValueError(
                        f"Knot {k} for dimension {d} is not strictly "
                        f"inside domain [{lo}, {hi}]"
                    )
            if self.knots[d] != sorted(self.knots[d]):
                raise ValueError(f"Knots for dimension {d} must be sorted")
            if len(set(self.knots[d])) != len(self.knots[d]):
                # Duplicates pass the sorted check but create a
                # zero-width piece that only fails much later inside
                # the piece build — match the nodes()/from_values and
                # special-points paths, which reject them up front.
                raise ValueError(
                    f"Knots for dimension {d} contain duplicates")

        # Per-dimension sub-intervals and the piece-grid shape.
        self._intervals: List[List[Tuple[float, float]]] = []
        for d in range(num_dimensions):
            lo, hi = domain[d]
            edges = [lo] + list(self.knots[d]) + [hi]
            self._intervals.append(
                [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]
            )
        self._shape = tuple(len(iv) for iv in self._intervals)

        # Nested-form per-dim length validation.
        if self._n_nodes_nested:
            for d in range(num_dimensions):
                expected = len(self.knots[d]) + 1
                if len(n_nodes[d]) != expected:
                    raise ValueError(
                        f"n_nodes[{d}] must have {expected} entries "
                        f"(one per sub-interval); got {len(n_nodes[d])}"
                    )
                inner = list(n_nodes[d])
                if any(x is None for x in inner) and error_threshold is None:
                    raise ValueError(
                        "None entries in nested n_nodes require "
                        "error_threshold to be set (auto-N mode)."
                    )
                n_nodes[d] = inner
            self.n_nodes = n_nodes

        self._pieces: List[ChebyshevApproximation | None] = (
            [None] * int(np.prod(self._shape))
        )
        self._built = False
        self._build_time = 0.0
        self._cached_error_estimate = None

        if defer_build:
            if function is not None:
                raise ValueError(
                    "defer_build=True requires function=None (the "
                    "deferred-construction workflow expects values to be "
                    "supplied via set_original_function_values() later)"
                )
            for flat_idx, multi_idx in enumerate(
                itertools.product(*[range(s) for s in self._shape])
            ):
                sub_domain = [list(self._intervals[d][multi_idx[d]])
                              for d in range(self.num_dimensions)]
                piece_n = self._piece_n_nodes(multi_idx)
                self._pieces[flat_idx] = ChebyshevApproximation(
                    None, self.num_dimensions, sub_domain, piece_n,
                    max_derivative_order=self.max_derivative_order,
                    additional_data=self.additional_data,
                    defer_build=True, n_workers=self.n_workers,
                )

    def _piece_n_nodes(self, multi_idx):
        if self._n_nodes_nested:
            return [self.n_nodes[d][multi_idx[d]]
                    for d in range(self.num_dimensions)]
        return list(self.n_nodes)

    # ------------------------------------------------------------------
    # Build / deferred construction
    # ------------------------------------------------------------------

    def set_original_function_values(self, per_piece_values) -> None:
        """Fill every piece's tensor atomically (all validated first)."""
        if len(per_piece_values) != len(self._pieces):
            raise ValueError(
                f"expected {len(self._pieces)} piece tensors, "
                f"got {len(per_piece_values)}"
            )
        validated = []
        for i, (piece, vals) in enumerate(zip(self._pieces,
                                              per_piece_values)):
            if piece is None:
                raise RuntimeError(f"piece {i} is None — invalid state")
            if piece.tensor_values is not None:
                raise RuntimeError(
                    f"piece {i} is already constructed; "
                    "set_original_function_values() is for defer_build=True "
                    "splines"
                )
            arr = np.asarray(vals, dtype=np.float64)
            expected_shape = tuple(piece.n_nodes)
            if arr.shape != expected_shape:
                raise ValueError(
                    f"piece {i}: values shape {arr.shape} does not match "
                    f"expected {expected_shape}"
                )
            if not np.isfinite(arr).all():
                raise ValueError(
                    f"piece {i}: values contains NaN or Inf (must be finite)"
                )
            validated.append(arr)
        from pychebyshev_tpu.models.approximation import (
            _private_device_f64,
        )
        for piece, arr in zip(self._pieces, validated):
            # Same fill discipline as the dense class: the zero-copy
            # aliasing guard plus host-cache seeding (skipping the
            # seed forced a device readback on each piece's first
            # single-point eval).
            piece.tensor_values = _private_device_f64(arr)
            piece._offer_host_tensor(arr)
            piece.function = None
        self._built = True
        self.function = None

    def build(self, verbose: bool | int = True) -> None:
        """Build every piece on its sub-domain."""
        if self.function is None:
            raise RuntimeError(
                "Cannot build: no function assigned. "
                "This object was created via from_values() or load()."
            )
        start = time.time()
        self._cached_error_estimate = None
        total_pieces = int(np.prod(self._shape))

        if verbose:
            if self._n_nodes_nested:
                has_auto = any(any(n is None for n in self.n_nodes[d])
                               for d in range(self.num_dimensions))
            else:
                has_auto = any(n is None for n in self.n_nodes)
            if has_auto:
                print(f"Building {self.num_dimensions}D Chebyshev Spline "
                      f"({total_pieces} pieces, auto-N per piece with "
                      f"error_threshold={self.error_threshold:.2e})...")
            else:
                print(f"Building {self.num_dimensions}D Chebyshev Spline "
                      f"({total_pieces} pieces, "
                      f"{self.total_build_evals:,} total evaluations)...")

        from pychebyshev_tpu.utils.progress import progress_iter
        piece_indices = list(
            itertools.product(*[range(s) for s in self._shape]))
        for flat_idx, multi_idx in enumerate(progress_iter(
                piece_indices, total=total_pieces,
                enabled=(verbose == 2), desc="Building spline pieces")):
            sub_domain = [list(self._intervals[d][multi_idx[d]])
                          for d in range(self.num_dimensions)]
            piece = ChebyshevApproximation(
                self.function, self.num_dimensions, sub_domain,
                self._piece_n_nodes(multi_idx),
                max_derivative_order=self.max_derivative_order,
                error_threshold=self.error_threshold, max_n=self.max_n,
                additional_data=self.additional_data,
                n_workers=self.n_workers, vectorized=self.vectorized,
            )
            piece.build(verbose=False)
            self._pieces[flat_idx] = piece
            if verbose:
                print(f"  Piece {flat_idx + 1}/{total_pieces}: "
                      f"domain {sub_domain}, n_nodes={piece.n_nodes}")

        self._build_time = time.time() - start
        self._built = True
        # Auto-N resolution: when every piece's doubling loop landed on
        # the same counts, record them as the flat n_nodes (algebra,
        # get_used_ns, binary save, and the masked batch path all
        # consume it; [None,...] sentinels would break each).  Pieces
        # that resolved differently keep the sentinels — the per-piece
        # routing paths handle them, and _masked_gate() keeps such
        # splines off the stacked kernels.
        if (self.error_threshold is not None
                and not is_nested_n_nodes(self.n_nodes)
                and any(n is None for n in self.n_nodes)):
            counts = {tuple(p.n_nodes) for p in self._pieces}
            if len(counts) == 1:
                self.n_nodes = [int(n) for n in counts.pop()]
        if verbose:
            print(f"Build complete in {self._build_time:.3f}s")

    # ------------------------------------------------------------------
    # Piece routing + evaluation
    # ------------------------------------------------------------------

    def _pieces_stackable(self) -> bool:
        """Whether the fused masked kernels may stack the pieces: flat
        n_nodes spelling AND actually-homogeneous piece grids — an
        auto-N build can resolve pieces to different counts even under
        a flat spelling, and jnp.stack would crash on them."""
        if is_nested_n_nodes(self.n_nodes):
            return False
        return len({tuple(p.n_nodes) for p in self._pieces}) == 1

    def _find_piece(self, point):
        """(flat_idx, piece) containing *point*.  A point exactly at a
        knot routes to the right piece (searchsorted side='right')."""
        multi_idx = []
        for d in range(self.num_dimensions):
            if len(self.knots[d]) == 0:
                multi_idx.append(0)
            else:
                idx = int(np.searchsorted(self.knots[d], point[d],
                                          side="right"))
                multi_idx.append(min(idx, self._shape[d] - 1))
        flat = int(np.ravel_multi_index(multi_idx, self._shape))
        return flat, self._pieces[flat]

    def get_derivative_id(self, derivative_order) -> int:
        """Stable session-local id for a derivative-orders tuple."""
        from pychebyshev_tpu.utils.derivative_ids import (
            register_derivative_id,
        )
        return register_derivative_id(self, derivative_order)

    def _resolve_derivative_args(self, derivative_order, derivative_id):
        """Resolve orders xor id; raises on both/neither/unknown."""
        from pychebyshev_tpu.utils.derivative_ids import (
            resolve_derivative_args,
        )
        return resolve_derivative_args(self, derivative_order,
                                       derivative_id)

    def _check_knot_boundary(self, point, derivative_order) -> None:
        """Derivatives at a knot are ill-defined (left/right differ)."""
        if all(d == 0 for d in derivative_order):
            return
        for d in range(self.num_dimensions):
            if derivative_order[d] > 0:
                for k in self.knots[d]:
                    if abs(point[d] - k) < NODE_COINCIDENCE_TOL:
                        raise ValueError(
                            f"Derivative w.r.t. dimension {d} is not "
                            f"defined at knot x[{d}]={k}. The left and "
                            f"right derivatives may differ at this point."
                        )

    def eval(self, point, derivative_order=None, *, derivative_id=None):
        """Evaluate at a point (routes to the containing piece)."""
        if not self._built:
            raise RuntimeError("Call build() before eval().")
        derivative_order = self._resolve_derivative_args(
            derivative_order, derivative_id)
        self._check_knot_boundary(point, derivative_order)
        _, piece = self._find_piece(point)
        return piece.vectorized_eval(point, derivative_order)

    def eval_multi(self, point, derivative_orders):
        """Multiple derivative specs at one point (shared weights)."""
        if not self._built:
            raise RuntimeError("Call build() before eval_multi().")
        for do in derivative_orders:
            self._check_knot_boundary(point, do)
        _, piece = self._find_piece(point)
        return piece.vectorized_eval_multi(point, derivative_orders)

    def eval_batch(self, points, derivative_order=None, *,
                   derivative_id=None):
        """Batched evaluation.

        Flat-``n_nodes`` splines with a small piece count run the fused
        masked device path (``ops.spline_eval``): every piece evaluates
        the whole batch in ONE vmapped dispatch and on-device routing
        selects each point's own piece — P x the dense kernel's work,
        but dispatch-count-free (measured ~50-100x over host routing on
        a relayed TPU at P=2).  Nested grids and large piece counts use
        the host-routed path: one vectorized ``searchsorted`` per dim,
        one fused call per occupied piece.
        """
        if not self._built:
            raise RuntimeError("Call build() before eval_batch().")
        derivative_order = self._resolve_derivative_args(
            derivative_order, derivative_id)
        points = np.asarray(points, dtype=float)

        from pychebyshev_tpu.ops import spline_eval
        if (self._pieces_stackable()
                and len(self._pieces)
                <= spline_eval.MASKED_MAX_PIECES_F64):
            stacked, strides = self._masked_arrays()
            tensors, nodes, weights, diffs = stacked
            flat = spline_eval.route_piece_indices(
                self.knots, strides, points)
            out = spline_eval.masked_eval_batch(
                tensors, nodes, weights, diffs, flat, points,
                tuple(int(o) for o in derivative_order))
            return np.asarray(out)

        n = points.shape[0]
        results = np.empty(n)
        flat_indices = self._route_batch(points)
        for piece_idx in np.unique(flat_indices):
            mask = flat_indices == piece_idx
            results[mask] = self._pieces[piece_idx].vectorized_eval_batch(
                points[mask], derivative_order)
        return results

    def eval_batch_dd(self, points, derivative_order=None,
                      mode: str = "accurate") -> np.ndarray:
        """Near-f64 batched evaluation via per-piece digit GEMMs.

        Points route to their pieces on host (f64, same routing as
        :meth:`eval_batch`), then each occupied piece evaluates its
        group through the dense digit-GEMM tier
        (``ChebyshevApproximation.eval_batch_dd``) — f64-class accuracy
        without software f64.  Pieces outside the digit-plan budget,
        and out-of-domain batches, fall back to the f64 path per piece.
        """
        if not self._built:
            raise RuntimeError("Call build() before eval_batch_dd().")
        if mode not in ("accurate", "fast"):
            raise ValueError(
                f"mode must be 'accurate' or 'fast', got {mode!r}")
        if derivative_order is None:
            derivative_order = [0] * self.num_dimensions
        if len(derivative_order) != self.num_dimensions:
            raise ValueError(
                f"derivative_order length {len(derivative_order)} does "
                f"not match num_dimensions {self.num_dimensions}"
            )
        points = np.asarray(points, dtype=float)
        results = np.empty(points.shape[0])
        flat_indices = self._route_batch(points)
        for piece_idx in np.unique(flat_indices):
            mask = flat_indices == piece_idx
            results[mask] = np.asarray(
                self._pieces[piece_idx].eval_batch_dd(
                    points[mask], derivative_order, mode=mode))
        return results

    def _masked_arrays(self):
        """Stacked per-piece grid arrays + piece strides, cached.

        The cache holds strong references to the keyed piece tensors
        and validates with ``is`` — immutable arrays + attribute
        rebinding make that sound (id()-keyed caches could go stale
        through id reuse after GC).  Strides are build-time constants
        cached alongside.
        """
        from pychebyshev_tpu.ops import spline_eval
        key = tuple(p.tensor_values for p in self._pieces)
        cache = getattr(self, "_masked_cache", None)
        if (cache is None or len(cache[0]) != len(key)
                or any(a is not b for a, b in zip(cache[0], key))):
            cache = (
                key,
                spline_eval.stack_pieces(self._pieces),
                spline_eval.piece_strides(
                    [len(k) for k in self.knots]),
            )
            self._masked_cache = cache
        _, stacked, strides = cache
        return stacked, strides

    def _route_batch(self, points: np.ndarray) -> np.ndarray:
        """Vectorized host routing: flat C-order piece index per point."""
        return route_points_to_pieces(self.knots, self._shape, points)

    def vectorized_eval_batch_multi(self, points, derivative_orders):
        """Batch x multi-spec evaluation -> (N, len(derivative_orders)).

        The spline Greek-set call: flat-grid splines run every piece
        and every derivative spec in ONE fused dispatch
        (``ops.spline_eval.masked_eval_batch_multi`` — per-piece rows
        built once and shared across specs); nested grids and large
        piece counts group points by piece and run each piece's fused
        multi-spec kernel.  Knot semantics match ``eval_batch``: points
        on a knot take the right piece's one-sided derivatives.
        """
        if not self._built:
            raise RuntimeError(
                "Call build() before vectorized_eval_batch_multi()."
            )
        orders_list = tuple(tuple(int(o) for o in orders)
                            for orders in derivative_orders)
        for orders in orders_list:
            if len(orders) != self.num_dimensions:
                raise ValueError(
                    f"derivative_order length {len(orders)} does not "
                    f"match num_dimensions {self.num_dimensions}"
                )
        points = np.asarray(points, dtype=float)
        if not orders_list:
            return np.zeros((points.shape[0], 0))

        from pychebyshev_tpu.ops import spline_eval
        if (self._pieces_stackable()
                and len(self._pieces)
                <= spline_eval.MASKED_MAX_PIECES_F64):
            stacked, strides = self._masked_arrays()
            tensors, nodes, weights, diffs = stacked
            flat = spline_eval.route_piece_indices(
                self.knots, strides, points)
            out = spline_eval.masked_eval_batch_multi(
                tensors, nodes, weights, diffs, flat, points,
                orders_list)
            return np.asarray(out).T

        n = points.shape[0]
        results = np.empty((n, len(orders_list)))
        flat_indices = self._route_batch(points)
        for piece_idx in np.unique(flat_indices):
            mask = flat_indices == piece_idx
            results[mask] = self._pieces[
                piece_idx].vectorized_eval_batch_multi(
                    points[mask], orders_list)
        return results

    # Reference-compatible aliases matching the Approximation surface.
    vectorized_eval = eval
    vectorized_eval_multi = eval_multi
    vectorized_eval_batch = eval_batch
    eval_batch_multi = vectorized_eval_batch_multi

    # ------------------------------------------------------------------
    # Error estimation + sensitivity
    # ------------------------------------------------------------------

    def error_estimate(self, tail: int = 1) -> float:
        """Max over pieces (disjoint sub-domains -> worst case governs).

        ``tail=2`` threads the parity-robust variant through every
        piece (see ChebyshevApproximation.error_estimate)."""
        if not self._built:
            raise RuntimeError("Call build() before error_estimate().")
        if tail == 1 and self._cached_error_estimate is not None:
            return self._cached_error_estimate
        est = max(piece.error_estimate(tail) for piece in self._pieces)
        if tail == 1:
            self._cached_error_estimate = est
        return est

    def sobol_indices(self) -> dict:
        """Per-piece Sobol indices aggregated by volume x variance."""
        from pychebyshev_tpu.utils.sensitivity import (
            chebyshev_coefficient_tensor,
            sobol_from_coeffs,
        )
        if not self._built:
            raise RuntimeError("Call build() first")

        total_variance = 0.0
        first_energy = {d: 0.0 for d in range(self.num_dimensions)}
        total_energy = {d: 0.0 for d in range(self.num_dimensions)}

        for piece in self._pieces:
            if piece is None:
                continue
            vol = 1.0
            for d in range(self.num_dimensions):
                lo, hi = piece.domain[d]
                vol *= (hi - lo)
            coeffs = chebyshev_coefficient_tensor(piece.tensor_values)
            res = sobol_from_coeffs(coeffs, self.num_dimensions)
            total_variance += vol * res["variance"]
            for d in range(self.num_dimensions):
                first_energy[d] += vol * res["first_order"][d] * res["variance"]
                total_energy[d] += vol * res["total_order"][d] * res["variance"]

        if total_variance == 0:
            zeros = {d: 0.0 for d in range(self.num_dimensions)}
            return {"first_order": dict(zeros), "total_order": dict(zeros),
                    "variance": 0.0}
        return {
            "first_order": {d: first_energy[d] / total_variance
                            for d in range(self.num_dimensions)},
            "total_order": {d: total_energy[d] / total_variance
                            for d in range(self.num_dimensions)},
            "variance": total_variance,
        }

    def interaction_matrix(self) -> np.ndarray:
        """(d, d) pure pairwise Sobol interaction shares, aggregated
        over pieces by volume x variance like :meth:`sobol_indices`
        (beyond reference, matching the dense/TT/slider surface)."""
        from pychebyshev_tpu.utils.sensitivity import (
            chebyshev_coefficient_tensor,
            pair_interactions_from_coeffs,
        )
        if not self._built:
            raise RuntimeError("Call build() first")
        d = self.num_dimensions
        out = np.zeros((d, d))
        total_variance = 0.0
        for piece in self._pieces:
            if piece is None:
                continue
            vol = float(np.prod([hi - lo for lo, hi in piece.domain]))
            coeffs = chebyshev_coefficient_tensor(piece.tensor_values)
            pairs, variance = pair_interactions_from_coeffs(
                coeffs, d, return_variance=True)
            total_variance += vol * variance
            out += vol * variance * pairs
        if total_variance <= 0:
            return np.zeros((d, d))
        return out / total_variance

    def suggest_partition(self, threshold: float = 1e-8) -> list:
        """Additive partition implied by :meth:`interaction_matrix`
        (union-find over above-threshold pairs; beyond reference)."""
        from pychebyshev_tpu.utils.sensitivity import (
            partition_from_interactions,
        )
        return partition_from_interactions(self.interaction_matrix(),
                                           threshold)
    # ------------------------------------------------------------------
    # Properties
    # ------------------------------------------------------------------

    @property
    def num_pieces(self) -> int:
        """Total pieces (Cartesian product of per-dim interval counts)."""
        return int(np.prod(self._shape))

    @property
    def total_build_evals(self) -> int:
        """Total function evaluations across pieces (0 if unknowable)."""
        if self._built:
            return sum(int(p.n_evaluations) for p in self._pieces)
        if self._n_nodes_nested:
            total = 0
            for multi_idx in itertools.product(
                    *[range(s) for s in self._shape]):
                piece_n = self._piece_n_nodes(multi_idx)
                if any(n is None for n in piece_n):
                    return 0
                total += int(np.prod(piece_n))
            return total
        if any(n is None for n in self.n_nodes):
            return 0
        return int(np.prod(self.n_nodes)) * int(np.prod(self._shape))

    @property
    def build_time(self) -> float:
        """Wall-clock seconds of the most recent build()."""
        return self._build_time

    # ------------------------------------------------------------------
    # Serialization
    # ------------------------------------------------------------------

    def __getstate__(self) -> dict:
        from pychebyshev_tpu._version import __version__
        state = self.__dict__.copy()
        state["function"] = None
        state.pop("_masked_cache", None)   # device-array cache, rebuilt
        state["_pychebyshev_version"] = __version__
        return state

    def __setstate__(self, state: dict) -> None:
        from pychebyshev_tpu._version import __version__
        saved = state.pop("_pychebyshev_version", None)
        if saved is not None and saved != __version__:
            warnings.warn(
                f"This object was saved with pychebyshev-tpu {saved}, but "
                f"you are loading it with {__version__}. Evaluation results "
                f"may differ if internal data layout changed.",
                UserWarning,
                stacklevel=2,
            )
        self.__dict__.update(state)
        self.function = None
        defaults = {
            "_cached_error_estimate": None,
            "descriptor": "",
            "additional_data": None,
            "n_workers": None,
            "vectorized": False,
            "max_derivative_order": 2,
            "_derivative_id_registry": {},
            "_derivative_id_to_orders": [],
        }
        for key, val in defaults.items():
            if not hasattr(self, key):
                setattr(self, key, val)
        if not hasattr(self, "_n_nodes_nested"):
            self._n_nodes_nested = is_nested_n_nodes(self.n_nodes)

    def is_construction_finished(self) -> bool:
        """True iff this spline is built and usable."""
        return self._built

    def get_constructor_type(self) -> str:
        """Class name."""
        return type(self).__name__

    def get_used_ns(self) -> list:
        """Per-dim n_nodes preserving nested vs flat shape."""
        return [list(piece) if isinstance(piece, list) else piece
                for piece in self.n_nodes]

    def set_descriptor(self, descriptor: str) -> None:
        """Attach a free-form text label."""
        if not isinstance(descriptor, str):
            raise TypeError(
                f"descriptor must be str, got {type(descriptor).__name__}"
            )
        self.descriptor = descriptor

    def get_descriptor(self) -> str:
        """The descriptor label (default '')."""
        return self.descriptor

    def get_max_derivative_order(self) -> int:
        """Maximum queryable derivative order."""
        return self.max_derivative_order

    @staticmethod
    def is_dimensionality_allowed(num_dimensions: int) -> bool:
        """Whether this class supports ``num_dimensions`` (any >= 1)."""
        return isinstance(num_dimensions, int) and num_dimensions >= 1

    def get_error_threshold(self):
        """The error_threshold ctor kwarg, or None."""
        return self.error_threshold

    def get_num_evaluation_points(self) -> int:
        """Grid points summed across pieces."""
        return int(sum(int(np.prod(p.n_nodes)) for p in self._pieces))

    def get_evaluation_points(self) -> np.ndarray:
        """Concatenated per-piece grids (pieces in C-order)."""
        return np.concatenate(
            [p.get_evaluation_points() for p in self._pieces], axis=0)

    def clone(self) -> "ChebyshevSpline":
        """Independent deep copy (function not duplicated)."""
        import copy
        return copy.deepcopy(self)

    def get_special_points(self):
        """Per-dimension knot/kink locations."""
        return self.knots

    def save(self, path: str | os.PathLike, format: str = "pickle") -> None:
        """Save to pickle (default) or .pcb binary (flat n_nodes only)."""
        if not self._built:
            raise RuntimeError(
                "Cannot save an unbuilt ChebyshevSpline. Call build() first."
            )
        if format == "pickle":
            with open(path, "wb") as f:
                pickle.dump(self, f, protocol=pickle.HIGHEST_PROTOCOL)
        elif format == "binary":
            from pychebyshev_tpu.utils import binary
            with open(path, "wb") as f:
                binary.write_spline(f, self)
        elif format == "npz":
            from pychebyshev_tpu.utils.native_save import write_npz
            write_npz(path, self)
        else:
            raise ValueError(
                f"format must be 'pickle', 'binary', or 'npz'; "
                f"got {format!r}"
            )

    @classmethod
    def load(cls, path: str | os.PathLike) -> "ChebyshevSpline":
        """Load from pickle, .pcb, or .npz (magic-sniffed)."""
        from pychebyshev_tpu.utils import binary
        from pychebyshev_tpu.utils import native_save
        if binary.detect_format(path) == "binary":
            with open(path, "rb") as f:
                return binary.read_spline(f)
        if native_save.detect_npz(path):
            obj = native_save.read_npz(path)
            if not isinstance(obj, cls):
                raise TypeError(
                    f"Expected a {cls.__name__} checkpoint, got "
                    f"{type(obj).__name__}"
                )
            return obj
        with open(path, "rb") as f:
            obj = pickle.load(f)  # noqa: S301
        if not isinstance(obj, cls):
            raise TypeError(
                f"Expected a {cls.__name__} instance, got "
                f"{type(obj).__name__}"
            )
        return obj

    # ------------------------------------------------------------------
    # Deferred-values workflow
    # ------------------------------------------------------------------

    @staticmethod
    def nodes(num_dimensions, domain, n_nodes, knots) -> dict:
        """Per-piece grid info (flat n_nodes only)."""
        if is_nested_n_nodes(n_nodes):
            raise NotImplementedError(
                "ChebyshevSpline.nodes() accepts only flat n_nodes "
                "(one int per dim, shared across pieces). Nested "
                "per-sub-interval n_nodes is supported via __init__ "
                "but not via the nodes()/from_values() workflow. "
                "See docs/user-guide/special-points.md."
            )
        ChebyshevSpline._validate_domain_knots(num_dimensions, domain, knots)

        intervals = ChebyshevSpline._compute_intervals(
            num_dimensions, domain, knots)
        piece_shape = tuple(len(iv) for iv in intervals)
        pieces_info = []
        for multi_idx in np.ndindex(*piece_shape):
            sub_domain = [intervals[d][multi_idx[d]]
                          for d in range(num_dimensions)]
            piece_nodes = ChebyshevApproximation.nodes(
                num_dimensions, [list(sd) for sd in sub_domain], n_nodes)
            pieces_info.append({
                "piece_index": multi_idx,
                "sub_domain": sub_domain,
                "nodes_per_dim": piece_nodes["nodes_per_dim"],
                "full_grid": piece_nodes["full_grid"],
                "shape": piece_nodes["shape"],
            })
        return {
            "pieces": pieces_info,
            "num_pieces": int(np.prod(piece_shape)),
            "piece_shape": piece_shape,
        }

    @staticmethod
    def _validate_domain_knots(num_dimensions, domain, knots):
        for d in range(num_dimensions):
            lo, hi = domain[d]
            if lo >= hi:
                raise ValueError(
                    f"domain[{d}]: lo={lo} must be strictly less than "
                    f"hi={hi}"
                )
            for k in knots[d]:
                if not (lo < k < hi):
                    raise ValueError(
                        f"Knot {k} for dimension {d} is not strictly "
                        f"inside domain [{lo}, {hi}]"
                    )
            if list(knots[d]) != sorted(knots[d]):
                raise ValueError(f"Knots for dimension {d} must be sorted")
            if len(knots[d]) != len(set(knots[d])):
                raise ValueError(
                    f"Knots for dimension {d} contain duplicates"
                )

    @staticmethod
    def _compute_intervals(num_dimensions, domain, knots):
        intervals = []
        for d in range(num_dimensions):
            lo, hi = domain[d]
            edges = [lo] + list(knots[d]) + [hi]
            intervals.append(
                [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]
            )
        return intervals

    @classmethod
    def from_values(cls, piece_values, num_dimensions, domain, n_nodes,
                    knots, max_derivative_order: int = 2) -> "ChebyshevSpline":
        """Fully-built spline from per-piece pre-computed values."""
        if is_nested_n_nodes(n_nodes):
            raise NotImplementedError(
                "ChebyshevSpline.from_values() accepts only flat n_nodes "
                "(one int per dim, shared across pieces). Nested "
                "per-sub-interval n_nodes is supported via __init__ "
                "but not via the nodes()/from_values() workflow. "
                "See docs/user-guide/special-points.md."
            )
        cls._validate_domain_knots(num_dimensions, domain, knots)

        intervals = cls._compute_intervals(num_dimensions, domain, knots)
        piece_shape = tuple(len(iv) for iv in intervals)
        total_pieces = int(np.prod(piece_shape))
        if len(piece_values) != total_pieces:
            raise ValueError(
                f"Expected {total_pieces} piece_values, got "
                f"{len(piece_values)}"
            )
        expected_shape = tuple(n_nodes)
        for flat_idx, pv in enumerate(piece_values):
            if np.asarray(pv).shape != expected_shape:
                raise ValueError(
                    f"piece_values[{flat_idx}] has shape "
                    f"{np.asarray(pv).shape}, expected {expected_shape}"
                )

        pieces = []
        for flat_idx, multi_idx in enumerate(np.ndindex(*piece_shape)):
            sub_domain = [list(intervals[d][multi_idx[d]])
                          for d in range(num_dimensions)]
            pieces.append(ChebyshevApproximation.from_values(
                piece_values[flat_idx], num_dimensions, sub_domain, n_nodes,
                max_derivative_order=max_derivative_order))

        obj = object.__new__(cls)
        obj.function = None
        obj.num_dimensions = num_dimensions
        obj.domain = [list(b) for b in domain]
        obj.n_nodes = list(n_nodes)
        obj._n_nodes_nested = False
        obj.max_derivative_order = max_derivative_order
        obj.error_threshold = None
        obj.max_n = 64
        obj.knots = [list(k) for k in knots]
        obj._intervals = intervals
        obj._shape = piece_shape
        obj._pieces = pieces
        obj._built = True
        obj._build_time = 0.0
        obj._cached_error_estimate = None
        obj.descriptor = ""
        obj.additional_data = None
        obj.n_workers = None
        obj.vectorized = False
        obj._derivative_id_registry = {}
        obj._derivative_id_to_orders = []
        return obj

    @classmethod
    def fit(cls, points, values, num_dimensions, domain, n_nodes, knots,
            *, l2: float = 0.0, sample_weight=None, rcond=None,
            derivative_data=None, engine: str = "host",
            mesh=None, data_axis: str = "dp",
            max_derivative_order: int = 2) -> "ChebyshevSpline":
        """Least-squares spline from SCATTERED samples (kinked data).

        The spline counterpart of
        :meth:`ChebyshevApproximation.fit` (beyond reference): points
        route to their pieces exactly like ``eval_batch`` (a point on
        a knot belongs to the right piece) and each piece solves its
        own independent linear least-squares fit over its sub-domain
        (`utils/fitting.py`) — pieces never see each other's samples,
        which is what lets the result capture a kink the samples
        straddle.  Flat ``n_nodes`` only (as ``from_values``).

        Every piece must contain samples (and at least
        ``prod(n_nodes)`` of them when ``l2 == 0``) — a clear
        ``ValueError`` names the starved piece otherwise.

        Returns a fully-built spline; ``fit_diagnostics`` aggregates
        the overall training rms plus one per-piece diagnostics dict.

        ``derivative_data`` blocks (gradient-enhanced fitting, as in
        the dense :meth:`ChebyshevApproximation.fit`) route to pieces
        exactly like the value samples (a derivative observed ON a
        knot informs the right piece — the batched one-sided
        convention); each piece fits its own sub-blocks.  Value
        samples alone decide piece starvation: a piece seen only by
        derivative rows is constant-indeterminate, so the usual
        "received no samples" error still fires for it.

        ``engine`` / ``mesh`` / ``data_axis`` forward to every piece's
        dense solve (see :meth:`ChebyshevApproximation.fit`): the f32
        or exact-dd device accumulation tier, optionally dp-sharded.
        """
        from pychebyshev_tpu.utils.fitting import (
            fit_dense_tensor,
            normalize_derivative_data,
        )

        if is_nested_n_nodes(n_nodes):
            raise NotImplementedError(
                "ChebyshevSpline.fit() accepts only flat n_nodes (one "
                "int per dim, shared across pieces), like from_values()."
            )
        cls._validate_domain_knots(num_dimensions, domain, knots)
        points = np.asarray(points, dtype=np.float64)
        values = np.asarray(values, dtype=np.float64)
        if points.ndim != 2 or points.shape[1] != num_dimensions:
            raise ValueError(
                f"points must be (N, {num_dimensions}), got "
                f"{points.shape}")
        if values.shape != (points.shape[0],):
            raise ValueError(
                f"values must be ({points.shape[0]},), got "
                f"{values.shape}")
        if sample_weight is not None:
            sample_weight = np.asarray(sample_weight, dtype=np.float64)
            if sample_weight.shape != (points.shape[0],):
                raise ValueError(
                    f"sample_weight must be ({points.shape[0]},), got "
                    f"{sample_weight.shape}")

        deriv_blocks = normalize_derivative_data(
            derivative_data, num_dimensions, domain, n_nodes)

        intervals = cls._compute_intervals(num_dimensions, domain, knots)
        piece_shape = tuple(len(iv) for iv in intervals)
        flat_idx = route_points_to_pieces(knots, piece_shape, points)
        block_idx = [route_points_to_pieces(knots, piece_shape, pts)
                     for pts, _, _, _ in deriv_blocks]

        piece_values, per_piece = [], []
        sse, w_total = 0.0, 0.0
        for p, multi_idx in enumerate(np.ndindex(*piece_shape)):
            mask = flat_idx == p
            if not mask.any():
                sub = [list(intervals[d][multi_idx[d]])
                       for d in range(num_dimensions)]
                raise ValueError(
                    f"piece {p} (sub-domain {sub}) received no "
                    f"samples; add samples there or move the knots"
                )
            sub_domain = [list(intervals[d][multi_idx[d]])
                          for d in range(num_dimensions)]
            piece_blocks = []
            for (pts, orders, vals, weight), b_idx in zip(deriv_blocks,
                                                          block_idx):
                b_mask = b_idx == p
                if b_mask.any():
                    piece_blocks.append(
                        (pts[b_mask], orders, vals[b_mask], weight))
            try:
                tensor, diag = fit_dense_tensor(
                    points[mask], values[mask], sub_domain, n_nodes,
                    l2=l2, rcond=rcond,
                    derivative_data=piece_blocks or None,
                    sample_weight=(None if sample_weight is None
                                   else sample_weight[mask]),
                    engine=engine, mesh=mesh, data_axis=data_axis)
            except ValueError as e:
                # Per-piece failures (underdetermined, all-zero weights
                # within the piece, ...) name the piece — the global
                # inputs may look fine while one piece starves.
                raise ValueError(
                    f"piece {p} (sub-domain {sub_domain}): {e}"
                ) from None
            piece_values.append(tensor)
            per_piece.append(diag)
            sse += diag["sse"]
            w_total += (float(np.sum(sample_weight[mask]))
                        if sample_weight is not None
                        else float(diag["n_samples"]))

        obj = cls.from_values(piece_values, num_dimensions, domain,
                              list(n_nodes), knots,
                              max_derivative_order=max_derivative_order)
        obj.fit_diagnostics = {
            "rms": float(np.sqrt(sse / w_total)) if w_total > 0 else 0.0,
            "sse": sse,
            "n_samples": int(points.shape[0]),
            "l2": float(l2),
            "per_piece": per_piece,
            "max_abs_residual": max(
                d["max_abs_residual"] for d in per_piece),
        }
        if deriv_blocks:
            obj.fit_diagnostics["n_derivative_rows"] = int(
                sum(b[0].shape[0] for b in deriv_blocks))
            obj.fit_diagnostics["objective_sse"] = float(
                sum(d.get("objective_sse", d["sse"]) for d in per_piece))
        return obj

    @classmethod
    def _from_pieces(cls, source, pieces):
        """New spline sharing grid metadata from *source* with new pieces."""
        obj = object.__new__(cls)
        obj.function = None
        obj.num_dimensions = source.num_dimensions
        obj.domain = [list(b) for b in source.domain]
        obj.n_nodes = list(source.n_nodes)
        obj._n_nodes_nested = getattr(source, "_n_nodes_nested", False)
        obj.max_derivative_order = source.max_derivative_order
        obj.error_threshold = None
        obj.max_n = 64
        obj.knots = [list(k) for k in source.knots]
        obj._intervals = source._intervals
        obj._shape = source._shape
        obj._pieces = pieces
        obj._built = True
        obj._build_time = 0.0
        obj._cached_error_estimate = None
        obj.descriptor = ""
        obj.additional_data = None
        obj.n_workers = None
        obj.vectorized = False
        obj._derivative_id_registry = {}
        obj._derivative_id_to_orders = []
        return obj

    # ------------------------------------------------------------------
    # Extrusion / slicing
    # ------------------------------------------------------------------

    def extrude(self, params) -> "ChebyshevSpline":
        """Add constant dims (each piece extruded; new dim has no knots)."""
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.extrude_slice import (
            normalize_extrusion_params,
        )
        sorted_params = normalize_extrusion_params(params,
                                                   self.num_dimensions)

        knots = [list(k) for k in self.knots]
        intervals = [list(iv) for iv in self._intervals]
        shape = list(self._shape)
        domain = [list(b) for b in self.domain]
        n_nodes = list(self.n_nodes)

        for dim_idx, (lo, hi), n in sorted_params:
            knots.insert(dim_idx, [])
            intervals.insert(dim_idx, [(lo, hi)])
            shape.insert(dim_idx, 1)
            domain.insert(dim_idx, [lo, hi])
            n_nodes.insert(dim_idx, [n] if self._n_nodes_nested else n)

        pieces = []
        for piece in self._pieces:
            p = piece
            for dim_idx, bounds, n in sorted_params:
                p = p.extrude((dim_idx, bounds, n))
            pieces.append(p)

        obj = ChebyshevSpline._from_pieces(self, pieces)
        obj.num_dimensions = self.num_dimensions + len(sorted_params)
        obj.domain = domain
        obj.n_nodes = n_nodes
        obj.knots = knots
        obj._intervals = intervals
        obj._shape = tuple(shape)
        return obj

    def slice(self, params) -> "ChebyshevSpline":
        """Fix dims at values; only containing pieces survive per dim."""
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.extrude_slice import (
            normalize_slicing_params,
        )
        sorted_params = normalize_slicing_params(params, self.num_dimensions)

        for dim_idx, value in sorted_params:
            lo, hi = self.domain[dim_idx]
            if value < lo or value > hi:
                raise ValueError(
                    f"Slice value {value} for dim {dim_idx} is outside "
                    f"domain [{lo}, {hi}]"
                )

        knots = [list(k) for k in self.knots]
        intervals = [list(iv) for iv in self._intervals]
        shape = list(self._shape)
        domain = [list(b) for b in self.domain]
        n_nodes = list(self.n_nodes)
        pieces_arr = np.array(self._pieces, dtype=object).reshape(self._shape)

        for dim_idx, value in sorted_params:  # descending
            knots_d = knots[dim_idx]
            if len(knots_d) == 0:
                interval_idx = 0
            else:
                interval_idx = int(np.searchsorted(knots_d, value,
                                                   side="right"))
                interval_idx = min(interval_idx, shape[dim_idx] - 1)

            pieces_arr = np.take(pieces_arr, interval_idx, axis=dim_idx)
            flat_pieces = pieces_arr.ravel()
            for i in range(len(flat_pieces)):
                flat_pieces[i] = flat_pieces[i].slice((dim_idx, value))
            pieces_arr = flat_pieces.reshape(pieces_arr.shape)

            del knots[dim_idx]
            del intervals[dim_idx]
            del shape[dim_idx]
            del domain[dim_idx]
            del n_nodes[dim_idx]

        obj = ChebyshevSpline._from_pieces(self, list(pieces_arr.ravel()))
        obj.num_dimensions = self.num_dimensions - len(sorted_params)
        obj.domain = domain
        obj.n_nodes = n_nodes
        obj.knots = knots
        obj._intervals = intervals
        obj._shape = tuple(shape)
        return obj

    # ------------------------------------------------------------------
    # Calculus
    # ------------------------------------------------------------------

    def integrate(self, dims=None, bounds=None):
        """Sum of piece integrals (full) or piece-summed lower-dim spline
        (partial), with per-piece clipped sub-bounds."""
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.calculus import normalize_bounds

        if dims is None:
            dims = list(range(self.num_dimensions))
        elif isinstance(dims, int):
            dims = [dims]
        dims = sorted(set(dims))
        for d in dims:
            if d < 0 or d >= self.num_dimensions:
                raise ValueError(
                    f"dim {d} out of range [0, {self.num_dimensions - 1}]"
                )

        per_dim_bounds = normalize_bounds(dims, bounds, self.domain)
        dim_to_idx = {d: i for i, d in enumerate(dims)}

        def _clip(bd, piece_lo, piece_hi):
            """Overlap of bounds with a piece interval.

            Returns (skip, bounds_or_None)."""
            if bd is None:
                return False, None
            overlap_lo = max(bd[0], piece_lo)
            overlap_hi = min(bd[1], piece_hi)
            if overlap_lo >= overlap_hi:
                return True, None
            if (abs(overlap_lo - piece_lo) < 1e-14
                    and abs(overlap_hi - piece_hi) < 1e-14):
                return False, None
            return False, (overlap_lo, overlap_hi)

        # Full integration: sum piece integrals.
        if len(dims) == self.num_dimensions:
            total = 0.0
            pieces_arr = np.array(self._pieces,
                                  dtype=object).reshape(self._shape)
            for idx in np.ndindex(*self._shape):
                piece = pieces_arr[idx]
                piece_bounds = []
                skip = False
                for d in range(self.num_dimensions):
                    piece_lo, piece_hi = self._intervals[d][idx[d]]
                    s, pb = _clip(per_dim_bounds[dim_to_idx[d]],
                                  piece_lo, piece_hi)
                    if s:
                        skip = True
                        break
                    piece_bounds.append(pb)
                if skip:
                    continue
                if all(b is None for b in piece_bounds):
                    total += piece.integrate()
                else:
                    total += piece.integrate(bounds=piece_bounds)
            return total

        # Partial integration: integrate each piece along d, sum pieces
        # along that axis of the piece grid.
        pieces_arr = np.array(self._pieces, dtype=object).reshape(self._shape)
        knots = [list(k) for k in self.knots]
        intervals = [list(iv) for iv in self._intervals]
        shape = list(self._shape)
        domain = [list(b) for b in self.domain]
        n_nodes = list(self.n_nodes)

        for d in sorted(dims, reverse=True):
            bd = per_dim_bounds[dim_to_idx[d]]
            new_shape = [s for i, s in enumerate(pieces_arr.shape) if i != d]
            new_pieces = (np.empty(new_shape, dtype=object)
                          if new_shape else np.empty((), dtype=object))

            def _integrate_line(dim_pieces):
                integrated = []
                for piece_idx, p in enumerate(dim_pieces):
                    s, pb = _clip(bd, *intervals[d][piece_idx])
                    if s:
                        continue
                    if pb is None:
                        integrated.append(p.integrate(dims=[d]))
                    else:
                        integrated.append(p.integrate(dims=[d], bounds=[pb]))
                if not integrated:
                    integrated.append(dim_pieces[0].integrate(dims=[d]) * 0.0)
                result = integrated[0]
                for other in integrated[1:]:
                    result = result + other
                return result

            if new_shape:
                for idx in np.ndindex(*new_shape):
                    full_idx = list(idx)
                    full_idx.insert(d, slice(None))
                    new_pieces[idx] = _integrate_line(
                        list(pieces_arr[tuple(full_idx)].ravel()))
            else:
                new_pieces[()] = _integrate_line(list(pieces_arr.ravel()))

            pieces_arr = new_pieces
            del knots[d]
            del intervals[d]
            del shape[d]
            del domain[d]
            del n_nodes[d]

        if len(shape) == 0:
            return float(pieces_arr.item().integrate())

        obj = ChebyshevSpline._from_pieces(self, list(pieces_arr.ravel()))
        obj.num_dimensions = self.num_dimensions - len(dims)
        obj.domain = domain
        obj.n_nodes = n_nodes
        obj.knots = knots
        obj._intervals = intervals
        obj._shape = tuple(shape)
        return obj

    def integrate_batch(self, bounds, dtype=None) -> np.ndarray:
        """Integrals over a batch of axis-aligned boxes — one dispatch
        per piece.

        Beyond-reference capability: every piece clips all B boxes to its
        sub-box at once (disjoint dims clamp to zero measure, which the
        sub-interval quadrature rows integrate to an exact 0) and runs a
        dense :meth:`ChebyshevApproximation.integrate_batch` over the
        whole batch; piece contributions sum.  Boxes may straddle knots
        freely.

        Parameters
        ----------
        bounds : (B, d, 2) array-like — per-box, per-dim (lo, hi) inside
            the domain.

        Returns
        -------
        (B,) ndarray of box integrals.
        """
        if not self._built:
            raise RuntimeError("Call build() first")
        # Full-box integration is the no-remaining-dims special case of
        # the conditional-expectation path (same per-piece clipping; the
        # routing mask is trivially all-true).
        bounds = np.asarray(bounds, dtype=np.float64)
        return self.partial_integrate_batch(
            list(range(self.num_dimensions)), bounds,
            np.zeros((bounds.shape[0] if bounds.ndim else 0, 0)),
            dtype=dtype)

    def differentiate(self, derivative_order) -> "ChebyshevSpline":
        """A first-class spline of the given derivative.

        Differentiates every piece spectrally (the dense
        :meth:`ChebyshevApproximation.differentiate` per piece) and
        returns a new spline on the same knot layout — the spline
        counterpart of the dense/TT methods, completing the 4/4
        common surface (beyond the reference, whose spline exposes
        derivatives only through per-call ``derivative_order`` —
        reference spline.py eval paths).

        The result serves value queries at full batched speed and can
        be saved, combined with algebra, or differentiated again.
        Orders are NOT capped by ``max_derivative_order`` (that cap
        governs the derivative-id registry only).

        Note: the original spline is typically only C0 at knots, so
        its derivative is discontinuous there; the returned spline's
        value queries AT a knot resolve one-sided exactly like
        derivative evaluation on the original (batch paths take the
        right/owning piece; single-point ``eval`` keeps its
        knot-boundary guard semantics for its own derivative calls).
        """
        if not self._built:
            raise RuntimeError("Call build() first")
        orders = [int(o) for o in derivative_order]
        if len(orders) != self.num_dimensions:
            raise ValueError(
                f"derivative_order length {len(orders)} does not match "
                f"num_dimensions {self.num_dimensions}"
            )
        if any(o < 0 for o in orders):
            raise ValueError("derivative orders must be >= 0")
        new_pieces = [piece.differentiate(orders) for piece in self._pieces]
        return ChebyshevSpline._from_pieces(self, new_pieces)

    def roots(self, dim=None, fixed=None) -> np.ndarray:
        """Merged + deduped roots across all pieces of the 1-D slice."""
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.calculus import (
            roots_1d,
            validate_calculus_args,
        )
        dim, slice_params = validate_calculus_args(
            self.num_dimensions, dim, fixed, self.domain)
        sliced = self.slice(slice_params) if slice_params else self

        all_roots = [
            roots_1d(np.asarray(p.tensor_values), p.domain[0])
            for p in sliced._pieces
        ]
        if not all_roots:
            return np.array([], dtype=float)
        combined = np.sort(np.concatenate(all_roots))
        if len(combined) > 1:
            scale = abs(self.domain[dim][1] - self.domain[dim][0]) + 1
            mask = np.concatenate(
                [[True], np.diff(combined) > 1e-10 * scale])
            combined = combined[mask]
        return combined

    def minimize(self, dim=None, fixed=None, *, tol=1e-9,
                 max_boxes=5000, polish=True):
        """Minimum of the spline.

        With ``dim``: the 1-D minimum along that dim, best over pieces
        (reference semantics) — ``(value, location)`` floats.  With
        ``dim=None`` on a multi-dimensional spline: the CERTIFIED GLOBAL
        minimum over the whole domain (``fixed`` may pin a subset of
        dims) — ``(value, point)`` with an ``(ndim,)`` point.  Each
        piece runs the coefficient-space branch-and-bound of
        ``ops/subdivision.py``; kinks are handled exactly because every
        knot plane belongs to both neighboring pieces' closed boxes.
        """
        return self._optimize(dim, fixed, "min", tol=tol,
                              max_boxes=max_boxes, polish=polish)

    def maximize(self, dim=None, fixed=None, *, tol=1e-9,
                 max_boxes=5000, polish=True):
        """Maximum of the spline — see :meth:`minimize` for the 1-D
        (``dim`` given) vs certified-global (``dim=None``) forms."""
        return self._optimize(dim, fixed, "max", tol=tol,
                              max_boxes=max_boxes, polish=polish)

    def critical_points(self, fixed=None, *, grad_tol=1e-8, delta=5e-3,
                        max_boxes=50000, separation=1e-6):
        """Stationary points per piece (one-sided at knot planes),
        merged and classified — see
        ``ChebyshevApproximation.critical_points``."""
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.globalcalc import critical_points_spline
        return critical_points_spline(
            self, fixed=fixed, grad_tol=grad_tol, delta=delta,
            max_boxes=max_boxes, separation=separation)

    def _optimize(self, dim, fixed, mode, *, tol=1e-9, max_boxes=5000,
                  polish=True):
        if not self._built:
            raise RuntimeError("Call build() first")
        if dim is None and self.num_dimensions > 1:
            from pychebyshev_tpu.utils.globalcalc import (
                global_optimize_spline)
            return global_optimize_spline(
                self, mode, fixed, tol=tol, max_boxes=max_boxes,
                polish=polish)
        from pychebyshev_tpu.utils.calculus import (
            optimize_1d,
            validate_calculus_args,
        )
        dim, slice_params = validate_calculus_args(
            self.num_dimensions, dim, fixed, self.domain)
        sliced = self.slice(slice_params) if slice_params else self

        better = (lambda a, b: a < b) if mode == "min" else (lambda a, b: a > b)
        best_val = float("inf") if mode == "min" else float("-inf")
        best_loc = 0.0
        for p in sliced._pieces:
            val, loc = optimize_1d(
                np.asarray(p.tensor_values), np.asarray(p.nodes[0]),
                np.asarray(p.weights[0]), np.asarray(p.diff_matrices[0]),
                p.domain[0], mode=mode)
            if better(val, best_val):
                best_val, best_loc = val, loc
        return best_val, best_loc

    def _scenario_interval_values(self, dim, fixed_cols, batch):
        """Per dim-interval (B, n) slice resamples for batched calculus.

        Yields ``(values, nodes, interval)`` per interval of *dim*: the
        slice along *dim* is piecewise-polynomial with breaks at the
        dim's knots, so each interval resamples at its own Type-I nodes
        (n = the max node count among the interval's pieces — resampling
        a lower-degree piece at more nodes stays exact, which also
        covers nested per-piece grids).  One fused eval_batch per
        interval routes every scenario to its piece.
        """
        from pychebyshev_tpu.ops.chebyshev import nodes_for_dim_np
        from pychebyshev_tpu.utils.calculus import scenario_slice_points

        pieces_arr = np.array(self._pieces,
                              dtype=object).reshape(self._shape)
        for k, (lo, hi) in enumerate(self._intervals[dim]):
            in_interval = np.take(pieces_arr, k, axis=dim).ravel()
            n = max(int(p.n_nodes[dim]) for p in in_interval)
            nodes = nodes_for_dim_np(float(lo), float(hi), n)
            pts = scenario_slice_points(
                self.num_dimensions, dim, fixed_cols, batch, nodes)
            vals = np.asarray(self.eval_batch(
                pts, [0] * self.num_dimensions)).reshape(batch, n)
            yield vals, nodes, (float(lo), float(hi))

    def partial_integrate_batch(self, dims, bounds, points,
                                derivative_order=None,
                                dtype=None) -> np.ndarray:
        """Batched conditional expectations across pieces (beyond
        reference).

        Integrated ``dims`` clip every scenario box to every piece (as
        in :meth:`integrate_batch`); remaining dims ROUTE each scenario
        to its piece (``searchsorted side='right'`` — at a knot the
        right piece answers, matching :meth:`eval_batch`'s silent
        one-sided behavior, derivatives included); each piece runs a
        dense :meth:`~ChebyshevApproximation.partial_integrate_batch`
        over the whole batch and contributes only to its routed
        scenarios.

        ``bounds``: (B, len(dims), 2) in sorted ``dims`` order;
        ``points``: (B, d - len(dims)) ascending remaining-dim order;
        ``derivative_order``: per-remaining-dim orders or None.
        Returns (B,).
        """
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.calculus import (
            validate_partial_integrate_args_batch,
        )

        dims, arr, remaining, pts, rem_orders = \
            validate_partial_integrate_args_batch(
                self.num_dimensions, self.domain, dims, bounds, points,
                derivative_order, max_order=self.max_derivative_order)
        col_of = {k: i for i, k in enumerate(dims)}
        route = {k: np.searchsorted(np.asarray(self.knots[k],
                                               dtype=np.float64),
                                    pts[:, i], side="right")
                 for i, k in enumerate(remaining)}
        total = np.zeros(arr.shape[0], dtype=np.float64)
        pieces_arr = np.array(self._pieces,
                              dtype=object).reshape(self._shape)
        for idx in np.ndindex(*self._shape):
            mask = np.ones(arr.shape[0], dtype=bool)
            for k in remaining:
                mask &= route[k] == idx[k]
            if not mask.any():
                continue
            lo = arr[..., 0].copy()
            hi = arr[..., 1].copy()
            for k in dims:
                p_lo, p_hi = self._intervals[k][idx[k]]
                lo[:, col_of[k]] = np.clip(lo[:, col_of[k]], p_lo, p_hi)
                hi[:, col_of[k]] = np.clip(hi[:, col_of[k]], p_lo, p_hi)
            hi = np.maximum(hi, lo)
            if not ((hi > lo).all(axis=1) & mask).any():
                continue
            vals = pieces_arr[idx].partial_integrate_batch(
                dims, np.stack([lo, hi], axis=-1), pts,
                derivative_order=rem_orders, dtype=dtype)
            total += np.where(mask, np.asarray(vals), 0.0)
        return total

    def roots_batch(self, dim=None, fixed=None) -> list:
        """Roots along *dim* for a BATCH of scenarios (scalar or (B,)
        arrays in ``fixed``) — list of B sorted root arrays, merged +
        deduped across the dim's intervals exactly like :meth:`roots`
        (beyond reference)."""
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.calculus import (
            roots_1d_batch,
            validate_calculus_args_batch,
        )
        dim, cols, batch = validate_calculus_args_batch(
            self.num_dimensions, dim, fixed, self.domain)
        per_row = [[] for _ in range(batch)]
        for vals, _, interval in self._scenario_interval_values(
                dim, cols, batch):
            for b, r in enumerate(roots_1d_batch(vals, interval)):
                per_row[b].append(r)

        scale = abs(self.domain[dim][1] - self.domain[dim][0]) + 1
        out = []
        for chunks in per_row:
            combined = np.sort(np.concatenate(chunks))
            if len(combined) > 1:
                mask = np.concatenate(
                    [[True], np.diff(combined) > 1e-10 * scale])
                combined = combined[mask]
            out.append(combined)
        return out

    def minimize_batch(self, dim=None, fixed=None):
        """Batched :meth:`minimize`: ((B,) values, (B,) locations), best
        across the dim's intervals per scenario — beyond reference."""
        return self._optimize_batch(dim, fixed, "min")

    def maximize_batch(self, dim=None, fixed=None):
        """Batched :meth:`maximize`: ((B,) values, (B,) locations), best
        across the dim's intervals per scenario — beyond reference."""
        return self._optimize_batch(dim, fixed, "max")

    def _optimize_batch(self, dim, fixed, mode):
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.calculus import (
            optimize_resampled_batch,
            validate_calculus_args_batch,
        )
        dim, cols, batch = validate_calculus_args_batch(
            self.num_dimensions, dim, fixed, self.domain)
        best_val = best_loc = None
        for vals, nodes, interval in self._scenario_interval_values(
                dim, cols, batch):
            v, loc = optimize_resampled_batch(vals, nodes, interval,
                                              mode)
            if best_val is None:
                best_val, best_loc = v, loc
            else:
                take = v < best_val if mode == "min" else v > best_val
                best_val = np.where(take, v, best_val)
                best_loc = np.where(take, loc, best_loc)
        return best_val, best_loc

    # ------------------------------------------------------------------
    # Arithmetic operators
    # ------------------------------------------------------------------

    def _check_spline_compatible(self, other):
        from pychebyshev_tpu.utils.algebra import check_compatible
        check_compatible(self, other)
        if self.knots != other.knots:
            raise ValueError(f"Knot mismatch: {self.knots} vs {other.knots}")

    def __add__(self, other):
        if type(self) is not type(other):
            return NotImplemented
        self._check_spline_compatible(other)
        pieces = [
            ChebyshevApproximation._from_grid(
                ps, ps.tensor_values + po.tensor_values)
            for ps, po in zip(self._pieces, other._pieces)
        ]
        return ChebyshevSpline._from_pieces(self, pieces)

    def __sub__(self, other):
        if type(self) is not type(other):
            return NotImplemented
        self._check_spline_compatible(other)
        pieces = [
            ChebyshevApproximation._from_grid(
                ps, ps.tensor_values - po.tensor_values)
            for ps, po in zip(self._pieces, other._pieces)
        ]
        return ChebyshevSpline._from_pieces(self, pieces)

    def compose(self, g) -> "ChebyshevSpline":
        """Scalar-function composition per piece (see
        ``ChebyshevApproximation.compose``); each piece's grid must
        resolve ``g∘f`` on its sub-domain."""
        pieces = [p.compose(g) for p in self._pieces]
        return ChebyshevSpline._from_pieces(self, pieces)

    def hadamard(self, other) -> "ChebyshevSpline":
        """Node-wise product spline (per-piece ``hadamard``; see
        ``ChebyshevApproximation.hadamard`` for the accuracy caveat —
        each piece's grid must resolve the product's doubled degree)."""
        if type(self) is not type(other):
            raise TypeError(
                f"hadamard requires another {type(self).__name__}, got "
                f"{type(other).__name__}"
            )
        self._check_spline_compatible(other)
        pieces = [ps.hadamard(po)
                  for ps, po in zip(self._pieces, other._pieces)]
        return ChebyshevSpline._from_pieces(self, pieces)

    def __mul__(self, scalar):
        from pychebyshev_tpu.utils.algebra import is_scalar
        if not is_scalar(scalar):
            return NotImplemented
        s = float(scalar)
        pieces = [
            ChebyshevApproximation._from_grid(p, p.tensor_values * s)
            for p in self._pieces
        ]
        return ChebyshevSpline._from_pieces(self, pieces)

    def __rmul__(self, scalar):
        return self.__mul__(scalar)

    def __truediv__(self, scalar):
        from pychebyshev_tpu.utils.algebra import is_scalar
        if not is_scalar(scalar):
            return NotImplemented
        return self.__mul__(1.0 / float(scalar))

    def __neg__(self):
        return self.__mul__(-1.0)

    def __iadd__(self, other):
        self._check_spline_compatible(other)
        for ps, po in zip(self._pieces, other._pieces):
            ps.tensor_values = ps.tensor_values + po.tensor_values
            ps._cached_error_estimate = None
        self._cached_error_estimate = None
        return self

    def __isub__(self, other):
        self._check_spline_compatible(other)
        for ps, po in zip(self._pieces, other._pieces):
            ps.tensor_values = ps.tensor_values - po.tensor_values
            ps._cached_error_estimate = None
        self._cached_error_estimate = None
        return self

    def __imul__(self, scalar):
        from pychebyshev_tpu.utils.algebra import is_scalar
        if not is_scalar(scalar):
            return NotImplemented
        s = float(scalar)
        for p in self._pieces:
            p.tensor_values = p.tensor_values * s
            p._cached_error_estimate = None
        self._cached_error_estimate = None
        return self

    def __itruediv__(self, scalar):
        from pychebyshev_tpu.utils.algebra import is_scalar
        if not is_scalar(scalar):
            return NotImplemented
        return self.__imul__(1.0 / float(scalar))

    # ------------------------------------------------------------------
    # Printing + plotting
    # ------------------------------------------------------------------

    def __repr__(self) -> str:
        return (f"ChebyshevSpline(dims={self.num_dimensions}, "
                f"pieces={self.num_pieces}, shape={self._shape}, "
                f"built={self._built})")

    def __str__(self) -> str:
        status = "built" if self._built else "not built"
        max_display = 6
        if self.num_dimensions > max_display:
            nodes_str = ("[" + ", ".join(
                str(n) for n in self.n_nodes[:max_display]) + ", ...]")
            knots_str = ("[" + ", ".join(
                str(k) for k in self.knots[:max_display]) + ", ...]")
            domain_str = (" x ".join(
                f"[{lo}, {hi}]" for lo, hi in self.domain[:max_display])
                + " x ...")
        else:
            nodes_str = str(self.n_nodes)
            knots_str = str(self.knots)
            domain_str = " x ".join(f"[{lo}, {hi}]"
                                    for lo, hi in self.domain)
        shape_str = " x ".join(str(s) for s in self._shape)

        lines = [
            f"ChebyshevSpline ({self.num_dimensions}D, {status})",
            f"  Nodes:       {nodes_str} per piece",
            f"  Knots:       {knots_str}",
            f"  Pieces:      {self.num_pieces} ({shape_str})",
        ]
        if self._built:
            lines.append(f"  Build:       {self._build_time:.3f}s "
                         f"({self.total_build_evals:,} function evals)")
        lines.append(f"  Domain:      {domain_str}")
        if self._built:
            lines.append(f"  Error est:   {self.error_estimate():.2e}")
        return "\n".join(lines)

    def plot_1d(self, ax=None, n_points=200, fixed=None):
        """1-D slice plot (requires matplotlib)."""
        from pychebyshev_tpu.utils.viz import plot_1d_impl
        return plot_1d_impl(self, ax=ax, n_points=n_points, fixed=fixed)

    def plot_2d_surface(self, ax=None, n_points=50, fixed=None):
        """2-D surface plot (requires matplotlib)."""
        from pychebyshev_tpu.utils.viz import plot_2d_surface_impl
        return plot_2d_surface_impl(self, ax=ax, n_points=n_points,
                                    fixed=fixed)

    def plot_2d_contour(self, ax=None, n_points=50, n_levels=20, fixed=None):
        """2-D contour plot (requires matplotlib)."""
        from pychebyshev_tpu.utils.viz import plot_2d_contour_impl
        return plot_2d_contour_impl(self, ax=ax, n_points=n_points,
                                    n_levels=n_levels, fixed=fixed)

    # ------------------------------------------------------------------
    # Adaptive knot placement
    # ------------------------------------------------------------------

    @classmethod
    def auto_knots(cls, function, num_dimensions, domain, *,
                   max_knots_per_dim: int = 5, n_scan_points: int = 200,
                   threshold_factor: float = 5.0,
                   n_nodes_per_piece: int = 10,
                   additional_data=None) -> "ChebyshevSpline":
        """Build a spline with knots auto-placed at detected kinks.

        Probes every dim along an axis-aligned line through the domain
        center, locates |curvature| spikes (``> threshold_factor x`` the
        dim's mean curvature), collapses each spike run to its strongest
        sample, and uses the surviving abscissae (capped per dim) as
        knots.  Behavioral parity target: reference ``spline.py:2110``.
        """
        lows = np.array([d[0] for d in domain], dtype=np.float64)
        highs = np.array([d[1] for d in domain], dtype=np.float64)
        center = 0.5 * (lows + highs)

        # One flat probe set covering all dims: row (d, s) varies dim d
        # along its linspace abscissa with every other coordinate pinned
        # at the domain center.
        steps = np.linspace(0.0, 1.0, n_scan_points)
        abscissae = lows[:, None] + steps[None, :] * (highs - lows)[:, None]
        probes = np.broadcast_to(
            center, (num_dimensions, n_scan_points, num_dimensions)
        ).copy()
        diag = np.arange(num_dimensions)
        probes[diag, :, diag] = abscissae

        samples = np.fromiter(
            (function([float(c) for c in p], additional_data)
             for p in probes.reshape(-1, num_dimensions)),
            dtype=np.float64, count=num_dimensions * n_scan_points,
        ).reshape(num_dimensions, n_scan_points)

        finite_rows = np.isfinite(samples).all(axis=1)
        if not finite_rows.all():
            bad_dim = int(np.flatnonzero(~finite_rows)[0])
            raise ValueError(
                f"auto_knots scan produced non-finite samples while "
                f"probing dim {bad_dim}; the target function must stay "
                f"finite over the whole domain"
            )

        # Curvature proxy: |second difference| along each probe line.
        # Thresholding against the mean (a median would vanish on
        # piecewise-linear signals whose curvature is mostly exactly 0).
        curvature = np.abs(np.diff(samples, n=2, axis=1))
        run_gap = max(1, n_scan_points // (4 * max_knots_per_dim))

        knots = []
        for d in range(num_dimensions):
            curv = curvature[d]
            scale = float(curv.mean()) if curv.size else 0.0
            spikes = (np.flatnonzero(curv > threshold_factor * scale)
                      if scale > 0.0 else np.array([], dtype=int))
            if spikes.size == 0:
                knots.append([])
                continue
            # Split the spike indices into runs separated by > run_gap
            # samples; each run contributes its strongest sample.
            run_starts = np.flatnonzero(np.diff(spikes) > run_gap) + 1
            reps = np.array([run[np.argmax(curv[run])]
                             for run in np.split(spikes, run_starts)])
            if reps.size > max_knots_per_dim:
                strongest = np.argsort(curv[reps])[::-1][:max_knots_per_dim]
                reps = reps[strongest]
            # A spike at curvature index i peaks at sample i+1.
            knots.append(sorted(float(x) for x in abscissae[d, reps + 1]))

        spl = cls(function, num_dimensions, domain,
                  n_nodes=[n_nodes_per_piece] * num_dimensions,
                  knots=knots, additional_data=additional_data)
        spl.build(verbose=False)
        return spl


# Reference-name compat alias.
_is_nested_n_nodes = is_nested_n_nodes
