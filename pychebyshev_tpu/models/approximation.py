"""ChebyshevApproximation: full-tensor multi-dimensional Chebyshev
interpolation with analytical derivatives — TPU-native implementation.

API-parity target: reference ``barycentric.py`` (class
``ChebyshevApproximation``, lines 209-2559).  The public surface —
constructor semantics (auto-N via ``error_threshold``, spline dispatch via
``special_points``, ``defer_build``), every eval variant, error
estimation, Sobol indices, extrude/slice, calculus, operator algebra,
pickle + ``.pcb`` serialization, MoCaX-ergonomics getters — matches the
reference.  The numerics are re-designed for TPU:

- Grid data (nodes / barycentric weights / differentiation matrices) and
  the value tensor live on device as float64 ``jax.Array``s.
- All eval paths funnel into the jitted batched contraction kernels in
  ``ops.eval`` (one MXU GEMM + fused VPU reductions per batch, exact-node
  handling branchless).
- Error estimation is a batched DCT (one cosine-matrix contraction per
  axis) instead of the reference's per-slice Python loop.
- Builds evaluate vectorized functions in one batched call (optionally
  sharded across a device mesh — see ``parallel.sharding``); black-box
  ``f(point, data)`` callables fall back to a host loop / process pool
  exactly like the reference.
"""

from __future__ import annotations

import os
import pickle
import time
import warnings
from typing import List

import numpy as np
import jax
import jax.numpy as jnp

import pychebyshev_tpu.config  # noqa: F401  (enables x64)
from pychebyshev_tpu.config import NODE_COINCIDENCE_TOL
from pychebyshev_tpu.ops.chebyshev import (
    barycentric_weights,
    barycentric_weights_np,
    differentiation_matrix,
    differentiation_matrix_np,
    nodes_for_dim,
    nodes_for_dim_np,
)
from pychebyshev_tpu.ops.chebyshev import (  # noqa: F401  (compat re-exports)
    barycentric_derivative_analytical,
    barycentric_interpolate,
    compute_barycentric_weights,
    compute_differentiation_matrix,
)
from pychebyshev_tpu.ops.dct import _coeff_matrix_np, values_to_coeffs
from pychebyshev_tpu.ops import eval as eval_ops

__all__ = ["ChebyshevApproximation"]



def _private_device_f64(values) -> jax.Array:
    """Transfer to a float64 device array that shares NO memory with the
    caller.  On CPU backends ``jnp.asarray`` of a NumPy array can be
    ZERO-COPY, so a caller later mutating its array would silently
    mutate the "immutable" tensor; copying host inputs first makes the
    device tensor genuinely private on every backend."""
    if isinstance(values, np.ndarray):
        values = np.array(values, dtype=np.float64)
    return jnp.asarray(values, dtype=jnp.float64)


def _validate_special_points_shape(special_points, n_nodes, num_dimensions,
                                   domain) -> None:
    """Shape/content validation before spline dispatch (reference
    ``barycentric.py:149-207``)."""
    for d in range(num_dimensions):
        lo, hi = domain[d]
        pts = list(special_points[d])
        for k in pts:
            if not (lo < k < hi):
                raise ValueError(
                    f"Special point {k} for dimension {d} is not strictly "
                    f"inside domain [{lo}, {hi}]"
                )
        if pts != sorted(pts):
            raise ValueError(
                f"special_points for dimension {d} must be sorted"
            )
        if len(set(pts)) != len(pts):
            raise ValueError(f"Coinciding special points in dimension {d}")

    if n_nodes is None:
        return

    any_nested = any(isinstance(x, (list, tuple)) for x in n_nodes)
    all_nested = all(isinstance(x, (list, tuple)) for x in n_nodes)
    if any_nested and not all_nested:
        raise ValueError(
            f"n_nodes must be fully nested (all dims as lists) when any "
            f"dim is nested; got mixed form {n_nodes!r}"
        )
    if not all_nested:
        raise ValueError(
            f"n_nodes must be nested as List[List[int]] when special_points "
            f"is present; got {n_nodes!r}"
        )
    for d in range(num_dimensions):
        expected = len(special_points[d]) + 1
        if len(n_nodes[d]) != expected:
            raise ValueError(
                f"n_nodes[{d}] must have {expected} entries "
                f"(one per sub-interval); got {len(n_nodes[d])}"
            )


def _unwrap_typed(domain, n_nodes, special_points):
    """Unwrap Domain / Ns / SpecialPoints typed helpers."""
    from pychebyshev_tpu import Domain, Ns, SpecialPoints
    if isinstance(domain, Domain):
        domain = list(domain.bounds)
    if isinstance(n_nodes, Ns):
        n_nodes = list(n_nodes.counts)
    if isinstance(special_points, SpecialPoints):
        special_points = [list(k) for k in special_points.knots_per_dim]
    return domain, n_nodes, special_points


def _with_padded_rows(grid: dict) -> dict:
    """Augment a host-grid dict with padded (d, n_max) node/weight
    mirrors for the vectorized single-point row build.

    Pad lanes carry node +inf (gap -inf, never the argmin) and weight 0
    (exactly 0.0 contribution to numerator and denominator), so one set
    of array ops covers ragged dims.  Note the pad lanes change numpy's
    pairwise-summation tree, so ragged-grid row sums can drift ~1 ulp
    from a per-dim loop — well inside the 1e-12 parity contract, and
    save/load bitwise reproducibility is unaffected because both sides
    of a round trip run this same code path.  Idempotent; mutates and
    returns *grid*.
    """
    if "nodes_pad" not in grid:
        ns = [len(n) for n in grid["nodes"]]
        n_max = max(ns)
        nodes_pad = np.full((len(ns), n_max), np.inf)
        weights_pad = np.zeros((len(ns), n_max))
        for d, (nd, wd) in enumerate(zip(grid["nodes"], grid["weights"])):
            nodes_pad[d, :ns[d]] = nd
            weights_pad[d, :ns[d]] = wd
        grid["nodes_pad"] = nodes_pad
        grid["weights_pad"] = weights_pad
        grid["n_per_dim"] = ns
    return grid


class ChebyshevApproximation:
    """Full-tensor Chebyshev interpolant on a Type-I node grid.

    Parameters mirror the reference constructor
    (``barycentric.py:341-438``); the additional keyword ``vectorized``
    marks ``function`` as batch-capable
    (``f(points_array (N, d), data) -> (N,) values``), enabling the
    single-call TPU build path.
    """

    def __new__(cls, function=None, num_dimensions=None, domain=None,
                n_nodes=None, max_derivative_order=2, error_threshold=None,
                max_n=64, special_points=None, additional_data=None, *,
                defer_build=False, n_workers=None, vectorized=False):
        # Dispatch to ChebyshevSpline when special_points declares any kink
        # (precedent: pathlib.Path; reference barycentric.py:271-339).
        domain, n_nodes, special_points = _unwrap_typed(
            domain, n_nodes, special_points)
        if special_points is not None:
            if (num_dimensions is not None
                    and len(special_points) != num_dimensions):
                raise ValueError(
                    f"special_points must have {num_dimensions} entries, "
                    f"got {len(special_points)}"
                )
            for d, sp in enumerate(special_points):
                if not isinstance(sp, (list, tuple)):
                    raise ValueError(
                        f"special_points[{d}] must be a list/tuple of "
                        f"floats, got {type(sp).__name__}: {sp!r}"
                    )
            if any(len(sp) > 0 for sp in special_points):
                from pychebyshev_tpu.models.spline import ChebyshevSpline
                _validate_special_points_shape(
                    special_points, n_nodes, num_dimensions, domain)
                return ChebyshevSpline(
                    function, num_dimensions, domain, n_nodes=n_nodes,
                    knots=special_points,
                    max_derivative_order=max_derivative_order,
                    error_threshold=error_threshold, max_n=max_n,
                    additional_data=additional_data,
                    defer_build=defer_build, n_workers=n_workers,
                    vectorized=vectorized,
                )
        return super().__new__(cls)

    def __init__(self, function, num_dimensions, domain, n_nodes=None,
                 max_derivative_order=2, error_threshold=None, max_n=64,
                 special_points=None, additional_data=None, *,
                 defer_build=False, n_workers=None, vectorized=False):
        from pychebyshev_tpu.utils.parallel_build import normalize_n_workers

        domain, n_nodes, special_points = _unwrap_typed(
            domain, n_nodes, special_points)

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
        self.max_derivative_order = max_derivative_order
        self.special_points = special_points
        self.descriptor: str = ""
        self.additional_data = additional_data
        self.n_workers = normalize_n_workers(n_workers)
        self.vectorized = bool(vectorized)
        self._derivative_id_registry: dict = {}
        self._derivative_id_to_orders: list = []

        # Normalize n_nodes — None entries mean "auto this dim".
        if n_nodes is None:
            if error_threshold is None and not defer_build:
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
        self.n_nodes = n_nodes
        # Preserve the user's original intent (None sentinels intact) so a
        # rebuild after tightening error_threshold re-runs the doubling loop.
        self._original_n_nodes = list(self.n_nodes)

        self.tensor_values = None
        self.weights = None
        self.diff_matrices = None
        self.build_time: float = 0.0
        self.n_evaluations: int = 0
        self._cached_error_estimate = None

        if defer_build:
            if function is not None:
                raise ValueError(
                    "defer_build=True requires function=None (the "
                    "deferred-construction workflow expects values to be "
                    "supplied via set_original_function_values() later)"
                )
            if self.n_nodes is None or any(
                not isinstance(n, (int, np.integer)) or n <= 0
                for n in self.n_nodes
            ):
                raise ValueError(
                    "defer_build=True requires explicit positive int "
                    "n_nodes; auto-N (error_threshold) is not supported in "
                    "deferred mode"
                )
            self._initialize_grid_only()
            return

        self.nodes: List[jax.Array] = []
        if all(n is not None for n in self.n_nodes):
            self._generate_nodes()

    # ------------------------------------------------------------------
    # Grid construction
    # ------------------------------------------------------------------

    def _generate_nodes(self) -> None:
        """Populate ``self.nodes`` (ascending Chebyshev grid per dim).

        Grid metadata is computed on host (tiny arrays, build-time only)
        and placed on device — avoids a device compile per node count.
        """
        host = [
            nodes_for_dim_np(self.domain[d][0], self.domain[d][1],
                             int(self.n_nodes[d]))
            for d in range(self.num_dimensions)
        ]
        self.nodes = [jnp.asarray(h) for h in host]
        # Seed the host-side node cache: build-time consumers (grid
        # enumeration, weight computation) are host code, and reading
        # device arrays back through a remote-TPU tunnel costs ~30 ms
        # per round trip — more than the entire rest of the build.
        self._host_nodes_cache = (tuple(self.nodes), host)

    def _nodes_np(self) -> list[np.ndarray]:
        """Host NumPy copies of ``self.nodes``, cached by array identity.

        The cache keeps strong references to the keyed arrays and
        validates with ``is`` comparisons — device arrays are immutable
        and every mutating operation rebinds ``self.nodes``, and holding
        the keyed objects alive rules out id-reuse staleness.  Paths
        that construct nodes on host seed the cache to avoid any device
        readback at build time.
        """
        cache = getattr(self, "_host_nodes_cache", None)
        if (cache is None or len(cache[0]) != len(self.nodes)
                or any(k is not a for k, a in zip(cache[0], self.nodes))):
            cache = (tuple(self.nodes),
                     [np.asarray(a) for a in self.nodes])
            self._host_nodes_cache = cache
        return cache[1]

    def _compute_grid_data(self) -> None:
        """Populate barycentric weights + differentiation matrices.

        Computed on host (tiny O(n^2) arrays) and placed on device; the
        host copies are kept in ``_host_grid`` so single-point eval never
        reads grid metadata back through the device (on a tunneled TPU a
        readback costs far more than the arrays are worth).
        """
        host_nodes = self._nodes_np()
        host_weights = [barycentric_weights_np(nd) for nd in host_nodes]
        host_diffs = [differentiation_matrix_np(host_nodes[d],
                                                host_weights[d])
                      for d in range(self.num_dimensions)]
        self.weights = [jnp.asarray(w) for w in host_weights]
        self.diff_matrices = [jnp.asarray(m) for m in host_diffs]
        self._host_grid = _with_padded_rows({
            "nodes": host_nodes,
            "weights": host_weights,
            "diffs_t": [np.ascontiguousarray(m.T) for m in host_diffs],
        })

    def _initialize_grid_only(self) -> None:
        """Grid metadata without function evaluation (``defer_build``)."""
        self._generate_nodes()
        self._compute_grid_data()

    def _grid_tuples(self):
        """(nodes, weights, diffs) as tuples for the jitted kernels."""
        return (tuple(self.nodes), tuple(self.weights),
                tuple(self.diff_matrices))

    def set_original_function_values(self, values) -> None:
        """Fill a ``defer_build=True`` object's tensor with explicit values."""
        if self.tensor_values is not None:
            raise RuntimeError(
                "interpolant is already constructed; "
                "set_original_function_values() is for defer_build=True "
                "objects"
            )
        arr = np.asarray(values, dtype=np.float64)
        expected_shape = tuple(self.n_nodes)
        if arr.shape != expected_shape:
            raise ValueError(
                f"values shape {arr.shape} does not match expected "
                f"{expected_shape}"
            )
        if not np.isfinite(arr).all():
            raise ValueError("values contains NaN or Inf (must be finite)")
        self.tensor_values = _private_device_f64(arr)
        self._offer_host_tensor(arr)
        self.function = None

    # ------------------------------------------------------------------
    # Build
    # ------------------------------------------------------------------

    def build(self, verbose: bool | int = True) -> None:
        """Evaluate the function on the grid (doubling loop if auto-N)."""
        if self.function is None:
            raise RuntimeError(
                "Cannot build: no function assigned. "
                "This object was created via from_values() or load()."
            )
        if any(n is None for n in self._original_n_nodes):
            self._build_with_threshold(verbose=verbose)
        else:
            self._build_fixed_grid(verbose=verbose)

    def _build_with_threshold(self, verbose: bool | int = True) -> None:
        """Double the worst auto dim until error <= threshold or max_n.

        Counters (``n_evaluations``, ``build_time``) accumulate across
        iterations (reference ``barycentric.py:567-645``).
        """
        assert self.error_threshold is not None
        current = [n if n is not None else 3 for n in self._original_n_nodes]
        auto_dims = [i for i, n in enumerate(self._original_n_nodes)
                     if n is None]

        total_evals = 0
        total_time = 0.0
        while True:
            self.n_nodes = list(current)
            self._cached_error_estimate = None
            self._generate_nodes()
            self._build_fixed_grid(verbose=verbose)
            total_evals += self.n_evaluations
            total_time += self.build_time

            per_dim = self._error_estimate_per_dim()
            err = float(sum(per_dim))
            self._cached_error_estimate = err
            if verbose:
                print(f"[auto-N] n_nodes={current}, error={err:.3e}")
            if err <= self.error_threshold:
                break

            candidates = [(per_dim[i], i) for i in auto_dims
                          if current[i] < self.max_n]
            if not candidates:
                warnings.warn(
                    f"max_n={self.max_n} reached on all auto dims before "
                    f"error_threshold={self.error_threshold:.2e} satisfied "
                    f"(last error={err:.3e}). Increase max_n or relax "
                    f"error_threshold.",
                    RuntimeWarning,
                    stacklevel=3,
                )
                break
            candidates.sort(key=lambda t: (-t[0], t[1]))
            worst = candidates[0][1]
            current[worst] = min(2 * current[worst], self.max_n)

        self.n_evaluations = total_evals
        self.build_time = total_time

    def _evaluate_on_grid(self, verbose: bool | int) -> np.ndarray | jax.Array:
        """Evaluate ``self.function`` at every grid point.

        Vectorized functions get one batched call over the (N, d) grid
        (device-resident if the function is JAX-traceable); black-box
        scalar callables use the host loop / process pool.
        """
        shape = tuple(int(n) for n in self.n_nodes)
        if self.vectorized:
            grid = self.get_evaluation_points()
            vals = self.function(grid, self.additional_data)
            if isinstance(vals, np.ndarray):
                # Host oracle: stay on host so the NaN guard and the
                # single device transfer happen without readbacks.
                return np.asarray(vals, dtype=np.float64).reshape(shape)
            return jnp.asarray(vals, dtype=jnp.float64).reshape(shape)

        host_nodes = self._nodes_np()
        if self.n_workers is None or self.n_workers == 1:
            from pychebyshev_tpu.utils.progress import progress_iter
            out = np.zeros(shape)
            it = progress_iter(np.ndindex(*shape),
                               total=int(np.prod(shape)),
                               enabled=(verbose == 2), desc="build")
            for idx in it:
                point = [float(host_nodes[d][idx[d]])
                         for d in range(self.num_dimensions)]
                out[idx] = float(self.function(point, self.additional_data))
            return out
        from pychebyshev_tpu.utils.parallel_build import evaluate_in_parallel
        points = [
            [float(host_nodes[d][idx[d]]) for d in range(self.num_dimensions)]
            for idx in np.ndindex(*shape)
        ]
        flat = evaluate_in_parallel(self.function, points,
                                    self.additional_data, self.n_workers)
        return flat.reshape(shape)

    def _build_fixed_grid(self, verbose: bool | int = True) -> None:
        with jax.profiler.TraceAnnotation("chebyshev:build_fixed_grid"):
            self._build_fixed_grid_impl(verbose)

    def _build_fixed_grid_impl(self, verbose: bool | int = True) -> None:
        total = int(np.prod(self.n_nodes))
        if verbose:
            print(f"Building {self.num_dimensions}D Chebyshev approximation "
                  f"({total:,} evaluations)...")

        start = time.time()
        self._cached_error_estimate = None

        values = self._evaluate_on_grid(verbose)
        self.n_evaluations = total

        if isinstance(values, np.ndarray):
            finite = bool(np.isfinite(values).all())
        else:
            # Device result: reduce to one scalar on device — a single
            # tiny readback instead of pulling the whole tensor back.
            finite = bool(jnp.isfinite(values).all())
        if not finite:
            n_bad = int(np.sum(~np.isfinite(np.asarray(values))))
            raise ValueError(
                f"function returned non-finite values at {n_bad} grid "
                f"point(s); build cannot proceed with NaN/Inf in "
                f"tensor_values"
            )
        self.tensor_values = _private_device_f64(values)

        self._compute_grid_data()
        if isinstance(values, np.ndarray):
            self._offer_host_tensor(values)
        self.build_time = time.time() - start

        if verbose:
            total_weights = sum(int(w.shape[0]) for w in self.weights)
            print(f"  Built in {self.build_time:.3f}s "
                  f"({total_weights} weights, {total_weights * 8} bytes)")

    # ------------------------------------------------------------------
    # Evaluation
    # ------------------------------------------------------------------

    def _offer_host_tensor(self, host_values: np.ndarray) -> None:
        """Seed the host eval cache from values already on host.

        Every construction path whose tensor originates on host (host
        oracle builds, ``from_values``, deferred fills, host-side
        algebra) calls this right after binding ``tensor_values``, so
        the single-point eval path never has to read the tensor back
        through the device tunnel (a 1.3 MB readback costs seconds on a
        relayed TPU; the host copy is free — it is the source array).
        """
        grid = getattr(self, "_host_grid", None)
        if grid is None:
            return
        # ALWAYS copy: the source may be a caller-owned array (e.g. the
        # from_values input) that the caller later mutates — the cache
        # must match the immutable device tensor, not live user memory.
        self._host_cache = (self.tensor_values, {
            "tensor": np.array(host_values, dtype=np.float64, order="C"),
            **_with_padded_rows(grid),
        })

    def _host_arrays(self):
        """Cached NumPy copies of the grid data for single-point paths.

        Single queries through the device would pay jit dispatch (and, on
        remote TPUs, tunnel round-trips) per call; the reference's
        single-query contract is ~65 us, so single-point eval runs on
        host BLAS against these cached copies.  The cache holds a strong
        reference to the tensor it was built from and validates with an
        ``is`` check — device arrays are immutable and every mutating
        operation rebinds the attribute, and keeping the keyed object
        alive rules out the id-reuse staleness an id()-keyed cache would
        allow.  Host-originating tensors pre-seed the cache
        (``_offer_host_tensor``); only device-computed tensors pay a
        one-time readback here.
        """
        cache = getattr(self, "_host_cache", None)
        if cache is None or cache[0] is not self.tensor_values:
            # contiguity matters: diffs_t must be C-contiguous exactly
            # like _compute_grid_data's host copies, or BLAS takes a
            # different kernel path and results drift in the last ulp
            # (the reference pickle tests pin bitwise reproducibility)
            grid = getattr(self, "_host_grid", None) or {
                "nodes": [np.asarray(a) for a in self.nodes],
                "weights": [np.asarray(a) for a in self.weights],
                "diffs_t": [np.ascontiguousarray(np.asarray(a).T)
                            for a in self.diff_matrices],
            }
            grid = _with_padded_rows(grid)
            cache = (self.tensor_values,
                     {"tensor": np.asarray(self.tensor_values), **grid})
            self._host_cache = cache
        return cache[1]

    @staticmethod
    def _host_point(point, ns):
        """Normalize a query point to a 1-D length-d float64 array.

        The reference reads one coordinate per dim as ``point[d]``, and
        numpy broadcasting forgives odd shapes there (column vectors,
        trailing extra rows); normalize to the same effective
        coordinates so those inputs keep working.
        """
        pt = np.asarray(point, dtype=np.float64)
        if pt.ndim != 1 or pt.shape[0] != len(ns):
            pt = np.array([float(np.ravel(pt[d])[0])
                           for d in range(len(ns))])
        return pt

    def _host_coeff_rows(self, point):
        """Per-dim normalized barycentric coefficient rows on host.

        The host mirror of ``ops.eval.barycentric_coefficients`` for one
        point: row ``r_d`` satisfies ``r_d . t == interp(t, x_d)`` for any
        1-D slice ``t`` along dim ``d``; a coordinate coinciding with a
        node (within 1e-14) yields a one-hot row.
        """
        h = self._host_arrays()
        ns = h["n_per_dim"]
        pt = self._host_point(point, ns)
        # One set of array ops across all dims (the per-dim loop paid
        # ~100 us of numpy call overhead per query at d=5): padded
        # lanes carry weight 0 / node +inf, which contribute exactly
        # 0.0 to numerator and denominator, so every real lane is
        # bit-identical to the per-dim computation.
        gaps = pt[:, None] - h["nodes_pad"]
        # errstate: an exact-node coincidence makes one lane inf/nan
        # here; that dim is replaced by its one-hot row below.
        with np.errstate(divide="ignore", invalid="ignore"):
            raw = h["weights_pad"] / gaps
            scaled = raw / raw.sum(axis=1)[:, None]
        absg = np.abs(gaps)
        nearest = absg.argmin(axis=1)
        exact = absg[np.arange(len(ns)), nearest] < NODE_COINCIDENCE_TOL
        rows = []
        for d in range(self.num_dimensions):
            if exact[d]:
                row = np.zeros(ns[d])
                row[nearest[d]] = 1.0
            else:
                row = scaled[d, :ns[d]]
            rows.append(row)
        return rows

    def _host_contract(self, rows) -> float:
        """Contract the cached host tensor with one coefficient row per
        dim, highest dim first (each step is a single flattened GEMV)."""
        h = self._host_arrays()
        current = h["tensor"]
        for row in reversed(rows):
            n = current.shape[-1]
            current = (current.reshape(-1, n) @ row).reshape(
                current.shape[:-1])
        return float(current)

    def _host_single_eval(self, point, derivative_order) -> float:
        """Host evaluation of one point (reference ``vectorized_eval``
        semantics, ``barycentric.py:885-949``).

        Derivatives are folded into the coefficient rows — ``r . (D^k t)
        == ((D^T)^k r) . t`` — so a derivative pass is an O(n^2) matvec on
        the row instead of an O(grid.n) pass over the tensor.

        Dispatches to the fused C kernel (``cpp/hosteval.c``) when it is
        available — one call replaces the whole NumPy pipeline, roughly
        halving single-query latency; the NumPy path below is the
        always-available fallback and the semantic definition.
        """
        h = self._host_arrays()
        if "cpack" not in h:
            from pychebyshev_tpu.utils import ceval
            h["cpack"] = ceval.make_pack(h)
        if h["cpack"] is not None:
            from pychebyshev_tpu.utils import ceval
            pt = np.ascontiguousarray(
                self._host_point(point, h["n_per_dim"]))
            val = ceval.eval_single(h["cpack"], pt, derivative_order)
            if val is not None:
                return val
        rows = self._host_coeff_rows(point)
        for d, k in enumerate(derivative_order):
            for _ in range(int(k)):
                rows[d] = h["diffs_t"][d] @ rows[d]
        return self._host_contract(rows)

    def eval(self, point, derivative_order=None, *, derivative_id=None):
        """Reference-path single-point evaluation (host GEMV chain)."""
        derivative_order = self._resolve_derivative_args(
            derivative_order, derivative_id)
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        return self._host_single_eval(point, derivative_order)

    def fast_eval(self, point, derivative_order=None, *, derivative_id=None):
        """Deprecated alias for :meth:`vectorized_eval`."""
        derivative_order = self._resolve_derivative_args(
            derivative_order, derivative_id)
        warnings.warn(
            "fast_eval() is deprecated and will be removed in a future "
            "version. Use vectorized_eval() instead.",
            DeprecationWarning,
            stacklevel=2,
        )
        return self.vectorized_eval(point, derivative_order)

    def vectorized_eval(self, point, derivative_order=None, *,
                        derivative_id=None) -> float:
        """Single-point evaluation (host GEMV chain against cached grid
        copies — ~tens of microseconds; batched queries belong on the
        device via :meth:`vectorized_eval_batch`)."""
        derivative_order = self._resolve_derivative_args(
            derivative_order, derivative_id)
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        return self._host_single_eval(point, derivative_order)

    def vectorized_eval_batch(self, points, derivative_order=None, *,
                              derivative_id=None):
        """Batched evaluation: (N, d) points -> (N,) values.

        The TPU hot path: one fused jit invocation regardless of N.
        Returns a NumPy array for drop-in reference compatibility; use
        :meth:`eval_batch_device` to keep results on device.
        """
        derivative_order = self._resolve_derivative_args(
            derivative_order, derivative_id)
        return np.asarray(self.eval_batch_device(points, derivative_order))

    # Alias so the batch entry point is spelled identically across all
    # four interpolant families (spline/TT/slider expose eval_batch).
    eval_batch = vectorized_eval_batch

    def eval_batch_host(self, points, derivative_order=None, *,
                        derivative_id=None):
        """Batched evaluation computed ON HOST: (N, d) -> (N,).

        The latency-oriented counterpart of
        :meth:`vectorized_eval_batch`: no device dispatch, no jit —
        each point pays one memory-bound C pass over the cached host
        tensor (``cpp/hosteval.c``), so small batches answer in
        N x ~0.1 ms with zero warm-up.  Prefer the device path beyond
        ~10^2-10^4 points (link-dependent); results agree to ~1e-12.
        Falls back to the per-point NumPy path without the C library.
        """
        derivative_order = self._resolve_derivative_args(
            derivative_order, derivative_id)
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        points = np.asarray(points, dtype=np.float64)
        if points.ndim != 2 or points.shape[1] != self.num_dimensions:
            raise ValueError(
                f"points must have shape (N, {self.num_dimensions}), "
                f"got {points.shape}")
        h = self._host_arrays()
        if "cpack" not in h:
            from pychebyshev_tpu.utils import ceval
            h["cpack"] = ceval.make_pack(h)
        if h["cpack"] is not None and len(points):
            from pychebyshev_tpu.utils import ceval
            out = ceval.eval_batch_host(h["cpack"], points,
                                        derivative_order)
            if out is not None:
                return out
        return np.array([self._host_single_eval(p, derivative_order)
                         for p in points])

    def eval_batch_device(self, points, derivative_order=None) -> jax.Array:
        """Device-resident batched evaluation (no host transfer)."""
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        if derivative_order is None:
            derivative_order = [0] * self.num_dimensions
        nodes, weights, diffs = self._grid_tuples()
        pts = jnp.asarray(points, dtype=jnp.float64)
        return eval_ops.eval_batch(
            self.tensor_values, nodes, weights, diffs, pts,
            tuple(int(o) for o in derivative_order))

    def eval_batch_f32(self, points, derivative_order=None, *,
                       use_fused: bool = None) -> jax.Array:
        """Throughput-mode batched evaluation (float32).

        On TPU the default routes through the fused Pallas kernel
        (``ops.pallas_eval``) for grids where its padded-FLOP model
        beats the XLA path (``prefer_fused``; e.g. 11^5: 91M vs 59M
        queries/s per v5e chip, at slightly *better* accuracy — bf16x3
        mega-dot, ~1.2e-5 scale-normalized deviation from f64 vs
        1.5e-5).  Grids whose group products pad poorly onto 128 lanes
        (9^5, 13^5, 33^4, ...) measure faster through the XLA f32 path
        with ``Precision.HIGH`` matmuls and auto-route there — the
        full crossover ladder is in scripts/sweep_stream_kernel.py
        output, docs/performance.md.  Pass ``use_fused`` explicitly to
        force either path.  Delivered accuracy equals the interpolation
        error for typical grids (see docs/performance.md).
        """
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        if derivative_order is None:
            derivative_order = [0] * self.num_dimensions
        orders = tuple(int(o) for o in derivative_order)
        from pychebyshev_tpu.ops import pallas_eval

        shape = self.tensor_values.shape
        if use_fused is None:
            # Auto: only where the kernel's padded-FLOP model says it
            # beats the XLA path (ops.pallas_eval.prefer_fused); an
            # explicit use_fused=True still forces any supported shape.
            use_fused = (jax.default_backend() == "tpu"
                         and pallas_eval.prefer_fused(shape, jnp.float32))
        nodes, weights, diffs = self._grid_tuples()
        if use_fused and pallas_eval.supports_fused(shape, jnp.float32):
            return pallas_eval.fused_eval_batch(
                self.tensor_values, nodes, weights, diffs, points, orders)
        pts = jnp.asarray(points, dtype=jnp.float32)
        return eval_ops.eval_batch(
            self.tensor_values.astype(jnp.float32),
            tuple(a.astype(jnp.float32) for a in nodes),
            tuple(a.astype(jnp.float32) for a in weights),
            tuple(a.astype(jnp.float32) for a in diffs),
            pts, orders)

    def eval_batch_dd(self, points, derivative_order=None,
                      mode: str = "accurate") -> jax.Array:
        """Near-f64 batched evaluation via exact integer digit GEMMs.

        The accuracy mode for f64-less TPUs (``ops.eval_dd``): operands
        are decomposed into bf16 digit planes whose MXU products
        accumulate exactly, so results deviate ~1e-11 (scale-normalized)
        from the true f64 path — measured ~7.0M queries/s per v5e chip
        on the 11^5 benchmark vs 0.49M for software f64.  Falls back to
        the f64 path for grids outside the digit-plan budget.

        ``mode``: ``"accurate"`` (default; ~1e-11 deviation) or
        ``"fast"`` (fewer digit pairs; ~1e-9-class deviation at higher
        throughput — the measured frontier is in docs/performance.md).
        """
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        if derivative_order is None:
            derivative_order = [0] * self.num_dimensions
        orders = tuple(int(o) for o in derivative_order)
        from pychebyshev_tpu.ops import eval_dd

        if mode not in ("accurate", "fast"):
            raise ValueError(
                f"mode must be 'accurate' or 'fast', got {mode!r}")
        cutoff = (eval_dd.FAST_PAIR_CUTOFF if mode == "fast" else None)

        nodes, weights, diffs = self._grid_tuples()
        # The digit-plane row bound (_WR_SCALE_LOG2's Lebesgue constant)
        # holds only in-domain; out-of-domain batches keep reference
        # extrapolation semantics via the f64 path.
        pts_np = np.asarray(points, dtype=np.float64)
        dom = np.asarray(self.domain, dtype=np.float64)
        out_of_domain = bool(np.any(pts_np < dom[:, 0])
                             or np.any(pts_np > dom[:, 1]))
        if not out_of_domain and eval_dd.supports_dd(
                self.tensor_values.shape):
            return eval_dd.eval_batch_dd(
                self.tensor_values, nodes, weights, diffs, points,
                orders, cutoff=cutoff)
        pts = jnp.asarray(points, dtype=jnp.float64)
        return eval_ops.eval_batch(self.tensor_values, nodes, weights,
                                   diffs, pts, orders)

    def vectorized_eval_batch_multi(self, points, derivative_orders):
        """Batch x multi-spec evaluation -> (N, len(derivative_orders)).

        One fused device call computing e.g. price + all Greeks for the
        whole batch, sharing the per-point barycentric rows across specs
        (TPU extension of the reference's single-point
        ``vectorized_eval_multi``).
        """
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        nodes, weights, diffs = self._grid_tuples()
        pts = jnp.asarray(points, dtype=jnp.float64)
        orders_list = tuple(tuple(int(o) for o in orders)
                            for orders in derivative_orders)
        for orders in orders_list:
            if len(orders) != self.num_dimensions:
                raise ValueError(
                    f"derivative_order length {len(orders)} does not "
                    f"match num_dimensions {self.num_dimensions}"
                )
        if not orders_list:
            return np.zeros((pts.shape[0], 0))
        out = eval_ops.eval_batch_multi(
            self.tensor_values, nodes, weights, diffs, pts, orders_list)
        return np.asarray(out).T

    def vectorized_eval_multi(self, point, derivative_orders):
        """Multiple derivative specs at one point -> list of floats.

        Builds the normalized barycentric rows once (point-dependent) and
        derives each spec's rows from them by folding ``(D^T)^k`` into the
        row — the same sharing the reference achieves by caching per-dim
        weight vectors (``barycentric.py:1049-1112``), expressed in this
        repo's row idiom.  Memoizing on (dim, order) means e.g. six Greek
        specs over 5 dims cost at most a handful of n x n matvecs plus one
        tensor contraction per spec.
        """
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        h = self._host_arrays()
        if "cpack" not in h:
            from pychebyshev_tpu.utils import ceval
            h["cpack"] = ceval.make_pack(h)
        if h["cpack"] is not None:
            # Fused C multi-spec kernel (same suffix sharing, one call);
            # declines odd-shaped legacy inputs, which fall through to
            # the permissive NumPy path below.
            from pychebyshev_tpu.utils import ceval
            pt = np.ascontiguousarray(
                self._host_point(point, h["n_per_dim"]))
            vals = ceval.eval_multi(h["cpack"], pt, derivative_orders)
            if vals is not None:
                return vals
        base = self._host_coeff_rows(point)
        ndim = self.num_dimensions

        row_for = {}  # (dim, order) -> derivative-folded row

        def derived_row(d, k):
            k = int(k)
            if k == 0:
                return base[d]
            if (d, k) not in row_for:
                row_for[(d, k)] = h["diffs_t"][d] @ derived_row(d, k - 1)
            return row_for[(d, k)]

        # Specs sharing a trailing (dim, order) pattern share the
        # partial contraction over those dims — for a Greeks set the
        # expensive first GEMV (the full tensor) is computed once, not
        # once per spec.
        suffix_cache = {}

        def contract_from(spec, d):
            """Tensor with dims d..ndim-1 contracted away."""
            if d == ndim:
                return h["tensor"]
            key = tuple(int(o) for o in spec[d:])
            hit = suffix_cache.get(key)
            if hit is None:
                inner = contract_from(spec, d + 1)
                row = derived_row(d, spec[d])
                n = inner.shape[-1]
                hit = (inner.reshape(-1, n) @ row).reshape(
                    inner.shape[:-1])
                suffix_cache[key] = hit
            return hit

        return [float(contract_from(spec, 0))
                for spec in derivative_orders]

    # Alias for cross-family symmetry (spline/TT/slider spell the
    # multi-spec entry point eval_multi; reference ``barycentric.py``
    # only has vectorized_eval_multi).
    eval_multi = vectorized_eval_multi
    eval_batch_multi = vectorized_eval_batch_multi

    # ------------------------------------------------------------------
    # Derivative-id registry + ergonomics surface
    # ------------------------------------------------------------------

    def is_construction_finished(self) -> bool:
        """True iff this interpolant is built and usable."""
        return self.tensor_values is not None

    def get_constructor_type(self) -> str:
        """Class name (MoCaX getConstructorType convention)."""
        return type(self).__name__

    def get_used_ns(self) -> list:
        """Resolved per-dim node counts."""
        return list(self.n_nodes)

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

    def get_special_points(self):
        """special_points declared at construction (None or empty lists)."""
        return self.special_points

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

    # ------------------------------------------------------------------
    # Error estimation + sensitivity
    # ------------------------------------------------------------------

    @staticmethod
    def _chebyshev_coefficients_1d(values) -> np.ndarray:
        """Chebyshev coefficients from values at ascending Type-I nodes
        (reverse + DCT-II + /n + halve c0 — one cached cosine matmul)."""
        values = np.asarray(values, dtype=np.float64)
        return _coeff_matrix_np(len(values)) @ values

    def _error_estimate_per_dim(self, tail: int = 1) -> List[float]:
        """Per-dim max |coefficient| over the last ``tail`` rows of all
        1-D slices.

        Batched: one cosine-matrix contraction per axis replaces the
        reference's ``np.ndindex`` slice loop (``barycentric.py:1278-1308``).
        """
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        per_dim = []
        for d in range(self.num_dimensions):
            coeffs = values_to_coeffs(self.tensor_values, axis=d)
            n = coeffs.shape[d]
            take = min(max(1, int(tail)), n)
            rows = jax.lax.slice_in_dim(coeffs, n - take, n, axis=d)
            per_dim.append(float(jnp.max(jnp.abs(rows))))
        return per_dim

    def error_estimate(self, tail: int = 1) -> float:
        """Sup-norm error estimate: sum over dims of max |c_{n-1}|
        (Ruiz & Zeron 2021 §3.4; the reference rule, and the default).

        ``tail=2`` reads the last TWO coefficient rows per dim — immune
        to the parity blind spot (an even/odd function about the domain
        center has alternating zero coefficients, so the single last
        coefficient can vanish on a badly under-resolved fit; see
        docs/user-guide/error-driven-construction.md).  Beyond-reference
        extension; the default matches the reference bit-for-bit.
        """
        if tail == 1 and self._cached_error_estimate is not None:
            return self._cached_error_estimate
        total = float(sum(self._error_estimate_per_dim(tail)))
        if tail == 1:
            self._cached_error_estimate = total
        return total

    def sobol_indices(self) -> dict:
        """Analytic first/total-order Sobol indices from the spectral
        expansion."""
        from pychebyshev_tpu.utils.sensitivity import (
            chebyshev_coefficient_tensor,
            sobol_from_coeffs,
        )
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        coeffs = chebyshev_coefficient_tensor(self.tensor_values)
        return sobol_from_coeffs(coeffs, self.num_dimensions)

    def interaction_matrix(self) -> np.ndarray:
        """(d, d) pure pairwise Sobol interaction shares (beyond
        reference; the dense counterpart of
        ``ChebyshevTT.interaction_matrix``).  Zero (to roundoff)
        exactly where the function separates additively — threshold it
        with :meth:`suggest_partition` to pick a slider partition."""
        from pychebyshev_tpu.utils.sensitivity import (
            chebyshev_coefficient_tensor,
            pair_interactions_from_coeffs,
        )
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        coeffs = chebyshev_coefficient_tensor(self.tensor_values)
        return pair_interactions_from_coeffs(coeffs,
                                             self.num_dimensions)

    def suggest_partition(self, threshold: float = 1e-8) -> list:
        """Additive partition implied by :meth:`interaction_matrix`
        (union-find over above-threshold pairs; beyond reference).
        Feed to ``ChebyshevSlider`` (or ``to_tt().to_slider``) for a
        principled sliding-technique decomposition."""
        from pychebyshev_tpu.utils.sensitivity import (
            partition_from_interactions,
        )
        return partition_from_interactions(self.interaction_matrix(),
                                           threshold)
    def get_error_threshold(self):
        """The error_threshold ctor kwarg (target precision), or None."""
        return self.error_threshold

    def get_num_evaluation_points(self) -> int:
        """prod(n_nodes) — where f was (or will be) evaluated."""
        return int(np.prod(self.n_nodes))

    def get_evaluation_points(self) -> np.ndarray:
        """(N, d) grid of evaluation points in C-order."""
        host_nodes = self._nodes_np()
        grids = np.meshgrid(*host_nodes, indexing="ij")
        return np.stack([g.ravel() for g in grids], axis=-1).astype(np.float64)

    def clone(self) -> "ChebyshevApproximation":
        """Independent deep copy (function is not duplicated)."""
        import copy
        return copy.deepcopy(self)

    def differentiate(self, derivative_order) -> "ChebyshevApproximation":
        """A first-class interpolant of the given derivative.

        Applies the spectral differentiation matrices to the value
        tensor ONCE and returns a new approximation whose plain value
        queries are the requested derivative — the dense counterpart of
        ``ChebyshevTT.differentiate`` (beyond the reference surface).
        Useful for serving a fixed Greek as an ordinary object: it
        evaluates at value-query speed, serializes, combines with
        algebra, and can itself be differentiated again.

        Note the derivative of the interpolant is exact for the
        interpolant, not the target function; accuracy follows the usual
        one-order-per-derivative spectral loss.
        """
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        orders = tuple(int(o) for o in derivative_order)
        if len(orders) != self.num_dimensions:
            raise ValueError(
                f"derivative_order length {len(orders)} does not match "
                f"num_dimensions {self.num_dimensions}"
            )
        if any(o < 0 for o in orders):
            raise ValueError("derivative orders must be >= 0")
        from pychebyshev_tpu.ops.eval import apply_derivative_passes
        _, _, diffs = self._grid_tuples()
        new_tensor = apply_derivative_passes(self.tensor_values, diffs,
                                             orders)
        return ChebyshevApproximation._from_grid(self, new_tensor)

    def to_tt(self, max_rank=None, tolerance: float = 1e-12, *,
              order=None, sup_target: float = None):
        """Compress this dense interpolant into a :class:`ChebyshevTT`.

        The inverse of ``ChebyshevTT.to_dense`` (reference
        tensor_train.py:1874-1917): TT-SVD of the value tensor at the
        given relative singular-value ``tolerance`` (beyond the
        reference surface, which only offers the TT-side
        ``from_values`` — tensor_train.py:2870-2965).  On the 5-D
        Black-Scholes benchmark tensor, tolerance 1e-12 compresses
        11^5 values to ranks [1, 11, 23, 48, 8, 1] at 1.7e-12 max
        deviation from the dense f64 evaluation (measured frontier:
        docs/performance.md).  Returns an independent object; grid
        metadata, ``max_derivative_order``, ``additional_data`` and the
        descriptor carry over.

        ``order``: ``None`` keeps the canonical dim order; ``"auto"``
        searches dim permutations (exhaustive for d <= 6, greedy
        adjacent-swap descent beyond) for the cheapest serving rank
        chain — the result stores it as its ``dim_order`` frame, so
        queries stay user-frame; an explicit permutation pins one.

        ``sup_target``: per-bond error budgeting — instead of the
        uniform relative singular-value ``tolerance``, greedily trim
        bond ranks while the reconstruction's MEASURED grid sup
        deviation stays within ``sup_target * max|values|``
        (``models.tt_algorithms.tt_trim_cores``).  The result carries
        ``compression_diagnostics`` (order, bond ranks, measured grid
        sup deviation, chain flops).
        """
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.models.tensor_train import ChebyshevTT
        from pychebyshev_tpu.models import tt_algorithms as tta
        d = self.num_dimensions
        sizes = [int(n) for n in self.n_nodes]
        if max_rank is None:
            # Uncapped: tight tolerances legitimately need bond ranks
            # past max(n_nodes), which is from_values' None default.
            max_rank = max(
                min(int(np.prod(sizes[:k + 1])),
                    int(np.prod(sizes[k + 1:])))
                for k in range(len(sizes) - 1)) if d > 1 else 1
        arr = np.asarray(self.tensor_values, dtype=np.float64)
        # sup_target drives ranks via measured trimming; the SVD then
        # runs tight so trimming owns the whole error budget.
        svd_tol = (tolerance if sup_target is None
                   else min(tolerance, float(sup_target) * 1e-3))

        def _ranks_cost(perm):
            cores = tta.tt_svd_from_tensor(
                arr.transpose(perm), max_rank=max_rank, tol=svd_tol)
            return cores, sum(c.shape[0] * c.shape[1] * c.shape[2]
                              for c in cores)

        if order is None:
            perm = tuple(range(d))
            value_cores, _ = _ranks_cost(perm)
        elif order == "auto":
            if d <= 6:
                import itertools
                perm, (value_cores, best) = None, (None, None)
                for p in itertools.permutations(range(d)):
                    cores, cost = _ranks_cost(p)
                    if best is None or cost < best:
                        perm, value_cores, best = p, cores, cost
            else:
                perm = list(range(d))
                value_cores, best = _ranks_cost(tuple(perm))
                improved = True
                while improved:
                    improved = False
                    for k in range(d - 1):
                        cand = list(perm)
                        cand[k], cand[k + 1] = cand[k + 1], cand[k]
                        cores, cost = _ranks_cost(tuple(cand))
                        if cost < best:
                            perm, value_cores, best = cand, cores, cost
                            improved = True
                perm = tuple(perm)
        else:
            perm = tuple(int(p) for p in order)
            if sorted(perm) != list(range(d)):
                raise ValueError(
                    f"order must be a permutation of range({d}); "
                    f"got {order!r}")
            value_cores, _ = _ranks_cost(perm)

        diagnostics = None
        if sup_target is not None:
            value_cores, diagnostics = tta.tt_trim_cores(
                value_cores, arr.transpose(perm), float(sup_target))
            diagnostics["order"] = list(perm)

        # Every branch builds from the ALREADY-COMPUTED cores (the
        # canonical path used to round-trip through from_values and
        # re-run the identical TT-SVD — 2x the compression cost).
        coeff_cores = [tta.value_core_to_coeff_core(c)
                       for c in value_cores]
        obj = ChebyshevTT._from_coeff_cores(
            coeff_cores,
            [list(self.domain[p]) for p in perm],
            [sizes[p] for p in perm],
            dim_order=list(perm), max_rank=max_rank,
            tolerance=tolerance,
            max_derivative_order=self.max_derivative_order,
            additional_data=self.additional_data,
            descriptor=self.descriptor, method="svd")
        if diagnostics is not None:
            obj.compression_diagnostics = diagnostics
        return obj

    # ------------------------------------------------------------------
    # Plotting (optional host-side extras)
    # ------------------------------------------------------------------

    def plot_convergence(self, target_error=None, max_n=64, ax=None):
        """Error-decay sweep over increasing N (requires matplotlib)."""
        try:
            import matplotlib.pyplot as plt
        except ImportError:
            raise ImportError(
                "plot_convergence requires matplotlib"
            )
        if self.function is None:
            raise RuntimeError(
                "plot_convergence requires a function-bound interpolant "
                "(this object has function=None)"
            )
        ns = list(range(4, max_n + 1, 2))
        errors = []
        for n in ns:
            cheb = ChebyshevApproximation(
                self.function, self.num_dimensions, self.domain,
                n_nodes=[n] * self.num_dimensions,
                additional_data=self.additional_data,
                vectorized=self.vectorized,
            )
            cheb.build(verbose=False)
            errors.append(cheb.error_estimate())
        if ax is None:
            _, ax = plt.subplots()
        ax.semilogy(ns, errors, marker="o")
        ax.set_xlabel("Number of nodes per dimension (N)")
        ax.set_ylabel("Error estimate (log scale)")
        ax.set_title(f"Convergence — {self.num_dimensions}-D Chebyshev")
        if target_error is not None:
            ax.axhline(target_error, linestyle="--", color="red",
                       label=f"target={target_error}")
            ax.legend()
        return ax

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
    # Serialization
    # ------------------------------------------------------------------

    def __getstate__(self) -> dict:
        """Picklable state: arrays as NumPy, no function, version-stamped."""
        from pychebyshev_tpu._version import __version__

        state = self.__dict__.copy()
        state["function"] = None
        # host-side caches are recomputable, not state
        for key in ("_host_cache", "_host_grid", "_host_nodes_cache"):
            state.pop(key, None)
        for key in ("nodes", "weights", "diff_matrices"):
            if state.get(key) is not None:
                state[key] = [np.asarray(a) for a in state[key]]
        if state.get("tensor_values") is not None:
            state["tensor_values"] = np.asarray(state["tensor_values"])
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

        # Backfill fields added in later versions (backward compat).
        defaults = {
            "_cached_error_estimate": None,
            "descriptor": "",
            "additional_data": None,
            "special_points": None,
            "n_workers": None,
            "vectorized": False,
            "max_derivative_order": 2,
            "_derivative_id_registry": {},
            "_derivative_id_to_orders": [],
        }
        for key, val in defaults.items():
            if not hasattr(self, key):
                setattr(self, key, val)
        if not hasattr(self, "_original_n_nodes"):
            self._original_n_nodes = list(self.n_nodes)

        # Re-device arrays.
        if getattr(self, "nodes", None) is not None:
            self.nodes = [jnp.asarray(a, dtype=jnp.float64)
                          for a in self.nodes]
        if getattr(self, "weights", None) is not None:
            self.weights = [jnp.asarray(a, dtype=jnp.float64)
                            for a in self.weights]
        if getattr(self, "diff_matrices", None) is not None:
            self.diff_matrices = [jnp.asarray(a, dtype=jnp.float64)
                                  for a in self.diff_matrices]
        if getattr(self, "tensor_values", None) is not None:
            self.tensor_values = jnp.asarray(self.tensor_values,
                                             dtype=jnp.float64)

    def save(self, path: str | os.PathLike, format: str = "pickle") -> None:
        """Save to pickle (default) or portable ``.pcb`` binary."""
        if self.tensor_values is None:
            raise RuntimeError(
                "Cannot save an unbuilt ChebyshevApproximation. Call "
                "build() first."
            )
        if format == "pickle":
            with open(path, "wb") as f:
                pickle.dump(self, f, protocol=pickle.HIGHEST_PROTOCOL)
        elif format == "binary":
            from pychebyshev_tpu.utils import binary
            with open(path, "wb") as f:
                binary.write_approx(f, self)
        elif format == "npz":
            from pychebyshev_tpu.utils.native_save import write_npz
            write_npz(path, self)
        else:
            raise ValueError(
                f"format must be 'pickle', 'binary', or 'npz'; "
                f"got {format!r}"
            )

    @classmethod
    def load(cls, path: str | os.PathLike) -> "ChebyshevApproximation":
        """Load from pickle, ``.pcb``, or ``.npz`` (magic-sniffed)."""
        from pychebyshev_tpu.utils import binary
        from pychebyshev_tpu.utils import native_save
        if binary.detect_format(path) == "binary":
            with open(path, "rb") as f:
                return binary.read_approx(f)
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

    @staticmethod
    def peek_format_version(filename: str) -> int:
        """Major format version from a .pcb header."""
        from pychebyshev_tpu.utils.binary import peek_format_version
        return peek_format_version(filename)

    # ------------------------------------------------------------------
    # Deferred construction: nodes first, values later
    # ------------------------------------------------------------------

    @staticmethod
    def nodes(num_dimensions: int, domain, n_nodes) -> dict:
        """Grid info without evaluating a function: ``nodes_per_dim``,
        ``full_grid`` (C-order), ``shape``."""
        if len(domain) != num_dimensions or len(n_nodes) != num_dimensions:
            raise ValueError(
                f"len(domain)={len(domain)} and len(n_nodes)={len(n_nodes)} "
                f"must both equal num_dimensions={num_dimensions}"
            )
        nodes_per_dim = [
            nodes_for_dim_np(domain[d][0], domain[d][1], int(n_nodes[d]))
            for d in range(num_dimensions)
        ]
        grids = np.meshgrid(*nodes_per_dim, indexing="ij")
        full_grid = np.column_stack([g.ravel() for g in grids])
        return {
            "nodes_per_dim": nodes_per_dim,
            "full_grid": full_grid,
            "shape": tuple(n_nodes),
        }

    @classmethod
    def get_optimal_n1(cls, function, domain_1d, error_threshold,
                       max_n: int = 64) -> int:
        """Smallest N hitting ``error_threshold`` on a 1-D build."""
        lo, hi = domain_1d
        cheb = cls(function, 1, [[lo, hi]],
                   error_threshold=error_threshold, max_n=max_n)
        cheb._build_with_threshold(verbose=False)
        return int(cheb.n_nodes[0])

    @classmethod
    def from_values(cls, tensor_values, num_dimensions, domain, n_nodes,
                    max_derivative_order: int = 2) -> "ChebyshevApproximation":
        """Fully-built interpolant from pre-computed grid values."""
        tensor_values = np.asarray(tensor_values, dtype=float)

        if len(domain) != num_dimensions or len(n_nodes) != num_dimensions:
            raise ValueError(
                f"len(domain)={len(domain)} and len(n_nodes)={len(n_nodes)} "
                f"must both equal num_dimensions={num_dimensions}"
            )
        expected_shape = tuple(n_nodes)
        if tensor_values.shape != expected_shape:
            raise ValueError(
                f"tensor_values.shape={tensor_values.shape} does not match "
                f"n_nodes={expected_shape}"
            )
        if not np.isfinite(tensor_values).all():
            raise ValueError("tensor_values contains NaN or Inf")
        for d in range(num_dimensions):
            lo, hi = domain[d]
            if lo >= hi:
                raise ValueError(
                    f"domain[{d}]: lo={lo} must be strictly less than "
                    f"hi={hi}"
                )

        obj = object.__new__(cls)
        obj.function = None
        obj.num_dimensions = num_dimensions
        obj.domain = [list(bounds) for bounds in domain]
        obj.n_nodes = list(n_nodes)
        obj._original_n_nodes = list(n_nodes)
        obj.max_derivative_order = max_derivative_order
        obj.error_threshold = None
        obj.max_n = 64
        obj._generate_nodes()
        obj.tensor_values = _private_device_f64(tensor_values)
        obj._compute_grid_data()
        obj._offer_host_tensor(tensor_values)
        obj.build_time = 0.0
        obj.n_evaluations = 0
        obj._cached_error_estimate = None
        obj.special_points = None
        obj.descriptor = ""
        obj.additional_data = None
        obj.n_workers = None
        obj.vectorized = False
        obj._derivative_id_registry = {}
        obj._derivative_id_to_orders = []
        return obj

    @classmethod
    def fit(cls, points, values, num_dimensions, domain, n_nodes, *,
            l2: float = 0.0, sample_weight=None, rcond=None,
            derivative_data=None, engine: str = "host",
            mesh=None, data_axis: str = "dp",
            max_derivative_order: int = 2, additional_data=None
            ) -> "ChebyshevApproximation":
        """Least-squares interpolant from SCATTERED samples.

        Beyond-reference constructor: ``build()``/``from_values``
        require exact values on the Chebyshev grid (reference
        ``barycentric.py`` construction paths); ``fit`` solves for the
        nodal-value tensor that best explains arbitrary in-domain
        samples ``(points, values)`` in the (optionally weighted,
        optionally ``l2``-regularized) least-squares sense — the model
        is linear in its tensor, so the fit is a single linear solve
        (``utils/fitting.py``).  Use it for Monte-Carlo / PDE / quote
        data that never sat on a grid; the result is an ordinary,
        fully-built interpolant (all eval tiers, calculus, serving,
        ``to_tt``, ...).

        Parameters
        ----------
        points : (N, num_dimensions) in-domain sample coordinates.
        values : (N,) sample values.
        l2 : Tikhonov penalty on the nodal values (required > 0 when
            N < prod(n_nodes); recommended for noisy data).
        sample_weight : optional (N,) non-negative weights.
        rcond : pseudoinverse cutoff for the unregularized path.
        derivative_data : optional gradient-enhanced observation blocks
            ``[(points_b, orders_b, values_b[, weight_b]), ...]`` —
            derivative samples (AAD / pathwise Greeks) fitted jointly
            with the values; each block's design rows fold
            ``D_k^{o_k}`` into the barycentric rows, so the system
            stays one linear solve
            (``utils/fitting.py::normalize_derivative_data``).  Block
            rows count toward the determinedness requirement (capped
            at their ``D^o`` rank), letting ``N < prod(n_nodes)``
            value samples still pin the model.
        engine : ``"host"`` (default — exact f64 normal equations);
            ``"device"`` — accumulate ``A^T A`` on the accelerator
            with f32/bf16x3 MXU GEMMs, the throughput tier for
            millions of noisy samples (the ~1e-4-class accumulation
            rounding sits far below Monte-Carlo noise); or
            ``"device-dd"`` — the exact digit-GEMM tier: f64-class
            normal equations (~1e-13 relative vs host) at MXU rates,
            the device engine for tight-accuracy fits.  The solve and
            residual diagnostics stay host-f64 for every engine.
        mesh : optional ``jax.sharding.Mesh`` (device engines only) —
            sample chunks shard over ``data_axis`` and per-device
            Gram/rhs partials ``psum``; the dd tier's integer psums
            make the sharded accumulation bit-identical to the
            single-device one.

        Returns
        -------
        A built ``ChebyshevApproximation``; ``fit_diagnostics`` on the
        result records ``rms`` / ``max_abs_residual`` (training
        residuals), ``n_samples``, ``grid_points``, ``l2``, ``rank``
        (plus per-block ``derivative_blocks`` when derivative data was
        given).
        """
        from pychebyshev_tpu.utils.fitting import fit_dense_tensor

        if len(n_nodes) != num_dimensions or len(domain) != num_dimensions:
            raise ValueError(
                f"len(domain)={len(domain)} and len(n_nodes)="
                f"{len(n_nodes)} must both equal num_dimensions="
                f"{num_dimensions}"
            )
        tensor, diagnostics = fit_dense_tensor(
            points, values, domain, n_nodes, l2=l2,
            sample_weight=sample_weight, rcond=rcond,
            derivative_data=derivative_data, engine=engine,
            mesh=mesh, data_axis=data_axis)
        obj = cls.from_values(tensor, num_dimensions, domain,
                              list(n_nodes),
                              max_derivative_order=max_derivative_order)
        obj.additional_data = additional_data
        obj.fit_diagnostics = diagnostics
        obj.n_evaluations = int(diagnostics["n_samples"])
        return obj

    @classmethod
    def _from_grid(cls, source, tensor_values):
        """New built instance sharing grid arrays from *source* (operator
        factory; arrays are immutable so sharing is free)."""
        obj = object.__new__(cls)
        obj.function = None
        obj.num_dimensions = source.num_dimensions
        obj.domain = [list(b) for b in source.domain]
        obj.n_nodes = list(source.n_nodes)
        obj._original_n_nodes = list(source.n_nodes)
        obj.max_derivative_order = source.max_derivative_order
        obj.error_threshold = None
        obj.max_n = 64
        obj.nodes = list(source.nodes)
        obj.weights = list(source.weights)
        obj.diff_matrices = list(source.diff_matrices)
        src_grid = getattr(source, "_host_grid", None)
        if src_grid is not None:
            obj._host_grid = src_grid  # host copies; sharing is free
        obj.tensor_values = _private_device_f64(tensor_values)
        if isinstance(tensor_values, np.ndarray):
            obj._offer_host_tensor(tensor_values)
        obj.build_time = 0.0
        obj.n_evaluations = 0
        obj._cached_error_estimate = None
        obj.special_points = None
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

    def extrude(self, params) -> "ChebyshevApproximation":
        """Add constant dimensions (partition-of-unity replication)."""
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.extrude_slice import (
            extrude_tensor,
            normalize_extrusion_params,
        )
        sorted_params = normalize_extrusion_params(params,
                                                   self.num_dimensions)
        tensor = self.tensor_values
        nodes = list(self.nodes)
        weights = list(self.weights)
        diffs = list(self.diff_matrices)
        domain = [list(b) for b in self.domain]
        n_nodes = list(self.n_nodes)

        for dim_idx, (lo, hi), n in sorted_params:
            tensor = extrude_tensor(tensor, dim_idx, n)
            new_nodes = nodes_for_dim_np(lo, hi, int(n))
            new_weights = barycentric_weights_np(new_nodes)
            new_diff = differentiation_matrix_np(new_nodes, new_weights)
            nodes.insert(dim_idx, jnp.asarray(new_nodes))
            weights.insert(dim_idx, jnp.asarray(new_weights))
            diffs.insert(dim_idx, jnp.asarray(new_diff))
            domain.insert(dim_idx, [lo, hi])
            n_nodes.insert(dim_idx, int(n))

        return self._assemble(tensor, nodes, weights, diffs, domain, n_nodes)

    def slice(self, params) -> "ChebyshevApproximation":
        """Fix dimensions at values, contracting the tensor barycentrically."""
        if self.tensor_values is None:
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

        tensor = self.tensor_values
        nodes = list(self.nodes)
        weights = list(self.weights)
        diffs = list(self.diff_matrices)
        domain = [list(b) for b in self.domain]
        n_nodes = list(self.n_nodes)

        for dim_idx, value in sorted_params:  # descending order
            tensor = eval_ops.contract_dim_at_value(
                tensor, dim_idx, nodes[dim_idx], weights[dim_idx], value)
            del nodes[dim_idx]
            del weights[dim_idx]
            del diffs[dim_idx]
            del domain[dim_idx]
            del n_nodes[dim_idx]

        return self._assemble(tensor, nodes, weights, diffs, domain, n_nodes)

    def _assemble(self, tensor, nodes, weights, diffs, domain, n_nodes):
        """Internal: build a fresh already-built instance from parts."""
        obj = object.__new__(ChebyshevApproximation)
        obj.function = None
        obj.num_dimensions = len(n_nodes)
        obj.domain = domain
        obj.n_nodes = n_nodes
        obj._original_n_nodes = list(n_nodes)
        obj.max_derivative_order = self.max_derivative_order
        obj.error_threshold = None
        obj.max_n = 64
        obj.nodes = nodes
        obj.weights = weights
        obj.diff_matrices = diffs
        obj.tensor_values = tensor
        obj.build_time = 0.0
        obj.n_evaluations = 0
        obj._cached_error_estimate = None
        obj.special_points = None
        obj.descriptor = ""
        obj.additional_data = None
        obj.n_workers = None
        obj.vectorized = False
        obj._derivative_id_registry = {}
        obj._derivative_id_to_orders = []
        return obj

    # ------------------------------------------------------------------
    # Calculus
    # ------------------------------------------------------------------

    def integrate(self, dims=None, bounds=None):
        """Fejer-1 quadrature over given dims (scalar if all integrated)."""
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.ops.quadrature import (
            fejer1_weights,
            sub_interval_weights,
        )
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

        tensor = self.tensor_values
        nodes = list(self.nodes)
        weights = list(self.weights)
        diffs = list(self.diff_matrices)
        domain = [list(b) for b in self.domain]
        n_nodes = list(self.n_nodes)

        for d in sorted(dims, reverse=True):
            a, b = domain[d]
            scale = (b - a) / 2.0
            bd = per_dim_bounds[dim_to_idx[d]]
            if bd is None:
                quad_w = fejer1_weights(int(n_nodes[d]))
            else:
                t_lo = 2.0 * (bd[0] - a) / (b - a) - 1.0
                t_hi = 2.0 * (bd[1] - a) / (b - a) - 1.0
                quad_w = sub_interval_weights(int(n_nodes[d]), t_lo, t_hi)
            tensor = jnp.tensordot(tensor, jnp.asarray(quad_w * scale),
                                   axes=([d], [0]))
            del nodes[d]
            del weights[d]
            del diffs[d]
            del domain[d]
            del n_nodes[d]

        if len(n_nodes) == 0:
            return float(tensor)
        return self._assemble(tensor, nodes, weights, diffs, domain, n_nodes)

    def integrate_batch(self, bounds, dtype=None) -> np.ndarray:
        """Integrals over a batch of axis-aligned boxes — ONE device call.

        Beyond-reference capability: the reference integrates one box per
        ``integrate(bounds=...)`` call (reference
        ``barycentric.py:2160-2275``); this computes ``int_box f`` for B
        boxes in a single MXU contraction by swapping the batched-eval
        kernel's barycentric rows for per-box sub-interval quadrature
        rows (``ops/integrate.py``).  Typical uses: bucketed expected
        values, bucket probabilities over scenario grids, CDF tables.

        Parameters
        ----------
        bounds : (B, d, 2) array-like — per-box, per-dim (lo, hi) inside
            the domain.  Zero-measure dims (lo == hi) are allowed and
            contribute an exact 0.
        dtype : None (f64 parity, default), ``jnp.float32`` — the
            throughput tier on f64-less TPUs (~1e-5-relative, bf16x3
            GEMM-limited; measured 39.6M boxes/s vs 0.42M software
            f64 on the 11^5 benchmark) — or ``"dd"`` — the near-f64
            digit-GEMM tier (~1e-12-class; falls back to f64 for grids
            outside the digit-plan budget, like :meth:`eval_batch_dd`).

        Returns
        -------
        (B,) ndarray of box integrals.
        """
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.ops.integrate import (
            integrate_box_batch,
            integrate_box_batch_dd,
        )
        from pychebyshev_tpu.utils.calculus import normalize_bounds_batch

        arr = normalize_bounds_batch(bounds, self.domain)
        if isinstance(dtype, str) and dtype == "dd":
            from pychebyshev_tpu.ops.eval_dd import supports_dd
            if supports_dd(tuple(self.tensor_values.shape)):
                out = integrate_box_batch_dd(
                    self.tensor_values,
                    np.asarray(self.domain, dtype=np.float64), arr)
                return np.asarray(out)
            dtype = None    # documented fallback outside the budget
        out = integrate_box_batch(
            self.tensor_values,
            np.asarray(self.domain, dtype=np.float64), arr,
            dtype=(jnp.float64 if dtype is None else dtype))
        return np.asarray(out)

    def partial_integrate_batch(self, dims, bounds, points,
                                derivative_order=None,
                                dtype=None) -> np.ndarray:
        """Batched conditional expectations — integrate over per-scenario
        boxes on ``dims``, evaluate at per-scenario coordinates on the
        rest, in ONE dispatch (beyond reference).

        Equivalent to ``self.integrate(dims, bounds=bounds[b])
        .vectorized_eval(points[b], derivative_order)`` for every
        scenario b, without materializing B intermediate objects: the
        bilinear kernel runs with quadrature rows on ``dims`` and
        (derivative-folded) barycentric rows on the remaining dims
        (``ops.integrate.partial_integrate_eval_batch``).  Typical use:
        expected exposure over an S-bucket per (vol, rate) scenario.

        Parameters
        ----------
        dims : int or sequence — dims to integrate (at least one).
        bounds : (B, len(dims), 2) per-scenario boxes, columns in sorted
            ``dims`` order, inside those dims' domain.
        points : (B, d - len(dims)) coordinates for the remaining dims
            in ascending dim order.
        derivative_order : per-REMAINING-dim orders (ascending dim
            order), or None.
        dtype : None (f64 parity), ``jnp.float32`` (throughput tier),
            or ``"dd"`` — the near-f64 digit-GEMM tier (~1e-11-class;
            falls back to f64 for grids outside the digit-plan budget,
            like :meth:`eval_batch_dd`), so bucketed conditional
            expectations serve at dd accuracy instead of software f64.

        Returns
        -------
        (B,) ndarray.
        """
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.ops.integrate import (
            partial_integrate_eval_batch,
            partial_integrate_eval_batch_dd,
        )
        from pychebyshev_tpu.utils.calculus import (
            validate_partial_integrate_args_batch,
        )

        dims, arr, remaining, pts, rem_orders = \
            validate_partial_integrate_args_batch(
                self.num_dimensions, self.domain, dims, bounds, points,
                derivative_order, max_order=self.max_derivative_order)
        full_orders = [0] * self.num_dimensions
        for k, o in zip(remaining, rem_orders):
            full_orders[k] = o

        if isinstance(dtype, str) and dtype == "dd":
            from pychebyshev_tpu.ops.eval_dd import supports_dd
            if supports_dd(tuple(self.tensor_values.shape)):
                out = partial_integrate_eval_batch_dd(
                    self.tensor_values,
                    np.asarray(self.domain, dtype=np.float64),
                    self.nodes, self.weights, self.diff_matrices,
                    tuple(dims), arr, pts, orders=tuple(full_orders))
                return np.asarray(out)
            dtype = None    # documented fallback outside the budget

        out = partial_integrate_eval_batch(
            self.tensor_values, np.asarray(self.domain, dtype=np.float64),
            self.nodes, self.weights, self.diff_matrices, tuple(dims),
            arr, pts, orders=tuple(full_orders),
            dtype=(jnp.float64 if dtype is None else dtype))
        return np.asarray(out)

    def roots(self, dim=None, fixed=None) -> np.ndarray:
        """Roots along one dimension (others fixed), colleague-matrix method."""
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.calculus import (
            roots_1d,
            validate_calculus_args,
        )
        dim, slice_params = validate_calculus_args(
            self.num_dimensions, dim, fixed, self.domain)
        sliced = self.slice(slice_params) if slice_params else self
        return roots_1d(np.asarray(sliced.tensor_values), sliced.domain[0])

    def minimize(self, dim=None, fixed=None, *, tol=1e-9,
                 max_boxes=5000, polish=True):
        """Minimum of the interpolant.

        With ``dim`` given: the 1-D minimum along that dim with every
        other dim pinned by ``fixed`` (reference semantics,
        ``_calculus.py:300-355``) — returns ``(value, location)`` floats.

        With ``dim=None`` on a multi-dimensional interpolant: the
        CERTIFIED GLOBAL minimum over the whole box (``fixed`` may pin
        any subset of dims) — returns ``(value, point)`` with ``point``
        an ``(ndim,)`` array.  The reference roadmap plans this surface
        (v0.21 "Advanced Calculus") but never shipped it; here it runs
        as branch-and-bound over Chebyshev enclosures in coefficient
        space (``ops/subdivision.py``), certified to ``tol`` unless a
        RuntimeWarning reports the remaining gap.
        """
        return self._optimize(dim, fixed, "min", tol=tol,
                              max_boxes=max_boxes, polish=polish)

    def maximize(self, dim=None, fixed=None, *, tol=1e-9,
                 max_boxes=5000, polish=True):
        """Maximum of the interpolant — see :meth:`minimize` for the
        1-D (``dim`` given) vs certified-global (``dim=None``) forms."""
        return self._optimize(dim, fixed, "max", tol=tol,
                              max_boxes=max_boxes, polish=polish)

    def critical_points(self, fixed=None, *, grad_tol=1e-8, delta=5e-3,
                        max_boxes=50000, separation=1e-6):
        """All interior stationary points, classified.

        Subdivision isolation on the spectral gradient system plus one
        fused batched Newton polish; each result is a
        ``CriticalPoint(point, value, kind)`` with kind one of
        ``"minimum" | "maximum" | "saddle" | "degenerate"`` (Hessian
        eigenvalue test).  ``fixed`` pins a subset of dims first.
        Beyond the reference surface (its roadmap assigns this to the
        unshipped v0.21).
        """
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.globalcalc import critical_points_dense
        return critical_points_dense(
            self, fixed=fixed, grad_tol=grad_tol, delta=delta,
            max_boxes=max_boxes, separation=separation)

    def _optimize(self, dim, fixed, mode, *, tol=1e-9, max_boxes=5000,
                  polish=True):
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        if dim is None and self.num_dimensions > 1:
            from pychebyshev_tpu.utils.globalcalc import (
                global_optimize_dense)
            return global_optimize_dense(
                self, mode, fixed, tol=tol, max_boxes=max_boxes,
                polish=polish)
        from pychebyshev_tpu.utils.calculus import (
            optimize_1d,
            validate_calculus_args,
        )
        dim, slice_params = validate_calculus_args(
            self.num_dimensions, dim, fixed, self.domain)
        sliced = self.slice(slice_params) if slice_params else self
        return optimize_1d(
            np.asarray(sliced.tensor_values), np.asarray(sliced.nodes[0]),
            np.asarray(sliced.weights[0]),
            np.asarray(sliced.diff_matrices[0]),
            sliced.domain[0], mode=mode)

    def _scenario_slice_values(self, dim, fixed_cols, batch):
        """(B, n) values of the 1-D slice along *dim* for B scenarios —
        one fused eval_batch over the dim's own nodes (exact: a
        polynomial resampled at its Type-I nodes)."""
        from pychebyshev_tpu.utils.calculus import scenario_slice_points
        pts = scenario_slice_points(
            self.num_dimensions, dim, fixed_cols, batch,
            np.asarray(self.nodes[dim]))
        vals = np.asarray(self.vectorized_eval_batch(
            pts, [0] * self.num_dimensions))
        return vals.reshape(batch, -1)

    def roots_batch(self, dim=None, fixed=None) -> list:
        """Roots along *dim* for a BATCH of scenarios — beyond reference.

        ``fixed`` maps every other dim to a scalar or a (B,) array of
        scenario values; returns a list of B sorted root arrays.  One
        fused device resampling dispatch plus one stacked colleague
        eigensolve replace B ``roots()`` calls — use it for exercise
        boundaries / breakevens across scenario grids.
        """
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.calculus import (
            roots_1d_batch,
            validate_calculus_args_batch,
        )
        dim, cols, batch = validate_calculus_args_batch(
            self.num_dimensions, dim, fixed, self.domain)
        vals = self._scenario_slice_values(dim, cols, batch)
        return roots_1d_batch(vals, self.domain[dim])

    def minimize_batch(self, dim=None, fixed=None):
        """Batched :meth:`minimize`: ((B,) min values, (B,) locations)
        for scenario arrays in ``fixed`` — beyond reference."""
        return self._optimize_batch(dim, fixed, "min")

    def maximize_batch(self, dim=None, fixed=None):
        """Batched :meth:`maximize`: ((B,) max values, (B,) locations)
        for scenario arrays in ``fixed`` — beyond reference."""
        return self._optimize_batch(dim, fixed, "max")

    def _optimize_batch(self, dim, fixed, mode):
        if self.tensor_values is None:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.calculus import (
            optimize_1d_batch,
            validate_calculus_args_batch,
        )
        dim, cols, batch = validate_calculus_args_batch(
            self.num_dimensions, dim, fixed, self.domain)
        vals = self._scenario_slice_values(dim, cols, batch)
        return optimize_1d_batch(
            vals, np.asarray(self.nodes[dim]),
            np.asarray(self.weights[dim]),
            np.asarray(self.diff_matrices[dim]),
            self.domain[dim], mode=mode)

    # ------------------------------------------------------------------
    # Arithmetic operators
    # ------------------------------------------------------------------

    def __add__(self, other):
        if type(self) is not type(other):
            return NotImplemented
        from pychebyshev_tpu.utils.algebra import check_compatible
        check_compatible(self, other)
        return ChebyshevApproximation._from_grid(
            self, self.tensor_values + other.tensor_values)

    def compose(self, g) -> "ChebyshevApproximation":
        """Scalar-function composition ``g(f(x))`` as a new interpolant:
        ``g`` (vectorized over arrays) applied to the value tensor —
        the interpolant of ``g∘f`` sampled at this grid (beyond the
        reference surface).  Accurate when the grid resolves ``g∘f``;
        check ``result.error_estimate()``."""
        # Pin the tensor dtype: a bool- or f32-returning g must not
        # silently downgrade the f64 end-to-end invariant.
        vals = jnp.asarray(g(self.tensor_values),
                           dtype=self.tensor_values.dtype)
        if vals.shape != self.tensor_values.shape:
            raise ValueError(
                f"g must map values elementwise; output shape "
                f"{vals.shape} != {self.tensor_values.shape}"
            )
        return ChebyshevApproximation._from_grid(self, vals)

    def hadamard(self, other) -> "ChebyshevApproximation":
        """Node-wise product surrogate: interpolant of ``f·g`` sampled
        at the shared grid (beyond the reference surface, which rejects
        interpolant x interpolant multiplication outright).

        The result interpolates the PRODUCT OF THE INTERPOLANTS at the
        grid nodes — since the product roughly doubles the polynomial
        degree, it is accurate only when the shared grid resolves the
        product (check ``result.error_estimate()``).  Natural use:
        composing surrogates, e.g. payoff x discount factor.
        """
        if type(self) is not type(other):
            raise TypeError(
                f"hadamard requires another {type(self).__name__}, got "
                f"{type(other).__name__}"
            )
        from pychebyshev_tpu.utils.algebra import check_compatible
        check_compatible(self, other)
        return ChebyshevApproximation._from_grid(
            self, self.tensor_values * other.tensor_values)

    def __sub__(self, other):
        if type(self) is not type(other):
            return NotImplemented
        from pychebyshev_tpu.utils.algebra import check_compatible
        check_compatible(self, other)
        return ChebyshevApproximation._from_grid(
            self, self.tensor_values - other.tensor_values)

    def __mul__(self, scalar):
        from pychebyshev_tpu.utils.algebra import is_scalar
        if not is_scalar(scalar):
            return NotImplemented
        return ChebyshevApproximation._from_grid(
            self, self.tensor_values * float(scalar))

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
        from pychebyshev_tpu.utils.algebra import check_compatible
        check_compatible(self, other)
        self.tensor_values = self.tensor_values + other.tensor_values
        self._cached_error_estimate = None
        return self

    def __isub__(self, other):
        from pychebyshev_tpu.utils.algebra import check_compatible
        check_compatible(self, other)
        self.tensor_values = self.tensor_values - other.tensor_values
        self._cached_error_estimate = None
        return self

    def __imul__(self, scalar):
        from pychebyshev_tpu.utils.algebra import is_scalar
        if not is_scalar(scalar):
            return NotImplemented
        self.tensor_values = self.tensor_values * float(scalar)
        self._cached_error_estimate = None
        return self

    def __itruediv__(self, scalar):
        from pychebyshev_tpu.utils.algebra import is_scalar
        if not is_scalar(scalar):
            return NotImplemented
        return self.__imul__(1.0 / float(scalar))

    # ------------------------------------------------------------------
    # Printing
    # ------------------------------------------------------------------

    def __repr__(self) -> str:
        built = self.tensor_values is not None
        return (f"ChebyshevApproximation(dims={self.num_dimensions}, "
                f"nodes={self.n_nodes}, built={built})")

    def __str__(self) -> str:
        built = self.tensor_values is not None
        has_none = any(n is None for n in self.n_nodes)
        total_nodes_str = ("auto" if has_none
                           else f"{int(np.prod(self.n_nodes)):,}")
        status = "built" if built else "not built"

        max_display = 6
        if self.num_dimensions > max_display:
            nodes_str = ("[" + ", ".join(str(n)
                         for n in self.n_nodes[:max_display]) + ", ...]")
            domain_str = (" x ".join(f"[{lo}, {hi}]" for lo, hi
                          in self.domain[:max_display]) + " x ...")
        else:
            nodes_str = str(self.n_nodes)
            domain_str = " x ".join(f"[{lo}, {hi}]"
                                    for lo, hi in self.domain)

        lines = [
            f"ChebyshevApproximation ({self.num_dimensions}D, {status})",
            f"  Nodes:       {nodes_str} ({total_nodes_str} total)",
            f"  Domain:      {domain_str}",
        ]
        if built:
            lines.append(f"  Build:       {self.build_time:.3f}s, "
                         f"{self.n_evaluations:,} evaluations")
            lines.append(f"  Error est:   {self.error_estimate():.2e}")
        lines.append(f"  Derivatives: up to order {self.max_derivative_order}")
        return "\n".join(lines)
