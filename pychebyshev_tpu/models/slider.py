"""ChebyshevSlider: additive (sliding-technique) decomposition.

API-parity target: reference ``slider.py`` (class ``ChebyshevSlider``,
1499 lines; Ruiz & Zeron 2021, ch. 7).  Approximates
``f(x) ~= f(z) + sum_i [s_i(x_{G_i}) - f(z)]`` over a user partition of
dims with pivot z; each slide is a low-dimensional device-resident
:class:`ChebyshevApproximation`, so build cost is the *sum* of per-group
grid sizes instead of their product.

TPU additions over the reference surface: an ``eval_batch`` that sums the
slides' fused batched kernels (the reference only has per-point eval),
and ``vectorized`` build functions (one batched call per slide grid).
"""

from __future__ import annotations

import os
import pickle
import time
import warnings
from typing import Callable, List

import numpy as np

from pychebyshev_tpu.models.approximation import ChebyshevApproximation

__all__ = ["ChebyshevSlider"]


class ChebyshevSlider:
    """Additive Chebyshev decomposition around a pivot point.

    Parameters mirror the reference ctor (``slider.py:80-126``); the
    extra ``vectorized`` kwarg marks ``function`` as batch-capable.
    """

    def __init__(self, function: Callable, num_dimensions: int, domain,
                 n_nodes, partition, pivot_point,
                 max_derivative_order: int = 2, additional_data=None, *,
                 vectorized: bool = False):
        from pychebyshev_tpu import Domain, Ns
        if isinstance(domain, Domain):
            domain = list(domain.bounds)
        if isinstance(n_nodes, Ns):
            n_nodes = list(n_nodes.counts)

        self.function = function
        self.num_dimensions = num_dimensions
        self.domain = [list(b) for b in domain]
        self.n_nodes = list(n_nodes)
        self.partition = [list(g) for g in partition]
        self.pivot_point = list(pivot_point)
        self.max_derivative_order = max_derivative_order
        self.descriptor: str = ""
        self.additional_data = additional_data
        self.vectorized = bool(vectorized)

        if any(len(g) == 0 for g in self.partition):
            raise ValueError("Partition groups must be non-empty")
        all_dims = sorted(d for group in self.partition for d in group)
        if all_dims != list(range(num_dimensions)):
            raise ValueError(
                f"Partition must cover all dimensions "
                f"0..{num_dimensions - 1} exactly once. "
                f"Got dimensions: {all_dims}"
            )

        self._dim_to_slide = {}
        for slide_idx, group in enumerate(self.partition):
            for d in group:
                self._dim_to_slide[d] = slide_idx

        self.slides: List[ChebyshevApproximation] = []
        self.pivot_value: float = 0.0
        self._built = False
        self._cached_error_estimate = None
        self._derivative_id_registry: dict = {}
        self._derivative_id_to_orders: list = []

    # ------------------------------------------------------------------
    # Build
    # ------------------------------------------------------------------

    def build(self, verbose: bool | int = True) -> None:
        """Build one low-dim approximation per group (off-group dims fixed
        at the pivot)."""
        if self.function is None:
            raise RuntimeError(
                "Cannot build: no function assigned. "
                "This object was created via load() or a factory."
            )
        start = time.time()
        self._cached_error_estimate = None

        if self.vectorized:
            pivot_arr = np.asarray([self.pivot_point], dtype=np.float64)
            self.pivot_value = float(np.asarray(
                self.function(pivot_arr, self.additional_data)).reshape(-1)[0])
        else:
            self.pivot_value = float(
                self.function(self.pivot_point, self.additional_data))

        total_evals = self.total_build_evals
        if verbose:
            print(f"Building {self.num_dimensions}D Chebyshev Slider "
                  f"({len(self.partition)} slides, {total_evals:,} "
                  f"evaluations vs {int(np.prod(self.n_nodes)):,} for "
                  f"full tensor)...")

        from pychebyshev_tpu.utils.progress import progress_iter

        self.slides = []
        for slide_idx, group in enumerate(progress_iter(
                self.partition, total=len(self.partition),
                enabled=(verbose == 2), desc="Building slides")):
            slide_domain = [self.domain[d] for d in group]
            slide_n_nodes = [self.n_nodes[d] for d in group]
            slide_func = self._make_slide_func(group)

            slide = ChebyshevApproximation(
                slide_func, len(group), slide_domain, slide_n_nodes,
                max_derivative_order=self.max_derivative_order,
                additional_data=self.additional_data,
                vectorized=self.vectorized,
            )
            slide.build(verbose=False)
            self.slides.append(slide)
            if verbose:
                print(f"  Slide {slide_idx + 1}/{len(self.partition)}: "
                      f"dims {group}, "
                      f"{int(np.prod(slide_n_nodes)):,} evals")

        if verbose:
            print(f"Build complete in {time.time() - start:.3f}s")
        self._built = True

    def _make_slide_func(self, group):
        """Slide closure: fills off-group dims with the pivot."""
        pivot = list(self.pivot_point)
        function = self.function
        if self.vectorized:
            group_arr = np.asarray(group, dtype=np.intp)
            pivot_arr = np.asarray(pivot, dtype=np.float64)

            def slide_func(sub_points, data):
                sub_points = np.asarray(sub_points, dtype=np.float64)
                full = np.tile(pivot_arr, (sub_points.shape[0], 1))
                full[:, group_arr] = sub_points
                return function(full, data)
        else:
            def slide_func(sub_point, data):
                full_point = list(pivot)
                for local_i, global_d in enumerate(group):
                    full_point[global_d] = sub_point[local_i]
                return function(full_point, data)
        return slide_func

    # ------------------------------------------------------------------
    # Derivative-id registry
    # ------------------------------------------------------------------

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
    # Evaluation
    # ------------------------------------------------------------------

    def eval(self, point, derivative_order=None, *, derivative_id=None
             ) -> float:
        """Eq. 7.5 sliding sum; derivatives route to the owning slide
        (cross-group mixed partials are exactly 0)."""
        if not self._built:
            raise RuntimeError("Call build() before eval().")
        derivative_order = self._resolve_derivative_args(
            derivative_order, derivative_id)

        if any(o > 0 for o in derivative_order):
            active_slides = {
                self._dim_to_slide[d]
                for d, order in enumerate(derivative_order) if order > 0
            }
            if len(active_slides) > 1:
                return 0.0
            slide_idx = active_slides.pop()
            group = self.partition[slide_idx]
            sub_point = [point[d] for d in group]
            sub_deriv = [derivative_order[d] for d in group]
            return self.slides[slide_idx].vectorized_eval(
                sub_point, sub_deriv)

        result = self.pivot_value
        for slide_idx, group in enumerate(self.partition):
            sub_point = [point[d] for d in group]
            slide_val = self.slides[slide_idx].vectorized_eval(
                sub_point, [0] * len(group))
            result += slide_val - self.pivot_value
        return result

    def eval_multi(self, point, derivative_orders) -> List[float]:
        """Multiple derivative specs at one point."""
        return [self.eval(point, do) for do in derivative_orders]

    # Cross-family naming symmetry (the dense class spells these
    # vectorized_*; reference slider.py has neither spelling batched).
    vectorized_eval = eval
    vectorized_eval_multi = eval_multi

    def eval_batch(self, points, derivative_order=None, *,
                   derivative_id=None) -> np.ndarray:
        """Batched evaluation: one fused device call per slide.

        TPU-native extension beyond the reference surface (which only
        offers per-point eval); values sum the slides' batched kernels,
        derivative specs route to the owning slide's batched kernel.
        """
        if not self._built:
            raise RuntimeError("Call build() before eval_batch().")
        points = np.asarray(points, dtype=np.float64)
        n = points.shape[0]
        if derivative_order is not None or derivative_id is not None:
            derivative_order = self._resolve_derivative_args(
                derivative_order, derivative_id)
        if derivative_order is None:
            derivative_order = [0] * self.num_dimensions
        if len(derivative_order) != self.num_dimensions:
            raise ValueError(
                f"derivative_order length {len(derivative_order)} does "
                f"not match num_dimensions {self.num_dimensions}"
            )

        if any(o > 0 for o in derivative_order):
            active_slides = {
                self._dim_to_slide[d]
                for d, order in enumerate(derivative_order) if order > 0
            }
            if len(active_slides) > 1:
                return np.zeros(n)
            slide_idx = active_slides.pop()
            group = self.partition[slide_idx]
            sub_deriv = [derivative_order[d] for d in group]
            return self.slides[slide_idx].vectorized_eval_batch(
                points[:, group], sub_deriv)

        # Value path: every slide's batched kernel in ONE jitted
        # dispatch (S separate calls would pay S device round-trips).
        from pychebyshev_tpu.ops.slider_eval import slider_value_batch
        slide_data = tuple(
            (s.tensor_values,) + s._grid_tuples() for s in self.slides)
        groups = tuple(tuple(int(d) for d in g) for g in self.partition)
        out = slider_value_batch(slide_data, self.pivot_value, groups,
                                 points)
        return np.asarray(out)

    vectorized_eval_batch = eval_batch

    def eval_batch_dd(self, points, derivative_order=None,
                      mode: str = "accurate") -> np.ndarray:
        """Near-f64 batched evaluation via one digit-GEMM.

        The slider analog of the dense/TT ``eval_batch_dd``
        (``ops.slider_eval.slider_batch_dd``): the additive sum
        collapses to a single contraction of the concatenated per-slide
        barycentric row blocks against the stacked slide tensors, run
        as exact integer bf16 digit GEMMs — f64-class accuracy without
        software f64.  Derivative specs keep reference routing (owning
        slide only; cross-group partials are exact zeros).  Falls back
        to the f64 path when slide shapes exceed the digit budget.

        ``mode``: ``"accurate"`` (default) or ``"fast"``.
        """
        if not self._built:
            raise RuntimeError("Call build() before eval_batch_dd().")
        if mode not in ("accurate", "fast"):
            raise ValueError(
                f"mode must be 'accurate' or 'fast', got {mode!r}")
        points = np.asarray(points, dtype=np.float64)
        if derivative_order is None:
            derivative_order = [0] * self.num_dimensions
        if len(derivative_order) != self.num_dimensions:
            raise ValueError(
                f"derivative_order length {len(derivative_order)} does "
                f"not match num_dimensions {self.num_dimensions}"
            )
        from pychebyshev_tpu.ops import eval_dd as _dd
        from pychebyshev_tpu.ops.slider_eval import (
            slider_batch_dd,
            slider_dd_plan,
        )

        slide_data = tuple(
            (s.tensor_values,) + s._grid_tuples() for s in self.slides)
        groups = tuple(tuple(int(d) for d in g) for g in self.partition)
        shapes = [np.shape(sd[0]) for sd in slide_data]
        # Out-of-domain rows exceed the digit-plane scale bound (the
        # Lebesgue constant only covers in-domain points); keep
        # reference extrapolation semantics via the f64 path.
        dom = np.asarray(self.domain, dtype=np.float64)
        out_of_domain = bool(np.any(points < dom[:, 0])
                             or np.any(points > dom[:, 1]))
        if out_of_domain or not slider_dd_plan(shapes)["ok"]:
            return self.eval_batch(points, derivative_order)
        cutoff = (_dd.FAST_PAIR_CUTOFF if mode == "fast" else None)
        out = slider_batch_dd(slide_data, self.pivot_value, groups,
                              points, orders=derivative_order,
                              cutoff=cutoff)
        return np.asarray(out)

    def _multi_spec_plans(self, orders_list):
        """Routing plan per derivative spec, under Eq. 7.5's additive
        decomposition: ``("value",)`` for a pure value spec,
        ``("zero",)`` when the spec crosses slide groups (mixed
        partials vanish identically), else ``("slide", idx,
        sub_orders)`` naming the one owning slide.  Shared by the
        class's fused batch path and ``serving.MultiSpecEvaluator`` so
        routing semantics cannot diverge."""
        plan = []
        for orders in orders_list:
            if len(orders) != self.num_dimensions:
                raise ValueError(
                    f"derivative_order length {len(orders)} does not "
                    f"match num_dimensions {self.num_dimensions}"
                )
            active = {self._dim_to_slide[d]
                      for d, o in enumerate(orders) if o > 0}
            if not active:
                plan.append(("value",))
            elif len(active) > 1:
                plan.append(("zero",))
            else:
                idx = active.pop()
                group = self.partition[idx]
                plan.append(("slide", idx,
                             tuple(orders[d] for d in group)))
        return plan

    def vectorized_eval_batch_multi(self, points, derivative_orders):
        """Batch x multi-spec evaluation -> (N, len(derivative_orders)).

        One jitted dispatch for a whole slider Greek report
        (``ops.slider_eval.slider_multi_batch``): the additive value
        sum runs at most once, each derivative spec adds one owning-
        slide kernel, and cross-group mixed partials are identically
        zero by the decomposition — vs one dispatch per spec when
        looping ``eval_batch``.
        """
        if not self._built:
            raise RuntimeError(
                "Call build() before vectorized_eval_batch_multi()."
            )
        points = np.asarray(points, dtype=np.float64)
        orders_list = tuple(tuple(int(o) for o in orders)
                            for orders in derivative_orders)
        if not orders_list:
            return np.zeros((points.shape[0], 0))
        plan = self._multi_spec_plans(orders_list)

        from pychebyshev_tpu.ops.slider_eval import slider_multi_batch
        slide_data = tuple(
            (s.tensor_values,) + s._grid_tuples() for s in self.slides)
        groups = tuple(tuple(int(d) for d in g) for g in self.partition)
        out = slider_multi_batch(slide_data, self.pivot_value, groups,
                                 tuple(plan), points)
        return np.asarray(out).T

    eval_batch_multi = vectorized_eval_batch_multi

    # ------------------------------------------------------------------
    # Error estimation + properties
    # ------------------------------------------------------------------

    def error_estimate(self, tail: int = 1) -> float:
        """Sum of per-slide estimates (every slide contributes to every
        point; cross-group interaction error is not included).

        ``tail=2`` threads the parity-robust variant through every
        slide (see ChebyshevApproximation.error_estimate)."""
        if not self._built:
            raise RuntimeError("Call build() before error_estimate().")
        if tail == 1 and self._cached_error_estimate is not None:
            return self._cached_error_estimate
        est = sum(slide.error_estimate(tail) for slide in self.slides)
        if tail == 1:
            self._cached_error_estimate = est
        return est

    def sobol_indices(self) -> dict:
        """Analytic Sobol indices from the additive decomposition.

        Beyond reference (its ``slider.py`` has no sensitivity surface):
        the slider form f ≈ const + Σ_G g_G(x_G) with independent inputs
        makes cross-group interactions exactly zero, so the global
        variance is the sum of per-slide variances and each slide's
        internal Sobol structure (dense spectral formula,
        ``utils.sensitivity``) scales by V_G / V_total.  Indices are
        keyed by original dim index, matching the dense/TT surface.
        """
        if not self._built:
            raise RuntimeError("Call build() before sobol_indices().")
        from pychebyshev_tpu.utils.sensitivity import (
            chebyshev_coefficient_tensor,
            sobol_from_coeffs,
        )
        per_slide = [
            sobol_from_coeffs(
                chebyshev_coefficient_tensor(slide.tensor_values),
                len(group))
            for group, slide in zip(self.partition, self.slides)
        ]
        # sobol_from_coeffs variances carry the unnormalized Chebyshev
        # measure mass pi^{ndim of that tensor}; divide it out so slides
        # over different group sizes combine consistently.
        v_norm = [res["variance"] / np.pi ** len(group)
                  for group, res in zip(self.partition, per_slide)]
        v_total_norm = sum(v_norm)
        first = {}
        total = {}
        for group, res, v in zip(self.partition, per_slide, v_norm):
            scale = v / v_total_norm if v_total_norm > 0 else 0.0
            for j, d in enumerate(group):
                first[d] = res["first_order"][j] * scale
                total[d] = res["total_order"][j] * scale
        return {
            "first_order": dict(sorted(first.items())),
            "total_order": dict(sorted(total.items())),
            # report in the dense convention (mass pi^num_dimensions)
            "variance": v_total_norm * np.pi ** self.num_dimensions,
        }

    def interaction_matrix(self) -> np.ndarray:
        """(d, d) pure pairwise Sobol interaction shares (beyond
        reference, matching the dense/TT surface).

        Cross-group entries are EXACTLY zero by the additive form;
        within a multi-dim group the slide's own pair shares scale by
        its variance fraction.
        """
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.sensitivity import (
            chebyshev_coefficient_tensor,
            pair_interactions_from_coeffs,
        )
        out = np.zeros((self.num_dimensions, self.num_dimensions))
        v_norm = []
        slide_pairs = []
        for group, slide in zip(self.partition, self.slides):
            coeffs = chebyshev_coefficient_tensor(slide.tensor_values)
            pairs, variance = pair_interactions_from_coeffs(
                coeffs, len(group), return_variance=True)
            v_norm.append(variance / np.pi ** len(group))
            slide_pairs.append(pairs)
        v_total = sum(v_norm)
        if v_total <= 0:
            return out
        for group, pairs, v in zip(self.partition, slide_pairs, v_norm):
            scale = v / v_total
            for a, da in enumerate(group):
                for b, db in enumerate(group):
                    out[da, db] = pairs[a, b] * scale
        return out

    def suggest_partition(self, threshold: float = 1e-8) -> list:
        """Additive partition implied by :meth:`interaction_matrix`
        (beyond reference).  Never coarser than the slider's own
        partition — but it can be FINER, when a multi-dim group's dims
        turn out not to interact within the slide."""
        from pychebyshev_tpu.utils.sensitivity import (
            partition_from_interactions,
        )
        return partition_from_interactions(self.interaction_matrix(),
                                           threshold)
    @property
    def total_build_evals(self) -> int:
        """Sum over groups of their grid sizes."""
        return sum(int(np.prod([self.n_nodes[d] for d in group]))
                   for group in self.partition)

    # ------------------------------------------------------------------
    # Serialization + ergonomics
    # ------------------------------------------------------------------

    def __getstate__(self) -> dict:
        from pychebyshev_tpu._version import __version__
        state = self.__dict__.copy()
        state["function"] = None
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
            "vectorized": False,
            "max_derivative_order": 2,
            "_derivative_id_registry": {},
            "_derivative_id_to_orders": [],
        }
        for key, val in defaults.items():
            if not hasattr(self, key):
                setattr(self, key, val)

    def is_construction_finished(self) -> bool:
        """True iff built and usable."""
        return self._built

    def get_constructor_type(self) -> str:
        """Class name."""
        return type(self).__name__

    def get_used_ns(self) -> list:
        """Per-dim node counts."""
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

    def get_special_points(self):
        """Always None — sliders have no special-point surface."""
        return None

    def get_error_threshold(self):
        """Always None — slider builds have no auto-N threshold mode."""
        return None

    def get_num_evaluation_points(self) -> int:
        """Slide grid points (pivot singleton excluded)."""
        return int(self.total_build_evals)

    def get_evaluation_points(self) -> np.ndarray:
        """Slide grids lifted into d-D space (off-group dims at pivot)."""
        pivot = np.array(self.pivot_point, dtype=np.float64)
        rows = []
        for slide, group in zip(self.slides, self.partition):
            grid = slide.get_evaluation_points()
            full = np.tile(pivot, (len(grid), 1))
            full[:, group] = grid
            rows.append(full)
        return np.concatenate(rows, axis=0)

    def clone(self) -> "ChebyshevSlider":
        """Independent deep copy (function not duplicated)."""
        import copy
        return copy.deepcopy(self)

    def differentiate(self, derivative_order) -> "ChebyshevSlider":
        """A first-class slider of the given derivative.

        Differentiates the additive decomposition term-by-term and
        returns a new slider on the same partition — the slider
        counterpart of the dense/TT/spline methods, completing the 4/4
        common surface (beyond the reference, whose slider exposes
        derivatives only through per-call routing — reference
        slider.py eval paths).

        Under ``f = p + sum_g (s_g - p)``: if the requested orders are
        all zero the slider is copied; if they touch exactly one group,
        that slide differentiates spectrally and every other term
        vanishes (a slide never depends on foreign dims); if they span
        more than one group, the derivative is identically zero —
        the same exact-zero cross-partial rule the per-call router
        applies.  Orders are NOT capped by ``max_derivative_order``
        (that cap governs the derivative-id registry only).
        """
        if not self._built:
            raise RuntimeError("Call build() before differentiate().")
        orders = [int(o) for o in derivative_order]
        if len(orders) != self.num_dimensions:
            raise ValueError(
                f"derivative_order length {len(orders)} does not match "
                f"num_dimensions {self.num_dimensions}"
            )
        if any(o < 0 for o in orders):
            raise ValueError("derivative orders must be >= 0")

        def _zero_like(slide):
            return ChebyshevApproximation._from_grid(
                slide, slide.tensor_values * 0.0)

        active = {self._dim_to_slide[d]
                  for d, o in enumerate(orders) if o > 0}
        if not active:
            new_slides = [s.differentiate([0] * len(g))
                          for s, g in zip(self.slides, self.partition)]
            return ChebyshevSlider._from_slides(
                self, new_slides, self.pivot_value)
        if len(active) > 1:
            # Cross-group mixed partial: identically zero under the
            # additive decomposition.
            return ChebyshevSlider._from_slides(
                self, [_zero_like(s) for s in self.slides], 0.0)
        owner = active.pop()
        new_slides = [
            s.differentiate([orders[d] for d in g]) if i == owner
            else _zero_like(s)
            for i, (s, g) in enumerate(zip(self.slides, self.partition))
        ]
        return ChebyshevSlider._from_slides(self, new_slides, 0.0)

    def to_tt(self, tolerance: float = 1e-12):
        """Exact TT form of the sliding sum (beyond the reference surface).

        The additive decomposition ``f = sum_g s_g - (G-1) p`` is a sum
        of group-local terms, which a tensor train represents with an
        accumulator + pass-through channel construction: rank 2 between
        groups, ``slide_rank + 1`` inside the first and last groups and
        ``slide_rank + 2`` inside middle groups — so a 10-D basket of
        1-dim slides converts to a rank-2 TT exactly (up to the
        per-slide TT-SVD at ``tolerance``), with no dense
        materialization.  Non-contiguous partitions are handled via the
        TT's ``dim_order`` frame (storage order = groups concatenated).
        The result rides every TT tier: ``eval_batch`` /
        ``eval_batch_dd``, TT algebra, ``inner_product``, TT Sobol —
        e.g. adding a non-additive correction TT onto a slider-built
        model.  Like ``ChebyshevApproximation.to_tt``, the result's
        ``max_rank`` is the uncapped TT bound (NOT its current bond
        ranks), so downstream TT algebra has rounding headroom.
        """
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.models import tt_algorithms as tta
        from pychebyshev_tpu.models.tensor_train import ChebyshevTT

        n_groups = len(self.partition)
        # Per-group VALUE cores of the slide tensors, constant folded
        # into the first group so f = sum of group terms exactly.
        group_cores: List[List[np.ndarray]] = []
        for g, slide in enumerate(self.slides):
            w = np.asarray(slide.tensor_values, dtype=np.float64)
            if g == 0:
                w = w - (n_groups - 1) * self.pivot_value
            group_cores.append(
                tta.tt_svd_from_tensor(w, max_rank=int(w.size),
                                       tol=tolerance))

        # Live-channel construction.  Bond channel layout is
        # [acc? | partial? | pass?]: acc exists once the first group's
        # term has completed; partial carries the current group's slide
        # between its own cores; pass carries the constant 1 needed to
        # seed future groups and dies after the last group starts.
        value_cores: List[np.ndarray] = []
        in_acc = in_partial = False
        in_pass = True
        for g, cores_g in enumerate(group_cores):
            k = len(cores_g)
            last_g = g == n_groups - 1
            for m, b in enumerate(cores_g):
                rho_l, n_m, rho_r = b.shape
                completes = m == k - 1
                out_acc = in_acc or completes
                out_partial = not completes
                out_pass = not last_g
                r_in = ((1 if in_acc else 0)
                        + (rho_l if in_partial else 0)
                        + (1 if in_pass else 0))
                r_out = ((1 if out_acc else 0)
                         + (rho_r if out_partial else 0)
                         + (1 if out_pass else 0))
                core = np.zeros((r_in, n_m, r_out))
                i_acc = 0 if in_acc else None
                i_par = (1 if in_acc else 0) if in_partial else None
                i_pass = r_in - 1 if in_pass else None
                o_acc = 0 if out_acc else None
                o_par = (1 if out_acc else 0) if out_partial else None
                o_pass = r_out - 1 if out_pass else None
                one = np.ones(n_m, dtype=np.float64)
                if i_acc is not None:
                    core[i_acc, :, o_acc] = one
                src = i_par if in_partial else i_pass
                if out_partial:
                    if in_partial:
                        core[i_par:i_par + rho_l, :,
                             o_par:o_par + rho_r] = b
                    else:
                        # Group term starts: pass channel seeds partial.
                        core[i_pass, :, o_par:o_par + rho_r] = b[0]
                else:
                    # Group term completes into the accumulator.
                    if in_partial:
                        core[i_par:i_par + rho_l, :, o_acc] = b[:, :, 0]
                    else:
                        core[i_pass, :, o_acc] = b[0, :, 0]
                if o_pass is not None:
                    core[i_pass, :, o_pass] = one
                value_cores.append(core)
                in_acc, in_partial = out_acc, out_partial
                in_pass = out_pass

        coeff_cores = [tta.value_core_to_coeff_core(c)
                       for c in value_cores]
        storage_dims = [d for group in self.partition for d in group]
        storage_domain = [list(self.domain[d]) for d in storage_dims]
        storage_n = [int(self.n_nodes[d]) for d in storage_dims]
        # Uncapped rank bound (like ChebyshevApproximation.to_tt): the
        # converted model's CURRENT ranks must not become the rounding
        # cap of later TT algebra, or "slider TT + correction TT"
        # silently truncates the correction.
        if len(storage_n) > 1:
            cap = max(
                min(int(np.prod(storage_n[:j + 1])),
                    int(np.prod(storage_n[j + 1:])))
                for j in range(len(storage_n) - 1))
        else:
            cap = 1
        return ChebyshevTT._from_coeff_cores(
            coeff_cores, storage_domain, storage_n,
            dim_order=storage_dims, max_rank=cap, tolerance=tolerance,
            max_derivative_order=self.max_derivative_order,
            additional_data=self.additional_data,
            descriptor=self.descriptor, method="slider")

    @staticmethod
    def is_dimensionality_allowed(num_dimensions: int) -> bool:
        """Whether this class supports ``num_dimensions`` (any >= 1)."""
        return isinstance(num_dimensions, int) and num_dimensions >= 1

    def save(self, path: str | os.PathLike,
             format: str = "pickle") -> None:
        """Save to pickle (default, reference parity) or pickle-free
        ``.npz`` (slide tensors + metadata; function excluded)."""
        if not self._built:
            raise RuntimeError(
                "Cannot save an unbuilt slider. Call build() first."
            )
        if format == "pickle":
            with open(os.fspath(path), "wb") as f:
                pickle.dump(self, f, protocol=pickle.HIGHEST_PROTOCOL)
        elif format == "npz":
            from pychebyshev_tpu.utils.native_save import write_npz
            write_npz(path, self)
        else:
            raise ValueError(
                f"format must be 'pickle' or 'npz', got {format!r}"
            )

    @classmethod
    def load(cls, path: str | os.PathLike) -> "ChebyshevSlider":
        """Load from pickle or ``.npz`` (magic-sniffed); only load
        trusted pickle files."""
        from pychebyshev_tpu.utils import native_save
        if native_save.detect_npz(path):
            obj = native_save.read_npz(path)
            if not isinstance(obj, cls):
                raise TypeError(
                    f"Expected a {cls.__name__} checkpoint, got "
                    f"{type(obj).__name__}"
                )
            return obj
        with open(os.fspath(path), "rb") as f:
            obj = pickle.load(f)  # noqa: S301
        if not isinstance(obj, cls):
            raise TypeError(
                f"Expected a {cls.__name__} instance, got "
                f"{type(obj).__name__}"
            )
        return obj

    @classmethod
    def fit(cls, points, values, num_dimensions, domain, n_nodes,
            partition, pivot_point, *, l2: float = 0.0,
            sample_weight=None, rcond=None, derivative_data=None,
            engine: str = "host", mesh=None, data_axis: str = "dp",
            max_derivative_order: int = 2) -> "ChebyshevSlider":
        """Least-squares slider from SCATTERED high-dimensional samples.

        The high-dimensional leg of the scattered-data constructors
        (dense :meth:`ChebyshevApproximation.fit`, spline
        :meth:`ChebyshevSpline.fit` — beyond reference): the additive
        model ``c0 + sum_i h_i(x_{G_i})`` is jointly linear in the
        intercept and every slide's nodal tensor, so a 10-D fit is ONE
        small solve with ``1 + sum_i prod(n[G_i])`` columns
        (``utils/fitting.py::fit_additive_tensors``) — no grid of
        ``prod(n)`` evaluations anywhere.  Use it when the target is
        (near-)additive over the partition and only scattered samples
        exist; non-additive residual structure is exactly what the fit
        cannot capture (check ``fit_diagnostics['rms']`` against the
        noise level, or discover a better partition from a built
        model's ``suggest_partition``).

        The additive decomposition's k constant redundancies are
        resolved by re-gauging every slide to the pivot (``g_i(z_{G_i})
        = f_hat(z)``), so the assembled slider satisfies the usual
        sliding identity exactly; predictions are gauge-invariant.

        Returns a fully-built slider; ``fit_diagnostics`` as in the
        dense fit (plus ``columns``).

        ``derivative_data`` blocks (gradient-enhanced fitting, as in
        the dense :meth:`ChebyshevApproximation.fit`) must
        differentiate dims of at most one partition group — the
        additive model's cross-group mixed partials are identically
        zero, matching the per-call eval router's exact-zero rule.

        ``engine`` / ``mesh`` / ``data_axis`` as in the dense fit:
        the additive Gram accumulates on the accelerator (f32 or
        exact-dd tier), optionally dp-sharded.
        """
        from pychebyshev_tpu.utils.fitting import (
            barycentric_rows_np,
            fit_additive_tensors,
        )
        from pychebyshev_tpu.ops.chebyshev import (
            barycentric_weights_np,
            nodes_for_dim_np,
        )

        if any(len(g) == 0 for g in partition):
            raise ValueError("Partition groups must be non-empty")
        all_dims = sorted(d for group in partition for d in group)
        if all_dims != list(range(num_dimensions)):
            raise ValueError(
                f"Partition must cover all dimensions "
                f"0..{num_dimensions - 1} exactly once. "
                f"Got dimensions: {all_dims}"
            )
        if len(pivot_point) != num_dimensions:
            raise ValueError(
                f"pivot_point length {len(pivot_point)} does not match "
                f"num_dimensions {num_dimensions}")
        if len(domain) != num_dimensions or len(n_nodes) != num_dimensions:
            raise ValueError(
                f"len(domain)={len(domain)} and len(n_nodes)="
                f"{len(n_nodes)} must both equal num_dimensions="
                f"{num_dimensions}")

        tensors, c0, diagnostics = fit_additive_tensors(
            points, values, domain, n_nodes, partition, l2=l2,
            sample_weight=sample_weight, rcond=rcond,
            derivative_data=derivative_data, engine=engine,
            mesh=mesh, data_axis=data_axis)

        # Re-gauge: pin every slide to the pivot.  With b_i = h_i(z_i)
        # and p = c0 + sum b_i, the slides g_i = h_i + (p - b_i) give
        # p + sum(g_i - p) = c0 + sum h_i — the same predictions, now
        # in slider form with g_i(z_i) = p = f_hat(z).
        pivot_vals = []
        for group, tensor in zip(partition, tensors):
            v = tensor
            for dim in group:
                nd = nodes_for_dim_np(float(domain[dim][0]),
                                      float(domain[dim][1]),
                                      int(n_nodes[dim]))
                row = barycentric_rows_np(
                    np.asarray([float(pivot_point[dim])]), nd,
                    barycentric_weights_np(nd))[0]
                v = np.tensordot(row, v, axes=(0, 0))
            pivot_vals.append(float(v))
        p = c0 + float(np.sum(pivot_vals))

        slides = [
            ChebyshevApproximation.from_values(
                tensor + (p - b), len(group),
                [list(domain[dim]) for dim in group],
                [int(n_nodes[dim]) for dim in group],
                max_derivative_order=max_derivative_order)
            for group, tensor, b in zip(partition, tensors, pivot_vals)
        ]
        obj = cls._assemble(
            num_dimensions=num_dimensions, domain=domain,
            n_nodes=list(n_nodes), partition=partition,
            pivot_point=list(pivot_point), slides=slides, pivot_value=p,
            max_derivative_order=max_derivative_order)
        obj.fit_diagnostics = diagnostics
        return obj

    @classmethod
    def _from_slides(cls, source, slides, pivot_value):
        """New slider sharing metadata from *source* with new slides."""
        obj = object.__new__(cls)
        obj.function = None
        obj.num_dimensions = source.num_dimensions
        obj.domain = [list(b) for b in source.domain]
        obj.n_nodes = list(source.n_nodes)
        obj.max_derivative_order = source.max_derivative_order
        obj.partition = [list(g) for g in source.partition]
        obj.pivot_point = list(source.pivot_point)
        obj.slides = slides
        obj.pivot_value = pivot_value
        obj._dim_to_slide = dict(source._dim_to_slide)
        obj._built = True
        obj.descriptor = ""
        obj.additional_data = None
        obj.vectorized = False
        obj._cached_error_estimate = None
        obj._derivative_id_registry = {}
        obj._derivative_id_to_orders = []
        return obj

    @classmethod
    def _assemble(cls, *, num_dimensions, domain, n_nodes, partition,
                  pivot_point, slides, pivot_value, max_derivative_order,
                  descriptor="", additional_data=None):
        """Internal factory for extrude/slice/integrate results."""
        dim_to_slide = {}
        for si, group in enumerate(partition):
            for d in group:
                dim_to_slide[d] = si
        obj = object.__new__(cls)
        obj.function = None
        obj.num_dimensions = num_dimensions
        obj.domain = [list(b) for b in domain]
        obj.n_nodes = list(n_nodes)
        obj.max_derivative_order = max_derivative_order
        obj.partition = [list(g) for g in partition]
        obj.pivot_point = list(pivot_point)
        obj.slides = slides
        obj.pivot_value = pivot_value
        obj._dim_to_slide = dim_to_slide
        obj._built = True
        obj.descriptor = descriptor
        obj.additional_data = additional_data
        obj.vectorized = False
        obj._cached_error_estimate = None
        obj._derivative_id_registry = {}
        obj._derivative_id_to_orders = []
        return obj

    # ------------------------------------------------------------------
    # Extrude / slice
    # ------------------------------------------------------------------

    def extrude(self, params) -> "ChebyshevSlider":
        """Each new dim becomes a 1-dim slide whose tensor is constant at
        the pivot value (contributes 0 to the sliding sum); existing
        group indices are remapped."""
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.extrude_slice import (
            normalize_extrusion_params,
        )
        sorted_params = normalize_extrusion_params(params,
                                                   self.num_dimensions)

        domain = [list(b) for b in self.domain]
        n_nodes = list(self.n_nodes)
        pivot_point = list(self.pivot_point)
        partition = [list(g) for g in self.partition]
        slides = list(self.slides)

        for dim_idx, (lo, hi), n in sorted_params:
            for group in partition:
                for i in range(len(group)):
                    if group[i] >= dim_idx:
                        group[i] += 1

            constant = np.full(n, self.pivot_value)
            new_slide = ChebyshevApproximation.from_values(
                constant, 1, [[lo, hi]], [n],
                max_derivative_order=self.max_derivative_order)

            partition.append([dim_idx])
            slides.append(new_slide)
            domain.insert(dim_idx, [lo, hi])
            n_nodes.insert(dim_idx, n)
            pivot_point.insert(dim_idx, 0.5 * (lo + hi))

        return ChebyshevSlider._assemble(
            num_dimensions=self.num_dimensions + len(sorted_params),
            domain=domain, n_nodes=n_nodes, partition=partition,
            pivot_point=pivot_point, slides=slides,
            pivot_value=self.pivot_value,
            max_derivative_order=self.max_derivative_order)

    def slice(self, params) -> "ChebyshevSlider":
        """Fix dims at values.

        Multi-dim groups slice the slide's tensor; a single-dim group's
        value is absorbed as a delta into the pivot value and every other
        slide's tensor, and the group disappears.
        """
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

        domain = [list(b) for b in self.domain]
        n_nodes = list(self.n_nodes)
        pivot_point = list(self.pivot_point)
        partition = [list(g) for g in self.partition]
        slides = list(self.slides)
        pivot_value = self.pivot_value

        for dim_idx, value in sorted_params:  # descending
            slide_idx = None
            local_dim_idx = None
            for si, group in enumerate(partition):
                if dim_idx in group:
                    slide_idx = si
                    local_dim_idx = group.index(dim_idx)
                    break

            if len(partition[slide_idx]) > 1:
                slides[slide_idx] = slides[slide_idx].slice(
                    (local_dim_idx, value))
                partition[slide_idx].remove(dim_idx)
            else:
                s_val = slides[slide_idx].vectorized_eval([value], [0])
                delta = s_val - pivot_value
                for i in range(len(slides)):
                    if i != slide_idx:
                        slides[i] = ChebyshevApproximation._from_grid(
                            slides[i], slides[i].tensor_values + delta)
                pivot_value = s_val
                del partition[slide_idx]
                del slides[slide_idx]

            for group in partition:
                for i in range(len(group)):
                    if group[i] > dim_idx:
                        group[i] -= 1

            del domain[dim_idx]
            del n_nodes[dim_idx]
            del pivot_point[dim_idx]

        return ChebyshevSlider._assemble(
            num_dimensions=self.num_dimensions - len(sorted_params),
            domain=domain, n_nodes=n_nodes, partition=partition,
            pivot_point=pivot_point, slides=slides,
            pivot_value=pivot_value,
            max_derivative_order=self.max_derivative_order)

    # ------------------------------------------------------------------
    # Integration
    # ------------------------------------------------------------------

    def integrate(self, dims=None, bounds=None):
        """Closed-form integration of the sliding sum.

        With ``F = p + sum_i (s_i - p)`` and integration set ``T`` of
        measure ``V = prod_{d in T} m_d``, each additive term integrates
        independently::

            int_T F = p*V + sum_i  V/vol_in(G_i) * (R_i - p*vol_in(G_i))

        where ``vol_in(G_i)`` is the measure of the group's dims that lie
        in ``T`` and ``R_i`` is the slide reduced over those dims (a
        scalar when the whole group is integrated, a lower-dim tensor
        otherwise).  Scalar terms fold into the new pivot constant; tensor
        terms become the surviving slides, re-centred so the sliding
        identity holds for the new pivot.  Mirrors reference
        ``slider.py:881-1136`` semantics with a single vectorized pass.
        """
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.calculus import normalize_bounds

        if dims is None:
            integ_dims = list(range(self.num_dimensions))
        elif isinstance(dims, int):
            integ_dims = [dims]
        else:
            integ_dims = sorted(set(dims))
        for d in integ_dims:
            if d < 0 or d >= self.num_dimensions:
                raise ValueError(
                    f"dim {d} out-of-range [0, {self.num_dimensions - 1}]"
                )
        integ_set = frozenset(integ_dims)

        # Per-dim measure of the integration range; 1.0 off the set, so
        # products over arbitrary dim subsets are plain slicing.
        range_by_dim = dict(zip(integ_dims,
                                normalize_bounds(integ_dims, bounds,
                                                 self.domain)))
        measure = np.ones(self.num_dimensions)
        for d in integ_dims:
            lo, hi = range_by_dim[d] or self.domain[d]
            measure[d] = hi - lo
        total_vol = float(np.prod(measure[integ_dims]))

        def reduce_slide(slide, group):
            """Integrate a slide over its in-set local dims.

            Returns ``(reduced, inner_vol)`` — the contracted slide (float
            if the group is fully inside ``T``) and the measure of the
            contracted dims.
            """
            local = [i for i, d in enumerate(group) if d in integ_set]
            sub = [range_by_dim[group[i]] for i in local]
            if any(b is not None for b in sub):
                reduced = slide.integrate(dims=local, bounds=sub)
            else:
                reduced = slide.integrate(dims=local)
            return reduced, float(np.prod(measure[
                [group[i] for i in local]]))

        # One pass: scalars accumulate into the pivot constant, tensors
        # become surviving slides (recorded before re-centring, since the
        # final constant isn't known until the pass completes).
        const = self.pivot_value * total_vol
        survivors = []  # (scaled tensor values, template, kept global dims)
        for group, slide in zip(self.partition, self.slides):
            n_in = sum(d in integ_set for d in group)
            if n_in == len(group):
                full_val, inner_vol = reduce_slide(slide, group)
                const += (total_vol / inner_vol) * (
                    float(full_val) - self.pivot_value * inner_vol)
            elif n_in == 0:
                survivors.append((total_vol * slide.tensor_values,
                                  slide, list(group)))
            else:
                part, inner_vol = reduce_slide(slide, group)
                survivors.append(((total_vol / inner_vol)
                                  * part.tensor_values, part,
                                  [d for d in group if d not in integ_set]))

        if len(integ_dims) == self.num_dimensions:
            return float(const)

        if not survivors:
            raise RuntimeError(
                "internal error: surviving dims but every group was "
                "integrated away")

        # Renumber surviving global dims: d -> d minus integrated dims
        # below it.
        removed_below = np.cumsum(
            [1 if d in integ_set else 0 for d in
             range(self.num_dimensions)])
        remap = [d - int(removed_below[d])
                 for d in range(self.num_dimensions)]
        kept_dims = [d for d in range(self.num_dimensions)
                     if d not in integ_set]

        # Re-centre: F' = const + sum_j (h_j - p*V)  ==>  slide'_j =
        # h_j + (const - p*V), pivot' = const.
        recentre = const - self.pivot_value * total_vol
        return ChebyshevSlider._assemble(
            num_dimensions=len(kept_dims),
            domain=[list(self.domain[d]) for d in kept_dims],
            n_nodes=[self.n_nodes[d] for d in kept_dims],
            partition=[[remap[d] for d in kept] for _, _, kept in survivors],
            pivot_point=[self.pivot_point[d] for d in kept_dims],
            slides=[ChebyshevApproximation._from_grid(tmpl, vals + recentre)
                    for vals, tmpl, _ in survivors],
            pivot_value=const,
            max_derivative_order=self.max_derivative_order,
            descriptor=self.descriptor,
            additional_data=self.additional_data)

    def integrate_batch(self, bounds, dtype=None) -> np.ndarray:
        """Integrals over a batch of axis-aligned boxes — one dispatch
        per slide.

        Beyond-reference capability: the additive decomposition
        integrates term by term,

            int_box F = p*V*(1 - m) + sum_i V / V_{G_i} * int_{box_{G_i}} s_i

        with V the box measure, V_{G_i} the measure of the box restricted
        to group i, and each slide's restricted integral a dense
        :meth:`ChebyshevApproximation.integrate_batch` over all B boxes
        at once.  Zero-measure boxes integrate to an exact 0.

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
        # the conditional-expectation decomposition (which needs no 0/0
        # masking: off-group measures multiply instead of dividing).
        bounds = np.asarray(bounds, dtype=np.float64)
        return self.partial_integrate_batch(
            list(range(self.num_dimensions)), bounds,
            np.zeros((bounds.shape[0] if bounds.ndim else 0, 0)),
            dtype=dtype)

    # ------------------------------------------------------------------
    # 1-D reduction + roots / optimization
    # ------------------------------------------------------------------

    def _to_1d_chebyshev(self, sliced_1d: "ChebyshevSlider"):
        """Re-sample a 1-D slider at its Chebyshev nodes into a dense
        1-D approximation."""
        from pychebyshev_tpu.ops.chebyshev import nodes_for_dim_np
        assert sliced_1d.num_dimensions == 1
        n = sliced_1d.n_nodes[0]
        a, b = sliced_1d.domain[0]
        cheb_nodes = nodes_for_dim_np(a, b, int(n))
        values = sliced_1d.eval_batch(cheb_nodes[:, None])
        return ChebyshevApproximation.from_values(
            values, num_dimensions=1, domain=[(float(a), float(b))],
            n_nodes=[int(n)])

    def roots(self, dim=None, fixed=None):
        """Roots along *dim*: slice to 1-D, re-sample, colleague matrix."""
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.calculus import validate_calculus_args
        dim, slice_params = validate_calculus_args(
            self.num_dimensions, dim, fixed, self.domain)
        sliced = self.slice(slice_params) if slice_params else self
        return self._to_1d_chebyshev(sliced).roots()

    def minimize(self, dim=None, fixed=None, *, tol=1e-9,
                 max_boxes=5000, polish=True):
        """Minimum of the slider.

        With ``dim``: the 1-D minimum along that dim (reference
        semantics) — ``(value, location)`` floats.  With ``dim=None``
        on a multi-dimensional slider: the GLOBAL minimum over the
        whole box — EXACT under the additive decomposition (the sum of
        per-slide global minima; cross-group curvature is zero), each
        slide solved by the certified branch-and-bound of
        ``ops/subdivision.py``.  Returns ``(value, point)`` with an
        ``(ndim,)`` point; ``fixed`` may pin a subset of dims.
        """
        if not self._built:
            raise RuntimeError("Call build() first")
        if dim is None and self.num_dimensions > 1:
            from pychebyshev_tpu.utils.globalcalc import (
                global_optimize_slider)
            return global_optimize_slider(
                self, "min", fixed, tol=tol, max_boxes=max_boxes,
                polish=polish)
        from pychebyshev_tpu.utils.calculus import validate_calculus_args
        dim, slice_params = validate_calculus_args(
            self.num_dimensions, dim, fixed, self.domain)
        sliced = self.slice(slice_params) if slice_params else self
        return self._to_1d_chebyshev(sliced).minimize()

    def critical_points(self, fixed=None, *, grad_tol=1e-8, delta=5e-3,
                        max_boxes=50000, separation=1e-6,
                        max_points=10000):
        """All interior stationary points — EXACT under the additive
        decomposition: the cartesian product of per-slide stationary
        sets, classified from the block-diagonal Hessian.  See
        ``ChebyshevApproximation.critical_points``; beyond reference."""
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.globalcalc import critical_points_slider
        return critical_points_slider(
            self, fixed=fixed, grad_tol=grad_tol, delta=delta,
            max_boxes=max_boxes, separation=separation,
            max_points=max_points)

    def maximize(self, dim=None, fixed=None, *, tol=1e-9,
                 max_boxes=5000, polish=True):
        """Maximum of the slider — see :meth:`minimize` for the 1-D
        (``dim`` given) vs exact-global (``dim=None``) forms."""
        if not self._built:
            raise RuntimeError("Call build() first")
        if dim is None and self.num_dimensions > 1:
            from pychebyshev_tpu.utils.globalcalc import (
                global_optimize_slider)
            return global_optimize_slider(
                self, "max", fixed, tol=tol, max_boxes=max_boxes,
                polish=polish)
        from pychebyshev_tpu.utils.calculus import validate_calculus_args
        dim, slice_params = validate_calculus_args(
            self.num_dimensions, dim, fixed, self.domain)
        sliced = self.slice(slice_params) if slice_params else self
        return self._to_1d_chebyshev(sliced).maximize()

    def _scenario_slice_values(self, dim, fixed_cols, batch):
        """(B, n) slice values along *dim* — one fused eval_batch over
        the dim's own nodes (exact: the sliding sum is a polynomial in
        *dim*)."""
        from pychebyshev_tpu.ops.chebyshev import nodes_for_dim_np
        from pychebyshev_tpu.utils.calculus import scenario_slice_points
        lo, hi = self.domain[dim]
        n = int(self.n_nodes[dim])
        nodes = nodes_for_dim_np(float(lo), float(hi), n)
        pts = scenario_slice_points(
            self.num_dimensions, dim, fixed_cols, batch, nodes)
        vals = np.asarray(self.eval_batch(pts))
        return vals.reshape(batch, n), nodes, (float(lo), float(hi))

    def partial_integrate_batch(self, dims, bounds, points,
                                derivative_order=None,
                                dtype=None) -> np.ndarray:
        """Batched conditional expectations through the additive
        decomposition (beyond reference).

        With box measure ``V`` over the integrated ``dims`` and
        ``V_{S\\G_i}`` the measure over integrated dims OUTSIDE group i,

            int_box f(., pts) = p*V*(1 - m)
                                + sum_i V_{S\\G_i} * M_i(b)

        where ``M_i`` integrates slide i over its in-box group dims and
        evaluates its remaining group dims at the scenario coordinates
        (a dense :meth:`partial_integrate_batch` / ``eval_batch``).
        Derivatives on remaining dims route to the owning slide; a mixed
        partial across groups is exactly 0.

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
        int_set = set(dims)
        col_of = {k: i for i, k in enumerate(dims)}
        pcol_of = {k: i for i, k in enumerate(remaining)}
        order_of = {k: int(o) for k, o in zip(remaining, rem_orders)}
        widths = arr[..., 1] - arr[..., 0]
        vol = np.prod(widths, axis=1)
        n_rows = arr.shape[0]

        deriv_dims = {k for k, o in order_of.items() if o}
        if deriv_dims:
            owners = {self._dim_to_slide[k] for k in deriv_dims}
            if len(owners) > 1:
                # Cross-group mixed partials of an additive sum vanish.
                return np.zeros(n_rows)
            slide_ids = [owners.pop()]
            total = np.zeros(n_rows)
        else:
            slide_ids = list(range(len(self.slides)))
            total = self.pivot_value * vol * (1.0 - len(self.slides))

        for i in slide_ids:
            group = self.partition[i]
            slide = self.slides[i]
            g_int = [j for j, k in enumerate(group) if k in int_set]
            g_eval = [j for j, k in enumerate(group) if k not in int_set]
            off_cols = [col_of[k] for k in dims if k not in set(group)]
            v_off = (np.prod(widths[:, off_cols], axis=1)
                     if off_cols else np.ones(n_rows))
            sub_pts = pts[:, [pcol_of[group[j]] for j in g_eval]]
            sub_orders = [order_of[group[j]] for j in g_eval]
            if g_int:
                sub_bounds = arr[:, [col_of[group[j]] for j in g_int], :]
                part = slide.partial_integrate_batch(
                    g_int, sub_bounds, sub_pts,
                    derivative_order=sub_orders, dtype=dtype)
            else:
                part = slide.vectorized_eval_batch(sub_pts, sub_orders)
            total = total + v_off * np.asarray(part)
        return total

    def roots_batch(self, dim=None, fixed=None) -> list:
        """Roots along *dim* for a BATCH of scenarios (scalar or (B,)
        arrays in ``fixed``) — list of B sorted root arrays; one fused
        eval_batch + one stacked colleague eigensolve (beyond
        reference)."""
        if not self._built:
            raise RuntimeError("Call build() first")
        from pychebyshev_tpu.utils.calculus import (
            roots_1d_batch,
            validate_calculus_args_batch,
        )
        dim, cols, batch = validate_calculus_args_batch(
            self.num_dimensions, dim, fixed, self.domain)
        vals, _, dom = self._scenario_slice_values(dim, cols, batch)
        return roots_1d_batch(vals, dom)

    def minimize_batch(self, dim=None, fixed=None):
        """Batched :meth:`minimize`: ((B,) values, (B,) locations) —
        beyond reference."""
        return self._optimize_batch(dim, fixed, "min")

    def maximize_batch(self, dim=None, fixed=None):
        """Batched :meth:`maximize`: ((B,) values, (B,) locations) —
        beyond reference."""
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
        vals, nodes, dom = self._scenario_slice_values(dim, cols, batch)
        return optimize_resampled_batch(vals, nodes, dom, mode)

    # ------------------------------------------------------------------
    # Algebra
    # ------------------------------------------------------------------

    def _check_slider_compatible(self, other):
        from pychebyshev_tpu.utils.algebra import check_compatible
        check_compatible(self, other)
        if self.partition != other.partition:
            raise ValueError(
                f"Partition mismatch: {self.partition} vs {other.partition}"
            )
        if self.pivot_point != other.pivot_point:
            raise ValueError(
                f"Pivot point mismatch: {self.pivot_point} vs "
                f"{other.pivot_point}"
            )

    def __add__(self, other):
        if type(self) is not type(other):
            return NotImplemented
        self._check_slider_compatible(other)
        slides = [
            ChebyshevApproximation._from_grid(
                a, a.tensor_values + b.tensor_values)
            for a, b in zip(self.slides, other.slides)
        ]
        return ChebyshevSlider._from_slides(
            self, slides, self.pivot_value + other.pivot_value)

    def __sub__(self, other):
        if type(self) is not type(other):
            return NotImplemented
        self._check_slider_compatible(other)
        slides = [
            ChebyshevApproximation._from_grid(
                a, a.tensor_values - b.tensor_values)
            for a, b in zip(self.slides, other.slides)
        ]
        return ChebyshevSlider._from_slides(
            self, slides, self.pivot_value - other.pivot_value)

    def __mul__(self, scalar):
        from pychebyshev_tpu.utils.algebra import is_scalar
        if not is_scalar(scalar):
            return NotImplemented
        s = float(scalar)
        slides = [
            ChebyshevApproximation._from_grid(sl, sl.tensor_values * s)
            for sl in self.slides
        ]
        return ChebyshevSlider._from_slides(self, slides,
                                            self.pivot_value * s)

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
        self._check_slider_compatible(other)
        for a, b in zip(self.slides, other.slides):
            a.tensor_values = a.tensor_values + b.tensor_values
            a._cached_error_estimate = None
        self.pivot_value += other.pivot_value
        self._cached_error_estimate = None
        return self

    def __isub__(self, other):
        self._check_slider_compatible(other)
        for a, b in zip(self.slides, other.slides):
            a.tensor_values = a.tensor_values - b.tensor_values
            a._cached_error_estimate = None
        self.pivot_value -= other.pivot_value
        self._cached_error_estimate = None
        return self

    def __imul__(self, scalar):
        from pychebyshev_tpu.utils.algebra import is_scalar
        if not is_scalar(scalar):
            return NotImplemented
        s = float(scalar)
        for sl in self.slides:
            sl.tensor_values = sl.tensor_values * s
            sl._cached_error_estimate = None
        self.pivot_value *= s
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
        return (f"ChebyshevSlider(dims={self.num_dimensions}, "
                f"slides={len(self.partition)}, "
                f"partition={self.partition}, built={self._built})")

    def __str__(self) -> str:
        status = "built" if self._built else "not built"
        total_slide_evals = self.total_build_evals
        full_tensor_evals = int(np.prod(self.n_nodes))
        max_display = 6

        def _fmt(seq):
            if len(seq) > max_display:
                return ("[" + ", ".join(str(v) for v in seq[:max_display])
                        + ", ...]")
            return str(seq)

        if self.num_dimensions > max_display:
            domain_str = (" x ".join(
                f"[{lo}, {hi}]" for lo, hi in self.domain[:max_display])
                + " x ...")
        else:
            domain_str = " x ".join(f"[{lo}, {hi}]"
                                    for lo, hi in self.domain)

        lines = [
            f"ChebyshevSlider ({self.num_dimensions}D, "
            f"{len(self.partition)} slides, {status})",
            f"  Partition: {_fmt(self.partition)}",
            f"  Pivot:     {_fmt(self.pivot_point)}",
            f"  Nodes:     {_fmt(self.n_nodes)} "
            f"({total_slide_evals:,} vs {full_tensor_evals:,} full tensor)",
            f"  Domain:    {domain_str}",
        ]
        if self._built and self.slides:
            lines.append(f"  Error est: {self.error_estimate():.2e}")
            lines.append("  Slides:")
            for i, (group, slide) in enumerate(zip(self.partition,
                                                   self.slides)):
                slide_evals = int(np.prod([self.n_nodes[d] for d in group]))
                lines.append(f"    [{i}] dims {group}: {slide_evals:,} "
                             f"evals, built in {slide.build_time:.3f}s")
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
