"""Coefficient-space subdivision: certified global optimization and
zero isolation for Chebyshev interpolants.

The reference implementation's roadmap (reference ``docs/roadmap.md``,
v0.21 "Advanced Calculus") *plans* N-D rootfinding and leaves global
optimization unaddressed; its shipped calculus surface is 1-D-at-a-time
(reference ``_calculus.py:300-355``).  This module supplies the N-D
layer in a form suited to this framework's design: instead of the
Moller-Stetter eigenproblem (dense nonsymmetric eigensolves of size
``n^d`` that neither XLA:TPU nor sane memory budgets support), it runs
**branch-and-bound in Chebyshev coefficient space**:

- An interpolant IS a polynomial, so its restriction to any sub-box is
  the same-degree polynomial re-expanded in the sub-box's Chebyshev
  basis.  That re-expansion is one exact ``(n, n)`` matrix per dim per
  box (built by resampling the basis — no quadrature error), and
  applying it to the coefficient tensor is a batch of small GEMMs: the
  whole search refines through stacked matrix products, the shape this
  framework is built around.
- On each sub-box the Chebyshev enclosure ``|f - c_0| <= sum_{k!=0}
  |c_k|`` gives rigorous-to-roundoff lower/upper bounds (``|T_k| <= 1``),
  so boxes that cannot contain the optimum (or a zero of every system
  component) are *proved* away, not heuristically discarded.

Everything here is cold-path host NumPy by design, like the 1-D
colleague rootfinding in ``utils/calculus.py``: the tensors are small,
the control flow is data-dependent (priority queues, pruning), and the
hot device kernels are only used by callers for candidate polishing.

Certification caveat: bounds are exact mathematics evaluated in f64
(not outward-rounded interval arithmetic), so certificates hold up to
O(n_total * eps * |c|) roundoff — ~1e-13 relative in practice.  Don't
request ``tol`` below that.
"""

from __future__ import annotations

import functools
import heapq
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "restriction_matrix",
    "restrict_box_coeffs",
    "box_enclosure",
    "center_values",
    "minimize_coeff_tensor",
    "minimize_tt_cores",
    "isolate_common_zeros",
    "GlobalResult",
]


class GlobalResult(NamedTuple):
    """Outcome of a branch-and-bound run (local [-1,1]^d coordinates)."""

    value: float          # best exact interpolant value found
    location: np.ndarray  # (d,) local coordinates of that value
    gap: float            # value - (proved lower bound); <= tol if certified
    certified: bool       # True when the search closed the gap to tol
    boxes: int            # number of boxes processed


# ----------------------------------------------------------------------
# Exact sub-interval re-expansion
# ----------------------------------------------------------------------

@functools.lru_cache(maxsize=4096)
def _restriction_matrix_cached(n: int, lo: float, hi: float) -> np.ndarray:
    from pychebyshev_tpu.ops.chebyshev import _chebpts1_np
    from pychebyshev_tpu.ops.dct import _coeff_matrix_np

    mid = 0.5 * (lo + hi)
    half = 0.5 * (hi - lo)
    t = _chebpts1_np(n)                       # local nodes of the sub-box
    u = np.clip(mid + half * t, -1.0, 1.0)    # their parent coordinates
    vander = np.polynomial.chebyshev.chebvander(u, n - 1)  # T_k(u)
    return np.ascontiguousarray(_coeff_matrix_np(n) @ vander)


def restriction_matrix(n: int, lo: float, hi: float) -> np.ndarray:
    """(n, n) map: coefficients on [-1, 1] -> coefficients of the same
    polynomial re-expanded on the sub-interval ``[lo, hi]`` (in that
    sub-interval's own Chebyshev basis).

    Exact by the resampling argument: a degree-(n-1) polynomial is
    recovered exactly from its values at n Type-I points, so composing
    "evaluate parent basis at the sub-box nodes" with the values->
    coefficients transform reproduces the restriction with no
    truncation.  Bisection produces dyadic endpoints, so the cache hits
    constantly during a search.
    """
    if not (-1.0 <= lo < hi <= 1.0):
        raise ValueError(f"sub-interval [{lo}, {hi}] not inside [-1, 1]")
    return _restriction_matrix_cached(int(n), float(lo), float(hi))


def restrict_box_coeffs(coeffs: np.ndarray,
                        boxes: np.ndarray) -> np.ndarray:
    """Re-expand one coefficient tensor on a batch of sub-boxes.

    coeffs: (n_1, ..., n_d) parent coefficients on [-1, 1]^d.
    boxes:  (B, d, 2) local sub-boxes.
    Returns (B, n_1, ..., n_d) per-box coefficient tensors.

    Each dim is one batched mode-product with that dim's per-box
    restriction matrix; dims whose interval is the full [-1, 1] are
    skipped (identity).
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    bsz, d = boxes.shape[0], boxes.shape[1]
    if coeffs.ndim != d:
        raise ValueError(
            f"coeffs rank {coeffs.ndim} != boxes dim count {d}")
    out = np.broadcast_to(coeffs, (bsz,) + coeffs.shape).copy()
    for axis in range(d):
        full = np.all((boxes[:, axis, 0] == -1.0)
                      & (boxes[:, axis, 1] == 1.0))
        if full:
            continue
        n = coeffs.shape[axis]
        mats = np.stack([
            restriction_matrix(n, boxes[b, axis, 0], boxes[b, axis, 1])
            for b in range(bsz)])
        moved = np.moveaxis(out, axis + 1, -1)         # (B, ..., n)
        lead = moved.shape[1:-1]
        prod = np.einsum("bri,bki->brk",
                         moved.reshape(bsz, -1, n), mats)
        out = np.moveaxis(prod.reshape((bsz,) + lead + (n,)), -1,
                          axis + 1)
    return out


# ----------------------------------------------------------------------
# Enclosures from coefficients
# ----------------------------------------------------------------------

def box_enclosure(coeffs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(c0, radius) per box: f(box) is contained in [c0 - r, c0 + r].

    coeffs: (B, n_1, ..., n_d).  Uses |T_k| <= 1 on [-1, 1]:
    ``r = sum_{k != 0} |c_k|``.
    """
    flat = coeffs.reshape(coeffs.shape[0], -1)
    c0 = flat[:, 0]
    rad = np.abs(flat).sum(axis=1) - np.abs(c0)
    return c0, rad


@functools.lru_cache(maxsize=256)
def _t_at_zero(n: int) -> np.ndarray:
    """T_k(0) for k < n: the pattern 1, 0, -1, 0, 1, ..."""
    k = np.arange(n)
    out = np.where(k % 2 == 0, np.where(k % 4 == 0, 1.0, -1.0), 0.0)
    return out


def center_values(coeffs: np.ndarray) -> np.ndarray:
    """Exact interpolant value at each box's center, from coefficients."""
    out = coeffs
    for _ in range(coeffs.ndim - 1):
        out = out @ _t_at_zero(out.shape[-1])
    return out


def _tail_mass_per_dim(coeffs: np.ndarray) -> np.ndarray:
    """(B, d) sum of |c_k| over multi-indices with k_dim > 0 — how much
    the restricted polynomial still varies along each dim."""
    bsz = coeffs.shape[0]
    d = coeffs.ndim - 1
    total = np.abs(coeffs).reshape(bsz, -1).sum(axis=1)
    out = np.empty((bsz, d))
    for axis in range(d):
        zero_slice = np.take(np.abs(coeffs), 0, axis=axis + 1)
        out[:, axis] = total - zero_slice.reshape(bsz, -1).sum(axis=1)
    return out


def _split_boxes(boxes: np.ndarray, dims: np.ndarray) -> np.ndarray:
    """Bisect each box along its chosen dim -> (2B, d, 2)."""
    bsz, d = boxes.shape[0], boxes.shape[1]
    left = boxes.copy()
    right = boxes.copy()
    rows = np.arange(bsz)
    mids = 0.5 * (boxes[rows, dims, 0] + boxes[rows, dims, 1])
    left[rows, dims, 1] = mids
    right[rows, dims, 0] = mids
    return np.concatenate([left, right], axis=0)


# ----------------------------------------------------------------------
# Branch-and-bound global minimization
# ----------------------------------------------------------------------

# Boxes narrower than this in every dim are retired instead of split
# further: their remaining bound width is pure enclosure looseness, not
# location uncertainty, and splitting a zero-width interval is
# meaningless in f64.
_MIN_BOX_WIDTH = 1e-12


def _bnb_minimize(d: int, evaluate_boxes, *, tol: float, max_boxes: int,
                  beam: int, seed_value: float,
                  seed_loc: np.ndarray) -> GlobalResult:
    """Best-first branch-and-bound driver shared by the dense and TT
    bounders.

    ``evaluate_boxes(boxes)`` maps a (B, d, 2) batch of local sub-boxes
    to ``(lb, center_val, split_score)`` — a proved per-box lower bound,
    the exact interpolant value at each box center, and a (B, d) score
    for choosing the bisection dim.  Children are always re-derived from
    the ROOT representation (exact restriction; no error accumulation
    down the tree), and the incumbent is only ever an exact interpolant
    value, so the returned ``value`` is attained and ``gap`` bounds its
    distance from the true minimum.
    """
    tol = float(tol)
    if tol <= 0.0:
        raise ValueError(f"tol must be positive, got {tol}")

    best = float(seed_value)
    best_loc = np.asarray(seed_loc, dtype=np.float64).copy()

    root_box = np.tile(np.array([[-1.0, 1.0]]), (d, 1))[None]
    lb, cval, _ = evaluate_boxes(root_box)
    if cval[0] < best:
        best = float(cval[0])
        best_loc = np.zeros(d)
    # Heap of (lower_bound, counter, box); counter breaks value ties.
    heap: List[Tuple[float, int, np.ndarray]] = []
    counter = 0
    lb0 = float(lb[0])
    if lb0 < best - tol:
        heapq.heappush(heap, (lb0, counter, root_box[0]))
        counter += 1

    processed = 1
    proved_lb = lb0
    retired_lb = np.inf  # best-possible value inside retired boxes
    while heap and processed < max_boxes:
        # The heap min is the global proved lower bound over open boxes.
        proved_lb = heap[0][0]
        if proved_lb >= best - tol:
            lb_all = min(proved_lb, retired_lb)
            return GlobalResult(best, best_loc, max(best - lb_all, 0.0),
                                lb_all >= best - tol, processed)
        batch = []
        while heap and len(batch) < beam:
            box_lb, _, box = heapq.heappop(heap)
            if box_lb >= best - tol:
                continue
            if np.all(box[:, 1] - box[:, 0] <= _MIN_BOX_WIDTH):
                retired_lb = min(retired_lb, box_lb)
                continue
            batch.append(box)
        if not batch:
            continue
        parents = np.stack(batch)
        _, _, score = evaluate_boxes(parents)
        widths = parents[:, :, 1] - parents[:, :, 0]
        ranked = np.where(widths > _MIN_BOX_WIDTH,
                          score * widths + widths * 1e-300, -np.inf)
        dims = np.argmax(ranked, axis=1)
        children = _split_boxes(parents, dims)
        lbs, cval, _ = evaluate_boxes(children)
        processed += children.shape[0]

        imin = int(np.argmin(cval))
        if cval[imin] < best:
            best = float(cval[imin])
            best_loc = 0.5 * (children[imin, :, 0] + children[imin, :, 1])
        for i in np.argsort(lbs):
            if lbs[i] < best - tol:
                heapq.heappush(heap, (float(lbs[i]), counter, children[i]))
                counter += 1

    if heap:
        proved_lb = min(proved_lb, heap[0][0], retired_lb)
        return GlobalResult(best, best_loc, max(best - proved_lb, 0.0),
                            False, processed)
    lb_all = min(proved_lb, retired_lb)
    if retired_lb < best - tol:
        return GlobalResult(best, best_loc, max(best - lb_all, 0.0),
                            False, processed)
    return GlobalResult(best, best_loc, min(tol, max(best - lb_all, 0.0)),
                        True, processed)


def minimize_coeff_tensor(
    coeffs: np.ndarray,
    *,
    tol: float = 1e-9,
    max_boxes: int = 20000,
    beam: int = 64,
    node_values: Optional[np.ndarray] = None,
    node_coords: Optional[Sequence[np.ndarray]] = None,
) -> GlobalResult:
    """Certified global minimum of the polynomial with Chebyshev
    coefficient tensor ``coeffs`` over [-1, 1]^d.

    ``node_values``/``node_coords`` (the build tensor and its local
    node vectors) seed the incumbent for free when provided.
    """
    d = coeffs.ndim
    if d == 0:
        raise ValueError("scalar coefficient tensor")

    best = np.inf
    best_loc = np.zeros(d)
    if node_values is not None:
        flat_idx = int(np.argmin(node_values))
        best = float(np.asarray(node_values).reshape(-1)[flat_idx])
        multi = np.unravel_index(flat_idx, node_values.shape)
        best_loc = np.array([node_coords[i][multi[i]] for i in range(d)])

    def evaluate_boxes(boxes):
        sub = restrict_box_coeffs(coeffs, boxes)
        c0, rad = box_enclosure(sub)
        return c0 - rad, center_values(sub), _tail_mass_per_dim(sub)

    return _bnb_minimize(d, evaluate_boxes, tol=tol, max_boxes=max_boxes,
                         beam=beam, seed_value=best, seed_loc=best_loc)


# ----------------------------------------------------------------------
# TT bounder: the same search through coefficient cores
# ----------------------------------------------------------------------

def _tt_box_stats(cores: Sequence[np.ndarray], box: np.ndarray):
    """(mid, radius, center, tails) for one local sub-box of a TT in
    coefficient-core form (cores: (r_{k-1}, n_k, r_k)).

    Restriction applies each dim's exact re-expansion matrix to that
    core's node mode (the TT stays a TT of identical ranks).  The
    enclosure is an INTERVAL TRANSFER CHAIN: each dim's restricted core
    becomes an interval (r x r) matrix — midpoint ``c'_0`` (the rank
    block's mean on the box) and radius ``sum_{k>0} |c'_k|`` (its
    variation, by |T_k| <= 1) — and the chain multiplies them with
    midpoint-radius interval arithmetic.  Unlike the naive
    triangle-inequality bound over rank paths (which never tightens when
    paths cancel), the interval product preserves matrix-level sign
    cancellation, so the radius contracts to 0 as the box shrinks —
    which is what makes certification possible at all on TT-Cross cores.
    O(d n r^2) per box for ANY d, where a dense tensor would be n^d.

    ``tails[k]`` re-runs the chain with only dim k's radius live — the
    share of the enclosure width owed to dim k, used to pick the
    bisection dim.
    """
    d = len(cores)
    mids: List[np.ndarray] = []
    rads: List[np.ndarray] = []
    cens: List[np.ndarray] = []
    for k, core in enumerate(cores):
        lo, hi = box[k]
        if not (lo == -1.0 and hi == 1.0):
            m = restriction_matrix(core.shape[1], lo, hi)
            core = np.einsum("rns,kn->rks", core, m)
        mids.append(core[:, 0, :])
        rads.append(np.abs(core[:, 1:, :]).sum(axis=1))
        cens.append(np.einsum("rns,n->rs",
                              core, _t_at_zero(core.shape[1])))

    def chain(live_rad) -> Tuple[float, float]:
        vm = np.ones((1, 1))
        vr = np.zeros((1, 1))
        for k in range(d):
            rk = rads[k] if live_rad[k] else np.zeros_like(rads[k])
            vm, vr = (vm @ mids[k],
                      np.abs(vm) @ rk + vr @ np.abs(mids[k]) + vr @ rk)
        return float(vm[0, 0]), float(vr[0, 0])

    mid, radius = chain([True] * d)
    vc = np.ones((1, 1))
    for k in range(d):
        vc = vc @ cens[k]
    tails = np.empty(d)
    for k in range(d):
        live = [False] * d
        live[k] = True
        tails[k] = chain(live)[1]
    return mid, radius, float(vc[0, 0]), tails


def minimize_tt_cores(
    cores: Sequence[np.ndarray],
    *,
    tol: float = 1e-9,
    max_boxes: int = 20000,
    beam: int = 64,
    seed_value: float = np.inf,
    seed_loc: Optional[np.ndarray] = None,
) -> GlobalResult:
    """Certified global minimum of a TT in coefficient-core form over
    [-1, 1]^d — the n^d-free counterpart of
    :func:`minimize_coeff_tensor` for tensor-train interpolants."""
    d = len(cores)
    if seed_loc is None:
        seed_loc = np.zeros(d)

    def evaluate_boxes(boxes):
        bsz = boxes.shape[0]
        lb = np.empty(bsz)
        cv = np.empty(bsz)
        sc = np.empty((bsz, d))
        for b in range(bsz):
            mid, radius, center, tails = _tt_box_stats(cores, boxes[b])
            lb[b] = mid - radius
            cv[b] = center
            sc[b] = tails
        return lb, cv, sc

    return _bnb_minimize(d, evaluate_boxes, tol=tol, max_boxes=max_boxes,
                         beam=beam, seed_value=seed_value,
                         seed_loc=seed_loc)


# ----------------------------------------------------------------------
# Zero isolation for polynomial systems (critical points, solve_system)
# ----------------------------------------------------------------------

def isolate_common_zeros(
    coeff_tensors: Sequence[np.ndarray],
    *,
    delta: float = 1e-3,
    max_boxes: int = 50000,
    beam: int = 128,
) -> np.ndarray:
    """Boxes (local coords) that may contain a common zero of every
    polynomial in ``coeff_tensors``, refined until each is narrower than
    ``delta`` per dim.

    A box is *proved free* of solutions as soon as any component's
    enclosure excludes 0 (``|c0| > radius``).  Returns the surviving box
    centers, (K, d) — candidates for Newton polishing by the caller.
    Raises if the budget is exhausted with wide boxes still open (the
    zero set is then likely non-isolated — a manifold, not points).
    """
    d = coeff_tensors[0].ndim
    for t in coeff_tensors:
        if t.ndim != d:
            raise ValueError("all system components must share one "
                             "dimensionality")
    if not (0.0 < delta < 1.0):
        raise ValueError(f"delta must be in (0, 1), got {delta}")

    active = np.tile(np.array([[-1.0, 1.0]]), (d, 1))[None]
    done: List[np.ndarray] = []
    processed = 1
    while active.shape[0]:
        if processed > max_boxes:
            raise ValueError(
                f"zero isolation exceeded max_boxes={max_boxes} with "
                f"{active.shape[0]} boxes still open — the solution set "
                "is probably not isolated points (try a larger delta, "
                "or reduce the system)")
        batch, active = active[:beam], active[beam:]
        keep = np.ones(batch.shape[0], dtype=bool)
        tails = np.zeros((batch.shape[0], d))
        for tensor in coeff_tensors:
            sub = restrict_box_coeffs(tensor, batch)
            c0, rad = box_enclosure(sub)
            keep &= np.abs(c0) <= rad
            tails += _tail_mass_per_dim(sub)
        batch = batch[keep]
        tails = tails[keep]
        if not batch.shape[0]:
            continue
        widths = batch[:, :, 1] - batch[:, :, 0]
        narrow = np.all(widths <= delta, axis=1)
        done.extend(batch[narrow])
        wide = batch[~narrow]
        tails = tails[~narrow]
        if wide.shape[0]:
            # Split the widest dim, weighted by residual variation.
            w = wide[:, :, 1] - wide[:, :, 0]
            score = np.where(w > delta, w * (tails + 1e-300), -np.inf)
            dims = np.argmax(score, axis=1)
            children = _split_boxes(wide, dims)
            processed += children.shape[0]
            active = (np.concatenate([active, children])
                      if active.shape[0] else children)

    if not done:
        return np.zeros((0, d))
    return np.stack([0.5 * (b[:, 0] + b[:, 1]) for b in done])
