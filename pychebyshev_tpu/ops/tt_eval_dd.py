"""Near-f64 batched TT evaluation on the bf16 MXU — the digit-GEMM chain.

Why this exists: the TT family's f64 serving path
(``ops.tt_eval.tt_eval_batch`` with f64 cores) runs in XLA's software
f64 on f64-less v5e — measured ~0.28M queries/s on the 5-D benchmark —
while the f32 path trades down to ~1e-6-class accuracy.  This module
gives the TT chain the same treatment ``ops.eval_dd`` gives the dense
bilinear form: exact integer bf16 MXU products recombined in double-f32,
so accuracy lands at ~1e-11 (scale-normalized vs true f64) at a rate
set by the hardware units instead of the f64 emulator.

The TT chain is friendlier to this scheme than the dense form:

1. The row factors are Chebyshev-Vandermonde values ``T_k(x)`` with
   ``|T_k| <= 1`` in-domain — a fixed power-of-two pre-scale makes them
   unit-bounded with no Lebesgue-constant analysis.
2. Each stage contracts only ``n_d`` terms (grid points of ONE dim, not
   a Khatri-Rao group), so the MXU-exactness budget
   ``n_d * 2^(2b) < 2^24`` leaves 8-bit digits for any practical grid —
   fewer planes for the same accuracy than the dense right-group split.
3. The inter-stage rank reduction ``u <- sum_r u[r] * G[r, :]`` is a
   narrow elementwise chain; it runs in double-f32 (Dekker/Veltkamp)
   arithmetic on the VPU, never touching software f64.

Per dim the pipeline is: scaled coordinate in f64 (narrow, (N,)) ->
split to an (hi, lo) f32 pair -> three-term Chebyshev recurrence in
double-f32 -> signed digit planes -> one bf16 GEMM per row plane
against that plane's allowed core planes (every product is an integer
< 2^24, so the f32 accumulation is EXACT) -> recombine the ~20 pair
outputs with branch-free TwoSum into a double-f32 stage matrix -> dd
multiply into the running interface row.  The only f64 compute is the
(N,) coordinate transform per dim and the final (N,) readout.

Reference context: replaces reference ``tensor_train.py:2217-2265``
(NumPy f64 BLAS) in the accuracy regime the plain f32 TPU path cannot
reach.  No reference counterpart — CUDA/CPU frameworks have hardware
f64.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from pychebyshev_tpu.ops.eval import chunked_scalar_map
from pychebyshev_tpu.ops.eval_dd import (
    _digit_planes_pair,
    _digit_planes_tensor,
    _khatri_rao_dd,
    _split_f64,
    _dd_mul,
    pair_schedule,
)

__all__ = ["tt_eval_batch_dd", "tt_eval_batch_dd_models",
           "tt_dd_book_runner", "tt_supports_dd", "tt_dd_plan",
           "tt_dd_auto_groups"]

# Row values are T_k(x) with |T_k(x)| <= 1 for x in [-1, 1]; one halving
# covers the digit-plane contract |hi + lo| <= 1 with margin for mild
# extrapolation (out-of-domain queries keep reference silent-extrapolate
# semantics but degrade like every other path).
_Q_SCALE_LOG2 = 1

# Digit pairs with b*(i + j) above the cutoff are dropped; the entrywise
# error ~2^-(cutoff+1) is amplified by ~n_d per stage and the stages
# compound ~d times, so 44 lands ~1e-12-class on 5-D/11-node grids
# (measured; see docs/performance.md).  Mirrors ops.eval_dd's knob.
_PAIR_CUTOFF = 44
FAST_PAIR_CUTOFF = 36


def _dd_add(ahi, alo, bhi, blo):
    """(ahi+alo) + (bhi+blo) in double-f32 (branch-free TwoSum)."""
    s = ahi + bhi
    bv = s - ahi
    err = (ahi - (s - bv)) + (bhi - bv)
    lo = err + (alo + blo)
    hi = s + lo
    return hi, lo - (hi - s)


def tt_dd_plan(core_shapes: Sequence[Tuple[int, int, int]],
               cutoff: int = None) -> dict:
    """Static plan: per-dim digit width and GEMM pair list.

    MXU exactness per stage needs ``n_d * 2^(2b) < 2^24``; three extra
    slack bits cover the exact same-scale pre-sums of up to ~8 pair
    outputs.  Digit width is shared across dims (the max n_d binds) so
    the pair schedule — and the recombination scales — are uniform.
    """
    if cutoff is None:
        cutoff = _PAIR_CUTOFF
    shapes = [tuple(int(x) for x in s) for s in core_shapes]
    if not shapes or any(len(s) != 3 for s in shapes):
        return {"ok": False}
    if shapes[0][0] != 1 or shapes[-1][2] != 1:
        return {"ok": False}
    if any(a[2] != b[0] for a, b in zip(shapes, shapes[1:])):
        return {"ok": False}
    n_max = max(s[1] for s in shapes)
    bits_budget = 24 - int(np.ceil(np.log2(n_max))) - 3
    b = min(8, bits_budget // 2)
    if b < 4:
        return {"ok": False}
    p = int(cutoff // b) + 1
    pairs, js_by_i = pair_schedule(b, b, cutoff)
    return {"ok": True, "b": b, "p": p, "pairs": tuple(pairs),
            "js_by_i": js_by_i, "cutoff": int(cutoff),
            "shapes": tuple(shapes)}


def tt_supports_dd(core_shapes: Sequence[Tuple[int, int, int]]) -> bool:
    """Digit-GEMM TT mode applies while per-dim grids leave >= 4-bit
    digits (n_d up to ~2^13) and the bond chain is well-formed."""
    return bool(tt_dd_plan(core_shapes)["ok"])


def _dd_recurrence(xhi, xlo, n_d):
    """Half-scaled Chebyshev columns T_k(x)/2 in double-f32.

    The three-term recurrence runs entirely on f32 VPU lanes
    (software f64 here measurably dominated the per-point cost):
    with u_k = T_k/2, ``u_{k+1} = (2x) * u_k - u_{k-1}`` where the
    doubling and halving are exact power-of-two word scalings and
    each step costs one _dd_mul + one TwoSum — error ~k * 2^-47,
    inside the digit-plane budget.
    """
    one_hi = jnp.full_like(xhi, np.float32(0.5))
    cols = [(one_hi, jnp.zeros_like(xhi))]
    if n_d > 1:
        cols.append((xhi * np.float32(0.5), xlo * np.float32(0.5)))
    txhi, txlo = xhi * np.float32(2.0), xlo * np.float32(2.0)
    for _ in range(2, n_d):
        chi, clo = cols[-1]
        phi, plo = _dd_mul(txhi, txlo, chi, clo)
        mhi, mlo = cols[-2]
        nhi, nlo = _dd_add(phi, plo, -mhi, -mlo)
        cols.append((nhi, nlo))
    qhi = jnp.stack([c[0] for c in cols], axis=-1)
    qlo = jnp.stack([c[1] for c in cols], axis=-1)
    return qhi, qlo


def _stage_dd(r_planes, planes_d, scale_d, js_by_i, b, r_l, r_r,
              q_back_log2: int = _Q_SCALE_LOG2):
    """One stage's digit-GEMM ladder -> (ghi, glo) (N, r_l, r_r).

    One bf16 GEMM per row plane against the concatenation of its
    allowed core planes; every product is an integer < 2^24 so the f32
    accumulation is exact, and the power-of-two per-pair scales
    recombine losslessly.  ``q_back_log2`` undoes the row pre-scale —
    ``_Q_SCALE_LOG2`` per original dim folded into this stage (grouped
    stages contract a Khatri-Rao of several half-scaled rows).
    """
    q_scale = np.float32(2.0 ** q_back_log2)
    width = r_l * r_r
    by_scale = {}
    for i, js in enumerate(js_by_i):
        if not js:
            continue
        g_all = jnp.dot(r_planes[i], planes_d[i],
                        preferred_element_type=jnp.float32)
        for k, j in enumerate(js):
            g = jax.lax.slice_in_dim(g_all, k * width,
                                     (k + 1) * width, axis=1)
            v = b * (i + 1) + b * (j + 1)
            by_scale[v] = g if v not in by_scale else by_scale[v] + g
    ghi = glo = None
    for v in sorted(by_scale):                      # largest first
        term = by_scale[v] * np.float32(2.0 ** -v)
        if ghi is None:
            ghi, glo = term, jnp.zeros_like(term)
        else:
            ghi, glo = _dd_add(ghi, glo, term, jnp.zeros_like(term))
    # Undo the two power-of-two pre-scales — exact on both words.
    back = q_scale * scale_d
    ghi = ghi * back
    glo = glo * back
    return ghi.reshape(-1, r_l, r_r), glo.reshape(-1, r_l, r_r)


def _chain_model(shapes_m, r_planes_by_dim, planes_m, scales_m,
                 js_by_i, b, q_back_log2s=None):
    """One model's full stage chain over shared per-dim row planes."""
    uhi = ulo = None
    for d, (r_l, n_d, r_r) in enumerate(shapes_m):
        qb = (_Q_SCALE_LOG2 if q_back_log2s is None
              else q_back_log2s[d])
        ghi, glo = _stage_dd(r_planes_by_dim[d], planes_m[d],
                             scales_m[d], js_by_i, b, r_l, r_r, qb)
        if uhi is None:                             # r_l == 1
            uhi, ulo = ghi[:, 0, :], glo[:, 0, :]
            continue
        # Rank reduction u <- sum_r u[r] * G[r, :] in double-f32:
        # exact products (Dekker), compensated sums (TwoSum) —
        # a static unroll over the small bond rank.
        ph, pl = _dd_mul(uhi[:, :, None], ulo[:, :, None], ghi, glo)
        ahi, alo = ph[:, 0, :], pl[:, 0, :]
        for r in range(1, r_l):
            ahi, alo = _dd_add(ahi, alo, ph[:, r, :], pl[:, r, :])
        uhi, ulo = ahi, alo
    return uhi[:, 0].astype(jnp.float64) + ulo[:, 0].astype(jnp.float64)


@functools.lru_cache(maxsize=None)
def _compiled(shapes: Tuple[Tuple[int, int, int], ...], cutoff: int):
    plan = tt_dd_plan(shapes, cutoff)
    b = plan["b"]
    js_by_i = plan["js_by_i"]
    p_r = 1 + max(i for i, _ in plan["pairs"])

    def _one(core_planes, core_scales, lo, hi, pts):
        r_planes_by_dim = []
        for d, (r_l, n_d, r_r) in enumerate(shapes):
            # Only the scaled coordinate runs in (narrow, (N,)) f64;
            # the (N, n_d) recurrence runs in double-f32.
            x = 2.0 * (pts[:, d] - lo[d]) / (hi[d] - lo[d]) - 1.0
            xhi, xlo = _split_f64(x)
            qhi, qlo = _dd_recurrence(xhi, xlo, n_d)
            r_planes_by_dim.append(_digit_planes_pair(qhi, qlo, b, p_r))
        return _chain_model(shapes, r_planes_by_dim, core_planes,
                            core_scales, js_by_i, b)

    @jax.jit
    def run(core_planes, core_scales, lo, hi, points):
        per_point = max(
            (1 + max(len(js) for js in js_by_i)) * r_l * r_r + 2 * n_d
            for r_l, n_d, r_r in shapes)
        return chunked_scalar_map(
            lambda p: _one(core_planes, core_scales, lo, hi, p),
            points, per_point * p_r)

    return run, plan


# --------------------------------------------------------------------------
# Grouped digit-GEMM chain: merge adjacent cores into supercores, serve
# the coarser chain.
#
# Why: the per-dim chain's GEMMs contract over one dim's n_d (~11)
# grid points — an MXU K-dimension padded to a full tile, so ~90% of
# the systolic array idles — and its double-f32 recombination runs
# over the full (N, r_l * r_r) stage width (1,000+ lanes on
# compression-grade bonds).  Merging k adjacent cores (EXACT — see
# ``models.tt_algorithms.tt_merge_cores``) multiplies the GEMM K to
# prod(n_d) (e.g. 121), eliminates every interior bond from both the
# GEMM ladder and the VPU recombination, and costs only a cheap
# double-f32 Khatri-Rao over the group rows (the same primitive the
# dense plan uses for its right group).  Measured on the 11^5
# benchmark's compression chain this recovers the dense path's MXU
# efficiency at the TT chain's flop count — the route that finally
# crossed the 10M q/s x 1e-12 line (docs/performance.md).
# --------------------------------------------------------------------------


def grid_dims(shapes) -> Tuple[int, ...]:
    """Per-dim node counts of a core-shape chain."""
    return tuple(s[1] for s in shapes)


def _merged_shapes(shapes, groups):
    """Supercore shapes of a grouped chain (no data movement)."""
    out = []
    i = 0
    for g in groups:
        width = 1
        for s in shapes[i:i + g]:
            width *= s[1]
        out.append((shapes[i][0], width, shapes[i + g - 1][2]))
        i += g
    return tuple(out)


# Cost-model constants, calibrated on v5e (scripts/bench_tt_grouped.py):
# one bf16 MXU flop costs ~1/80 of a VPU f32 op at these shapes, and
# the GEMM K pads to a full 128-lane tile.
_MXU_DISCOUNT = 1.0 / 80.0
_K_TILE = 128.0


def _pair_fields(b: int, cutoff: int):
    """(npairs, p, nscales) of a b-bit uniform digit plan — the three
    schedule quantities the group cost model consumes."""
    pairs, _ = pair_schedule(b, b, cutoff)
    p = int(cutoff // b) + 1
    nscales = len({b * (i + 1) + b * (j + 1) for i, j in pairs})
    return len(pairs), p, nscales


def _width_digit_bits(w: int) -> int:
    """Digit width a merged supercore of ``w`` grid columns allows
    (mirrors ``tt_dd_plan``'s budget: 3 slack bits for the exact
    same-scale pre-sums)."""
    bits_budget = 24 - int(np.ceil(np.log2(max(w, 1)))) - 3
    return min(8, bits_budget // 2)


def _score_partition(shapes, groups, cutoff):
    """(model cost, break mask) of one contiguous partition — the ONE
    owner of the calibrated cost formula (the DP transition accumulates
    the same five terms in the same order, so DP == enumeration
    bit-exactly).  Returns (inf, mask) outside the digit budget."""
    merged = _merged_shapes(shapes, groups)
    plan = tt_dd_plan(merged, cutoff)
    mask = 0
    pos = 0
    for g in groups[:-1]:
        pos += g
        mask |= 1 << (pos - 1)
    if not plan["ok"]:
        return np.inf, mask
    b = plan["b"]
    npairs, p_r, nscales = _pair_fields(b, plan["cutoff"])
    cost = 0.0
    for (r_l, w, r_r), glen in zip(merged, groups):
        cost += npairs * max(w, _K_TILE) * r_l * r_r * _MXU_DISCOUNT
        cost += 10.0 * w * (glen - 1)        # dd Khatri-Rao
        cost += 3.0 * p_r * w                # digit extraction
        cost += 8.0 * nscales * r_l * r_r    # scale recombination
        cost += 12.0 * r_l * r_r             # interface dd mul+sum
    return cost, mask


def _enumerate_auto_groups(shapes, cutoff) -> Tuple[int, ...]:
    """Reference 2^(d-1) enumeration of the planner (kept as the
    regression oracle for the O(d^2) DP; not called in production)."""
    d = len(shapes)
    best_cost, best_groups = None, (1,) * d
    for mask in range(1 << (d - 1)):
        groups = []
        run = 1
        for k in range(d - 1):
            if mask & (1 << k):
                groups.append(run)
                run = 1
            else:
                run += 1
        groups.append(run)
        cost, _ = _score_partition(shapes, tuple(groups), cutoff)
        if not np.isfinite(cost):
            continue
        if best_cost is None or cost < best_cost:
            best_cost, best_groups = cost, tuple(groups)
    return best_groups


@functools.lru_cache(maxsize=None)
def tt_dd_auto_groups(shapes: Tuple[Tuple[int, int, int], ...],
                      cutoff: int = None) -> Tuple[int, ...]:
    """Pick the cheapest contiguous core grouping for the dd chain.

    An O(d^2) dynamic program over contiguous partitions (any d — the
    former 2^(d-1) enumeration silently fell back to per-dim past
    d = 12, exactly where high-d slider->TT chains starve the MXU K
    the most), scored with the calibrated MXU-vs-VPU cost model of
    :func:`_score_partition`: GEMM ladder flops at K padded to a tile,
    plus the double-f32 Khatri-Rao, digit extraction, recombination
    and rank-reduction VPU work.

    The digit width is set by the WIDEST merged supercore
    (``tt_dd_plan``), which couples groups — so the DP runs once per
    candidate width b (at most five), restricted to groups that allow
    >= b, and the winners are re-scored with their true plan.  Because
    the cost model is monotone non-increasing in b, the re-scored
    minimum — ties broken by the enumeration's mask order — equals the
    full enumeration's answer exactly (pinned by
    ``tests/test_tt_grouped.py``).  Partitions outside the digit
    budget are infeasible; per-dim is always a candidate, so the
    result is never worse than the ungrouped plan under the model.
    """
    shapes = tuple(tuple(int(x) for x in s) for s in shapes)
    d = len(shapes)
    if d <= 1:
        return (1,) * d
    if cutoff is None:
        cutoff = _PAIR_CUTOFF

    dims_n = [s[1] for s in shapes]
    candidates = []
    for b in range(4, 9):
        npairs, p_r, nscales = _pair_fields(b, cutoff)
        # dp[j] = (cost, mask, groups) of the best partition of
        # shapes[:j] whose every group allows digit width >= b.
        dp = [(np.inf, 0, ())] * (d + 1)
        dp[0] = (0.0, 0, ())
        for j in range(1, d + 1):
            best = (np.inf, 0, ())
            for i in range(j - 1, -1, -1):
                w = 1
                for n in dims_n[i:j]:
                    w *= n
                if _width_digit_bits(w) < b:
                    break                # widths only grow as i drops
                pc, pmask, pgroups = dp[i]
                if not np.isfinite(pc):
                    continue
                r_l, r_r = shapes[i][0], shapes[j - 1][2]
                glen = j - i
                c = pc
                c += (npairs * max(w, _K_TILE) * r_l * r_r
                      * _MXU_DISCOUNT)
                c += 10.0 * w * (glen - 1)
                c += 3.0 * p_r * w
                c += 8.0 * nscales * r_l * r_r
                c += 12.0 * r_l * r_r
                mask = pmask | (1 << (i - 1)) if i > 0 else pmask
                if (c, mask) < best[:2]:
                    best = (c, mask, pgroups + (glen,))
            dp[j] = best
        if np.isfinite(dp[d][0]):
            candidates.append(dp[d][2])

    best_key, best_groups = None, (1,) * d
    for groups in candidates:
        key = _score_partition(shapes, groups, cutoff)
        if np.isfinite(key[0]) and (best_key is None or key < best_key):
            best_key, best_groups = key, groups
    return best_groups


@functools.lru_cache(maxsize=None)
def _compiled_grouped(shapes: Tuple[Tuple[int, int, int], ...],
                      groups: Tuple[int, ...], cutoff: int):
    """Jitted grouped-chain runner for one (shapes, groups) plan."""
    merged = _merged_shapes(shapes, groups)
    plan = tt_dd_plan(merged, cutoff)
    b = plan["b"]
    js_by_i = plan["js_by_i"]
    p_r = 1 + max(i for i, _ in plan["pairs"])
    dims_n = tuple(s[1] for s in shapes)
    group_slices = []
    i = 0
    for g in groups:
        group_slices.append((i, i + g))
        i += g
    q_backs = tuple(_Q_SCALE_LOG2 * g for g in groups)

    def _one(core_planes, core_scales, lo, hi, pts):
        pairs_by_dim = []
        for d, n_d in enumerate(dims_n):
            x = 2.0 * (pts[:, d] - lo[d]) / (hi[d] - lo[d]) - 1.0
            xhi, xlo = _split_f64(x)
            pairs_by_dim.append(_dd_recurrence(xhi, xlo, n_d))
        r_planes_by_group = []
        for a, z in group_slices:
            qhi, qlo = _khatri_rao_dd(pairs_by_dim[a:z])
            r_planes_by_group.append(
                _digit_planes_pair(qhi, qlo, b, p_r))
        return _chain_model(merged, r_planes_by_group, core_planes,
                            core_scales, js_by_i, b, q_backs)

    @jax.jit
    def run(core_planes, core_scales, lo, hi, points):
        per_point = max(
            (1 + max(len(js) for js in js_by_i)) * r_l * r_r + 2 * w
            for r_l, w, r_r in merged)
        return chunked_scalar_map(
            lambda p: _one(core_planes, core_scales, lo, hi, p),
            points, per_point * p_r)

    return run, plan


# Prepared MERGED-supercore digit planes, identity-keyed on the
# original core tuple + grouping (merged arrays are ephemeral host
# temporaries, so they cannot key a cache themselves).
_grouped_plane_cache: list = []


def _grouped_core_planes(cores, groups: Tuple[int, ...], plan):
    key_ok = all(isinstance(c, jax.Array) for c in cores)
    plan_key = (plan["cutoff"], plan["b"], tuple(groups))
    if key_ok:
        for i, entry in enumerate(_grouped_plane_cache):
            if (entry[1] == plan_key and len(entry[0]) == len(cores)
                    and all(a is b for a, b in zip(entry[0], cores))):
                _grouped_plane_cache.insert(
                    0, _grouped_plane_cache.pop(i))
                return entry[2], entry[3]

    from pychebyshev_tpu.models.tt_algorithms import tt_merge_cores
    merged_host = tt_merge_cores([np.asarray(c, dtype=np.float64)
                                  for c in cores], list(groups))
    b = plan["b"]
    p_used = 1 + max(j for _, j in plan["pairs"])
    scales = []
    planes_all = []
    for host in merged_host:
        r_l, width, r_r = host.shape
        flat = host.transpose(1, 0, 2).reshape(width, r_l * r_r)
        c_max = float(np.abs(flat).max()) or 1.0
        scale = 2.0 ** np.ceil(np.log2(c_max))
        planes_host = _digit_planes_tensor(flat / scale, b, p_used)
        planes_dev = tuple(
            jnp.asarray(
                np.concatenate([planes_host[j] for j in js], axis=1),
                jnp.bfloat16)
            if js else jnp.zeros((width, 0), jnp.bfloat16)
            for js in plan["js_by_i"])
        scales.append(np.float32(scale))
        planes_all.append(planes_dev)
    scales = tuple(scales)
    planes_all = tuple(planes_all)
    if key_ok:
        _grouped_plane_cache.insert(0, (tuple(cores), plan_key, scales,
                                        planes_all))
        del _grouped_plane_cache[_PLANE_CACHE_SLOTS:]
    return scales, planes_all


# Prepared core digit planes, identity-keyed on the caller's core tuple
# (sound only for immutable jax arrays — numpy cores are rebuilt per
# call).  Bounded LRU; slots hold every model of a typical served book.
_PLANE_CACHE_SLOTS = 16
_plane_cache: list = []


def _core_planes(cores, plan):
    """Per-dim (scales, per-row-plane concatenated bf16 digit planes)."""
    key_ok = all(isinstance(c, jax.Array) for c in cores)
    plan_key = (plan["cutoff"], plan["b"])
    if key_ok:
        for i, entry in enumerate(_plane_cache):
            if (entry[1] == plan_key and len(entry[0]) == len(cores)
                    and all(a is b for a, b in zip(entry[0], cores))):
                _plane_cache.insert(0, _plane_cache.pop(i))
                return entry[2], entry[3]

    b = plan["b"]
    p_used = 1 + max(j for _, j in plan["pairs"])
    scales = []
    planes_all = []
    for c in cores:
        host = np.asarray(c, dtype=np.float64)
        r_l, n_d, r_r = host.shape
        flat = host.transpose(1, 0, 2).reshape(n_d, r_l * r_r)
        c_max = float(np.abs(flat).max()) or 1.0
        scale = 2.0 ** np.ceil(np.log2(c_max))
        planes_host = _digit_planes_tensor(flat / scale, b, p_used)
        planes_dev = tuple(
            jnp.asarray(
                np.concatenate([planes_host[j] for j in js], axis=1),
                jnp.bfloat16)
            if js else jnp.zeros((n_d, 0), jnp.bfloat16)
            for js in plan["js_by_i"])
        scales.append(np.float32(scale))
        planes_all.append(planes_dev)
    scales = tuple(scales)
    planes_all = tuple(planes_all)
    if key_ok:
        _plane_cache.insert(0, (tuple(cores), plan_key, scales,
                                planes_all))
        del _plane_cache[_PLANE_CACHE_SLOTS:]
    return scales, planes_all


def tt_eval_batch_dd(coeff_cores, domain, points,
                     cutoff: int = None, groups=None) -> jax.Array:
    """f64-class batched TT evaluation via exact integer digit GEMMs.

    Same signature family as ``ops.tt_eval.tt_eval_batch``; returns f64
    results deviating ~1e-11 (scale-normalized) from the true f64 chain
    at a large multiple of the software-f64 rate on f64-less TPUs.

    ``cutoff`` trades accuracy for throughput exactly like
    ``ops.eval_dd`` (default ``_PAIR_CUTOFF``; ``FAST_PAIR_CUTOFF`` is
    the class-level ``mode="fast"`` preset).

    ``groups`` selects the grouped supercore chain: ``"auto"`` (the
    calibrated planner, default at the class/serving layer), an
    explicit tuple of contiguous group sizes, or ``None`` for the
    per-dim chain.  Grouping is numerically a different (still
    f64-class) digit plan over the SAME tensor — deviations stay
    ~1e-13-class on benchmark grids; see docs/performance.md.
    """
    shapes = tuple(tuple(int(x) for x in np.shape(c))
                   for c in coeff_cores)
    plan = tt_dd_plan(shapes, cutoff)
    if not plan["ok"]:
        raise ValueError(
            f"TT core shapes {shapes} outside the digit-GEMM budget; "
            f"use ops.tt_eval.tt_eval_batch")
    if groups == "auto":
        groups = tt_dd_auto_groups(shapes, plan["cutoff"])
    if groups is not None and tuple(groups) != (1,) * len(shapes):
        groups = tuple(int(g) for g in groups)
        if any(g < 1 for g in groups) or sum(groups) != len(shapes):
            raise ValueError(
                f"groups {groups} must be positive and sum to the "
                f"number of cores ({len(shapes)})")
        merged = _merged_shapes(shapes, groups)
        gplan = tt_dd_plan(merged, cutoff)
        if not gplan["ok"]:
            raise ValueError(
                f"grouped shapes {merged} outside the digit-GEMM "
                f"budget; loosen groups={groups}")
        run, gplan = _compiled_grouped(shapes, groups, gplan["cutoff"])
        scales, planes = _grouped_core_planes(tuple(coeff_cores),
                                              groups, gplan)
        pts = jnp.asarray(points, jnp.float64)
        dom = np.asarray(domain, dtype=np.float64)
        return run(planes, scales, jnp.asarray(dom[:, 0]),
                   jnp.asarray(dom[:, 1]), pts)
    run, plan = _compiled(shapes, plan["cutoff"])
    scales, planes = _core_planes(tuple(coeff_cores), plan)
    pts = jnp.asarray(points, jnp.float64)
    dom = np.asarray(domain, dtype=np.float64)
    return run(planes, scales, jnp.asarray(dom[:, 0]),
               jnp.asarray(dom[:, 1]), pts)


# --------------------------------------------------------------------------
# Near-f64 TT books: M same-grid TT models share the per-dim row planes.
#
# The per-point cost of the dd chain splits into a model-independent
# part (the double-f32 Chebyshev recurrence + row digit planes per dim
# — same grid, same planes) and a per-model part (GEMM ladders + rank
# chain).  A book evaluates M models for one recurrence/plane build
# plus M ladders; with analytic-derivative TTs as the models this is
# the TT family's near-f64 Greek report.  Measured on chip the book is
# compute-NEUTRAL (~1.07x the cost of M separate dd passes — the
# ladders dominate the shared recurrence); its value is serving the
# whole book in ONE dispatch per bucket instead of M.
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _compiled_book(models_shapes: Tuple[Tuple[Tuple[int, int, int],
                                              ...], ...], cutoff: int,
                   groups: Tuple[int, ...] = None):
    """Jitted book runner.  With ``groups``, every model serves the
    grouped supercore chain over ONE shared set of per-group
    Khatri-Rao row planes (group widths depend only on the common
    grid, so the digit plan is shared too)."""
    dims_n = tuple(s[1] for s in models_shapes[0])
    if groups is not None:
        merged_all = tuple(_merged_shapes(s, groups)
                           for s in models_shapes)
        plan = tt_dd_plan(merged_all[0], cutoff)
        q_backs = tuple(_Q_SCALE_LOG2 * g for g in groups)
        group_slices = []
        i = 0
        for g in groups:
            group_slices.append((i, i + g))
            i += g
    else:
        merged_all = models_shapes
        plan = tt_dd_plan(models_shapes[0], cutoff)
        q_backs = None
        group_slices = [(k, k + 1) for k in range(len(dims_n))]
    b = plan["b"]
    js_by_i = plan["js_by_i"]
    p_r = 1 + max(i for i, _ in plan["pairs"])

    def _one(models_planes, models_scales, lo, hi, pts):
        pairs_by_dim = []
        for d, n_d in enumerate(dims_n):
            x = 2.0 * (pts[:, d] - lo[d]) / (hi[d] - lo[d]) - 1.0
            xhi, xlo = _split_f64(x)
            pairs_by_dim.append(_dd_recurrence(xhi, xlo, n_d))
        r_planes = []
        for a, z in group_slices:
            if z - a == 1:
                qhi, qlo = pairs_by_dim[a]
            else:
                qhi, qlo = _khatri_rao_dd(pairs_by_dim[a:z])
            r_planes.append(_digit_planes_pair(qhi, qlo, b, p_r))
        return jnp.stack([
            _chain_model(shapes_m, r_planes, models_planes[m],
                         models_scales[m], js_by_i, b, q_backs)
            for m, shapes_m in enumerate(merged_all)])

    per_point = sum(
        max((1 + max(len(js) for js in js_by_i)) * r_l * r_r + 2 * n_d
            for r_l, n_d, r_r in shapes_m)
        for shapes_m in merged_all)

    @jax.jit
    def run(models_planes, models_scales, lo, hi, points):
        from pychebyshev_tpu.ops.eval import chunked_matrix_map
        m = len(models_shapes)
        out = chunked_matrix_map(
            lambda p: _one(models_planes, models_scales, lo, hi,
                           p).T,                     # (chunk, M)
            points, per_point * p_r, m)
        return out.T                                 # (M, N)

    return run, plan


def tt_eval_batch_dd_models(models_cores, domain, points,
                            cutoff: int = None,
                            groups="auto") -> jax.Array:
    """Book-of-TT-models digit-GEMM evaluation -> (M, N).

    The near-f64 analog of the stacked f32 TT book: M same-grid TT
    models (ranks may differ) share ONE double-f32 Chebyshev recurrence
    and row-plane build per dim; each model adds only its exact GEMM
    ladders and double-f32 rank chain.  With ``differentiate()`` models
    this serves a whole TT Greek report at ~1e-11 deviation.

    ``groups`` (``"auto"`` default) serves every model through the
    grouped supercore chain over shared per-group rows — group widths
    depend only on the common grid, so one grouping fits the book.
    """
    models_cores = tuple(tuple(cs) for cs in models_cores)
    if not models_cores:
        raise ValueError("models_cores must be a non-empty sequence")
    models_shapes = tuple(
        tuple(tuple(int(x) for x in np.shape(c)) for c in cs)
        for cs in models_cores)
    grid0 = tuple(s[1] for s in models_shapes[0])
    for i, sh in enumerate(models_shapes):
        if not tt_dd_plan(sh, cutoff)["ok"]:
            raise ValueError(
                f"model {i} core shapes {sh} outside the digit-GEMM "
                f"budget; use the stacked f32 TT book")
        if tuple(s[1] for s in sh) != grid0:
            raise ValueError(
                f"model {i} per-dim node counts "
                f"{tuple(s[1] for s in sh)} differ from model 0's "
                f"{grid0}; a book shares one grid")
    return tt_dd_book_runner(models_cores, domain, cutoff,
                             groups=groups)(points)


def tt_dd_book_runner(models_cores, domain, cutoff: int = None,
                      mesh=None, data_axis: str = "dp",
                      groups="auto"):
    """Prepare-once form of :func:`tt_eval_batch_dd_models`: returns a
    ``points -> (M, N)`` callable closing over every model's prepared
    core planes.  With ``mesh``, planes replicate and points shard
    over ``data_axis``.  ``groups`` as in
    :func:`tt_eval_batch_dd_models` (``"auto"``: cost-model pick on
    the widest-rank model; ``None``: per-dim chain)."""
    models_cores = tuple(tuple(cs) for cs in models_cores)
    models_shapes = tuple(
        tuple(tuple(int(x) for x in np.shape(c)) for c in cs)
        for cs in models_cores)
    cutoff = tt_dd_plan(models_shapes[0], cutoff)["cutoff"]
    if groups == "auto":
        # Plan on the model with the largest total rank load (the one
        # the chain cost model should optimize for).
        widest = max(models_shapes,
                     key=lambda sh: sum(r * n * s for r, n, s in sh))
        groups = tt_dd_auto_groups(widest, cutoff)
    if groups is not None and tuple(groups) == (1,) * len(grid_dims(
            models_shapes[0])):
        groups = None
    if groups is not None:
        groups = tuple(int(g) for g in groups)
        if (any(g < 1 for g in groups)
                or sum(groups) != len(models_shapes[0])):
            raise ValueError(
                f"groups {groups} must be positive and sum to the "
                f"number of cores ({len(models_shapes[0])})")
        for sh in models_shapes:
            if not tt_dd_plan(_merged_shapes(sh, groups),
                              cutoff)["ok"]:
                raise ValueError(
                    f"grouped shapes outside the digit-GEMM budget; "
                    f"loosen groups={groups}")
    run, plan = _compiled_book(models_shapes, cutoff, groups)
    scales_all, planes_all = [], []
    for cs in models_cores:
        if groups is not None:
            scales, planes = _grouped_core_planes(cs, groups, plan)
        else:
            scales, planes = _core_planes(cs, plan)
        scales_all.append(scales)
        planes_all.append(planes)
    scales_all, planes_all = tuple(scales_all), tuple(planes_all)
    dom = np.asarray(domain, dtype=np.float64)
    lo, hi = jnp.asarray(dom[:, 0]), jnp.asarray(dom[:, 1])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from pychebyshev_tpu.parallel.sharding import (
            _dp_points,
            _dp_run_matrix_t,
        )
        replicate = NamedSharding(mesh, P())
        # One broadcast at prep time (the runner closes over it; the
        # per-model scales are np scalars, replicated alongside).
        planes_all = jax.device_put(planes_all, replicate)
        lo = jax.device_put(lo, replicate)
        hi = jax.device_put(hi, replicate)
        fn = _dp_run_matrix_t(run, 4, mesh, data_axis)

        def runner(points):
            pts, n, pad = _dp_points(points, mesh, data_axis)
            out = fn(planes_all, scales_all, lo, hi, pts)
            return out[:, :n] if pad else out

        return runner

    def runner(points):
        return run(planes_all, scales_all, lo, hi,
                   jnp.asarray(points, jnp.float64))

    return runner
